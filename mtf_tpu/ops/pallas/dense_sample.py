"""Fused dense-interpolation Pallas kernel (fleet-batched).

The XLA dense path (`ops.interp.sample_dense`) is VPU-bound: its two
output fusions each REBUILD the (N, Wc) tap-weight tensors from iota
(~16 elementwise passes over N*Wc elements per LK iteration — the
measured 0.85 ms/iter at fleet scale, see the r2 trace decode in
CLAUDE.md). This kernel builds the weights ONCE per point block, shares
|t|/sign(t) between phi and phi', runs the two stage-1 contractions on
the bf16 MXU (f32 accumulation — quantization ~0.5 intensity levels,
measured zero accuracy delta), and reduces stage 2 in VMEM, so HBM sees
only the cropped window and three (N,) outputs.

Layout notes (why this version is fast where the first cut was not):
  * the cropped window is passed pre-transposed (Wc, Hc) so both dots
    are plain NN-form `dot(weights (TN, Wc), subT (Wc, Hc))`;
  * per-block point count TN = 1280 (vs 256) amortizes MXU pipeline
    ramp and relayouts;
  * outputs are separate val/dx/dy vectors — the (N, 1, 2) stacked
    gradient of the old API forced degenerate T(2,128) layouts on the
    whole downstream Jacobian chain.

Batching: `sample_dense_pallas_parts` is wrapped in
`jax.custom_batching.custom_vmap` — under `vmap` (tracker fleets, PF
particles) it lowers to ONE pallas_call with grid (B, point_blocks)
instead of a serialized leading dimension.

Grayscale (C=1) only — the tracking hot path samples single-channel
patches; multichannel falls back to the XLA einsum path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TN = 1280  # points per block


def _weights_dense(t, kind: str):
    """phi(t), phi'(t) on tap offsets t (VPU elementwise; |t| and sign
    shared between the two)."""
    a = jnp.abs(t)
    s = jnp.sign(t)
    if kind == "linear":
        return jnp.maximum(0.0, 1.0 - a), jnp.where(a < 1.0, -s, 0.0)
    a2, a3 = a * a, a * a * a
    if kind == "cubic":
        w_in = 1.5 * a3 - 2.5 * a2 + 1.0
        w_out = -0.5 * a3 + 2.5 * a2 - 4.0 * a + 2.0
        d_in = 4.5 * a2 - 5.0 * a
        d_out = -1.5 * a2 + 5.0 * a - 4.0
    elif kind == "cubic_bspl":
        w_in = 0.5 * a3 - a2 + 2.0 / 3.0
        w_out = -(a - 2.0) ** 3 / 6.0
        d_in = 1.5 * a2 - 2.0 * a
        d_out = -0.5 * (a - 2.0) ** 2
    else:
        raise ValueError(kind)
    w = jnp.where(a < 1.0, w_in, jnp.where(a < 2.0, w_out, 0.0))
    dphi = jnp.where(a < 1.0, d_in, jnp.where(a < 2.0, d_out, 0.0)) * s
    return w, dphi


def _kernel(kind, hc, wc, dot_dtype, x_ref, y_ref, subt_ref,
            val_ref, dx_ref, dy_ref):
    lo = 0.001 if kind == "linear" else 1.001
    hix = (wc - 1.001) if kind == "linear" else (wc - 2.001)
    hiy = (hc - 1.001) if kind == "linear" else (hc - 2.001)
    x = jnp.clip(x_ref[0, :, 0], lo, hix)                  # (TN,)
    y = jnp.clip(y_ref[0, :, 0], lo, hiy)

    # Mosaic only lowers integer iota; cast to f32 on the VPU
    kx = jax.lax.broadcasted_iota(jnp.int32, (_TN, wc), 1).astype(jnp.float32)
    wx, dpx = _weights_dense(kx - x[:, None], kind)        # (TN, Wc)
    ky = jax.lax.broadcasted_iota(jnp.int32, (_TN, hc), 1).astype(jnp.float32)
    wy, dpy = _weights_dense(ky - y[:, None], kind)        # (TN, Hc)

    subt = subt_ref[0, :, :]                               # (Wc, Hc)
    tmp = jnp.dot(wx.astype(dot_dtype), subt,
                  preferred_element_type=jnp.float32)      # (TN, Hc)
    tmp_dx = jnp.dot(dpx.astype(dot_dtype), subt,
                     preferred_element_type=jnp.float32)
    val_ref[0, :, 0] = jnp.sum(wy * tmp, axis=1)
    dx_ref[0, :, 0] = -jnp.sum(wy * tmp_dx, axis=1)
    dy_ref[0, :, 0] = -jnp.sum(dpy * tmp, axis=1)


def _pallas_batched(subts: Array, xp: Array, yp: Array, kind: str,
                    interpret: bool, dot_dtype=jnp.bfloat16):
    """subts (B, Wc, Hc), xp/yp (B, NP, 1) -> three (B, NP, 1)."""
    b, wc, hc = subts.shape
    n_pad = xp.shape[1]
    grid = (b, n_pad // _TN)
    blk = pl.BlockSpec((1, _TN, 1), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    sub_blk = pl.BlockSpec((1, wc, hc), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    flops = 2 * 2 * b * n_pad * hc * wc
    return pl.pallas_call(
        functools.partial(_kernel, kind, hc, wc, dot_dtype),
        grid=grid,
        in_specs=[blk, blk, sub_blk],
        out_specs=(blk, blk, blk),
        out_shape=(jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),) * 3,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=b * (wc * hc * 2 + n_pad * (2 + 3) * 4)),
        interpret=interpret,
    )(xp, yp, subts)


def _make_core(kind: str, interpret: bool, dot_dtype):
    """(subT (Wc,Hc), xp (NP,1), yp (NP,1)) -> val/dx/dy (NP, 1),
    with a custom vmap rule lowering batches to one (B, blocks) grid."""

    @jax.custom_batching.custom_vmap
    def core(subt, xp, yp):
        v, dx, dy = _pallas_batched(subt[None], xp[None], yp[None],
                                    kind, interpret, dot_dtype)
        return v[0], dx[0], dy[0]

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, subt, xp, yp):  # noqa: F811
        sub_b, x_b, y_b = in_batched
        if not sub_b:
            subt = jnp.broadcast_to(subt[None], (axis_size,) + subt.shape)
        if not x_b:
            xp = jnp.broadcast_to(xp[None], (axis_size,) + xp.shape)
        if not y_b:
            yp = jnp.broadcast_to(yp[None], (axis_size,) + yp.shape)
        out = _pallas_batched(subt, xp, yp, kind, interpret, dot_dtype)
        return out, (True, True, True)

    return core


_CORES: dict = {}


def _core_for(kind: str, interpret: bool, dot_dtype=jnp.bfloat16):
    key = (kind, interpret, jnp.dtype(dot_dtype).name)
    if key not in _CORES:
        _CORES[key] = _make_core(kind, interpret, dot_dtype)
    return _CORES[key]


def sample_dense_pallas_parts(img: Array, pts: Array, kind: str = "linear",
                              crop: int | None = None,
                              interpret: bool = False,
                              dot_dtype=jnp.bfloat16):
    """Fused (val, dx, dy) sampling, each (N, 1), for grayscale images.

    vmap-friendly: under `jax.vmap` (fleets/particles) the whole batch
    runs as one Pallas grid. The crop/transpose happen OUTSIDE the
    kernel so they hoist out of the LK while-loop (loop-invariant when
    the caller pre-crops per update).
    """
    if img.ndim == 3:
        if img.shape[-1] != 1:
            raise ValueError("pallas dense sampler is single-channel")
        img = img[..., 0]
    h, w = img.shape
    x, y = pts[:, 0], pts[:, 1]
    if crop is not None and (crop < h or crop < w):
        hc, wc = min(crop, h), min(crop, w)
        x0 = jnp.clip(jnp.floor(jnp.min(x)) - 2.0, 0.0, float(w - wc))
        y0 = jnp.clip(jnp.floor(jnp.min(y)) - 2.0, 0.0, float(h - hc))
        sub = jax.lax.dynamic_slice(
            img, (y0.astype(jnp.int32), x0.astype(jnp.int32)), (hc, wc))
        x = x - x0
        y = y - y0
    else:
        sub, hc, wc = img, h, w

    n = pts.shape[0]
    n_pad = ((n + _TN - 1) // _TN) * _TN
    xp = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(x)
    yp = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(y)
    subt = sub.T.astype(dot_dtype)                         # (Wc, Hc)

    val, dx, dy = _core_for(kind, interpret, dot_dtype)(subt, xp, yp)
    return val[:n], dx[:n], dy[:n]


def sample_dense_pallas(img: Array, pts: Array, kind: str = "linear",
                        crop: int | None = None, interpret: bool = False,
                        dot_dtype=jnp.bfloat16):
    """Back-compat stacked API: (val (N, 1), grad (N, 1, 2))."""
    val, dx, dy = sample_dense_pallas_parts(img, pts, kind, crop, interpret,
                                            dot_dtype)
    return val, jnp.stack([dx, dy], axis=-1)
