"""Fused dense-interpolation Pallas kernel (fleet-batched).

The XLA path (`ops.interp.sample_dense`) materializes the (N, Wc)/(N, Hc)
weight matrices and the (N, Hc) partial products in HBM between ops —
at fleet scale (B=256 trackers x 2500 pts x 144 crop) that is ~1.5 GB of
HBM traffic per sampling pass, the measured bottleneck of the LK
iteration (~1.85 ms of the ~2.57 ms per-iteration cost). This kernel
fuses the whole chain per point-block in VMEM:

    iota -> kernel weights (VPU)  ->  two MXU contractions  ->  row reduce

so the only HBM traffic is the cropped images (once) and the (N,) outputs.

Batching: `sample_dense_pallas` is wrapped in `jax.custom_batching.
custom_vmap` — under `vmap` (tracker fleets, PF particles) it lowers to
ONE pallas_call with grid (B, point_blocks) instead of a serialized
leading dimension, which is what made the naive vmap 5x slower than XLA.

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

_TN = 256  # points per block


def _weights_dense(t, kind: str):
    """phi(t), phi'(t) on tap offsets t (VPU elementwise)."""
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


def _kernel(kind, hc, wc, x_ref, y_ref, sub_ref, val_ref, dx_ref, dy_ref):
    lo = 0.001 if kind == "linear" else 1.001
    hix = (wc - 1.001) if kind == "linear" else (wc - 2.001)
    hiy = (hc - 1.001) if kind == "linear" else (hc - 2.001)
    x = jnp.clip(x_ref[0, :, 0], lo, hix)                  # (TN,)
    y = jnp.clip(y_ref[0, :, 0], lo, hiy)

    # Mosaic only lowers integer iota; cast to f32 on the VPU
    kx = jax.lax.broadcasted_iota(jnp.int32, (_TN, wc), 1).astype(jnp.float32)
    tx = kx - x[:, None]
    wx, dpx = _weights_dense(tx, kind)                     # (TN, Wc)
    ky = jax.lax.broadcasted_iota(jnp.int32, (_TN, hc), 1).astype(jnp.float32)
    ty = ky - y[:, None]
    wy, dpy = _weights_dense(ty, kind)                     # (TN, Hc)

    sub = sub_ref[0, :, :]                                 # (Hc, Wc)
    # contract the x axis on the MXU: (TN, Wc) x (Hc, Wc)^T -> (TN, Hc)
    dn = (((1,), (1,)), ((), ()))
    tmp = jax.lax.dot_general(wx, sub, dn,
                              preferred_element_type=jnp.float32)
    tmp_dx = jax.lax.dot_general(-dpx, sub, dn,
                                 preferred_element_type=jnp.float32)
    val_ref[0, :, 0] = jnp.sum(wy * tmp, axis=1)
    dx_ref[0, :, 0] = jnp.sum(wy * tmp_dx, axis=1)
    dy_ref[0, :, 0] = jnp.sum(-dpy * tmp, axis=1)


def _pallas_batched(subs: Array, xp: Array, yp: Array, kind: str,
                    interpret: bool):
    """subs (B, Hc, Wc), xp/yp (B, NP, 1) -> three (B, NP, 1) outputs."""
    b, hc, wc = subs.shape
    n_pad = xp.shape[1]
    grid = (b, n_pad // _TN)
    blk = pl.BlockSpec((1, _TN, 1), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    sub_blk = pl.BlockSpec((1, hc, wc), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, kind, hc, wc),
        grid=grid,
        in_specs=[blk, blk, sub_blk],
        out_specs=(blk, blk, blk),
        out_shape=(jax.ShapeDtypeStruct((b, n_pad, 1), jnp.float32),) * 3,
        interpret=interpret,
    )(xp, yp, subs)


def _make_core(kind: str, interpret: bool):
    """(sub (Hc,Wc), xp (NP,1), yp (NP,1)) -> (val, dx, dy) each (NP, 1),
    with a custom vmap rule lowering batches to one (B, blocks) grid."""

    @jax.custom_batching.custom_vmap
    def core(sub, xp, yp):
        v, dx, dy = _pallas_batched(sub[None], xp[None], yp[None],
                                    kind, interpret)
        return v[0], dx[0], dy[0]

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, sub, xp, yp):  # noqa: F811
        sub_b, x_b, y_b = in_batched
        if not sub_b:
            sub = jnp.broadcast_to(sub[None], (axis_size,) + sub.shape)
        if not x_b:
            xp = jnp.broadcast_to(xp[None], (axis_size,) + xp.shape)
        if not y_b:
            yp = jnp.broadcast_to(yp[None], (axis_size,) + yp.shape)
        out = _pallas_batched(sub, xp, yp, kind, interpret)
        return out, (True, True, True)

    return core


_CORES: dict = {}


def _core_for(kind: str, interpret: bool):
    key = (kind, interpret)
    if key not in _CORES:
        _CORES[key] = _make_core(kind, interpret)
    return _CORES[key]


def sample_dense_pallas(img: Array, pts: Array, kind: str = "linear",
                        crop: int | None = None, interpret: bool = False):
    """Fused (val (N, 1), grad (N, 1, 2)) sampling for grayscale images.

    vmap-friendly: under `jax.vmap` (fleets/particles) the whole batch
    runs as one Pallas grid.
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

    val, dx, dy = _core_for(kind, interpret)(sub, xp, yp)
    val = val[:n]
    grad = jnp.stack([dx[:n], dy[:n]], axis=-1)            # (N, 1, 2)
    return val, grad
