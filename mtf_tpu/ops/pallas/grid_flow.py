"""Fused grid-flow iteration: the whole per-level joint-LK loop in one
kernel.

TPU-native fusion of the GridTracker/RKLT hot loop
(`/root/reference/SM/src/GridTracker.cc:247-261` per-patch TBB
parallel-for; `GridTrackerCV.cc:208-275` pyramidal flow;
`NT/RKLT.cc:90-116`). The XLA dense form (`sm/grid.py
_track_patches_mm`) pays per-iteration launch + fusion-glue cost that
dominates the RKLT device profile (r4: ~22 ms/update at B=128 in the
three grid-pyramid joint-iteration while loops). Here ONE `pallas_call`
per pyramid level runs ALL `n_iters` joint iterations with the per-patch
2-DOF displacements carried in VMEM scratch:

    per iteration, per point tile (tp patches x n points):
      expand disp -> warped point coords        (E-matmul, no relayout)
      tap weights -> two bf16 MXU sampling dots (val + d/dx chain)
      optional per-patch ZNCC standardization   (E-matmul stats)
      residual r, J = scale * (dx, dy)
      per-patch [Jx.Jx, Jx.Jy, Jy.Jy, Jx.r, Jy.r]  (one (5,TN)@(TN,tp))
      closed-form damped 2x2 solves, disp -= d  (lane-wise)

Per-patch reduction/broadcast both ride tiny MXU dots against an
iota-built block indicator (patch p owns lanes [p*n, (p+1)*n)): points
are patch-major so the indicator is the same static pattern for every
tile, and nothing is ever relayouted off the lane axis. The disp
scratch is laid out (T, 2, tp) so every per-iteration load/store is a
layout-free leading-dim index (lane slices at patch-tile boundaries
would be unaligned).

The solve runs in TEMPLATE units (J scaled by the region scale before
the products) so the +1e-6 damping and det guard match
`ops.linalg.solve2x2` on the XLA path.

HBM traffic per level call: the window, points, templates ONCE (vs once
per iteration for the XLA path) and the (2, P) result.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtf_tpu.ops.pallas.dense_sample import _weights_dense

Array = jax.Array

_TILE_MAX = 2048   # max points per tile (weights are (Wc, TN) f32 x4)
_FULL_MAX = 2048   # single full-array tile up to this many points


def _grid_tiles(n_patches: int, n: int) -> int:
    """Patches per tile. A tile must be a whole number of patches (the
    block indicator assumes it), divide the patch count (equal tiles),
    and its point count must be 128-aligned unless it is the full array
    (Mosaic slice rule). Returns tp; tp == n_patches means one tile."""
    pn = n_patches * n
    if pn <= _FULL_MAX:
        return n_patches
    best = None
    for tp in range(n_patches, 0, -1):
        if n_patches % tp or tp * n > _TILE_MAX:
            continue
        if (tp * n) % 128 == 0:
            best = tp
            break
    if best is None:
        # no aligned divisor: fall back to one full-array tile (legal for
        # any size) as long as VMEM can hold the weights
        if pn <= 8192:
            return n_patches
        raise ValueError(
            f"grid_flow_fused: no 128-aligned tile for P={n_patches}, "
            f"n={n} (Pn={pn})")
    return best


def _kernel(kind, hc, wc, n, tp, t_tiles, n_iters, zncc, band, win_ref,
            pts_ref, templ_ref, scale_ref, disp_out, disp_ref):
    tn = tp * n
    # block indicator: patch p (within a tile) owns lanes [p*n, (p+1)*n).
    # Patch-major ordering makes the pattern identical for every tile, so
    # both orientations are built ONCE from iota (f32 for the MXU dots).
    lane = jax.lax.broadcasted_iota(jnp.int32, (tp, tn), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, tn), 0)
    EX = (lane // n == row).astype(jnp.float32)             # (tp, TN)
    laneT = jax.lax.broadcasted_iota(jnp.int32, (tn, tp), 0)
    colT = jax.lax.broadcasted_iota(jnp.int32, (tn, tp), 1)
    ET = (laneT // n == colT).astype(jnp.float32)           # (TN, tp)

    scale = scale_ref[0, 0, 0]
    lo = 0.001 if kind == "linear" else 1.001
    hix = (wc - 1.001) if kind == "linear" else (wc - 2.001)
    hiy = (band - 1.001) if kind == "linear" else (band - 2.001)

    disp_ref[:, :, :] = jnp.zeros((t_tiles, 2, tp), jnp.float32)

    def one_iter(_, carry):
        for t in range(t_tiles):
            sl = slice(t * tn, (t + 1) * tn)
            px = pts_ref[0, 0, sl]                          # (TN,) lanes
            py = pts_ref[0, 1, sl]
            d_t = disp_ref[t]                               # (2, tp) templ
            # expand to per-point window-px offsets
            # default precision: offsets are window-px scale (bf16
            # rounding ~0.005 px here — harmless, unlike the stats)
            d_pt = jax.lax.dot_general(
                d_t * scale, EX, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (2, TN)
            x = jnp.clip(px + d_pt[0], lo, hix)
            yr = py + d_pt[1]
            if band < hc:
                # y-banding (chain-kernel pattern): a tile is a
                # consecutive patch-major slab — 2 grid rows of patches
                # spanning a narrow y band of the window. The sampling
                # dots contract a dynamically-sliced (band, Wc) row
                # block instead of the full window (the dominant MXU
                # cost at full resolution).
                ymin = jnp.min(yr)
                y0i = jnp.floor(ymin).astype(jnp.int32) - 2
                y0i = jnp.bitwise_and(jnp.clip(y0i, 0, hc - band), ~15)
                y0i = pl.multiple_of(y0i, 16)
                win = win_ref[0, pl.ds(y0i, band), :]       # (band, Wc)
                y0f = y0i.astype(jnp.float32)
                y = jnp.clip(yr - y0f, lo, hiy)
                # in-band mask (r5 session 2, caught by the compiled CI
                # lane): a warp that stretches the slab past the band —
                # or any non-slab point layout — would otherwise sample
                # band-edge garbage, collapse the ZNCC variance and
                # blow up the damped solve. Out-of-band points are
                # excluded from the stats and the solve; a patch with
                # NO in-band points gets zero J and r -> its
                # displacement simply stays put this iteration.
                m = ((yr - y0f >= lo) & (yr - y0f <= hiy)).astype(
                    jnp.float32)
            else:
                win = win_ref[0]
                y = jnp.clip(yr, lo, hiy)
                m = None

            kx = jax.lax.broadcasted_iota(
                jnp.int32, (wc, tn), 0).astype(jnp.float32)
            wxt, dpxt = _weights_dense(kx - x[None, :], kind)  # (Wc, TN)
            ky = jax.lax.broadcasted_iota(
                jnp.int32, (band, tn), 0).astype(jnp.float32)
            wyt, dpyt = _weights_dense(ky - y[None, :], kind)  # (band, TN)

            tmp = jnp.dot(win, wxt.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)  # (band, TN)
            tmp_dx = jnp.dot(win, dpxt.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            val = jnp.sum(wyt * tmp, axis=0)                # (TN,)
            dx = -jnp.sum(wyt * tmp_dx, axis=0)
            dy = -jnp.sum(dpyt * tmp, axis=0)

            if zncc:
                # per-patch standardization (matches sm/grid._standardize)
                # in TWO passes at FULL precision: the one-pass form
                # var = E[v^2] - mu^2 is a catastrophic cancellation
                # (mu^2 ~ 16k vs var ~ 5 on 8-bit imagery), and the TPU
                # default rounds f32 dot operands to bf16 — the 0.4%
                # error on E[v^2] exceeded var itself, collapsed sd to
                # ~0 and blew the solve up by 1e4 (r5 chip postmortem;
                # interpret-on-CPU is exact and never showed it)
                # (default dot precision is fine HERE: a bf16-rounded
                # mu only shifts c by ~0.5 intensity, adding mu_err^2 ~
                # 0.25 to a var of 5-25 — a ~2% sd error, not the 1e4
                # blow-up of the one-pass cancellation; HIGHEST on these
                # M=1 dots measured ~5k fleet fps, log/ab_gridonly)
                vm = val if m is None else val * m
                s1 = jax.lax.dot_general(
                    vm[None, :], ET, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (1, tp)
                if m is None:
                    cnt = jnp.float32(n)
                else:
                    cnt = jnp.maximum(jax.lax.dot_general(
                        m[None, :], ET, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)[0], 1.0)  # (tp,)
                mu_e = jax.lax.dot_general(
                    (s1[0] / cnt)[None, :], EX, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[0]  # (TN,)
                c = val - mu_e
                if m is not None:
                    c = c * m
                s2 = jax.lax.dot_general(
                    (c * c)[None, :], ET, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (1, tp)
                inv = 1.0 / (jnp.sqrt(s2[0] / cnt) + 1e-6)
                inv_e = jax.lax.dot_general(
                    inv[None, :], EX, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[0]
                val = c * inv_e

            r = val - templ_ref[0, 0, sl]
            jx = dx * scale                                 # template units
            jy = dy * scale
            if m is not None:
                jx = jx * m                 # out-of-band points carry no
                jy = jy * m                 # gradient into the solve
            red = jax.lax.dot_general(
                jnp.stack([jx * jx, jx * jy, jy * jy, jx * r, jy * r]),
                ET, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (5, tp)
            hxx = red[0] + 1e-6
            hxy = red[1]
            hyy = red[2] + 1e-6
            gx, gy = red[3], red[4]
            det = hxx * hyy - hxy * hxy
            det = jnp.where(jnp.abs(det) < 1e-12,
                            jnp.sign(det) * 1e-12 + 1e-12, det)
            d0 = (hyy * gx - hxy * gy) / det
            d1 = (hxx * gy - hxy * gx) / det
            disp_ref[t] = d_t - jnp.stack([d0, d1])
        return carry

    jax.lax.fori_loop(0, n_iters, one_iter, jnp.int32(0))
    disp_out[0] = disp_ref[:, :, :]


def _batched(win, pts, templ, scale, kind, n, n_iters, zncc, interpret):
    b, hc, wc = win.shape
    pn = pts.shape[2]
    p = pn // n
    tp = _grid_tiles(p, n)
    t_tiles = p // tp
    # y-banding: only when tiling is active (a single full tile spans
    # the whole window). Band 80 covers a 2-grid-row slab of the
    # largest in-window target (~0.2*span + patch extent + margins)
    band = 80 if (t_tiles > 1 and hc >= 128) else hc
    win_blk = pl.BlockSpec((1, hc, wc), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    pts_blk = pl.BlockSpec((1, 2, pn), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    templ_blk = pl.BlockSpec((1, 1, pn), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    sc_blk = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((1, t_tiles, 2, tp), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    raw = pl.pallas_call(
        functools.partial(_kernel, kind, hc, wc, n, tp, t_tiles, n_iters,
                          zncc, band),
        grid=(b,),
        in_specs=[win_blk, pts_blk, templ_blk, sc_blk],
        out_specs=out_blk,
        out_shape=jax.ShapeDtypeStruct((b, t_tiles, 2, tp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_tiles, 2, tp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n_iters * pn * band * wc, transcendentals=0,
            bytes_accessed=b * (hc * wc * 2 + pn * 4 * 3)),
        interpret=interpret,
    )(win, pts, templ[:, None], scale[:, None, None])
    # (b, T, 2, tp) -> (b, 2, P) with patch index = t*tp + local
    return jnp.swapaxes(raw, 1, 2).reshape(b, 2, p)


@functools.lru_cache(maxsize=None)
def _core_for(kind: str, n: int, n_iters: int, zncc: bool,
              interpret: bool = False):
    @jax.custom_batching.custom_vmap
    def core(win, pts, templ, scale):
        out = _batched(win[None], pts[None], templ[None], scale[None],
                       kind, n, n_iters, zncc, interpret)
        return out[0]

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, win, pts, templ, scale):  # noqa: F811
        bcast = lambda z, bt: z if bt else jnp.broadcast_to(  # noqa: E731
            z[None], (axis_size,) + z.shape)
        out = _batched(bcast(win, in_batched[0]), bcast(pts, in_batched[1]),
                       bcast(templ, in_batched[2]),
                       bcast(scale, in_batched[3]),
                       kind, n, n_iters, zncc, interpret)
        return out, True

    return core


def grid_flow_fused(win: Array, pts: Array, templ: Array, scale: Array,
                    n: int, n_iters: int, zncc: bool = True,
                    kind: str = "linear", interpret: bool = False):
    """Run `n_iters` joint grid-flow LK iterations fully in-kernel.

    win    (Hc, Wc)  level window (cast to bf16 for the sampling dots)
    pts    (2, Pn)   per-patch base points in WINDOW pixel coords,
                     patch-major (patch p owns columns [p*n, (p+1)*n))
    templ  (Pn,)     per-patch templates (pre-standardized when zncc)
    scale  ()        template-unit -> window-px scale (norm_mat[0,0] at
                     this pyramid level)
    Returns disp (2, P) in TEMPLATE units (matches
    `sm/grid._track_patches_mm` semantics: same residual, same damped
    2x2 solve, window fixed for the whole level call).
    """
    return _core_for(kind, n, int(n_iters), bool(zncc), interpret)(
        win.astype(jnp.bfloat16), pts, templ,
        jnp.asarray(scale, jnp.float32))
