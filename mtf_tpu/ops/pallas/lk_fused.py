"""Fused LK-iteration core: dense sampling + SSD gradient in one kernel.

The FCLK/SSD hot loop spends its whole iteration on tensors XLA keeps in
HBM with degenerate layouts (r2 trace: 0.85 ms of duplicated tap-weight
construction in the sampling fusions + ~0.6 ms of Jacobian-chain fusions,
copies and T(2,128)-tiled slices per iteration at B=256 fleet scale).
This kernel computes, per tracker and per point tile, entirely in VMEM:

    tap weights (built ONCE, shared by value and both derivatives)
      -> two bf16 MXU contractions against the cropped window
      -> val / dx / dy row reductions
      -> SSD residual r = templ - val
      -> g = J^T r with J = dx*Jx + dy*Jy     (the LK gradient step)

HBM traffic per iteration: the cropped window (reused across tiles), the
(2, N) points, the (2S, N) warp Jacobian, the (N,) template, and the
(N,) value + (S,) partial-gradient outputs.

Layout rule that makes this fast where two earlier kernels were not:
EVERYTHING is lanes-major. Points/template/Jacobian rows live on the
128-lane axis ((1, TN)-shaped blocks, never (TN, 1)); tap weights are
built TRANSPOSED (Wc, TN) with the iota on the sublane axis, so the
MXU dots are sub (Hc, Wc) @ wxT (Wc, TN) and no operand, intermediate or
output is ever relayouted. The previous interface's trailing-1 blocks
((B, N, 1)) cost ~7 ms/iter in 1/128-efficiency pads/slices/copies.

Used by sm/lk.py for the forward-compositional fast paths: SSD (any
channel count — MC windows are channel-stacked with ONE shared weight
build), NCC (exact centered-norm gradient + closed-form self Hessian,
single point tile), and the ESM mean-Jacobian variant (constant J0
operand). Everything else falls back to the XLA dense path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtf_tpu.ops.pallas.dense_sample import _weights_dense

Array = jax.Array

_TN = 1280        # points per tile when tiling is needed
_FULL_MAX = 4096  # single full-array tile up to this many points


def _tile_of(n: int) -> int:
    """Tile size for n points. Mosaic allows a block equal to the full
    array dimension regardless of 128-alignment, so any n <= _FULL_MAX
    runs as ONE tile with NO padding — the (B, 2S, NP) zero-pad
    dynamic-update-slices otherwise cost ~0.46 ms/iter at fleet scale."""
    if n <= _FULL_MAX:
        return n
    return _TN


def _chain_tile_of(n: int, hc: int) -> tuple[int, int]:
    """(tile, band) for the chain kernel. Windows taller than 128 rows
    force TN=1280 tiling so each tile is a y-banded slab (see
    _chain_kernel); shorter windows keep the single-tile fast path with
    band == hc (no dynamic slice)."""
    if hc > 128 and n > _TN:
        return _TN, 128
    return _tile_of(n), hc


def _kernel(kind, hc, wc, n_s, tn, x_ref, y_ref, sub_ref, jac_ref,
            templ_ref, val_ref, g_ref, h_ref):
    lo = 0.001 if kind == "linear" else 1.001
    hix = (wc - 1.001) if kind == "linear" else (wc - 2.001)
    hiy = (hc - 1.001) if kind == "linear" else (hc - 2.001)
    x = jnp.clip(x_ref[0, 0, :], lo, hix)                  # (TN,) lanes
    y = jnp.clip(y_ref[0, 0, :], lo, hiy)

    # transposed tap weights: iota on the SUBLANE axis, points on lanes
    kx = jax.lax.broadcasted_iota(jnp.int32, (wc, tn), 0).astype(jnp.float32)
    wxt, dpxt = _weights_dense(kx - x[None, :], kind)       # (Wc, TN)
    ky = jax.lax.broadcasted_iota(jnp.int32, (hc, tn), 0).astype(jnp.float32)
    wyt, dpyt = _weights_dense(ky - y[None, :], kind)       # (Hc, TN)

    sub = sub_ref[0, :, :]                                  # (Hc, Wc) bf16
    tmp = jnp.dot(sub, wxt.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)       # (Hc, TN)
    tmp_dx = jnp.dot(sub, dpxt.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)

    val = jnp.sum(wyt * tmp, axis=0)                        # (TN,) lanes
    dx = -jnp.sum(wyt * tmp_dx, axis=0)
    dy = -jnp.sum(dpyt * tmp, axis=0)
    val_ref[0, 0, :] = val

    r = templ_ref[0, 0, :] - val                            # SSD residual
    jac = jac_ref[0, :, :]                                  # (2S, TN)
    Jm = jac[:n_s, :] * dx[None, :] + jac[n_s:, :] * dy[None, :]  # (S, TN)
    g = jnp.sum(Jm * r[None, :], axis=1, keepdims=True)     # (S, 1)
    g_ref[0, 0, 0, :] = g[:, 0]
    # per-tile normal matrix J^T J (SSD GN Hessian = -(sum over tiles));
    # (S, TN) x (S, TN) contracting the lane axis — tiny MXU dot at full
    # precision (the GN step solves against it; bf16 operand rounding is
    # a free 0.4% H error otherwise)
    h_ref[0, 0, :, :] = jax.lax.dot_general(
        Jm, Jm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _pallas_batched(subs, xy, jac, templ, kind, interpret=False):
    """subs (B, Hc, Wc) bf16, xy (B, 2, NP), jac (B, 2S, NP),
    templ (B, NP) -> (val (B, NP), g (B, T, S))."""
    b, hc, wc = subs.shape
    n_pad = xy.shape[2]
    n_s = jac.shape[1] // 2
    tn = _tile_of(n_pad)
    t = n_pad // tn
    vec = pl.BlockSpec((1, 1, tn), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    jblk = pl.BlockSpec((1, 2 * n_s, tn), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    sub_blk = pl.BlockSpec((1, hc, wc), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    gblk = pl.BlockSpec((1, 1, 1, n_s), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    hblk = pl.BlockSpec((1, 1, n_s, n_s), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    val, g, h = pl.pallas_call(
        functools.partial(_kernel, kind, hc, wc, n_s, tn),
        grid=(b, t),
        in_specs=[vec, vec, sub_blk, jblk, vec],
        out_specs=(vec, gblk, hblk),
        out_shape=(jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((b, t, 1, n_s), jnp.float32),
                   jax.ShapeDtypeStruct((b, t, n_s, n_s), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n_pad * hc * wc, transcendentals=0,
            bytes_accessed=b * (hc * wc * 2 + n_pad * 4 * (2 * n_s + 4))),
        interpret=interpret,
    )(xy[:, :1], xy[:, 1:], subs, jac, templ[:, None])
    return val[:, 0], g[:, :, 0], h


@functools.lru_cache(maxsize=None)
def _core_for(kind: str, interpret: bool = False):
    @jax.custom_batching.custom_vmap
    def core(sub, xy, jac, templ):
        val, g, h = _pallas_batched(sub[None], xy[None], jac[None],
                                    templ[None], kind, interpret)
        return val[0], g[0], h[0]

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, sub, xy, jac, templ):  # noqa: F811
        bcast = lambda z, b: z if b else jnp.broadcast_to(  # noqa: E731
            z[None], (axis_size,) + z.shape)
        out = _pallas_batched(bcast(sub, in_batched[0]),
                              bcast(xy, in_batched[1]),
                              bcast(jac, in_batched[2]),
                              bcast(templ, in_batched[3]), kind,
                              interpret)
        return out, (True, True, True)

    return core


def lk_fused_gn_t(img: Array, ptsT: Array, jacT: Array, templ: Array,
                  kind: str = "linear", crop: int | None = None,
                  interpret: bool = False):
    """Transposed-input fast path: ptsT (2, N), jacT (2S, N) already
    lanes-major (rows [Jx_0..Jx_{S-1}; Jy_0..Jy_{S-1}]) — the caller
    keeps the whole warp/Jacobian chain in (3, N)/(S, N) orientation so
    NOTHING is relayouted between XLA and the kernel (the (N, 2, S) ->
    (2S, N) transpose otherwise costs ~0.5 ms/iter at fleet scale).
    Returns (val (N,), g (S,), JtJ (S, S))."""
    h, w = img.shape
    x, y = ptsT[0], ptsT[1]
    n = x.shape[0]
    n_s = jacT.shape[0] // 2
    if crop is not None and (crop < h or crop < w):
        hc, wc = min(crop, h), min(crop, w)
        x0 = jnp.clip(jnp.floor(jnp.min(x)) - 2.0, 0.0, float(w - wc))
        y0 = jnp.clip(jnp.floor(jnp.min(y)) - 2.0, 0.0, float(h - hc))
        sub = jax.lax.dynamic_slice(
            img, (y0.astype(jnp.int32), x0.astype(jnp.int32)), (hc, wc))
        ptsT = ptsT - jnp.stack([x0, y0])[:, None]
    else:
        sub = img
    tile = _tile_of(n)
    if n % tile != 0:
        pad = ((n + tile - 1) // tile) * tile - n
        ptsT = jnp.pad(ptsT, ((0, 0), (0, pad)))
        jacT = jnp.pad(jacT, ((0, 0), (0, pad)))
        templ = jnp.pad(templ, ((0, pad),))
    val, g, h_ = _core_for(kind, interpret)(
        sub.astype(jnp.bfloat16), ptsT, jacT, templ)
    return val[:n], jnp.sum(g, axis=0), jnp.sum(h_, axis=0)


def _chain_kernel(kind, hc, wc, n_s, rpad, tn, n_valid, band, blur, grp,
                  am, esm, ch, *refs):
    refs = list(refs)
    sub_ref, a_ref, ph_ref, templ_ref = refs[:4]
    j0_ref = refs[4] if esm else None
    outs = refs[4 + int(esm):]
    val_ref, g_ref, h_ref = outs[:3]
    mom_ref, scal_ref = (outs[3], outs[4]) if am == "ncc" else (None, None)
    for _g in range(grp):
        _chain_kernel_one(kind, hc, wc, n_s, rpad, tn, n_valid, band,
                          blur, am, ch, _g, sub_ref, a_ref, ph_ref,
                          templ_ref, j0_ref, val_ref, g_ref, h_ref,
                          mom_ref, scal_ref)


def _chain_kernel_one(kind, hc, wc, n_s, rpad, tn, n_valid, band, blur,
                      am, ch, g_i, sub_ref, a_ref, ph_ref, templ_ref,
                      j0_ref, val_ref, g_ref, h_ref, mom_ref=None,
                      scal_ref=None):
    """Whole LK iteration from the 3x3 warp algebra up: point projection,
    quotient-rule warp Jacobian, tap weights, MXU sampling contractions,
    SSD residual, g = J^T r and J^T J — no per-point tensor ever leaves
    VMEM. Inputs per tile: A ((8+3R, 3) stacked [M0; rows of M0 G_s]),
    ph ((3, TN) homogeneous base points), templ, the cropped window.

    `band` < hc activates y-banding: each point tile is a consecutive
    row-major slab of the warped grid, so its y-extent is a narrow band
    of the window (projective maps keep the slab inside its warped
    corner quad). The sampling dots then contract a dynamically-sliced
    (band, Wc) window row block: M = band = 128 exactly fills the MXU
    row tiles, where M = hc = 144 padded to 256 wasted 44% of every
    sampling dot (the dominant kernel cost at fleet scale)."""
    A = a_ref[g_i]                                          # (8+3R, 3)
    ph = ph_ref[g_i]                                        # (3, TN)
    # precision HIGHEST: Q carries point COORDS at window scale (0-144;
    # bf16 ulp 0.5 px) — the Mosaic default rounds f32 matmul operands
    # to bf16, which the r4 GT audit measured as a ~1 px tracking bias.
    # This dot is (8+3R, 3)x(3, TN): full precision is free next to the
    # (band, Wc)x(Wc, TN) sampling dots (which stay bf16 — they carry
    # VALUES, where bf16 noise costs ~0.1 px, not a bias).
    Q = jax.lax.dot_general(A, ph, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    winv = 1.0 / Q[2, :]
    xr = Q[0, :] * winv                                     # (TN,) lanes
    yr = Q[1, :] * winv
    Qx = Q[8:8 + n_s, :]                                    # (S, TN)
    Qy = Q[8 + rpad:8 + rpad + n_s, :]
    Qw = Q[8 + 2 * rpad:8 + 2 * rpad + n_s, :]
    # quotient rule: d(u/w)/dp = (du - (u/w) dw) / w
    jx = (Qx - xr[None, :] * Qw) * winv[None, :]
    jy = (Qy - yr[None, :] * Qw) * winv[None, :]

    # zero padded lanes (pad columns are (0,0,1) points with LIVE
    # Jacobians — mask J so they contribute to neither g nor J^T J)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)[0, :]
    live = lane + pl.program_id(1) * tn < n_valid

    # blurred-tap phases widen the kernel support by the binomial
    # radius (blur taps have length 2*blur-1): clip margins grow so all
    # taps stay inside the window (the fast-path crop leaves >=4 px of
    # margin, LKBase._update)
    br = (blur - 1) if blur and blur > 1 else 0
    lo = (0.001 if kind == "linear" else 1.001) + br
    hix = ((wc - 1.001) if kind == "linear" else (wc - 2.001)) - br
    if band < hc:
        # band start: masked min of the tile's y coords (pad points
        # project to y=0 and must not drag the band off the slab),
        # aligned down to the bf16 sublane tile (16)
        ymin = jnp.min(jnp.where(live, yr, jnp.float32(hc)))
        y0i = jnp.floor(ymin).astype(jnp.int32) - 2 - br
        y0i = jnp.bitwise_and(jnp.clip(y0i, 0, hc - band), ~15)
        y0i = pl.multiple_of(y0i, 16)

        def sub_of(c):
            # MC windows are channel-stacked rows (C*Hc, Wc); callers
            # guarantee hc % 16 == 0 so the dynamic start stays
            # sublane-tile aligned for every channel
            return sub_ref[g_i, pl.ds(c * hc + y0i, band), :]
        y0f = y0i.astype(jnp.float32)
    else:
        def sub_of(c):
            return sub_ref[g_i, c * hc:(c + 1) * hc, :]
        y0f = jnp.float32(0.0)
    hiy = ((band - 1.001) if kind == "linear" else (band - 2.001)) - br
    if band < hc:
        # in-band mask (r5 session 2): a warp that stretches the
        # row-major point slab past the y band would sample band-edge
        # garbage — exclude such points from every reduction (they keep
        # the full-window edge-clamp semantics only when band == hc)
        live = jnp.logical_and(
            live, jnp.logical_and(yr - y0f >= lo, yr - y0f <= hiy))
    x = jnp.clip(xr, lo, hix)
    y = jnp.clip(yr - y0f, lo + 0.0, hiy)
    kx = jax.lax.broadcasted_iota(jnp.int32, (wc, tn), 0).astype(jnp.float32)
    wxt, dpxt = _weights_dense(kx - x[None, :], kind, blur)  # (Wc, TN)
    ky = jax.lax.broadcasted_iota(jnp.int32, (band, tn), 0).astype(
        jnp.float32)
    wyt, dpyt = _weights_dense(ky - y[None, :], kind, blur)  # (band, TN)

    # per-channel sampling against the SHARED tap weights — the weight
    # build is the kernel's VPU bottleneck, so MC costs only `ch` extra
    # MXU dots, not `ch` weight builds (AM/src/MC*.cc channel semantics)
    wxb = wxt.astype(jnp.bfloat16)
    dxb = dpxt.astype(jnp.bfloat16)
    lv = live.astype(jnp.float32)
    g_acc = h_acc = None
    val = dx = dy = None
    for c in range(ch):
        sub = sub_of(c)
        tmp = jnp.dot(sub, wxb,
                      preferred_element_type=jnp.float32)   # (band, TN)
        tmp_dx = jnp.dot(sub, dxb, preferred_element_type=jnp.float32)
        val = jnp.sum(wyt * tmp, axis=0)
        dx = -jnp.sum(wyt * tmp_dx, axis=0)
        dy = -jnp.sum(dpyt * tmp, axis=0)
        val_ref[g_i, c, :] = val
        Jm = (jx * dx[None, :] + jy * dy[None, :]) * lv[None, :]  # (S, TN)
        if j0_ref is not None:
            # ESM: mean of current + (constant) template Jacobians
            # (NT/ESM.cc:228-230); J0 padded columns are zero so the
            # live mask is preserved (single-channel only — gated)
            Jm = 0.5 * (Jm + j0_ref[g_i])
        if am == "ncc":
            break                         # NCC handled below (ch == 1)
        gI = templ_ref[g_i, c, :] - val                    # SSD residual
        g_c = jnp.sum(Jm * gI[None, :], axis=1, keepdims=True)
        h_c = jax.lax.dot_general(
            Jm, Jm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g_acc = g_c if g_acc is None else g_acc + g_c
        h_acc = h_c if h_acc is None else h_acc + h_c

    if am == "ncc":
        # NCC in MOMENT form (r5 session 2): every statistic the NCC
        # gradient and selft Hessian need is LINEAR in per-tile sums of
        # (val, Jm) products, so each tile emits raw moments and the
        # XLA side (lk_fused_chain) does the one nonlinear combine —
        # which makes NCC bandable/tileable exactly like SSD (the old
        # single-tile form pinned the sampling dots at M = hc = 144,
        # wasting 44% of every MXU row tile vs the 128-row band).
        # Per tile (lanes masked):
        #   s1 = Σ v,  s2 = Σ v²,  s3 = Σ n0 v   (f32 VPU sums — the
        #   one-pass-variance cancellation that broke the grid kernel
        #   came from bf16 MXU stat DOTS, not f32 VPU reductions;
        #   f32 leaves mu²·1e-7 ≪ var)
        #   a = Σ Jm n0,  bv = Σ Jm v,  mrow = Σ Jm,  R = Σ Jm Jmᵀ
        lv = live.astype(jnp.float32)
        vm = val * lv
        n0 = templ_ref[g_i, 0, :]                           # unit template
        li = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)[0, :]
        scal = (jnp.where(li == 0, jnp.sum(vm), 0.0)
                + jnp.where(li == 1, jnp.sum(vm * val), 0.0)
                + jnp.where(li == 2, jnp.sum(n0 * vm), 0.0)
                # dynamic live count + masked Σn0 (the in-band mask can
                # drop points beyond the static pad count)
                + jnp.where(li == 3, jnp.sum(lv), 0.0)
                + jnp.where(li == 4, jnp.sum(n0 * lv), 0.0))
        scal_ref[g_i, 0, 0, :] = scal.astype(jnp.float32)
        g_ref[g_i, 0, 0, :] = jnp.sum(Jm * n0[None, :], axis=1)
        mom_ref[g_i, 0, 0, :] = jnp.sum(Jm * vm[None, :], axis=1)
        mom_ref[g_i, 0, 1, :] = jnp.sum(Jm, axis=1)
        # R at HIGHEST: the XLA combine subtracts nv·m mᵀ and u uᵀ from
        # R — a genuine cancellation (unlike SSD's direct J^T J) that
        # bf16 operand rounding would feed straight into the Hessian
        h_ref[g_i, 0, :, :] = jax.lax.dot_general(
            Jm, Jm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return
    # SSD: channel-summed g and J^T J (the per-channel dots ran in the
    # sampling loop above). H at DEFAULT (bf16-operand) precision: unlike
    # the coordinate dots, H only steers the GN step — the r4 sweep
    # measured +2.6% fps for 0.06 px corner movement, and the fleet GT
    # leg stays ~0.1 px
    g_ref[g_i, 0, 0, :] = g_acc[:, 0]
    h_ref[g_i, 0, :, :] = h_acc


@functools.lru_cache(maxsize=None)
def _chain_core_for(kind: str, n_s: int, n_valid: int,
                    interpret: bool = False, blur: int = 0,
                    am: str = "ssd", esm: bool = False, ch: int = 1):
    def batched(subs, A, ph, templ, j0=None):
        b, hcc, wc = subs.shape
        hc = hcc // ch
        n_pad = ph.shape[2]
        rpad = (A.shape[1] - 8) // 3
        # NCC tiles/bands like SSD since the moment-form rewrite (the
        # nonlinear stats combine happens in XLA over per-tile moments)
        tn, band = _chain_tile_of(n_pad, hc)
        if ch > 1 and band < hc and hc % 16:
            # banded MC needs every channel's dynamic row start
            # (c*hc + y0) 16-aligned
            band = hc
        t = n_pad // tn
        # tracker grouping: decimated coarse phases (small N) are
        # launch/DMA-overhead-bound — at B=1024 the per-grid-step fixed
        # cost dominates a ~50 us compute payload. Packing `grp`
        # trackers per grid step amortizes it (r4 same-session sweep:
        # grp 8 -> 58.2k, 32 -> 60.1k fps); full-resolution calls keep
        # grp=1 (their VMEM working set is already ~6 MB).
        grp = 32 if (n_pad <= 1024 and band == hc) else 1
        while grp > 1 and b % grp:
            grp //= 2
        gb = b // grp
        sub_blk = pl.BlockSpec((grp, ch * hc, wc), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        ablk = pl.BlockSpec((grp, A.shape[1], 3), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        phblk = pl.BlockSpec((grp, 3, tn), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        vec = pl.BlockSpec((grp, ch, tn), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
        gblk = pl.BlockSpec((grp, 1, 1, n_s), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        hblk = pl.BlockSpec((grp, 1, n_s, n_s), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
        in_specs = [sub_blk, ablk, phblk, vec]
        operands = [subs, A, ph, templ]          # templ: (b, ch, n_pad)
        if esm:
            j0blk = pl.BlockSpec((grp, n_s, tn), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
            in_specs.append(j0blk)
            operands.append(j0)
        out_specs = [vec, gblk, hblk]
        out_shape = [jax.ShapeDtypeStruct((b, ch, n_pad), jnp.float32),
                     jax.ShapeDtypeStruct((b, t, 1, n_s), jnp.float32),
                     jax.ShapeDtypeStruct((b, t, n_s, n_s), jnp.float32)]
        if am == "ncc":
            # per-tile raw moments: [Σ Jm v; Σ Jm] rows + the scalar
            # stats (s1, s2, s3) on the first 3 lanes of an (8,) vector
            out_specs.append(pl.BlockSpec((grp, 1, 2, n_s),
                                          lambda i, j: (i, j, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((b, t, 2, n_s), jnp.float32))
            out_specs.append(pl.BlockSpec((grp, 1, 1, 8),
                                          lambda i, j: (i, j, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((b, t, 1, 8),
                                                  jnp.float32))
        outs = pl.pallas_call(
            functools.partial(_chain_kernel, kind, hc, wc, n_s, rpad, tn,
                              n_valid, band, blur, grp, am, esm, ch),
            grid=(gb, t),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * ch * b * n_pad * band * wc, transcendentals=0,
                bytes_accessed=b * (ch * hc * wc * 2 + n_pad * 4 * 5)),
            interpret=interpret,
        )(*operands)
        return (outs[0], outs[1][:, :, 0]) + tuple(outs[2:])

    if esm:
        @jax.custom_batching.custom_vmap
        def core(sub, A, ph, templ, j0):
            out = batched(sub[None], A[None], ph[None], templ[None],
                          j0[None])
            return jax.tree.map(lambda z: z[0], out)

        @core.def_vmap
        def _core_vmap(axis_size, in_batched, sub, A, ph, templ, j0):  # noqa: F811,E501
            bcast = lambda z, b: z if b else jnp.broadcast_to(  # noqa: E731
                z[None], (axis_size,) + z.shape)
            out = batched(bcast(sub, in_batched[0]), bcast(A, in_batched[1]),
                          bcast(ph, in_batched[2]),
                          bcast(templ, in_batched[3]),
                          bcast(j0, in_batched[4]))
            return out, jax.tree.map(lambda _: True, out)

        return core

    @jax.custom_batching.custom_vmap
    def core(sub, A, ph, templ):
        out = batched(sub[None], A[None], ph[None], templ[None])
        return jax.tree.map(lambda z: z[0], out)

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, sub, A, ph, templ):  # noqa: F811
        bcast = lambda z, b: z if b else jnp.broadcast_to(  # noqa: E731
            z[None], (axis_size,) + z.shape)
        out = batched(bcast(sub, in_batched[0]), bcast(A, in_batched[1]),
                      bcast(ph, in_batched[2]), bcast(templ, in_batched[3]))
        return out, jax.tree.map(lambda _: True, out)

    return core


def lk_fused_chain(img: Array, M0: Array, gens: Array, ph: Array,
                   templ: Array, kind: str = "linear",
                   interpret: bool = False, blur: int = 0,
                   am: str = "ssd", j0: Array | None = None,
                   channels: int = 1):
    """Chain-fused LK iteration: ONLY 3x3-scale warp algebra stays in XLA.

    img (Hc, Wc) pre-cropped window; M0 (3, 3) mapping the homogeneous
    base points ph (3, N) to window coords; gens (S, 3, 3) SSM generator
    basis (d to_matrix / dp at identity); templ (N,). Returns
    (val (N,), g (S,) = J^T(templ - val), JtJ (S, S)) — points, warp
    Jacobian, sampling and reductions all happen inside the kernel, so
    per-iteration HBM traffic is O(window + N) instead of O(N * 2S).

    `am`: "ssd" (g = J^T(templ - val)) or "ncc" (templ is the CENTERED
    UNIT-NORM template n0; the exact NCC patch gradient and selft
    Hessian are assembled from per-tile raw moments — banded/tiled
    exactly like SSD since the r5 moment-form rewrite, any N).
    `j0`: optional (S, N) constant template-side
    Jacobian — when given, J := (J + J0)/2 (the ESM mean Jacobian,
    NT/ESM.cc:228-230) before the reductions, and the returned JtJ is
    the ESM-Jacobian normal matrix.

    `channels` > 1 (SSD only): `img` is the CHANNEL-STACKED window
    (C*Hc, Wc) and `templ` is (C, N); g/JtJ sum over channels and val
    returns (C, N). The tap-weight build is shared across channels.
    """
    n = ph.shape[1]
    n_s = gens.shape[0]
    if templ.ndim == 1:
        templ = templ[None, :]
    rpad = ((n_s + 7) // 8) * 8
    rows = 8 + 3 * rpad
    # A is LINEAR in M0 (gens are trace-time constants), so assemble it
    # as ONE (9,) @ (9, rows*3) matvec against a constant embedding
    # tensor instead of 4 dynamic-update-slices — at B=256 fleet scale
    # the vmapped DUS chain measured ~0.2 ms/iter on chip
    gens_np = np.asarray(gens, np.float32)
    C = np.zeros((3, 3, rows, 3), np.float32)
    for r in range(3):
        for k in range(3):
            C[r, k, r, k] = 1.0                 # rows 0-2: M0 itself
    for b in range(3):
        for s in range(n_s):
            # A[8 + b*rpad + s, k] = sum_j M0[b, j] G_s[j, k]
            C[b, :, 8 + b * rpad + s, :] = gens_np[s]
    # precision HIGHEST: M0 carries window-scale translations (bf16 ulp
    # 0.5 px at 144) and A seeds every coordinate in the kernel
    A = jnp.matmul(M0.reshape(9), jnp.asarray(C.reshape(9, rows * 3)),
                   precision=jax.lax.Precision.HIGHEST).reshape(rows, 3)
    tile, _ = _chain_tile_of(n, img.shape[0])
    if n % tile != 0:
        pad = ((n + tile - 1) // tile) * tile - n
        # pad with (0, 0, 1) points: finite projection, masked residual
        ph = jnp.concatenate(
            [ph, jnp.tile(jnp.asarray([[0.0], [0.0], [1.0]], ph.dtype),
                          (1, pad))], axis=1)
        templ = jnp.pad(templ, ((0, 0), (0, pad)))
        if j0 is not None:
            j0 = jnp.pad(j0, ((0, 0), (0, pad)))
    core = _chain_core_for(kind, n_s, n, interpret, blur, am,
                           j0 is not None, channels)
    if j0 is not None:
        outs = core(img.astype(jnp.bfloat16), A, ph, templ, j0)
    else:
        outs = core(img.astype(jnp.bfloat16), A, ph, templ)
    val = outs[0][:, :n]
    if channels == 1:
        val = val[0]
    if am != "ncc":
        return val, jnp.sum(outs[1], axis=0), jnp.sum(outs[2], axis=0)
    # NCC moment combine (see _chain_kernel_one): the per-tile sums are
    # linear, so summing tiles THEN applying the nonlinear stats equals
    # the single-tile closed form exactly. `templ` here is the centered
    # unit template n0; eps conventions mirror am/ncc.py _center_norm.
    a = jnp.sum(outs[1], axis=0)                     # Σ Jm n0   (S,)
    R = jnp.sum(outs[2], axis=0)                     # Σ Jm Jmᵀ  (S, S)
    mom = jnp.sum(outs[3], axis=0)                   # (2, S)
    s = jnp.sum(outs[4], axis=0)[0]                  # (8,)
    bv, mrow = mom[0], mom[1]
    s1, s2, s3 = s[0], s[1], s[2]
    nv = jnp.maximum(s[3], 1.0)         # live count (in-band mask aware)
    mu = s1 / nv
    var = jnp.maximum(s2 - s1 * s1 / nv, 1e-12)
    nrm = jnp.sqrt(var)
    eps = 1e-8
    sum_n0 = s[4]                       # Σ n0 over live lanes (~0)
    dotc = s3 - mu * sum_n0
    jc = bv - mu * mrow                 # Σ Jm c
    g_out = a / (nrm + eps) - dotc * jc / (nrm * (nrm + eps) ** 2)
    # selft Hessian (NEGATED, matching the SSD h convention):
    # (ΣJcJcᵀ - uuᵀ)/r² with ΣJcJcᵀ = R - nv m mᵀ, u = (ΣJm c)/(r+eps)
    m = mrow / nv
    u = jc / (nrm + eps)
    h_out = (R - nv * jnp.outer(m, m) - jnp.outer(u, u)) / var
    return val, g_out, h_out


# NOTE r4: the non-transposed `lk_fused_gn` wrapper and the
# standalone parts-sampling kernel (dense_sample.py) were deleted
# after the settling measurement (log/ab_parts_r4.log) — the chain
# kernel above is the production path; `lk_fused_gn_t` is retained
# as the independent jvp-Jacobian oracle for its parity test.
