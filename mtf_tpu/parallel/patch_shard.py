"""Pixel-sharded Gauss-Newton: intra-patch parallelism over a mesh axis.

The reference's per-iteration cost is the N-point warped gather, the (N,S)
Jacobian product, and the (S,S) Gauss-Newton reduction (SURVEY.md §3.2) —
its only answer was TBB block loops that never scaled (ReadMe.md:128-130).
Here the patch's pixel axis is sharded over the mesh: each device gathers
its own block of sampling points from the (replicated) frame and computes
the block pixel-Jacobian by forward-mode AD — the expensive, O(N) part.
Two reduction routes follow:

  * `local` — for pointwise-residual AMs (SSD/SAD: the similarity is a
    sum of per-pixel terms, SSDBase.cc:268-360): the partial normal
    equations  H_k = J_k^T J_k, g_k = J_k^T r_k  are psum'd over ICI and
    the tiny (S,S) solve is replicated. Minimal traffic: 2 collectives of
    S^2 + S floats.
  * `gather` — exact for EVERY AM, including patch-global ones (NCC's
    normalization, MI/CCRE's histograms, SSIM's moments): the per-shard
    patch blocks (N/n_dev, C) and Jacobian blocks (N/n_dev·C, S) are
    `all_gather`ed (KBs, rides ICI), and the AM's gradient + GN Hessian
    contraction (`grad_corrected` + the hvp chain of sm/lk.py
    `_hess_contract`) run replicated on the full patch — the statistics
    a patch-global AM needs are therefore computed on the SAME full
    population as the single-chip LK step, so sharded == unsharded
    exactly. The replicated O(N) similarity math is VPU-cheap; the O(N)
    sampling + AD that dominates stays sharded.

`mode="auto"` picks `local` for SSD/SAD, `gather` otherwise. This is the
sequence/tensor-parallel analog for this workload (SURVEY.md §5.7): it
makes very-high-resolution templates (`resx*resy` in the 10^5-10^6
range) scale across chips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.ops.linalg import neg_def_solve
from mtf_tpu.sm.core import TrackerState

Array = jax.Array

_POINTWISE_AMS = ("ssd", "sad")


def sharded_gn_step(sm, state: TrackerState, frame: Array, mesh: Mesh,
                    axis: str = "pixel", mode: str = "auto") -> TrackerState:
    """One forward-compositional GN step with the pixel axis sharded.

    `sm` supplies the AM/SSM/params. Returns the state after one
    compositional update. `mode`: "local" | "gather" | "auto" (see
    module docstring).
    """
    am, ssm, prm = sm.am, sm.ssm, sm.prm
    S = ssm.dof
    n_dev = mesh.shape[axis]
    base_pts = state.region.base_pts
    N = base_pts.shape[0]
    if N % n_dev != 0:
        raise ValueError(f"patch size {N} not divisible by mesh axis "
                         f"{axis!r} size {n_dev}")
    if mode == "auto":
        mode = "local" if am.name in _POINTWISE_AMS else "gather"
    templ = state.am_state.template.reshape(N, -1)
    C = templ.shape[1]
    Ms = ssm.to_matrix(state.ssm_state)
    norm_mat = state.region.norm_mat

    def _block_and_jac(pts_blk, frame):
        """Local block patch (nb, C) + pixel Jacobian (nb*C, S)."""
        def patch_blk(dp):
            M = Ms @ ssm.to_matrix(dp)
            pts = W.apply_warp(norm_mat, W.apply_warp(M, pts_blk))
            return interp.sample(frame, pts, prm.interp, prm.border)

        zero = jnp.zeros((S,), jnp.float32)
        blk = patch_blk(zero)
        J = jax.jacfwd(patch_blk)(zero)             # (nb, C, S)
        return blk, J

    if mode == "local":
        def shard_step(pts_blk, templ_blk, frame):
            blk, J = _block_and_jac(pts_blk, frame)
            J = J.reshape(-1, S)
            r = (templ_blk - blk).reshape(-1)
            H = jax.lax.psum(J.T @ J, axis)
            g = jax.lax.psum(J.T @ r, axis)
            return jnp.linalg.solve(
                H + 1e-7 * jnp.eye(S, dtype=H.dtype), g)

        dp = jax.shard_map(
            shard_step, mesh=mesh,
            in_specs=(P(axis), P(axis), P()), out_specs=P())(
                base_pts, templ, frame)
    elif mode == "gather":
        am_state = state.am_state

        def shard_step(pts_blk, frame):
            blk, J = _block_and_jac(pts_blk, frame)
            patch = jax.lax.all_gather(blk, axis, tiled=True)    # (N, C)
            J_full = jax.lax.all_gather(J, axis, tiled=True) \
                        .reshape(N * C, S)
            # patch-global similarity math, replicated on the full patch
            gI = am.grad_corrected(am_state, patch).reshape(-1)
            j = gI @ J_full

            # GN Hessian in the reference-preferred SELF flavor
            # (AppearanceModel.h:189-219): d2f/dI2 at a perfect match —
            # negative-definite for every AM (the std flavor at a
            # mismatched patch is indefinite for MI/CCRE and can repel)
            st_self = am.self_state(patch, am_state.p_am)

            def gfun(pf):
                return am.grad_corrected(
                    st_self, pf.reshape(N, C)).reshape(-1)

            p0 = patch.reshape(-1)
            hvp = lambda v: jax.jvp(gfun, (p0,), (v,))[1]  # noqa: E731
            cols = jax.vmap(hvp, in_axes=1, out_axes=1)(J_full)
            H = J_full.T @ cols                    # negative-definite GN
            return H, j

        # the (S,S) solve runs outside shard_map (the unrolled Cholesky's
        # triangular slicing does not lower under the sdy partitioner)
        H, j = jax.shard_map(
            shard_step, mesh=mesh,
            in_specs=(P(axis), P()), out_specs=(P(), P()),
            check_vma=False)(base_pts, frame)
        dp = neg_def_solve(H - 1e-7 * jnp.eye(S, dtype=H.dtype), j)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return state._replace(
        ssm_state=ssm.compositional_update(state.ssm_state, dp))
