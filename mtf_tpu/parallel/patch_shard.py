"""Pixel-sharded Gauss-Newton: intra-patch parallelism over a mesh axis.

The reference's per-iteration cost is the N-point warped gather, the (N,S)
Jacobian product, and the (S,S) Gauss-Newton reduction (SURVEY.md §3.2) —
its only answer was TBB block loops that never scaled (ReadMe.md:128-130).
Here the patch's pixel axis is sharded over the mesh: each device gathers
its own block of sampling points from the (replicated) frame, computes the
block Jacobian by forward-mode AD, and reduces the partial

    H_k = J_k^T J_k,   g_k = J_k^T r_k

with a single `psum` tree-reduction over ICI; the tiny (S,S) solve and the
compositional update are replicated. This is the sequence/tensor-parallel
analog for this workload (SURVEY.md §5.7): it makes very-high-resolution
templates (`resx*resy` in the 10^5-10^6 range) scale across chips.

Valid for AMs whose similarity is a sum of per-pixel terms (the SSDBase
family — SSD/NSSD/ZNCC/SAD semantics, SSDBase.cc:268-360): for those,
`grad_corrected` is pointwise so block rows of the residual are exact.
Patch-global AMs (NCC/MI/...) need their statistics psum'd first; those run
un-sharded or via the two-pass route in their own kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import TrackerState

Array = jax.Array


def sharded_gn_step(sm, state: TrackerState, frame: Array, mesh: Mesh,
                    axis: str = "pixel") -> TrackerState:
    """One forward-compositional GN step with the pixel axis sharded.

    `sm` supplies the AM/SSM/params; SSD-family AM assumed (see module
    docstring). Returns the state after one compositional update.
    """
    am, ssm, prm = sm.am, sm.ssm, sm.prm
    S = ssm.dof
    n_dev = mesh.shape[axis]
    base_pts = state.region.base_pts
    N = base_pts.shape[0]
    if N % n_dev != 0:
        raise ValueError(f"patch size {N} not divisible by mesh axis "
                         f"{axis!r} size {n_dev}")
    templ = state.am_state.template.reshape(N, -1)
    Ms = ssm.to_matrix(state.ssm_state)
    norm_mat = state.region.norm_mat

    def shard_step(pts_blk, templ_blk, frame):
        def patch_blk(dp):
            M = Ms @ ssm.to_matrix(dp)
            pts = W.apply_warp(norm_mat, W.apply_warp(M, pts_blk))
            return interp.sample(frame, pts, prm.interp, prm.border)

        zero = jnp.zeros((S,), jnp.float32)
        blk = patch_blk(zero)                          # (N/n_dev, C)
        J = jax.jacfwd(patch_blk)(zero).reshape(-1, S)  # (N/n_dev * C, S)
        r = (templ_blk - blk).reshape(-1)
        H = jax.lax.psum(J.T @ J, axis)
        g = jax.lax.psum(J.T @ r, axis)
        dp = jnp.linalg.solve(H + 1e-7 * jnp.eye(S, dtype=H.dtype), g)
        return dp

    dp = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(axis), P(axis), P()), out_specs=P())(
            base_pts, templ, frame)
    return state._replace(
        ssm_state=ssm.compositional_update(state.ssm_state, dp))
