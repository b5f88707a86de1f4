"""Grid tracker with patches AND RANSAC hypotheses sharded over a mesh.

BASELINE milestone config #5: "multi-patch grid + RANSAC homography across
multi-host mesh". The reference parallelizes the grid's sub-trackers with
a TBB `parallel_for` that its own ReadMe reports never scaled
(`/root/reference/SM/src/GridTracker.cc:247-261`, `ReadMe.md:128-130`) and
scores RANSAC hypotheses in a serial loop
(`SSM/src/SSMEstimator.cc:73-130`). Here both populations are mesh axes:

  * patch flow: the (P, n) pyramidal-LK micro-solves — the grid's entire
    compute cost — run on P/n_dev local patches per shard
    (`_track_patches_pyr` override); the resulting (P, 2) displacements
    are `all_gather`ed (tiny, rides ICI);
  * robust fit: the H minimal-sample hypotheses are drawn from one
    replicated key (the same set the single-chip fit scores), fitted and
    scored H/n_dev per shard against the full (replicated) correspondence
    set, and the per-shard best (score, state) pairs `all_gather`ed; the
    winner's inlier weights and the weighted least-squares refit are
    recomputed replicated (`_fit_warp` override).

Tie-breaking matches the unsharded argmax/argmin (lowest shard = lowest
global hypothesis index), so sharded == unsharded exactly for the same
seed (tests/test_shard_parity.py). Populations not divisible by the mesh
are padded (patches: repeated rows whose displacements are discarded;
hypotheses: extra rows of the same replicated draw).

RKLT composes unchanged: hand `ShardedGridTracker` to `sm.composite.RKLT`
as its grid stage and the SOTA config (ReadMe.md:432) runs its grid leg
sharded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mtf_tpu.ops import ransac
from mtf_tpu.sm.grid import GridParams, GridTracker

Array = jax.Array


def _pad_to(x: Array, m: int, axis: int = 0) -> Array:
    """Pad axis to a multiple of m by repeating the last slice."""
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    reps = [1] * x.ndim
    reps[axis] = pad
    return jnp.concatenate([x, jnp.tile(last, reps)], axis=axis)


class ShardedGridTracker(GridTracker):
    """GridTracker whose patch and hypothesis populations shard over
    `mesh[axis]`. Public API identical to `GridTracker`."""

    name = "grid_sharded"

    def __init__(self, am, ssm, prm=None, grid: GridParams | None = None,
                 *, mesh: Mesh, axis: str = "patch"):
        super().__init__(am, ssm, prm, grid)
        self.mesh = mesh
        self.axis = axis

    # -- patch flow: shard the (P, ...) micro-solve populations -----------
    def _track_patches_pyr(self, frame, norm_mat, pts_base, templates,
                           n_iters):
        ax = self.axis
        n_dev = self.mesh.shape[ax]
        Pn = pts_base.shape[0]
        pts_p = _pad_to(pts_base, n_dev)
        tmpl_p = _pad_to(templates, n_dev, axis=1)

        def shard_flow(pts_loc, tmpl_loc, frame, norm_mat):
            return GridTracker._track_patches_pyr(
                self, frame, norm_mat, pts_loc, tmpl_loc, n_iters)

        disp = jax.shard_map(
            shard_flow, mesh=self.mesh,
            in_specs=(P(ax), P(None, ax), P(), P()), out_specs=P(ax),
            check_vma=False)(pts_p, tmpl_p, frame, norm_mat)
        return disp[:Pn]

    # -- robust fit: shard the hypothesis population -----------------------
    def _fit_warp(self, region, centers0, centers_new, k_fit, weights=None):
        g, ssm = self.grid, self.ssm
        ax = self.axis
        n_dev = self.mesh.shape[ax]
        scale = region.norm_mat[0, 0]
        thresh = g.inlier_thresh_px / scale
        ss = ransac.min_sample_size(ssm)
        H = -(-g.n_hyps // n_dev) * n_dev       # padded hypothesis count
        H_loc = H // n_dev
        n = centers0.shape[0]
        w_in = (weights if weights is not None
                else jnp.ones((n,), centers0.dtype))
        if g.estimator not in ("ransac", "lmeds", "least_median"):
            # plain (weighted) least squares: no hypothesis population
            return ssm.fit_pts(centers0, centers_new, weights=w_in), w_in
        # replicated draw: rows [0, n_hyps) are the single-chip set; the
        # padding rows only ADD candidates, and for n_hyps % n_dev == 0
        # (every shipped config) the set matches exactly
        idx = ransac.hyp_indices(k_fit, H, n, ss)
        lmeds = g.estimator in ("lmeds", "least_median")

        def shard_score(idx_loc, src, dst, w):
            i_dev = jax.lax.axis_index(ax)
            hyps = jax.vmap(lambda i: ssm.fit_pts(src[i], dst[i]))(idx_loc)
            res = jax.vmap(lambda s: jnp.linalg.norm(
                ssm.warp_pts(s, src) - dst, axis=-1))(hyps)     # (H_loc, N)
            valid = jnp.all(jnp.isfinite(hyps), axis=-1)
            if lmeds:
                med = jnp.median(res * res, axis=1)
                score = jnp.where(valid, -med, -jnp.inf)        # max = best
            else:
                inl = (res < thresh).astype(src.dtype) * w[None, :]
                score = jnp.where(valid, jnp.sum(inl, axis=1), -1.0)
            j = jnp.argmax(score)
            s_all = jax.lax.all_gather(score[j], ax)            # (n_dev,)
            h_all = jax.lax.all_gather(hyps[j], ax)             # (n_dev, S)
            # argmax picks the lowest shard on ties == lowest global index
            best = jnp.argmax(s_all)
            return h_all[best], s_all[best]

        best_hyp, best_score = jax.shard_map(
            shard_score, mesh=self.mesh,
            in_specs=(P(ax), P(), P(), P()), out_specs=(P(), P()),
            check_vma=False)(idx, centers0, centers_new, w_in)

        # winner's inliers + weighted refit, replicated (cheap: (N,) ops)
        res = jnp.linalg.norm(
            ssm.warp_pts(best_hyp, centers0) - centers_new, axis=-1)
        if lmeds:
            sigma = 1.4826 * jnp.sqrt(-best_score) + 1e-12
            w = (res < 2.5 * sigma).astype(centers0.dtype)
            if weights is not None:
                w = w * weights
        else:
            w = (res < thresh).astype(centers0.dtype) * w_in
        w = jnp.where(jnp.sum(w) >= ss, w, jnp.ones_like(w))
        return ssm.fit_pts(centers0, centers_new, weights=w), w
