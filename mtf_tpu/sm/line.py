"""LineTracker: grid tracker with line-structure constraints.

Re-designs `/root/reference/SM/src/LineTracker.cc` (743 LoC): a grid of
sub-trackers whose centers are constrained to lie on fitted horizontal and
vertical line structures (`lineParams`/`gridPoint`, `LineTracker.h:26-45`)
— built for scenes with strong rectilinear structure (documents, facades,
markers) where individual patches drift but rows/columns stay collinear.

Per update: (1) track all patches (batched translation-LK, as GridTracker);
(2) fit one line per grid row and per grid column by weighted total least
squares (closed-form 2x2 eigen, all lines vmapped); (3) snap each center
to its row x column line intersection; down-weight points whose snap
residual exceeds the line-confidence threshold (the reference's
inter/intra line-confidence); (4) robustly fit the SSM to the snapped
correspondences.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mtf_tpu.ops import ransac
from mtf_tpu.sm.core import TrackerState
from mtf_tpu.sm.grid import GridParams, GridState, GridTracker

Array = jax.Array


@dataclass(frozen=True)
class LineParams:
    """Line-constraint knobs (LineTracker.h lineParams analog)."""
    conf_thresh: float = 0.05   # snap-residual confidence (template units)


def _fit_line(pts: Array, w: Array):
    """Weighted TLS line through (K, 2) points -> (point (2,), dir (2,)).

    Direction = principal eigenvector of the weighted covariance
    (closed form for 2x2)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu = jnp.sum(w[:, None] * pts, axis=0) / wsum
    d = pts - mu
    cov = (w[:, None] * d).T @ d / wsum
    a, b, c = cov[0, 0], cov[0, 1], cov[1, 1]
    # principal eigenvector of [[a, b], [b, c]]
    tr, det = a + c, a * c - b * b
    lam = tr / 2 + jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    v = jnp.where(jnp.abs(b) > 1e-12,
                  jnp.stack([lam - c, b]),
                  jnp.where(a >= c, jnp.array([1.0, 0.0]),
                            jnp.array([0.0, 1.0])))
    return mu, v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


def _intersect(p1, d1, p2, d2):
    """Intersection of two parametric lines (falls back to midpoint of
    closest points when near-parallel)."""
    A = jnp.stack([d1, -d2], axis=1)           # (2, 2)
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    rhs = p2 - p1
    t = jnp.where(
        jnp.abs(det) > 1e-9,
        (rhs[0] * A[1, 1] - rhs[1] * A[0, 1]) / jnp.where(
            jnp.abs(det) > 1e-9, det, 1.0),
        0.0)
    return p1 + t * d1


class LineTracker(GridTracker):
    name = "line"

    def __init__(self, am, ssm, prm=None, grid: GridParams | None = None,
                 line: LineParams | None = None):
        super().__init__(am, ssm, prm, grid)
        self.line = line or LineParams()

    def _snap_to_lines(self, centers: Array, weights: Array):
        """centers (P, 2) on an RxR grid -> line-snapped centers +
        confidence weights."""
        R = self.grid.grid_res
        pts = centers.reshape(R, R, 2)          # [row, col]
        w = weights.reshape(R, R)

        row_mu, row_d = jax.vmap(_fit_line)(pts, w)               # (R, ...)
        col_mu, col_d = jax.vmap(_fit_line)(
            jnp.swapaxes(pts, 0, 1), jnp.swapaxes(w, 0, 1))

        def snap_one(r, c):
            return _intersect(row_mu[r], row_d[r], col_mu[c], col_d[c])

        rr, cc = jnp.meshgrid(jnp.arange(R), jnp.arange(R), indexing="ij")
        snapped = jax.vmap(snap_one)(rr.ravel(), cc.ravel())      # (P, 2)
        resid = jnp.linalg.norm(snapped - centers, axis=-1)
        conf = (resid < self.line.conf_thresh).astype(jnp.float32)
        return snapped, conf

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        g, ssm = self.grid, self.ssm
        gs: GridState = state.extra
        region = state.region
        key, k_fit = jax.random.split(gs.key)

        centers_pred = ssm.warp_pts(state.ssm_state, gs.centers0)
        if g.flow == "warped":
            pts_base = jax.vmap(
                lambda c: ssm.warp_pts(state.ssm_state,
                                       c[None, :] + gs.offsets))(gs.centers0)
        else:
            pts_base = centers_pred[:, None, :] + gs.offsets[None, :, :]
        disp = self._track_patches_pyr(
            frame, region.norm_mat, pts_base, gs.templates, g.sub_iters)
        centers_new = centers_pred + disp

        snapped, conf = self._snap_to_lines(
            centers_new, jnp.ones(centers_new.shape[0], jnp.float32))
        # low-confidence points take the line-snapped position; weights
        # feed the robust fit
        w = jnp.where(jnp.sum(conf) >= ransac.min_sample_size(ssm),
                      conf, jnp.ones_like(conf))

        scale = region.norm_mat[0, 0]
        new_ssm, inl = ransac.robust_fit(
            ssm, gs.centers0, snapped, k_fit, method=g.estimator,
            n_hyps=g.n_hyps, inlier_thresh=g.inlier_thresh_px / scale,
            weights=w)

        new_extra = gs._replace(key=key, inlier_mask=inl)
        return state._replace(ssm_state=new_ssm, extra=new_extra)
