"""Grid tracker: a lattice of tiny translation trackers fused by a robust
warp fit.

TPU-native re-design of the reference GridTracker family
(`/root/reference/SM/src/GridTracker.cc` 424, `GridTrackerCV.cc`,
`GridTrackerFlow.cc`; SURVEY.md §3.5). Where the reference updates P
independent sub-trackers in a TBB parallel-for (GridTracker.cc:247-261),
here all P patches are *one batched LK solve* (vmapped gather + 2x2
closed-form solves), and the robust SSM fusion (GridTracker.cc:269 ->
SSMEstimator) is the batched RANSAC/LMedS of `ops.ransac`.

Sub-tracker drift is reset each frame by re-projecting patch centers
through the fitted warp (the reference's reset-to-SSM policy), and an
optional forward-backward consistency mask (GridTracker.cc:186-188,294)
downweights unreliable patches in the fit.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.ops import ransac
from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import SearchMethod, TrackerState, image_corners

Array = jax.Array


@dataclass(frozen=True)
class GridParams:
    """Reference GridTrackerParams analog."""
    grid_res: int = 10          # grid_res x grid_res patch centers
    patch_res: int = 8          # sub-patch sampling resolution
    patch_scale: float = 1.0    # sub-patch half-size in center-spacing units
    sub_iters: int | tuple = 10  # LK iterations per sub-tracker; a tuple
                                # gives a per-pyramid-level schedule
                                # indexed by level (0 = full resolution,
                                # last entry reused for deeper levels):
                                # coarse levels absorb the large motion,
                                # so the full-res level only needs a few
                                # polish iterations (r4: (3, 10) on the
                                # RKLT config is ~35% fewer joint
                                # iterations at equal fit accuracy)
    coarse_point_stride: int = 1  # >1: subsample each patch's point grid
                                # by this stride at pyramid levels >= 1
                                # (the level-l frame is already low-passed
                                # by the pyramid resize, so the full
                                # patch_res^2 grid oversamples it; fewer
                                # points = proportionally smaller dense
                                # contractions)
    estimator: str = "ransac"   # ransac | lmeds | lsq (SSMEstimatorParams)
    n_hyps: int = 64
    inlier_thresh_px: float = 2.0   # image-pixel inlier threshold
    fb_err_px: float = -1.0     # forward-backward mask threshold (<0 = off)
    zncc: bool = True           # standardize patches (illumination robust)
    pyramid_levels: int = 2     # coarse-to-fine flow (GridTrackerCV's
                                # pyramidal LK, GridTrackerCV.cc:208-275);
                                # >1 is essential: per-frame motion easily
                                # exceeds the tiny patches' convergence basin
    flow: str = "warped"        # patch-flow geometry:
                                # "warped" — sample each patch through the
                                #   current global warp + a 2-DOF correction
                                #   (chained-warp: anchored to the init
                                #   template, no local-affine mismatch, no
                                #   frame-to-frame drift — the TPU-native
                                #   upgrade over the reference's rigid
                                #   windows);
                                # "rigid" — rigid windows around predicted
                                #   centers vs fixed init templates
                                #   (GridTrackerFlow semantics);
                                # "f2f" — rigid windows vs previous-frame
                                #   templates (GridTrackerCV's
                                #   calcOpticalFlowPyrLK(prev, cur)).
    seed: int = 0


class GridState(NamedTuple):
    templates: Array      # (L, P, n, C) per-pyramid-level sub-patch templates
    offsets: Array        # (n, 2) template-frame offsets around each center
    centers0: Array       # (P, 2) template-frame patch centers
    key: Array
    inlier_mask: Array    # (P,) last-fit inlier weights (RKLT SPI feed)
    prev_frame: Array | None  # for fb masking (None disables)


def _standardize(p, eps=1e-6):
    mu = jnp.mean(p, axis=-2, keepdims=True)
    sd = jnp.std(p, axis=-2, keepdims=True)
    return (p - mu) / (sd + eps)


class GridTracker(SearchMethod):
    """`SearchMethod` interface; `am` is unused (SSD/ZNCC distance built in,
    matching GridTrackerFlow's NCC/SSD flow options)."""

    name = "grid"

    def __init__(self, am, ssm, prm=None, grid: GridParams | None = None):
        super().__init__(am, ssm, prm)
        self.grid = grid or GridParams()
        if self.grid.flow not in ("warped", "rigid", "f2f"):
            raise ValueError(
                f"GridParams.flow must be one of 'warped'|'rigid'|'f2f', "
                f"got {self.grid.flow!r}")

    # -- batched translation LK over all patches -----------------------
    def _grid_fused_ok(self) -> bool:
        """True when the per-level joint-iteration loop collapses into
        the Pallas grid-flow kernel (ops/pallas/grid_flow.py): dense-mm
        interp, plain 2D frames. Auto on TPU like the LK chain kernel."""
        from mtf_tpu.sm.lk import _tpu_compute
        prm = self.prm
        use_p = prm.use_pallas or (prm.use_pallas is None
                                   and _tpu_compute())
        return bool(use_p) and prm.interp.endswith("_mm")

    def _track_patches(self, frame, norm_mat, pts_base, templates, n_iters,
                       crop=None):
        """pts_base: (P, n, 2) per-patch template-frame sampling points;
        returns the (P, 2) 2-DOF corrections. One fused computation:
        (P, n) gathers + closed-form 2x2 solves. With a "<kind>_mm"
        interp the per-patch gathers collapse into one dense MXU
        contraction over a shared crop window per iteration (all P*n
        points as tap-weight rows — the TPU-native form; the reference
        runs P independent sub-trackers in a TBB parallel-for,
        GridTracker.cc:247-261). On TPU the whole n_iters loop runs in
        ONE Pallas kernel call (grid_flow_fused).

        `crop`: static window size override for this call (pyramid
        levels pass a level-scaled window; None = prm.crop)."""
        g = self.grid
        if self.prm.interp.endswith("_mm") and frame.ndim == 2:
            if self._grid_fused_ok():
                return self._track_patches_fused(frame, norm_mat, pts_base,
                                                 templates, n_iters, crop)
            return self._track_patches_mm(frame, norm_mat, pts_base,
                                          templates, n_iters, crop)

        def one_patch(base, template):
            def body(_, disp):
                pts = W.apply_warp(norm_mat, base + disp[None, :])
                patch = interp.sample(frame, pts, self.prm.interp,
                                      self.prm.border)
                grad = interp.sample_grad(frame, pts, self.prm.interp,
                                          self.prm.border)  # (n, C, 2)
                if g.zncc:
                    patch = _standardize(patch)
                r = (patch - template).reshape(-1)          # (n*C,)
                J = grad.reshape(-1, 2)                      # (n*C, 2)
                # scale J to template-frame units via the norm scale
                scale = norm_mat[0, 0]
                J = J * scale
                H = J.T @ J + 1e-6 * jnp.eye(2)
                from mtf_tpu.ops.linalg import solve2x2
                d = solve2x2(H, J.T @ r)
                return disp - d

            return jax.lax.fori_loop(0, n_iters, body,
                                     jnp.zeros(2, jnp.float32))

        return jax.vmap(one_patch)(pts_base, templates)

    def _track_patches_fused(self, frame, norm_mat, pts_base, templates,
                             n_iters, crop=None):
        """Pallas grid-flow path: the whole per-level joint-iteration
        loop in ONE kernel call (ops/pallas/grid_flow.py) — disp carried
        in VMEM, per-patch 2x2 solves in-kernel. Same math as
        `_track_patches_mm` with the window hoisted out of the loop
        (anchored min-4 on the initial point cloud; the crop margin
        absorbs the intra-level motion like the LK fast path)."""
        from mtf_tpu.ops.pallas.grid_flow import grid_flow_fused
        from mtf_tpu.sm.lk import _tpu_compute
        g, prm = self.grid, self.prm
        P, n = pts_base.shape[0], pts_base.shape[1]
        scale = norm_mat[0, 0]
        pts = W.apply_warp(norm_mat, pts_base.reshape(-1, 2))   # (Pn, 2)
        h, w = frame.shape
        c = crop if crop is not None else prm.crop
        if c is not None and (c < h or c < w):
            hc, wc = min(c, h), min(c, w)
            x0 = jnp.clip(jnp.floor(jnp.min(pts[:, 0])) - 4.0, 0.0,
                          float(w - wc))
            y0 = jnp.clip(jnp.floor(jnp.min(pts[:, 1])) - 4.0, 0.0,
                          float(h - hc))
            win = jax.lax.dynamic_slice(
                frame, (y0.astype(jnp.int32), x0.astype(jnp.int32)),
                (hc, wc))
            pts = pts - jnp.stack([x0, y0])
        else:
            win = frame
        disp = grid_flow_fused(win, pts.T, templates.reshape(-1), scale,
                               n, n_iters, zncc=g.zncc,
                               kind=prm.interp[:-3],
                               interpret=not _tpu_compute())
        return disp.T                                           # (P, 2)

    def _track_patches_mm(self, frame, norm_mat, pts_base, templates,
                          n_iters, crop=None):
        """Dense-matmul variant of `_track_patches`: identical math (same
        ZNCC residual, same damped 2x2 solve) with the sampling of ALL
        patches fused into one value+grad dense contraction per
        iteration. The P per-patch fori_loops become one joint loop (the
        patches never interact, so the iteration order is equivalent)."""
        from mtf_tpu.ops.linalg import solve2x2
        g, prm = self.grid, self.prm
        P, n = pts_base.shape[0], pts_base.shape[1]
        kind = prm.interp[:-3]
        scale = norm_mat[0, 0]
        cdt = jnp.bfloat16 if prm.interp_bf16 else None
        crop_eff = crop if crop is not None else prm.crop

        def body(_, disp):
            pts = W.apply_warp(
                norm_mat, (pts_base + disp[:, None, :]).reshape(-1, 2))
            val, (dx, dy) = interp.sample_dense(
                frame, pts, kind, crop=crop_eff, need_grad=True,
                _stack=False, compute_dtype=cdt)
            C = val.shape[-1]
            patch = val.reshape(P, n, C)
            if g.zncc:
                patch = _standardize(patch)
            r = (patch - templates).reshape(P, n * C)
            Jx = dx.reshape(P, n * C) * scale
            Jy = dy.reshape(P, n * C) * scale
            H = jnp.stack([
                jnp.stack([jnp.sum(Jx * Jx, -1) + 1e-6,
                           jnp.sum(Jx * Jy, -1)], -1),
                jnp.stack([jnp.sum(Jx * Jy, -1),
                           jnp.sum(Jy * Jy, -1) + 1e-6], -1)], -2)
            b = jnp.stack([jnp.sum(Jx * r, -1), jnp.sum(Jy * r, -1)], -1)
            d = jax.vmap(solve2x2)(H, b)
            return disp - d

        return jax.lax.fori_loop(0, n_iters, body,
                                 jnp.zeros((P, 2), jnp.float32))

    def _pyr_frames(self, frame):
        """Image pyramid, level 0 = full resolution (static level count)."""
        frames = [frame]
        for lvl in range(1, self.grid.pyramid_levels):
            h, w = frame.shape[0] >> lvl, frame.shape[1] >> lvl
            frames.append(jax.image.resize(
                frame, (h, w) + frame.shape[2:], "linear"))
        return frames

    def _level_norm(self, norm_mat, lvl):
        s = 1.0 / (2 ** lvl)
        return jnp.diag(jnp.asarray([s, s, 1.0], norm_mat.dtype)) @ norm_mat

    def _point_subset(self, lvl):
        """Static point-index subset for pyramid level `lvl` (None = all).
        The offsets grid is row-major patch_res x patch_res, so a stride-s
        subset is a static fancy index — no dynamic shapes under jit."""
        s = self.grid.coarse_point_stride
        if lvl == 0 or s <= 1:
            return None
        import numpy as np
        res = self.grid.patch_res
        r = np.arange(0, res, s)
        return jnp.asarray((r[:, None] * res + r[None, :]).ravel())

    def _track_patches_pyr(self, frame, norm_mat, pts_base, templates,
                           n_iters):
        """Coarse-to-fine flow over the pyramid (GridTrackerCV.cc:208-275);
        points live in the scale-free template frame so they carry across
        levels unchanged. Returns the accumulated (P, 2) corrections.
        `n_iters` may be a per-level schedule (see GridParams.sub_iters);
        coarse levels may run on a decimated point grid
        (GridParams.coarse_point_stride)."""
        frames = self._pyr_frames(frame)
        disp = jnp.zeros((pts_base.shape[0], 2), jnp.float32)
        c0 = self.prm.crop
        for lvl in reversed(range(self.grid.pyramid_levels)):
            # level-scaled window: the patch cloud shrinks 2x per level,
            # so a full-size window at coarse levels wastes Hc*Wc*N MACs
            # (the dense contraction's dominant term) — scale the crop
            # with the pyramid, +16 px margin for the coarse motion
            crop_l = None if c0 is None else (
                c0 if lvl == 0 else max(48, (c0 >> lvl) + 16))
            sel = self._point_subset(lvl)
            pb = pts_base if sel is None else pts_base[:, sel]
            if sel is None:
                tm = templates[lvl]
            else:
                tm = templates[lvl][:, sel]
                if self.grid.zncc:
                    # the live patch is standardized over the decimated
                    # subset only — re-standardize the subsampled template
                    # so both sides of the residual share subset
                    # statistics (full-grid mean/std != subset mean/std
                    # would bias the coarse flow; ADVICE r4)
                    tm = _standardize(tm)
            if isinstance(n_iters, (tuple, list)):
                it = int(n_iters[min(lvl, len(n_iters) - 1)])
            else:
                it = int(n_iters)
            disp = disp + self._track_patches(
                frames[lvl], self._level_norm(norm_mat, lvl),
                pb + disp[:, None, :], tm, it, crop=crop_l)
        return disp

    def _templates_at(self, frame, norm_mat, centers, offsets):
        """(L, P, n, C) per-level patch templates sampled around `centers`."""
        g = self.grid
        frames_pyr = self._pyr_frames(frame)

        def template_of(frm, norm_l):
            def one(c):
                pts = W.apply_warp(norm_l, c[None, :] + offsets)
                p = interp.sample(frm, pts, self.prm.interp, self.prm.border)
                return _standardize(p) if g.zncc else p
            return jax.vmap(one)(centers)

        return jnp.stack([
            template_of(frames_pyr[lvl], self._level_norm(norm_mat, lvl))
            for lvl in range(g.pyramid_levels)])

    # -- SearchMethod hooks ---------------------------------------------
    def _init_extra(self, state: TrackerState, frame: Array):
        g = self.grid
        region = state.region
        # patch centers: uniform grid strictly inside the template square
        r = jnp.linspace(-0.5, 0.5, g.grid_res + 2)[1:-1]
        cx, cy = jnp.meshgrid(r, r)
        centers0 = jnp.stack([cx.ravel(), cy.ravel()], axis=-1)
        # warp unit-square centers through the region's base corners frame:
        # base_corners is ~ the centered unit square, so centers0 applies
        H = W.homography_from_unit_square(region.base_corners)
        centers0 = W.apply_warp(H, centers0)
        spacing = 1.0 / (g.grid_res + 1)
        half = g.patch_scale * spacing
        o = jnp.linspace(-half, half, g.patch_res)
        ox, oy = jnp.meshgrid(o, o)
        offsets = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)

        templates = self._templates_at(frame, region.norm_mat, centers0,
                                       offsets)
        P = centers0.shape[0]
        return GridState(
            templates=templates, offsets=offsets, centers0=centers0,
            key=jax.random.PRNGKey(g.seed),
            inlier_mask=jnp.ones((P,), jnp.float32),
            prev_frame=frame if (g.flow == "f2f" or g.fb_err_px > 0)
            else None)

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        g, ssm = self.grid, self.ssm
        gs: GridState = state.extra
        region = state.region
        key, k_fit = jax.random.split(gs.key)

        # predict centers through current warp (reset-to-SSM policy)
        centers_pred = ssm.warp_pts(state.ssm_state, gs.centers0)
        if g.flow == "warped":
            # chained-warp patches: every sampling point rides the global
            # warp, so the fixed init templates stay geometrically valid
            pts_base = jax.vmap(
                lambda c: ssm.warp_pts(state.ssm_state,
                                       c[None, :] + gs.offsets))(gs.centers0)
            templates = gs.templates
        else:
            pts_base = centers_pred[:, None, :] + gs.offsets[None, :, :]
            if g.flow == "f2f" and gs.prev_frame is not None:
                # templates resampled from the previous frame at the fitted
                # positions (GridTrackerCV.cc:208-275)
                templates = self._templates_at(
                    gs.prev_frame, region.norm_mat, centers_pred, gs.offsets)
            else:
                templates = gs.templates
        disp = self._track_patches_pyr(
            frame, region.norm_mat, pts_base, templates, g.sub_iters)
        centers_new = centers_pred + disp

        weights = None
        if g.fb_err_px > 0 and gs.prev_frame is not None:
            # track back on the previous frame; large round-trip = occlusion
            back_templates = (self._templates_at(frame, region.norm_mat,
                                                 centers_new, gs.offsets)
                              if g.flow == "f2f" else gs.templates)
            disp_back = self._track_patches_pyr(
                gs.prev_frame, region.norm_mat,
                pts_base + disp[:, None, :], back_templates, g.sub_iters)
            scale = region.norm_mat[0, 0]
            fb = jnp.linalg.norm(disp + disp_back, axis=-1) * scale
            weights = (fb < g.fb_err_px).astype(jnp.float32)
            weights = jnp.where(jnp.sum(weights) >= ransac.min_sample_size(ssm),
                                weights, jnp.ones_like(weights))

        new_ssm, inl = self._fit_warp(region, gs.centers0, centers_new,
                                      k_fit, weights)

        new_extra = gs._replace(
            key=key, inlier_mask=inl,
            prev_frame=frame if (g.flow == "f2f" or g.fb_err_px > 0)
            else None)
        return state._replace(ssm_state=new_ssm, extra=new_extra)

    def _fit_warp(self, region, centers0, centers_new, k_fit, weights=None):
        """Robust warp fit from patch correspondences (GridTracker.cc:269
        -> SSMEstimator). ShardedGridTracker overrides this with the
        hypothesis axis sharded over the mesh."""
        g = self.grid
        scale = region.norm_mat[0, 0]
        return ransac.robust_fit(
            self.ssm, centers0, centers_new, k_fit, method=g.estimator,
            n_hyps=g.n_hyps, inlier_thresh=g.inlier_thresh_px / scale,
            weights=weights)


class SubGridState(NamedTuple):
    sub_states: TrackerState  # vmapped sub-tracker states (leading dim P)
    centers0: Array           # (P, 2) template-frame patch centers
    half_img: Array           # scalar: patch half-size in image pixels
    key: Array
    inlier_mask: Array        # (P,)


class SubTrackerGrid(SearchMethod):
    """Grid of *arbitrary* sub-trackers fused by a robust warp fit — the
    reference's general GridTracker (GridTracker.cc:247-269: any grid_sm x
    grid_am x grid_ssm per patch, TBB parallel-for + SSMEstimator). Here
    the P sub-trackers are one vmapped pure `update`; the parallel-for is
    a batch axis and scales onto a mesh via the same vmap.
    """

    name = "grid_sub"

    def __init__(self, sub: SearchMethod, ssm, prm=None,
                 grid: GridParams | None = None):
        super().__init__(sub.am, ssm, prm)
        self.sub = sub
        self.grid = grid or GridParams()

    def _patch_corners_img(self, norm_mat, centers_t, half_img):
        """(P, 4, 2) image-space corner squares around each center."""
        c_img = W.apply_warp(norm_mat, centers_t)
        offs = jnp.asarray([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0],
                            [-1.0, 1.0]], c_img.dtype)
        return c_img[:, None, :] + half_img * offs[None, :, :]

    def _init_extra(self, state: TrackerState, frame: Array):
        g = self.grid
        region = state.region
        r = jnp.linspace(-0.5, 0.5, g.grid_res + 2)[1:-1]
        cx, cy = jnp.meshgrid(r, r)
        centers0 = jnp.stack([cx.ravel(), cy.ravel()], axis=-1)
        H = W.homography_from_unit_square(region.base_corners)
        centers0 = W.apply_warp(H, centers0)
        spacing = 1.0 / (g.grid_res + 1)
        half_img = g.patch_scale * spacing * region.norm_mat[0, 0]
        corners_b = self._patch_corners_img(region.norm_mat, centers0,
                                            half_img)
        sub_states = jax.vmap(self.sub.initialize,
                              in_axes=(None, 0))(frame, corners_b)
        return SubGridState(
            sub_states=sub_states, centers0=centers0, half_img=half_img,
            key=jax.random.PRNGKey(g.seed),
            inlier_mask=jnp.ones((centers0.shape[0],), jnp.float32))

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        g, ssm = self.grid, self.ssm
        gs: SubGridState = state.extra
        region = state.region
        key, k_fit = jax.random.split(gs.key)

        sub_states = jax.vmap(self.sub.update,
                              in_axes=(0, None))(gs.sub_states, frame)
        # patch centers = mean of each sub-tracker's corners, pulled back
        # into the parent template frame for the robust fit
        corners_img = jax.vmap(
            lambda s: image_corners(self.sub.ssm, s))(sub_states)  # (P,4,2)
        centers_img = jnp.mean(corners_img, axis=1)
        Tinv = __import__('mtf_tpu.ops.linalg', fromlist=['inv3x3']).inv3x3(region.norm_mat)
        centers_t = W.apply_warp(Tinv, centers_img)

        scale = region.norm_mat[0, 0]
        new_ssm, inl = ransac.robust_fit(
            ssm, gs.centers0, centers_t, k_fit, method=g.estimator,
            n_hyps=g.n_hyps, inlier_thresh=g.inlier_thresh_px / scale)

        # reset-to-SSM policy (GridTracker reset/reinit, GridTracker.cc:294+):
        # re-seat every sub-tracker on the fitted warp to stop drift
        centers_fit = ssm.warp_pts(new_ssm, gs.centers0)
        corners_b = self._patch_corners_img(region.norm_mat, centers_fit,
                                            gs.half_img)
        sub_states = jax.vmap(self.sub.set_region)(sub_states, corners_b)

        new_extra = gs._replace(sub_states=sub_states, key=key,
                                inlier_mask=inl)
        return state._replace(ssm_state=new_ssm, extra=new_extra)
