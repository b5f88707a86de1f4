"""Particle-filter search method.

TPU-native re-design of the reference PF (`SM/src/NT/PF.cc` 593 LoC; hot
loop SURVEY.md §3.3). The per-particle loop (NT/PF.cc:261) becomes one
vmap: P particles' warps, patch gathers and likelihoods evaluate as a
single batched XLA computation. The serial binary-search multinomial
resampler (NT/PF.cc:450-480) becomes a parallel cumsum + searchsorted
(systematic resampling), and weight normalization is one reduction —
exactly the collective-friendly shape needed for sharding particles over
a mesh (BASELINE config #4).

Dynamic models {RandomWalk, AutoRegression1}, update {Additive,
Compositional}, likelihoods {AM, Gaussian, Reciprocal}, resampling
{None, Systematic/Multinomial}, mean {SSM-weighted-mean, Corner-mean, Best}
mirror PFParams.h:10-33.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import SearchMethod, TrackerState

Array = jax.Array


@dataclass(frozen=True)
class PFParams:
    """Reference PFParams.h analog."""
    n_particles: int = 200
    dynamic_model: str = "rw"         # rw | ar1
    update_type: str = "compositional"  # compositional | additive
    likelihood: str = "am"            # am | gaussian | reciprocal
    resampling: str = "systematic"    # none | systematic
    mean_type: str = "weighted"       # weighted | corner | best
    pix_sigma: float = 3.0            # drives state sigma if ssm_sigma empty
    ssm_sigma: tuple = ()             # explicit per-dof sigma (overrides)
    ssm_sigmas: tuple = ()            # multiple sampler distributions
                                      # ((s..),(s..),..); adaptive weights
                                      # (reference multi-distr PF samplers)
    adapt_distr: bool = True          # re-weight distributions by their
                                      # particles' likelihood mass
    ar_alpha: float = 0.5
    n_eff_ratio: float = 0.5          # adaptive resampling threshold
    measurement_sigma: float = 0.1    # gaussian likelihood scale
    jacobian_as_sigma: bool = False   # sampler sigma from one GN step
                                      # (NT/PF.cc:214-227)
    am_sigma: tuple = ()              # photometric-state random-walk sigma
                                      # (per-ILM-param) — the AM
                                      # stochastic-sampler API analog
                                      # (AppearanceModel.h:303-325 +
                                      # IlluminationModel sampler-sigma)
    score_stride: int = 1             # >1: measure particle likelihoods on
                                      # a stride-decimated point grid (a
                                      # coarser measurement model; the
                                      # particle sampling pass is the PF's
                                      # dominant cost on TPU and scales
                                      # with the point count). The mean-
                                      # state estimate, resampling and
                                      # template learning are unchanged;
                                      # requires an AM constructible as
                                      # type(am)(params, ilm).
    score_blur: bool = False          # anti-alias the decimated scoring
                                      # pass (binomial blur of window +
                                      # init template, pixel-unit
                                      # matched). Multi-seed synth evals
                                      # measured no ranking benefit once
                                      # rescore_top_k is on; kept as an
                                      # option for raw-texture scenes.
    score_downsample: bool = False    # with score_stride > 1 +
                                      # score_blur: run the coarse
                                      # ranking pass against the
                                      # stride-DOWNSAMPLED blurred frame
                                      # (a pyramid level). The dense-mm
                                      # scoring contraction's cost is
                                      # points x window AREA, and the
                                      # particle-cloud window shrinks by
                                      # stride^2 (256^2 -> ~72^2 at the
                                      # bench config) — the coarse pass
                                      # drops out of the device profile.
                                      # Values are identical to blurred
                                      # full-res sampling up to the
                                      # linear re-interpolation of the
                                      # decimated grid; the template
                                      # side is built/learned from the
                                      # SAME representation so the
                                      # residual stays unbiased.
    rescore_crop: int = 0             # >0 (with rescore_top_k): the
                                      # full-resolution rescore anchors
                                      # its own crop window of this size
                                      # on the TOP-K point cloud (which
                                      # clusters near the mode) instead
                                      # of the full particle-cloud
                                      # window; a rescored particle
                                      # whose points leave the tight
                                      # window keeps its coarse RANKING
                                      # score rather than being declared
                                      # impossible.
    rescore_top_k: int = 0            # >0 (with score_stride > 1):
                                      # hierarchical measurement — the
                                      # coarse decimated pass RANKS all
                                      # particles, then only the top-K
                                      # are re-scored at FULL resolution
                                      # and carry the final weights
                                      # (auxiliary-PF-style truncation:
                                      # the rest get -inf log-weight).
                                      # Recovers the full-resolution
                                      # measurement model for the
                                      # particles that matter at
                                      # ~K/P + 1/stride^2 of the
                                      # sampling cost. Unsupported by
                                      # ShardedPF (global top-k).
    seed: int = 0


class PFState(NamedTuple):
    particles: Array       # (P, S)
    prev_particles: Array  # (P, S) for AR(1)
    log_weights: Array     # (P,)
    key: Array
    distr_log_w: Array = None  # (D,) adaptive sampler-distribution weights
    am_particles: Array = None  # (P, P_am) photometric particles ((P, 0)
                                # when AM-state sampling is off)
    score_am: object = None     # decimated-grid AMState for particle
                                # scoring (score_stride > 1 only)


class PF(SearchMethod):
    name = "pf"

    def __init__(self, am, ssm, prm=None, pf: PFParams | None = None):
        super().__init__(am, ssm, prm)
        self.pf = pf or PFParams()
        s = self.pf.score_stride
        if self.pf.score_downsample and (s <= 1 or not self.pf.score_blur):
            raise ValueError(
                "PFParams.score_downsample requires score_stride > 1 and "
                "score_blur=True (the binomial blur is the anti-alias "
                "filter of the downsampled scoring pyramid level)")
        if s > 1:
            # decimated measurement grid: particle likelihoods are scored
            # at every s-th template point (row-major (resy, resx) grid,
            # static indices), against an AM of the decimated resolution.
            # The sampling pass dominates the PF's device profile and its
            # cost is linear in the point count.
            from dataclasses import replace as _replace
            import numpy as np
            ry, rx = self.am.prm.resy, self.am.prm.resx
            r, c = np.arange(0, ry, s), np.arange(0, rx, s)
            self._score_idx = jnp.asarray(
                (r[:, None] * rx + c[None, :]).ravel())
            # fail at construction, not deep inside the first update
            # trace (ADVICE r4): composite AMs (SumOfAMs) have a
            # different ctor, and ILMs holding per-pixel maps built from
            # resx/resy (PGB/RBF) cannot be reused at the decimated
            # resolution.
            if getattr(self.am.ilm, "resx", None) is not None:
                raise ValueError(
                    "PFParams.score_stride > 1 needs a resolution-free "
                    f"ILM; {type(self.am.ilm).__name__} holds per-pixel "
                    "maps built from (resx, resy) and cannot be reused "
                    "on the decimated scoring grid")
            try:
                self._score_am = type(self.am)(
                    _replace(self.am.prm, resx=len(c), resy=len(r)),
                    self.am.ilm)
            except TypeError as e:
                raise ValueError(
                    "PFParams.score_stride > 1 requires an AM "
                    "constructible as type(am)(params, ilm); "
                    f"{type(self.am).__name__} is not ({e})") from e
        else:
            self._score_idx = None
            self._score_am = self.am

    # -- helpers -------------------------------------------------------
    def _sigma(self, region) -> Array:
        if self.pf.ssm_sigma:
            return jnp.asarray(self.pf.ssm_sigma, jnp.float32)
        # pixel sigma is in image px; base_pts live in the normalized
        # template frame, so convert via the region scale
        scale = region.norm_mat[0, 0]
        return self.ssm.state_sigma_from_pixel_sigma(
            self.pf.pix_sigma / scale, region.base_pts)

    def _particle_patch(self, region, s, frame):
        pts_t = self.ssm.warp_pts(s, region.base_pts)
        pts = W.apply_warp(region.norm_mat, pts_t)
        return interp.sample(frame, pts, self.prm.interp, self.prm.border)

    def _particle_patches(self, region, states, frame, reduce_axis=None,
                          base_pts=None, pts_scale=None, crop=None):
        """(P, N, C) patches + (P,) in-window validity for the particle
        population.

        With a "<kind>_mm" interp the per-particle patch loop
        (NT/PF.cc:261) collapses into ONE dense MXU contraction over a
        shared crop window: all P*N warped points build tap-weight rows
        against the same dynamic-sliced image window, so the TPU never
        issues a gather. The window is anchored at the point-cloud
        CENTER (outlier particles must not drag the window off the
        bulk), and any particle with points outside it is flagged
        invalid — `_apply_window_mask` gives those -inf log-likelihood
        rather than scoring them on edge-clamped garbage. The gather
        path remains the non-_mm fallback (always valid).

        `reduce_axis`: shard_map axis name to pmin/pmax the point-cloud
        extent over, so every shard of a sharded population anchors the
        SAME window and per-particle validity is shard-layout-invariant
        (ShardedPF passes its particle axis).

        `base_pts`: template-frame points to sample per particle
        (defaults to the full region grid; the decimated scoring path
        passes the stride subset).

        `pts_scale`: multiply the image-frame points (the downsampled
        scoring pass maps full-res coords onto the stride-decimated
        frame with scale 1/stride). `crop`: override `prm.crop` (the
        downsampled pass shrinks the window by the stride; the top-K
        rescore tightens it to the top-K cloud)."""
        if base_pts is None:
            base_pts = region.base_pts
        P = states.shape[0]
        pts_t = jax.vmap(
            lambda s: self.ssm.warp_pts(s, base_pts))(states)
        pts = W.apply_warp(region.norm_mat, pts_t.reshape(-1, 2))
        if pts_scale is not None:
            pts = pts * pts_scale
        prm = self.prm
        ok = jnp.ones((P,), bool)
        if prm.interp.endswith("_mm") and frame.ndim == 2:
            h, w = frame.shape
            if crop is None:
                crop = prm.crop
            if crop is not None and (crop < h or crop < w):
                hc, wc = min(crop, h), min(crop, w)
                mnx, mxx = jnp.min(pts[:, 0]), jnp.max(pts[:, 0])
                mny, mxy = jnp.min(pts[:, 1]), jnp.max(pts[:, 1])
                if reduce_axis is not None:
                    mnx = jax.lax.pmin(mnx, reduce_axis)
                    mxx = jax.lax.pmax(mxx, reduce_axis)
                    mny = jax.lax.pmin(mny, reduce_axis)
                    mxy = jax.lax.pmax(mxy, reduce_axis)
                cx = 0.5 * (mnx + mxx)
                cy = 0.5 * (mny + mxy)
                x0 = jnp.clip(jnp.floor(cx - 0.5 * wc), 0.0, float(w - wc))
                y0 = jnp.clip(jnp.floor(cy - 0.5 * hc), 0.0, float(h - hc))
                sub = jax.lax.dynamic_slice(
                    frame, (y0.astype(jnp.int32), x0.astype(jnp.int32)),
                    (hc, wc))
                pts = pts - jnp.stack([x0, y0])
                in_w = ((pts[:, 0] >= 0.0) & (pts[:, 0] <= wc - 1.0)
                        & (pts[:, 1] >= 0.0) & (pts[:, 1] <= hc - 1.0))
                ok = jnp.all(in_w.reshape(P, -1), axis=1)
                frame = sub
            val, _ = interp.sample_dense(
                frame, pts, prm.interp[:-3], crop=None, need_grad=False,
                compute_dtype=jnp.bfloat16 if prm.interp_bf16 else None)
        else:
            val = interp.sample(frame, pts, prm.interp, prm.border)
        return val.reshape(P, -1, val.shape[-1]), ok

    def _score_frame(self, frame):
        """(frame_sc, pts_scale, crop) for the anti-aliased decimated
        scoring pass: the binomial-blurred frame, optionally stride-
        DOWNSAMPLED (score_downsample — a pyramid level: the scoring
        window area, the dominant term of the dense-mm contraction,
        shrinks by stride^2). Shared across init / measure / learn so
        template and live patch ride the identical representation."""
        from mtf_tpu.sm.lk import LKBase
        s = self.pf.score_stride
        fr_b = LKBase._blur2(frame, s)
        if not self.pf.score_downsample:
            return fr_b, None, None
        crop = (max(32, self.prm.crop // s + 16)
                if self.prm.crop is not None else None)
        return fr_b[::s, ::s], 1.0 / s, crop

    def _log_lik(self, am_state, patch, p_am=None, am=None):
        am = am or self.am
        st = (am_state if p_am is None or p_am.shape[-1] == 0
              else am_state._replace(p_am=p_am))
        f = am.f(st, patch)
        if self.pf.likelihood == "am":
            return jnp.log(am.likelihood(st, patch) + 1e-30)
        if self.pf.likelihood == "gaussian":
            return f / (2.0 * self.pf.measurement_sigma ** 2)
        # reciprocal: 1/(1 - f) style for similarities peaking at high f
        return -jnp.log1p(-f + 1e-6)

    @property
    def _sample_am(self) -> bool:
        return bool(self.pf.am_sigma) and self.am.ilm.n_params > 0

    # -- API -----------------------------------------------------------
    def _init_extra(self, state: TrackerState, frame: Array):
        P = self.pf.n_particles
        particles = jnp.tile(state.ssm_state[None, :], (P, 1))
        D = max(1, len(self.pf.ssm_sigmas))
        am_p = (jnp.tile(state.am_state.p_am[None, :], (P, 1))
                if self._sample_am else jnp.zeros((P, 0), jnp.float32))
        score = None
        if self._score_idx is not None:
            if self.pf.score_blur and frame.ndim == 2:
                # anti-aliased decimated template: sampled from the
                # binomial-BLURRED init frame (downsampled when
                # score_downsample is on) at the decimated points,
                # pixel-unit matched to the blurred scoring window
                from mtf_tpu.ops import interp as _interp
                fr_b, pscale, _ = self._score_frame(frame)
                pts = W.apply_warp(
                    state.region.norm_mat,
                    state.region.base_pts[self._score_idx])
                if pscale is not None:
                    pts = pts * pscale
                p_b = _interp.sample(fr_b, pts, self.prm.interp,
                                     self.prm.border)
                score = self._score_am.init(p_b)
            else:
                # raw decimated template = the stride subset of the full
                # template (identical values to sampling the init frame
                # at the decimated points)
                score = self._score_am.init(
                    state.am_state.template[self._score_idx])
        return PFState(
            particles=particles,
            prev_particles=particles,
            log_weights=jnp.full((P,), -jnp.log(P), jnp.float32),
            key=jax.random.PRNGKey(self.pf.seed),
            distr_log_w=jnp.full((D,), -jnp.log(D), jnp.float32),
            am_particles=am_p,
            score_am=score)

    # -- update pieces (shared with parallel.pf_shard.ShardedPF) --------
    def _effective_sigma(self, state: TrackerState, frame: Array) -> Array:
        """Sampler sigma; with `jacobian_as_sigma` the magnitude of one
        Gauss-Newton step at the current state (NT/PF.cc:214-227):
        exploration widens exactly where the similarity surface says the
        state is uncertain."""
        ssm, am, pf = self.ssm, self.am, self.pf
        sigma = self._sigma(state.region)
        if not pf.jacobian_as_sigma:
            return sigma
        region = state.region
        compositional = pf.update_type == "compositional"

        def pts_fn(dp):
            pts_t = ssm.warp_pts_from(state.ssm_state, dp,
                                      region.base_pts, compositional)
            return W.apply_warp(region.norm_mat, pts_t)

        zero = jnp.zeros((ssm.dof,), jnp.float32)
        Jpts = jax.jacfwd(pts_fn)(zero)                   # (N, 2, S)
        patch = interp.sample(frame, pts_fn(zero), self.prm.interp,
                              self.prm.border)
        grad = interp.sample_grad(frame, pts_fn(zero), self.prm.interp,
                                  self.prm.border)        # (N, C, 2)
        J = jnp.einsum("ncd,nds->ncs", grad, Jpts) \
               .reshape(-1, ssm.dof)                      # (NC, S)
        g = am.grad_corrected(state.am_state, patch).reshape(-1)
        H = J.T @ J + 1e-6 * jnp.eye(ssm.dof)
        step = jnp.linalg.solve(H, J.T @ g)
        return jnp.maximum(jnp.abs(step), 0.1 * sigma)

    def _draw_sigmas(self, k_distr, distr_log_w, sigma, P):
        """Per-particle sigma: single distribution, or one of D presets
        drawn from the adaptive distribution weights. Returns (d_idx (P,),
        sig_p (P, S))."""
        pf = self.pf
        if pf.ssm_sigmas and not pf.jacobian_as_sigma:
            sigmas = jnp.asarray(pf.ssm_sigmas, jnp.float32)   # (D, S)
            d_idx = jax.random.categorical(k_distr, distr_log_w,
                                           shape=(P,))
            sig_p = sigmas[d_idx]                              # (P, S)
        else:
            d_idx = jnp.zeros((P,), jnp.int32)
            sig_p = jnp.broadcast_to(sigma, (P, sigma.shape[0]))
        return d_idx, sig_p

    def _propagate_measure(self, state, frame, prop_keys, particles,
                           prev_particles, sig_p, am_prop,
                           reduce_axis=None):
        """Steps 1-2 of the PF update: the per-particle propagate +
        patch-gather + likelihood (NT/PF.cc:261 loop as one vmap). This is
        the expensive, embarrassingly parallel piece — the one ShardedPF
        runs on local particle slices (passing `reduce_axis` so the crop
        window anchors on the GLOBAL point cloud). Returns (prop,
        log_lik, valid)."""
        ssm, pf = self.ssm, self.pf
        compositional = pf.update_type == "compositional"
        if pf.dynamic_model == "ar1":
            prop = jax.vmap(lambda k, s, sp, sg: ssm.auto_regression1(
                k, s, sp, sg, pf.ar_alpha, compositional))(
                    prop_keys, particles, prev_particles, sig_p)
        else:
            prop = jax.vmap(lambda k, s, sg: ssm.random_walk(
                k, s, sg, compositional))(prop_keys, particles, sig_p)

        ps: PFState = state.extra
        if self._score_idx is not None and ps.score_am is not None:
            # decimated measurement model: sample + score every particle
            # on the stride subset (the sampling pass is the PF's
            # dominant cost and is linear in points)
            bp = state.region.base_pts[self._score_idx]
            sc_am, sc_st = self._score_am, ps.score_am
        else:
            bp, sc_am, sc_st = None, self.am, state.am_state
        frame_sc, pscale, crop_sc = frame, None, None
        if bp is not None and self.pf.score_blur and frame.ndim == 2:
            # anti-aliased decimated scoring: binomial-blur (and with
            # score_downsample stride-decimate) the SHARED frame —
            # loop-invariant under the fleet vmap, so XLA hoists it
            # once — to match the init-time score template
            frame_sc, pscale, crop_sc = self._score_frame(frame)
        patches, valid = self._particle_patches(state.region, prop,
                                                frame_sc,
                                                reduce_axis=reduce_axis,
                                                base_pts=bp,
                                                pts_scale=pscale,
                                                crop=crop_sc)
        log_lik = jax.vmap(
            lambda p, pa: self._log_lik(sc_st, p, pa, am=sc_am))(
                patches, am_prop)
        K = self.pf.rescore_top_k
        if K > 0 and bp is not None and reduce_axis is None:
            # hierarchical measurement (PFParams.rescore_top_k): the
            # coarse pass above only RANKS; the top-K particles are
            # re-scored on the full point grid and carry the final
            # weights, everything else is truncated to -inf (the
            # resampler concentrates there anyway when the likelihood
            # is peaked). K/P full-res samples + P/stride^2 coarse ones.
            P = prop.shape[0]
            llc = self._apply_window_mask(log_lik, valid)
            _, topi = jax.lax.top_k(llc, min(K, P))
            prop_k = prop[topi]
            rc = self.pf.rescore_crop or None
            patches_k, valid_k = self._particle_patches(
                state.region, prop_k, frame, crop=rc)
            ll_k = jax.vmap(
                lambda p, pa: self._log_lik(state.am_state, p, pa))(
                    patches_k, am_prop[topi])
            # NOTE (r5 session 2): a particle whose points leave the
            # tight rescore window is dropped (-inf via valid_k), same
            # as the full-window semantics. Falling back to its coarse
            # ranking score instead was tried and REJECTED: coarse
            # (decimated, blurred) SSIM likelihoods sit systematically
            # ABOVE full-resolution ones, so fallback particles
            # outranked every honestly-rescored one and dragged the
            # mean (0.17 -> 3.8 px on the regression config).
            log_lik = jnp.full((P,), -1e30, log_lik.dtype).at[topi].set(ll_k)
            valid = jnp.zeros((P,), bool).at[topi].set(valid_k)
        return prop, log_lik, valid

    @staticmethod
    def _apply_window_mask(log_lik, valid):
        """Particles outside the dense-sampling crop window were scored
        on edge-clamped pixels — treat them as impossible (unless the
        WHOLE population left the window, in which case keep the raw
        scores so the filter degrades gracefully rather than
        collapsing). Applied on the full population so sharded ==
        unsharded exactly (ShardedPF all_gathers `valid` first)."""
        return jnp.where(jnp.any(valid),
                         jnp.where(valid, log_lik, -1e30), log_lik)

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        ssm, am, pf = self.ssm, self.am, self.pf
        P = pf.n_particles
        ps: PFState = state.extra
        sigma = self._effective_sigma(state, frame)

        key, k_prop, k_res, k_distr, k_am = jax.random.split(ps.key, 5)
        prop_keys = jax.random.split(k_prop, P)

        # photometric-state random walk (AM sampler API analog)
        am_prop = ps.am_particles
        if self._sample_am:
            am_prop = am_prop + jnp.asarray(
                pf.am_sigma, jnp.float32)[None, :] * jax.random.normal(
                    k_am, am_prop.shape, jnp.float32)

        d_idx, sig_p = self._draw_sigmas(k_distr, ps.distr_log_w, sigma, P)

        # 1-2. propagate + measure
        prop, log_lik, valid = self._propagate_measure(
            state, frame, prop_keys, ps.particles, ps.prev_particles,
            sig_p, am_prop)
        log_lik = self._apply_window_mask(log_lik, valid)

        log_w = ps.log_weights + log_lik
        log_w = log_w - jax.scipy.special.logsumexp(log_w)

        (prop, prev_out, am_prop, log_w, new_dlw, mean_state,
         am_state) = self._finish(state, prop, ps.particles, am_prop,
                                  log_w, d_idx, ps.distr_log_w, k_res)

        new_am, new_score = self._learn_mean_patch(
            state, am_state, mean_state, frame, ps.score_am)
        new_extra = PFState(particles=prop, prev_particles=prev_out,
                            log_weights=log_w, key=key,
                            distr_log_w=new_dlw, am_particles=am_prop,
                            score_am=new_score)
        new_state = state._replace(ssm_state=mean_state, extra=new_extra)
        return new_state._replace(am_state=new_am)

    def _learn_mean_patch(self, state, am_state, mean_state, frame,
                          score_am_state=None):
        """Template learning on the mean-state patch, gated on the crop
        window: when the target sits near the frame border the window
        clamps, and with learning_rate>0 the template would learn
        edge-clamped garbage — exactly the failure `_apply_window_mask`
        exists to prevent, so an out-of-window mean patch skips the
        update (keeps the old AM state leaf-for-leaf). The decimated
        scoring template (score_stride > 1) learns the stride subset of
        the same mean patch. With learning off this is a no-op and the
        extra mean-patch sampling pass is skipped entirely."""
        if not self.am.needs_update_model:
            return am_state, score_am_state
        patches, pvalid = self._particle_patches(
            state.region, mean_state[None, :], frame)
        new_am = self.am.update_model(am_state, patches[0])
        new_am = jax.tree.map(lambda a, b: jnp.where(pvalid[0], a, b),
                              new_am, am_state)
        new_score = score_am_state
        if score_am_state is not None:
            if self.pf.score_blur and frame.ndim == 2:
                # blurred score template learns from the blurred-frame
                # (downsampled when score_downsample) mean patch at the
                # decimated points (see _init_extra)
                fr_b, pscale, crop_sc = self._score_frame(frame)
                patches_b, _ = self._particle_patches(
                    state.region, mean_state[None, :], fr_b,
                    base_pts=state.region.base_pts[self._score_idx],
                    pts_scale=pscale, crop=crop_sc)
                sub = patches_b[0]
            else:
                sub = patches[0][self._score_idx]
            ns = self._score_am.update_model(score_am_state, sub)
            new_score = jax.tree.map(
                lambda a, b: jnp.where(pvalid[0], a, b), ns,
                score_am_state)
        return new_am, new_score

    def _finish(self, state, prop, prev_particles, am_prop, log_w, d_idx,
                distr_log_w, k_res):
        """Steps 3-4 of the PF update on the FULL particle population:
        adaptive resampling, sampler-distribution re-weighting and the
        state estimate. Pure full-array logic — ShardedPF `all_gather`s the
        per-shard proposals and runs this identical code replicated, which
        is what makes sharded == unsharded exact for the same seed.
        Returns (prop, prev_out, am_prop, log_w, new_dlw, mean_state,
        am_state)."""
        ssm, pf = self.ssm, self.pf
        P = pf.n_particles
        n_distr = max(1, len(pf.ssm_sigmas))

        # 3. adaptive resampling (parallel systematic; NT/PF.cc:450-480)
        w = jnp.exp(log_w)
        n_eff = 1.0 / jnp.maximum(jnp.sum(w * w), 1e-30)

        # adaptive distribution weights: EMA toward each distribution's
        # share of the likelihood mass (multi-sampler PF)
        if n_distr > 1 and pf.adapt_distr:
            mass = jax.ops.segment_sum(w, d_idx, num_segments=n_distr)
            mass = mass + 1e-6
            new_dlw = jnp.log(0.5 * jnp.exp(distr_log_w)
                              + 0.5 * mass / jnp.sum(mass))
            new_dlw = new_dlw - jax.scipy.special.logsumexp(new_dlw)
        else:
            new_dlw = distr_log_w

        def resample(args):
            prop, prev, am_p, log_w = args
            cum = jnp.cumsum(jnp.exp(log_w))
            u0 = jax.random.uniform(k_res, ())
            u = (jnp.arange(P, dtype=jnp.float32) + u0) / P
            idx = jnp.searchsorted(cum, u)
            idx = jnp.clip(idx, 0, P - 1)
            return (prop[idx], prev[idx], am_p[idx],
                    jnp.full((P,), -jnp.log(P), jnp.float32))

        if pf.resampling != "none":
            prop, prev_out, am_prop, log_w = jax.lax.cond(
                n_eff < pf.n_eff_ratio * P, resample,
                lambda a: a, (prop, prev_particles, am_prop, log_w))
        else:
            prev_out = prev_particles

        # 4. state estimate (PFParams mean options)
        w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
        if pf.mean_type == "best":
            mean_state = prop[jnp.argmax(log_w)]
        elif pf.mean_type == "corner":
            corners = jax.vmap(
                lambda s: ssm.warp_pts(s, state.region.base_corners))(prop)
            mean_c = jnp.sum(w[:, None, None] * corners, axis=0)
            mean_state = ssm.fit_pts(state.region.base_corners, mean_c)
        else:
            # Euclidean for additive SSMs; iterative Karcher mean for Lie
            # parameterizations (ssm.mean_of_samples override)
            mean_state = ssm.mean_of_samples(prop, w)

        am_state = state.am_state
        if self._sample_am:
            # weighted-mean photometric state (estimateMeanOfSamples for
            # the AM side; ILM params are additive so Euclidean is exact)
            am_state = am_state._replace(
                p_am=jnp.sum(w[:, None] * am_prop, axis=0))
        return prop, prev_out, am_prop, log_w, new_dlw, mean_state, am_state
