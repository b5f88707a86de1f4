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
    ar_alpha: float = 0.5
    n_eff_ratio: float = 0.5          # adaptive resampling threshold
    measurement_sigma: float = 0.1    # gaussian likelihood scale
    seed: int = 0


class PFState(NamedTuple):
    particles: Array       # (P, S)
    prev_particles: Array  # (P, S) for AR(1)
    log_weights: Array     # (P,)
    key: Array


class PF(SearchMethod):
    name = "pf"

    def __init__(self, am, ssm, prm=None, pf: PFParams | None = None):
        super().__init__(am, ssm, prm)
        self.pf = pf or PFParams()

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

    def _log_lik(self, am_state, patch):
        f = self.am.f(am_state, patch)
        if self.pf.likelihood == "am":
            return jnp.log(self.am.likelihood(am_state, patch) + 1e-30)
        if self.pf.likelihood == "gaussian":
            return f / (2.0 * self.pf.measurement_sigma ** 2)
        # reciprocal: 1/(1 - f) style for similarities peaking at high f
        return -jnp.log1p(-f + 1e-6)

    # -- API -----------------------------------------------------------
    def _init_extra(self, state: TrackerState, frame: Array):
        P = self.pf.n_particles
        particles = jnp.tile(state.ssm_state[None, :], (P, 1))
        return PFState(
            particles=particles,
            prev_particles=particles,
            log_weights=jnp.full((P,), -jnp.log(P), jnp.float32),
            key=jax.random.PRNGKey(self.pf.seed))

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        ssm, am, pf = self.ssm, self.am, self.pf
        P = pf.n_particles
        ps: PFState = state.extra
        sigma = self._sigma(state.region)
        compositional = pf.update_type == "compositional"

        key, k_prop, k_res = jax.random.split(ps.key, 3)
        prop_keys = jax.random.split(k_prop, P)

        # 1. propagate (vmap over particles; NT/PF.cc:261 loop)
        if pf.dynamic_model == "ar1":
            prop = jax.vmap(lambda k, s, sp: ssm.auto_regression1(
                k, s, sp, sigma, pf.ar_alpha, compositional))(
                    prop_keys, ps.particles, ps.prev_particles)
        else:
            prop = jax.vmap(lambda k, s: ssm.random_walk(
                k, s, sigma, compositional))(prop_keys, ps.particles)

        # 2. measure (batched patch gather + likelihood)
        patches = jax.vmap(
            lambda s: self._particle_patch(state.region, s, frame))(prop)
        log_lik = jax.vmap(lambda p: self._log_lik(state.am_state, p))(patches)

        log_w = ps.log_weights + log_lik
        log_w = log_w - jax.scipy.special.logsumexp(log_w)

        # 3. adaptive resampling (parallel systematic; NT/PF.cc:450-480)
        w = jnp.exp(log_w)
        n_eff = 1.0 / jnp.maximum(jnp.sum(w * w), 1e-30)

        def resample(args):
            prop, prev, log_w = args
            cum = jnp.cumsum(jnp.exp(log_w))
            u0 = jax.random.uniform(k_res, ())
            u = (jnp.arange(P, dtype=jnp.float32) + u0) / P
            idx = jnp.searchsorted(cum, u)
            idx = jnp.clip(idx, 0, P - 1)
            return (prop[idx], prev[idx],
                    jnp.full((P,), -jnp.log(P), jnp.float32))

        if pf.resampling != "none":
            prop, prev_out, log_w = jax.lax.cond(
                n_eff < pf.n_eff_ratio * P, resample,
                lambda a: a, (prop, ps.particles, log_w))
        else:
            prev_out = ps.particles

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

        new_extra = PFState(particles=prop, prev_particles=prev_out,
                            log_weights=log_w, key=key)
        new_state = state._replace(ssm_state=mean_state, extra=new_extra)
        patch = self._particle_patch(state.region, mean_state, frame)
        return new_state._replace(
            am_state=am.update_model(state.am_state, patch))
