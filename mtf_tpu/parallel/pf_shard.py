"""Particle filter with the particle population sharded over a mesh axis.

BASELINE milestone config #4. The reference PF is a serial per-particle
loop with a binary-search multinomial resampler
(`/root/reference/SM/src/NT/PF.cc:207-480`); the single-chip rebuild
(`mtf_tpu/sm/pf.py`) turns that into one vmap. This module shards that
vmap over mesh axis `particle` with `shard_map`:

  * propagate + measure: embarrassingly parallel per shard;
  * weight normalization: global log-sum-exp = `pmax` + `psum` over ICI;
  * effective-sample-size test: `psum(w^2)`;
  * systematic resampling: globally stratified u_i against the global
    cumulative weight vector. Particle states are tiny ((P, S), S<=8), so
    the global weight/state tables are `all_gather`ed (rides ICI) and each
    shard keeps its own 1/n_dev slice of the resampled population;
  * mean state: `psum` of weight-convex combinations.

Semantics match `mtf_tpu.sm.pf.PF` exactly for the same seed layout; the
resampling branch is computed unconditionally and selected with `where`
(collectives inside `lax.cond` require replicated predicates — computing
both sides keeps the SPMD program trivially correct, and the resample path
is only gathers).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtf_tpu.sm.core import TrackerState
from mtf_tpu.sm.pf import PF, PFState

Array = jax.Array


class ShardedPF(PF):
    """PF whose particle axis is sharded over `mesh[axis]`.

    Public API identical to `PF`; `n_particles` must be divisible by the
    axis size.
    """

    def __init__(self, am, ssm, prm=None, pf=None, *,
                 mesh: Mesh, axis: str = "particle"):
        super().__init__(am, ssm, prm, pf)
        if self.pf.n_particles % mesh.shape[axis] != 0:
            raise ValueError(
                f"n_particles={self.pf.n_particles} not divisible by "
                f"mesh axis {axis!r} size {mesh.shape[axis]}")
        self.mesh = mesh
        self.axis = axis

    # Shard the PFState leaves over the particle axis, rest replicated.
    def _state_shardings(self):
        mesh, ax = self.mesh, self.axis
        part = NamedSharding(mesh, P(ax))
        repl = NamedSharding(mesh, P())

        def spec_of(state: TrackerState):
            ps = PFState(particles=part, prev_particles=part,
                         log_weights=part, key=repl)
            return TrackerState(ssm_state=repl, am_state=jax.tree.map(
                lambda _: repl, state.am_state), region=jax.tree.map(
                lambda _: repl, state.region), extra=ps)
        return spec_of

    def place(self, state: TrackerState) -> TrackerState:
        """Lay out an (un)sharded TrackerState onto the mesh."""
        return jax.device_put(state, self._state_shardings()(state))

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        ssm, am, pf = self.ssm, self.am, self.pf
        P_total = pf.n_particles
        n_dev = self.mesh.shape[self.axis]
        P_loc = P_total // n_dev
        ps: PFState = state.extra
        sigma = self._sigma(state.region)
        compositional = pf.update_type == "compositional"
        ax = self.axis

        def shard_update(particles, prev, log_w_prev, key, frame):
            """Runs on one shard: (P_loc, S) particles."""
            idx = jax.lax.axis_index(ax)
            key, k_prop, k_res = jax.random.split(key, 3)
            k_prop = jax.random.fold_in(k_prop, idx)
            prop_keys = jax.random.split(k_prop, P_loc)

            # 1. propagate (local vmap)
            if pf.dynamic_model == "ar1":
                prop = jax.vmap(lambda k, s, sp: ssm.auto_regression1(
                    k, s, sp, sigma, pf.ar_alpha, compositional))(
                        prop_keys, particles, prev)
            else:
                prop = jax.vmap(lambda k, s: ssm.random_walk(
                    k, s, sigma, compositional))(prop_keys, particles)

            # 2. measure (local batched gather + likelihood)
            patches = jax.vmap(
                lambda s: self._particle_patch(state.region, s, frame))(prop)
            log_lik = jax.vmap(
                lambda p: self._log_lik(state.am_state, p))(patches)
            log_w = log_w_prev + log_lik

            # global log-sum-exp normalization: pmax + psum over ICI
            m = jax.lax.pmax(jnp.max(log_w), ax)
            z = jax.lax.psum(jnp.sum(jnp.exp(log_w - m)), ax)
            log_w = log_w - (m + jnp.log(z))
            w = jnp.exp(log_w)

            # 3. resampling decision on globally-reduced ESS
            n_eff = 1.0 / jnp.maximum(jax.lax.psum(jnp.sum(w * w), ax),
                                      1e-30)

            # systematic resampling against the global cumulative weights;
            # this shard draws its own stratified slice of [0,1)
            w_all = jax.lax.all_gather(w, ax, tiled=True)          # (P,)
            prop_all = jax.lax.all_gather(prop, ax, tiled=True)    # (P, S)
            prev_all = jax.lax.all_gather(particles, ax, tiled=True)
            cum = jnp.cumsum(w_all)
            u0 = jax.random.uniform(k_res, ())  # same on all shards
            u = (idx * P_loc + jnp.arange(P_loc, dtype=jnp.float32) + u0) \
                / P_total
            sel = jnp.clip(jnp.searchsorted(cum, u), 0, P_total - 1)
            res_prop = prop_all[sel]
            res_prev = prev_all[sel]
            res_logw = jnp.full((P_loc,), -jnp.log(float(P_total)),
                                jnp.float32)

            do_res = jnp.logical_and(
                pf.resampling != "none",
                n_eff < pf.n_eff_ratio * P_total)
            new_prop = jnp.where(do_res, res_prop, prop)
            new_prev = jnp.where(do_res, res_prev, particles)
            new_logw = jnp.where(do_res, res_logw, log_w)

            # 4. state estimate (global psum-weighted mean)
            w_out = jnp.exp(new_logw)
            w_out = w_out / jnp.maximum(
                jax.lax.psum(jnp.sum(w_out), ax), 1e-30)
            if pf.mean_type == "best":
                i_loc = jnp.argmax(new_logw)
                best_here = jnp.concatenate(
                    [new_logw[i_loc][None], new_prop[i_loc]])
                bests = jax.lax.all_gather(best_here, ax)  # (n_dev, 1+S)
                mean_state = bests[jnp.argmax(bests[:, 0]), 1:]
            elif pf.mean_type == "corner":
                corners = jax.vmap(lambda s: ssm.warp_pts(
                    s, state.region.base_corners))(new_prop)
                mean_c = jax.lax.psum(
                    jnp.sum(w_out[:, None, None] * corners, axis=0), ax)
                mean_state = ssm.fit_pts(state.region.base_corners, mean_c)
            else:
                mean_state = jax.lax.psum(
                    jnp.sum(w_out[:, None] * new_prop, axis=0), ax)

            return new_prop, new_prev, new_logw, key, mean_state

        pspec = P(ax)
        rspec = P()
        shard_fn = jax.shard_map(
            shard_update, mesh=self.mesh,
            in_specs=(pspec, pspec, pspec, rspec, rspec),
            out_specs=(pspec, pspec, pspec, rspec, rspec))
        prop, prev_out, log_w, key, mean_state = shard_fn(
            ps.particles, ps.prev_particles, ps.log_weights, ps.key, frame)

        new_extra = PFState(particles=prop, prev_particles=prev_out,
                            log_weights=log_w, key=key)
        new_state = state._replace(ssm_state=mean_state, extra=new_extra)
        patch = self._particle_patch(state.region, mean_state, frame)
        return new_state._replace(
            am_state=am.update_model(state.am_state, patch))
