"""Particle filter with the particle population sharded over a mesh axis.

BASELINE milestone config #4. The reference PF is a serial per-particle
loop with a binary-search multinomial resampler
(`/root/reference/SM/src/NT/PF.cc:207-480`); the single-chip rebuild
(`mtf_tpu/sm/pf.py`) turns that into one vmap. This module shards that
vmap over mesh axis `particle` with `shard_map`.

Design: the *expensive* part of a PF update — per-particle propagate +
patch gather + likelihood (`PF._propagate_measure`) — is embarrassingly
parallel and runs on local particle slices. The *cheap* cross-particle
part — weight normalization, ESS test, systematic resampling, sampler-
distribution adaptation, mean state (`PF._finish`) — operates on tiny
(P, S<=8) arrays, so the per-shard results are `all_gather`ed (rides ICI)
and the IDENTICAL full-population code runs replicated on every shard,
each keeping its 1/n_dev slice of the output. Randomness is drawn from
replicated keys and sliced per shard, so for the same seed a ShardedPF
step is numerically the same program as a PF step — the
`tests/test_shard_parity.py` equivalence tests rely on this.

Full PF feature parity: multi-distribution adaptive samplers
(`ssm_sigmas`/`distr_log_w`), photometric AM-state particles (`am_sigma`),
`jacobian_as_sigma` (computed replicated — it only needs the current state
and frame), and all mean types including the Lie Karcher mean.
"""
from __future__ import annotations

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
        if self.pf.rescore_top_k > 0:
            raise ValueError(
                "PFParams.rescore_top_k needs a global top-k across "
                "particle shards and is not supported by ShardedPF; "
                "use score_stride-only decimation or the unsharded PF")
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
            # zero-width (P, 0) am_particles are canonicalized to
            # replicated by XLA; shard them only when AM sampling is on
            ps = PFState(particles=part, prev_particles=part,
                         log_weights=part, key=repl,
                         distr_log_w=repl,
                         am_particles=part if self._sample_am else repl,
                         score_am=jax.tree.map(
                             lambda _: repl, state.extra.score_am))
            return TrackerState(ssm_state=repl, am_state=jax.tree.map(
                lambda _: repl, state.am_state), region=jax.tree.map(
                lambda _: repl, state.region), extra=ps)
        return spec_of

    def place(self, state: TrackerState) -> TrackerState:
        """Lay out an (un)sharded TrackerState onto the mesh."""
        return jax.device_put(state, self._state_shardings()(state))

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        am, pf = self.am, self.pf
        P_total = pf.n_particles
        n_dev = self.mesh.shape[self.axis]
        P_loc = P_total // n_dev
        ps: PFState = state.extra
        ax = self.axis

        # jacobian-as-sigma needs only the (replicated) current state and
        # frame: one GN step, computed once outside the manual region
        sigma = self._effective_sigma(state, frame)

        def shard_update(particles, prev, am_p, log_w_prev, key, distr_lw,
                         frame, sigma):
            """particles/prev/log_w_prev are this shard's slices; am_p is
            a local slice when AM sampling is on, else the (P, 0) full
            array (replicated); key/distr_lw/frame/sigma replicated."""
            idx = jax.lax.axis_index(ax)

            def loc(x):
                return jax.lax.dynamic_slice_in_dim(x, idx * P_loc, P_loc)

            # replicated draws sliced per shard == the PF's global draws
            key, k_prop, k_res, k_distr, k_am = jax.random.split(key, 5)
            prop_keys = loc(jax.random.split(k_prop, P_total))

            if self._sample_am:
                noise = jax.random.normal(
                    k_am, (P_total, am_p.shape[1]), jnp.float32)
                am_loc = am_p + jnp.asarray(
                    pf.am_sigma, jnp.float32)[None, :] * loc(noise)
            else:
                am_loc = loc(am_p)  # (P_loc, 0) slice of replicated input

            d_idx, sig_p = self._draw_sigmas(k_distr, distr_lw, sigma,
                                             P_total)

            # 1-2. propagate + measure on the local slice (the hot part);
            # reduce_axis anchors the dense-sampling crop window on the
            # GLOBAL point cloud so per-particle validity is identical to
            # the unsharded PF regardless of shard layout
            prop_loc, log_lik_loc, valid_loc = self._propagate_measure(
                state, frame, prop_keys, particles, prev, loc(sig_p),
                am_loc, reduce_axis=ax)

            # gather the tiny per-particle tables; everything below runs
            # replicated and identical to PF._finish (the crop-window
            # mask applies on the GLOBAL population — same any() result
            # on every shard)
            gather = lambda x: jax.lax.all_gather(x, ax, tiled=True)  # noqa: E731
            prop = gather(prop_loc)
            log_lik = self._apply_window_mask(gather(log_lik_loc),
                                              gather(valid_loc))
            log_w = gather(log_w_prev) + log_lik
            log_w = log_w - jax.scipy.special.logsumexp(log_w)

            (prop, prev_out, am_out, log_w, new_dlw, mean_state,
             am_state) = self._finish(state, prop, gather(particles),
                                      gather(am_loc), log_w, d_idx,
                                      distr_lw, k_res)
            am_ret = loc(am_out) if self._sample_am else am_out
            return (loc(prop), loc(prev_out), am_ret, loc(log_w),
                    key, new_dlw, mean_state, am_state)

        pspec, rspec = P(ax), P()
        # check_vma=False: `_finish` mixes all_gather'ed values (typed
        # "varying") with fresh constants ("unvarying") inside lax.cond
        # branches; the values are genuinely replicated after the gathers,
        # so the replication check is disabled rather than threading
        # pcast annotations through shared PF code.
        amspec = pspec if self._sample_am else rspec
        shard_fn = jax.shard_map(
            shard_update, mesh=self.mesh,
            in_specs=(pspec, pspec, amspec, pspec, rspec, rspec, rspec,
                      rspec),
            out_specs=(pspec, pspec, amspec, pspec, rspec, rspec, rspec,
                       rspec),
            check_vma=False)
        (prop, prev_out, am_prop, log_w, key, new_dlw, mean_state,
         am_state) = shard_fn(ps.particles, ps.prev_particles,
                              ps.am_particles, ps.log_weights, ps.key,
                              ps.distr_log_w, frame, sigma)

        new_am, new_score = self._learn_mean_patch(
            state, am_state, mean_state, frame, ps.score_am)
        new_extra = PFState(particles=prop, prev_particles=prev_out,
                            log_weights=log_w, key=key,
                            distr_log_w=new_dlw, am_particles=am_prop,
                            score_am=new_score)
        new_state = state._replace(ssm_state=mean_state, extra=new_extra)
        return new_state._replace(am_state=new_am)
