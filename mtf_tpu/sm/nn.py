"""Nearest-neighbour search method.

TPU-native re-design of the reference NN/GNN SMs (`SM/src/NN.cc` 417,
`NT/NN.cc` 280, `GNN.cc` 478 + FLANN index machinery): an offline dataset
of SSM-perturbed template views is searched per frame for the best-matching
appearance, and the stored perturbation is applied compositionally
(SURVEY.md §3.4).

Design: the FLANN/GNN graph indices are CPU-cache optimizations; on TPU a
brute-force distance computation is one (K, D) x (D,) MXU matmul and beats
graph traversal while keeping exact-NN semantics. Dataset generation is a
single vmapped warp+gather over all K samples. Index save/load (reference
NNParams.h:35-37) is plain array serialization of the extra pytree.
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
class NNParams:
    """Reference NNParams.h / FLANNParams.h analog."""
    n_samples: int = 1000
    max_iters: int = 3
    pix_sigma: float = 4.0
    ssm_sigma: tuple = ()      # explicit per-dof sigmas (overrides pix_sigma)
    epsilon: float = 0.01      # corner-change convergence threshold
    add_samples_gap: int = 0   # frames between online dataset updates;
                               # 0 disables (NNParams.h:29-33)
    n_samples_to_add: int = 8  # ring-replaced per update (oldest evicted,
                               # keeping the dataset at n_samples)
    seed: int = 0


class NNState(NamedTuple):
    feats: Array     # (K, D) dataset distance-features
    feats_sq: Array  # (K,) cached squared norms
    dps: Array       # (K, S) stored perturbations
    ptr: Array       # () int32 ring pointer for online sample addition
    frame_idx: Array  # () int32 frames since initialize
    key: Array       # online-sampling PRNG


class NN(SearchMethod):
    name = "nn"

    def __init__(self, am, ssm, prm=None, nn: NNParams | None = None):
        super().__init__(am, ssm, prm)
        self.nn = nn or NNParams()

    def _sigma(self, region) -> Array:
        if self.nn.ssm_sigma:
            return jnp.asarray(self.nn.ssm_sigma, jnp.float32)
        scale = region.norm_mat[0, 0]
        return self.ssm.state_sigma_from_pixel_sigma(
            self.nn.pix_sigma / scale, region.base_pts)

    def _patch_at(self, region, s, frame):
        pts_t = self.ssm.warp_pts(s, region.base_pts)
        pts = W.apply_warp(region.norm_mat, pts_t)
        return interp.sample(frame, pts, self.prm.interp, self.prm.border)

    def _init_extra(self, state: TrackerState, frame: Array):
        """Dataset generation: one vmapped warp+gather over K samples
        (reference NN::generateDataset, NN.cc:131)."""
        K = self.nn.n_samples
        sigma = self._sigma(state.region)
        key = jax.random.PRNGKey(self.nn.seed)
        dps = sigma[None, :] * jax.random.normal(
            key, (K, self.ssm.dof), jnp.float32)
        # sample 0 is the identity so a perfect match stays put
        dps = dps.at[0].set(0.0)

        def sample_feat(dp):
            patch = self._patch_at(state.region, dp, frame)
            return self.am.dist_feat(patch)

        feats = jax.lax.map(sample_feat, dps,
                            batch_size=min(K, 256))  # bounded memory
        # if the current patch matches the template viewed under dp, the
        # state correction is dp^-1 (reference inverts the perturbations at
        # dataset build, NN.cc generateDataset) — store the inverses
        dps_inv = jax.vmap(self.ssm.invert)(dps)
        return NNState(feats=feats,
                       feats_sq=jnp.sum(feats * feats, axis=-1),
                       dps=dps_inv,
                       ptr=jnp.zeros((), jnp.int32),
                       frame_idx=jnp.zeros((), jnp.int32),
                       key=jax.random.PRNGKey(self.nn.seed + 1))

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        ssm, nn = self.ssm, self.nn
        ns: NNState = state.extra

        def corners_of(s):
            c_t = ssm.warp_pts(s, state.region.base_corners)
            return W.apply_warp(state.region.norm_mat, c_t)

        def body(carry):
            s, it, done = carry
            patch = self._patch_at(state.region, s, frame)
            q = self.am.dist_feat(patch)
            # L2 distances via one MXU matmul (||x||^2 - 2 x.q + const)
            scores = ns.feats_sq - 2.0 * (ns.feats @ q)
            best = jnp.argmin(scores)
            s_new = ssm.compositional_update(s, ns.dps[best])
            change = jnp.max(jnp.linalg.norm(
                corners_of(s_new) - corners_of(s), axis=-1))
            return s_new, it + 1, change < nn.epsilon

        def cond(carry):
            _, it, done = carry
            return jnp.logical_and(it < nn.max_iters, jnp.logical_not(done))

        s_out, _, _ = jax.lax.while_loop(
            cond, body, (state.ssm_state, jnp.zeros((), jnp.int32),
                         jnp.asarray(False)))
        new_extra = ns._replace(frame_idx=ns.frame_idx + 1)
        if nn.add_samples_gap > 0:
            # online dataset update (NNParams.h:29-33): ring-replace the
            # oldest non-identity samples with fresh perturbations around
            # the converged state, featurized from the CURRENT frame
            A, K = nn.n_samples_to_add, nn.n_samples
            key, k_add = jax.random.split(ns.key)
            sigma = self._sigma(state.region)
            dp_new = sigma[None, :] * jax.random.normal(
                k_add, (A, ssm.dof), jnp.float32)

            def feat_of(dp):
                s_k = ssm.compositional_update(s_out, dp)
                return self.am.dist_feat(
                    self._patch_at(state.region, s_k, frame))

            f_new = jax.vmap(feat_of)(dp_new)                  # (A, D)
            dp_inv = jax.vmap(ssm.invert)(dp_new)
            idx = 1 + (ns.ptr + jnp.arange(A)) % (K - 1)       # skip id 0
            fire = (ns.frame_idx % nn.add_samples_gap) == 0
            feats = ns.feats.at[idx].set(
                jnp.where(fire, f_new, ns.feats[idx]))
            new_extra = new_extra._replace(
                feats=feats,
                feats_sq=ns.feats_sq.at[idx].set(
                    jnp.where(fire, jnp.sum(f_new * f_new, -1),
                              ns.feats_sq[idx])),
                dps=ns.dps.at[idx].set(
                    jnp.where(fire, dp_inv, ns.dps[idx])),
                ptr=ns.ptr + jnp.where(fire, A, 0),
                key=key)
        new_state = state._replace(ssm_state=s_out, extra=new_extra)
        patch = self._patch_at(state.region, s_out, frame)
        return new_state._replace(
            am_state=self.am.update_model(state.am_state, patch))

    # -- index persistence (NNParams.h:35-37 save_index/load_index;
    #    GNN.h:44-45 saveGraph/loadGraph) ------------------------------
    def save_index(self, state: TrackerState, path: str) -> None:
        """Persist the sample dataset + perturbations."""
        from mtf_tpu.utils.checkpoint import save_state
        save_state(path, state.extra)

    def load_index(self, state: TrackerState, path: str) -> TrackerState:
        """Replace the dataset with a previously saved one (skips the
        dataset-generation cost on re-init)."""
        from mtf_tpu.utils.checkpoint import load_state
        return state._replace(extra=load_state(path, state.extra))
