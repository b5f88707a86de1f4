"""RegNet: learned regression-network search method.

Re-designs the reference `SM/src/NT/RegNet.cc` (356 LoC + netUtils/Caffe):
a network maps the appearance difference between the current patch and the
template to a warp-state correction; it is trained at `initialize` time on
synthetically perturbed views of the template (the same dataset generation
as NN, SURVEY.md §3.4) and applied iteratively at `update`.

TPU-native: the net is a small MLP in pure jax trained with optax Adam as
one `lax.scan` of minibatch steps — training runs entirely on device at
init (no Caffe, no host loop). Update cost is two matmuls — the cheapest
SM per iteration, and the whole tracker stays one jittable pytree program.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import SearchMethod, TrackerState

Array = jax.Array


@dataclass(frozen=True)
class RegNetParams:
    """Reference RegNetParams analog."""
    n_samples: int = 2000
    hidden: tuple = (128, 64)
    train_steps: int = 300
    batch_size: int = 256
    learning_rate: float = 1e-3
    pix_sigma: float = 4.0
    ssm_sigma: tuple = ()
    max_iters: int = 5
    epsilon: float = 0.01
    seed: int = 0


class RegNetState(NamedTuple):
    params: tuple    # MLP (W, b) pairs
    feat0: Array     # template feature vector
    feat_scale: Array


def _mlp_init(key, sizes):
    params = []
    for i in range(len(sizes) - 1):
        key, k = jax.random.split(key)
        w = jax.random.normal(k, (sizes[i], sizes[i + 1]), jnp.float32) \
            / jnp.sqrt(jnp.asarray(sizes[i], jnp.float32))
        params.append((w, jnp.zeros((sizes[i + 1],), jnp.float32)))
    return tuple(params)


def _mlp_apply(params, x):
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if i < len(params) - 1:
            x = jnp.tanh(x)
    return x


class RegNet(SearchMethod):
    name = "regnet"

    def __init__(self, am, ssm, prm=None, rn: RegNetParams | None = None):
        super().__init__(am, ssm, prm)
        self.rn = rn or RegNetParams()

    def _sigma(self, region) -> Array:
        if self.rn.ssm_sigma:
            return jnp.asarray(self.rn.ssm_sigma, jnp.float32)
        scale = region.norm_mat[0, 0]
        return self.ssm.state_sigma_from_pixel_sigma(
            self.rn.pix_sigma / scale, region.base_pts)

    def _patch_at(self, region, s, frame):
        pts_t = self.ssm.warp_pts(s, region.base_pts)
        pts = W.apply_warp(region.norm_mat, pts_t)
        return interp.sample(frame, pts, self.prm.interp, self.prm.border)

    def _init_extra(self, state: TrackerState, frame: Array):
        import optax

        rn, ssm = self.rn, self.ssm
        K, S = rn.n_samples, ssm.dof
        sigma = self._sigma(state.region)
        key = jax.random.PRNGKey(rn.seed)
        key, k_dp = jax.random.split(key)
        dps = sigma[None, :] * jax.random.normal(k_dp, (K, S), jnp.float32)

        feat0 = self.am.dist_feat(
            self._patch_at(state.region, ssm.identity(), frame))
        feat_scale = jnp.maximum(jnp.std(feat0), 1e-6)

        def example(dp):
            patch = self._patch_at(state.region, dp, frame)
            x = (self.am.dist_feat(patch) - feat0) / feat_scale
            return x, ssm.invert(dp) / jnp.maximum(sigma, 1e-12)

        X, Y = jax.lax.map(example, dps, batch_size=min(K, 256))

        sizes = (X.shape[-1],) + tuple(rn.hidden) + (S,)
        params = _mlp_init(key, sizes)
        opt = optax.adam(rn.learning_rate)
        opt_state = opt.init(params)

        def loss_fn(p, xb, yb):
            pred = _mlp_apply(p, xb)
            return jnp.mean(jnp.sum((pred - yb) ** 2, axis=-1))

        def step(carry, k):
            p, o = carry
            idx = jax.random.randint(k, (rn.batch_size,), 0, K)
            g = jax.grad(loss_fn)(p, X[idx], Y[idx])
            updates, o = opt.update(g, o, p)
            return (optax.apply_updates(p, updates), o), ()

        keys = jax.random.split(key, rn.train_steps)
        (params, _), _ = jax.lax.scan(step, (params, opt_state), keys)
        return RegNetState(params=params, feat0=feat0,
                           feat_scale=feat_scale)

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        ssm, rn = self.ssm, self.rn
        rs: RegNetState = state.extra
        sigma = self._sigma(state.region)

        def corners_of(s):
            c_t = ssm.warp_pts(s, state.region.base_corners)
            return W.apply_warp(state.region.norm_mat, c_t)

        def body(carry):
            s, it, _ = carry
            patch = self._patch_at(state.region, s, frame)
            x = (self.am.dist_feat(patch) - rs.feat0) / rs.feat_scale
            dp = _mlp_apply(rs.params, x) * sigma
            s_new = ssm.compositional_update(s, dp)
            change = jnp.max(jnp.linalg.norm(
                corners_of(s_new) - corners_of(s), axis=-1))
            return s_new, it + 1, change < rn.epsilon

        def cond(carry):
            _, it, done = carry
            return jnp.logical_and(it < rn.max_iters, jnp.logical_not(done))

        s_out, _, _ = jax.lax.while_loop(
            cond, body, (state.ssm_state, jnp.zeros((), jnp.int32),
                         jnp.asarray(False)))
        new_state = state._replace(ssm_state=s_out)
        patch = self._patch_at(state.region, s_out, frame)
        return new_state._replace(
            am_state=self.am.update_model(state.am_state, patch))
