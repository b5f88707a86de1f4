"""RIU, NGF, PCA and SumOfAMs appearance models.

Re-designs of the reference `AM/src/RIU.cc` (251), `NGF.cc` (741),
`PCA.cc` (407, the online-learning AM), `SumOfAMs.cc` (276).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mtf_tpu.am.base import AM, AMState


class RIU(AM):
    """Ratio image uniformity: f = -var(r)/mean(r)^2 with r = It/I0
    (reference RIU.cc)."""
    name = "riu"

    def _similarity(self, state: AMState, patch):
        eps = 1.0
        r = (patch + eps) / (state.template + eps)
        mu = jnp.mean(r)
        return -jnp.var(r) / (mu * mu + 1e-12)

    def likelihood(self, state, patch):
        return jnp.exp(self.prm.likelihood_alpha * self.f(state, patch))


class NGF(AM):
    """Normalized gradient fields (reference NGF.cc): similarity of
    eta-regularized gradient directions, computed from the patch's own
    spatial layout (resy x resx grid)."""
    name = "ngf"

    def _grad_feat(self, patch):
        ry, rx = self.prm.resy, self.prm.resx
        c = patch.shape[-1]
        img = patch.reshape(ry, rx, c)
        gy, gx = jnp.gradient(img, axis=(0, 1))
        return jnp.stack([gx.reshape(ry * rx, c),
                          gy.reshape(ry * rx, c)], axis=-1)  # (N, C, 2)

    def _init_extra(self, patch0):
        return (self._grad_feat(patch0),)

    def _similarity(self, state: AMState, patch):
        eta = self.prm.extra.get("eta", 5.0)
        g0 = state.extra[0]
        gt = self._grad_feat(patch)
        dot = jnp.sum(g0 * gt, axis=-1)  # (N, C)
        n0 = jnp.sum(g0 * g0, axis=-1) + eta * eta
        nt = jnp.sum(gt * gt, axis=-1) + eta * eta
        return jnp.sum(dot * dot / (n0 * nt))

    def likelihood(self, state, patch):
        return jnp.exp(self.prm.likelihood_alpha * self.f(state, patch)
                       / self.n_pix)


class PCA(AM):
    """Online subspace appearance model (reference PCA.cc / PCA.h:42-78):
    residual energy outside an eigenbasis that is re-estimated every
    `batch_size` frames from a buffer of recent patches.

    extra = (mean, basis (NC, K), buffer (batch, NC), count)."""
    name = "pca"

    @property
    def _k(self):
        return self.prm.extra.get("n_eigenvec", 16)

    @property
    def _batch(self):
        return self.prm.extra.get("batch_size", 30)

    def _init_extra(self, patch0):
        d = patch0.size
        mean = patch0.reshape(-1)
        basis = jnp.zeros((d, self._k), patch0.dtype)
        buf = jnp.zeros((self._batch, d), patch0.dtype)
        return (mean, basis, buf, jnp.zeros((), jnp.int32))

    def _similarity(self, state: AMState, patch):
        mean, basis, _, _ = state.extra
        r = patch.reshape(-1) - mean
        proj = basis.T @ r
        return -0.5 * (jnp.sum(r * r) - jnp.sum(proj * proj))

    @property
    def needs_update_model(self) -> bool:
        return True  # PCA always collects patches for the subspace refit

    def update_model(self, state: AMState, patch):
        """Collect the patch; every batch_size frames refit mean+basis by
        SVD over the buffer (reference incremental update semantics)."""
        mean, basis, buf, count = state.extra
        idx = jnp.mod(count, self._batch)
        buf = jax.lax.dynamic_update_slice(buf, patch.reshape(1, -1), (idx, 0))
        count = count + 1

        def refit(args):
            mean, basis, buf = args
            new_mean = jnp.mean(buf, axis=0)
            centered = buf - new_mean
            # right singular vectors of (batch, D): eigenvectors of patch space
            _, _, vt = jnp.linalg.svd(centered, full_matrices=False)
            k = self._k
            new_basis = jnp.zeros_like(basis).at[:, : min(k, vt.shape[0])].set(
                vt[: min(k, vt.shape[0])].T)
            return new_mean, new_basis

        do_refit = jnp.logical_and(count >= self._batch,
                                   jnp.mod(count, self._batch) == 0)
        mean, basis = jax.lax.cond(
            do_refit, refit, lambda a: (a[0], a[1]), (mean, basis, buf))
        return state._replace(extra=(mean, basis, buf, count))

    def likelihood(self, state, patch):
        f = self.f(state, patch)
        n = state.template.size
        return jnp.exp(-self.prm.likelihood_alpha
                       * jnp.sqrt(jnp.maximum(-2.0 * f / n, 0.0)))


class SumOfAMs(AM):
    """Weighted combination of two AMs on the same patch
    (reference SumOfAMs.cc: normalized sum of similarities; concatenated
    distance features)."""
    name = "sum"

    def __init__(self, am1: AM, am2: AM, w1: float = 0.5, w2: float = 0.5):
        super().__init__(am1.prm, am1.ilm)
        self.am1, self.am2 = am1, am2
        self.w1, self.w2 = w1, w2
        self.name = f"sum({am1.name},{am2.name})"

    def init(self, patch0):
        return AMState(template=patch0,
                       p_am=self.ilm.identity_params(patch0.dtype),
                       extra=(self.am1.init(patch0), self.am2.init(patch0)))

    def _similarity(self, state, patch):
        # weighted sum of sub-similarities on the (already illumination-
        # corrected) patch; each sub-AM evaluates against its own sub-state
        # so processed-template internals (ZNCC standardization, SCV remaps,
        # PCA bases, ...) stay per-AM (SumOfAMs.cc:similarity)
        s1, s2 = state.extra
        return (self.w1 * self.am1._similarity(s1, patch)
                + self.w2 * self.am2._similarity(s2, patch))

    def likelihood(self, state, patch):
        s1, s2 = state.extra
        return (self.am1.likelihood(s1, patch)
                * self.am2.likelihood(s2, patch))

    def dist_feat(self, patch):
        return jnp.concatenate([self.am1.dist_feat(patch),
                                self.am2.dist_feat(patch)])

    @property
    def needs_update_model(self) -> bool:
        return (self.am1.needs_update_model or self.am2.needs_update_model)

    def update_model(self, state, patch):
        s1, s2 = state.extra
        return state._replace(extra=(self.am1.update_model(s1, patch),
                                     self.am2.update_model(s2, patch)))

    def self_state(self, patch, p_am):
        return AMState(template=patch, p_am=p_am,
                       extra=(self.am1.self_state(patch, p_am),
                              self.am2.self_state(patch, p_am)))
