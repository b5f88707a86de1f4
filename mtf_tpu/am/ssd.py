"""SSD-family appearance models.

Re-designs of the reference SSD family (`AM/src/SSDBase.cc` 607 LoC,
SSD.cc, NSSD.cc, ZNCC.cc, SAD.cc): all are L2 (or L1) losses on a per-AM
feature transform of the patches. The Gauss-Newton Hessian -J^T J and
residual gradients fall out of the generic AD machinery in `am.base`.
"""
from __future__ import annotations

import jax.numpy as jnp

from mtf_tpu.am.base import AM, AMState

Array = None


class SSD(AM):
    """f = -||It - I0||^2 / 2 (reference SSDBase.cc:268-360, SSD.cc).

    With an illumination model attached this is the reference's
    GB/PGB/RBF-compensated SSD (mtf.h ilm handling)."""
    name = "ssd"

    def _similarity(self, state: AMState, patch):
        r = patch - state.template
        return -0.5 * jnp.sum(r * r)

    def likelihood(self, state, patch):
        # exp(-alpha * rms residual): SSDBase.cc:64
        f = self.f(state, patch)
        n = state.template.size
        return jnp.exp(-self.prm.likelihood_alpha
                       * jnp.sqrt(jnp.maximum(-2.0 * f / n, 0.0)))


class NSSD(SSD):
    """SSD on pixels remapped to [0, 1] (reference NSSD.cc pix-range remap).

    Template stored raw (codebase invariant: AMState.template is always the
    raw patch so template-side AD, grad_template, stays valid)."""
    name = "nssd"

    def _norm(self, patch):
        return (patch - self.prm.pix_min) / (self.prm.pix_max - self.prm.pix_min)

    def _similarity(self, state, patch):
        r = self._norm(patch) - self._norm(state.template)
        return -0.5 * jnp.sum(r * r)


class ZNCC(SSD):
    """SSD on per-patch standardized pixels (reference ZNCC.cc:
    zero-mean unit-variance remap feeding the SSDBase kernel)."""
    name = "zncc"

    @staticmethod
    def _standardize(patch, eps=1e-8):
        mu = jnp.mean(patch, axis=0, keepdims=True)
        sd = jnp.std(patch, axis=0, keepdims=True)
        return (patch - mu) / (sd + eps)

    def _similarity(self, state, patch):
        r = self._standardize(patch) - self._standardize(state.template)
        return -0.5 * jnp.sum(r * r)

    def dist_feat(self, patch):
        return self._standardize(patch).reshape(-1)


class SAD(AM):
    """Sum of absolute differences — distance-feature AM for NN search
    (reference SAD.cc: L1, no gradient interface)."""
    name = "sad"

    def _similarity(self, state: AMState, patch):
        return -jnp.sum(jnp.abs(patch - state.template))
