"""Normalized cross-correlation appearance model.

Re-design of the reference NCC (`AM/src/NCC.cc` 594 LoC — closed-form
gradients/Hessians w.r.t. normalized patches, NCC.cc:124-410). Here the
closed forms are unnecessary: f is the plain NCC expression and AD delivers
the same derivatives.
"""
from __future__ import annotations

import jax.numpy as jnp

from mtf_tpu.am.base import AM, AMState


class NCC(AM):
    name = "ncc"

    @staticmethod
    def _center_norm(patch, eps=1e-8):
        c = patch - jnp.mean(patch, axis=0, keepdims=True)
        return c / (jnp.linalg.norm(c, axis=0, keepdims=True) + eps)

    def _init_extra(self, patch0):
        # cache the normalized template (reference init_pix_norm)
        return (self._center_norm(patch0),)

    def _similarity(self, state: AMState, patch):
        n0 = state.extra[0]
        nt = self._center_norm(patch)
        # mean over channels of per-channel correlation in [-1, 1]
        return jnp.mean(jnp.sum(n0 * nt, axis=0))

    def likelihood(self, state, patch):
        # exp(-alpha (1 - ncc)) style (NCC.cc getLikelihood)
        return jnp.exp(-self.prm.likelihood_alpha * (1.0 - self.f(state, patch)))

    def dist_feat(self, patch):
        return self._center_norm(patch).reshape(-1)

    def update_model(self, state, patch):
        st = super().update_model(state, patch)
        if self.prm.learning_rate > 0.0:
            st = st._replace(extra=(self._center_norm(st.template),))
        return st
