"""Structural-similarity appearance models.

Re-designs of the reference SSIM (`AM/src/SSIM.cc` 343 LoC: patch
means/variances/covariance form) and SPSS (`AM/src/SPSS.cc` 271 LoC: sum of
pixelwise structural similarity).
"""
from __future__ import annotations

import jax.numpy as jnp

from mtf_tpu.am.base import AM, AMState


class SSIM(AM):
    """Single-window SSIM over the whole patch (per channel, averaged)."""
    name = "ssim"

    def _similarity(self, state: AMState, patch):
        c1 = self.prm.extra.get("c1", 6.5025)    # (k1*L)^2, L=255, k1=0.01
        c2 = self.prm.extra.get("c2", 58.5225)   # (k2*L)^2, k2=0.03
        t = state.template
        mu0 = jnp.mean(t, axis=0)
        mut = jnp.mean(patch, axis=0)
        v0 = jnp.var(t, axis=0)
        vt = jnp.var(patch, axis=0)
        cov = jnp.mean((t - mu0) * (patch - mut), axis=0)
        ssim = ((2 * mu0 * mut + c1) * (2 * cov + c2)) / (
            (mu0 * mu0 + mut * mut + c1) * (v0 + vt + c2))
        return jnp.mean(ssim)

    def likelihood(self, state, patch):
        return jnp.exp(-self.prm.likelihood_alpha * (1.0 - self.f(state, patch)))


class SPSS(AM):
    """Sum of pixelwise structural similarity: mean_i of
    (2 I0_i It_i + c) / (I0_i^2 + It_i^2 + c) (reference SPSS.cc)."""
    name = "spss"

    def _similarity(self, state: AMState, patch):
        c = self.prm.extra.get("k", 0.01) * (self.prm.pix_max ** 2)
        t = state.template
        return jnp.mean((2.0 * t * patch + c) / (t * t + patch * patch + c))

    def likelihood(self, state, patch):
        return jnp.exp(-self.prm.likelihood_alpha * (1.0 - self.f(state, patch)))
