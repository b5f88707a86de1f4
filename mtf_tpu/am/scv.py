"""Sum-of-conditional-variance appearance models: SCV, RSCV, LSCV, LRSCV.

Re-designs of the reference `AM/src/SCV.cc` (368), `RSCV.cc` (416),
`LSCV.cc` (429), `LRSCV.cc` (342): SSD after an intensity remap computed
from the joint histogram of template and candidate — forward (template
remapped toward candidate, SCV), reverse (candidate remapped toward
template, RSCV), and localized per-subregion variants.

The remap table is recomputed *inside* f from the current patches (the
reference recomputes it in updateSimilarity each iteration) and is
treated as locally constant via stop_gradient, matching the reference's
use of unmapped/mapped gradient options.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mtf_tpu.am.base import AM, AMState
from mtf_tpu.ops import hist as H


def _remap_table(z_src, z_dst, n_bins, eps=1e-8):
    """E[dst | src-bin] from the joint B-spline histogram -> (B,) table
    in *bin coordinates* (reference SCV.cc remap via joint hist)."""
    w_src = H.bspl_weights(z_src, n_bins)  # (N, B)
    w_dst = H.bspl_weights(z_dst, n_bins)
    joint = jnp.dot(w_src.T, w_dst, preferred_element_type=jnp.float32)
    bins = jnp.arange(n_bins, dtype=z_src.dtype)
    denom = jnp.sum(joint, axis=1)
    table = jnp.sum(joint * bins[None, :], axis=1) / (denom + eps)
    # empty source bins fall back to identity
    return jnp.where(denom > eps, table, bins)


def _apply_table(table, z):
    """Linear interpolation of the remap table at bin coords z."""
    n_bins = table.shape[0]
    zi = jnp.clip(jnp.floor(z), 0, n_bins - 2)
    fz = z - zi
    lo = jnp.take(table, zi.astype(jnp.int32))
    hi = jnp.take(table, zi.astype(jnp.int32) + 1)
    return lo * (1.0 - fz) + hi * fz


class SCV(AM):
    """Template remapped toward candidate, then SSD (reference SCV.cc)."""
    name = "scv"

    def _z(self, patch):
        return H.to_bin_coords(patch, self.prm.n_bins, self.prm.pix_min,
                               self.prm.pix_max, self.prm.pre_seed)

    def _similarity(self, state: AMState, patch):
        z0 = self._z(state.template)  # (N, C)
        zt = self._z(patch)

        def chan(z0c, ztc):
            table = jax.lax.stop_gradient(
                _remap_table(z0c, jax.lax.stop_gradient(ztc), self.prm.n_bins))
            z0m = _apply_table(table, z0c)
            r = ztc - z0m
            return -0.5 * jnp.sum(r * r)

        return jnp.sum(jax.vmap(chan, in_axes=1)(z0, zt))

    def likelihood(self, state, patch):
        f = self.f(state, patch)
        n = state.template.size
        return jnp.exp(-self.prm.likelihood_alpha
                       * jnp.sqrt(jnp.maximum(-2.0 * f / n, 0.0)))


class RSCV(SCV):
    """Reverse SCV: candidate remapped toward template (reference RSCV.cc).

    Gradient flows through the identity part of the remap (the reference's
    `mapped_gradient=false` default treats the map's slope as 1)."""
    name = "rscv"

    def _similarity(self, state: AMState, patch):
        z0 = self._z(state.template)
        zt = self._z(patch)

        def chan(z0c, ztc):
            table = jax.lax.stop_gradient(
                _remap_table(jax.lax.stop_gradient(ztc), z0c, self.prm.n_bins))
            ztm_const = _apply_table(table, jax.lax.stop_gradient(ztc))
            # remap offset constant, identity slope carries the gradient
            ztm = ztc + jax.lax.stop_gradient(ztm_const - ztc)
            r = ztm - z0c
            return -0.5 * jnp.sum(r * r)

        return jnp.sum(jax.vmap(chan, in_axes=1)(z0, zt))


class _Localized(AM):
    """Shared sub-region machinery for LSCV/LRSCV (reference LSCV.cc
    sub-region grid)."""

    def _blocks(self, patch):
        k = self.prm.extra.get("sub_regions", 3)
        ry, rx, c = self.prm.resy, self.prm.resx, patch.shape[-1]
        by, bx = ry // k, rx // k
        img = patch.reshape(ry, rx, c)[: by * k, : bx * k]
        blocks = img.reshape(k, by, k, bx, c).transpose(0, 2, 1, 3, 4)
        return blocks.reshape(k * k, by * bx, c)


class LSCV(_Localized, SCV):
    """Localized SCV: independent remap per sub-region (reference LSCV.cc)."""
    name = "lscv"

    def _similarity(self, state: AMState, patch):
        b0 = self._blocks(state.template)  # (K, n, C)
        bt = self._blocks(patch)

        def per_block(t0, tt):
            return SCV._similarity(self, AMState(t0, state.p_am), tt)

        return jnp.sum(jax.vmap(per_block)(b0, bt))


class LRSCV(_Localized, RSCV):
    """Localized RSCV (reference LRSCV.cc)."""
    name = "lrscv"

    def _similarity(self, state: AMState, patch):
        b0 = self._blocks(state.template)
        bt = self._blocks(patch)

        def per_block(t0, tt):
            return RSCV._similarity(self, AMState(t0, state.p_am), tt)

        return jnp.sum(jax.vmap(per_block)(b0, bt))
