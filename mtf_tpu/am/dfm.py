"""DFM: deep/learned feature-map appearance model.

Re-designs the reference `AM/src/DFM.cc` (390 LoC) — an AM that compares
Caffe conv feature maps of the template and candidate patches instead of
raw pixels (`netUtils` wrapper). The TPU-native analog runs a small conv
stack on-device inside the similarity (MXU-friendly; gradients flow
through the convs by AD, so every SM works unchanged on feature space).

Default extractor: two 3x3 conv + tanh layers with fixed seeded filters
(random projections of local structure — "deep features without the
download"). Pass a custom `(params, apply_fn)` for learned features, e.g.
a flax CNN's first blocks.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mtf_tpu.am.base import AM, AMState


def _default_filters(in_ch: int, features: tuple[int, ...], seed: int):
    rng = np.random.default_rng(seed)
    params = []
    c = in_ch
    for f in features:
        w = rng.normal(0, 1.0 / np.sqrt(9 * c), (3, 3, c, f))
        params.append(jnp.asarray(w, jnp.float32))
        c = f
    return params


class DFM(AM):
    """Feature-map SSD appearance model ('dfm' key; reference DFM.cc)."""

    name = "dfm"

    def __init__(self, params=None, ilm=None):
        super().__init__(params, ilm)
        feats = tuple(self.prm.extra.get("dfm_features", (8, 16)))
        seed = int(self.prm.extra.get("dfm_seed", 0))
        self._filters = _default_filters(self.prm.n_channels, feats, seed)

    def _features(self, patch):
        """(N, C) patch -> (N, F) feature map (same spatial layout)."""
        ry, rx = self.prm.resy, self.prm.resx
        x = patch.reshape(1, ry, rx, -1)
        for w in self._filters:
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            x = jnp.tanh(x / 255.0) * 255.0
        return x.reshape(ry * rx, -1)

    def _init_extra(self, patch0):
        return (self._features(patch0),)

    def _similarity(self, state: AMState, patch):
        f0 = state.extra[0]
        ft = self._features(patch)
        d = ft - f0
        return -0.5 * jnp.sum(d * d) / f0.shape[-1]

    def likelihood(self, state, patch):
        f = self.f(state, patch)
        return jnp.exp(-self.prm.likelihood_alpha
                       * jnp.sqrt(jnp.maximum(-2.0 * f / self.n_pix, 0.0)))

    def dist_feat(self, patch):
        return self._features(patch).reshape(-1)
