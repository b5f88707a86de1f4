"""Learning/detection trackers (reference ThirdParty class) — TPU-native.

The reference bundles these as opaque third-party C++ (`ThirdParty/RCT`
491 LoC, `ThirdParty/Struck` 3622 LoC; registry keys `mtf.h:1978-2120`).
Like the correlation-filter family (sm/cf.py) they are rebuilt here as
first-class pure-pytree programs: `initialize`/`update`/`corners` with
no host-side state, so they vmap into fleets and shard over meshes like
every other SM.

- RCT (Zhang et al., ECCV'12 "Real-time compressive tracking"): sparse
  random-projection Haar features + online Gaussian naive-Bayes
  classifier over a dense shift grid. TPU form: the search window is
  resampled to a fixed grid, rectangle sums come from STATIC slices of
  one integral image (the rect geometry is drawn at construction, so
  every slice is compile-time — no gathers), and all candidate shifts
  are scored in one (shifts, K) tensor op.

Axis-aligned-bbox learners (like the reference adapters); the bbox is
reported as a 4-corner region.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mtf_tpu.sm.cf import _center_size_of, _corners_of, _grab

Array = jax.Array


@dataclass(frozen=True)
class RCTParams:
    """ThirdParty/RCT `CompressiveTracker` analog (RCT.h:20-46)."""
    res: int = 48            # resampled bbox resolution (feature frame)
    search: int = 12         # detection shift radius (feature-frame px)
    n_feats: int = 50        # compressed dimensionality (featureNum)
    max_rects: int = 4       # rects per feature (featureMinNumRect..Max)
    pos_radius: int = 3      # positive-sample shift radius (rOuterPositive)
    neg_lo: int = 6          # negative annulus (search/2 .. search style)
    lr: float = 0.85         # Gaussian update rate (learnRate)
    seed: int = 0


class RCTState(NamedTuple):
    center: Array    # (2,) xy image coords
    base_sz: Array   # (2,) bbox w,h
    mu_pos: Array    # (K,)
    sg_pos: Array    # (K,)
    mu_neg: Array    # (K,)
    sg_neg: Array    # (K,)


class RCT:
    """Compressive tracking: random sparse measurement matrix + online
    naive Bayes (RCT paper eqs. 4-6)."""

    name = "rct"
    ssm = None  # bbox tracker

    def __init__(self, prm: RCTParams | None = None):
        self.prm = prm or RCTParams()
        p = self.prm
        rng = np.random.default_rng(p.seed)
        # sparse measurement matrix: each compressed feature is a +-1
        # weighted sum of 2..max_rects rectangle sums (RCT §3.1); rect
        # geometry is STATIC (python ints) so rect sums lower to slices
        rects, weights, owners = [], [], []
        for k in range(p.n_feats):
            n_r = int(rng.integers(2, p.max_rects + 1))
            for _ in range(n_r):
                w = int(rng.integers(2, p.res - 2))
                h = int(rng.integers(2, p.res - 2))
                x = int(rng.integers(0, p.res - w))
                y = int(rng.integers(0, p.res - h))
                rects.append((y, x, h, w))
                weights.append(float(rng.choice([-1.0, 1.0]) /
                                     np.sqrt(n_r)))
                owners.append(k)
        self._rects = rects
        proj = np.zeros((len(rects), p.n_feats), np.float32)
        proj[np.arange(len(rects)), np.asarray(owners)] = \
            np.asarray(weights, np.float32)
        self._proj = proj  # static (R, K) sparse measurement matrix

    # -- features ---------------------------------------------------------
    def _shift_feats(self, frame, center, sz) -> Array:
        """(n_shift^2, K) compressed features for every candidate shift.

        One window resample covering bbox + search margin, one integral
        image, then each rectangle sum over all shifts is a static
        (n_shift, n_shift) slice of it."""
        p = self.prm
        r, res = p.search, p.res
        span = res + 2 * r
        # window sized so the resampled grid has bbox res + search margin
        wsz = sz * (span / res)
        win = _grab(frame, center, wsz, span)
        ii = jnp.pad(jnp.cumsum(jnp.cumsum(win, 0), 1),
                     ((1, 0), (1, 0)))                      # (span+1,)*2
        n_sh = 2 * r + 1
        cols = []
        for (y, x, h, w) in self._rects:
            # rect sum at shift (dy, dx): II-difference of 4 corners,
            # each a static slice over the shift grid
            s = (ii[y + h:y + h + n_sh, x + w:x + w + n_sh]
                 - ii[y + h:y + h + n_sh, x:x + n_sh]
                 - ii[y:y + n_sh, x + w:x + w + n_sh]
                 + ii[y:y + n_sh, x:x + n_sh]) / float(h * w)
            cols.append(s.reshape(-1))
        rect_mat = jnp.stack(cols, axis=-1)                 # (S, R)
        # rect columns -> owning features via a static (R, K) signed
        # matmul (no segment ops on the hot path)
        return rect_mat @ jnp.asarray(self._proj)           # (S, K)

    def _shift_grid(self):
        r = self.prm.search
        d = jnp.arange(-r, r + 1, dtype=jnp.float32)
        dy, dx = jnp.meshgrid(d, d, indexing="ij")
        return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (S, 2) xy

    # -- classifier -------------------------------------------------------
    @staticmethod
    def _log_ratio(f, mu1, s1, mu0, s0):
        """sum_k log N(f|mu1,s1) - log N(f|mu0,s0) (RCT eq. 4)."""
        def logn(f, mu, s):
            v = jnp.maximum(s, 1e-2) ** 2
            return -0.5 * (f - mu) ** 2 / v - 0.5 * jnp.log(v)
        return jnp.sum(logn(f, mu1, s1) - logn(f, mu0, s0), axis=-1)

    def _class_masks(self):
        """Static (S,) masks: positive disc + negative annulus."""
        p = self.prm
        g = np.arange(-p.search, p.search + 1)
        dy, dx = np.meshgrid(g, g, indexing="ij")
        rad = np.sqrt(dy ** 2 + dx ** 2).ravel()
        pos = rad <= p.pos_radius
        neg = rad >= p.neg_lo
        return jnp.asarray(pos), jnp.asarray(neg)

    def _learn(self, st: RCTState, feats: Array) -> RCTState:
        """Online Gaussian update (RCT eq. 6) from the shift-grid
        samples around the (already updated) center."""
        lr = self.prm.lr
        pos, neg = self._class_masks()

        def stats(mask):
            w = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mu = jnp.sum(feats * w, axis=0) / n
            var = jnp.sum((feats - mu) ** 2 * w, axis=0) / n
            return mu, jnp.sqrt(var + 1e-6)

        mu_p, sg_p = stats(pos)
        mu_n, sg_n = stats(neg)
        mix = lambda old, new: lr * old + (1.0 - lr) * new  # noqa: E731
        # sigma mix follows RCT.cpp:classifierUpdate (variance-domain)
        vmix = lambda so, sn, mo, mn: jnp.sqrt(  # noqa: E731
            lr * so ** 2 + (1 - lr) * sn ** 2
            + lr * (1 - lr) * (mo - mn) ** 2)
        return st._replace(
            mu_pos=mix(st.mu_pos, mu_p),
            sg_pos=vmix(st.sg_pos, sg_p, st.mu_pos, mu_p),
            mu_neg=mix(st.mu_neg, mu_n),
            sg_neg=vmix(st.sg_neg, sg_n, st.mu_neg, mu_n))

    # -- TrackerBase contract --------------------------------------------
    def initialize(self, frame, corners_img) -> RCTState:
        center, sz = _center_size_of(corners_img)
        K = self.prm.n_feats
        st = RCTState(center=center, base_sz=sz,
                      mu_pos=jnp.zeros((K,)), sg_pos=jnp.ones((K,)),
                      mu_neg=jnp.zeros((K,)), sg_neg=jnp.ones((K,)))
        feats = self._shift_feats(frame, center, sz)
        # first update with lr=0 semantics: seed the Gaussians directly
        pos, neg = self._class_masks()

        def stats(mask):
            w = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mu = jnp.sum(feats * w, axis=0) / n
            var = jnp.sum((feats - mu) ** 2 * w, axis=0) / n
            return mu, jnp.sqrt(var + 1e-6)

        mu_p, sg_p = stats(pos)
        mu_n, sg_n = stats(neg)
        return st._replace(mu_pos=mu_p, sg_pos=sg_p,
                           mu_neg=mu_n, sg_neg=sg_n)

    def update(self, st: RCTState, frame) -> RCTState:
        p = self.prm
        feats = self._shift_feats(frame, st.center, st.base_sz)
        score = self._log_ratio(feats, st.mu_pos, st.sg_pos,
                                st.mu_neg, st.sg_neg)
        best = jnp.argmax(score)
        shift = self._shift_grid()[best]                     # feature px
        step = st.base_sz / p.res
        center = st.center + shift * step
        st = st._replace(center=center)
        # re-extract around the new center for learning (RCT alg. 1)
        feats2 = self._shift_feats(frame, center, st.base_sz)
        return self._learn(st, feats2)

    def corners(self, st: RCTState) -> Array:
        return _corners_of(st.center, st.base_sz).T

    def set_region(self, st: RCTState, corners_img, frame=None) -> RCTState:
        center, sz = _center_size_of(corners_img)
        return st._replace(center=center, base_sz=sz)

    def reinitialize(self, frame, corners_img) -> RCTState:
        return self.initialize(frame, corners_img)


LEARN_REGISTRY = {"rct": RCT}


def get_learn_tracker(key: str, **cfg):
    key = key.lower()
    fields = {f for f in RCTParams.__dataclass_fields__}
    prm = RCTParams(**{k: v for k, v in cfg.items() if k in fields})
    return LEARN_REGISTRY[key](prm)
