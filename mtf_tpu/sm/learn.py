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
- Struck (Hare et al., ICCV'11): budgeted structured-output SVM; per
  frame hard-negative LaRank SMO rounds + Optimize passes, kernel
  evaluations as masked matmuls over a fixed support buffer.
- FragTrack (Adam et al., CVPR'06): fragments-based integral-histogram
  voting with a robust quantile score.
- DFT (Crivellaro & Lepetit, CVPR'14): descriptor-fields transform
  composed with the multi-channel LK machinery.

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


@dataclass(frozen=True)
class StruckParams:
    """ThirdParty/Struck `Config` analog (Struck/src/Config.cpp — the
    raw-feature + Gaussian-kernel configuration)."""
    res: int = 16            # raw-feature patch resolution (16x16 = 256-d)
    search: int = 8          # shift radius in feature-frame px
    budget: int = 64         # support-vector budget (svmBudgetSize)
    C: float = 100.0         # SVM slack (svmC)
    kernel_sigma: float = 1.0  # Gaussian kernel bandwidth (on unit-norm
                               # features — raw smooth imagery needs a
                               # sharp kernel or F is near-flat)
    n_new: int = 3           # hard-negative ProcessNew rounds per frame
    n_opt: int = 4           # Optimize reprocess passes per frame
    seed: int = 0


class StruckState(NamedTuple):
    center: Array   # (2,) xy
    base_sz: Array  # (2,)
    sv_x: Array     # (B, D) support-vector features
    sv_beta: Array  # (B,) dual coefficients
    sv_pos: Array   # (B,) 1.0 where the SV entered as a positive
    sv_valid: Array  # (B,) slot occupancy
    key: Array


class Struck:
    """Structured-output SVM tracking with budget maintenance (Hare et
    al., ICCV'11). Online LaRank reduced to its TPU-friendly core: per
    frame one ProcessNew SMO step on the (true-location, hardest
    negative) pair plus `n_opt` Optimize passes over the support set;
    eviction overwrites the smallest-|beta| slot. Structured loss is
    1 - IoU of the shifted bboxes (the paper's loss)."""

    name = "strk"
    ssm = None  # bbox tracker

    def __init__(self, prm: StruckParams | None = None):
        self.prm = prm or StruckParams()

    # -- features ---------------------------------------------------------
    def _cand_feats(self, frame, center, sz):
        """(S, D) unit-norm raw features for every candidate shift."""
        p = self.prm
        span = p.res + 2 * p.search
        wsz = sz * (span / p.res)
        win = _grab(frame, center, wsz, span)               # (span, span)
        patches = jax.lax.conv_general_dilated_patches(
            win[None, None, :, :], (p.res, p.res), (1, 1), "VALID")
        # -> (1, res*res, n_sh, n_sh)
        n_sh = 2 * p.search + 1
        f = patches[0].reshape(p.res * p.res, n_sh * n_sh).T  # (S, D)
        f = f - jnp.mean(f, axis=1, keepdims=True)
        return f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-6)

    def _shift_grid(self):
        r = self.prm.search
        d = jnp.arange(-r, r + 1, dtype=jnp.float32)
        dy, dx = jnp.meshgrid(d, d, indexing="ij")
        return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (S, 2) xy

    def _loss(self):
        """(S,) structured loss 1 - IoU(shifted bbox, true bbox) in the
        feature frame (res x res boxes)."""
        p = self.prm
        sh = self._shift_grid()
        ov = jnp.maximum(p.res - jnp.abs(sh), 0.0)          # (S, 2)
        inter = ov[:, 0] * ov[:, 1]
        union = 2.0 * p.res * p.res - inter
        return 1.0 - inter / union

    def _kernel(self, a, b):
        """Gaussian kernel matrix exp(-sigma * ||a - b||^2)."""
        d2 = (jnp.sum(a * a, -1)[:, None] + jnp.sum(b * b, -1)[None, :]
              - 2.0 * a @ b.T)
        return jnp.exp(-self.prm.kernel_sigma * jnp.maximum(d2, 0.0))

    def _F(self, st: StruckState, x):
        """Discriminant F(x) = sum_i beta_i k(x_i, x) for (S, D) x."""
        k = self._kernel(st.sv_x, x)                        # (B, S)
        return (st.sv_beta * st.sv_valid) @ k               # (S,)

    # -- SMO --------------------------------------------------------------
    def _smo_pair(self, st: StruckState, xp, xn, gp, gn, cap_p):
        """One SMO step on a (pos, neg) feature pair with gradients
        g = -loss - F (LaRank; Struck.cpp:SMOStep). Returns lambda."""
        kpp = 1.0
        knn = 1.0
        kpn = self._kernel(xp[None], xn[None])[0, 0]
        denom = jnp.maximum(kpp + knn - 2.0 * kpn, 1e-8)
        lam = jnp.clip((gp - gn) / denom, 0.0, cap_p)
        return lam

    def _add_sv(self, st: StruckState, x, dbeta, is_pos):
        """Write an SV into the smallest-|beta| (or free) slot.
        Returns (state, slot) so callers can accumulate further beta
        onto the same slot (LaRank semantics)."""
        score = jnp.where(st.sv_valid > 0.5,
                          jnp.abs(st.sv_beta), -1.0)
        slot = jnp.argmin(score)
        return st._replace(
            sv_x=st.sv_x.at[slot].set(x),
            sv_beta=st.sv_beta.at[slot].set(dbeta),
            sv_pos=st.sv_pos.at[slot].set(is_pos),
            sv_valid=st.sv_valid.at[slot].set(1.0)), slot

    # -- TrackerBase contract --------------------------------------------
    def initialize(self, frame, corners_img) -> StruckState:
        p = self.prm
        center, sz = _center_size_of(corners_img)
        D = p.res * p.res
        st = StruckState(center=center, base_sz=sz,
                         sv_x=jnp.zeros((p.budget, D)),
                         sv_beta=jnp.zeros((p.budget,)),
                         sv_pos=jnp.zeros((p.budget,)),
                         sv_valid=jnp.zeros((p.budget,)),
                         key=jax.random.PRNGKey(p.seed))
        return self._learn(st, frame)

    def _learn(self, st: StruckState, frame) -> StruckState:
        """ProcessNew at the current center + Optimize passes."""
        p = self.prm
        feats = self._cand_feats(frame, st.center, st.base_sz)
        loss = self._loss()
        ipos = jnp.argmin(loss)                              # center shift
        xp = feats[ipos]
        # hard-negative mining: each round re-scores the candidates with
        # the grown support set and SMO-steps against the current
        # hardest negative (single-pair LaRank leaves F near-flat on
        # smooth imagery)
        pos_slot = None
        for _ in range(p.n_new):
            F = self._F(st, feats)
            g = -loss - F                                    # (S,)
            ineg = jnp.argmin(g)
            xn = feats[ineg]
            lam = self._smo_pair(st, xp, xn, g[ipos], g[ineg], p.C)
            if pos_slot is None:
                # first round inserts the positive pattern; later rounds
                # accumulate beta onto the SAME slot (LaRank keeps one SV
                # per pattern) instead of burning budget on duplicates
                st, pos_slot = self._add_sv(st, xp, lam, 1.0)
            else:
                st = st._replace(sv_beta=st.sv_beta.at[pos_slot].add(lam))
            st, _ = self._add_sv(st, xn, -lam, 0.0)

        # Optimize: re-balance an existing pos/neg SV pair (LaRank
        # Optimize; keeps the dual feasible as the model drifts)
        def opt(st, _):
            kmat = self._kernel(st.sv_x, st.sv_x)
            Fsv = (st.sv_beta * st.sv_valid) @ kmat          # (B,)
            gsv = -(1.0 - st.sv_pos) - Fsv                   # loss 0/1 proxy
            vp = st.sv_valid * st.sv_pos
            vn = st.sv_valid * (1.0 - st.sv_pos)
            ip = jnp.argmax(jnp.where(vp > 0.5, gsv, -1e30))
            im = jnp.argmin(jnp.where(vn > 0.5, gsv, 1e30))
            kpn = kmat[ip, im]
            denom = jnp.maximum(kmat[ip, ip] + kmat[im, im] - 2 * kpn,
                                1e-8)
            lam = jnp.clip((gsv[ip] - gsv[im]) / denom,
                           -jnp.abs(st.sv_beta[im]), p.C)
            beta = st.sv_beta.at[ip].add(lam).at[im].add(-lam)
            return st._replace(sv_beta=beta), None

        st, _ = jax.lax.scan(opt, st, None, length=p.n_opt)
        return st

    def update(self, st: StruckState, frame) -> StruckState:
        p = self.prm
        feats = self._cand_feats(frame, st.center, st.base_sz)
        scores = self._F(st, feats)
        best = jnp.argmax(scores)
        step = st.base_sz / p.res
        center = st.center + self._shift_grid()[best] * step
        st = st._replace(center=center)
        return self._learn(st, frame)

    def corners(self, st: StruckState) -> Array:
        return _corners_of(st.center, st.base_sz).T

    def set_region(self, st: StruckState, corners_img,
                   frame=None) -> StruckState:
        center, sz = _center_size_of(corners_img)
        return st._replace(center=center, base_sz=sz)

    def reinitialize(self, frame, corners_img) -> StruckState:
        return self.initialize(frame, corners_img)


@dataclass(frozen=True)
class FragParams:
    """ThirdParty/FRG `Fragments_Tracker` analog (Adam et al., CVPR'06)."""
    res: int = 40            # template resolution (feature frame)
    search: int = 10         # shift radius (feature-frame px)
    n_bins: int = 16         # grayscale histogram bins
    frag_grid: int = 4       # frag_grid^2 template fragments
    quantile: float = 0.25   # robust vote: this quantile of fragment
                             # distances scores a candidate


class FragState(NamedTuple):
    center: Array       # (2,) xy
    base_sz: Array      # (2,)
    templ_hists: Array  # (F, n_bins) per-fragment template histograms


class FragTrack:
    """Fragments-based tracking with integral histograms (the reference's
    `ThirdParty/FRG`, 2504 LoC). Every candidate shift scores every
    template fragment by the L1 distance between area-normalized
    grayscale histograms; the robust 25%-quantile of fragment distances
    (occlusion tolerance — a minority of occluded fragments cannot veto
    the vote) picks the new position. TPU form: per-bin indicator planes
    -> ONE 2-D cumsum integral histogram -> every (fragment, shift)
    histogram is a static 4-corner slice combination; the whole vote is
    a (F, S, bins) tensor expression with no gathers."""

    name = "frg"
    ssm = None  # bbox tracker

    def __init__(self, prm: FragParams | None = None):
        self.prm = prm or FragParams()
        p = self.prm
        f = p.res // p.frag_grid
        self._rects = [(iy * f, ix * f, f, f)
                       for iy in range(p.frag_grid)
                       for ix in range(p.frag_grid)]

    def _bin_planes(self, win):
        """(H+1, W+1, n_bins) integral histogram of a grayscale patch."""
        p = self.prm
        edges = jnp.linspace(0.0, 255.0, p.n_bins + 1)[1:-1]
        idx = jnp.searchsorted(edges, win)                  # (H, W)
        planes = (idx[..., None] ==
                  jnp.arange(p.n_bins)[None, None, :]).astype(jnp.float32)
        ii = jnp.cumsum(jnp.cumsum(planes, 0), 1)
        return jnp.pad(ii, ((1, 0), (1, 0), (0, 0)))

    def _frag_hists(self, ii, n_sh):
        """(F, n_sh*n_sh, n_bins) area-normalized fragment histograms at
        every candidate shift (static slices of the integral hist)."""
        hists = []
        for (y, x, h, w) in self._rects:
            s = (ii[y + h:y + h + n_sh, x + w:x + w + n_sh]
                 - ii[y + h:y + h + n_sh, x:x + n_sh]
                 - ii[y:y + n_sh, x + w:x + w + n_sh]
                 + ii[y:y + n_sh, x:x + n_sh]) / float(h * w)
            hists.append(s.reshape(-1, self.prm.n_bins))
        return jnp.stack(hists)

    def _shift_grid(self):
        r = self.prm.search
        d = jnp.arange(-r, r + 1, dtype=jnp.float32)
        dy, dx = jnp.meshgrid(d, d, indexing="ij")
        return jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (S, 2) xy

    def initialize(self, frame, corners_img) -> FragState:
        p = self.prm
        center, sz = _center_size_of(corners_img)
        win = _grab(frame, center, sz, p.res)
        ii = self._bin_planes(win)
        hists = self._frag_hists(ii, 1)[:, 0, :]             # (F, bins)
        return FragState(center=center, base_sz=sz, templ_hists=hists)

    def update(self, st: FragState, frame) -> FragState:
        p = self.prm
        span = p.res + 2 * p.search
        wsz = st.base_sz * (span / p.res)
        win = _grab(frame, st.center, wsz, span)
        ii = self._bin_planes(win)
        n_sh = 2 * p.search + 1
        hists = self._frag_hists(ii, n_sh)                   # (F, S, bins)
        d = jnp.sum(jnp.abs(hists - st.templ_hists[:, None, :]), axis=-1)
        score = jnp.quantile(d, p.quantile, axis=0)          # (S,)
        best = jnp.argmin(score)
        step = st.base_sz / p.res
        return st._replace(
            center=st.center + self._shift_grid()[best] * step)

    def corners(self, st: FragState) -> Array:
        return _corners_of(st.center, st.base_sz).T

    def set_region(self, st: FragState, corners_img, frame=None):
        center, sz = _center_size_of(corners_img)
        return st._replace(center=center, base_sz=sz)

    def reinitialize(self, frame, corners_img) -> FragState:
        return self.initialize(frame, corners_img)


class DFT:
    """Descriptor-Fields tracking (Crivellaro & Lepetit, CVPR'14 — the
    reference's `ThirdParty/DFT`, 2941 LoC): any registration SM run on
    the 4-channel smoothed positive/negative-gradient transform of the
    frame (utils.preproc.descriptor_fields). Robust to illumination and
    specular changes; here it composes the existing multi-channel LK
    machinery instead of reimplementing its own GN loop."""

    name = "dft"

    def __init__(self, inner, sigma: float = 1.5):
        self.inner = inner
        self.ssm = inner.ssm
        self.am = inner.am
        self.prm = inner.prm
        self.sigma = float(sigma)

    def _tf(self, frame):
        from mtf_tpu.utils.preproc import descriptor_fields
        return descriptor_fields(frame, self.sigma)

    def initialize(self, frame, corners_img):
        return self.inner.initialize(self._tf(frame), corners_img)

    def update(self, state, frame):
        return self.inner.update(state, self._tf(frame))

    def corners(self, state):
        return self.inner.corners(state)

    def set_region(self, state, corners_img, frame=None):
        return self.inner.set_region(state, corners_img)

    def reinitialize(self, frame, corners_img):
        return self.initialize(frame, corners_img)


@dataclass(frozen=True)
class MILParams(RCTParams):
    """ThirdParty/MIL `cf/Tracker.cpp` + `OnlineBoost.cpp` analog
    (Babenko et al. CVPR'09 MILTrack defaults: 250-feature Haar pool,
    50 selected weak classifiers, lRate 0.85)."""
    n_feats: int = 150       # Haar feature pool (numFeat)
    n_sel: int = 40          # weak classifiers selected per frame (numSel)


class MILState(NamedTuple):
    center: Array
    base_sz: Array
    mu_pos: Array   # (M,)
    sg_pos: Array
    mu_neg: Array
    sg_neg: Array
    sel: Array      # (K,) selected pool indices (previous frame's boost)


class MIL(RCT):
    """Online multiple-instance-learning boosting tracker (reference
    ThirdParty/MIL, `cf/OnlineMILBoost`): a Haar pool with per-feature
    online Gaussians (shared with the RCT machinery — static-slice
    integral-image rect sums), re-boosted every frame by greedy noisy-OR
    bag-likelihood selection. The reference's per-weak-classifier loops
    (`OnlineBoost.cpp:300-400`) become K rounds of (M,)-vector
    likelihood updates; detection scores every shift with the selected
    ensemble in one (S, M) x (M,) contraction."""

    name = "mil"

    def __init__(self, prm: MILParams | None = None):
        super().__init__(prm or MILParams())

    # weak log-odds of every pool feature at every sample: (S, M)
    def _weak_h(self, st, feats):
        def logn(f, mu, s):
            v = jnp.maximum(s, 1e-2) ** 2
            return -0.5 * (f - mu) ** 2 / v - 0.5 * jnp.log(v)
        return (logn(feats, st.mu_pos, st.sg_pos)
                - logn(feats, st.mu_neg, st.sg_neg))

    def _boost_select(self, h, pos_mask, neg_mask):
        """Greedy MILBoost (noisy-OR bag likelihood, Babenko eq. 7):
        round k adds the pool feature maximizing
        log(1 - prod_pos(1 - sigmoid(H + h_m))) + sum_neg log(1 -
        sigmoid(H + h_m)). Returns (K,) selected indices."""
        p: MILParams = self.prm
        S, M = h.shape
        posf = pos_mask.astype(jnp.float32)
        negf = neg_mask.astype(jnp.float32)
        H = jnp.zeros((S,), jnp.float32)
        taken = jnp.zeros((M,), bool)
        sel = []
        for _ in range(p.n_sel):
            cand = jax.nn.sigmoid(H[:, None] + h)          # (S, M)
            # noisy-OR positive bag: 1 - prod(1 - p_i) over the pos bag
            log1m = jnp.log1p(-jnp.clip(cand, 1e-6, 1 - 1e-6))
            bag_log = jnp.log1p(-jnp.exp(
                jnp.sum(log1m * posf[:, None], axis=0)) + 1e-12)
            neg_log = jnp.sum(log1m * negf[:, None], axis=0)
            lik = bag_log + neg_log
            lik = jnp.where(taken, -jnp.inf, lik)
            m = jnp.argmax(lik)
            sel.append(m)
            taken = taken.at[m].set(True)
            H = H + h[:, m]
        return jnp.stack(sel)

    def _seed_stats(self, feats):
        pos, neg = self._class_masks()

        def stats(mask):
            w = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mu = jnp.sum(feats * w, axis=0) / n
            var = jnp.sum((feats - mu) ** 2 * w, axis=0) / n
            return mu, jnp.sqrt(var + 1e-6)

        return stats(pos), stats(neg)

    def initialize(self, frame, corners_img) -> MILState:
        center, sz = _center_size_of(corners_img)
        feats = self._shift_feats(frame, center, sz)
        (mu_p, sg_p), (mu_n, sg_n) = self._seed_stats(feats)
        st = MILState(center=center, base_sz=sz, mu_pos=mu_p, sg_pos=sg_p,
                      mu_neg=mu_n, sg_neg=sg_n,
                      sel=jnp.zeros((self.prm.n_sel,), jnp.int32))
        pos, neg = self._class_masks()
        sel = self._boost_select(self._weak_h(st, feats), pos, neg)
        return st._replace(sel=sel)

    def update(self, st: MILState, frame) -> MILState:
        p: MILParams = self.prm
        feats = self._shift_feats(frame, st.center, st.base_sz)
        h = self._weak_h(st, feats)                        # (S, M)
        score = jnp.sum(h[:, st.sel], axis=1)
        best = jnp.argmax(score)
        center = st.center + self._shift_grid()[best] * (st.base_sz / p.res)
        st = st._replace(center=center)
        # learning at the new center: Gaussian pool update + re-boost
        feats2 = self._shift_feats(frame, center, st.base_sz)
        st = self._learn_gauss(st, feats2)
        pos, neg = self._class_masks()
        sel = self._boost_select(self._weak_h(st, feats2), pos, neg)
        return st._replace(sel=sel)

    def _learn_gauss(self, st, feats):
        lr = self.prm.lr
        (mu_p, sg_p), (mu_n, sg_n) = self._seed_stats(feats)
        mix = lambda old, new: lr * old + (1.0 - lr) * new  # noqa: E731
        vmix = lambda so, sn, mo, mn: jnp.sqrt(  # noqa: E731
            lr * so ** 2 + (1 - lr) * sn ** 2
            + lr * (1 - lr) * (mo - mn) ** 2)
        return st._replace(
            mu_pos=mix(st.mu_pos, mu_p),
            sg_pos=vmix(st.sg_pos, sg_p, st.mu_pos, mu_p),
            mu_neg=mix(st.mu_neg, mu_n),
            sg_neg=vmix(st.sg_neg, sg_n, st.mu_neg, mu_n))

    def corners(self, st: MILState) -> Array:
        return _corners_of(st.center, st.base_sz).T

    def set_region(self, st: MILState, corners_img, frame=None) -> MILState:
        center, sz = _center_size_of(corners_img)
        return st._replace(center=center, base_sz=sz)

    def reinitialize(self, frame, corners_img) -> MILState:
        return self.initialize(frame, corners_img)


@dataclass(frozen=True)
class BoostParams(RCTParams):
    """ThirdParty/Boosting `StrongClassifierDirectSelection` analog
    (Grabner et al. BMVC'06 online AdaBoost: 50 selectors over a
    ~250-weak-classifier pool)."""
    n_feats: int = 150
    n_sel: int = 40


class BoostState(NamedTuple):
    center: Array
    base_sz: Array
    mu_pos: Array
    sg_pos: Array
    mu_neg: Array
    sg_neg: Array
    sel: Array      # (K,) selector choices
    alpha: Array    # (K,) selector vote weights


class Boosting(MIL):
    """Online AdaBoost tracker (reference ThirdParty/Boosting): the same
    Haar pool / online Gaussian machinery, boosted with importance-
    weighted AdaBoost selection instead of MIL bags — each selector
    round picks the pool stump with minimal weighted error, votes with
    alpha = .5 log((1-e)/e), and re-weights the samples
    (`StrongClassifierDirectSelection::update`)."""

    name = "boost"

    def __init__(self, prm: BoostParams | None = None):
        RCT.__init__(self, prm or BoostParams())

    def _ada_select(self, h, pos_mask, neg_mask):
        """(K,) indices + (K,) alphas via importance-weighted AdaBoost
        over the stump predictions sign(h)."""
        p: BoostParams = self.prm
        S, M = h.shape
        y = jnp.where(pos_mask, 1.0, -1.0)                 # (S,)
        in_set = (pos_mask | neg_mask).astype(jnp.float32)
        lam = in_set / jnp.maximum(jnp.sum(in_set), 1.0)
        pred = jnp.sign(h)                                  # (S, M)
        wrong = (pred * y[:, None] < 0).astype(jnp.float32)
        taken = jnp.zeros((M,), bool)
        sel, alpha = [], []
        for _ in range(p.n_sel):
            err = jnp.sum(lam[:, None] * wrong, axis=0) \
                / jnp.maximum(jnp.sum(lam), 1e-8)
            err = jnp.where(taken, jnp.inf, jnp.clip(err, 1e-4, 1 - 1e-4))
            m = jnp.argmin(err)
            a = 0.5 * jnp.log((1.0 - err[m]) / err[m])
            sel.append(m)
            alpha.append(a)
            taken = taken.at[m].set(True)
            lam = lam * jnp.exp(-a * y * pred[:, m]) * in_set
            lam = lam / jnp.maximum(jnp.sum(lam), 1e-8)
        return jnp.stack(sel), jnp.stack(alpha)

    def initialize(self, frame, corners_img) -> BoostState:
        center, sz = _center_size_of(corners_img)
        feats = self._shift_feats(frame, center, sz)
        (mu_p, sg_p), (mu_n, sg_n) = self._seed_stats(feats)
        st = BoostState(center=center, base_sz=sz, mu_pos=mu_p,
                        sg_pos=sg_p, mu_neg=mu_n, sg_neg=sg_n,
                        sel=jnp.zeros((self.prm.n_sel,), jnp.int32),
                        alpha=jnp.ones((self.prm.n_sel,)))
        pos, neg = self._class_masks()
        sel, alpha = self._ada_select(self._weak_h(st, feats), pos, neg)
        return st._replace(sel=sel, alpha=alpha)

    def update(self, st: BoostState, frame) -> BoostState:
        p: BoostParams = self.prm
        feats = self._shift_feats(frame, st.center, st.base_sz)
        h = self._weak_h(st, feats)
        # soft stump votes weighted by alpha (smoother argmax surface
        # than the reference's hard sign votes; same ordering near the
        # optimum)
        score = jnp.sum(jnp.tanh(h[:, st.sel]) * st.alpha[None, :], axis=1)
        best = jnp.argmax(score)
        center = st.center + self._shift_grid()[best] * (st.base_sz / p.res)
        st = st._replace(center=center)
        feats2 = self._shift_feats(frame, center, st.base_sz)
        st = self._learn_gauss(st, feats2)
        pos, neg = self._class_masks()
        sel, alpha = self._ada_select(self._weak_h(st, feats2), pos, neg)
        return st._replace(sel=sel, alpha=alpha)


LEARN_REGISTRY = {"rct": RCT, "strk": Struck, "struck": Struck,
                  "frg": FragTrack, "frag": FragTrack,
                  "mil": MIL, "boost": Boosting, "bsr": Boosting}


def get_learn_tracker(key: str, **cfg):
    key = key.lower()
    cls = LEARN_REGISTRY[key]
    prm_cls = {RCT: RCTParams, Struck: StruckParams,
               FragTrack: FragParams, MIL: MILParams,
               Boosting: BoostParams}[cls]
    fields = {f for f in prm_cls.__dataclass_fields__}
    prm = prm_cls(**{k: v for k, v in cfg.items() if k in fields})
    return cls(prm)
