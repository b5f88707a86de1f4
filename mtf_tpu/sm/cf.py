"""Correlation-filter trackers (MOSSE / KCF / DSST) — TPU-native.

The reference bundles these as third-party C++ code (`ThirdParty/DSST`
2330 LoC, `ThirdParty/KCF` 1107 LoC; registry keys `mtf.h:1978-2120`) and
treats them as opaque learning/detection trackers behind `TrackerBase`.
Here they are first-class citizens instead: every filter lives in the
Fourier domain, so the whole tracker is a handful of FFTs + elementwise
complex algebra — a perfect fit for XLA (single fused program, no
gathers beyond one patch resample). `initialize`/`update`/`corners`
follow the same pure-pytree contract as every other SM, so CF trackers
can be vmapped into fleets and shard_mapped across chips exactly like
the registration trackers.

Variants:
- MOSSE  (Bolme et al., CVPR'10): single-channel adaptive filter
  H = num/den, num += lr * G . conj(F), den += lr * F . conj(F)
  (training G.conj(F) + detecting ifft(num.Z/den) is the one consistent
  convention — the reverse silently inverts the DSST scale filter).
- KCF    (Henriques et al., TPAMI'15): kernelized ridge regression with
  a Gaussian kernel computed by circular cross-correlation in the
  Fourier domain; model = (alpha_f, x).
- DSST   (Danelljan et al., BMVC'14): MOSSE-style translation filter +
  a separate 1-D correlation filter over a geometric scale pyramid.

Features are multi-channel (res, res, C): `features="gray"` is the
classic normalized-log grayscale plane; `features="hog"` stacks fHOG-
style gradient-histogram channels (ops/hog.py — the TPU rebuild of the
reference's `ThirdParty/DSST/src/fhog.cpp`) plus the gray plane, which
is what the reference DSST/KCF actually run. The multi-channel filter
algebra follows DSST eq. 4-5: per-channel numerators against one summed
denominator.

Every tracker also measures its peak-to-sidelobe ratio (PSR, Bolme §5)
each frame: it is stored in the state (`st.psr`) as the native failure-
detection signal, and when `psr_thresh > 0` frames below threshold skip
the filter update (don't learn occlusions).

All trackers are axis-aligned-bbox learners (like the reference's
adapters, `ThirdParty/.../mtf.h` registry) and report the bbox as a
4-corner region.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.ops.hog import cell_pool, hog

Array = jax.Array


# ---------------------------------------------------------------------------
# shared config + helpers
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CFParams:
    res: int = 64                  # translation-filter sample resolution
    padding: float = 2.0           # search window = padding * target size
    lr: float = 0.025              # filter learning rate (interp_factor)
    lam: float = 1e-4              # ridge regularizer
    output_sigma_factor: float = 1.0 / 16.0   # label sigma vs window size
    kernel_sigma: float = 0.2      # KCF Gaussian-kernel bandwidth
    n_scales: int = 17             # DSST scale-pyramid size (odd)
    scale_step: float = 1.02       # DSST geometric scale factor
    scale_res: int = 16            # DSST per-scale feature resolution
    scale_lr: float = 0.025
    scale_sigma: float = 1.0       # DSST scale-label sigma (in scale steps)
    scale_max_ratio: float = 4.0   # clamp on total scale drift
    features: str = "gray"         # "gray" | "hog" (fHOG + gray channels)
    cell: int = 2                  # hog: sampled px per filter cell
    n_orient: int = 9              # hog orientation bins (channels = 3n+5)
    psr_thresh: float = 0.0        # skip filter update when PSR below
    psr_guard: int = 5             # PSR sidelobe exclusion radius (px)


def _window_pts(center: Array, sz: Array, res: int) -> Array:
    """(res*res, 2) xy sampling grid for an axis-aligned window."""
    t = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res - 0.5
    gx = center[0] + t * sz[0]
    gy = center[1] + t * sz[1]
    xx, yy = jnp.meshgrid(gx, gy)
    return jnp.stack([xx.ravel(), yy.ravel()], axis=-1)


def _grab(frame: Array, center: Array, sz: Array, res: int) -> Array:
    """Sample the window as a (res, res) grayscale patch."""
    pts = _window_pts(center, sz, res)
    p = interp.sample(frame, pts, "linear", "replicate")
    return jnp.mean(p, axis=-1).reshape(res, res)


def _hann2(res: int) -> Array:
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * (jnp.arange(res) + 0.5) / res)
    return jnp.outer(w, w).astype(jnp.float32)


def _gray_plane(patch: Array) -> Array:
    """MOSSE preprocessing: log-scale, zero-mean unit-norm
    (Bolme et al. §3.1). Window applied by the caller."""
    p = jnp.log1p(jnp.maximum(patch, 0.0))
    p = p - jnp.mean(p)
    return p / (jnp.linalg.norm(p) + 1e-6)


def _gauss_label(res: int, sigma: float) -> Array:
    """Wrapped 2-D Gaussian peaked at index (0, 0) (fftshift-free)."""
    r = jnp.arange(res, dtype=jnp.float32)
    d = jnp.mod(r + res / 2.0, res) - res / 2.0
    g = jnp.exp(-0.5 * (d ** 2) / (sigma ** 2))
    return jnp.outer(g, g)


def _wrap_disp(idx: Array, res: int) -> Array:
    return jnp.mod(idx.astype(jnp.float32) + res / 2.0, res) - res / 2.0


def _peak_subpix(resp: Array) -> Array:
    """(dy, dx) displacement of the response peak, with per-axis circular
    quadratic sub-pixel refinement."""
    res = resp.shape[-1]
    flat = jnp.argmax(resp)
    iy, ix = flat // res, flat % res
    c = resp[iy, ix]

    def _off(minus, plus):
        denom = 2.0 * c - minus - plus
        return jnp.where(jnp.abs(denom) > 1e-8,
                         0.5 * (plus - minus) / (denom + 1e-12), 0.0)

    oy = _off(resp[(iy - 1) % res, ix], resp[(iy + 1) % res, ix])
    ox = _off(resp[iy, (ix - 1) % res], resp[iy, (ix + 1) % res])
    dy = _wrap_disp(iy, res) + jnp.clip(oy, -0.5, 0.5)
    dx = _wrap_disp(ix, res) + jnp.clip(ox, -0.5, 0.5)
    return jnp.stack([dy, dx])


def _psr(resp: Array, guard: int) -> Array:
    """Peak-to-sidelobe ratio (Bolme §5): (peak - mu_side)/sigma_side,
    sidelobe = everything outside a (2*guard+1)^2 wrapped window around
    the peak."""
    res = resp.shape[-1]
    flat = jnp.argmax(resp)
    iy, ix = flat // res, flat % res
    r = jnp.arange(res)
    dy = jnp.abs(jnp.mod(r - iy + res // 2, res) - res // 2)
    dx = jnp.abs(jnp.mod(r - ix + res // 2, res) - res // 2)
    side = (dy[:, None] > guard) | (dx[None, :] > guard)
    n = jnp.maximum(jnp.sum(side), 1)
    mu = jnp.sum(resp * side) / n
    var = jnp.sum(jnp.square(resp - mu) * side) / n
    return (resp.reshape(-1)[flat] - mu) / jnp.sqrt(var + 1e-12)


def _corners_of(center: Array, sz: Array) -> Array:
    """(4, 2) axis-aligned corners ul,ur,lr,ll."""
    h = sz / 2.0
    return jnp.stack([center + h * jnp.array([-1.0, -1.0]),
                      center + h * jnp.array([1.0, -1.0]),
                      center + h * jnp.array([1.0, 1.0]),
                      center + h * jnp.array([-1.0, 1.0])])


def _center_size_of(corners_img) -> tuple:
    c = jnp.asarray(corners_img, jnp.float32)
    lo, hi = jnp.min(c, axis=0), jnp.max(c, axis=0)
    return (lo + hi) / 2.0, hi - lo


# ---------------------------------------------------------------------------
# MOSSE
# ---------------------------------------------------------------------------

class MOSSEState(NamedTuple):
    center: Array     # (2,) xy
    base_sz: Array    # (2,) target w,h at init
    scale: Array      # () current scale (fixed 1.0 for MOSSE/KCF)
    num: Array        # (res, res, C) complex filter numerator
    den: Array        # (res, res) real summed denominator
    psr: Array        # () last peak-to-sidelobe ratio
    extra: tuple = ()


class MOSSE:
    """Minimum output sum of squared error filter (multi-channel)."""

    name = "mosse"
    ssm = None  # bbox tracker: no SSM (like the reference's adapters)

    def __init__(self, prm: CFParams | None = None):
        self.prm = prm or CFParams()
        self._win = _hann2(self.prm.res)
        sigma = self.prm.output_sigma_factor * self.prm.res
        self._G = jnp.fft.fft2(_gauss_label(self.prm.res, sigma))
        self.n_channels = (1 if self.prm.features == "gray"
                           else 3 * self.prm.n_orient + 5)

    # -- features ---------------------------------------------------------
    def _feat(self, frame, center, sz) -> Array:
        """Windowed feature stack (res, res, C) for the tracking window."""
        p = self.prm
        if p.features == "hog":
            raw = _grab(frame, center, sz, p.res * p.cell)
            f = hog(raw, p.n_orient, p.cell)          # (res, res, 3n+4)
            gray = _gray_plane(cell_pool(raw, p.cell))
            f = jnp.concatenate([f, gray[..., None]], axis=-1)
        else:
            f = _gray_plane(_grab(frame, center, sz, p.res))[..., None]
        return f * self._win[:, :, None]

    # -- filter algebra ---------------------------------------------------
    def _train_terms(self, feat: Array):
        """MOSSE/DSST closed form: per-channel num = G . conj(F_c), one
        summed den = sum_c F_c . conj(F_c); response
        = ifft2(sum_c num_c . Z_c / (den + lam))."""
        F = jnp.fft.fft2(feat, axes=(0, 1))           # (res, res, C)
        num = self._G[:, :, None] * jnp.conj(F)
        den = jnp.sum(jnp.real(F * jnp.conj(F)), axis=-1)
        return num, den

    def _window_sz(self, st) -> Array:
        return st.base_sz * st.scale * self.prm.padding

    def initialize(self, frame, corners_img) -> MOSSEState:
        center, sz = _center_size_of(corners_img)
        st = MOSSEState(center=center, base_sz=sz,
                        scale=jnp.float32(1.0),
                        num=jnp.zeros((self.prm.res,) * 2 + (self.n_channels,),
                                      jnp.complex64),
                        den=jnp.zeros((self.prm.res,) * 2, jnp.float32),
                        psr=jnp.float32(jnp.inf))
        feat = self._feat(frame, center, self._window_sz(st))
        num, den = self._train_terms(feat)
        return st._replace(num=num, den=den)

    def _locate(self, st, frame):
        """(new center, psr) from the response peak of the current
        filter."""
        wsz = self._window_sz(st)
        feat = self._feat(frame, st.center, wsz)
        Z = jnp.fft.fft2(feat, axes=(0, 1))
        resp = jnp.real(jnp.fft.ifft2(
            jnp.sum(st.num * Z, axis=-1) / (st.den + self.prm.lam)))
        d = _peak_subpix(resp)  # (dy, dx) in filter pixels
        step = wsz / self.prm.res
        center = st.center + jnp.stack([d[1] * step[0], d[0] * step[1]])
        return center, _psr(resp, self.prm.psr_guard)

    def _lr(self, psr: Array) -> Array:
        """Learning rate, zeroed on low-confidence frames (PSR gate)."""
        p = self.prm
        if p.psr_thresh <= 0.0:
            return jnp.float32(p.lr)
        return jnp.where(psr >= p.psr_thresh, p.lr, 0.0)

    def update(self, st: MOSSEState, frame) -> MOSSEState:
        center, psr = self._locate(st, frame)
        st = st._replace(center=center, psr=psr)
        feat = self._feat(frame, center, self._window_sz(st))
        num, den = self._train_terms(feat)
        lr = self._lr(psr)
        return st._replace(num=(1 - lr) * st.num + lr * num,
                           den=(1 - lr) * st.den + lr * den)

    def corners(self, st) -> Array:
        return _corners_of(st.center, st.base_sz * st.scale).T

    def set_region(self, st, corners_img, frame=None):
        center, sz = _center_size_of(corners_img)
        scale = jnp.sqrt(jnp.prod(sz) / (jnp.prod(st.base_sz) + 1e-12))
        return st._replace(center=center, scale=scale)

    def reinitialize(self, frame, corners_img):
        return self.initialize(frame, corners_img)


# ---------------------------------------------------------------------------
# KCF
# ---------------------------------------------------------------------------

class KCFState(NamedTuple):
    center: Array
    base_sz: Array
    scale: Array
    alpha_f: Array    # (res, res) complex dual coefficients
    model_x: Array    # (res, res, C) model template features
    psr: Array


def _gauss_corr(xf: Array, yf: Array, sigma: float) -> Array:
    """Gaussian kernel at every circular shift, via the Fourier trick
    (KCF eq. 31, multi-channel eq. 16): channels sum inside the
    cross-correlation. Parseval: ||x||^2 = sum_c sum_f |xf_c|^2 / n_sp
    (spatial size only — ifft2's 1/n_sp already matches it); the final
    distance is normalized by the full element count like the KCF code's
    numel(x)."""
    n_sp = xf.shape[0] * xf.shape[1]
    numel = n_sp * xf.shape[2]
    cross = jnp.real(jnp.fft.ifft2(
        jnp.sum(xf * jnp.conj(yf), axis=-1)))
    xx = jnp.sum(jnp.abs(xf) ** 2) / n_sp
    yy = jnp.sum(jnp.abs(yf) ** 2) / n_sp
    d = jnp.maximum(xx + yy - 2.0 * cross, 0.0) / numel
    return jnp.exp(-d / (sigma ** 2))


class KCF(MOSSE):
    """Kernelized correlation filter (Gaussian kernel)."""

    name = "kcf"

    def _train(self, feat: Array) -> Array:
        xf = jnp.fft.fft2(feat, axes=(0, 1))
        kf = jnp.fft.fft2(_gauss_corr(xf, xf, self.prm.kernel_sigma))
        return self._G / (kf + self.prm.lam)

    def initialize(self, frame, corners_img) -> KCFState:
        center, sz = _center_size_of(corners_img)
        st = KCFState(center=center, base_sz=sz, scale=jnp.float32(1.0),
                      alpha_f=jnp.zeros((self.prm.res,) * 2, jnp.complex64),
                      model_x=jnp.zeros(
                          (self.prm.res,) * 2 + (self.n_channels,),
                          jnp.float32),
                      psr=jnp.float32(jnp.inf))
        feat = self._feat(frame, center, self._window_sz(st))
        return st._replace(alpha_f=self._train(feat), model_x=feat)

    def _locate(self, st, frame):
        wsz = self._window_sz(st)
        feat = self._feat(frame, st.center, wsz)
        zf = jnp.fft.fft2(feat, axes=(0, 1))
        xf = jnp.fft.fft2(st.model_x, axes=(0, 1))
        kzf = jnp.fft.fft2(_gauss_corr(zf, xf, self.prm.kernel_sigma))
        resp = jnp.real(jnp.fft.ifft2(kzf * st.alpha_f))
        d = _peak_subpix(resp)
        step = wsz / self.prm.res
        center = st.center + jnp.stack([d[1] * step[0], d[0] * step[1]])
        return center, _psr(resp, self.prm.psr_guard)

    def update(self, st: KCFState, frame) -> KCFState:
        center, psr = self._locate(st, frame)
        st = st._replace(center=center, psr=psr)
        feat = self._feat(frame, center, self._window_sz(st))
        lr = self._lr(psr)
        return st._replace(
            alpha_f=(1 - lr) * st.alpha_f + lr * self._train(feat),
            model_x=(1 - lr) * st.model_x + lr * feat)


# ---------------------------------------------------------------------------
# DSST
# ---------------------------------------------------------------------------

class DSSTState(NamedTuple):
    center: Array
    base_sz: Array
    scale: Array
    num: Array        # translation filter numerator (res, res, C)
    den: Array
    snum: Array       # (S, D) complex scale-filter numerator
    sden: Array       # (S,) real scale-filter denominator
    psr: Array


class DSST(MOSSE):
    """Discriminative scale-space tracker: multi-channel translation
    filter plus a 1-D correlation filter over a geometric scale
    pyramid (Danelljan et al., BMVC'14; ThirdParty/DSST/src/dsst.cpp)."""

    name = "dsst"

    def __init__(self, prm: CFParams | None = None):
        super().__init__(prm)
        p = self.prm
        ks = jnp.arange(p.n_scales, dtype=jnp.float32) - (p.n_scales - 1) / 2
        self._scale_factors = p.scale_step ** ks          # (S,)
        self._scale_win = (0.5 - 0.5 * jnp.cos(
            2.0 * jnp.pi * (jnp.arange(p.n_scales) + 0.5) / p.n_scales)
        ).astype(jnp.float32)
        d = jnp.mod(jnp.arange(p.n_scales, dtype=jnp.float32)
                    + p.n_scales / 2.0, p.n_scales) - p.n_scales / 2.0
        gs = jnp.exp(-0.5 * d ** 2 / p.scale_sigma ** 2)
        self._Gs = jnp.fft.fft(gs)                        # (S,) complex

    # -- scale features ---------------------------------------------------
    def _scale_feats(self, frame, center, base_sz, scale) -> Array:
        """(S, D) feature matrix: one flattened feature patch per scale
        (hog cells when features='hog', like the reference DSST)."""
        p = self.prm

        def one(sf):
            if p.features == "hog":
                raw = _grab(frame, center, base_sz * scale * sf,
                            p.scale_res * p.cell)
                f = hog(raw, p.n_orient, p.cell).ravel()
            else:
                patch = _grab(frame, center, base_sz * scale * sf,
                              p.scale_res)
                f = (patch - jnp.mean(patch)).ravel()
            return f / (jnp.linalg.norm(f) + 1e-6)

        feats = jax.vmap(one)(self._scale_factors)
        return feats * self._scale_win[:, None]

    def _scale_train(self, feats: Array):
        Ff = jnp.fft.fft(feats, axis=0)                   # (S, D)
        num = self._Gs[:, None] * jnp.conj(Ff)
        den = jnp.sum(jnp.real(Ff * jnp.conj(Ff)), axis=1)
        return num, den

    def initialize(self, frame, corners_img) -> DSSTState:
        center, sz = _center_size_of(corners_img)
        p = self.prm
        st = DSSTState(center=center, base_sz=sz, scale=jnp.float32(1.0),
                       num=jnp.zeros((p.res,) * 2 + (self.n_channels,),
                                     jnp.complex64),
                       den=jnp.zeros((p.res,) * 2, jnp.float32),
                       snum=None, sden=None, psr=jnp.float32(jnp.inf))
        feat = self._feat(frame, center, self._window_sz(st))
        num, den = self._train_terms(feat)
        snum, sden = self._scale_train(
            self._scale_feats(frame, center, sz, st.scale))
        return st._replace(num=num, den=den, snum=snum, sden=sden)

    def update(self, st: DSSTState, frame) -> DSSTState:
        p = self.prm
        # 1. translation (multi-channel filter at current scale)
        center, psr = self._locate(st, frame)

        # 2. scale: 1-D filter response over the pyramid
        feats = self._scale_feats(frame, center, st.base_sz, st.scale)
        Zf = jnp.fft.fft(feats, axis=0)
        resp = jnp.real(jnp.fft.ifft(
            jnp.sum(st.snum * Zf, axis=1) / (st.sden + p.lam)))
        i = jnp.argmax(resp)
        c = resp[i]
        lo = resp[(i - 1) % p.n_scales]
        hi = resp[(i + 1) % p.n_scales]
        denom = 2.0 * c - lo - hi
        off = jnp.where(jnp.abs(denom) > 1e-8,
                        0.5 * (hi - lo) / (denom + 1e-12), 0.0)
        ds = _wrap_disp(i, p.n_scales) + jnp.clip(off, -0.5, 0.5)
        scale = st.scale * p.scale_step ** ds
        scale = jnp.clip(scale, 1.0 / p.scale_max_ratio, p.scale_max_ratio)
        st = st._replace(center=center, scale=scale, psr=psr)

        # 3. online update of both filters at the new state (PSR-gated)
        feat = self._feat(frame, center, self._window_sz(st))
        num, den = self._train_terms(feat)
        snum, sden = self._scale_train(
            self._scale_feats(frame, center, st.base_sz, scale))
        lr = self._lr(psr)
        slr = jnp.where(lr > 0.0, p.scale_lr, 0.0)
        return st._replace(
            num=(1 - lr) * st.num + lr * num,
            den=(1 - lr) * st.den + lr * den,
            snum=(1 - slr) * st.snum + slr * snum,
            sden=(1 - slr) * st.sden + slr * sden)


CF_REGISTRY = {"mosse": MOSSE, "kcf": KCF, "dsst": DSST}

# reference DSST/KCF run fHOG features (ThirdParty/DSST/src/fhog.cpp,
# ThirdParty/KCF/src/gradientMex.cpp); MOSSE is grayscale by design
_DEFAULT_FEATURES = {"mosse": "gray", "kcf": "hog", "dsst": "hog"}


def get_cf_tracker(key: str, **cfg) -> MOSSE:
    key = key.lower()
    cfg.setdefault("features", _DEFAULT_FEATURES.get(key, "gray"))
    if cfg["features"] == "hog":
        # KCF paper: Gaussian-kernel bandwidth 0.5 for HOG, 0.2 for gray
        cfg.setdefault("kernel_sigma", 0.5)
    fields = {f for f in CFParams.__dataclass_fields__}
    prm = CFParams(**{k: v for k, v in cfg.items() if k in fields})
    return CF_REGISTRY[key](prm)
