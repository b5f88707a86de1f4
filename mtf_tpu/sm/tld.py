"""TLD (Tracking-Learning-Detection, Kalal et al. TPAMI'12) — TPU-native.

The reference bundles OpenTLD as ThirdParty C++ (15.9 kLoC:
`ThirdParty/TLD/src/TLD.cc`, `DetectorCascade.cpp`,
`EnsembleClassifier.cpp`, `NNClassifier.cpp`, `VarianceFilter.cpp`).
This rebuild keeps the TLD architecture — a median-flow tracker leg in
parallel with a 3-stage sliding-window detection cascade (variance
filter → random-fern ensemble → NN template match) re-trained online by
P/N experts — but maps every stage onto fixed-shape tensor programs:

- The reference enumerates ~50k variable-size windows over the image
  (`DetectorCascade.cpp:93-140`) and walks them with per-window pointer
  arithmetic. Here detection happens in a CANONICAL scale pyramid: each
  level resamples the frame so the tracked target maps to a fixed
  `win`x`win` canonical window (scale-invariant by construction), and
  all windows of a level are the SAME static `win`-square at a strided
  grid — so the variance filter is four static slices of one integral
  image, and every fern's pixel-pair comparison is an elementwise
  compare of two statically-shifted views of the level image (no
  per-window loops, no gathers until the posterior lookup).
- The fern ensemble (10 trees x 13 pairwise comparisons -> 13-bit
  posterior index, `EnsembleClassifier.cpp:52-65,130`) becomes bit-packed
  integer maps + one `take_along_axis` per frame.
- The NN classifier (normalized-patch NCC vs online positive/negative
  template sets, `NNClassifier.cpp`) runs only on the top-K fern
  candidates plus the tracker's window: one (K+1, P) x (P, slots)
  matmul against fixed-capacity ring-buffer template sets.
- P/N learning (`TLD.cc:360-470 learn()`): windows overlapping the
  fused box re-train fern posteriors positive, confident far windows
  negative — both as masked `segment_sum`s over the posterior bins; the
  NN sets learn by ring-buffer insertion. All learning is masked by the
  validity flag, so the whole update stays one pure jittable program.
- Re-acquisition: when the tracker leg is invalid and a detection
  clears `theta_tp`, the fused box jumps to the detection and the
  median-flow leg is re-anchored there (`set_region`) — the behavior
  that distinguishes TLD from pure trackers.

State is a pytree; update() is pure — fleets/vmap work as for every
other SM.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mtf_tpu.ops import interp
from mtf_tpu.sm.cf import _center_size_of, _corners_of

Array = jax.Array


@dataclass(frozen=True)
class TLDParams:
    """Defaults follow `DetectorCascade.cpp:56-70` (10 trees x 13
    features, variance threshold at half the init variance) and
    `NNClassifier.h` (thetaTP=.65, thetaFP=.5)."""
    win: int = 16            # canonical fern window
    nn_res: int = 15         # NN patch resolution (TLD_PATCH_SIZE)
    levels: int = 5          # canonical scale levels, ratio**(k - L//2)
    ratio: float = 1.2       # scale step between windows (Det.Casc.:96)
    canon_h: int = 144       # canonical detection image (per level)
    canon_w: int = 192
    stride: int = 2          # window stride in canonical px (10% shift)
    n_trees: int = 10
    n_feats: int = 13
    kp: int = 32             # NN positive template slots
    kn: int = 64             # NN negative template slots
    top_k: int = 8           # fern candidates promoted to the NN stage
    theta_tp: float = 0.6     # re-acquisition confidence gate
    theta_fp: float = 0.55    # tracker-validity floor
    var_ratio: float = 0.5
    pos_iou: float = 0.6     # P-expert overlap (TLD.cc learn())
    neg_iou: float = 0.2     # N-expert overlap ceiling
    seed: int = 0


class TLDState(NamedTuple):
    trk: object          # median-flow leg TrackerState
    center: Array        # (2,) fused bbox center (image px)
    size: Array          # (2,) fused bbox w, h
    valid: Array         # () bool — output currently trusted (learning on)
    var_min: Array       # () variance floor (VarianceFilter.cpp:85)
    fern_pos: Array      # (T, 2^F) positive counts
    fern_neg: Array      # (T, 2^F)
    pos_set: Array       # (KP, nn_res^2) zero-mean unit-norm patches
    pos_valid: Array     # (KP,)
    neg_set: Array       # (KN, nn_res^2)
    neg_valid: Array     # (KN,)
    pos_ptr: Array       # () int32 ring pointer
    neg_ptr: Array


def _cumsum2(img):
    return jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)


class TLD:
    """TLD wrapper around a median-flow tracker leg (any bbox-reporting
    SM; the factory passes the native `mf` GridTracker)."""

    name = "tld"

    def __init__(self, mf_leg, prm: TLDParams | None = None):
        self.mf = mf_leg
        self.ssm = mf_leg.ssm
        self.prm = prm or TLDParams()
        p = self.prm
        rng = np.random.default_rng(p.seed)
        # static fern pixel pairs inside the canonical window
        # (EnsembleClassifier.cpp:113-128 draws them once at init)
        self._pairs = rng.integers(
            0, p.win, size=(p.n_trees, p.n_feats, 2, 2)).astype(np.int32)
        self._n_idx = 2 ** p.n_feats
        # canonical window-grid geometry (static)
        self._gh = (p.canon_h - p.win) // p.stride + 1
        self._gw = (p.canon_w - p.win) // p.stride + 1
        self._r = np.float32(p.ratio) ** (
            np.arange(p.levels, dtype=np.float32) - p.levels // 2)

    # -- canonical pyramid -------------------------------------------
    def _canon_level(self, frame, size, rk, phase=(0.0, 0.0)):
        """Resample the frame so the target at scale `rk` is `win` px:
        canonical pixel (i, j) <- image ((j+.5+phase_x)*sx, ...).
        `phase` sub-stride offsets let init training cover shifted
        window alignments (the fern patterns are not shift-invariant)."""
        p = self.prm
        sx = size[0] * rk / p.win
        sy = size[1] * rk / p.win
        xs = (jnp.arange(p.canon_w, dtype=jnp.float32) + 0.5
              + phase[0]) * sx
        ys = (jnp.arange(p.canon_h, dtype=jnp.float32) + 0.5
              + phase[1]) * sy
        pts = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"),
                        axis=-1).reshape(-1, 2)
        L = interp.sample(frame, pts, "linear")[:, 0]
        return L.reshape(p.canon_h, p.canon_w)

    def _level_maps(self, L):
        """(gh, gw) variance + (T, gh, gw) fern indices for one level —
        static slices only (the TPU-native DetectorCascade)."""
        p = self.prm
        w, st = p.win, p.stride
        gh, gw = self._gh, self._gw
        # variance via integral images (VarianceFilter.cpp:45-60)
        pad = jnp.pad(L, ((1, 0), (1, 0)))
        ii = _cumsum2(pad)
        ii2 = _cumsum2(pad * pad)

        def box(i):
            a = i[:gh * st:st, :gw * st:st]
            return a

        def rect(ii):
            return (box(ii[w:, w:]) + box(ii[:-w, :-w])
                    - box(ii[w:, :-w]) - box(ii[:-w, w:]))

        n = float(w * w)
        mean = rect(ii) / n
        var = rect(ii2) / n - mean * mean
        # ferns: bit f of tree t compares two shifted strided views
        bits = []
        for t in range(p.n_trees):
            idx_t = jnp.zeros((gh, gw), jnp.int32)
            for f in range(p.n_feats):
                (ay, ax), (by, bx) = self._pairs[t, f]
                A = L[ay:ay + gh * st:st, ax:ax + gw * st:st]
                B = L[by:by + gh * st:st, bx:bx + gw * st:st]
                idx_t = idx_t | ((A > B).astype(jnp.int32) << f)
            bits.append(idx_t)
        return var, jnp.stack(bits)                       # (T, gh, gw)

    def _fern_conf(self, state, idx):
        """Mean posterior over trees; idx (T, M)."""
        pos, neg = state.fern_pos, state.fern_neg
        P = pos / jnp.maximum(pos + neg, 1.0)             # Ens.Cls.:176
        return jnp.mean(jnp.take_along_axis(P, idx, axis=1), axis=0)

    # -- NN stage ------------------------------------------------------
    def _nn_patch(self, frame, center, size):
        p = self.prm
        g = (jnp.arange(p.nn_res, dtype=jnp.float32) / (p.nn_res - 1)) - 0.5
        gx, gy = jnp.meshgrid(g * size[0], g * size[1], indexing="xy")
        pts = jnp.stack([gx.ravel() + center[0], gy.ravel() + center[1]],
                        axis=-1)
        v = interp.sample(frame, pts, "linear")[:, 0]
        v = v - jnp.mean(v)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-6)

    def _rel_sim(self, state, patches, conservative=False):
        """Relative similarity (NNClassifier.cpp:44-108): distances
        d = (1 - ncc)/2 to the closest positive / negative template;
        rel = dN / (dN + dP). Empty sets behave as max distance.
        `conservative` restricts the positive set to its first-half
        slots (the earliest, most-trusted templates) — the reference's
        conservative similarity, used to gate re-acquisition so a
        drifted/recent positive cannot vouch for a false detection."""
        def dmin(tset, tvalid):
            ncc = patches @ tset.T                         # (B, slots)
            d = (1.0 - ncc) * 0.5
            d = jnp.where(tvalid[None, :] > 0.5, d, 1.0)
            return jnp.min(d, axis=1)

        pv = state.pos_valid
        if conservative:
            half = max(1, pv.shape[0] // 2)
            pv = pv * (jnp.arange(pv.shape[0]) < half)
        dp = dmin(state.pos_set, pv)
        dn = dmin(state.neg_set, state.neg_valid)
        return dn / jnp.maximum(dn + dp, 1e-6)

    # -- window geometry ----------------------------------------------
    def _window_boxes(self, size):
        """Centers (L, gh, gw, 2) + sizes (L, 2) of every canonical
        window in image coords."""
        p = self.prm
        r = jnp.asarray(self._r)
        sx = size[0] * r / p.win                           # (L,)
        sy = size[1] * r / p.win
        cx = (jnp.arange(self._gw, dtype=jnp.float32) * p.stride
              + p.win / 2)                                 # canonical
        cy = (jnp.arange(self._gh, dtype=jnp.float32) * p.stride + p.win / 2)
        CX = cx[None, None, :] * sx[:, None, None]
        CY = cy[None, :, None] * sy[:, None, None]
        centers = jnp.stack(
            [jnp.broadcast_to(CX, (p.levels, self._gh, self._gw)),
             jnp.broadcast_to(CY, (p.levels, self._gh, self._gw))],
            axis=-1)
        sizes = jnp.stack([size[0] * r, size[1] * r], axis=-1)  # (L, 2)
        return centers, sizes

    @staticmethod
    def _iou(c1, s1, c2, s2):
        """Axis-aligned IoU; c (..., 2) centers, s (..., 2) sizes."""
        lo = jnp.maximum(c1 - s1 / 2, c2 - s2 / 2)
        hi = jnp.minimum(c1 + s1 / 2, c2 + s2 / 2)
        inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
        a1 = jnp.prod(s1, axis=-1)
        a2 = jnp.prod(s2, axis=-1)
        return inter / jnp.maximum(a1 + a2 - inter, 1e-6)

    # -- detection + learning pass ------------------------------------
    def _detect(self, state, frame, phase=(0.0, 0.0)):
        """Full cascade over the pyramid. Returns (var (L,gh,gw),
        conf (L,gh,gw), idx (T, L*gh*gw), centers, sizes)."""
        p = self.prm
        canon = jax.vmap(lambda rk: self._canon_level(
            frame, state.size, rk, phase))(jnp.asarray(self._r))
        var, idx = jax.vmap(self._level_maps)(canon)       # (L,gh,gw)...
        idx = jnp.moveaxis(idx, 1, 0).reshape(p.n_trees, -1)  # (T, M)
        conf = self._fern_conf(state, idx).reshape(var.shape)
        centers, sizes = self._window_boxes(state.size)
        # phase shifts every window center by the same sub-stride amount
        if phase != (0.0, 0.0):
            r = jnp.asarray(self._r)
            sxy = jnp.stack([state.size[0] * r / p.win,
                             state.size[1] * r / p.win], axis=-1)
            centers = centers + jnp.asarray(phase) * sxy[:, None, None, :]
        return var, conf, idx, centers, sizes

    # -- TrackerBase contract -----------------------------------------
    def initialize(self, frame, corners_img) -> TLDState:
        p = self.prm
        frame = jnp.asarray(frame, jnp.float32)
        if frame.ndim == 3:
            frame = jnp.mean(frame, axis=-1)
        corners_img = jnp.asarray(corners_img, jnp.float32)
        if corners_img.shape[0] == 2:
            corners_img = corners_img.T
        center, size = _center_size_of(corners_img)
        trk = self.mf.initialize(frame, corners_img)
        P = p.nn_res * p.nn_res
        patch0 = self._nn_patch(frame, center, size)
        st = TLDState(
            trk=trk, center=center, size=size,
            valid=jnp.asarray(True),
            var_min=jnp.asarray(0.0, jnp.float32),
            fern_pos=jnp.zeros((p.n_trees, self._n_idx), jnp.float32),
            fern_neg=jnp.zeros((p.n_trees, self._n_idx), jnp.float32),
            pos_set=jnp.zeros((p.kp, P), jnp.float32).at[0].set(patch0),
            pos_valid=jnp.zeros((p.kp,), jnp.float32).at[0].set(1.0),
            neg_set=jnp.zeros((p.kn, P), jnp.float32),
            neg_valid=jnp.zeros((p.kn,), jnp.float32),
            pos_ptr=jnp.asarray(1, jnp.int32),
            neg_ptr=jnp.asarray(0, jnp.int32))
        # variance floor from the init window (VarianceFilter.cpp:85)
        var, _, idx, centers, sizes = self._detect(st, frame)
        mid = var[p.levels // 2]
        ci = jnp.argmin(jnp.sum(
            (centers[p.levels // 2].reshape(-1, 2) - center) ** 2, axis=1))
        st = st._replace(var_min=mid.reshape(-1)[ci] * p.var_ratio)
        # initial fern training: positives = windows overlapping the
        # init box, negatives = every valid far window (TLD.cc
        # initialLearning). Extra phase-jittered passes stand in for the
        # reference's warped-positive augmentation (TLD.cc
        # initialLearning's generatePositive windows): the 13-bit fern
        # patterns are alignment-sensitive, so training all sub-stride
        # alignments makes the posterior generalize across positions.
        st = self._learn_ferns(st, idx, centers, sizes, var,
                               center, size, jnp.asarray(True),
                               bootstrap=True)
        for phase in ((1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.5, 0.5)):
            var_j, _, idx_j, centers_j, sizes_j = self._detect(
                st, frame, phase)
            st = self._learn_ferns(st, idx_j, centers_j, sizes_j, var_j,
                                   center, size, jnp.asarray(True),
                                   bootstrap=True)
        # seed the NN negative set from high-variance FAR windows
        # (NNClassifier initial training, TLD.cc:initialLearning) —
        # without initial negatives the relative similarity of ANY
        # patch is biased to 1/(1+dP) > thetaFP and the validity gate
        # never fires
        iou = self._iou(centers, sizes[:, None, None, :],
                        center, size).reshape(-1)
        far_score = jnp.where((iou < p.neg_iou)
                              & (var.reshape(-1) >= st.var_min),
                              var.reshape(-1), -1.0)
        n_seed = min(8, p.kn)
        _, far_i = jax.lax.top_k(far_score, n_seed)
        cent_flat = centers.reshape(-1, 2)
        size_flat = jnp.repeat(sizes, self._gh * self._gw, axis=0)
        neg_pats = jax.vmap(lambda c, s: self._nn_patch(frame, c, s))(
            cent_flat[far_i], size_flat[far_i])
        st = st._replace(
            neg_set=st.neg_set.at[:n_seed].set(neg_pats),
            neg_valid=st.neg_valid.at[:n_seed].set(1.0),
            neg_ptr=jnp.asarray(n_seed, jnp.int32))
        return st

    def _learn_ferns(self, state, idx, centers, sizes, var, center, size,
                     enable, bootstrap=False):
        p = self.prm
        iou = self._iou(centers, sizes[:, None, None, :],
                        center, size).reshape(-1)          # (M,)
        var_ok = (var >= state.var_min).reshape(-1)
        P = state.fern_pos / jnp.maximum(
            state.fern_pos + state.fern_neg, 1.0)
        conf = jnp.mean(jnp.take_along_axis(P, idx, axis=1),
                        axis=0)                            # (M,)
        en = enable.astype(jnp.float32)
        # P-expert: overlapping windows whose ensemble is not yet
        # confident; N-expert: confident far windows (TLD.cc learn()).
        # `bootstrap` (initialLearning) trains EVERY valid far window
        # negative — untrained posteriors are 0 everywhere, so the
        # online conf>0.5 criterion can never seed the first negatives.
        wpos = (iou > p.pos_iou) & (conf < 0.6)
        wneg = (iou < p.neg_iou) & var_ok & (
            jnp.asarray(True) if bootstrap else (conf > 0.5))
        posw = wpos.astype(jnp.float32) * en
        negw = wneg.astype(jnp.float32) * en

        def upd(counts, w):
            add = jax.vmap(lambda ix: jax.ops.segment_sum(
                w, ix, num_segments=self._n_idx))(idx)
            return counts + add

        return state._replace(fern_pos=upd(state.fern_pos, posw),
                              fern_neg=upd(state.fern_neg, negw))

    def update(self, state: TLDState, frame) -> TLDState:
        p = self.prm
        frame = jnp.asarray(frame, jnp.float32)
        if frame.ndim == 3:
            frame = jnp.mean(frame, axis=-1)

        # 1. tracker leg (median flow)
        trk2 = self.mf.update(state.trk, frame)
        tc_corners = self.mf.corners(trk2).T               # (4, 2)
        t_center, t_size = _center_size_of(tc_corners)
        t_finite = jnp.all(jnp.isfinite(t_center)) & \
            jnp.all(t_size > 1.0)
        t_center = jnp.where(t_finite, t_center, state.center)
        t_size = jnp.where(t_finite, t_size, state.size)

        # 2. detection cascade
        var, conf, idx, centers, sizes = self._detect(state, frame)
        score = jnp.where(var >= state.var_min, conf, -1.0).reshape(-1)
        top_s, top_i = jax.lax.top_k(score, p.top_k)
        cent_flat = centers.reshape(-1, 2)
        size_flat = jnp.repeat(sizes, self._gh * self._gw, axis=0)
        # standing local candidates: a 3x3 ring around the last box (the
        # fern stage is position-hashed and needs many frames to cover a
        # new location; right after an occlusion the target usually
        # reappears near where it vanished, and the NN stage — not the
        # fern prior — is the arbiter anyway)
        off = jnp.asarray([[dx, dy] for dy in (-1, 0, 1)
                           for dx in (-1, 0, 1)], jnp.float32)
        ring_c = state.center[None, :] + off * 0.25 * state.size[None, :]
        ring_s = jnp.broadcast_to(state.size, (9, 2))
        cand_c = jnp.concatenate([cent_flat[top_i], ring_c], axis=0)
        cand_s = jnp.concatenate([size_flat[top_i], ring_s], axis=0)
        n_cand = p.top_k + 9

        # 3. NN stage on candidates + tracker window
        pats = jax.vmap(lambda c, s: self._nn_patch(frame, c, s))(
            jnp.concatenate([cand_c, t_center[None]], axis=0),
            jnp.concatenate([cand_s, t_size[None]], axis=0))
        rel = self._rel_sim(state, pats)
        # fern-confidence gate for the sliding-window candidates (looser
        # while the tracker is lost: the ORDER of fern scores still
        # surfaces the right windows before their posteriors saturate);
        # ring candidates answer to the NN model alone
        gate = jnp.where(state.valid, 0.5, 0.2)
        keep = jnp.concatenate([top_s > gate, jnp.ones((9,), bool)])
        cand_rel = jnp.where(keep, rel[:n_cand], 0.0)
        det_j = jnp.argmax(cand_rel)
        det_rel = cand_rel[det_j]
        det_c, det_s = cand_c[det_j], cand_s[det_j]
        trk_rel = rel[n_cand]
        # conservative similarity of the winning detection (reference
        # NNClassifier's conservative_similarity): the re-acquisition
        # gate answers to the EARLY positive templates only, at a
        # stricter threshold — a smooth-texture background window can
        # fool the 0.6 relative gate but not this one
        det_cons = self._rel_sim(state, pats[det_j][None],
                                 conservative=True)[0]

        # 4. fusion (TLD.cc:273-340): trust the tracker while its
        # window still matches the model; re-acquire from a confident
        # detection when it does not
        trk_ok = state.valid & t_finite & (trk_rel > p.theta_fp)
        det_ok = det_rel > p.theta_tp
        reacq = (~trk_ok) & det_ok & (det_cons > p.theta_tp + 0.1)
        # OpenTLD fuses close detections at 10:1 in the tracker's favor
        # (TLD.cc fuseHypotheses) — detections are quantized to the
        # canonical stride and must not drag a healthy tracker
        agree = trk_ok & det_ok & (
            self._iou(t_center, t_size, det_c, det_s) > 0.5)
        fuse_c = (10.0 * t_center + det_c) / 11.0
        fuse_s = (10.0 * t_size + det_s) / 11.0
        center = jnp.where(reacq, det_c,
                           jnp.where(agree, fuse_c, t_center))
        size = jnp.where(reacq, det_s,
                         jnp.where(agree, fuse_s, t_size))
        # validity follows the box that was actually OUTPUT: a confident
        # detection that did NOT clear the re-acquisition gate must not
        # re-enable learning at the stale tracker box
        new_valid = trk_ok | reacq

        # 5. learning (only while valid — the P/N experts of TLD.cc
        # learn(); masked, not branched, so the program stays static)
        st = state._replace(center=center, size=size, valid=new_valid)
        st = self._learn_ferns(st, idx, centers, sizes, var, center,
                               size, new_valid)
        final_pat = self._nn_patch(frame, center, size)
        final_rel = self._rel_sim(st, final_pat[None])[0]
        add_pos = new_valid & (final_rel < p.theta_tp + 0.05)
        pslot = st.pos_ptr % p.kp
        st = st._replace(
            pos_set=jnp.where(add_pos,
                              st.pos_set.at[pslot].set(final_pat),
                              st.pos_set),
            pos_valid=jnp.where(add_pos,
                                st.pos_valid.at[pslot].set(1.0),
                                st.pos_valid),
            pos_ptr=st.pos_ptr + add_pos.astype(jnp.int32))
        # hardest far false positive -> negative set
        far = self._iou(cand_c, cand_s, center, size) < p.neg_iou
        fp_rel = jnp.where(far, cand_rel, -1.0)
        fp_j = jnp.argmax(fp_rel)
        add_neg = new_valid & (fp_rel[fp_j] > p.theta_fp)
        nslot = st.neg_ptr % p.kn
        st = st._replace(
            neg_set=jnp.where(add_neg,
                              st.neg_set.at[nslot].set(pats[fp_j]),
                              st.neg_set),
            neg_valid=jnp.where(add_neg,
                                st.neg_valid.at[nslot].set(1.0),
                                st.neg_valid),
            neg_ptr=st.neg_ptr + add_neg.astype(jnp.int32))

        # 6. re-anchor the tracker leg on the fused box (always cheap;
        # on re-acquisition this is what revives the dead leg)
        corners = _corners_of(center, size)
        trk2 = self.mf.set_region(trk2, corners, frame)
        return st._replace(trk=trk2)

    def corners(self, st: TLDState) -> Array:
        return _corners_of(st.center, st.size).T

    def set_region(self, st: TLDState, corners_img, frame=None) -> TLDState:
        corners_img = jnp.asarray(corners_img, jnp.float32)
        if corners_img.shape[0] == 2:
            corners_img = corners_img.T
        center, size = _center_size_of(corners_img)
        trk = self.mf.set_region(st.trk, corners_img, frame)
        return st._replace(center=center, size=size, trk=trk,
                           valid=jnp.asarray(True))

    def reinitialize(self, frame, corners_img) -> TLDState:
        return self.initialize(frame, corners_img)
