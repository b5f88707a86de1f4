"""Tracker core: state pytree, region/coordinate normalization, SM protocol.

TPU-native re-design of the reference tracker plumbing
(`/root/reference/include/mtf/TrackerBase.h:9-71`,
`SM/include/mtf/SM/NT/SearchMethod.h:14-82`): a tracker is
    initialize: (frame, corners) -> TrackerState
    update:     (TrackerState, frame) -> TrackerState        (pure, jitted)
    corners:    TrackerState -> (2, 4) corner matrix
with all numeric work inside `update` and all state in one pytree.

Coordinate normalization (absent in the reference, which runs f64 Eigen):
the SSM state lives in a *template frame* — the init region mapped to a
centered, unit-scale square via a similarity `norm_mat` — so 8-DOF Hessian
solves stay well-conditioned in f32 on TPU. Image-space points/corners are
obtained by pushing through `norm_mat`.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mtf_tpu.am.base import AM, AMState
from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.ssm.base import SSM

Array = jax.Array


class RegionState(NamedTuple):
    """Geometry of the tracked region (shared by every SM)."""
    norm_mat: Array       # (3, 3) template frame -> image similarity
    base_pts: Array       # (N, 2) sampling grid in template frame
    base_corners: Array   # (4, 2) region corners in template frame


class TrackerState(NamedTuple):
    """Full tracker state pytree (serialize for checkpoint/resume —
    SURVEY.md §5.4)."""
    ssm_state: Array      # (S,) warp params in template frame
    am_state: AMState
    region: RegionState
    extra: Any = ()       # SM-specific (cached ICLK Jacobians, PF particles…)
    spi_mask: Any = None  # optional external (N,) pixel mask (RKLT feeds
                          # the grid inlier mask here, NT/RKLT.cc:100)


@dataclass(frozen=True)
class SMParams:
    """Shared search-method configuration (reference per-SM param structs,
    e.g. FCLKParams/ESMParams)."""
    max_iters: int = 30
    epsilon: float = 0.01          # corner-change convergence threshold (px)
    interp: str = "linear"         # + "<kind>_mm" = dense-matmul sampling
    border: str = "replicate"
    crop: int | None = None        # static crop window for dense sampling
    crop_blocks: tuple | None = None  # (by, bx) tiled dense sampling; crop
                                   # becomes the per-tile window
    use_pallas: bool | None = None  # None = auto: the chain-fused whole-
                                   # iteration Pallas kernel on TPU (+12%
                                   # fleet fps, see CLAUDE.md), XLA dense
                                   # path elsewhere; True additionally
                                   # opts non-fusable configs into the
                                   # Pallas sampling kernel
    interp_bf16: bool = False      # bf16 MXU contractions for _mm sampling
    interp_precision: str | None = None  # "highest": full-precision f32
                                   # sampling contractions on the
                                   # GENERIC dense path (the TPU default
                                   # rounds f32 dot operands to bf16 —
                                   # ~0.5-intensity value noise, which
                                   # histogram AMs (MI/CCRE) amplify
                                   # into a ~1 px on-chip floor)
    coarse_pt_iters: tuple = ()    # coarse-to-fine POINT decimation for
                                   # the fused LK path: ((stride, n), ...)
                                   # runs n GN iterations on the
                                   # stride-decimated template grid
                                   # (N/stride^2 points) before the
                                   # full-resolution remainder of
                                   # max_iters. The GN fixed point is set
                                   # by the final full-res iterations, so
                                   # accuracy is preserved while early
                                   # iterations cost ~1/stride^2
                                   # (pyramid-in-N; cf. the reference's
                                   # resolution pyramid)
    hess_type: str = "self0"       # self0 | selft | std | std2 (ESMParams.h:13-18)
    jac_type: str = "original"     # original | diff_of_jacs (ESM)
    enable_lm: bool = False        # Levenberg-Marquardt damping w/ rollback
    spi_type: str | None = None    # SPI mask: pix_diff | gradient | gftt
    spi_thresh: float = 0.2        # (spiUtils.h:12-60; ESM wiring
                                   #  NT/ESM.cc:40-66)
    lm_delta0: float = 1e-3
    lm_up: float = 10.0
    lm_down: float = 0.1
    sd_learning_rate: float = 0.1  # FCSD step size
    extra: dict = field(default_factory=dict)


def make_region(corners_img: Array, resx: int, resy: int) -> RegionState:
    """Build the normalized template frame from init corners (ul,ur,lr,ll)."""
    c = jnp.mean(corners_img, axis=0)
    scale = jnp.mean(jnp.linalg.norm(corners_img - c, axis=-1))
    scale = jnp.maximum(scale, 1e-6)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                  corners_img.dtype)
    T = T.at[0, 0].set(scale).at[1, 1].set(scale) \
         .at[0, 2].set(c[0]).at[1, 2].set(c[1])
    Tinv = jnp.linalg.inv(T)
    grid_img = W.grid_from_corners(corners_img, resx, resy)
    return RegionState(
        norm_mat=T,
        base_pts=W.apply_warp(Tinv, grid_img),
        base_corners=W.apply_warp(Tinv, corners_img))


def image_pts(ssm: SSM, state: TrackerState) -> Array:
    """Current sampling grid in image coordinates (ssm->getPts analog)."""
    pts_t = ssm.warp_pts(state.ssm_state, state.region.base_pts)
    return W.apply_warp(state.region.norm_mat, pts_t)


def image_corners(ssm: SSM, state: TrackerState) -> Array:
    """Current region corners (4, 2) in image coordinates."""
    c_t = ssm.warp_pts(state.ssm_state, state.region.base_corners)
    return W.apply_warp(state.region.norm_mat, c_t)


def sample_patch(frame: Array, pts: Array, prm: SMParams) -> Array:
    return interp.sample(frame, pts, prm.interp, prm.border)


def track_sequence(sm, frames: Array, corners0: Array,
                   state0: TrackerState | None = None):
    """Track a whole frame stack in ONE device dispatch via `lax.scan`.

    The runMTF loop (`runMTF.cc:460-704`) round-trips host<->device every
    frame; when frames are already device-resident (offline eval, synthetic
    benches, video chunks) a scan amortizes dispatch and lets XLA pipeline
    the per-frame programs. Returns (final_state, corners (T-1, 2, 4)).
    """
    if state0 is None:
        state0 = sm.initialize(frames[0], corners0)
        rest = frames[1:]
    else:
        rest = frames

    def step(state, frame):
        st = sm.update(state, frame)
        return st, image_corners(sm.ssm, st).T

    return jax.lax.scan(step, state0, rest)


class SearchMethod:
    """Base SM: binds one AM and one SSM (nt::SearchMethod analog).

    Subclasses implement `_init_extra` and `_update` (pure). The public
    `initialize`/`update` handle region setup and template sampling.
    """

    name = "base"
    jittable = True   # False for host-hybrid trackers (cv2 detection
                      # inside update: CMT, FeatureTracker, cv2
                      # adapters) — run_mtf and fleets must not jit/vmap
                      # their update

    def __init__(self, am: AM, ssm: SSM, prm: SMParams | None = None):
        self.am = am
        self.ssm = ssm
        self.prm = prm or SMParams()

    # -- subclass hooks -------------------------------------------------
    def _init_extra(self, state: TrackerState, frame: Array):
        return ()

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        raise NotImplementedError

    # -- public API (TrackerBase contract) ------------------------------
    def initialize(self, frame: Array, corners_img: Array) -> TrackerState:
        region = make_region(corners_img, self.am.prm.resx, self.am.prm.resy)
        pts0 = W.apply_warp(region.norm_mat, region.base_pts)
        patch0 = sample_patch(frame, pts0, self.prm)
        st = TrackerState(
            ssm_state=self.ssm.identity(frame.dtype if frame.dtype in
                                        (jnp.float32,) else jnp.float32),
            am_state=self.am.init(patch0),
            region=region)
        return st._replace(extra=self._init_extra(st, frame))

    def update(self, state: TrackerState, frame: Array) -> TrackerState:
        return self._update(state, frame)

    def corners(self, state: TrackerState) -> Array:
        """(2, 4) MTF corner matrix."""
        return image_corners(self.ssm, state).T

    def set_region(self, state: TrackerState, corners_img: Array,
                   frame: Array | None = None) -> TrackerState:
        """Move the tracked region without touching the template
        (`TrackerBase::setRegion` / ssm->setCorners,
        SM/NT/SearchMethod.h:70-75)."""
        Tinv = __import__('mtf_tpu.ops.linalg', fromlist=['inv3x3']).inv3x3(state.region.norm_mat)
        c_t = W.apply_warp(Tinv, corners_img)
        new_ssm = self.ssm.fit_pts(state.region.base_corners, c_t)
        return state._replace(ssm_state=new_ssm)

    def reinitialize(self, frame: Array, corners_img: Array) -> TrackerState:
        """Fresh template at new corners (reinit-on-failure protocol,
        runMTF.cc:499-547)."""
        return self.initialize(frame, corners_img)
