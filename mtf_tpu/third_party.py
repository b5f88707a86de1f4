"""Third-party tracker adapter slots.

The reference bundles 15 external learning/detection trackers (54.6 kLoC,
`ThirdParty/`; registry keys `mtf.h:1978-2120` — DSST, KCF, CMT, TLD, RCT,
MIL, Struck, FRG, ...). Per SURVEY.md §2 they are out-of-scope bundled
code: this module provides the *slots* — the same registry mechanism and
uniform TrackerBase-style corner API — with adapters for whatever tracker
implementations the host environment provides (OpenCV's tracking module),
plus `register_third_party` for user-supplied ones.

Third-party trackers are axis-aligned-bbox learners; like the reference's
adapters they report the bbox as a 4-corner region.
"""
from __future__ import annotations

import numpy as np


class ThirdPartyState:
    """Mutable host-side state (these trackers are stateful objects)."""

    def __init__(self, impl, corners):
        self.impl = impl
        self.corners = np.asarray(corners, np.float32)  # (4, 2)


def _to_u8_bgr(frame) -> np.ndarray:
    import cv2
    a = np.asarray(frame)
    if a.dtype != np.uint8:
        a = np.clip(a, 0, 255).astype(np.uint8)
    if a.ndim == 2:
        a = cv2.cvtColor(a, cv2.COLOR_GRAY2BGR)
    return a


def _bbox_of(corners) -> tuple:
    c = np.asarray(corners)
    x0, y0 = c.min(axis=0)
    x1, y1 = c.max(axis=0)
    return (float(x0), float(y0), float(x1 - x0), float(y1 - y0))


class CVTrackerAdapter:
    """Adapter for OpenCV tracking-API trackers (TrackerBase contract)."""

    jittable = False  # stateful host-side objects

    def __init__(self, make_impl, name: str):
        self._make = make_impl
        self.name = name
        self.ssm = None  # no SSM: bbox tracker

    def initialize(self, frame, corners) -> ThirdPartyState:
        impl = self._make()
        impl.init(_to_u8_bgr(frame), tuple(
            int(round(v)) for v in _bbox_of(corners)))
        return ThirdPartyState(impl, corners)

    def update(self, state: ThirdPartyState, frame) -> ThirdPartyState:
        ok, bbox = state.impl.update(_to_u8_bgr(frame))
        if ok:
            x, y, w, h = bbox
            state.corners = np.asarray(
                [[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                np.float32)
        return state

    def corners(self, state: ThirdPartyState) -> np.ndarray:
        return state.corners.T  # (2, 4)

    def set_region(self, state: ThirdPartyState, corners,
                   frame=None) -> ThirdPartyState:
        state.corners = np.asarray(corners, np.float32)
        return state


def _cv_available() -> dict:
    import cv2
    avail = {}
    if hasattr(cv2, "TrackerMIL_create"):
        avail["mil"] = lambda: cv2.TrackerMIL_create()
    if hasattr(cv2, "TrackerKCF_create"):
        avail["kcf"] = lambda: cv2.TrackerKCF_create()
    if hasattr(cv2, "TrackerCSRT_create"):
        avail["csrt"] = lambda: cv2.TrackerCSRT_create()
    if hasattr(cv2, "legacy"):
        leg = cv2.legacy
        for key, ctor in (("boost", "TrackerBoosting_create"),
                          ("tld", "TrackerTLD_create"),
                          ("mf", "TrackerMedianFlow_create")):
            if hasattr(leg, ctor):
                avail[key] = getattr(leg, ctor)
    return avail


# reference third-party keys (mtf.h:1978-2120); resolved lazily.
# NOTE: dsst/kcf (and mosse) are intercepted by the factory BEFORE this
# registry and resolve to the native FFT implementations in sm/cf.py;
# the keys stay listed here for reference-parity introspection.
THIRD_PARTY_KEYS = ("dsst kcf cmt tld rct mil strk frg boost dft "
                    "pfsl3 visp cv3 gtrn csrt mf").split()

_registry: dict = {}


def register_third_party(key: str, constructor) -> None:
    """Register a user-supplied tracker factory under a string key
    (the extension mechanism of mtf.h:1978-2120)."""
    _registry[key.lower()] = constructor


def get_third_party(key: str):
    """Construct a third-party tracker; raises with the availability list
    for known-but-unavailable keys."""
    k = key.lower()
    if k in _registry:
        return _registry[k]()
    avail = _cv_available()
    if k in avail:
        return CVTrackerAdapter(avail[k], k)
    if k in THIRD_PARTY_KEYS:
        raise NotImplementedError(
            f"third-party tracker {key!r} is a bundled-code slot; "
            f"available in this environment: {sorted(avail) or 'none'} "
            f"(register your own via register_third_party)")
    raise ValueError(f"unknown third-party key {key!r}")


def is_third_party(key: str) -> bool:
    return key.lower() in THIRD_PARTY_KEYS or key.lower() in _registry
