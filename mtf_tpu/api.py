"""pyMTF-compatible procedural API.

Re-exposes the reference Python binding surface
(`/root/reference/Examples/cpp/pyMTF.cc:24-44`:
`create(img, corners, cfg) -> id`, `getRegion(img, out, id)`,
`setRegion(corners, id)`, `remove(id)`) over the TPU-native trackers.
Corners use the reference's 2x4 layout (x-row, y-row; ul ur lr ll).

    import mtf_tpu.api as pymtf
    tid = pymtf.create(frame, corners_2x4, sm="fclk", am="ncc", ssm="8")
    corners = pymtf.getRegion(next_frame, tid)
    pymtf.setRegion(corners_2x4, tid)
    pymtf.remove(tid)

State lives in a module-level registry like the reference's global tracker
map; each tracked object carries its own jitted update. For the functional
API (pytrees in/out) use `mtf_tpu.create_tracker` directly.
"""
from __future__ import annotations

import threading

import numpy as np

_registry: dict[int, dict] = {}
_next_id = 1
_lock = threading.Lock()


def _to_corners42(corners) -> "np.ndarray":
    c = np.asarray(corners, np.float32)
    if c.shape == (2, 4):
        c = c.T
    if c.shape != (4, 2):
        raise ValueError(f"corners must be (2,4) or (4,2), got {c.shape}")
    return c


def create(img, corners, config_dir: str | None = None, *,
           sm: str = "fclk", am: str = "ssd", ssm: str = "8",
           ilm: str | None = None, **cfg) -> int:
    """Create + initialize a tracker; returns its id (pyMTF.cc:67)."""
    import jax
    import jax.numpy as jnp
    from mtf_tpu import create_tracker
    from mtf_tpu.utils.config import read_params
    from mtf_tpu.utils.preproc import get_preproc

    global _next_id
    if config_dir:
        file_cfg = read_params(config_dir, [])
        sm = file_cfg.get("mtf_sm", sm)
        am = file_cfg.get("mtf_am", am)
        ssm = file_cfg.get("mtf_ssm", ssm)
        ilm_f = file_cfg.get("mtf_ilm", ilm or "0")
        ilm = None if ilm_f in ("0", "none", None) else ilm_f
        cfg = {**file_cfg, **cfg}

    tracker = create_tracker(sm, am, ssm, ilm, **cfg)
    pre = get_preproc(str(cfg.get("pre_proc_type", "none")))
    frame = pre(jnp.asarray(np.asarray(img, np.float32)))
    state = tracker.initialize(frame, jnp.asarray(_to_corners42(corners)))
    upd = jax.jit(tracker.update)
    with _lock:
        tid = _next_id
        _next_id += 1
        _registry[tid] = {"tracker": tracker, "state": state,
                          "update": upd, "pre": pre}
    return tid


def getRegion(img, tracker_id: int = 1) -> "np.ndarray":
    """Track one frame; returns the (2, 4) corner matrix (pyMTF.cc:35)."""
    import jax.numpy as jnp
    ent = _registry[tracker_id]
    frame = ent["pre"](jnp.asarray(np.asarray(img, np.float32)))
    ent["state"] = ent["update"](ent["state"], frame)
    return np.asarray(ent["tracker"].corners(ent["state"]))


def setRegion(corners, tracker_id: int = 1) -> None:
    """Move the tracked region without re-templating (pyMTF.cc:40)."""
    import jax.numpy as jnp
    ent = _registry[tracker_id]
    ent["state"] = ent["tracker"].set_region(
        ent["state"], jnp.asarray(_to_corners42(corners)))


def remove(tracker_id: int = 1) -> None:
    with _lock:
        _registry.pop(tracker_id, None)


def getTrackerIds() -> list[int]:
    return sorted(_registry)
