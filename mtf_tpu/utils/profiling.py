"""Profiling: event-taxonomy timers + XLA trace hooks.

Re-designs the reference's macro profiler (`Macros/common.h:73-114`:
`init_timer/record_event` interleaved through SM hot loops, writing
per-event wall times to `log/mtf_<sm>_times.txt`). Device work is jitted
here, so the split is:

  * `Profiler` — host-side event timing with the same label taxonomy and
    artifact format (per-label mean/total written to log/);
  * `trace(...)` — context manager around `jax.profiler.trace` for device
    timelines (the XLA/TPU analog of per-stage timing; stages show up as
    `jax.named_scope` annotations);
  * `annotate(label)` — alias of jax.named_scope for kernels/SM stages.
"""
from __future__ import annotations

import contextlib
import os
import time

import jax

annotate = jax.named_scope


class Profiler:
    """Host-side event profiler (init_timer/record_event analog)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.events: dict[str, list[float]] = {}
        self._t0 = time.perf_counter()

    def init_timer(self):
        self._t0 = time.perf_counter()

    def record_event(self, label: str):
        if not self.enabled:
            return
        t = time.perf_counter()
        self.events.setdefault(label, []).append(t - self._t0)
        self._t0 = t

    @contextlib.contextmanager
    def section(self, label: str, sync=None):
        """Timed block; pass `sync=result` pytree to include device time
        (block_until_ready) rather than dispatch time."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.events.setdefault(label, []).append(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {k: {"n": len(v), "total_s": sum(v),
                    "mean_ms": 1e3 * sum(v) / max(len(v), 1)}
                for k, v in self.events.items()}

    def write(self, path: str = "log/times.txt"):
        """Reference artifact format: one line per event label."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            for k, s in sorted(self.summary().items()):
                f.write(f"{k} n={s['n']} total={s['total_s']:.6f}s "
                        f"mean={s['mean_ms']:.3f}ms\n")
        return path


@contextlib.contextmanager
def trace(log_dir: str = "log/jax_trace"):
    """Device-timeline trace (open with TensorBoard / xprof)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
