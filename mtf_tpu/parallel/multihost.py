"""Multi-host orchestration: jax.distributed init + scaling measurement.

SURVEY.md §5.8: the reference has no distributed backend; here multi-host
runs use `jax.distributed` (DCN) + the same mesh/shard_map code paths that
single-host tests exercise on virtual devices. BASELINE.md's scaling
metric (frames/s efficiency at 1 chip / 1 host / N hosts) is produced by
`measure_fleet_scaling`.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize multi-host JAX (no-op when single-process).

    Call before building meshes. Returns the local process index.
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index()


def measure_fleet_scaling(sm, frame, corners_fn, widths=(1, 2, 4, 8),
                          trackers_per_device: int = 32,
                          steps: int = 10,
                          fixed_total: int | None = None) -> dict:
    """Throughput vs mesh width for a tracker fleet.

    `corners_fn(i) -> (4, 2)` supplies per-tracker init regions. Returns
    {n_devices: fps} plus `efficiency` relative to the 1-device run —
    the BASELINE.md scaling-efficiency measurement.

    Two protocols:
    - weak scaling (default): B = trackers_per_device * n, ideal keeps
      fps/device constant — the real multi-chip measurement.
    - strong scaling (`fixed_total=B`): the SAME B trackers sharded over
      more devices; efficiency = fps_n / fps_1. This is the protocol
      that stays meaningful on VIRTUAL devices sharing one host's cores
      (weak scaling there only measures host-core contention — more
      virtual devices never add compute).
    """
    from mtf_tpu.parallel import TrackerFleet, make_mesh

    results = {}
    devices = jax.devices()
    for n in widths:
        if n > len(devices):
            break
        mesh = make_mesh({"tracker": n}, devices=devices[:n])
        B = fixed_total if fixed_total else trackers_per_device * n
        if B % n != 0:
            continue
        corners = np.stack([np.asarray(corners_fn(i), np.float32)
                            for i in range(B)])
        fleet = TrackerFleet(sm, mesh)
        states = fleet.initialize(frame, corners)
        states = fleet.update(states, frame)  # compile
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        for _ in range(steps):
            states = fleet.update(states, frame)
        jax.block_until_ready(states)
        dt = time.perf_counter() - t0
        results[n] = B * steps / dt
    base = results.get(widths[0])
    if not base:
        return {"fps": results, "efficiency": {}}
    if fixed_total:
        eff = {n: fps / base for n, fps in results.items()}
    else:
        eff = {n: (fps / n) / (base / widths[0])
               for n, fps in results.items()}
    return {"fps": results, "efficiency": eff}
