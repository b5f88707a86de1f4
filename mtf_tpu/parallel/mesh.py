"""Device-mesh construction helpers.

One place decides how the chips are arranged; everything else takes a
`jax.sharding.Mesh` + axis names. Multi-host: call `jax.distributed
.initialize()` before building the mesh and these helpers see the global
device set (SURVEY.md §5.8).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh from `{axis_name: size}`; -1 = absorb remaining devices.

    Default: all devices on one `tracker` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axes:
        axes = {"tracker": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        fixed = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // max(fixed, 1)
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {n}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def tracker_sharding(mesh: Mesh, axis: str = "tracker") -> NamedSharding:
    """Sharding for a leading batch-of-trackers axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
