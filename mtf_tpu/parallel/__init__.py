"""Sharding layer: device-mesh parallelism for trackers, particles, pixels.

The reference is single-process CPU with token TBB/OpenMP loops that its own
ReadMe reports never scaled (ReadMe.md:128-130; SURVEY.md §2.6). This layer
is the TPU-native replacement: jax.sharding meshes + shard_map with XLA
collectives over ICI.

Axes (SURVEY.md §2.6 mapping):
    tracker  -- data-parallel over independent trackers / multi-object sets
    particle -- PF particle & NN sample populations (collective resampling)
    pixel    -- intra-patch sharding of gather + J^T J reductions (psum)
"""
from mtf_tpu.parallel.mesh import make_mesh, tracker_sharding
from mtf_tpu.parallel.fleet import TrackerFleet
from mtf_tpu.parallel.pf_shard import ShardedPF
from mtf_tpu.parallel.nn_shard import ShardedNN
from mtf_tpu.parallel.grid_shard import ShardedGridTracker
from mtf_tpu.parallel.patch_shard import sharded_gn_step

__all__ = [
    "make_mesh", "tracker_sharding", "TrackerFleet", "ShardedPF",
    "ShardedNN", "ShardedGridTracker", "sharded_gn_step",
]
