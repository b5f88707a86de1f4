"""TrackerFleet: B independent trackers as one sharded batched update.

The TPU-native replacement for the reference's per-tracker loops — the
multi-object loop in runMTF (`Examples/cpp/runMTF.cc:704` per tracker), the
TBB `parallel_for` over grid sub-trackers (`SM/src/GridTracker.cc:248-261`),
and ParallelTracker's sequential "ensemble" (`mtf.h:826-840`). All tracker
state is a pytree and `update` is pure, so a fleet is
`vmap(update)` sharded over mesh axis `tracker`:

    fleet = TrackerFleet(create_tracker("esm", "ncc", "8"), mesh)
    states = fleet.initialize(frame0, corners_batch)   # (B, ...) pytree
    states = fleet.update(states, frame)               # one jitted step

Every tracker runs the same program (same SM×AM×SSM, same static config);
heterogeneous ensembles compose multiple fleets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


class TrackerFleet:
    """Data-parallel fleet of one tracker program over mesh axis `axis`."""

    def __init__(self, sm, mesh: Mesh | None = None, axis: str = "tracker",
                 donate: bool = False):
        """`donate`: donate the state buffers on `update` (steady-state
        serving: +2-5% fps at B=1024, log/ab_dispatch_r4.log, from
        reduced allocation churn). Leave False for protocols that reuse
        the pre-update states (reinit/reset, run_mtf fleet mode) — a
        donated input buffer is invalidated by the call."""
        self.sm = sm
        self.mesh = mesh
        self.axis = axis
        self.donate = donate
        self._upd = None
        self._upd_multi = None

    # -- sharding helpers ----------------------------------------------
    def _shard_batch(self, tree):
        """Place a (B, ...) pytree on the mesh, batch axis sharded."""
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, P(self.axis))
        return jax.device_put(tree, sh)

    def _replicate(self, x):
        if self.mesh is None:
            return x
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    # -- public API -----------------------------------------------------
    def initialize(self, frame: Array, corners_batch: Array):
        """corners_batch: (B, 4, 2). One shared init frame (multi-object)."""
        init = jax.jit(jax.vmap(self.sm.initialize, in_axes=(None, 0)))
        states = init(jnp.asarray(frame), jnp.asarray(corners_batch))
        return self._shard_batch(states)

    def update(self, states, frame: Array):
        """One fleet step on a shared frame (multi-object tracking)."""
        if self._upd is None:
            fn = jax.vmap(self.sm.update, in_axes=(0, None))
            don = (0,) if self.donate else ()
            if self.mesh is None:
                self._upd = jax.jit(fn, donate_argnums=don)
            else:
                self._upd = jax.jit(
                    fn, donate_argnums=don,
                    in_shardings=(NamedSharding(self.mesh, P(self.axis)),
                                  NamedSharding(self.mesh, P())),
                    out_shardings=NamedSharding(self.mesh, P(self.axis)))
        return self._upd(states, self._replicate(jnp.asarray(frame)))

    # NOTE: a multi-frame single-dispatch `update_chunk` (K statically
    # unrolled steps per dispatch) was carried r2-r3 and DELETED in r4:
    # the same-session A/B at B=1024 (log/ab_chunk_r4.log) measured eager
    # per-frame dispatch >= chunked at every K (56.0k vs 55.3k/54.7k/
    # 54.3k fps at K=2/4/8) — async dispatch already pipelines the fleet
    # update, so chunking only added latency and an erratic reading.
    # Batch-over-frames serving lives in `track_sequence` (device-
    # resident stacks); per-frame serving uses `update`.

    def update_multi(self, states, frames: Array):
        """One fleet step, per-tracker frames (B, H, W[, C]) — independent
        streams (the pyMTF2 many-streams scenario, TrackerStrct_mt.h)."""
        if self._upd_multi is None:
            fn = jax.vmap(self.sm.update, in_axes=(0, 0))
            if self.mesh is None:
                self._upd_multi = jax.jit(fn)
            else:
                sh = NamedSharding(self.mesh, P(self.axis))
                self._upd_multi = jax.jit(
                    fn, in_shardings=(sh, sh), out_shardings=sh)
        return self._upd_multi(states, self._shard_batch(jnp.asarray(frames)))

    def corners(self, states) -> Array:
        """(B, 2, 4) corner matrices."""
        return jax.vmap(self.sm.corners)(states)

    def track_sequence(self, states, frames: Array):
        """Scan the whole fleet over a device-resident frame stack
        (T, H, W[, C]) shared by all trackers — ONE dispatch for B x T
        tracker-updates. Returns (final_states, corners (T, B, 2, 4))."""
        from mtf_tpu.sm.core import image_corners

        def step(sts, frame):
            new = jax.vmap(self.sm.update, in_axes=(0, None))(sts, frame)
            cs = jax.vmap(
                lambda s: image_corners(self.sm.ssm, s).T)(new)
            return new, cs

        fn = lambda s, f: jax.lax.scan(step, s, f)  # noqa: E731
        if self.mesh is None:
            return jax.jit(fn)(states, jnp.asarray(frames))
        sh = NamedSharding(self.mesh, P(self.axis))
        repl = NamedSharding(self.mesh, P())
        jfn = jax.jit(fn, in_shardings=(sh, repl),
                      out_shardings=(sh, NamedSharding(
                          self.mesh, P(None, self.axis))))
        return jfn(states, self._replicate(jnp.asarray(frames)))
