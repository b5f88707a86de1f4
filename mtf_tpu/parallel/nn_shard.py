"""Nearest-neighbour SM with the sample dataset sharded over a mesh axis.

BASELINE milestone config #4's second half. The reference NN's cost lives
in two places (`/root/reference/SM/src/NN.cc:131` generateDataset — K
warped gathers — and the per-frame index search): both shard naturally
over the sample axis.

Design:
  * dataset generation: the (K, S) perturbation draw is replicated (it is
    a tiny RNG draw, and sharing it with the single-chip NN gives exact
    parity); each shard featurizes only its K/n_dev slice — the expensive
    warp+gather work — inside `shard_map`, leaving the (K, D) feature
    matrix sharded over the mesh with zero redistribution;
  * per-frame search: each shard computes its local L2 scores with one
    (K/n_dev, D) x (D,) MXU matmul and takes a local (dist, idx) argmin;
    the n_dev candidate pairs are `all_gather`ed (a few bytes over ICI)
    and the global argmin selected replicated. Ties resolve to the lowest
    global index, exactly like the unsharded `jnp.argmin` — sharded ==
    unsharded for the same seed (tests/test_shard_parity.py);
  * stored perturbations `dps` (K, S<=8) are replicated: the winning
    index lookup then needs no cross-shard traffic;
  * online sample additions (NNParams.h:29-33) keep the inherited
    jit-level ring-scatter: under GSPMD each shard applies only the
    updates that land in its rows.

GNN graph descent (`GNN.h:31-80`) is a pointer-chasing CPU-cache
optimization — on a sharded dataset every hop would be a cross-shard
gather, slower than the brute-force matmul it's meant to avoid — so
`use_gnn` is rejected here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtf_tpu.sm.core import TrackerState
from mtf_tpu.sm.nn import NN, NNState

Array = jax.Array


class ShardedNN(NN):
    """NN whose dataset axis is sharded over `mesh[axis]`.

    Public API identical to `NN`; `n_samples` must be divisible by the
    axis size.
    """

    def __init__(self, am, ssm, prm=None, nn=None, *,
                 mesh: Mesh, axis: str = "sample"):
        super().__init__(am, ssm, prm, nn)
        if self.nn.use_gnn:
            raise ValueError(
                "ShardedNN is brute-force exact-NN only; GNN graph descent "
                "does not shard (see module docstring)")
        if self.nn.n_samples % mesh.shape[axis] != 0:
            raise ValueError(
                f"n_samples={self.nn.n_samples} not divisible by "
                f"mesh axis {axis!r} size {mesh.shape[axis]}")
        self.mesh = mesh
        self.axis = axis

    # -- sharding layout -------------------------------------------------
    def _state_shardings(self):
        mesh, ax = self.mesh, self.axis
        part = NamedSharding(mesh, P(ax))
        repl = NamedSharding(mesh, P())

        def spec_of(state: TrackerState):
            ns = NNState(feats=part, feats_sq=part, dps=repl, ptr=repl,
                         frame_idx=repl, key=repl, graph=None)
            return TrackerState(ssm_state=repl, am_state=jax.tree.map(
                lambda _: repl, state.am_state), region=jax.tree.map(
                lambda _: repl, state.region), extra=ns)
        return spec_of

    def place(self, state: TrackerState) -> TrackerState:
        """Lay out an (un)sharded TrackerState onto the mesh."""
        return jax.device_put(state, self._state_shardings()(state))

    # -- dataset generation: featurize local slices only ------------------
    def _init_extra(self, state: TrackerState, frame: Array):
        K = self.nn.n_samples
        n_dev = self.mesh.shape[self.axis]
        K_loc = K // n_dev
        dps = self._draw_dps(state)          # replicated draw == NN's

        def shard_gen(dps_loc, frame):
            feats_loc = jax.lax.map(
                lambda dp: self._feat_at(state.region, dp, frame), dps_loc,
                batch_size=min(K_loc, 256))
            return feats_loc, jnp.sum(feats_loc * feats_loc, axis=-1)

        feats, feats_sq = jax.shard_map(
            shard_gen, mesh=self.mesh,
            in_specs=(P(self.axis), P()),
            out_specs=(P(self.axis), P(self.axis)),
            check_vma=False)(dps, frame)

        dps_inv = jax.vmap(self.ssm.invert)(dps)
        return NNState(feats=feats,
                       feats_sq=feats_sq,
                       dps=dps_inv,
                       ptr=jnp.zeros((), jnp.int32),
                       frame_idx=jnp.zeros((), jnp.int32),
                       key=jax.random.PRNGKey(self.nn.seed + 1),
                       graph=None)

    # -- search: per-shard argmin + all_gather of (dist, idx) pairs -------
    def _best_idx(self, ns: NNState, q: Array) -> Array:
        n_dev = self.mesh.shape[self.axis]
        K_loc = self.nn.n_samples // n_dev
        ax = self.axis

        def shard_search(feats, feats_sq, q):
            i = jax.lax.axis_index(ax)
            scores = feats_sq - 2.0 * (feats @ q)     # (K_loc,)
            j = jnp.argmin(scores)
            d_all = jax.lax.all_gather(scores[j], ax)            # (n_dev,)
            j_all = jax.lax.all_gather(i * K_loc + j, ax)        # (n_dev,)
            # lowest shard wins ties -> lowest global index, matching the
            # unsharded argmin exactly
            return j_all[jnp.argmin(d_all)]

        return jax.shard_map(
            shard_search, mesh=self.mesh,
            in_specs=(P(ax), P(ax), P()), out_specs=P(),
            check_vma=False)(ns.feats, ns.feats_sq, q)
