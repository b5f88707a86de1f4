"""Nearest-neighbour search method.

TPU-native re-design of the reference NN/GNN SMs (`SM/src/NN.cc` 417,
`NT/NN.cc` 280, `GNN.cc` 478 + FLANN index machinery): an offline dataset
of SSM-perturbed template views is searched per frame for the best-matching
appearance, and the stored perturbation is applied compositionally
(SURVEY.md §3.4).

Design: the FLANN/GNN graph indices are CPU-cache optimizations; on TPU a
brute-force distance computation is one (K, D) x (D,) MXU matmul and beats
graph traversal while keeping exact-NN semantics. Dataset generation is a
single vmapped warp+gather over all K samples. Index save/load (reference
NNParams.h:35-37) is plain array serialization of the extra pytree.

GNN semantics (reference `GNN.h:31-80` greedy kNN-graph descent) are kept
as an option (`use_gnn`, factory keys `gnn`/`fgnn`): the graph build is a
blocked (K, K) distance matmul + `top_k` (replacing the reference's
O(K^2 D) scalar loops, `GNN.cc buildGraph`), and the query-time greedy
descent is a `lax.while_loop` over gathered neighbor rows — sub-linear in
K like the original, useful for the nn100k-scale datasets where the
brute-force scan's K*D matmul stops being free.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mtf_tpu.ops import interp
from mtf_tpu.ops import warp as W
from mtf_tpu.sm.core import SearchMethod, TrackerState

Array = jax.Array


@dataclass(frozen=True)
class NNParams:
    """Reference NNParams.h / FLANNParams.h analog."""
    n_samples: int = 1000
    max_iters: int = 3
    pix_sigma: float = 4.0
    ssm_sigma: tuple = ()      # explicit per-dof sigmas (overrides pix_sigma)
    epsilon: float = 0.01      # corner-change convergence threshold
    add_samples_gap: int = 0   # frames between online dataset updates;
                               # 0 disables (NNParams.h:29-33)
    n_samples_to_add: int = 8  # ring-replaced per update (oldest evicted,
                               # keeping the dataset at n_samples)
    dist_feat: str = "am"      # "am" = the AM's distance-feature space
                               # (updateDistFeat, AppearanceModel.h:263)
                               # | "raw" = flattened raw patch (L2/SSD
                               # distance for the SEARCH stage only —
                               # the refiner cascade keeps the AM). For
                               # histogram-space AMs (MI: 625 px x
                               # n_bins floats per sample) "raw" cuts
                               # dataset memory n_bins-fold, lifting
                               # the fleet-width HBM cap.
    use_gnn: bool = False      # greedy kNN-graph descent (GNN.h:31-80)
    gnn_k: int = 10            # neighbors per graph node
    gnn_max_steps: int = 32    # descent-step cap (graph diameter bound)
    seed: int = 0


class NNState(NamedTuple):
    feats: Array     # (K, D) dataset distance-features
    feats_sq: Array  # (K,) cached squared norms
    dps: Array       # (K, S) stored perturbations
    ptr: Array       # () int32 ring pointer for online sample addition
    frame_idx: Array  # () int32 frames since initialize
    key: Array       # online-sampling PRNG
    graph: Array | None = None  # (K, gnn_k) int32 kNN graph (GNN mode)


def build_knn_graph(feats: Array, feats_sq: Array, k: int,
                    block: int = 256) -> Array:
    """kNN graph over the dataset: blocked (K, K) distance matmul +
    top_k per row (reference GNN::buildGraph, GNN.cc — there an
    O(K^2 D) scalar double loop)."""
    K = feats.shape[0]

    def row_block(args):
        f_blk, fsq_blk = args           # (B, D), (B,)
        d = (fsq_blk[:, None] - 2.0 * (f_blk @ feats.T)
             + feats_sq[None, :])       # (B, K)
        # a node is not its own neighbor: top_k on the negated distance
        # after masking the diagonal handled by caller via +inf trick is
        # awkward blockwise — instead take k+1 and drop self below.
        _, idx = jax.lax.top_k(-d, k + 1)
        return idx                      # (B, k+1)

    n_blk = -(-K // block)
    pad = n_blk * block - K
    f_p = jnp.pad(feats, ((0, pad), (0, 0)))
    fsq_p = jnp.pad(feats_sq, (0, pad))
    idx = jax.lax.map(row_block,
                      (f_p.reshape(n_blk, block, -1),
                       fsq_p.reshape(n_blk, block)))
    idx = idx.reshape(n_blk * block, k + 1)[:K]
    # drop self-matches: where the first hit is the row itself, shift left
    rows = jnp.arange(K)[:, None]
    is_self = idx == rows               # (K, k+1)
    # stable compaction: order non-self entries first, keep k of them
    order = jnp.argsort(is_self, axis=1, stable=True)
    idx = jnp.take_along_axis(idx, order[:, :k], axis=1)
    return idx.astype(jnp.int32)


class NN(SearchMethod):
    name = "nn"

    def __init__(self, am, ssm, prm=None, nn: NNParams | None = None):
        super().__init__(am, ssm, prm)
        self.nn = nn or NNParams()

    def _sigma(self, region) -> Array:
        if self.nn.ssm_sigma:
            return jnp.asarray(self.nn.ssm_sigma, jnp.float32)
        scale = region.norm_mat[0, 0]
        return self.ssm.state_sigma_from_pixel_sigma(
            self.nn.pix_sigma / scale, region.base_pts)

    def _patch_at(self, region, s, frame):
        pts_t = self.ssm.warp_pts(s, region.base_pts)
        pts = W.apply_warp(region.norm_mat, pts_t)
        if self.prm.interp.endswith("_mm") and frame.ndim == 2:
            # dense-matmul sampling MUST be crop-windowed here: the
            # dataset build maps this over K samples x fleet vmap, and
            # full-frame tap weights OOM at (B, chunk, N, H) scale
            val, _ = interp.sample_dense(
                frame, pts, self.prm.interp[:-3],
                crop=self.prm.crop or 192, need_grad=False)
            return val
        return interp.sample(frame, pts, self.prm.interp, self.prm.border)

    def _dist_feat(self, patch):
        if self.nn.dist_feat == "raw":
            return patch.reshape(-1)
        return self.am.dist_feat(patch)

    def _feat_at(self, region, s, frame):
        return self._dist_feat(self._patch_at(region, s, frame))

    def _draw_dps(self, state: TrackerState) -> Array:
        """The (K, S) dataset perturbation draw (identical in NN and
        ShardedNN — both slice/shard around the same replicated draw)."""
        K = self.nn.n_samples
        sigma = self._sigma(state.region)
        key = jax.random.PRNGKey(self.nn.seed)
        dps = sigma[None, :] * jax.random.normal(
            key, (K, self.ssm.dof), jnp.float32)
        # sample 0 is the identity so a perfect match stays put
        return dps.at[0].set(0.0)

    def _init_extra(self, state: TrackerState, frame: Array):
        """Dataset generation: one vmapped warp+gather over K samples
        (reference NN::generateDataset, NN.cc:131)."""
        K = self.nn.n_samples
        dps = self._draw_dps(state)

        # bounded memory: smaller chunks for the dense-mm path whose
        # per-sample crop windows still multiply under a fleet vmap
        bs = 64 if self.prm.interp.endswith("_mm") else 256
        feats = jax.lax.map(
            lambda dp: self._feat_at(state.region, dp, frame), dps,
            batch_size=min(K, bs))
        # if the current patch matches the template viewed under dp, the
        # state correction is dp^-1 (reference inverts the perturbations at
        # dataset build, NN.cc generateDataset) — store the inverses
        dps_inv = jax.vmap(self.ssm.invert)(dps)
        feats_sq = jnp.sum(feats * feats, axis=-1)
        graph = (build_knn_graph(feats, feats_sq, min(self.nn.gnn_k, K - 1))
                 if self.nn.use_gnn else None)
        return NNState(feats=feats,
                       feats_sq=feats_sq,
                       dps=dps_inv,
                       ptr=jnp.zeros((), jnp.int32),
                       frame_idx=jnp.zeros((), jnp.int32),
                       key=jax.random.PRNGKey(self.nn.seed + 1),
                       graph=graph)

    def _best_idx(self, ns: NNState, q: Array) -> Array:
        """Index of the nearest dataset sample to query feature `q` —
        the per-frame search step. ShardedNN overrides this with a
        per-shard argmin + all_gather over the mesh."""
        nn = self.nn

        def graph_descent(q):
            """Greedy kNN-graph descent (reference GNN::searchGraph,
            GNN.h:42): from the identity node, repeatedly hop to the
            closest neighbor until no neighbor improves."""
            def dist_at(i):
                return ns.feats_sq[i] - 2.0 * jnp.dot(ns.feats[i], q)

            def step(carry):
                cur, d_cur, _, it = carry
                neigh = ns.graph[cur]                       # (k,)
                d_n = (ns.feats_sq[neigh]
                       - 2.0 * (ns.feats[neigh] @ q))       # (k,)
                j = jnp.argmin(d_n)
                better = d_n[j] < d_cur
                return (jnp.where(better, neigh[j], cur),
                        jnp.where(better, d_n[j], d_cur),
                        jnp.logical_not(better), it + 1)

            def go(carry):
                _, _, stop, it = carry
                return jnp.logical_and(it < nn.gnn_max_steps,
                                       jnp.logical_not(stop))

            start = jnp.zeros((), jnp.int32)
            best, _, _, _ = jax.lax.while_loop(
                go, step, (start, dist_at(start),
                           jnp.asarray(False), jnp.zeros((), jnp.int32)))
            return best

        if nn.use_gnn:
            return graph_descent(q)
        # L2 distances via one MXU matmul (||x||^2 - 2 x.q + const)
        scores = ns.feats_sq - 2.0 * (ns.feats @ q)
        return jnp.argmin(scores)

    def _update(self, state: TrackerState, frame: Array) -> TrackerState:
        ssm, nn = self.ssm, self.nn
        ns: NNState = state.extra

        def corners_of(s):
            c_t = ssm.warp_pts(s, state.region.base_corners)
            return W.apply_warp(state.region.norm_mat, c_t)

        def body(carry):
            s, it, done = carry
            patch = self._patch_at(state.region, s, frame)
            q = self._dist_feat(patch)
            best = self._best_idx(ns, q)
            s_new = ssm.compositional_update(s, ns.dps[best])
            change = jnp.max(jnp.linalg.norm(
                corners_of(s_new) - corners_of(s), axis=-1))
            return s_new, it + 1, change < nn.epsilon

        def cond(carry):
            _, it, done = carry
            return jnp.logical_and(it < nn.max_iters, jnp.logical_not(done))

        s_out, _, _ = jax.lax.while_loop(
            cond, body, (state.ssm_state, jnp.zeros((), jnp.int32),
                         jnp.asarray(False)))
        new_extra = ns._replace(frame_idx=ns.frame_idx + 1)
        if nn.add_samples_gap > 0:
            # online dataset update (NNParams.h:29-33): ring-replace the
            # oldest non-identity samples with fresh perturbations around
            # the converged state, featurized from the CURRENT frame
            A, K = nn.n_samples_to_add, nn.n_samples
            key, k_add = jax.random.split(ns.key)
            sigma = self._sigma(state.region)
            dp_new = sigma[None, :] * jax.random.normal(
                k_add, (A, ssm.dof), jnp.float32)

            def feat_of(dp):
                s_k = ssm.compositional_update(s_out, dp)
                return self._dist_feat(
                    self._patch_at(state.region, s_k, frame))

            f_new = jax.vmap(feat_of)(dp_new)                  # (A, D)
            dp_inv = jax.vmap(ssm.invert)(dp_new)
            idx = 1 + (ns.ptr + jnp.arange(A)) % (K - 1)       # skip id 0
            fire = (ns.frame_idx % nn.add_samples_gap) == 0
            feats = ns.feats.at[idx].set(
                jnp.where(fire, f_new, ns.feats[idx]))
            feats_sq = ns.feats_sq.at[idx].set(
                jnp.where(fire, jnp.sum(f_new * f_new, -1),
                          ns.feats_sq[idx]))
            new_extra = new_extra._replace(
                feats=feats,
                feats_sq=feats_sq,
                dps=ns.dps.at[idx].set(
                    jnp.where(fire, dp_inv, ns.dps[idx])),
                ptr=ns.ptr + jnp.where(fire, A, 0),
                key=key)
            if nn.use_gnn:
                # reconnect the replaced nodes to their kNN in the updated
                # dataset (reference FGNN::addPoints semantics; stale
                # in-edges age out as their owners are themselves replaced)
                kk = ns.graph.shape[1]
                d = (jnp.sum(f_new * f_new, -1)[:, None]
                     - 2.0 * (f_new @ feats.T) + feats_sq[None, :])
                d = jax.vmap(lambda row, i: row.at[i].set(jnp.inf))(d, idx)
                _, rows = jax.lax.top_k(-d, kk)
                new_extra = new_extra._replace(
                    graph=ns.graph.at[idx].set(
                        jnp.where(fire, rows.astype(jnp.int32),
                                  ns.graph[idx])))
        new_state = state._replace(ssm_state=s_out, extra=new_extra)
        patch = self._patch_at(state.region, s_out, frame)
        return new_state._replace(
            am_state=self.am.update_model(state.am_state, patch))

    # -- index persistence (NNParams.h:35-37 save_index/load_index;
    #    GNN.h:44-45 saveGraph/loadGraph) ------------------------------
    def save_index(self, state: TrackerState, path: str) -> None:
        """Persist the sample dataset + perturbations."""
        from mtf_tpu.utils.checkpoint import save_state
        save_state(path, state.extra)

    def load_index(self, state: TrackerState, path: str) -> TrackerState:
        """Replace the dataset with a previously saved one (skips the
        dataset-generation cost on re-init)."""
        from mtf_tpu.utils.checkpoint import load_state
        return state._replace(extra=load_state(path, state.extra))
