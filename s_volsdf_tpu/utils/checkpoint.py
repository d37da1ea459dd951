"""Checkpointing: pytree save/restore (replaces torch .pth pairs,
reference vsdf.py:128-144, 178-194).

Format: a single npz per checkpoint (flattened TrainState leaves:
params, optimizer state, iter counter) plus a small json metadata
sidecar (epoch), so resume restores model, optimizer, epoch and
iter_step exactly like the reference (vsdf.py:104-111). npz is chosen
deliberately over orbax: per-scene states are ~2 MB, saves are
synchronous and off the hot path, and the flat format has zero
dependency surface — async/sharded checkpointing buys nothing here.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(state) -> Dict[str, np.ndarray]:
    leaves, _ = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}


def save_state(path: str, state: Any, **meta) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "state.npz"), **_flatten(state))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_state(path: str, template: Any) -> Tuple[Any, Dict]:
    """Restore into the structure of `template`."""
    data = np.load(os.path.join(path, "state.npz"))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for old, new in zip(leaves, new_leaves):
        if np.shape(old) != np.shape(new):
            raise ValueError(
                f"checkpoint shape mismatch: {np.shape(new)} vs "
                f"{np.shape(old)}")
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
