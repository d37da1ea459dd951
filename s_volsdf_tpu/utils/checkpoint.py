"""Checkpointing: pytree save/restore (replaces torch .pth pairs,
reference vsdf.py:128-144, 178-194).

Two backends behind one save/load API (`train.ckpt_backend`):

- ``npz`` (default): a single npz per checkpoint (flattened TrainState
  leaves) plus a small json metadata sidecar (epoch, RNG), so resume
  restores model, optimizer, epoch and iter_step exactly like the
  reference (vsdf.py:104-111). Chosen as the default deliberately:
  per-scene states are ~2 MB, saves are synchronous and off the hot
  path, and the flat format has zero dependency surface.
- ``orbax``: the same TrainState through orbax's StandardCheckpointer
  (SURVEY.md section 7 step 7). What it buys over npz: atomic
  directory commits (a kill mid-save can never leave a torn "latest"
  — npz relies on the write being fast), named leaves instead of
  positional ``leaf_<i>`` (schema evolution), multi-host coordination
  when every process must agree a step is durable, and restore of
  sharded ``jax.Array`` trees without host round-trips at large
  scale. The json meta sidecar is shared by both backends.

Loads auto-detect the backend from the files present, so a run may
switch backends between restarts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_ORBAX_SUBDIR = "orbax"


def _flatten(state) -> Dict[str, np.ndarray]:
    leaves, _ = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}


def save_state(path: str, state: Any, *, backend: str = "npz",
               **meta) -> None:
    os.makedirs(path, exist_ok=True)
    if backend == "orbax":
        _orbax_save(os.path.join(os.path.abspath(path), _ORBAX_SUBDIR),
                    state)
    elif backend == "npz":
        np.savez(os.path.join(path, "state.npz"), **_flatten(state))
    else:
        raise ValueError(f"unknown ckpt backend {backend!r} "
                         "(expected 'npz' or 'orbax')")
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_state(path: str, template: Any,
               backend: Optional[str] = None) -> Tuple[Any, Dict]:
    """Restore into the structure of `template`. With backend=None the
    format is detected from the files present (a run may switch
    `train.ckpt_backend` between restarts)."""
    npz_path = os.path.join(path, "state.npz")
    if backend is None:
        backend = "npz" if os.path.exists(npz_path) else "orbax"
    if backend == "orbax":
        state = _orbax_restore(
            os.path.join(os.path.abspath(path), _ORBAX_SUBDIR), template)
    else:
        data = np.load(npz_path)
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


def _orbax_save(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        # force: "latest" is overwritten every checkpoint_freq steps;
        # orbax stages into a tmp dir and commits by atomic rename, so
        # a kill mid-save leaves the previous checkpoint intact.
        ckptr.save(path, _np_tree(state), force=True)


def _orbax_restore(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target=_np_tree(template))
    # Match the npz backend's contract: host numpy leaves, caller's
    # tree structure (trainers re-place onto devices/meshes).
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = jax.tree_util.tree_leaves(restored)
    for old, new in zip(leaves, new_leaves):
        if np.shape(old) != np.shape(new):
            raise ValueError(
                f"checkpoint shape mismatch: {np.shape(new)} vs "
                f"{np.shape(old)}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _np_tree(state: Any) -> Any:
    """Host-numpy copy of a pytree (orbax handles jax.Array natively,
    but fetching up front keeps save/restore symmetric with npz and
    independent of device state)."""
    return jax.tree.map(np.asarray, state)
