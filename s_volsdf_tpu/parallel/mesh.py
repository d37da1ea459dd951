"""Device mesh construction for ray/scene parallelism.

The reference is single-GPU (SURVEY.md section 2.9); scale-out here is a
new capability: rays of one scene shard over the 'rays' mesh axis via
ICI, independent scenes go to independent processes/slices (replacing
the reference's mp.Pool at runner.py:420-432).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("rays",),
              devices: Optional[list] = None) -> Mesh:
    """Build a Mesh; -1 in `shape` absorbs all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    mesh_devices = np.asarray(devices[:total]).reshape(shape)
    return Mesh(mesh_devices, tuple(axis_names))


def ray_sharding(mesh: Mesh, axis: str = "rays") -> NamedSharding:
    """Shard the leading (ray) axis of a (B, N, ...) batch."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def eval_mesh(parallel_cfg, chunk: int) -> Optional[Mesh]:
    """Mesh for sharded full-image rendering, or None to stay
    single-device (also when the chunk doesn't divide — rendering
    falls back rather than erroring, unlike training which the user
    explicitly sized).

    Rendering is embarrassingly parallel over rays, so this is always
    a FLAT 1D mesh over every visible device — independent of the
    training mesh topology. Reusing the configured (possibly 2D, e.g.
    ('scene', 'rays')) training mesh and sharding over its first axis
    would leave the remaining axes redundantly recomputing identical
    shards."""
    n_dev = len(jax.devices())
    # A mesh_shape the user deliberately sized below the device count
    # also bounds eval: rendering must not run on devices the training
    # config excluded (e.g. a host sharing chips between jobs).
    shape = getattr(parallel_cfg, "mesh_shape", None)
    if shape and -1 not in shape:
        n_dev = min(n_dev, int(np.prod(shape)))
    if not getattr(parallel_cfg, "shard_eval", False) or n_dev <= 1:
        return None
    if chunk % n_dev != 0:
        return None
    return make_mesh((-1,), ("rays",), devices=jax.devices()[:n_dev])
