"""Multi-host (DCN) scene-level parallelism.

The reference's only scene-level parallelism is a CPU process pool for
fusion (/root/reference/runner.py:406-432). Scenes are embarrassingly
parallel — no cross-scene state — so on a multi-host TPU deployment
each host process simply takes a disjoint slice of the scan list and
runs the full per-scene pipeline (MVS cascade + VolSDF optimization +
fusion) on its local chips. No collectives cross DCN; the only
"communication" is the shared filesystem the PFM/PLY outputs land on.

Single-process runs (tests, one v5e) degrade to the identity partition.
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor
from typing import Callable, List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def partition_scenes(testlist: Sequence[T],
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> List[T]:
    """Round-robin slice of the scan list owned by this host process.

    Round-robin (rather than contiguous blocks) balances load when
    scan difficulty correlates with list position. The union over all
    processes is exactly `testlist`; slices are disjoint.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(testlist[pi::pc])


def map_scenes_host_pool(fn: Callable[[T], object], scenes: Sequence[T],
                         num_workers: int = 1) -> List[object]:
    """Host-side process pool over scenes for CPU work (fusion, mesh
    sampling) — the role of the reference's mp.Pool
    (runner.py:420-432). `fn` must be picklable (module-level).
    Serial when num_workers <= 1 (our vectorized-numpy fusion usually
    beats fork overhead)."""
    scenes = list(scenes)
    if num_workers <= 1 or len(scenes) <= 1:
        return [fn(s) for s in scenes]
    with ProcessPoolExecutor(max_workers=num_workers) as pool:
        return list(pool.map(fn, scenes))
