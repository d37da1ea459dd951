"""Tracing / profiling utilities.

The reference has only wall-clock prints + tqdm (SURVEY.md section
5.1). Here: phase timers that log to console + TensorBoard, and an
optional jax.profiler trace capture around any phase for XLA-level
inspection (`trace_dir` -> TensorBoard profile plugin format).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from s_volsdf_tpu.utils.logging import get_logger

logger = get_logger()


class PhaseTimer:
    """Accumulates wall-clock per named phase (replaces the ad-hoc
    time.time() pairs at reference runner.py:182,212)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, trace_dir: Optional[str] = None):
        ctx = (jax.profiler.trace(trace_dir) if trace_dir
               else contextlib.nullcontext())
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        for name in sorted(self.totals):
            logger.info(
                f"phase {name}: {self.totals[name]:.2f}s total, "
                f"{self.totals[name] / max(self.counts[name], 1):.3f}s avg "
                f"x{self.counts[name]}")
        return dict(self.totals)


class TBWriter:
    """Thin tensorboardX wrapper; silently no-ops if unavailable.
    (Reference uses torch SummaryWriter, vsdf.py:122, 224-230.)"""

    def __init__(self, logdir: Optional[str]):
        self._w = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter
                self._w = SummaryWriter(logdir)
            except Exception as e:
                logger.warning(f"tensorboard unavailable: {e}")

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def image(self, tag: str, img_hwc, step: int):
        if self._w is not None:
            self._w.add_image(tag, img_hwc, step, dataformats="HWC")

    def close(self):
        if self._w is not None:
            self._w.close()
