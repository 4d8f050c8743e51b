"""Profiling / tracing utilities.

The reference's only instrumentation is wall-clock FPS in ``submit_kitti``
(``evaluate_stereo.py:85-89``). Here:

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (device + host timelines, HLO ops).
- :class:`StepTimer` — lightweight rolling wall-clock timer for steady-state
  step times (skips warmup/compile steps).
- :func:`device_memory_stats` — per-device live-buffer statistics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer. ``skip`` initial steps are excluded (compile)."""

    def __init__(self, skip: int = 2, window: int = 100):
        self.skip = skip
        self.window = window
        self._times = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self):
        now = time.time()
        if self._last is not None:
            self._count += 1
            if self._count > self.skip:
                self._times.append(now - self._last)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    @property
    def steps_per_second(self) -> float:
        m = self.mean_step_seconds
        return 1.0 / m if m == m and m > 0 else float("nan")


def device_memory_stats() -> Dict[str, Dict]:
    """Live-buffer memory per device (bytes in use / peak where available)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        out[str(d)] = stats or {}
    return out
