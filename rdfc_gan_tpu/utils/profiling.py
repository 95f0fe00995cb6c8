"""Profiling / tracing harness.

Parity + upgrade over the reference's perf tooling (SURVEY.md §5): the
reference ships only a cuda.synchronize-bracketed FPS loop
(RDF-GAN/lib/tools/main.py:318-350) and a context Timer. Here:
  * ``trace(dir)`` — jax.profiler trace context producing TensorBoard/XProf
    dumps (device + host timelines, HLO cost analysis);
  * ``fps_harness`` — the --cal_fps equivalent (block_until_ready-bracketed);
  * ``step_timer`` — rolling step-time stats for the train loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def fps_harness(forward: Callable, batches: Iterable, n_images: int = 300,
                warmup: int = 5) -> float:
    """img/s over ``n_images`` with ``warmup`` discarded calls
    (reference --cal_fps protocol; device-sync via block_until_ready)."""
    from .sync import hard_sync

    it = iter(batches)
    batch = next(it)
    for _ in range(warmup):
        hard_sync(forward(batch))
    done = 0
    t0 = time.perf_counter()
    while done < n_images:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(batches)
            batch = next(it)
        hard_sync(forward(batch))
        done += jax.tree.leaves(batch)[0].shape[0]
    return done / (time.perf_counter() - t0)


class StepTimer:
    """Rolling mean/max step time; host-side, negligible overhead."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_ms(self) -> float:
        return 1e3 * sum(self.times) / max(len(self.times), 1)

    @property
    def max_ms(self) -> float:
        return 1e3 * max(self.times) if self.times else 0.0
