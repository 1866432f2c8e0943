"""Profiling & debugging utilities.

Rebuild of the reference's tracing/anomaly surface (SURVEY.md §5):
  * torch.profiler chrome traces (training_loop.py:463-473, 525-538)
    -> `jax.profiler.trace` Perfetto traces via `profile_trace`;
  * trainer/timer.py `Timer` (cuda-synchronized wall timers)
    -> `Timer` with `jax.block_until_ready`;
  * `detect_anomaly` (experiment.py:181-184) -> `enable_anomaly_detection`
    (jax_debug_nans).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a Perfetto/TensorBoard trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SteadyStateProfiler:
    """Bounded Perfetto capture of steady-state train dispatches.

    The first dispatch (the compile step) is excluded: tracing XLA
    compilation both inflates the trace by orders of magnitude and slows the
    compile itself. The reference's torch.profiler likewise wraps single
    fwd/bwd passes, not the whole epoch (training_loop.py:463-473,525-538).
    Capture starts before dispatch 1 and stops after `n_steps` traced
    dispatches (or at epoch end). A single-dispatch epoch still produces a
    trace: `finish` captures the final device sync so `profile=true` never
    yields an empty trace dir.
    """

    def __init__(self, log_dir: str, n_steps: int = 3):
        self.log_dir = log_dir
        self.n_steps = max(1, n_steps)
        self._active = False
        self._done = False

    def before_dispatch(self, it: int) -> None:
        if it == 1 and not self._done:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def after_dispatch(self, it: int, sync_value) -> None:
        if self._active and it >= self.n_steps:
            jax.block_until_ready(sync_value)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def finish(self, sync_value) -> None:
        if self._active:
            jax.block_until_ready(sync_value)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
        elif not self._done:
            # epoch had a single dispatch — trace its completion so the
            # configured trace dir is never empty
            with profile_trace(self.log_dir):
                jax.block_until_ready(sync_value)
            self._done = True


def enable_anomaly_detection(enabled: bool = True):
    """NaN-propagation checks inside jit (reference `detect_anomaly`)."""
    jax.config.update("jax_debug_nans", enabled)


class Timer:
    """Accumulating named wall timer; blocks on device work when `sync`
    (trainer/timer.py:12-71 equivalent)."""

    _accum: Dict[str, float] = defaultdict(float)
    _count: Dict[str, int] = defaultdict(int)

    def __init__(self, name: str = "timer", quiet: bool = True, sync_value=None):
        self.name = name
        self.quiet = quiet
        self.sync_value = sync_value

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_value is not None:
            jax.block_until_ready(self.sync_value)
        dt = time.perf_counter() - self._t0
        Timer._accum[self.name] += dt
        Timer._count[self.name] += 1
        if not self.quiet:
            print(f"[{self.name}] {dt * 1000:.2f} ms")
        return False

    @classmethod
    def averages(cls) -> Dict[str, float]:
        return {k: cls._accum[k] / max(cls._count[k], 1) for k in cls._accum}

    @classmethod
    def reset(cls):
        cls._accum.clear()
        cls._count.clear()
