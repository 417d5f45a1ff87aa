"""Profiling/observability hooks.

The reference has no tracing at all (SURVEY.md section 5: only tqdm bars);
here every trainer can emit XLA traces and per-step throughput:

  * set `profile_dir` in the YAML config to capture a `jax.profiler` trace
    of steps [profile_start, profile_start + profile_steps) viewable in
    TensorBoard / Perfetto;
  * `StepTimer` tracks wall-clock steps/s and rays/s between log points and
    the trainers publish them as Train/StepsPerSec / Train/RaysPerSec.
"""

from __future__ import annotations

import time
from typing import Optional


class TraceCapture:
    """Capture an XLA profiler trace for a window of training steps."""

    def __init__(self, cfg: dict):
        self.dir: Optional[str] = cfg.get("profile_dir")
        self.start = cfg.get("profile_start", 10)
        self.steps = cfg.get("profile_steps", 5)
        self._active = False

    def step(self, step: int) -> None:
        if self.dir is None:
            return
        import jax
        if not self._active and step == self.start:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif self._active and step >= self.start + self.steps:
            jax.profiler.stop_trace()
            self._active = False
            print(f">>> profiler trace written to {self.dir}")

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Wall-clock throughput between log points."""

    def __init__(self, batch_size: int = 0):
        self.batch_size = batch_size
        self._t = time.perf_counter()
        self._step = 0

    def rate(self, step: int) -> tuple:
        """Returns (steps_per_sec, rays_per_sec) since the last call."""
        now = time.perf_counter()
        dsteps = step - self._step
        dt = max(now - self._t, 1e-9)
        self._t = now
        self._step = step
        sps = dsteps / dt
        return sps, sps * self.batch_size
