"""Profiling / tracing helpers (SURVEY.md section 5, tracing row — the
reference has nothing beyond @info prints; here: jax.profiler traces plus a
lightweight step-rate meter the driver can write alongside thermo output)."""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepRateMeter:
    """Walltime per simulation segment; the driver appends rows to
    ``perf.txt`` (kept separate from thermo.txt to preserve the reference's
    exact thermo format)."""

    def __init__(self, path=None, append=False):
        self.path = path
        self._last = time.perf_counter()
        if path is not None and not (append and os.path.isfile(path)):
            with open(path, "w") as f:
                f.write("# Step StepsPerSec\n")

    def tick(self, step: int, n_steps: int):
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        rate = n_steps / dt if dt > 0 else float("inf")
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(f"{step} {rate:.2f}\n")
        return rate
