"""Profiling / timing utilities.

The reference has no first-class tracing subsystem (SURVEY §5): NVTX ranges
and perf_counter+synchronize timers in ``benchmarks/inference.py:46-107``.
Here: a ``jax.profiler`` trace context (viewable in TensorBoard/Perfetto)
and a steps/sec + ms/step reporter matching the benchmark tables.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (xplane/Perfetto format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """ms/step + steps/sec reporter (reference ``benchmarks/inference.py``:
    mean over timed iterations after warmup)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._times = []
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._count += 1
        if self._count > self.warmup:
            self._times.append(time.perf_counter() - self._t0)
        return False

    @property
    def ms_per_step(self):
        return 1000.0 * sum(self._times) / max(len(self._times), 1)

    @property
    def steps_per_sec(self):
        total = sum(self._times)
        return len(self._times) / total if total else float("inf")

    def report(self, label: str = ""):
        return (
            f"{label}: {self.ms_per_step:.3f} ms/step "
            f"({self.steps_per_sec:.2f} steps/s, n={len(self._times)})"
        )


def time_fn(fn, *args, iters: int = 20, warmup: int = 3):
    """Block-until-ready timing of a jitted callable."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0
