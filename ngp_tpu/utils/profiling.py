"""Tracing / profiling utilities (SURVEY.md §5.1 aux subsystem).

The reference brackets train()'s two phases with std::chrono ScopeGuards
(testbed.cu:170-190) exported as training_prep_ms / training_ms; we keep
those fields (train/trainer.py) and add what TPU actually offers:

 * `scope(name)` — wall-clock scope timer that forces device completion via
   jax.block_until_ready on provided arrays (plain perf_counter lies when
   dispatch is async).
 * `trace(logdir)` — jax.profiler trace context for xprof/tensorboard.
 * `annotate(name)` — TraceAnnotation passthrough for kernel-level marks.
"""

import contextlib
import time

import jax


class ScopeTimer:
    """Accumulating named wall-clock timers with explicit device sync."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def scope(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{k:32s} {self.totals[k]*1e3:10.1f} ms total  {self.counts[k]:6d} calls")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope -> view with xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)
