"""Profiling / tracing helpers.

The reference has no profiling support (SURVEY.md §5.1 — only wall-clock
level times in interactive logs).  Here tracing is first-class: a
``jax.profiler`` trace context usable around any train/bench section, plus
a simple phase timer whose results land in the metrics stream.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax.profiler trace (view with tensorboard or xprof):

        with profiling.trace("/tmp/trace"):
            train_batch(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocking on device results
    is the caller's job (pass block=True to time through a sync)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name, result=None, block=False):
        t0 = time.perf_counter()
        yield
        if block and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {name: {"total_s": round(total, 4),
                       "mean_ms": round(1e3 * total / self.counts[name], 3),
                       "count": self.counts[name]}
                for name, total in sorted(self.totals.items())}
