"""Step timing and profiling.

The reference only records coarse wall-clock spans around epochs
(src/pdp/factorgraph/base.py:356-364). Here timing is first-class: a
`StepTimer` accumulates per-phase wall times with device synchronisation, and
`trace()` wraps a block in a jax.profiler trace for TensorBoard/Perfetto.
"""

import contextlib
import time
from collections import defaultdict

import jax


class StepTimer:
    """Accumulates wall time per named phase; `block=True` syncs the device
    so jitted async dispatch does not hide compute in the next phase."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def rate(self, name, units):
        """units processed per second in the named phase."""
        t = self.totals.get(name, 0.0)
        return units / t if t > 0 else float("inf")

    def summary(self):
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_ms": round(1e3 * self.totals[name]
                                        / max(self.counts[name], 1), 3)}
                for name in sorted(self.totals)}


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
