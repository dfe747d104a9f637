"""Per-phase wall-clock timers and jax.profiler hooks.

The reference logged three phase timings with datetime deltas
(forward_pass.py:291-297, 334-336, 667-669); the same labels are kept here so
logs stay comparable:

    "Features computation"
    "Per-pixel depth estimation"
    "Message passing"
"""
import contextlib
import time


class PhaseTimer:
    """Accumulating named timers with the reference's print format."""

    def __init__(self, verbose=True):
        self.totals = {}
        self.counts = {}
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, label):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.add(label, dt)
        if self.verbose:
            print("%s - %s" % (label, dt))

    def add(self, label, dt):
        """Record an externally measured duration (profile-sync paths
        time around explicit device syncs rather than a context)."""
        self.totals[label] = self.totals.get(label, 0.0) + dt
        self.counts[label] = self.counts.get(label, 0) + 1

    def summary(self):
        return {
            k: {"total_s": v, "count": self.counts[k]}
            for k, v in self.totals.items()
        }


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
