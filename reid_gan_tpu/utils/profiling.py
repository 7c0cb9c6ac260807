"""Tracing / profiling hooks (SURVEY.md §5.1 — the reference only has
wall-clock meters; here we add proper device tracing).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (inspect with xprof / tensorboard-profile).
- :class:`StepTimer` — wall-clock step meter matching the reference's
  ``Time x.xxx (x.xxx)`` log lines, plus a throughput summary.
- :func:`annotate` — named TraceAnnotation for host-side phases so clustering
  / IO phases show up in traces.
"""

import contextlib
import time

import jax

from .meters import AverageMeter


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region for host phases inside a device trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, items_per_step=None):
        self.meter = AverageMeter()
        self.items = items_per_step
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.meter.update(now - self._last)
        self._last = now

    @property
    def avg(self):
        return self.meter.avg

    def throughput(self):
        if not self.items or self.meter.avg == 0:
            return 0.0
        return self.items / self.meter.avg
