"""utils: logging counters and profiler hooks."""

import numpy as np

from jaderaytracerendering_tpu.utils import logging as ulog


def test_ray_counter():
    rc = ulog.RayCounter()
    assert rc.mrays_per_sec == 0.0
    rc.add(2_000_000, 1.0)
    rc.add(2_000_000, 1.0)
    assert rc.mrays_per_sec == 2.0


def test_timed_context(caplog):
    with ulog.timed("unit-test-block"):
        np.zeros(10).sum()


def test_profiler_trace_noop():
    with ulog.profiler_trace(None):
        pass  # no log dir -> no-op, must not raise
