"""Structured stage logging and throughput counters.

The reference logs stage banners and a per-frame FPS line to stdout
(PathTrace.cpp:677-681, PathTrace.cu:1536-1714). This module keeps that
observable surface but adds rays/sec and Mrays/sec/chip counters and
optional jax.profiler trace capture (SURVEY §5 tracing/metrics rows).
"""

from __future__ import annotations

import contextlib
import logging as _logging
import time

logger = _logging.getLogger("jaderaytracerendering_tpu")
if not logger.handlers:
    _h = _logging.StreamHandler()
    _h.setFormatter(_logging.Formatter("[%(name)s] %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(_logging.INFO)


def stage(msg: str) -> None:
    """Stage banner (the reference's 'Model load done' style lines)."""
    logger.info(msg)


@contextlib.contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    yield
    logger.info("%s took %.3fs", name, time.perf_counter() - t0)


class RayCounter:
    """Accumulates traced-ray counts and reports Mrays/sec."""

    def __init__(self) -> None:
        self.rays = 0
        self.seconds = 0.0

    def add(self, rays: int, seconds: float) -> None:
        self.rays += rays
        self.seconds += seconds

    @property
    def mrays_per_sec(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds else 0.0


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler capture around a hot region (no-op if log_dir None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
