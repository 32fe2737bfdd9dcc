"""Timing and stage logging — `with_time` and the stage traces of the
reference harness (misc.ml:3-7; Format.ef logging in test/test.ml:28-97).

Structured per-stage timers; enable verbose stage logs with
ZUKELANG_LOG=1 or logging.getLogger("zukelang").setLevel(INFO).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("zukelang")
if os.environ.get("ZUKELANG_LOG"):
    logging.basicConfig(level=logging.INFO)
    log.setLevel(logging.INFO)


def with_time(fn, *args, **kwargs):
    """Returns (result, elapsed_seconds) — misc.ml:3-7."""
    t0 = time.perf_counter()
    res = fn(*args, **kwargs)
    return res, time.perf_counter() - t0


@contextlib.contextmanager
def stage(name: str, sink: dict = None):
    """Stage timer: `with stage("keygen", timings): ...`."""
    t0 = time.perf_counter()
    log.info("stage %s: start", name)
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        log.info("stage %s: %.3fs", name, dt)
        if sink is not None:
            sink[name] = dt


def profile_trace(path: str = "/tmp/zukelang_trace"):
    """JAX profiler trace context for kernel-level inspection (the TPU
    analog of the reference's FFT benchmark harness timing)."""
    import jax
    return jax.profiler.trace(path)
