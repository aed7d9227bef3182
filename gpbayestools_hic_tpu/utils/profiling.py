"""Lightweight tracing/profiling helpers.

The reference has no tracing at all (SURVEY.md section 5); this adds the
TPU-native equivalents: wall-clock step timers that force device completion,
and a thin wrapper over ``jax.profiler`` for capturing device traces.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def timed(label: str):
    """Time a block; set ``t["result"]`` inside to block on a pytree of
    device arrays before the clock stops, so async dispatch doesn't lie::

        with timed("gp predict") as t:
            t["result"] = predict_fn(state, x)

    (An eagerly-evaluated ``result=`` parameter could never see work
    created inside the block -- the value would have to exist before the
    ``with`` statement ran.)  ``t["seconds"]`` holds the elapsed wall
    time after the block exits."""
    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        if out.get("result") is not None:
            jax.block_until_ready(out["result"])
        out["seconds"] = time.perf_counter() - t0
        logger.info("[timer] %s: %.3f s", label, out["seconds"])


def time_fn(fn, *args, iters: int = 10, warmup: int = 1, **kwargs) -> float:
    """Average wall time per call of a jitted function (blocks each call)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a ``jax.profiler`` trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)
