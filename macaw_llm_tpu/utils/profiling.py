"""Tracing / profiling / debug hooks (SURVEY §5.1-5.2).

The reference has none (SummaryWriter imported but never used,
run_clm_llms.py:99-102; DeepSpeed wall_clock_breakdown false). Here:
xprof-compatible traces via jax.profiler, a per-step timing context, and
a NaN-debug mode flag.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger("macaw.profiling")


def start_profiler_server(port: int = 9999) -> None:
    """TensorBoard-connectable live profiling endpoint."""
    jax.profiler.start_server(port)
    logger.info("jax profiler server on :%d", port)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace for the enclosed block
    (view with tensorboard --logdir)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(name: str, sink: Optional[dict] = None) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = dt
        else:
            logger.info("%s: %.3fs", name, dt)


def enable_nan_debugging() -> None:
    """jax_debug_nans: fail fast at the op producing a NaN — the functional
    answer to torch anomaly detection (SURVEY §5.2)."""
    jax.config.update("jax_debug_nans", True)


def annotate(name: str):
    """Named region for traces: with annotate('prefill'): ..."""
    return jax.profiler.TraceAnnotation(name)
