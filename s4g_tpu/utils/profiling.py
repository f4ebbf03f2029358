"""Tracing + stage timing.

The reference instruments with wall-clock deltas and per-run txt appends
(reference: grasp_detector.py:188-253, grasp_proposal_test.py:69-78,
file_logger_cls.py:202,234-235).  This module keeps those measurement points
(StageTimer + append_timing) and adds the TPU-native layer the reference
lacks: jax.profiler traces (XLA/TPU timeline for xprof/tensorboard) and a
device-synchronized timing helper that is correct over async dispatch.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Optional

import numpy as np


def sync(tree) -> None:
    """Block until every array in the pytree is computed.

    Under remote-TPU tunnels block_until_ready can be unreliable; fetching a
    scalar reduction is the robust sync (see bench.py)."""
    import jax
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


class StageTimer:
    """Named stage timing with the reference's log format."""

    def __init__(self, logger: Optional[logging.Logger] = None):
        self.logger = logger or logging.getLogger("S4G.profiling")
        self.stages: dict[str, float] = {}
        self._tic = time.perf_counter()
        self._start = self._tic

    def stage(self, name: str, result=None) -> float:
        """Mark the end of a stage; optionally sync on `result` first."""
        if result is not None:
            sync(result)
        now = time.perf_counter()
        elapsed = now - self._tic
        self._tic = now
        self.stages[name] = elapsed
        self.logger.info("%s finish, cost ***%.4fs***", name, elapsed)
        return elapsed

    def overall(self) -> float:
        total = time.perf_counter() - self._start
        self.logger.info("Overall time cost: ***%.4fs***", total)
        return total


def append_timing(filename: str, milliseconds: float) -> None:
    """Append one latency sample, reference txt format
    (grasp_proposal_test.py:77-78)."""
    with open(filename, "a+") as f:
        f.write("{:.4f}\n".format(milliseconds))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/s4g_trace", enabled: bool = True):
    """jax.profiler trace context: captures the XLA/TPU timeline for
    tensorboard/xprof — the observability layer the reference lacks."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the xprof timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


def timed_scalar(fn, *args, iters: int = 10) -> float:
    """Robust per-call seconds for a jitted fn returning a scalar: warms up,
    loops, syncs by fetching the final scalar."""
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters
