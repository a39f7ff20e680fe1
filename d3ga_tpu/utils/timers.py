"""Profiling helpers.

TPU counterpart of `/root/reference/utils/timers.py` (cuda_timer /
cpu_timer): wall timers with device synchronization, plus jax.profiler
trace capture for deep dives. NOTE: on the tunneled axon platform,
block_until_ready is not reliably synchronous — `device_timer` forces a
tiny host readback instead.
"""

import time
from contextlib import contextmanager

import jax
import numpy as np

from d3ga_tpu.utils.log import logger


def sync(x):
    """Force full device completion (host readback of one element)."""
    leaf = jax.tree.leaves(x)
    if leaf:
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]
    return x


@contextmanager
def device_timer(name: str, result_ref=None, enabled: bool = True):
    """Times a block, synchronizing on the value stored into
    result_ref["out"] (if provided) or globally."""
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    yield
    if result_ref is not None and "out" in result_ref:
        sync(result_ref["out"])
    dt = (time.perf_counter() - t0) * 1000.0
    logger.info(f"[timer] {name}: {dt:.2f} ms")


@contextmanager
def cpu_timer(name: str, enabled: bool = True):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    yield
    logger.info(f"[timer] {name}: {(time.perf_counter() - t0) * 1000.0:.2f} ms")


@contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Tracks steps/s and pixel throughput for the training loop
    (feeds the bench metrics; replaces the reference's tqdm postfix)."""

    def __init__(self, pixels_per_step: int = 0):
        self.pixels = pixels_per_step
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1):
        self.steps += n

    def report(self):
        dt = time.perf_counter() - self.t0
        sps = self.steps / max(dt, 1e-9)
        return {
            "steps_per_s": sps,
            "mpixels_per_s": sps * self.pixels / 1e6,
        }

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
