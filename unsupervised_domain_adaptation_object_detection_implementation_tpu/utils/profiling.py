"""Profiling helpers (reference `mmdet/utils/profiling.py:10-40`
`profile_time` + the fps protocol of `tools/analysis_tools/benchmark.py`).

On TPU, honest timing requires forcing a value fetch — over some transports
(e.g. the axon tunnel) `block_until_ready` acks before remote execution
finishes, so `sync()` pulls one scalar element to the host.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Reliable device synchronization: fetch one element of one leaf."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(jax.tree_util.tree_map(
            lambda x: x.ravel()[0] if hasattr(x, 'ravel') else x,
            leaves[0])))


@contextlib.contextmanager
def profile_time(name: str, stream=None, sync_tree=None):
    """Wall-clock a block; optionally synchronize on `sync_tree` first."""
    t0 = time.perf_counter()
    yield
    if sync_tree is not None:
        sync(sync_tree)
    dt = time.perf_counter() - t0
    msg = f'[profile] {name}: {dt * 1000:.2f} ms'
    print(msg, file=stream) if stream else print(msg)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (open with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_fps(fn, args, iters: int = 50, warmup: int = 5) -> float:
    """Reference benchmark protocol (`benchmark.py:101-132`): warmup then
    timed iterations with device sync; returns calls/sec."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return iters / (time.perf_counter() - t0)
