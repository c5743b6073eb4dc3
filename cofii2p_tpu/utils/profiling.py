"""Profiling utilities: device-synced timing and jax.profiler traces.

The reference's profiling story is CUDA-synchronized timing loops + fvcore
FLOP counting (evaluation/get_flops_fps.py:30-63).  Here:

- :func:`timeit_sync` measures steady-state latency with a *forced device ->
  host readback* per iteration.  On tunneled/async PJRT backends,
  ``block_until_ready`` alone can return before execution completes; pulling
  bytes to the host is the only watertight barrier.
- :func:`trace` wraps ``jax.profiler`` so any pipeline stage can be captured
  for xprof/tensorboard inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def _sync(out) -> None:
    # Readback must be tiny: the TPU tunnel moves data slowly, so pulling a
    # whole activation would swamp the measurement.  Reduce on device first,
    # then read back one scalar — still a hard barrier on the computation.
    leaf = jax.tree.leaves(out)[0]
    import jax.numpy as jnp

    np.asarray(jnp.sum(leaf))


def timeit_sync(fn: Callable, *args, warmup: int = 2, iters: int = 10, **kw) -> float:
    """Mean seconds per call of ``fn(*args, **kw)`` with hard sync."""
    for _ in range(warmup):
        _sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        _sync(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
