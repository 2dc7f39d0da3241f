"""Profiling / tracing (SURVEY §5): the reference's only instrumentation is
``time.time()`` around the denoise loop plus a buggy, unused ``time_it``
decorator (model_utils.py:42-50 returns ``end - start`` where ``end`` is
already the duration).  Here:

* :func:`time_it` — the fixed decorator: returns (result, seconds) with a
  device sync so accelerator work is actually counted.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto-compatible trace directory for real kernel-level analysis.
* :func:`flops_estimate` — XLA cost analysis of a jitted fn (per-step cost
  accounting for plans/benchmarks).
"""

from __future__ import annotations

import contextlib
import functools
import time
from pathlib import Path

import jax


def sync(x):
    """Honest device sync: block + one-element host read (async remote
    backends can return from block_until_ready early — see models/sampler.py)."""
    x = jax.block_until_ready(x)
    leaves = jax.tree_util.tree_leaves(x)
    if leaves and hasattr(leaves[0], "ndim"):
        jax.device_get(leaves[0][(0,) * leaves[0].ndim])
    return x


def time_it(fn):
    """Fixed reference ``time_it``: (result, elapsed_seconds)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = sync(fn(*args, **kwargs))
        return result, time.perf_counter() - start

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str | Path = "outputs/profile"):
    """``with trace('outputs/profile'): run()`` -> Perfetto trace on disk."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield Path(log_dir)
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn, *args) -> dict:
    """Compile-time XLA cost analysis for a jittable fn."""
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        costs = compiled.cost_analysis()
    except Exception:
        return {}
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    return {k: costs[k] for k in ("flops", "bytes accessed") if k in costs}
