"""Profiling & timing harness.

The reference has no profiling of its own (SURVEY.md §5 — just a Lightning
``profiler: null`` slot and tqdm bars). TPU-native tooling:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (xplane) for the wrapped region.
* :func:`timed` — wall-clock timing with a device sync (fetches a scalar
  reduction, which also drains the remote-TPU pipeline — plain
  ``block_until_ready`` does not, on tunneled PJRT backends).
* :func:`flops_estimate` — XLA cost analysis of a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree: Any) -> None:
    """Force full completion of everything producing ``tree``."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(leaves[-1].astype(jnp.float32)))


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call over ``iters`` pipelined calls."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def flops_estimate(fn: Callable, *args) -> Dict[str, float]:
    """XLA's cost analysis for a jitted callable at these args."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {k: v for k, v in (cost or {}).items() if isinstance(v, (int, float))}
