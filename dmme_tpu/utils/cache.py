"""Persistent XLA compilation cache.

First compiles of the big programs (train step, sampler scan) take tens of
seconds to minutes; enabling the on-disk cache makes every later process
start instantly. Call once before the first jit execution.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "dmme_tpu_xla")


def enable_compilation_cache(directory: str | None = None) -> str:
    directory = directory or os.environ.get("DMME_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Cache EVERYTHING: on a remote-attached TPU (axon tunnel) even tiny
    # programs pay a full compile-service round trip; the round-3 bench
    # instrumentation counted 150 sub-threshold misses per process at the
    # old 1.0 s floor.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return directory
