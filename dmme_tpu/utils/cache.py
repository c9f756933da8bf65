"""Persistent XLA compilation cache.

First compiles of the big programs (train step, sampler scan) take tens of
seconds to minutes; enabling the on-disk cache makes every later process
start instantly. Call once before the first jit execution.
"""

from __future__ import annotations

import hashlib
import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "dmme_tpu_xla")


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU AOT cache entries embed the compile machine's features; loading
    them on a host with a different feature set fails per entry (and a VM
    image snapshotted with a warm cache CAN land on such a host — observed:
    thousands of `cpu_aot_loader` feature-mismatch rejections, which skewed
    two mp_check workers' compile times past Gloo's hardcoded ~30 s
    collective timeout and deadlocked the multi-process check). Keying the
    cache directory by the feature flags gives every distinct machine type
    its own cache instead of one that half-loads.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_compilation_cache(directory: str | None = None) -> str:
    directory = directory or os.environ.get("DMME_TPU_CACHE_DIR")
    if directory is None:
        directory = os.path.join(DEFAULT_CACHE_DIR, _host_fingerprint())
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Cache EVERYTHING: on a remote-attached TPU (axon tunnel) even tiny
    # programs pay a full compile-service round trip; the round-3 bench
    # instrumentation counted 150 sub-threshold misses per process at the
    # old 1.0 s floor.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return directory
