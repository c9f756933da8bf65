"""Random-noise and schedule-padding helpers.

TPU-native counterpart of the reference's ``dmme.common.noise``
(reference: src/dmme/common/noise.py:4-23). Unlike the torch versions,
these are pure functions of an explicit ``jax.random`` key, so they are
safe under ``jit``/``scan``/``shard_map`` and fully reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard normal sample of ``shape``."""
    return jax.random.normal(key, shape, dtype)


def gaussian_like(key: jax.Array, x: jax.Array) -> jax.Array:
    """Standard normal sample shaped and typed like ``x``."""
    return jax.random.normal(key, x.shape, x.dtype)


def uniform_int(key: jax.Array, minval: int, maxval: int, count: int = 1) -> jax.Array:
    """Uniform integers in ``[minval, maxval)``.

    Matches the reference's exclusive upper bound (``torch.randint``): DDPM
    training draws ``t ∈ [1, T)`` and therefore never samples ``t == T``
    (reference: src/dmme/diffusion_models/ddpm.py:65-70).
    """
    return jax.random.randint(key, (count,), minval, maxval, dtype=jnp.int32)


def pad(x: jax.Array, value: float = 0.0) -> jax.Array:
    """Prepend one row equal to ``value`` along axis 0.

    Schedules are stored with length ``T+1`` and a sentinel at index 0 so the
    array index equals the paper's 1-based timestep ``t``
    (reference: src/dmme/common/noise.py:19-23).
    """
    lead = jnp.full_like(x[0:1], value)
    return jnp.concatenate([lead, x], axis=0)
