"""Flow-matching equations — Lipman et al. 2023 (arXiv:2210.02747) /
rectified flow, Liu et al. 2022 (arXiv:2209.03003) — pure functions.

Capability beyond the reference (discrete DDPM-family only): flow matching
regresses a time-dependent velocity field v_θ(x_t, t) onto the conditional
straight-path velocity

    x_t = (1 − t)·x₀ + t·x₁,      t ∈ [0, 1],  x₁ ~ N(0, I)
    v*(x_t | x₀, x₁) = dx_t/dt = x₁ − x₀

(t = 0 is data, t = 1 is noise — the same "larger t = noisier" orientation
as the discrete schedules here). Sampling integrates the learned ODE
dx/dt = v_θ(x, t) from t = 1 down to t = 0.

Everything here is a pure function of arrays; the algorithm/pytree wrapper
lives in dmme_tpu.diffusion.flow. Conventions match equations/edm.py:
no torch, no state, explicit keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bcast(a: jax.Array, ndim: int) -> jax.Array:
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def interpolate(x0: jax.Array, x1: jax.Array, t: jax.Array) -> jax.Array:
    """Straight-path interpolant x_t = (1 − t)·x₀ + t·x₁.

    ``t`` is scalar or (N,) in [0, 1]; broadcasts over the sample dims.
    Endpoints: t=0 → x₀ (data), t=1 → x₁ (noise).
    """
    t = _bcast(jnp.asarray(t, x0.dtype), x0.ndim)
    return (1.0 - t) * x0 + t * x1


def velocity_target(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Conditional velocity of the straight path: dx_t/dt = x₁ − x₀
    (constant in t — the property that makes rectified-flow paths
    integrable in few steps)."""
    return x1 - x0


def sample_t_uniform(key: jax.Array, batch: int) -> jax.Array:
    """t ~ U(0, 1), shape (batch,) float32 — the original FM objective."""
    return jax.random.uniform(key, (batch,), jnp.float32)


def sample_t_logit_normal(
    key: jax.Array, batch: int, mean: float = 0.0, std: float = 1.0
) -> jax.Array:
    """t = sigmoid(z), z ~ N(mean, std²) — the logit-normal timestep
    density of SD3 (Esser et al. 2024, arXiv:2403.03206 §3.1), which
    concentrates training where the velocity is hardest to regress
    (mid-path) instead of the easy endpoints. Shape (batch,) float32."""
    z = mean + std * jax.random.normal(key, (batch,), jnp.float32)
    return jax.nn.sigmoid(z)


def shift_time(t: jax.Array, shift: float) -> jax.Array:
    """Resolution shift t ↦ s·t / (1 + (s − 1)·t) (SD3 eq. 23).

    s > 1 spends more of the integration budget at HIGH noise — at higher
    resolution the same t destroys less global structure, so the schedule
    must be pushed toward t = 1. Monotone [0,1] → [0,1]; s = 1 is the
    identity.
    """
    t = jnp.asarray(t, jnp.float32)
    return shift * t / (1.0 + (shift - 1.0) * t)


def time_grid(steps: int, shift: float = 1.0) -> jax.Array:
    """Integration grid t_0 = 1 > t_1 > … > t_N = 0, shape (steps + 1,).

    Uniform in t, then resolution-shifted (``shift_time``); the shift maps
    both endpoints to themselves, so the grid always starts at pure noise
    and ends exactly at data time.
    """
    t = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)
    return shift_time(t, shift) if shift != 1.0 else t
