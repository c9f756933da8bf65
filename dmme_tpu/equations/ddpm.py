"""DDPM equations — pure functions of arrays (Ho et al. 2020).

TPU-native counterpart of reference src/dmme/equations/ddpm/{ddpm,losses}.py.
All schedules follow the reference's 1-based timestep convention: arrays have
length ``T+1`` with a sentinel at index 0 so ``schedule[t]`` is the paper's
value at timestep ``t`` (SURVEY.md §1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dmme_tpu.equations.gaussian import Gaussian
from dmme_tpu.utils.noise import pad


class Schedule(NamedTuple):
    """Precomputed diffusion constants, each of shape ``(T+1,)``.

    Lives in HBM once per model; gathered per-timestep inside jitted steps.
    """

    beta: jax.Array
    alpha: jax.Array
    alpha_bar: jax.Array

    @property
    def timesteps(self) -> int:
        return self.beta.shape[0] - 1


def linear_schedule(timesteps: int, start: float = 0.0001, end: float = 0.02) -> jax.Array:
    """β_t increasing linearly from ``start`` to ``end``; length ``T+1``, β_0 = 0.

    Matches reference src/dmme/equations/ddpm/ddpm.py:9-21 (torch.linspace
    endpoint-inclusive + zero pad).
    """
    beta = jnp.linspace(start, end, timesteps, dtype=jnp.float32)
    return pad(beta, 0.0)


def schedule_from_beta(beta: jax.Array) -> Schedule:
    """Derive α = 1 − β and ᾱ = cumprod(α) from a padded β.

    With β_0 = 0, α_0 = 1 and the cumulative product is unaffected by the
    sentinel (reference: src/dmme/diffusion_models/ddpm.py:41-47).
    """
    alpha = 1.0 - beta
    alpha_bar = jnp.cumprod(alpha, axis=0)
    return Schedule(beta=beta, alpha=alpha, alpha_bar=alpha_bar)


def forward_process(x_0: jax.Array, alpha_bar_t: jax.Array) -> Gaussian:
    """Marginal forward process q(x_t | x_0) = N(√ᾱ_t · x_0, (1 − ᾱ_t) I).

    ``alpha_bar_t`` must broadcast against ``x_0`` (e.g. shape (N,1,1,1)).
    Reference: src/dmme/equations/ddpm/ddpm.py:24-41.
    """
    mean = jnp.sqrt(alpha_bar_t) * x_0
    std = jnp.sqrt(1.0 - alpha_bar_t)
    return Gaussian(mean, jnp.broadcast_to(std, mean.shape))


def q_sample(x_0: jax.Array, alpha_bar_t: jax.Array, noise: jax.Array) -> jax.Array:
    """x_t = √ᾱ_t · x_0 + √(1 − ᾱ_t) · ε — the fused, sampling-form of
    :func:`forward_process` used on the hot training path.

    The reference instead draws ``q.rsample()`` and recovers ε algebraically
    (src/dmme/diffusion_models/ddpm.py:74-80); sampling ε explicitly is
    equivalent in distribution and avoids a divide (SURVEY.md §2 deviation 3).
    """
    return jnp.sqrt(alpha_bar_t) * x_0 + jnp.sqrt(1.0 - alpha_bar_t) * noise


def v_target(x_0: jax.Array, alpha_bar_t: jax.Array, noise: jax.Array) -> jax.Array:
    """Velocity target v = √ᾱ_t·ε − √(1−ᾱ_t)·x₀ (Salimans & Ho 2022,
    "Progressive Distillation", arXiv:2202.00512 — capability beyond the
    reference, which trains ε-prediction only)."""
    return jnp.sqrt(alpha_bar_t) * noise - jnp.sqrt(1.0 - alpha_bar_t) * x_0


def eps_from_v(v: jax.Array, x_t: jax.Array, alpha_bar_t: jax.Array) -> jax.Array:
    """Invert the v-parameterization: ε = √ᾱ_t·v + √(1−ᾱ_t)·x_t.

    Exact algebraic inverse of :func:`v_target` given
    x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε (tested to roundoff) — lets every ε-native
    sampler consume a v-prediction network through one fused multiply-add."""
    return jnp.sqrt(alpha_bar_t) * v + jnp.sqrt(1.0 - alpha_bar_t) * x_t


def reverse_process(
    x_t: jax.Array,
    beta_t: jax.Array,
    alpha_t: jax.Array,
    alpha_bar_t: jax.Array,
    noise_in_x_t: jax.Array,
    variance: jax.Array,
) -> Gaussian:
    """Reverse denoising step p_θ(x_{t−1} | x_t) with pluggable variance.

    mean = 1/√α_t · (x_t − β_t/√(1 − ᾱ_t) · ε_θ)
    Reference: src/dmme/equations/ddpm/ddpm.py:44-72.
    """
    mean = (
        jax.lax.rsqrt(alpha_t)
        * (x_t - beta_t * jax.lax.rsqrt(1.0 - alpha_bar_t) * noise_in_x_t)
    )
    std = jnp.sqrt(variance)
    return Gaussian(mean, jnp.broadcast_to(std, mean.shape))


def simple_loss(noise: jax.Array, estimated_noise: jax.Array) -> jax.Array:
    """L_simple — mean squared error between true and predicted noise.

    Reference: src/dmme/equations/ddpm/losses.py:5-13.
    """
    return jnp.mean(jnp.square(noise - estimated_noise))


def snr(alpha_bar_t: jax.Array) -> jax.Array:
    """Signal-to-noise ratio SNR(t) = ᾱ_t / (1 − ᾱ_t)."""
    return alpha_bar_t / jnp.maximum(1.0 - alpha_bar_t, 1e-20)


def min_snr_weight(
    alpha_bar_t: jax.Array, gamma: float, parameterization: str = "eps"
) -> jax.Array:
    """Min-SNR-γ per-timestep loss weight (Hang et al. 2023,
    arXiv:2303.09556 — capability beyond the reference's uniform L_simple).

    On the ε-objective: w = min(SNR, γ)/SNR — truncates the implicit
    over-weighting of low-noise timesteps. On the v-objective the same
    x₀-space weight becomes w = min(SNR, γ)/(SNR + 1).
    """
    s = snr(alpha_bar_t)
    clipped = jnp.minimum(s, gamma)
    if parameterization == "v":
        return clipped / (s + 1.0)
    return clipped / jnp.maximum(s, 1e-20)
