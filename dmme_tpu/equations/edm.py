"""EDM equations — Karras et al. 2022 (arXiv:2206.00364), pure functions.

Capability beyond the reference (which ships only the discrete DDPM-family
schedules): the EDM formulation expresses diffusion directly in continuous
noise-level σ with a preconditioned denoiser

    D_θ(x; σ) = c_skip(σ)·x + c_out(σ)·F_θ(c_in(σ)·x, c_noise(σ))

and trains with the σ-weighted denoising objective

    E_{σ,n} [ λ(σ) · ‖D_θ(x₀ + n; σ) − x₀‖² ],   n ~ N(0, σ² I).

Everything here is a pure function of arrays; the algorithm/pytree wrapper
lives in dmme_tpu.diffusion.edm. Constants follow the paper's Table 1
("EDM" column) exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def karras_sigmas(
    steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> jax.Array:
    """Noise-level discretization σ_0 > σ_1 > … > σ_{N−1}, plus σ_N = 0.

    σ_i = (σ_max^{1/ρ} + i/(N−1)·(σ_min^{1/ρ} − σ_max^{1/ρ}))^ρ
    (paper eq. 5). Returns shape ``(steps + 1,)`` float32, last entry 0.
    """
    i = jnp.arange(steps, dtype=jnp.float32)
    inv_rho = 1.0 / rho
    sig = (
        sigma_max**inv_rho
        + i / max(steps - 1, 1) * (sigma_min**inv_rho - sigma_max**inv_rho)
    ) ** rho
    return jnp.concatenate([sig, jnp.zeros((1,), jnp.float32)])


class Precond(NamedTuple):
    """The four σ-dependent preconditioning coefficients (paper Table 1)."""

    c_skip: jax.Array
    c_out: jax.Array
    c_in: jax.Array
    c_noise: jax.Array


def precond(sigma: jax.Array, sigma_data: float = 0.5) -> Precond:
    """EDM preconditioning: keeps the network's input and training target at
    unit variance across all σ (paper §5, Table 1 "EDM" column)."""
    s2 = jnp.square(sigma)
    d2 = sigma_data * sigma_data
    denom = s2 + d2
    return Precond(
        c_skip=d2 / denom,
        c_out=sigma * sigma_data * jax.lax.rsqrt(denom),
        c_in=jax.lax.rsqrt(denom),
        c_noise=0.25 * jnp.log(jnp.maximum(sigma, 1e-38)),
    )


def loss_weight(sigma: jax.Array, sigma_data: float = 0.5) -> jax.Array:
    """λ(σ) = (σ² + σ_d²) / (σ·σ_d)² — makes the effective weight on the
    raw network output F_θ exactly 1 for every σ (λ·c_out² = 1)."""
    s2 = jnp.square(sigma)
    d2 = sigma_data * sigma_data
    return (s2 + d2) / jnp.maximum(s2 * d2, 1e-38)


def sample_sigma_lognormal(
    key: jax.Array,
    batch: int,
    p_mean: float = -1.2,
    p_std: float = 1.2,
) -> jax.Array:
    """Training noise-level distribution ln σ ~ N(P_mean, P_std²)
    (paper Table 1). Shape ``(batch,)`` float32."""
    return jnp.exp(p_mean + p_std * jax.random.normal(key, (batch,), jnp.float32))
