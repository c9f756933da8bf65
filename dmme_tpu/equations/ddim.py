"""DDIM equations (Song et al. 2021) — τ sub-sequences and the implicit
reverse process.

TPU-native counterpart of reference src/dmme/equations/ddim/ddim.py. Two
reverse updates are provided:

* :func:`reverse_process` — bug-compatible with the reference, which divides
  x̂_0 by ``√ᾱ_{τ_{i−1}}`` instead of ``√ᾱ_{τ_i}`` and then drops the
  direction term by taking only the mean (SURVEY.md §2, deviation 1).
* :func:`reverse_process_canonical` — the paper's Eq. 12 (η-parameterized),
  which is what the framework's DDIM sampler uses by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmme_tpu.equations import ddpm as eq_ddpm
from dmme_tpu.equations.gaussian import Gaussian


def linear_tau(timesteps: int, sub_timesteps: int) -> jax.Array:
    """τ_i = round(T/S · i), length ``S+1`` with τ_0 = 0.

    Reference: src/dmme/equations/ddim/ddim.py:9-20. ``jnp.round`` and
    ``torch.round`` both round half to even, so the tables match exactly.
    """
    all_i = jnp.arange(0, sub_timesteps + 1, dtype=jnp.float32)
    c = timesteps / sub_timesteps
    return jnp.round(c * all_i).astype(jnp.int32)


def quadratic_tau(timesteps: int, sub_timesteps: int) -> jax.Array:
    """τ_i = round(T/S² · i²), length ``S+1`` with τ_0 = 0.

    Reference: src/dmme/equations/ddim/ddim.py:23-34.
    """
    all_i = jnp.arange(0, sub_timesteps + 1, dtype=jnp.float32)
    c = timesteps / (sub_timesteps**2)
    return jnp.round(c * jnp.square(all_i)).astype(jnp.int32)


def karras_tau(
    alpha_bar: jax.Array, sub_timesteps: int, rho: float = 7.0,
    sigma_max: float = 80.0,
) -> jax.Array:
    """τ table from the Karras et al. 2022 σ spacing (length ``S+1``,
    τ_0 = 0), mapped onto the trained discrete schedule.

    Beyond the reference's linear/quadratic spacings: lay S points evenly
    in σ^{1/ρ} between min(σ(t=T), ``sigma_max``) and σ(t=1) — where
    σ(t) = √(1−ᾱ_t)/√ᾱ_t is the VP noise level — then snap each to the
    discrete timestep nearest in log σ. The ρ=7 spacing concentrates steps
    at low noise, which is where few-step solvers lose most quality
    (arXiv:2206.00364 §5).

    The σ_max clamp (EDM's own default for image models) matters: cosine
    schedules reach ᾱ_T ≈ 2e-15, i.e. σ(T) ≈ 2·10⁷, and an unclamped grid
    anchored there puts most of its points beyond the schedule's
    penultimate timestep — at T=1000/S=10 that collapsed 6 of 10 network
    evaluations onto repeated τ entries (round-3 review finding). At
    σ = 80 the signal-to-noise ratio is already ~1.6·10⁻⁴, so starting
    there from pure noise loses nothing. Snapping in log σ (not linear σ)
    keeps nearest-neighbor meaningful across the decades σ spans. Snaps
    can still repeat a timestep at very small T; the samplers treat
    repeated-τ entries as identity steps.
    """
    ab = alpha_bar.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    # σ over the REAL timesteps 1..T (index 0 is the ᾱ=1 sentinel: σ=0,
    # which would put -inf into the grid)
    sigma = jnp.sqrt((1.0 - ab[1:]) / jnp.maximum(ab[1:], 1e-38))
    s_min, s_max = sigma[0], jnp.minimum(sigma[-1], sigma_max)
    i = jnp.arange(sub_timesteps, dtype=jnp.float32) / max(sub_timesteps - 1, 1)
    grid = (
        s_max ** (1.0 / rho) + i * (s_min ** (1.0 / rho) - s_max ** (1.0 / rho))
    ) ** rho  # σ decreasing, σ_max first
    # nearest discrete t per grid point, in log σ (σ is monotone increasing
    # in t) — +1 restores the 1-based timestep index
    t_of = jnp.argmin(
        jnp.abs(jnp.log(sigma)[None, :] - jnp.log(grid)[:, None]), axis=1
    ).astype(jnp.int32) + 1
    # τ ascending with the σ grid reversed, sentinel 0 up front
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), t_of[::-1]])


def lambda_coeffs(alpha_bar: jax.Array, t: jax.Array):
    """(α_t, σ_t, λ_t) at integer timestep(s) ``t`` for the λ = log(α/σ)
    half-log-SNR solvers (DPM-Solver++, UniPC), float32.

    The σ clamp makes λ(τ=0) finite-but-huge rather than +inf (σ₀ = 0 at
    the ᾱ=1 sentinel); the solvers' lower-order final steps rely on
    exp(−h) underflowing to exactly 0 there. ONE definition shared by
    every λ-space solver so the clamp semantics cannot diverge."""
    ab = alpha_bar[t]
    alpha = jnp.sqrt(ab)
    sigma = jnp.sqrt(1.0 - ab)
    lam = jnp.log(alpha) - jnp.log(jnp.maximum(sigma, 1e-38))
    return alpha, sigma, lam


def make_tau(
    name: str, timesteps: int, sub_timesteps: int, alpha_bar=None
) -> jax.Array:
    """Dispatch a τ table by spacing name: linear | quadratic | karras.

    ``alpha_bar`` is required for karras (σ spacing lives on the trained
    schedule); the reference spacings need only T and S.
    """
    name = name.lower()
    if name == "linear":
        return linear_tau(timesteps, sub_timesteps)
    if name == "quadratic":
        return quadratic_tau(timesteps, sub_timesteps)
    if name == "karras":
        if alpha_bar is None:
            raise ValueError("karras tau spacing needs the schedule's alpha_bar")
        return karras_tau(alpha_bar, sub_timesteps)
    raise NotImplementedError(f"unknown tau schedule: {name}")


def predict_x0(x_t: jax.Array, alpha_bar_t: jax.Array, noise_in_x_t: jax.Array) -> jax.Array:
    """x̂_0 = (x_t − √(1 − ᾱ_t) · ε_θ) / √ᾱ_t (paper-correct denominator)."""
    return (x_t - jnp.sqrt(1.0 - alpha_bar_t) * noise_in_x_t) * jax.lax.rsqrt(alpha_bar_t)


def reverse_process(
    x_t: jax.Array,
    alpha_bar_t: jax.Array,
    alpha_bar_t_minus_one: jax.Array,
    noise_in_x_t: jax.Array,
) -> Gaussian:
    """Reference-compatible deterministic reverse step (σ = 0).

    Divides x̂_0 by ``√ᾱ_{τ_{i−1}}`` — the reference's deviation from the
    paper (src/dmme/equations/ddim/ddim.py:37-57); callers take only the mean.
    Kept for output parity with the reference sampler.
    """
    predicted_x_0 = (
        x_t - jnp.sqrt(1.0 - alpha_bar_t) * noise_in_x_t
    ) * jax.lax.rsqrt(alpha_bar_t_minus_one)
    return eq_ddpm.forward_process(predicted_x_0, alpha_bar_t_minus_one)


def reverse_process_canonical(
    x_t: jax.Array,
    alpha_bar_t: jax.Array,
    alpha_bar_t_minus_one: jax.Array,
    noise_in_x_t: jax.Array,
    eta: float = 0.0,
) -> Gaussian:
    """Canonical DDIM update (paper Eq. 12), η-parameterized.

    mean = √ᾱ_{t−1} · x̂_0 + √(1 − ᾱ_{t−1} − σ²) · ε_θ
    σ    = η · √((1 − ᾱ_{t−1})/(1 − ᾱ_t)) · √(1 − ᾱ_t/ᾱ_{t−1})

    η = 0 is the deterministic sampler; η = 1 recovers DDPM ancestral noise.
    The same update (η = 0) appears in the reference only inside classifier
    guidance (src/dmme/guidance/classifier.py:52-58).
    """
    x0 = predict_x0(x_t, alpha_bar_t, noise_in_x_t)
    # Degenerate τ entries (quadratic τ tables have τ_1 = 0 whenever
    # T/S² < 0.5, e.g. the reference's own T=1000/S=50 config) give
    # ᾱ_t = 1 here; the unguarded ratio is then (1−ᾱ_prev)/0 = inf and
    # η·inf = NaN EVEN FOR η = 0. Clamping the denominator keeps σ = 0
    # exactly in that case (the second factor is 0 too), making the
    # τ=0→0 step an identity and the t=1→0 step return x̂₀ — the
    # mathematically correct limits.
    sigma = (
        eta
        * jnp.sqrt(
            (1.0 - alpha_bar_t_minus_one)
            / jnp.maximum(1.0 - alpha_bar_t, 1e-20)
        )
        * jnp.sqrt(jnp.clip(1.0 - alpha_bar_t / alpha_bar_t_minus_one, 0.0))
    )
    direction = jnp.sqrt(
        jnp.clip(1.0 - alpha_bar_t_minus_one - jnp.square(sigma), 0.0)
    )
    mean = jnp.sqrt(alpha_bar_t_minus_one) * x0 + direction * noise_in_x_t
    return Gaussian(mean, jnp.broadcast_to(sigma, mean.shape))
