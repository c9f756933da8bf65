"""Improved DDPM equations (Nichol & Dhariwal 2021) — cosine schedule,
learned-variance interpolation, and the VLB loss.

TPU-native counterpart of reference src/dmme/equations/iddpm/{iddpm,losses}.py.
The reference's data-dependent boolean-mask split between the t==1 discretized
NLL and the t>1 KL term (losses.py:58-83) becomes a ``jnp.where`` blend here:
both branches are computed for every element (cheap, fully vectorized on the
VPU) and the per-element mean is identical to the reference's concatenated
mean. Inputs to the unselected branch are clamped so its gradient is finite
(the standard double-where discipline).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dmme_tpu.equations import ddpm as eq_ddpm
from dmme_tpu.equations.gaussian import Gaussian, kl_divergence
from dmme_tpu.utils.noise import pad


def cosine_schedule(timesteps: int = 4000, offset: float = 0.008) -> jax.Array:
    """ᾱ_t = f(t)/f(0) with f(t) = cos²(((t/T + s)/(1 + s)) · π/2); length T+1.

    Reference: src/dmme/equations/iddpm/iddpm.py:6-20.
    """
    t = jnp.arange(0, timesteps + 1, dtype=jnp.float32)

    def f(u):
        return jnp.square(jnp.cos((u / timesteps + offset) / (1.0 + offset) * math.pi / 2.0))

    return f(t) / f(jnp.float32(0.0))


def cosine_beta_schedule(timesteps: int = 4000, offset: float = 0.008) -> eq_ddpm.Schedule:
    """Full cosine schedule with the reference's clipping/padding quirks.

    β_t = clip(1 − ᾱ_t/ᾱ_{t−1}, 0, 0.999) padded with **1** at index 0, and
    ᾱ kept as the *raw* cosine curve (NOT re-derived as cumprod of the clipped
    α) — exactly as the reference registers its buffers
    (src/dmme/diffusion_models/iddpm.py:46-60).
    """
    alpha_bar = cosine_schedule(timesteps, offset)
    beta = jnp.clip(1.0 - alpha_bar[1:] / alpha_bar[:-1], 0.0, 0.999)
    beta = pad(beta, 1.0)
    alpha = 1.0 - beta
    return eq_ddpm.Schedule(beta=beta, alpha=alpha, alpha_bar=alpha_bar)


def discrete_nll_loss(x_0: jax.Array, p: Gaussian) -> jax.Array:
    """Discretized Gaussian negative log-likelihood over 1/255-wide bins.

    Edge bins integrate to ±∞ (CDF replaced by 1 / 0 outside [−1, 1]).
    Reference: src/dmme/equations/iddpm/losses.py:8-19.
    """
    f_plus = jnp.where(x_0 < 1.0, p.cdf(x_0 + 1.0 / 255.0), jnp.ones_like(x_0))
    f_minus = jnp.where(x_0 > -1.0, p.cdf(x_0 - 1.0 / 255.0), jnp.zeros_like(x_0))
    prob = f_plus - f_minus
    return -jnp.log(jnp.clip(prob, 1e-12))


def true_reverse_process(
    x_t, x_0, beta_t, alpha_t, alpha_bar_t, alpha_bar_t_minus_one
) -> Gaussian:
    """Forward-process posterior q(x_{t−1} | x_t, x_0).

    Reference: src/dmme/equations/iddpm/losses.py:22-31.
    """
    mean = (
        jnp.sqrt(alpha_bar_t_minus_one) * beta_t / (1.0 - alpha_bar_t) * x_0
        + jnp.sqrt(alpha_t) * (1.0 - alpha_bar_t_minus_one) / (1.0 - alpha_bar_t) * x_t
    )
    variance = (1.0 - alpha_bar_t_minus_one) / (1.0 - alpha_bar_t) * beta_t
    std = jnp.sqrt(variance)
    return Gaussian(mean, jnp.broadcast_to(std, mean.shape))


def beta_tilde(beta_t, alpha_bar_t, alpha_bar_t_minus_one):
    """Posterior variance β̃_t = (1 − ᾱ_{t−1})/(1 − ᾱ_t) · β_t."""
    return (1.0 - alpha_bar_t_minus_one) / (1.0 - alpha_bar_t) * beta_t


def interpolate_variance(v, beta_t, beta_tilde_t):
    """Σ_θ = exp(v · log β_t + (1 − v) · log β̃_t), the learned-variance
    interpolation. Reference: src/dmme/equations/iddpm/losses.py:34-37.
    """
    log_var = v * jnp.log(beta_t) + (1.0 - v) * jnp.log(jnp.clip(beta_tilde_t, 1e-12))
    # An unconstrained v head can push the interpolated log-variance past
    # the f32 exp range (at t==1, log beta_tilde is the -27.6 clip floor, so
    # |v| ~ 4 already reaches exp(±60)+). Overflow to inf makes the exp
    # backward inf even under a zero cotangent (0*inf = NaN through the
    # t==1 where-mask in loss_vlb). Clamp to the finite-exp range; inactive
    # for any v in the sane [0, 1] interpolation band.
    return jnp.exp(jnp.clip(log_var, -87.0, 80.0))


def loss_vlb(
    noise_in_x_t,
    variance,
    x_t,
    t,
    x_0,
    beta_t,
    alpha_t,
    alpha_bar_t,
    alpha_bar_t_minus_one,
) -> jax.Array:
    """L_vlb with stop-gradient on ε_θ so only the variance head learns from it.

    Reference: src/dmme/equations/iddpm/losses.py:40-90 — ``.clone().detach()``
    becomes ``jax.lax.stop_gradient``; the t==1 / t>1 mask split becomes an
    elementwise ``jnp.where`` blend with identical mean reduction.

    ``t`` has shape ``(N,)``; per-sample constants are shaped ``(N,1,1,1)``.
    """
    # An unlucky variance head can drive exp(v·logβ + (1−v)·logβ̃) below the
    # float32 denormal range. sqrt(0) has an infinite derivative, so a NaN
    # (0·inf) would poison the backward pass even through a later clamp —
    # the floor must be applied to the variance BEFORE the sqrt.
    variance = jnp.maximum(variance, 1e-20)
    p = eq_ddpm.reverse_process(
        x_t,
        beta_t,
        alpha_t,
        alpha_bar_t,
        jax.lax.stop_gradient(noise_in_x_t),
        variance,
    )

    # t == 1 branch: discretized NLL of the data under p_theta(x_0 | x_1).
    nll = discrete_nll_loss(x_0, p)

    # t > 1 branch: KL(q(x_{t-1}|x_t,x_0) || p_theta(x_{t-1}|x_t)).
    q = true_reverse_process(x_t, x_0, beta_t, alpha_t, alpha_bar_t, alpha_bar_t_minus_one)
    # Clamp q's std away from zero: at t == 1 the posterior variance is 0 and
    # log(var_ratio) would be -inf, poisoning gradients of the (discarded)
    # branch through the where. 1e-10 is far below any real posterior std.
    q_safe = Gaussian(q.mean, jnp.maximum(q.std, 1e-10))
    kl = kl_divergence(q_safe, p)

    is_t1 = (t == 1).reshape((-1,) + (1,) * (x_0.ndim - 1))
    return jnp.mean(jnp.where(is_t1, nll, kl))
