"""Improved DDPM — cosine schedule, learned variance, hybrid loss.

TPU-native counterpart of reference src/dmme/diffusion_models/iddpm.py.
The model emits 2·C channels; the first half is ε_θ, the second half the
variance-interpolation coefficient v. The hybrid objective is
L = L_simple + γ·L_vlb with stop-gradient on ε inside L_vlb
(``jax.lax.stop_gradient`` replacing the reference's ``.clone().detach()``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

import dmme_tpu.equations as eq
from dmme_tpu.diffusion.ddpm import DDPM, ModelFn, _bcast
from dmme_tpu.utils.noise import pad


class NoiseVariance(NamedTuple):
    noise: jax.Array
    variance: jax.Array


@struct.dataclass
class IDDPM(DDPM):
    """Improved DDPM (Nichol & Dhariwal 2021)."""

    loss_type: str = struct.field(pytree_node=False, default="hybrid")
    gamma: float = struct.field(pytree_node=False, default=0.001)
    #: set by :meth:`strided` — maps respaced indices to ORIGINAL timesteps
    #: for the network's time conditioning (the model was trained on the
    #: original grid); None on an unstrided instance.
    timestep_map: Optional[jax.Array] = None

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        loss_type: str = "hybrid",
        gamma: float = 0.001,
        schedule: str = "cosine",
        offset: float = 0.008,
        start: float = 0.0001,
        end: float = 0.02,
    ) -> "IDDPM":
        if schedule == "cosine":
            sched = eq.iddpm.cosine_beta_schedule(timesteps, offset)
        elif schedule == "linear":
            sched = eq.ddpm.schedule_from_beta(eq.ddpm.linear_schedule(timesteps, start, end))
        else:
            raise NotImplementedError(f"unknown schedule: {schedule}")
        if loss_type not in ("hybrid", "simple", "vlb"):
            raise ValueError(f"unknown loss_type: {loss_type}")
        return cls(schedule=sched, timesteps=timesteps, loss_type=loss_type, gamma=gamma)

    # ------------------------------------------------------------------ model
    def forward_model(
        self,
        model_fn: ModelFn,
        params: Any,
        x_t: jax.Array,
        t: jax.Array,
        beta_t: jax.Array,
        alpha_bar_t: jax.Array,
        alpha_bar_t_minus_one: jax.Array,
        **model_kwargs,
    ) -> NoiseVariance:
        """Split the network output into (ε, v) and interpolate the variance
        between β_t and β̃_t (reference: src/dmme/diffusion_models/
        iddpm.py:150-164). Channels are last in NHWC, so the split is on
        axis −1 (the reference chunks torch dim 1 in NCHW)."""
        t_model = t if self.timestep_map is None else self.timestep_map[t]
        out = model_fn(params, x_t, t_model, **model_kwargs).astype(x_t.dtype)
        eps_hat, v = jnp.split(out, 2, axis=-1)
        bt = eq.iddpm.beta_tilde(beta_t, alpha_bar_t, alpha_bar_t_minus_one)
        variance = eq.iddpm.interpolate_variance(v, beta_t, bt)
        return NoiseVariance(eps_hat, variance)

    # ------------------------------------------------------------------ train
    def loss(
        self,
        model_fn: ModelFn,
        params: Any,
        rng: jax.Array,
        x_0: jax.Array,
        *,
        train: bool = True,
    ) -> jax.Array:
        """Hybrid / simple / vlb objective
        (reference training_step: src/dmme/diffusion_models/iddpm.py:62-116)."""
        t_key, n_key, d_key = jax.random.split(rng, 3)
        n = x_0.shape[0]
        t = self.sample_timesteps(t_key, n)
        noise = jax.random.normal(n_key, x_0.shape, x_0.dtype)
        return self.loss_given(
            model_fn, params, x_0, t, noise, train=train, dropout_rng=d_key
        )

    def loss_given(
        self,
        model_fn: ModelFn,
        params: Any,
        x_0: jax.Array,
        t: jax.Array,
        noise: jax.Array,
        *,
        train: bool = False,
        dropout_rng=None,
    ) -> jax.Array:
        """Objective with *injected* t and ε — deterministic core of
        :meth:`loss` for parity tests (tests/test_torch_parity.py)."""
        beta_t = _bcast(self.schedule.beta[t], x_0.ndim)
        alpha_t = _bcast(self.schedule.alpha[t], x_0.ndim)
        ab_t = _bcast(self.schedule.alpha_bar[t], x_0.ndim)
        ab_prev = _bcast(self.schedule.alpha_bar[t - 1], x_0.ndim)

        x_t = eq.ddpm.q_sample(x_0, ab_t, noise)

        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        out = self.forward_model(
            model_fn, params, x_t, t, beta_t, ab_t, ab_prev,
            train=train, rngs=rngs,
        )

        if self.loss_type == "simple":
            return eq.ddpm.simple_loss(noise, out.noise)

        vlb = eq.iddpm.loss_vlb(
            out.noise, out.variance, x_t, t, x_0, beta_t, alpha_t, ab_t, ab_prev
        )
        if self.loss_type == "vlb":
            return vlb
        return eq.ddpm.simple_loss(noise, out.noise) + self.gamma * vlb

    # ----------------------------------------------------------------- respace
    def strided(self, sub_timesteps: int, tau_schedule: str = "linear") -> "IDDPM":
        """Fast sampling via schedule respacing (IDDPM paper §4: with
        LEARNED variances, a K-step evenly-strided subsequence retains
        near-full-T quality — the paper's main sampling-speed result;
        capability the reference never implemented).

        The respaced process keeps the original ᾱ at the kept points:
        β^S_i = 1 − ᾱ_{τ_i}/ᾱ_{τ_{i−1}} (telescoping product reproduces ᾱ
        exactly), while the network is conditioned on the ORIGINAL
        timesteps through ``timestep_map`` — it was trained on that grid.
        The returned instance is for SAMPLING; its loss methods would
        train against the respaced grid and are not what you want."""
        tau_fn = {
            "linear": eq.ddim.linear_tau,
            "quadratic": eq.ddim.quadratic_tau,
        }[tau_schedule]
        tau = tau_fn(self.timesteps, sub_timesteps)
        # float64 on host: with a cosine schedule ᾱ_T ~ 1e-15 and the ratio
        # would round to β = exactly 1 in f32 (α = 0 ⇒ rsqrt(0) = ∞ in the
        # reverse mean). Clip to 0.999 — the SAME guard the cosine schedule
        # itself applies (equations/iddpm.py, reference parity quirk).
        import numpy as np

        ab = np.asarray(self.schedule.alpha_bar, np.float64)[np.asarray(tau)]
        beta = jnp.asarray(
            np.minimum(1.0 - ab[1:] / ab[:-1], 0.999), jnp.float32
        )
        beta = pad(beta, 0.0)
        return IDDPM(
            schedule=eq.ddpm.schedule_from_beta(beta),
            timesteps=sub_timesteps,
            parameterization=self.parameterization,
            snr_gamma=self.snr_gamma,
            loss_type=self.loss_type,
            gamma=self.gamma,
            timestep_map=tau,
        )

    # ----------------------------------------------------------------- sample
    def sampling_step(
        self,
        model_fn: ModelFn,
        params: Any,
        x_t: jax.Array,
        t: jax.Array,
        rng: jax.Array,
    ) -> jax.Array:
        """One ancestral step with the learned variance
        (reference: src/dmme/diffusion_models/iddpm.py:118-148)."""
        t = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (x_t.shape[0],))
        beta_t = _bcast(self.schedule.beta[t], x_t.ndim)
        alpha_t = _bcast(self.schedule.alpha[t], x_t.ndim)
        ab_t = _bcast(self.schedule.alpha_bar[t], x_t.ndim)
        ab_prev = _bcast(self.schedule.alpha_bar[t - 1], x_t.ndim)

        out = self.forward_model(model_fn, params, x_t, t, beta_t, ab_t, ab_prev)
        p = eq.ddpm.reverse_process(x_t, beta_t, alpha_t, ab_t, out.noise, out.variance)
        x_prev = p.sample(rng)
        return jnp.where(_bcast(t, x_t.ndim) == 1, p.mean, x_prev)
