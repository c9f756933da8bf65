"""DDIM sampler — strided deterministic sampling over a trained DDPM.

TPU-native counterpart of reference src/dmme/diffusion_models/ddim.py.
Training is identical to DDPM (inherited); sampling walks a τ sub-sequence
of length S ≪ T in one ``lax.scan``.

Two update rules (SURVEY.md §2, deviation 1):

* ``variant="canonical"`` (default) — the paper's Eq. 12 with the
  √(1−ᾱ_{τ_{i−1}})·ε direction term, η-parameterized.
* ``variant="reference"`` — bug-compatible with the reference, which divides
  x̂_0 by √ᾱ_{τ_{i−1}} and drops the direction term.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

import dmme_tpu.equations as eq
from dmme_tpu.diffusion.ddpm import (
    DDPM,
    ModelFn,
    _bcast,
    capture_frame,
    make_history_capture,
)


@struct.dataclass
class DDIM(DDPM):
    """Denoising Diffusion Implicit Model (Song et al. 2021)."""

    tau: jax.Array = None  # (S+1,) int32, tau[0] == 0
    sub_timesteps: int = struct.field(pytree_node=False, default=50)
    eta: float = struct.field(pytree_node=False, default=0.0)
    variant: str = struct.field(pytree_node=False, default="canonical")
    #: clamp x̂₀ to [−1, 1] before the update (the official IDDPM
    #: ``clip_denoised``). REQUIRED for near-zero terminal ᾱ (cosine
    #: schedules: ᾱ_T ≈ 2e-15, so the x̂₀ division at t=T amplifies any ε
    #: error by ~1/√ᾱ ≈ 2e7 — measured NaN without it); off by default to
    #: keep exact reference parity on linear schedules (ᾱ_T ≈ 4e-5).
    clip_x0: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        sub_timesteps: int = 50,
        tau_schedule: str = "quadratic",
        start: float = 0.0001,
        end: float = 0.02,
        eta: float = 0.0,
        variant: str = "canonical",
        parameterization: str = "eps",
        snr_gamma=None,
    ) -> "DDIM":
        assert parameterization in ("eps", "v"), parameterization
        beta = eq.ddpm.linear_schedule(timesteps, start, end)
        schedule = eq.ddpm.schedule_from_beta(beta)
        # linear | quadratic (reference spacings) | karras (σ^{1/ρ} grid on
        # the trained schedule, arXiv:2206.00364)
        tau = eq.ddim.make_tau(
            tau_schedule, timesteps, sub_timesteps, schedule.alpha_bar
        )
        return cls(
            schedule=schedule,
            timesteps=timesteps,
            tau=tau,
            sub_timesteps=sub_timesteps,
            eta=eta,
            variant=variant,
            parameterization=parameterization,
            snr_gamma=snr_gamma,
        )

    def clipped_eps(
        self, x_t: jax.Array, ab_t: jax.Array, eps_hat: jax.Array
    ) -> jax.Array:
        """Apply ``clip_x0`` (if enabled): clamp the data prediction to
        [−1, 1], then re-derive the ε consistent with it so every update
        form stays internally coherent. Shared by the plain, encoder-cached
        and deep-cached DDIM samplers."""
        if not self.clip_x0:
            return eps_hat
        x0 = jnp.clip(eq.ddim.predict_x0(x_t, ab_t, eps_hat), -1.0, 1.0)
        # ᾱ_t = 1 at a degenerate τ=0 entry makes the re-derivation 0/0;
        # keep the model's own ε there — downstream updates multiply it by
        # an exactly-zero coefficient (see reverse_process_canonical)
        rederived = (x_t - jnp.sqrt(ab_t) * x0) / jnp.sqrt(
            jnp.maximum(1.0 - ab_t, 1e-20)
        )
        return jnp.where(ab_t >= 1.0, eps_hat, rederived)

    def sampling_step(
        self,
        model_fn: ModelFn,
        params: Any,
        x_tau_i: jax.Array,
        i: jax.Array,
        rng: jax.Array,
    ) -> jax.Array:
        """One strided step x_{τ_i} → x_{τ_{i−1}}.

        ``i`` indexes the τ table (reference: src/dmme/diffusion_models/
        ddim.py:55-77). With η = 0 the step is deterministic and ``rng`` is
        unused (kept for signature uniformity with DDPM).
        """
        i = jnp.broadcast_to(jnp.asarray(i, jnp.int32), (x_tau_i.shape[0],))
        tau_i = self.tau[i]
        tau_prev = self.tau[i - 1]
        ab_t = _bcast(self.schedule.alpha_bar[tau_i], x_tau_i.ndim)
        ab_prev = _bcast(self.schedule.alpha_bar[tau_prev], x_tau_i.ndim)

        out = model_fn(params, x_tau_i, tau_i).astype(x_tau_i.dtype)
        eps_hat = self.clipped_eps(x_tau_i, ab_t, self.to_eps(out, x_tau_i, ab_t))
        if self.variant == "reference":
            p = eq.ddim.reverse_process(x_tau_i, ab_t, ab_prev, eps_hat)
            return p.mean
        p = eq.ddim.reverse_process_canonical(x_tau_i, ab_t, ab_prev, eps_hat, self.eta)
        if self.eta == 0.0:
            return p.mean
        x_prev = p.sample(rng)
        return jnp.where(_bcast(i, x_tau_i.ndim) == 1, p.mean, x_prev)

    def generate(
        self,
        model_fn: ModelFn,
        params: Any,
        rng: jax.Array,
        img_shape: Tuple[int, ...],
        *,
        history_length: Optional[int] = None,
    ):
        """S-step strided reverse process as one ``lax.scan``
        (reference loop: src/dmme/diffusion_models/ddim.py:79-99)."""
        x_key, scan_key = jax.random.split(rng)
        x = jax.random.normal(x_key, img_shape, jnp.float32)
        iis = jnp.arange(self.sub_timesteps, 0, -1, dtype=jnp.int32)

        capture, history0 = make_history_capture(
            self.sub_timesteps, history_length, img_shape
        )

        def body(carry, i):
            if capture is None:
                x = carry
            else:
                x, hist = carry
            x = self.sampling_step(model_fn, params, x, i, jax.random.fold_in(scan_key, i))
            if capture is None:
                return x, None
            hist = capture_frame(capture, hist, self.sub_timesteps - i, x)
            return (x, hist), None

        if capture is None:
            x0, _ = jax.lax.scan(body, x, iis)
            return x0
        (x0, history), _ = jax.lax.scan(body, (x, history0), iis)
        return x0, history
