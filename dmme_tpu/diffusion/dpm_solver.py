"""DPM-Solver++ (2M) — second-order multistep ODE sampler.

Capability beyond the reference (which ships only ancestral DDPM and the
strided DDIM sampler): DPM-Solver++ (Lu et al. 2022, arXiv:2211.01095)
integrates the probability-flow ODE in λ = log(α/σ) half-log-SNR time with
a 2nd-order multistep update on the **data prediction** x̂₀ — reaching
DDIM-50-class sample quality in ~15-25 network evaluations.

Discrete wiring matches this framework's conventions: the τ sub-sequence
tables (linear/quadratic, equations/ddim.py) select timesteps out of the
length-(T+1) schedule; α_t = √ᾱ_t, σ_t = √(1−ᾱ_t). The solver is exact
where it should be:

* order=1 is ALGEBRAICALLY the canonical η=0 DDIM update
  (x ← α_prev·x̂₀ + σ_prev·ε̂) — golden-tested against our DDIM sampler.
* `lower_order_final`: the first step (no history) and the final step
  (λ₀ = +∞ at τ=0 since σ₀ = 0) use the first-order update, the standard
  guard from the reference implementation of the paper.

Whole trajectory = one ``lax.scan`` (weights pinned, zero host round-trips),
same as the other samplers.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

import dmme_tpu.equations as eq
from dmme_tpu.equations.ddpm import Schedule

ModelFn = Callable[..., jax.Array]


@struct.dataclass
class DPMSolverPP:
    """DPM-Solver++(2M) over a discrete ᾱ schedule."""

    schedule: Schedule
    tau: jax.Array                       # (S+1,) int32, τ_0 = 0
    timesteps: int = struct.field(pytree_node=False, default=1000)
    sub_timesteps: int = struct.field(pytree_node=False, default=20)
    order: int = struct.field(pytree_node=False, default=2)
    #: "eps" or "v" — network output convention (eq.ddpm.eps_from_v)
    parameterization: str = struct.field(pytree_node=False, default="eps")
    #: clamp x̂₀ to [−1, 1] (official-IDDPM clip_denoised); required for
    #: cosine schedules where ᾱ_T ≈ 2e-15 makes the x̂₀ division explode
    clip_x0: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        sub_timesteps: int = 20,
        tau_schedule: str = "quadratic",
        order: int = 2,
        start: float = 0.0001,
        end: float = 0.02,
        schedule: Optional[Schedule] = None,
        parameterization: str = "eps",
    ) -> "DPMSolverPP":
        assert order in (1, 2), order
        assert parameterization in ("eps", "v"), parameterization
        if schedule is None:
            beta = eq.ddpm.linear_schedule(timesteps, start, end)
            schedule = eq.ddpm.schedule_from_beta(beta)
        return cls(
            schedule=schedule,
            tau=eq.ddim.make_tau(
                tau_schedule, timesteps, sub_timesteps, schedule.alpha_bar
            ),
            timesteps=timesteps,
            sub_timesteps=sub_timesteps,
            order=order,
            parameterization=parameterization,
        )

    # ------------------------------------------------------------------ math
    def _coeffs(self, t: jax.Array):
        """(α_t, σ_t, λ_t) — shared λ-space definition incl. the σ clamp
        the lower-order final step relies on (eq.ddim.lambda_coeffs)."""
        return eq.ddim.lambda_coeffs(self.schedule.alpha_bar, t)

    def generate(
        self,
        model_fn: ModelFn,
        params: Any,
        rng: jax.Array,
        img_shape: Tuple[int, ...],
        *,
        history_length=None,
    ) -> jax.Array:
        """x_T ~ N(0, I) → x_0 in ``sub_timesteps`` network evaluations.

        rng handling matches the other samplers (split; the solver itself is
        deterministic) so the same key yields the same x_T across samplers.
        Supports the same ``history_length`` frame-capture contract as the
        other samplers so it is drop-in as a Lit ``diffusion_model``
        (GenerateImage callback, sample subcommand).
        """
        x_key, _ = jax.random.split(rng)
        x_t = jax.random.normal(x_key, img_shape, jnp.float32)
        idxs = jnp.arange(self.sub_timesteps, 0, -1, dtype=jnp.int32)  # S..1

        from dmme_tpu.diffusion.ddpm import capture_frame, make_history_capture

        capture, history0 = make_history_capture(
            self.sub_timesteps, history_length, img_shape
        )

        def body(carry, i):
            if capture is None:
                x, prev_x0, prev_h = carry
            else:
                (x, prev_x0, prev_h), hist = carry
            t = self.tau[i]
            t_prev = self.tau[i - 1]
            a_t, s_t, lam_t = self._coeffs(t)
            a_p, s_p, lam_p = self._coeffs(t_prev)

            t_vec = jnp.broadcast_to(t, (x.shape[0],))
            out = model_fn(params, x, t_vec).astype(jnp.float32)
            if self.parameterization == "v":
                out = eq.ddpm.eps_from_v(out, x, jnp.square(a_t))
            x0 = (x - s_t * out) / a_t
            if self.clip_x0:
                x0 = jnp.clip(x0, -1.0, 1.0)

            h = lam_p - lam_t                        # > 0; huge on final step
            ratio = jnp.exp(-h)                      # = (a_t σ_p)/(a_p σ_t)
            first = (s_p / s_t) * x - a_p * (ratio - 1.0) * x0

            if self.order == 1:
                new_x = first
            else:
                r = prev_h / h
                c = 1.0 / (2.0 * jnp.maximum(r, 1e-38))
                d = (1.0 + c) * x0 - c * prev_x0
                second = (s_p / s_t) * x - a_p * (ratio - 1.0) * d
                # lower_order_final: the first step (no history:
                # prev_h == 0) and the FINAL step (t_prev == 0, where the
                # σ clamp makes λ finite-but-huge and the 2nd-order
                # coefficient 1/(2r) would blow up) use first order
                use_first = (prev_h == 0.0) | (t_prev == 0)
                new_x = jnp.where(use_first, first, second)
            # degenerate repeated-τ entry (quadratic τ tables at tiny T have
            # τ_1 = τ_0 = 0): t == t_prev makes s_p/s_t = 0/0 — the step is
            # mathematically an identity, so take it as one
            new_x = jnp.where(t == t_prev, x, new_x)

            if capture is None:
                return (new_x, x0, h), None
            hist = capture_frame(capture, hist, self.sub_timesteps - i, new_x)
            return ((new_x, x0, h), hist), None

        init = (x_t, jnp.zeros_like(x_t), jnp.float32(0.0))
        if capture is None:
            (x_0, _, _), _ = jax.lax.scan(body, init, idxs)
            return x_0
        ((x_0, _, _), history), _ = jax.lax.scan(body, (init, history0), idxs)
        return x_0, history
