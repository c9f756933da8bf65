"""UniPC-style unified predictor–corrector ODE sampler.

Capability beyond the reference (which ships only ancestral DDPM and the
strided DDIM sampler — src/dmme/diffusion_models/{ddpm,ddim}.py): a
predictor–corrector multistep solver in the style of UniPC (Zhao et al.
2023, arXiv:2302.04867) for the probability-flow ODE in λ = log(α/σ)
half-log-SNR time, targeting the very-low-NFE regime (5–12 network
evaluations) where DPM-Solver++(2M) starts to degrade.

The scheme, derived from the exact variation-of-constants solution

    x_t = (σ_t/σ_s)·x_s + σ_t ∫_{λ_s}^{λ_t} e^λ · x̂₀(λ) dλ

by fitting x̂₀(λ) with a Lagrange polynomial through known nodes and
integrating the e^λ kernel EXACTLY (no midpoint/Taylor approximation —
the coefficients below are pinned by polynomial-exactness tests,
tests/test_unipc.py):

* **predictor** (explicit, Adams–Bashforth-like): linear x̂₀ through the
  two most recent model evaluations, integrated over [λ_s, λ_t];
* **corrector** (implicit, Adams–Moulton-like, applied "for free"): when
  the model is evaluated at the predicted x̃_i, that NEW evaluation is
  used to re-integrate the step that produced x̃_i — linear x̂₀ through
  the step's two endpoints. One network evaluation per step, same as
  DPM-Solver++(2M); the corrector costs only elementwise work.

Exactness properties (each is a test):
* constant x̂₀ → the whole trajectory is exact (any order, any τ table);
* order=1 + corrector=False is ALGEBRAICALLY the canonical η=0 DDIM
  update;
* linear-in-λ x̂₀ → every corrected step is exact (the uncorrected
  DPM-Solver++(2M) midpoint form is not).

Discrete wiring matches the other solvers: τ sub-sequence tables over the
length-(T+1) ᾱ schedule, `lower_order_final` guards at τ=0, identity
semantics for degenerate repeated-τ entries, optional `clip_x0`, eps/v
parameterizations. Whole trajectory = one ``lax.scan``.
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
class UniPC:
    """Predictor–corrector multistep solver over a discrete ᾱ schedule."""

    schedule: Schedule
    tau: jax.Array                       # (S+1,) int32, τ_0 = 0
    timesteps: int = struct.field(pytree_node=False, default=1000)
    sub_timesteps: int = struct.field(pytree_node=False, default=10)
    order: int = struct.field(pytree_node=False, default=2)
    #: apply the UniC correction step (one extra elementwise update, zero
    #: extra network evaluations)
    corrector: bool = struct.field(pytree_node=False, default=True)
    #: "eps" or "v" — network output convention
    parameterization: str = struct.field(pytree_node=False, default="eps")
    #: clamp x̂₀ to [−1, 1]; auto-enabled by the factory on near-zero
    #: terminal-ᾱ (cosine) schedules, same rule as DDIM/DPM
    clip_x0: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        sub_timesteps: int = 10,
        tau_schedule: str = "quadratic",
        order: int = 2,
        corrector: bool = True,
        start: float = 0.0001,
        end: float = 0.02,
        schedule: Optional[Schedule] = None,
        parameterization: str = "eps",
    ) -> "UniPC":
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
            corrector=corrector,
            parameterization=parameterization,
        )

    # ------------------------------------------------------------------ math
    def _coeffs(self, t: jax.Array):
        """(α_t, σ_t, λ_t) — shared λ-space definition incl. the σ clamp
        the lower-order final step relies on (eq.ddim.lambda_coeffs)."""
        return eq.ddim.lambda_coeffs(self.schedule.alpha_bar, t)

    @staticmethod
    def _kernel_moments(h: jax.Array):
        """(M0, M1) = ∫_{−h}^{0} e^u du and ∫_{−h}^{0} u·e^u du — the exact
        e^λ-kernel moments over one step, offsets measured from the step's
        TARGET λ. M0 = 1 − e^{−h}; M1 = −1 + (h+1)e^{−h} (→ −1 as h→∞)."""
        emh = jnp.exp(-h)
        return 1.0 - emh, -1.0 + (h + 1.0) * emh

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

        Same rng-split convention and ``history_length`` frame-capture
        contract as the other samplers (drop-in for the sample subcommand
        and serving)."""
        x_key, _ = jax.random.split(rng)
        x_t = jax.random.normal(x_key, img_shape, jnp.float32)
        idxs = jnp.arange(self.sub_timesteps, 0, -1, dtype=jnp.int32)  # S..1

        from dmme_tpu.diffusion.ddpm import capture_frame, make_history_capture

        capture, history0 = make_history_capture(
            self.sub_timesteps, history_length, img_shape
        )

        def x0_of(x, t_vec, s_t, a_t):
            out = model_fn(params, x, t_vec).astype(jnp.float32)
            if self.parameterization == "v":
                out = eq.ddpm.eps_from_v(out, x, jnp.square(a_t))
            x0 = (x - s_t * out) / a_t
            if self.clip_x0:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        def body(carry, i):
            if capture is None:
                x_pred, x_anchor, d_prev, lam_prev, s_prev, have = carry
            else:
                (x_pred, x_anchor, d_prev, lam_prev, s_prev, have), hist = carry
            t_cur = self.tau[i]
            t_next = self.tau[i - 1]
            a_c, s_c, lam_c = self._coeffs(t_cur)
            a_n, s_n, lam_n = self._coeffs(t_next)

            t_vec = jnp.broadcast_to(t_cur, (x_pred.shape[0],))
            d_cur = x0_of(x_pred, t_vec, s_c, a_c)

            # ---- UniC: re-integrate the step that produced x_pred, now
            # that x̂₀ at its target is known (linear x̂₀ through both
            # endpoints, e^λ kernel integrated exactly) -----------------
            hc = lam_c - lam_prev
            if self.corrector:
                m0c, m1c = self._kernel_moments(hc)
                slope_c = (d_cur - d_prev) / jnp.maximum(hc, 1e-38)
                x_corr = (s_c / jnp.maximum(s_prev, 1e-38)) * x_anchor + a_c * (
                    d_cur * m0c + slope_c * m1c
                )
                # first step has no anchor; degenerate repeated-τ (hc==0)
                # keeps the prediction; t_cur==0 only occurs on degenerate
                # τ tables, where σ=0 makes d_cur NaN — skip there too
                usable = (have > 0.5) & (hc > 0.0) & (t_cur != 0)
                x_cur = jnp.where(usable, x_corr, x_pred)
            else:
                x_cur = x_pred

            # ---- UniP: predict to t_next -------------------------------
            h = lam_n - lam_c
            m0, m1 = self._kernel_moments(h)
            first = (s_n / jnp.maximum(s_c, 1e-38)) * x_cur + a_n * (d_cur * m0)
            if self.order == 1:
                x_next = first
            else:
                # linear x̂₀ through (λ_c, d_cur) and (λ_prev, d_prev):
                # ∫ e^u [d_cur + (u + h)·slope] du = d_cur·M0 + slope·(M1 + h·M0)
                gap = lam_c - lam_prev
                slope = (d_cur - d_prev) / jnp.maximum(gap, 1e-38)
                second = first + a_n * slope * (m1 + h * m0)
                # lower_order_final: no history yet, the final (τ=0) step
                # (clamped-finite λ makes h huge and the slope term
                # unbounded), or a zero λ-gap after a repeated-τ identity
                # step (the slope is 0/0 there)
                use_first = (have < 0.5) | (t_next == 0) | (gap <= 0.0)
                x_next = jnp.where(use_first, first, second)
            # degenerate repeated-τ entry: identity (h == 0 ⇒ 0/0 ratios)
            x_next = jnp.where(t_cur == t_next, x_cur, x_next)

            new_carry = (x_next, x_cur, d_cur, lam_c, s_c, jnp.float32(1.0))
            if capture is None:
                return new_carry, None
            hist = capture_frame(capture, hist, self.sub_timesteps - i, x_next)
            return (new_carry, hist), None

        zero = jnp.float32(0.0)
        init = (x_t, x_t, jnp.zeros_like(x_t), zero, jnp.float32(1.0), zero)
        if capture is None:
            (x_0, *_), _ = jax.lax.scan(body, init, idxs)
            return x_0
        ((x_0, *_), history), _ = jax.lax.scan(body, (init, history0), idxs)
        return x_0, history
