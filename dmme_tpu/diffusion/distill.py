"""Progressive distillation — halve sampling steps per round
(Salimans & Ho 2022, arXiv:2202.00512 §3; capability beyond the reference).

A teacher that samples in 2N deterministic DDIM steps is distilled into a
student that samples in N: for a student grid point t, the student's ONE
DDIM step t → t_prev must land where the teacher's TWO steps
t → t_mid → t_prev land. The regression target is expressed in x₀-space
(the unique x̃₀ whose one-step DDIM update from x_t reproduces the
teacher's two-step endpoint) and trained with the paper's truncated-SNR
weight max(SNR, 1)·‖x̂₀ − x̃₀‖².

Everything is pure/jittable: ``loss`` plugs into the standard fit loop
(teacher parameters ride in the closure as device constants), and after a
round the student becomes the next round's teacher with N → N/2
(:func:`next_round`). The student should use the "v" parameterization —
at high noise x₀-from-ε is ill-conditioned (paper §4) — but both are
supported for teacher AND student.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

import dmme_tpu.equations as eq
from dmme_tpu.diffusion.ddim import DDIM
from dmme_tpu.diffusion.ddpm import _bcast

ModelFn = Callable[..., jax.Array]


def _alpha_sigma(schedule, t, ndim):
    ab = _bcast(schedule.alpha_bar[t], ndim)
    return jnp.sqrt(ab), jnp.sqrt(1.0 - ab), ab


def _to_x0(out, x_t, alpha, sigma, ab, parameterization):
    """Network output → x̂₀ under the given parameterization."""
    if parameterization == "v":
        return alpha * x_t - sigma * out
    return (x_t - sigma * out) / jnp.maximum(alpha, 1e-20)


def ddim_step_from_x0(x_t, x0_hat, alpha_t, sigma_t, alpha_prev, sigma_prev):
    """Canonical η=0 DDIM update written in x₀ form:
    x_prev = α_prev·x̂₀ + σ_prev·ε̂  with  ε̂ = (x_t − α_t·x̂₀)/σ_t."""
    eps_hat = (x_t - alpha_t * x0_hat) / jnp.maximum(sigma_t, 1e-20)
    return alpha_prev * x0_hat + sigma_prev * eps_hat


@struct.dataclass
class ProgressiveDistillation:
    """One distillation round: teacher on a 2N-step τ grid, student on N.

    Grids nest by construction (linear τ over the same T): the student's
    τ[i] equals the teacher's τ[2i], so every student step spans exactly
    two teacher steps.
    """

    schedule: Any                        # eq.ddpm.Schedule
    teacher_tau: jax.Array               # (2N+1,) int32
    student_tau: jax.Array               # (N+1,) int32
    timesteps: int = struct.field(pytree_node=False, default=1000)
    student_steps: int = struct.field(pytree_node=False, default=512)
    teacher_parameterization: str = struct.field(pytree_node=False, default="v")
    student_parameterization: str = struct.field(pytree_node=False, default="v")

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        student_steps: int = 512,
        start: float = 0.0001,
        end: float = 0.02,
        teacher_parameterization: str = "v",
        student_parameterization: str = "v",
        schedule=None,
    ) -> "ProgressiveDistillation":
        assert student_steps >= 1
        # the teacher grid has 2N points over T steps; with 2N > T,
        # linear_tau produces DUPLICATE τ values and the teacher's "two
        # steps" silently degenerate to one (zero training signal there)
        assert 2 * student_steps <= timesteps, (
            f"teacher grid 2·{student_steps} exceeds timesteps={timesteps}; "
            f"start distillation at student_steps <= timesteps // 2"
        )
        if schedule is None:
            beta = eq.ddpm.linear_schedule(timesteps, start, end)
            schedule = eq.ddpm.schedule_from_beta(beta)
        teacher_tau = eq.ddim.linear_tau(timesteps, 2 * student_steps)
        return cls(
            schedule=schedule,
            teacher_tau=teacher_tau,
            # every-other teacher point: nesting by construction, immune to
            # rounding differences between the two linear_tau evaluations
            student_tau=teacher_tau[::2],
            timesteps=timesteps,
            student_steps=student_steps,
            teacher_parameterization=teacher_parameterization,
            student_parameterization=student_parameterization,
        )

    # ------------------------------------------------------------------ target
    def teacher_target_x0(
        self,
        teacher_fn: ModelFn,
        teacher_params: Any,
        x_t: jax.Array,
        i: jax.Array,
    ) -> jax.Array:
        """x̃₀ such that ONE student DDIM step from (x_t, t) lands exactly on
        the teacher's TWO-step endpoint (paper eq. 9, discrete grid)."""
        ndim = x_t.ndim
        t = self.student_tau[i]
        t_mid = self.teacher_tau[2 * i - 1]
        t_prev = self.student_tau[i - 1]
        a_t, s_t, ab_t = _alpha_sigma(self.schedule, t, ndim)
        a_m, s_m, ab_m = _alpha_sigma(self.schedule, t_mid, ndim)
        a_p, s_p, ab_p = _alpha_sigma(self.schedule, t_prev, ndim)

        out1 = teacher_fn(teacher_params, x_t, t).astype(x_t.dtype)
        x0_1 = _to_x0(out1, x_t, a_t, s_t, ab_t, self.teacher_parameterization)
        x_mid = ddim_step_from_x0(x_t, x0_1, a_t, s_t, a_m, s_m)

        out2 = teacher_fn(teacher_params, x_mid, t_mid).astype(x_t.dtype)
        x0_2 = _to_x0(out2, x_mid, a_m, s_m, ab_m, self.teacher_parameterization)
        x_pp = ddim_step_from_x0(x_mid, x0_2, a_m, s_m, a_p, s_p)

        # invert the one-step update: x_pp = α_p·x̃₀ + (σ_p/σ_t)(x_t − α_t·x̃₀)
        ratio = s_p / jnp.maximum(s_t, 1e-20)
        denom = a_p - ratio * a_t
        return (x_pp - ratio * x_t) / jnp.maximum(denom, 1e-20)

    # -------------------------------------------------------------------- loss
    def loss_given(
        self,
        teacher_fn: ModelFn,
        teacher_params: Any,
        student_fn: ModelFn,
        student_params: Any,
        x_0: jax.Array,
        i: jax.Array,
        noise: jax.Array,
        *,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Truncated-SNR-weighted x₀ regression with injected draws."""
        ndim = x_0.ndim
        t = self.student_tau[i]
        a_t, s_t, ab_t = _alpha_sigma(self.schedule, t, ndim)
        x_t = eq.ddpm.q_sample(x_0, ab_t, noise)

        x0_target = jax.lax.stop_gradient(
            self.teacher_target_x0(teacher_fn, teacher_params, x_t, i)
        )
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        out = student_fn(student_params, x_t, t, train=train, rngs=rngs)
        x0_hat = _to_x0(out.astype(x_0.dtype), x_t, a_t, s_t, ab_t,
                        self.student_parameterization)
        w = jnp.maximum(ab_t / jnp.maximum(1.0 - ab_t, 1e-20), 1.0)  # max(SNR,1)
        return jnp.mean(w * jnp.square(x0_hat - x0_target))

    def loss(
        self,
        teacher_fn: ModelFn,
        teacher_params: Any,
        student_fn: ModelFn,
        student_params: Any,
        rng: jax.Array,
        x_0: jax.Array,
        *,
        train: bool = True,
    ) -> jax.Array:
        i_key, n_key, d_key = jax.random.split(rng, 3)
        n = x_0.shape[0]
        i = jax.random.randint(i_key, (n,), 1, self.student_steps + 1, dtype=jnp.int32)
        noise = jax.random.normal(n_key, x_0.shape, x_0.dtype)
        return self.loss_given(
            teacher_fn, teacher_params, student_fn, student_params,
            x_0, i, noise, train=train, dropout_rng=d_key,
        )

    # ----------------------------------------------------------------- rounds
    def student_sampler(self) -> DDIM:
        """The N-step DDIM sampler matching the student grid (canonical η=0,
        parameterization = student's)."""
        return DDIM(
            schedule=self.schedule,
            timesteps=self.timesteps,
            tau=self.student_tau,
            sub_timesteps=self.student_steps,
            eta=0.0,
            variant="canonical",
            parameterization=self.student_parameterization,
        )

    def next_round(self) -> "ProgressiveDistillation":
        """Student becomes the teacher; steps halve (N must be even)."""
        assert self.student_steps % 2 == 0, self.student_steps
        return ProgressiveDistillation(
            schedule=self.schedule,
            teacher_tau=self.student_tau,
            student_tau=self.student_tau[::2],
            timesteps=self.timesteps,
            student_steps=self.student_steps // 2,
            teacher_parameterization=self.student_parameterization,
            student_parameterization=self.student_parameterization,
        )
