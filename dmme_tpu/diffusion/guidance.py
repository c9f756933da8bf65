"""Classifier guidance — working, fully inside jit (unlike the reference).

The reference's guidance module is WIP and broken (stale imports,
src/dmme/guidance/classifier.py:4-5; README.md:62). This module implements
the behavior its code describes, composed with ``jax.grad`` so the
classifier gradient is part of the same jitted sampling step — no host
round-trips, and it nests inside the ``lax.scan`` samplers (the BASELINE.json
requirement).

One deliberate fix: the reference computes ``log_probs[:, y]`` which for a
vector ``y`` is an (N, N) advanced-index — every sample is pushed toward every
label in the batch. We select per-sample labels
(``log_probs[arange(N), y]``), the ADM paper's actual definition.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dmme_tpu.diffusion.ddpm import DDPM, ModelFn, _bcast
from dmme_tpu.diffusion.ddim import DDIM


def classifier_grad(
    classifier_fn: ModelFn,
    classifier_params: Any,
    y: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """∇_{x_t} log p_φ(y | x_t, t) via reverse-mode AD.

    Replaces the reference's enable_grad/autograd.grad dance
    (src/dmme/guidance/classifier.py:9-23) with a pure ``jax.grad`` that
    lowers into the same XLA program as the sampler.
    """
    y = jnp.asarray(y, jnp.int32).reshape(x_t.shape[0])

    def selected_log_prob(x):
        logits = classifier_fn(classifier_params, x, t)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(log_probs, y[:, None], axis=-1)
        return jnp.sum(picked)  # sum preserves per-sample gradients

    return jax.grad(selected_log_prob)(x_t)


@struct.dataclass
class ClassifierGuidedDDPM(DDPM):
    """DDPM ancestral sampling nudged by a noisy classifier.

    Update per reference spec (src/dmme/guidance/classifier.py:26-36):
    one reverse step, then x += s·∇ log p_φ(y|x, t) evaluated at the new x.
    """

    guidance_scale: float = struct.field(pytree_node=False, default=10.0)

    @classmethod
    def create(cls, timesteps: int = 1000, guidance_scale: float = 10.0,
               start: float = 0.0001, end: float = 0.02) -> "ClassifierGuidedDDPM":
        base = DDPM.create(timesteps, start, end)
        return cls(schedule=base.schedule, timesteps=timesteps,
                   guidance_scale=guidance_scale)

    def guided_sampling_step(
        self,
        model_fn: ModelFn,
        params: Any,
        classifier_fn: ModelFn,
        classifier_params: Any,
        y: jax.Array,
        x_t: jax.Array,
        t: jax.Array,
        rng: jax.Array,
    ) -> jax.Array:
        t_vec = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (x_t.shape[0],))
        x = self.sampling_step(model_fn, params, x_t, t_vec, rng)
        grad = classifier_grad(classifier_fn, classifier_params, y, x, t_vec)
        return x + self.guidance_scale * grad

    def guided_generate(
        self,
        model_fn: ModelFn,
        params: Any,
        classifier_fn: ModelFn,
        classifier_params: Any,
        y: jax.Array,
        rng: jax.Array,
        img_shape: Tuple[int, ...],
    ) -> jax.Array:
        """Full guided reverse process as one ``lax.scan`` — the classifier
        grad is differentiated through inside the scan body."""
        x_key, scan_key = jax.random.split(rng)
        x = jax.random.normal(x_key, img_shape, jnp.float32)
        ts = jnp.arange(self.timesteps, 0, -1, dtype=jnp.int32)

        def body(x, t):
            x = self.guided_sampling_step(
                model_fn, params, classifier_fn, classifier_params, y, x, t,
                jax.random.fold_in(scan_key, t),
            )
            return x, None

        x0, _ = jax.lax.scan(body, x, ts)
        return x0


@struct.dataclass
class ClassifierGuidedDDIM(DDIM):
    """Deterministic DDIM sampling with classifier-corrected ε.

    ε̂ = ε_θ(x,t) − √(1−ᾱ_t)·s·∇ log p_φ(y|x,t), then the canonical DDIM
    update including the direction term — the reference's own spec
    (src/dmme/guidance/classifier.py:47-60, the only place it writes the
    canonical update).
    """

    guidance_scale: float = struct.field(pytree_node=False, default=10.0)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        sub_timesteps: int = 50,
        tau_schedule: str = "quadratic",
        guidance_scale: float = 10.0,
    ) -> "ClassifierGuidedDDIM":
        base = DDIM.create(timesteps, sub_timesteps, tau_schedule)
        return cls(
            schedule=base.schedule,
            timesteps=timesteps,
            tau=base.tau,
            sub_timesteps=sub_timesteps,
            eta=0.0,
            variant="canonical",
            guidance_scale=guidance_scale,
        )

    def guided_sampling_step(
        self,
        model_fn: ModelFn,
        params: Any,
        classifier_fn: ModelFn,
        classifier_params: Any,
        y: jax.Array,
        x: jax.Array,
        i: jax.Array,
    ) -> jax.Array:
        i = jnp.broadcast_to(jnp.asarray(i, jnp.int32), (x.shape[0],))
        tau_i = self.tau[i]
        tau_prev = self.tau[i - 1]
        ab_t = _bcast(self.schedule.alpha_bar[tau_i], x.ndim)
        ab_prev = _bcast(self.schedule.alpha_bar[tau_prev], x.ndim)

        grad = classifier_grad(classifier_fn, classifier_params, y, x, tau_i)
        eps = model_fn(params, x, tau_i).astype(x.dtype)
        eps = eps - jnp.sqrt(1.0 - ab_t) * self.guidance_scale * grad

        x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) * jax.lax.rsqrt(ab_t)
        return jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1.0 - ab_prev) * eps

    def guided_generate(
        self,
        model_fn: ModelFn,
        params: Any,
        classifier_fn: ModelFn,
        classifier_params: Any,
        y: jax.Array,
        rng: jax.Array,
        img_shape: Tuple[int, ...],
    ) -> jax.Array:
        x = jax.random.normal(rng, img_shape, jnp.float32)
        iis = jnp.arange(self.sub_timesteps, 0, -1, dtype=jnp.int32)

        def body(x, i):
            return (
                self.guided_sampling_step(
                    model_fn, params, classifier_fn, classifier_params, y, x, i
                ),
                None,
            )

        x0, _ = jax.lax.scan(body, x, iis)
        return x0
