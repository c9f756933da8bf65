"""Mask-conditioned generation (inpainting) with any trained DDPM/IDDPM.

Capability beyond the reference: RePaint-style inpainting (Lugmayr et al.
2022, arXiv:2201.09865) needs NO special training — an unconditional
diffusion model is conditioned at sampling time by compositing the known
region's forward-diffused pixels into every reverse step:

    x_{t-1} = mask · q_sample(known, t-1)  +  (1-mask) · p_θ-step(x_t)

Because the schedule keeps the reference's ᾱ₀ = 1 sentinel row, the final
composite at t−1 = 0 restores the known pixels EXACTLY (q_sample with
ᾱ = 1 is the identity) — tested.

``resample_steps > 1`` adds RePaint's harmonization loop (jump length 1):
after each composite the state is re-noised one step forward and the
reverse step re-runs, letting the generated region adapt to the known
content instead of merely abutting it. Cost: NFE × resample_steps.

The whole trajectory is one ``lax.scan`` (the resample loop unrolls
statically inside the body), same as every other sampler here. Works with
any algorithm exposing the ancestral contract — ``sampling_step(model_fn,
params, x, t, rng)``, a ``schedule`` and ``timesteps`` — i.e. DDPM and
the learned-variance IDDPM.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

import dmme_tpu.equations as eq

ModelFn = Callable[..., jax.Array]


def inpaint(
    algo,
    model_fn: ModelFn,
    params: Any,
    rng: jax.Array,
    known: jax.Array,
    mask: jax.Array,
    *,
    resample_steps: int = 1,
) -> jax.Array:
    """Generate images matching ``known`` wherever ``mask`` is 1.

    Args:
        algo: trained ancestral algorithm (DDPM / IDDPM pytree).
        known: (N, H, W, C) images in the model's [-1, 1] domain; only the
            ``mask==1`` pixels are read.
        mask: broadcastable to ``known``; 1 = keep (known), 0 = generate.
        resample_steps: RePaint harmonization repeats per timestep (≥ 1).

    Returns (N, H, W, C) samples with the known region restored exactly.
    """
    assert resample_steps >= 1, resample_steps
    mask = jnp.asarray(mask, jnp.float32)
    known = jnp.asarray(known, jnp.float32)
    x_key, scan_key = jax.random.split(rng)
    x = jax.random.normal(x_key, known.shape, jnp.float32)
    ts = jnp.arange(algo.timesteps, 0, -1, dtype=jnp.int32)
    ab = algo.schedule.alpha_bar
    beta = algo.schedule.beta

    def composite(x, t, key):
        """Overwrite the known region with its forward-diffused value at
        t−1 (exact at t−1 = 0 thanks to the ᾱ₀ = 1 sentinel)."""
        ab_prev = ab[t - 1]
        noise = jax.random.normal(key, known.shape, jnp.float32)
        x_known = eq.ddpm.q_sample(known, ab_prev, noise)
        return mask * x_known + (1.0 - mask) * x

    def body(x, t):
        for u in range(resample_steps):
            key = jax.random.fold_in(jax.random.fold_in(scan_key, t), u)
            k_step, k_known, k_renoise = jax.random.split(key, 3)
            x = algo.sampling_step(model_fn, params, x, t, k_step)
            x = composite(x, t, k_known)
            if u < resample_steps - 1:
                # harmonize: one forward step t−1 → t, then re-reverse
                noise = jax.random.normal(k_renoise, known.shape, jnp.float32)
                x = jnp.sqrt(1.0 - beta[t]) * x + jnp.sqrt(beta[t]) * noise
        return x, None

    x_0, _ = jax.lax.scan(body, x, ts)
    return x_0
