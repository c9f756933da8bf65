"""Classifier-free guidance (Ho & Salimans 2022, arXiv:2207.12598).

Capability beyond the reference (which only has CLASSIFIER guidance — and
that broken): CFG needs no separate classifier; the conditional model is
trained with label dropout (a fraction of labels replaced by a NULL token)
and at sampling time the noise prediction is extrapolated past the
conditional one:

    ε̂_cfg = ε̂(x, t, ∅) + w · (ε̂(x, t, y) − ε̂(x, t, ∅))

(w = 1 recovers the plain conditional model; w = 0 the unconditional one.)

Design: conditioning stays OUT of the diffusion algorithms. Training-time
label dropout lives in ``LitDDPM(num_classes=..., cond_dropout=...)``;
sampling-time guidance is :func:`classifier_free` — a model_fn wrapper with
the unconditional denoiser signature, so EVERY sampler (ancestral DDPM,
DDIM, DPM-Solver++, CachedDDIM) works guided without modification. The two
branches run as one doubled-batch network call (efficient on the MXU; no
second weight pass).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

ModelFn = Callable[..., jax.Array]


def classifier_free(
    model_fn: ModelFn,
    y: jax.Array,
    guidance_scale: float,
    null_label: int,
) -> ModelFn:
    """Bind labels + guidance weight into an unconditional-signature model_fn.

    Args:
        model_fn: conditional denoiser ``(params, x, t, *, y, ...) -> eps``.
        y: int labels, shape (N,) — the classes to generate.
        guidance_scale: w; 1.0 = plain conditional, >1 sharpens class
            adherence at a diversity cost.
        null_label: the unconditional token index (for the shared UNet:
            ``num_classes`` — the extra embedding row).

    For models with doubled output channels (IDDPM's ε‖v), guidance applies
    to the ε half ONLY; the learned-variance channels pass through from the
    CONDITIONAL branch unmodified — the guided-diffusion convention
    (extrapolating v with w > 1 would push the variance-interpolation
    coefficient out of [0, 1] and mis-calibrate the ancestral step noise).
    """
    w = float(guidance_scale)

    def guided(params, x, t, *, train=False, rngs=None):
        n = x.shape[0]
        labels = jnp.asarray(y, jnp.int32)
        labels = jnp.broadcast_to(labels, (n,))
        xx = jnp.concatenate([x, x], axis=0)
        tt = jnp.concatenate([t, t], axis=0)
        yy = jnp.concatenate(
            [labels, jnp.full((n,), null_label, jnp.int32)], axis=0
        )
        out = model_fn(params, xx, tt, y=yy, train=train, rngs=rngs)
        cond, uncond = out[:n], out[n:]
        if out.shape[-1] == 2 * x.shape[-1]:  # ε‖v: guide ε, keep cond v
            c_eps, c_v = jnp.split(cond, 2, axis=-1)
            u_eps, _ = jnp.split(uncond, 2, axis=-1)
            return jnp.concatenate(
                [u_eps + w * (c_eps - u_eps), c_v], axis=-1
            )
        return uncond + w * (cond - uncond)

    return guided
