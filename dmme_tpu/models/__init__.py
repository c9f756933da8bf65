"""Denoiser networks (reference: src/dmme/models/__init__.py).

``models.ddpm.UNet`` (ε-prediction) and ``models.iddpm.UNet`` (ε + learned
variance) are config presets of one shared NHWC linen UNet; ``models.adm``
adds the guided-diffusion ADM family the reference's tests promise but never
implement (tests/test_adm.py).
"""

import jax.numpy as jnp

from dmme_tpu.models import ddpm
from dmme_tpu.models import iddpm
from dmme_tpu.models import adm
from dmme_tpu.models import dit
from dmme_tpu.models import vae
from dmme_tpu.models.unet import UNet, build_topology
from dmme_tpu.models.dit import DiT
from dmme_tpu.models.vae import ConvVAE
from dmme_tpu.models import blocks


def as_model_fn(module):
    """Adapt a linen module to the diffusion layer's denoiser contract:
    ``model_fn(params, x, t, *, y=None, train=False, rngs=None)``
    (``y``: optional class labels for conditional models)."""

    def model_fn(params, x, t, *, y=None, train=False, rngs=None):
        if y is None:
            return module.apply(params, x, t, train=train, rngs=rngs)
        return module.apply(params, x, t, y=y, train=train, rngs=rngs)

    return model_fn


def eps_only(model_fn):
    """Adapt a variance-learning denoiser (2C-channel output: ε ‖ v, the
    IDDPM convention) to the ε-only contract the ODE samplers consume —
    an IDDPM-trained model can then drive DDIM / DPM-Solver++ / EDM-style
    fast sampling directly (capability beyond the reference, whose IDDPM
    can only sample through its own ancestral loop)."""

    def fn(params, x, t, **kwargs):
        out = model_fn(params, x, t, **kwargs)
        eps, _ = jnp.split(out, 2, axis=-1)
        return eps

    return fn


__all__ = [
    "ddpm", "iddpm", "dit", "vae", "UNet", "DiT", "ConvVAE",
    "build_topology", "blocks", "as_model_fn", "eps_only",
]
