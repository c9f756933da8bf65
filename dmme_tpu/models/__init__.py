"""Denoiser networks (reference: src/dmme/models/__init__.py).

``models.ddpm.UNet`` (ε-prediction) and ``models.iddpm.UNet`` (ε + learned
variance) are config presets of one shared NHWC linen UNet; ``models.adm``
adds the guided-diffusion ADM family the reference's tests promise but never
implement (tests/test_adm.py).
"""

from dmme_tpu.models import ddpm
from dmme_tpu.models import iddpm
from dmme_tpu.models import adm
from dmme_tpu.models.unet import UNet, build_topology
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


__all__ = ["ddpm", "iddpm", "UNet", "build_topology", "blocks", "as_model_fn"]
