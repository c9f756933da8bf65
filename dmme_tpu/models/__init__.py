"""Denoiser networks (reference: src/dmme/models/__init__.py).

``models.ddpm.UNet`` (ε-prediction) and ``models.iddpm.UNet`` (ε + learned
variance) are config presets of one shared NHWC linen UNet; ``models.adm``
adds the guided-diffusion ADM family the reference's tests promise but never
implement (tests/test_adm.py).
"""

from dmme_tpu.models import ddpm
from dmme_tpu.models import iddpm
from dmme_tpu.models.unet import UNet, build_topology
from dmme_tpu.models import blocks

__all__ = ["ddpm", "iddpm", "UNet", "build_topology", "blocks"]
