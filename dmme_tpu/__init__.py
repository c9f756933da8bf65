"""dmme-tpu: a TPU-native diffusion-models framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
urw7rs/diffusion-models-made-easy v0.5.2 (reference layer map in SURVEY.md §1):

* ``dmme_tpu.equations``  — pure schedule/process/loss math (jnp functions)
* ``dmme_tpu.models``     — UNet denoisers (flax.linen, NHWC, bf16-ready)
* ``dmme_tpu.diffusion``  — DDPM / DDIM / IDDPM algorithms as pytrees with
  jittable train/sample steps and ``lax.scan`` samplers
* ``dmme_tpu.ops``        — Pallas TPU kernels for the hot ops
* ``dmme_tpu.parallel``   — device mesh, shardings, pjit train steps
* ``dmme_tpu.training``   — optimizer/EMA/TrainState/loop (Lightning-module
  analogues ``LitDDPM``/``LitDDIM``/``LitIDDPM``)
* ``dmme_tpu.data``       — CIFAR-10 / LSUN data modules with on-device augs
* ``dmme_tpu.eval``       — FID / Inception Score
"""

__version__ = "0.5.0"

from dmme_tpu.utils import (
    gaussian,
    gaussian_like,
    uniform_int,
    pad,
    norm,
    denorm,
    make_history,
)
from dmme_tpu import equations

# Top-level API parity with the reference package root
# (src/dmme/__init__.py:1-25 re-exports lit modules and data modules).
from dmme_tpu import models
from dmme_tpu import diffusion
from dmme_tpu import diffusion as diffusion_models  # reference naming alias
from dmme_tpu.training import LitDDPM, LitDDIM, LitEDM, LitIDDPM, LitClassifier
from dmme_tpu.data import CIFAR10, LSUN, ImageFolder64
from dmme_tpu import datasets
from dmme_tpu import callbacks

__all__ = [
    "gaussian",
    "gaussian_like",
    "uniform_int",
    "pad",
    "norm",
    "denorm",
    "make_history",
    "equations",
    "models",
    "diffusion",
    "diffusion_models",
    "datasets",
    "LitDDPM",
    "LitDDIM",
    "LitEDM",
    "LitIDDPM",
    "LitClassifier",
    "CIFAR10",
    "LSUN",
    "ImageFolder64",
    "__version__",
]
