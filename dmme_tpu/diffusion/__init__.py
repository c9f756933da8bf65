"""Diffusion algorithms (reference: src/dmme/diffusion_models/__init__.py).

Immutable schedule pytrees + pure jittable train/sample functions. Guidance
ships working (the reference's is WIP/broken — SURVEY.md §2 #15).
"""

from dmme_tpu.diffusion.ddpm import DDPM
from dmme_tpu.diffusion.ddim import DDIM
from dmme_tpu.diffusion.iddpm import IDDPM, NoiseVariance
from dmme_tpu.diffusion.guidance import (
    ClassifierGuidedDDPM,
    ClassifierGuidedDDIM,
    classifier_grad,
)
from dmme_tpu.diffusion.fast import CachedDDIM
from dmme_tpu.diffusion.dpm_solver import DPMSolverPP
from dmme_tpu.diffusion.cfg import classifier_free
from dmme_tpu.diffusion.edm import EDM
from dmme_tpu.diffusion.flow import FlowMatching
from dmme_tpu.diffusion.distill import ProgressiveDistillation
from dmme_tpu.diffusion.factory import make_sampler
from dmme_tpu.diffusion.deep_cache import DeepCachedDDIM, DeepCachedDPM
from dmme_tpu.diffusion.unipc import UniPC
from dmme_tpu.diffusion.inpaint import inpaint

__all__ = [
    "DDPM",
    "DDIM",
    "IDDPM",
    "NoiseVariance",
    "ClassifierGuidedDDPM",
    "ClassifierGuidedDDIM",
    "classifier_grad",
    "CachedDDIM",
    "DPMSolverPP",
    "classifier_free",
    "EDM",
    "FlowMatching",
    "ProgressiveDistillation",
    "make_sampler",
    "DeepCachedDDIM",
    "DeepCachedDPM",
    "UniPC",
    "inpaint",
]
