"""Training harness: Lit modules, state, optimizer, EMA, loops, checkpointing."""

from dmme_tpu.training.lit import (LitDDPM, LitDDIM, LitDistill, LitEDM,
                                    LitFlow, LitIDDPM, LitUpsampler)
from dmme_tpu.training.classifier import LitClassifier
from dmme_tpu.training.latent import (LatentMixin, LitLatentDDPM,
                                      LitLatentFlow, LitVAE)
from dmme_tpu.training.state import TrainState
from dmme_tpu.training.ema import ema_update
from dmme_tpu.training.lr_schedule import warmup_schedule
from dmme_tpu.training.loop import fit
from dmme_tpu.training.checkpoint import CheckpointManager
from dmme_tpu.training.metrics import MetricLogger

__all__ = [
    "LitDDPM",
    "LitDDIM",
    "LitIDDPM",
    "LitEDM",
    "LitFlow",
    "LitDistill",
    "LitClassifier",
    "LitUpsampler",
    "LitVAE",
    "LitLatentDDPM",
    "LitLatentFlow",
    "LatentMixin",
    "TrainState",
    "ema_update",
    "warmup_schedule",
    "fit",
    "CheckpointManager",
    "MetricLogger",
]
