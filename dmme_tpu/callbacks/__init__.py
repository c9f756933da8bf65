"""Training callbacks (reference: src/dmme/callbacks/__init__.py).

The reference ships EMA + GenerateImage. EMA is not a callback here — it is
one fused pytree update inside the train step (see
``dmme_tpu.training.ema``); GenerateImage remains.
"""

from dmme_tpu.callbacks.generate import GenerateImage
from dmme_tpu.callbacks.profile import ProfileTrace

__all__ = ["GenerateImage", "ProfileTrace"]
