"""Exponential moving average of parameters — as a pytree map.

Replaces the reference's 376-line vendored NVIDIA NeMo ``EMA`` callback +
``EMAOptimizer`` (src/dmme/callbacks/ema.py): on TPU the EMA update is one
fused multiply-add over the parameter pytree *inside* the jitted train step —
no side streams, no CPU threads, no weight-swapping machinery. Evaluation
reads ``state.ema_params`` directly; checkpointing persists both trees.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """ema ← decay·ema + (1 − decay)·params (reference: callbacks/ema.py:169-176)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )
