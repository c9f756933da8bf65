"""Learning-rate schedules (reference: src/dmme/lr_scheduler/warmup.py:4-19)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_schedule(lr: float, warmup: int):
    """Linear warmup to ``lr`` over ``warmup`` optimizer steps, then constant.

    Matches the reference's ``WarmupLR``: lr(step) = lr · min(1, (step+1)/warmup)
    (``optimizer._step_count + 1`` in torch is the 1-based step count).
    """
    if warmup <= 0:
        return lambda count: jnp.asarray(lr, jnp.float32)

    def schedule(count):
        return lr * jnp.minimum((count + 1.0) / warmup, 1.0)

    return schedule
