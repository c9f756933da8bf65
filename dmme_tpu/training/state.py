"""Train state — one pytree carrying everything a training step mutates.

The TPU-native analogue of the reference's scattered state (module params +
Adam state inside ``EMAOptimizer`` + ``_step_count`` in the LR scheduler +
EMA copies on a side stream — src/dmme/callbacks/ema.py:169-372). Holding
{step, params, ema_params, opt_state} in a single donated pytree lets XLA
update everything in place in one fused program, and Orbax checkpoints it
atomically (schedule buffers are recomputed at init, exactly like the
reference's ``persistent=False`` buffers).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dmme_tpu.training.ema import ema_update


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    # Reference EMA knob ``every_n_steps`` (callbacks/ema.py:27-46): update
    # the moving average only every N optimizer steps.
    ema_every_n_steps: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(
        cls,
        params: Any,
        tx: optax.GradientTransformation,
        ema_decay: float = 0.9999,
        ema_every_n_steps: int = 1,
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=tx.init(params),
            tx=tx,
            ema_decay=ema_decay,
            ema_every_n_steps=ema_every_n_steps,
        )

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        if self.ema_every_n_steps <= 1:
            ema_params = ema_update(self.ema_params, params, self.ema_decay)
        else:
            # Branchless skip: a jnp.where blend keeps the step a single
            # fused program (no lax.cond retrace per predicate value).
            do = (self.step + 1) % self.ema_every_n_steps == 0
            new_ema = ema_update(self.ema_params, params, self.ema_decay)
            ema_params = jax.tree.map(
                lambda n, o: jnp.where(do, n, o), new_ema, self.ema_params
            )
        return self.replace(
            step=self.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
