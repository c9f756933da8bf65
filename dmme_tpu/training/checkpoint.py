"""Checkpoint/resume via Orbax (async-capable, atomic).

TPU-native counterpart of Lightning ``ModelCheckpoint`` + the EMA sidecar
machinery (reference: configs save_last + every 100k steps, EMA restore at
src/dmme/callbacks/ema.py:131-166). Here EMA params ride in the same state
pytree, so one atomic checkpoint covers {step, params, ema, opt_state}; the
optimizer transformation and schedule buffers are rebuilt at init exactly
like the reference's ``persistent=False`` buffers.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from dmme_tpu.training.state import TrainState


def _pure(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
    }


class CheckpointManager:
    """Thin wrapper over ``ocp.CheckpointManager``: keep last + every-N."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3):
        # max_to_keep=None keeps every checkpoint (demo/analysis runs that
        # need the full convergence trajectory, e.g. docs/training_demo.md)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, *, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_pure(state)), force=force)

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint to restore"
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_pure(state_like))
        )
        return state_like.replace(
            step=restored["step"],
            params=restored["params"],
            ema_params=restored["ema_params"],
            opt_state=restored["opt_state"],
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
