"""GenerateImage callback — periodic sample grids during training.

Reference: src/dmme/callbacks/generate.py:10-88 (every N epochs, run the full
reverse loop step-by-step through ``pl_module(x_t, t)``, grid via
``make_history``, log to W&B/TensorBoard). TPU-native version: the whole
trajectory is ONE jitted ``lax.scan`` with on-device history capture
(``generate(history_length=...)``), using the EMA weights; grids are written
as PNG (PIL) or NPY next to the run directory.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from dmme_tpu.utils.norm import denorm
from dmme_tpu.utils.vis import make_history


class GenerateImage:
    """Callback for :func:`dmme_tpu.training.fit`.

    Args:
        imgsize: (C, H, W) like the reference's config, or (H, W, C); stored
            canonically as NHWC.
        every_n_steps: generation cadence in optimizer steps (the reference
            uses every 5 epochs ≈ 2000 steps on CIFAR-10).
        num_samples: batch of trajectories to render.
        vis_length: frames per trajectory (reference default 10).
        out_dir: where PNG/NPY grids go; created on first use.
    """

    def __init__(
        self,
        imgsize: Sequence[int] = (3, 32, 32),
        every_n_steps: int = 2000,
        num_samples: int = 8,
        vis_length: int = 10,
        out_dir: str = "samples",
        use_ema: Optional[bool] = None,
    ):
        if len(imgsize) != 3:
            raise ValueError("imgsize must be (C,H,W) or (H,W,C)")
        c, h, w = imgsize
        if c > 4 and imgsize[2] <= 4:  # (H, W, C) given
            h, w, c = imgsize
        self.shape = (num_samples, h, w, c)
        self.every_n_steps = every_n_steps
        self.vis_length = vis_length
        self.out_dir = out_dir
        self.use_ema = use_ema
        self._gen = None

    def on_train_step_end(self, step: int, lit, state, logger=None) -> None:
        if step % self.every_n_steps != 0:
            return
        self.generate_and_save(step, lit, state, logger=logger)

    def on_fit_end(self, lit, state, logger=None) -> None:
        self.generate_and_save(
            int(jax.device_get(state.step)), lit, state, logger=logger
        )

    def generate_and_save(self, step: int, lit, state, logger=None) -> str:
        rng = jax.random.PRNGKey(step)
        _, history = lit.generate(
            state, rng, self.shape, use_ema=self.use_ema,
            history_length=self.vis_length,
        )
        history = jax.device_get(history)  # (vis_length, N, H, W, C)
        frames = [history[i] for i in range(history.shape[0])]
        grid = make_history([np.asarray(denorm(f)) for f in frames])
        if logger is not None and hasattr(logger, "log_image"):
            # reference parity: grids go to the experiment logger too
            # (W&B log_image / TB add_image — callbacks/generate.py:55-62)
            logger.log_image("samples", grid, step)
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"step_{step:08d}")
        try:
            from PIL import Image

            img = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
            if img.shape[-1] == 1:
                img = img[..., 0]
            Image.fromarray(img).save(path + ".png")
            return path + ".png"
        except Exception:
            np.save(path + ".npy", grid)
            return path + ".npy"
