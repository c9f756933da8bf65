"""Visualization + GenerateImage callback tests."""

import glob
import os

import jax
import numpy as np

from dmme_tpu.callbacks import GenerateImage
from dmme_tpu.data import CIFAR10
from dmme_tpu.diffusion import DDPM
from dmme_tpu.models import ddpm as ddpm_models
from dmme_tpu.training import LitDDPM
from dmme_tpu.utils.vis import make_grid, make_history


class TestMakeGrid:
    def test_grid_shape(self):
        imgs = np.random.rand(6, 8, 8, 3).astype(np.float32)
        grid = make_grid(imgs, nrow=3, padding=2)
        # 2 rows x 3 cols of 8px + padding
        assert grid.shape == (2 * 10 + 2, 3 * 10 + 2, 3)

    def test_single_frame_near_square(self):
        # batch 12 -> factors near sqrt: 3x4 grid (nrow=4)
        imgs = [np.random.rand(12, 8, 8, 3).astype(np.float32)]
        grid = make_history(imgs)
        assert grid.shape[0] < grid.shape[1] or grid.shape[0] == grid.shape[1]

    def test_history_rows_are_trajectories(self):
        # 3 frames x 2 samples -> 2 rows x 3 cols
        frames = [np.full((2, 4, 4, 3), i, np.float32) for i in range(3)]
        grid = make_history(frames)
        assert grid.shape == (2 * 6 + 2, 3 * 6 + 2, 3)


class TestGenerateImageCallback:
    def test_generates_png(self, tmp_path, rng):
        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1,
            ),
            diffusion_model=DDPM.create(timesteps=5),
        )
        state = lit.init_state(rng, img_size=32)
        cb = GenerateImage(
            imgsize=(3, 32, 32), every_n_steps=2, num_samples=4,
            vis_length=3, out_dir=str(tmp_path),
        )
        cb.on_train_step_end(2, lit, state)
        files = glob.glob(str(tmp_path / "*"))
        assert len(files) == 1
        assert files[0].endswith((".png", ".npy"))
        # cadence respected
        cb.on_train_step_end(3, lit, state)
        assert len(glob.glob(str(tmp_path / "*"))) == 1

    def test_imgsize_hwc_order_accepted(self):
        cb = GenerateImage(imgsize=(32, 32, 3), num_samples=2)
        assert cb.shape == (2, 32, 32, 3)


class TestProfileTrace:
    def test_trace_written_during_fit(self, tmp_path):
        """ProfileTrace captures an xplane trace for its step window."""
        import glob

        from dmme_tpu.callbacks import ProfileTrace
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.diffusion import DDPM
        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.training import LitDDPM, fit

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1,
            ),
            diffusion_model=DDPM.create(timesteps=6),
            warmup=10,
        )
        dm = CIFAR10(synthetic=True, synthetic_size=32, batch_size=8)
        cb = ProfileTrace(start_step=1, num_steps=2, log_dir=str(tmp_path / "prof"))
        fit(lit, dm, max_steps=4, log_every=100, callbacks=[cb])
        assert cb._started and cb._stopped
        assert glob.glob(str(tmp_path / "prof" / "**" / "*.xplane.pb"),
                         recursive=True)
