"""Noisy-classifier training harness tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dmme_tpu.data import CIFAR10, ImageFolder64
from dmme_tpu.diffusion import DDPM
from dmme_tpu.models import adm
from dmme_tpu.parallel import make_train_step
from dmme_tpu.training import LitClassifier, fit


def tiny_classifier():
    return LitClassifier(
        model=adm.classifier(
            image_size=32, num_classes=10, model_channels=32,
            channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(16,), num_head_channels=16,
        ),
        diffusion_model=DDPM.create(timesteps=20),
        warmup=10,
    )


class TestLitClassifier:
    @pytest.mark.slow
    def test_loss_and_step(self, rng):
        lit = tiny_classifier()
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=8, with_labels=True)
        dm.setup("fit")
        state = lit.init_state(rng, img_size=32)
        step = make_train_step(lit.make_loss_fn(dm))
        batch = next(dm.train_iter(0))
        assert isinstance(batch, tuple) and batch[1].shape == (8,)
        state, metrics = step(state, (jnp.asarray(batch[0]), jnp.asarray(batch[1])), rng)
        assert np.isfinite(float(metrics["loss"]))
        # CE of 10-way random init ~ log(10)
        assert 1.0 < float(metrics["loss"]) < 4.0

    @pytest.mark.slow
    def test_fit_loop_with_labels(self, rng):
        lit = tiny_classifier()
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=8, with_labels=True)
        state = fit(lit, dm, max_steps=2, log_every=100)
        assert int(jax.device_get(state.step)) == 2


class TestImageFolder64:
    def test_synthetic_shapes(self):
        dm = ImageFolder64(synthetic=True, synthetic_size=8, batch_size=4)
        dm.setup("fit")
        assert dm.train_data.shape == (8, 64, 64, 3)
        batch = next(dm.train_iter(0))
        assert batch.shape == (4, 64, 64, 3)

    def test_missing_data_raises(self, tmp_path):
        dm = ImageFolder64(data_dir=str(tmp_path))
        try:
            dm.setup("fit")
            assert False, "should raise"
        except FileNotFoundError as e:
            assert "ImageNet-64" in str(e)
