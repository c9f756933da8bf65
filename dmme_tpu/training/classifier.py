"""Noisy-classifier training — the missing half of classifier guidance.

The reference's guidance needs a classifier of NOISY images p_φ(y | x_t, t)
but ships no way to train one (its guidance module is broken WIP). This
harness trains :class:`dmme_tpu.models.adm.EncoderUNet` with cross-entropy
on q-sampled inputs at uniformly random timesteps — the ADM recipe — reusing
the same TrainState/fit/parallel machinery as the diffusion harnesses.

Expects a data module with ``with_labels=True`` (batches are
``(uint8 images, int labels)``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from dmme_tpu import models as model_lib
from dmme_tpu.diffusion import DDPM
from dmme_tpu.models import adm as adm_lib
from dmme_tpu.training.lr_schedule import warmup_schedule
from dmme_tpu.training.state import TrainState


class LitClassifier:
    def __init__(
        self,
        lr: float = 3e-4,
        warmup: int = 1000,
        decay: float = 0.9999,
        model: Any = None,
        diffusion_model: Optional[DDPM] = None,
        timesteps: int = 1000,
        num_classes: int = 10,
        image_size: int = 32,
        grad_clip: float = 1.0,
        img_channels: int = 3,
        dtype: Any = jnp.float32,
    ):
        self.lr = lr
        self.warmup = warmup
        self.decay = decay
        self.grad_clip = grad_clip
        self.img_channels = img_channels

        if model is None:
            model = adm_lib.classifier(
                image_size=image_size, num_classes=num_classes, dtype=dtype
            )
        self.model = model
        self.model_fn = model_lib.as_model_fn(model)

        if diffusion_model is None:
            diffusion_model = DDPM.create(timesteps)
        self.diffusion_model = diffusion_model

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip),
            optax.adamw(warmup_schedule(self.lr, self.warmup), weight_decay=0.05),
        )

    def init_state(self, rng: jax.Array, img_size: int = 32) -> TrainState:
        x = jnp.zeros((1, img_size, img_size, self.img_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        tx = self.make_optimizer()

        # one jitted program for init + EMA copy + optimizer zeros (eager
        # per-leaf creation is minutes over a remote-TPU link; see LitDDPM)
        def _create(rng_):
            params = self.model.init(rng_, x, t)
            return TrainState.create(params, tx, ema_decay=self.decay)

        return jax.jit(_create)(rng)

    def make_loss_fn(self, datamodule=None):
        algo = self.diffusion_model

        def loss_fn(params, rng, batch):
            x_0, y = batch
            if datamodule is not None:
                aug_rng, rng = jax.random.split(rng)
                x_0 = datamodule.train_transform(aug_rng, x_0)
            t_key, n_key, d_key = jax.random.split(rng, 3)
            t = algo.sample_timesteps(t_key, x_0.shape[0])
            ab_t = algo.schedule.alpha_bar[t].reshape(-1, 1, 1, 1)
            noise = jax.random.normal(n_key, x_0.shape, x_0.dtype)
            import dmme_tpu.equations as eq

            x_t = eq.ddpm.q_sample(x_0, ab_t, noise)
            logits = self.model_fn(
                params, x_t, t, train=True, rngs={"dropout": d_key}
            ).astype(jnp.float32)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        return loss_fn

    def accuracy(self, params, batch, rng, t_value: int = 1) -> jax.Array:
        """Clean-ish accuracy probe at a fixed small t."""
        x_0, y = batch
        t = jnp.full((x_0.shape[0],), t_value, jnp.int32)
        logits = self.model_fn(params, x_0, t)
        return jnp.mean(jnp.argmax(logits, -1) == y)
