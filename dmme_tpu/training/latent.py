"""Latent diffusion — VAE pretraining + latent-space diffusion harnesses.

Capability beyond the reference (its src/dmme/lit_modules/ train in pixel
space only): the Rombach et al. 2022 two-stage recipe. Stage 1 trains a
KL-VAE (:class:`LitVAE`); stage 2 trains ANY of this framework's diffusion
formulations inside the VAE's latent space (:class:`LitLatentDDPM`,
:class:`LitLatentFlow` — DDPM ε-prediction and flow matching; the mixin
composes onto every ``LitDDPM`` subclass the same way). The denoiser sees
``factor²``-fewer pixels per image, so conv/attention FLOPs drop by the
same factor — the standard path past 64px. ``LitLatentFlow`` with a DiT
backbone (models/dit.py) is the SD3 recipe end-to-end.

TPU-first mechanics: the frozen VAE rides in the jitted loss as closure
constants (like LitDistill's teacher — weights pinned in HBM, zero host
traffic per step); encode and the diffusion loss trace into ONE program,
so XLA fuses normalize→encode→noise→denoise without materialising the
latents to HBM between stages. Latents are standardised to unit variance
by ``latent_scale`` (SD's 0.18215 convention, auto-calibrated from data
and persisted next to the VAE checkpoint) so ε-parameterised training
sees the variance it expects.

Every pixel-space surface keeps working unchanged: ``generate`` takes an
IMAGE shape and returns decoded images (GenerateImage, sample, FID/IS,
serving), and sampler overrides (``--trainer.sampler dpm|unipc|…``) run
the override's solver in latent space via the
``sample_space_shape``/``to_images`` hooks — train latent DDPM once,
sample it with UniPC at 10 NFE.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from dmme_tpu.models import ddpm as ddpm_models
from dmme_tpu.models.vae import ConvVAE, kl_divergence
from dmme_tpu.training.lit import LitDDPM, LitFlow
from dmme_tpu.training.lr_schedule import warmup_schedule
from dmme_tpu.training.state import TrainState

SCALE_FILENAME = "latent_scale.json"


class LitVAE:
    """KL-VAE training harness (stage 1 of latent diffusion).

    Implements the same protocol as the diffusion harnesses
    (``init_state`` / ``make_loss_fn`` / ``eval_loss`` / ``generate``), so
    the fit loop, checkpointing, callbacks, and the CLI drive it
    unchanged. Objective: pixel MSE + ``kl_weight``·KL(q‖N(0,I)) — the
    β-VAE form of Rombach et al. 2022 eq. 2 (perceptual/GAN terms are
    deliberately out of scope: on TPU the MSE+KL codec already trains at
    full MXU utilisation, and the diffusion prior — not the codec loss —
    dominates end-sample quality at demo scale)."""

    def __init__(
        self,
        lr: float = 1e-4,
        warmup: int = 500,
        decay: float = 0.999,
        model: Optional[ConvVAE] = None,
        kl_weight: float = 1e-4,
        grad_clip: float = 1.0,
        img_channels: int = 3,
        dtype: Any = jnp.float32,
        ema_every_n_steps: int = 1,
        validate_original_weights: bool = False,
    ) -> None:
        self.lr = lr
        self.warmup = warmup
        self.decay = decay
        self.kl_weight = kl_weight
        self.grad_clip = grad_clip
        self.img_channels = img_channels
        self.ema_every_n_steps = ema_every_n_steps
        self.validate_original_weights = validate_original_weights
        self.num_classes = None  # unconditional protocol surface
        if model is None:
            model = ConvVAE(out_channels=img_channels, dtype=dtype)
        self.model = model

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip),
            optax.adam(warmup_schedule(self.lr, self.warmup)),
        )

    def init_state(self, rng: jax.Array, img_size: int = 32) -> TrainState:
        x = jnp.zeros((1, img_size, img_size, self.img_channels), jnp.float32)
        tx = self.make_optimizer()

        def _create(rng_):
            p_rng, z_rng = jax.random.split(rng_)
            params = self.model.init(p_rng, x, z_rng)
            return TrainState.create(
                params, tx,
                ema_decay=self.decay,
                ema_every_n_steps=self.ema_every_n_steps,
            )

        return jax.jit(_create)(rng)

    def make_loss_fn(self, datamodule=None):
        def loss_fn(params, rng, batch):
            x = batch[0] if isinstance(batch, (tuple, list)) else batch
            if datamodule is not None:
                aug_rng, rng = jax.random.split(rng)
                x = datamodule.train_transform(aug_rng, x)
            z_rng, rng = jax.random.split(rng)
            recon, mean, logvar = self.model.apply(params, x, z_rng)
            recon_loss = jnp.mean(
                jnp.square(recon - x.astype(jnp.float32))
            )
            return recon_loss + self.kl_weight * kl_divergence(mean, logvar)

        return loss_fn

    def eval_loss(self, params, rng, x, y=None):
        """Deterministic ELBO surrogate: decode the posterior MEAN."""
        mean, logvar = self.model.apply(params, x, method=ConvVAE.encode)
        recon = self.model.apply(params, mean, method=ConvVAE.decode)
        recon_loss = jnp.mean(jnp.square(recon - x.astype(jnp.float32)))
        return recon_loss + self.kl_weight * kl_divergence(mean, logvar)

    def generate(self, state, rng, img_shape, *, use_ema=None,
                 history_length=None, y=None):
        """Decode prior samples z ~ N(0, I). A plain KL-VAE's prior
        samples are blurry by design — the latent DIFFUSION model is the
        real generator; this keeps the GenerateImage/sample surfaces
        working during stage-1 training as a codec health check."""
        if use_ema is None:
            use_ema = not self.validate_original_weights
        params = state.ema_params if use_ema else state.params
        n, h, w, _ = img_shape
        f = self.model.factor
        z = jax.random.normal(
            rng, (n, h // f, w // f, self.model.latent_channels), jnp.float32
        )
        out = self.model.apply(params, z, method=ConvVAE.decode)
        if history_length is not None:
            # no reverse trajectory: the "history" is the sample itself
            reps = max(int(history_length), 1)
            return out, jnp.broadcast_to(out[None], (reps,) + out.shape)
        return out

    def reconstruct(self, state, x, *, use_ema: bool = True):
        """Deterministic roundtrip decode(E[z|x]) — codec-quality probes."""
        params = state.ema_params if use_ema else state.params
        mean, _ = self.model.apply(params, x, method=ConvVAE.encode)
        return self.model.apply(params, mean, method=ConvVAE.decode)


class LatentMixin:
    """Mixin that moves any ``LitDDPM``-family harness into a frozen
    VAE's latent space.

    Composition seam (training/lit.py): the base loss calls
    ``encode_target`` on the (augmented, normalised) batch and
    ``encode_eval`` on validation batches — identity in pixel-space
    harnesses — and every sampling surface routes shapes/outputs through
    ``sample_space_shape``/``to_images``. This mixin overrides exactly
    those four hooks plus state sizing, so labels/CFG, MoE router-loss
    collection, EMA, checkpointing, and all samplers compose untouched.

    ``vae_ckpt`` points at a stage-1 :class:`LitVAE` run directory; its
    EMA weights are restored once and closed over as device constants
    (the LitDistill teacher pattern). ``latent_scale=None`` auto-
    calibrates 1/std over ``scale_probe_n`` posterior means at fit time
    and persists the value to ``<vae_ckpt>/latent_scale.json`` so later
    sample/test/serve sessions reuse it deterministically."""

    def __init__(
        self,
        *args,
        vae: Optional[ConvVAE] = None,
        vae_ckpt: Optional[str] = None,
        vae_params: Any = None,
        latent_scale: Optional[float] = None,
        scale_probe_n: int = 256,
        **kwargs,
    ) -> None:
        if vae is None:
            vae = ConvVAE()
        self.vae = vae
        self.vae_ckpt = vae_ckpt
        self.latent_channels = vae.latent_channels
        self._scale = float(latent_scale) if latent_scale else None
        self.scale_probe_n = scale_probe_n
        self._decode_jit = None

        if kwargs.get("model") is None:
            # default denoiser at LATENT width (the base class would build
            # a 3-channel one); dtype/num_classes mirror LitDDPM's default
            kwargs["model"] = ddpm_models.UNet(
                in_channels=vae.latent_channels,
                dtype=kwargs.get("dtype", jnp.float32),
                num_classes=kwargs.get("num_classes"),
            )
        super().__init__(*args, **kwargs)

        if vae_params is None:
            if vae_ckpt is None:
                raise ValueError(
                    "latent harness needs the stage-1 codec: pass vae_ckpt "
                    "(a LitVAE run directory) or vae_params"
                )
            from dmme_tpu.training.checkpoint import CheckpointManager

            helper = LitVAE(model=vae, img_channels=self.img_channels)
            target = helper.init_state(
                jax.random.PRNGKey(0), img_size=4 * vae.factor
            )
            mgr = CheckpointManager(vae_ckpt)
            if mgr.latest_step() is None:
                raise ValueError(
                    f"no stage-1 VAE checkpoint under {vae_ckpt!r} — train "
                    "the codec first (e.g. `dmme-tpu fit --config "
                    "configs/latent/shapes_vae_demo.yaml`), or pass "
                    "vae_params directly"
                )
            vae_params = mgr.restore(target).ema_params
        self.vae_params = vae_params

    # ------------------------------------------------------------ the hooks
    def model_in_channels(self) -> int:
        return self.latent_channels

    def init_state(self, rng: jax.Array, img_size: int = 32) -> TrainState:
        f = self.vae.factor
        if img_size % f:
            raise ValueError(
                f"img_size {img_size} not divisible by the VAE's spatial "
                f"factor {f}"
            )
        return super().init_state(rng, img_size // f)

    def encode_target(self, rng, x):
        """Pixels → scaled posterior sample, traced into the loss program."""
        scale = self._require_scale()
        z_rng, rng = jax.random.split(rng)
        mean, logvar = self.vae.apply(
            self.vae_params, x, method=ConvVAE.encode
        )
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            z_rng, mean.shape, mean.dtype
        )
        return z * scale, rng

    def encode_eval(self, x):
        mean, _ = self.vae.apply(self.vae_params, x, method=ConvVAE.encode)
        return mean * self._require_scale()

    def sample_space_shape(self, img_shape):
        n, h, w, _ = img_shape
        f = self.vae.factor
        if h % f or w % f:
            raise ValueError(f"image side {h}x{w} not divisible by factor {f}")
        return (n, h // f, w // f, self.latent_channels)

    def to_images(self, out):
        scale = self._require_scale()
        if self._decode_jit is None:
            def _dec(z):
                return self.vae.apply(
                    self.vae_params, z / scale, method=ConvVAE.decode
                )

            self._decode_jit = jax.jit(_dec)
        if out.ndim == 5:  # (T, N, h, w, c) reverse-trajectory history
            return jax.lax.map(self._decode_jit, out)
        return self._decode_jit(out)

    def generate(self, state, rng, img_shape, *, use_ema=None,
                 history_length=None, y=None):
        out = super().generate(
            state, rng, self.sample_space_shape(img_shape),
            use_ema=use_ema, history_length=history_length, y=y,
        )
        if history_length is not None:
            final, hist = out
            return self.to_images(final), self.to_images(hist)
        return self.to_images(out)

    # ------------------------------------------------------------ the scale
    def make_loss_fn(self, datamodule=None):
        # resolve (and persist) the latent scale EAGERLY, before tracing
        self._resolve_scale(datamodule)
        return super().make_loss_fn(datamodule)

    def _scale_path(self) -> Optional[str]:
        if self.vae_ckpt is None:
            return None
        return os.path.join(self.vae_ckpt, SCALE_FILENAME)

    def _require_scale(self) -> float:
        if self._scale is None:
            self._resolve_scale(None)
        return self._scale

    def _resolve_scale(self, datamodule) -> float:
        """explicit value > persisted json > computed from data (persisted).

        Deterministic across sessions: the probe is the posterior MEAN of
        the first ``scale_probe_n`` training images, no augmentation."""
        if self._scale is not None:
            return self._scale
        path = self._scale_path()
        if path is not None and os.path.exists(path):
            with open(path) as f:
                self._scale = float(json.load(f)["latent_scale"])
            return self._scale
        if datamodule is None:
            raise ValueError(
                "latent_scale unresolved: no explicit value, no "
                f"{SCALE_FILENAME} next to the VAE checkpoint, and no "
                "datamodule to calibrate from — fit first, or set "
                "model.init_args.latent_scale"
            )
        datamodule.setup("fit")
        n = int(min(self.scale_probe_n, len(datamodule.train_data)))
        x = datamodule.process(
            jnp.asarray(datamodule.train_data[:n]).astype(jnp.float32)
        )
        mean, _ = jax.jit(
            lambda p, xx: self.vae.apply(p, xx, method=ConvVAE.encode)
        )(self.vae_params, x)
        std = float(jax.device_get(jnp.std(mean)))
        self._scale = 1.0 / max(std, 1e-6)
        if path is not None:
            os.makedirs(self.vae_ckpt, exist_ok=True)
            with open(path, "w") as f:
                json.dump({"latent_scale": self._scale, "probe_n": n}, f)
        return self._scale


class LitLatentDDPM(LatentMixin, LitDDPM):
    """Latent-space DDPM: ε-prediction on scaled VAE latents. Every
    sampler override (ddim/dpm/unipc/deep caches) runs in latent space
    and decodes through ``to_images``."""


class LitLatentFlow(LatentMixin, LitFlow):
    """Latent flow matching — with a DiT model this is the SD3 recipe
    (latent space × rectified flow × transformer denoiser)."""
