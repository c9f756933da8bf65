"""ADM — the guided-diffusion UNet family (Dhariwal & Nichol 2021).

The reference *promises* this family (tests/test_adm.py imports
``dmme.adm.{ADM, ADMG, ADMU}`` at 128px) but never implements it; this is the
working TPU-native version. Differences from the DDPM/IDDPM UNet
(``dmme_tpu.models.unet``): BigGAN-style ResBlocks with in-block up/down
resampling, zero-initialized output convs (identity residual branches at
init), attention with ``num_head_channels`` and proper per-head scaling at
multiple resolutions, class-conditional embedding, and a per-resolution
``channel_mult`` config.

* :func:`ADM`  — generator UNet preset (128px class-conditional by default).
* :func:`ADMG` — guided setup: the class-conditional generator; pair with
  :class:`EncoderUNet` (the noisy classifier) and
  ``dmme_tpu.diffusion.guidance`` for classifier-guided sampling.
* :func:`ADMU` — upsampler UNet (low-res conditioning concatenated on
  channels, 6 input channels).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmme_tpu.models.blocks import (
    conv1x1,
    conv3x3,
    group_norm,
    sinusoidal_position_embedding,
)


def _zero_conv3x3(features, dtype, param_dtype, name=None):
    return nn.Conv(
        features,
        (3, 3),
        padding=((1, 1), (1, 1)),
        kernel_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def _nearest2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _avgpool2x(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ADMResBlock(nn.Module):
    """Scale-shift-norm ResBlock with optional in-block resampling and a
    zero-initialized second conv (residual branch is identity at init)."""

    c_out: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        h = group_norm(32, name="norm1")(x).astype(self.dtype)
        h = nn.silu(h)
        if self.up:
            h, x = _nearest2x(h), _nearest2x(x)
        elif self.down:
            h, x = _avgpool2x(h), _avgpool2x(x)
        h = conv3x3(self.c_out, 1, self.dtype, self.param_dtype, name="conv1")(h)

        cond = nn.Dense(
            2 * self.c_out, dtype=self.dtype, param_dtype=self.param_dtype,
            name="emb_proj",
        )(nn.silu(emb))
        shift, scale = jnp.split(cond[:, None, None, :], 2, axis=-1)
        h = group_norm(32, name="norm2")(h).astype(self.dtype)
        h = h * (1.0 + scale) + shift
        h = nn.silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=self.deterministic)(h)
        h = _zero_conv3x3(self.c_out, self.dtype, self.param_dtype, name="conv2")(h)

        if c_in != self.c_out:
            x = conv1x1(self.c_out, self.dtype, self.param_dtype, name="skip")(x)
        return x + h


class ADMAttention(nn.Module):
    """Residual attention with per-head scaling and zero-init projection."""

    num_head_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        head_dim = c // heads

        hx = group_norm(32)(x).astype(self.dtype)
        qkv = conv1x1(3 * c, self.dtype, self.param_dtype, name="qkv")(hx)
        qkv = qkv.reshape(n, h * w, 3, heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        from dmme_tpu.ops.attention import attention_heads

        out = attention_heads(q, k, v, head_dim ** -0.5).reshape(n, h, w, c)
        out = nn.Conv(
            c, (1, 1), kernel_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj",
        )(out)
        return x + out


class UNetModel(nn.Module):
    """The ADM generator UNet.

    ``attention_resolutions`` are feature-map sizes (e.g. (32, 16, 8) for a
    128px model); ``num_classes`` enables class conditioning (label embedding
    added to the timestep embedding).
    """

    image_size: int = 128
    in_channels: int = 3
    model_channels: int = 256
    out_channels: Optional[int] = None  # default: 2*in (learn_sigma)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (32, 16, 8)
    channel_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    num_head_channels: int = 64
    dropout: float = 0.0
    num_classes: Optional[int] = None
    learn_sigma: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        t,
        y: Optional[jax.Array] = None,
        *,
        train: bool = False,
        return_features: bool = False,
        cached=None,
    ):
        """``return_features``/``cached`` implement the same encoder-reuse
        API as ``models.unet.UNet`` (see ``diffusion.fast.CachedDDIM``)."""
        ch = self.model_channels
        emb_dim = 4 * ch
        emb = sinusoidal_position_embedding(t, ch, self.dtype)
        emb = nn.Dense(emb_dim, dtype=self.dtype, param_dtype=self.param_dtype)(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(emb_dim, dtype=self.dtype, param_dtype=self.param_dtype)(emb)
        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs labels"
            emb = emb + nn.Embed(
                self.num_classes, emb_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name="label_emb",
            )(y)

        def res(c_out, name, up=False, down=False):
            return ADMResBlock(
                c_out=c_out, dropout=self.dropout, up=up, down=down,
                deterministic=not train, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name,
            )

        def attn(name):
            return ADMAttention(
                self.num_head_channels, self.dtype, self.param_dtype, name=name
            )

        res_size = self.image_size
        if cached is None:
            x = x.astype(self.dtype)
            h = conv3x3(ch, 1, self.dtype, self.param_dtype, name="input_conv")(x)

            skips = [h]
            for level, mult in enumerate(self.channel_mult):
                for i in range(self.num_res_blocks):
                    h = res(ch * mult, f"down_{level}_{i}")(h, emb)
                    if res_size in self.attention_resolutions:
                        h = attn(f"down_attn_{level}_{i}")(h)
                    skips.append(h)
                if level != len(self.channel_mult) - 1:
                    h = res(h.shape[-1], f"downsample_{level}", down=True)(h, emb)
                    skips.append(h)
                    res_size //= 2
        else:
            h, skips = cached
            skips = list(skips)
            res_size = self.image_size // (2 ** (len(self.channel_mult) - 1))
        features = (h, tuple(skips))

        h = res(h.shape[-1], "middle_0")(h, emb)
        h = attn("middle_attn")(h)
        h = res(h.shape[-1], "middle_1")(h, emb)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res(ch * mult, f"up_{level}_{i}")(h, emb)
                if res_size in self.attention_resolutions:
                    h = attn(f"up_attn_{level}_{i}")(h)
            if level != 0:
                h = res(h.shape[-1], f"upsample_{level}", up=True)(h, emb)
                res_size *= 2
        assert not skips

        out_ch = self.out_channels or (
            2 * self.in_channels if self.learn_sigma else self.in_channels
        )
        h = group_norm(32, name="out_norm")(h).astype(self.dtype)
        h = nn.silu(h)
        out = _zero_conv3x3(out_ch, self.dtype, self.param_dtype, name="out_conv")(h)
        if return_features:
            return out, features
        return out


class EncoderUNet(nn.Module):
    """The ADM noisy classifier: the UNet's down trunk + middle, followed by
    spatial attention pooling into class logits."""

    image_size: int = 128
    in_channels: int = 3
    model_channels: int = 128
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (32, 16, 8)
    channel_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    num_head_channels: int = 64
    num_classes: int = 1000
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):
        ch = self.model_channels
        emb_dim = 4 * ch
        emb = sinusoidal_position_embedding(t, ch, self.dtype)
        emb = nn.Dense(emb_dim, dtype=self.dtype, param_dtype=self.param_dtype)(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(emb_dim, dtype=self.dtype, param_dtype=self.param_dtype)(emb)

        x = x.astype(self.dtype)
        h = conv3x3(ch, 1, self.dtype, self.param_dtype, name="input_conv")(x)
        res_size = self.image_size
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ADMResBlock(
                    ch * mult, self.dropout, deterministic=not train,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"down_{level}_{i}",
                )(h, emb)
                if res_size in self.attention_resolutions:
                    h = ADMAttention(
                        self.num_head_channels, self.dtype, self.param_dtype,
                        name=f"down_attn_{level}_{i}",
                    )(h)
            if level != len(self.channel_mult) - 1:
                h = ADMResBlock(
                    h.shape[-1], down=True, deterministic=not train,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"downsample_{level}",
                )(h, emb)
                res_size //= 2

        h = ADMResBlock(
            h.shape[-1], deterministic=not train, dtype=self.dtype,
            param_dtype=self.param_dtype, name="middle_0",
        )(h, emb)
        h = ADMAttention(
            self.num_head_channels, self.dtype, self.param_dtype, name="middle_attn"
        )(h)
        h = ADMResBlock(
            h.shape[-1], deterministic=not train, dtype=self.dtype,
            param_dtype=self.param_dtype, name="middle_1",
        )(h, emb)

        # attention pooling: softmax over spatial positions per channel group
        h = group_norm(32, name="pool_norm")(h).astype(self.dtype)
        h = nn.silu(h)
        n, hh, ww, c = h.shape
        flat = h.reshape(n, hh * ww, c)
        weights = jax.nn.softmax(
            nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype, name="pool_w")(
                flat
            ).astype(jnp.float32),
            axis=1,
        ).astype(self.dtype)
        pooled = jnp.sum(flat * weights, axis=1)
        return nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype,
            name="logits",
        )(pooled)


# ---------------------------------------------------------------- presets


def ADM(
    image_size: int = 128,
    class_conditional: bool = True,
    num_classes: int = 1000,
    dtype=jnp.float32,
    **overrides,
) -> UNetModel:
    """Generator preset per image size (guided-diffusion hyperparameters)."""
    presets = {
        32: dict(model_channels=128, channel_mult=(1, 2, 2, 2), num_res_blocks=3,
                 attention_resolutions=(16, 8)),
        64: dict(model_channels=192, channel_mult=(1, 2, 3, 4), num_res_blocks=3,
                 attention_resolutions=(32, 16, 8)),
        128: dict(model_channels=256, channel_mult=(1, 1, 2, 3, 4), num_res_blocks=2,
                  attention_resolutions=(32, 16, 8)),
        256: dict(model_channels=256, channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2,
                  attention_resolutions=(32, 16, 8)),
    }
    cfg = (presets.get(image_size) or {}) | overrides
    return UNetModel(
        image_size=image_size,
        num_classes=num_classes if class_conditional else None,
        dtype=dtype,
        **cfg,
    )


def ADMG(
    image_size: int = 128, num_classes: int = 1000, dtype=jnp.float32, **overrides
) -> UNetModel:
    """Classifier-guided generator = class-conditional ADM; sample with
    :class:`EncoderUNet` + ``dmme_tpu.diffusion.ClassifierGuidedDDPM/DDIM``."""
    return ADM(image_size, True, num_classes, dtype, **overrides)


def ADMU(
    image_size: int = 256, dtype=jnp.float32, **overrides
) -> UNetModel:
    """Upsampler: denoises high-res x_t conditioned on a bilinear-upsampled
    low-res image concatenated on channels (6 input channels)."""
    cfg = dict(
        model_channels=192, channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2,
        attention_resolutions=(32, 16, 8), in_channels=6,
    ) | overrides
    return UNetModel(image_size=image_size, num_classes=None, dtype=dtype, **cfg)


def classifier(image_size: int = 128, num_classes: int = 1000, dtype=jnp.float32,
               **overrides) -> EncoderUNet:
    presets = {
        32: dict(model_channels=64, channel_mult=(1, 2, 2, 2), num_res_blocks=2,
                 attention_resolutions=(16, 8)),
        64: dict(model_channels=128, channel_mult=(1, 2, 3, 4), num_res_blocks=2,
                 attention_resolutions=(32, 16, 8)),
        128: dict(model_channels=128, channel_mult=(1, 1, 2, 3, 4), num_res_blocks=2,
                  attention_resolutions=(32, 16, 8)),
    }
    cfg = (presets.get(image_size) or {}) | overrides
    return EncoderUNet(image_size=image_size, num_classes=num_classes, dtype=dtype, **cfg)
