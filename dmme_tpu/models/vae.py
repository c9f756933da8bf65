"""Convolutional KL-VAE — the autoencoder for latent diffusion.

Capability beyond the reference (it has no latent-diffusion stack —
src/dmme/models/ contains pixel-space UNets only): a compact
Rombach et al. 2022 (Stable Diffusion)–style image↔latent codec. The
diffusion model then trains in the ``factor``× smaller latent space,
which divides the denoiser's conv/attention FLOPs by ``factor²`` per
step — the standard recipe for scaling diffusion past 64px.

TPU-first shape discipline: NHWC throughout, static shapes, channels
padded to MXU-friendly widths by construction (base_channels a multiple
of 8), nearest-upsampling as reshape-broadcast (no gather — fuses into
the following conv, models/blocks.py Upsample). The VAE has no timestep
conditioning, so its residual block is the time-free two-conv variant
rather than models/blocks.ResBlock (which carries a FiLM/additive
embedding path this network would never use).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmme_tpu.models.blocks import Upsample, conv1x1, conv3x3, group_norm


class VAEResBlock(nn.Module):
    """GN→SiLU→conv ×2 residual block without timestep conditioning."""

    c_out: int
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        h = group_norm(self.num_groups, name="norm1")(x).astype(self.dtype)
        h = nn.silu(h)
        h = conv3x3(self.c_out, 1, self.dtype, self.param_dtype, name="conv1")(h)
        h = group_norm(self.num_groups, name="norm2")(h).astype(self.dtype)
        h = nn.silu(h)
        h = conv3x3(self.c_out, 1, self.dtype, self.param_dtype, name="conv2")(h)
        if c_in != self.c_out:
            x = conv1x1(self.c_out, self.dtype, self.param_dtype, name="skip")(x)
        return x + h


class Encoder(nn.Module):
    """Image → (mean, logvar) of the diagonal-Gaussian posterior."""

    latent_channels: int
    base_channels: int
    channel_multipliers: Tuple[int, ...]
    num_res_blocks: int
    num_groups: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = conv3x3(
            self.base_channels, 1, self.dtype, self.param_dtype, name="stem"
        )(x.astype(self.dtype))
        for i, mult in enumerate(self.channel_multipliers):
            c = self.base_channels * mult
            for j in range(self.num_res_blocks):
                h = VAEResBlock(
                    c, self.num_groups, self.dtype, self.param_dtype,
                    name=f"down_{i}_{j}",
                )(h)
            if i < len(self.channel_multipliers) - 1:
                # stride-2 conv (blocks.Downsample inlined — keep the name
                # local to the level for a readable param tree)
                h = conv3x3(
                    c, 2, self.dtype, self.param_dtype, name=f"downsample_{i}"
                )(h)
        h = group_norm(self.num_groups, name="norm_out")(h).astype(self.dtype)
        h = nn.silu(h)
        # moments in f32: exp(logvar) under bf16 loses the KL's low bits
        out = conv3x3(
            2 * self.latent_channels, 1, jnp.float32, jnp.float32, name="moments"
        )(h.astype(jnp.float32))
        mean, logvar = jnp.split(out, 2, axis=-1)
        # bound the posterior variance (SD convention): keeps exp() finite
        # under any transient blow-up instead of silently producing inf KL
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    """Latent → image (reconstruction in f32)."""

    out_channels: int
    base_channels: int
    channel_multipliers: Tuple[int, ...]
    num_res_blocks: int
    num_groups: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        mults = self.channel_multipliers
        h = conv3x3(
            self.base_channels * mults[-1], 1, self.dtype, self.param_dtype,
            name="stem",
        )(z.astype(self.dtype))
        for i, mult in reversed(list(enumerate(mults))):
            c = self.base_channels * mult
            for j in range(self.num_res_blocks):
                h = VAEResBlock(
                    c, self.num_groups, self.dtype, self.param_dtype,
                    name=f"up_{i}_{j}",
                )(h)
            if i > 0:
                h = Upsample(
                    self.base_channels * mults[i - 1], self.dtype,
                    self.param_dtype, name=f"upsample_{i}",
                )(h)
        h = group_norm(self.num_groups, name="norm_out")(h).astype(self.dtype)
        h = nn.silu(h)
        return conv3x3(
            self.out_channels, 1, jnp.float32, jnp.float32, name="out"
        )(h.astype(jnp.float32))


class ConvVAE(nn.Module):
    """KL-regularised convolutional autoencoder (Rombach et al. 2022 §3).

    ``factor = 2^(len(channel_multipliers)-1)`` is the spatial compression:
    an (N, H, W, C) image maps to an (N, H/f, W/f, latent_channels) latent.
    Fully convolutional — parameters are image-size independent, so one
    checkpoint serves every resolution whose sides divide by ``factor``.

    Entry points (via ``apply(..., method=...)``):

    * ``encode(x) -> (mean, logvar)`` — posterior moments, f32
    * ``decode(z) -> x_rec`` — reconstruction, f32
    * ``__call__(x, z_rng) -> (x_rec, mean, logvar)`` — reparameterised
      training pass
    """

    latent_channels: int = 4
    base_channels: int = 32
    channel_multipliers: Tuple[int, ...] = (1, 2)
    num_res_blocks: int = 1
    out_channels: int = 3
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def factor(self) -> int:
        return 2 ** (len(self.channel_multipliers) - 1)

    def setup(self):
        self.encoder = Encoder(
            self.latent_channels, self.base_channels,
            tuple(self.channel_multipliers), self.num_res_blocks,
            self.num_groups, self.dtype, self.param_dtype,
        )
        self.decoder = Decoder(
            self.out_channels, self.base_channels,
            tuple(self.channel_multipliers), self.num_res_blocks,
            self.num_groups, self.dtype, self.param_dtype,
        )

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.encoder(x)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(
        self, x: jax.Array, z_rng: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            z_rng, mean.shape, mean.dtype
        )
        return self.decode(z), mean, logvar


def kl_divergence(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Mean per-element KL(q(z|x) ‖ N(0, I)) over the batch."""
    return 0.5 * jnp.mean(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar)
