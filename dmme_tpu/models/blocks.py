"""Shared UNet building blocks — flax.linen, NHWC, bf16-ready.

TPU-native redesign of the reference's torch blocks
(reference: src/dmme/models/ddpm.py:17-173, src/dmme/models/iddpm.py:16-123):

* NHWC layout — the native layout for TPU convolutions (channels on the
  128-wide lane dimension).
* Explicit ``dtype``/``param_dtype`` split: params live in float32, compute
  can run in bfloat16 (the MXU's native precision).
* GroupNorm runs in float32 regardless of the compute dtype (norm statistics
  are precision-sensitive) with torch's ``eps=1e-5`` for numerical parity.
* Attention is a batched einsum over ≤256 tokens (feature maps ≤16×16) that
  XLA maps straight onto the MXU; an optional fused Pallas path lives in
  :mod:`dmme_tpu.ops`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.GroupNorm default epsilon; flax defaults to 1e-6.
GN_EPS = 1e-5


def sinusoidal_position_embedding(t: jax.Array, dim: int, dtype=jnp.float32) -> jax.Array:
    """Transformer sinusoidal timestep embedding of shape ``(N, dim)``.

    freqs_k = exp(−k · log(10000)/(dim/2 − 1)); output = [sin(t·f), cos(t·f)].
    Reference: src/dmme/models/ddpm.py:319-349.
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    return emb.astype(dtype)


class TimeEmbedding(nn.Module):
    """Sinusoidal embedding + 2-layer SiLU MLP (the UNet's ``condition`` head).

    Reference: src/dmme/models/ddpm.py:211-217.
    """

    pos_dim: int = 128
    emb_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        emb = sinusoidal_position_embedding(t, self.pos_dim, self.dtype)
        emb = nn.Dense(self.emb_dim, dtype=self.dtype, param_dtype=self.param_dtype)(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.emb_dim, dtype=self.dtype, param_dtype=self.param_dtype)(emb)
        return nn.silu(emb)


def group_norm(num_groups: int, dtype=jnp.float32, name: Optional[str] = None):
    """GroupNorm with torch-parity epsilon, computed in float32."""
    return nn.GroupNorm(
        num_groups=num_groups, epsilon=GN_EPS, dtype=jnp.float32, name=name
    )


class GNSiLU(nn.Module):
    """GroupNorm(+pre-bias, +FiLM)+SiLU through the fused Pallas kernel
    (dmme_tpu.ops.group_norm — fused forward AND backward; exact XLA
    fallback off-TPU). Parameter tree is identical to ``nn.GroupNorm``
    ({scale, bias} of shape (C,)), so checkpoints and the torch parity
    weight-copy machinery are unaffected by the fusion switch.
    """

    num_groups: int
    dtype: jnp.dtype = jnp.float32
    force: Optional[str] = None  # None=auto, "xla", "pallas", "interpret"

    @nn.compact
    def __call__(self, x, pre_bias=None, film_scale=None, film_shift=None):
        from dmme_tpu.ops.group_norm import group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if film_scale is not None:
            # GN(x)·(s+1)+shift with GN affine folded in:
            # γ_eff = scale·(s+1), β_eff = bias·(s+1) + shift, per sample
            fs = film_scale.astype(jnp.float32) + 1.0
            gamma = scale[None, :] * fs
            beta = bias[None, :] * fs + film_shift.astype(jnp.float32)
        else:
            gamma, beta = scale, bias
        y = group_norm_silu(
            x, gamma, beta, self.num_groups, GN_EPS,
            pre_bias=pre_bias, force=self.force,
        )
        return y.astype(self.dtype)


def conv3x3(features: int, stride: int = 1, dtype=jnp.float32, param_dtype=jnp.float32,
            name: Optional[str] = None):
    """3×3 conv with torch-style symmetric padding 1 (exact H/2 on stride 2)."""
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def conv1x1(features: int, dtype=jnp.float32, param_dtype=jnp.float32,
            name: Optional[str] = None):
    return nn.Conv(
        features, kernel_size=(1, 1), dtype=dtype, param_dtype=param_dtype, name=name
    )


class SelfAttention2d(nn.Module):
    """Pre-norm residual self-attention over the H·W token grid.

    Single-head when ``num_heads == 1`` (reference DDPM UNet,
    src/dmme/models/ddpm.py:38-75) or multi-head (reference IDDPM UNet,
    src/dmme/models/iddpm.py:16-59). Parity quirk kept: the softmax scale is
    ``dim**-0.5`` over the FULL channel dim even in the multi-head case —
    exactly what the reference computes.

    The attention einsums contract over ≤256 tokens and run in the compute
    dtype on the MXU; softmax is taken in float32 for stability.
    """

    dim: int
    num_groups: int = 32
    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        assert c == self.dim and c % heads == 0

        hx = group_norm(self.num_groups)(x).astype(self.dtype)
        qkv = conv1x1(3 * c, self.dtype, self.param_dtype, name="qkv_proj")(hx)
        qkv = qkv.reshape(n, h * w, 3, heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (n, hw, heads, hd)

        from dmme_tpu.ops.attention import attention_heads

        scale = self.dim ** -0.5  # parity: full-dim scale (see docstring)
        out = attention_heads(q, k, v, scale).reshape(n, h, w, c)
        out = conv1x1(c, self.dtype, self.param_dtype, name="proj")(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 3×3 conv (reference: src/dmme/models/ddpm.py:136-147)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv3x3(self.features, 2, self.dtype, self.param_dtype)(x)


class Upsample(nn.Module):
    """Nearest ×2 + 3×3 conv (reference: src/dmme/models/ddpm.py:150-173).

    Nearest-neighbor upsampling as a reshape-broadcast (no gather), which XLA
    fuses with the following conv.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
        x = x.reshape(n, 2 * h, 2 * w, c)
        return conv3x3(self.features, 1, self.dtype, self.param_dtype)(x)


class ResBlock(nn.Module):
    """GN→SiLU→Conv ×2 residual block with timestep conditioning.

    Two conditioning modes (selected by ``film``):

    * additive (reference DDPM UNet, src/dmme/models/ddpm.py:82-133):
      ``h = conv1(x); h += Dense(emb); h = conv2(h); h += skip(x)``
    * FiLM / AdaGN (reference IDDPM UNet, src/dmme/models/iddpm.py:89-118):
      ``h = conv1(x); h = gn(h)·(scale+1)+shift; h = conv2'(h); h += skip(x)``
      where (shift, scale) = Dense(2·c_out)(emb) and conv2' has no leading GN.

    Dropout matches torch ``nn.Dropout2d``: whole feature maps are dropped
    (broadcast over H and W), applied before the second conv only.
    An optional attention block runs last.
    """

    c_out: int
    with_attention: bool = False
    num_heads: int = 1
    film: bool = False
    num_groups: int = 32
    dropout: float = 0.1
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    #: route GN→SiLU (and the +cond / FiLM modulation around it) through the
    #: fused Pallas kernel; OPT-IN — loses end-to-end on v5e (see unet.py)
    fused_norm: bool = False
    #: mega-fused ResBlock forward (GN+conv+cond+GN+conv+residual in ONE
    #: Pallas kernel) — inference only; ignored when not deterministic
    fused_block: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        deterministic = self.deterministic
        c_in = x.shape[-1]

        if self.fused_block and deterministic:
            h = self._fused_block(x, emb)
            if self.with_attention:
                h = SelfAttention2d(
                    self.c_out, self.num_groups, self.num_heads,
                    self.dtype, self.param_dtype, name="attention",
                )(h)
            return h

        if self.fused_norm:
            h = GNSiLU(self.num_groups, self.dtype, name="norm1")(x)
        else:
            h = group_norm(self.num_groups, name="norm1")(x).astype(self.dtype)
            h = nn.silu(h)
        h = conv3x3(self.c_out, 1, self.dtype, self.param_dtype, name="conv1")(h)

        if self.film:
            cond = nn.Dense(
                2 * self.c_out, dtype=self.dtype, param_dtype=self.param_dtype,
                name="condition",
            )(emb)
            if self.fused_norm:
                shift, scale = jnp.split(cond, 2, axis=-1)  # (N, C) each
                h = GNSiLU(self.num_groups, self.dtype, name="norm2")(
                    h, film_scale=scale, film_shift=shift
                )
            else:
                shift, scale = jnp.split(cond[:, None, None, :], 2, axis=-1)
                h = group_norm(self.num_groups, name="norm2")(h).astype(self.dtype)
                h = h * (scale + 1.0) + shift
                h = nn.silu(h)
        else:
            cond = nn.Dense(
                self.c_out, dtype=self.dtype, param_dtype=self.param_dtype,
                name="condition",
            )(emb)
            if self.fused_norm:
                # GN(h + cond) + SiLU in one kernel (pre-bias folds into the
                # group statistics analytically)
                h = GNSiLU(self.num_groups, self.dtype, name="norm2")(
                    h, pre_bias=cond
                )
            else:
                h = h + cond[:, None, None, :]
                h = group_norm(self.num_groups, name="norm2")(h).astype(self.dtype)
                h = nn.silu(h)

        if self.dropout > 0.0:
            h = nn.Dropout(
                rate=self.dropout, broadcast_dims=(1, 2), deterministic=deterministic
            )(h)  # torch Dropout2d parity: drop whole channels
        h = conv3x3(self.c_out, 1, self.dtype, self.param_dtype, name="conv2")(h)

        if c_in != self.c_out:
            x = conv1x1(self.c_out, self.dtype, self.param_dtype, name="residual")(x)
        h = h + x

        if self.with_attention:
            h = SelfAttention2d(
                self.c_out,
                self.num_groups,
                self.num_heads,
                self.dtype,
                self.param_dtype,
                name="attention",
            )(h)
        return h

    def _fused_block(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        """Inference-only mega-fused path (dmme_tpu.ops.resblock): the whole
        GN→conv→cond→GN→conv→residual chain runs as one Pallas kernel.

        Parameters stay owned by the SAME submodules as the standard path —
        they are declared via cheap 1×1-spatial dummy calls (dead compute,
        eliminated by XLA) and read through ``child.variables``, so the
        param tree, checkpoints, and init are identical either way."""
        from dmme_tpu.ops.resblock import resblock_forward

        c_in = x.shape[-1]
        n = x.shape[0]
        gn1 = group_norm(self.num_groups, name="norm1")
        conv1m = conv3x3(self.c_out, 1, self.dtype, self.param_dtype, name="conv1")
        condm = nn.Dense(
            (2 if self.film else 1) * self.c_out,
            dtype=self.dtype, param_dtype=self.param_dtype, name="condition",
        )
        gn2 = group_norm(self.num_groups, name="norm2")
        conv2m = conv3x3(self.c_out, 1, self.dtype, self.param_dtype, name="conv2")
        resm = (
            conv1x1(self.c_out, self.dtype, self.param_dtype, name="residual")
            if c_in != self.c_out
            else None
        )

        # declare params (results unused → DCE'd); same module names/shapes
        dummy = x[:1, :1, :1, :]
        d = conv1m(gn1(dummy).astype(self.dtype))
        d = conv2m(gn2(d).astype(self.dtype))
        if resm is not None:
            resm(dummy)
        cond = condm(emb)  # real compute: (N, C) or (N, 2C)

        def p(m, k):
            return m.variables["params"][k]

        g1 = jnp.broadcast_to(p(gn1, "scale")[None], (n, c_in)).astype(jnp.float32)
        b1v = jnp.broadcast_to(p(gn1, "bias")[None], (n, c_in)).astype(jnp.float32)
        if self.film:
            shift, scale = jnp.split(cond.astype(jnp.float32), 2, axis=-1)
            fs = scale + 1.0
            g2 = p(gn2, "scale")[None] * fs
            b2v = p(gn2, "bias")[None] * fs + shift
            pre2 = jnp.zeros_like(g2)
        else:
            pre2 = cond.astype(jnp.float32)
            g2 = jnp.broadcast_to(p(gn2, "scale")[None], (n, self.c_out)).astype(jnp.float32)
            b2v = jnp.broadcast_to(p(gn2, "bias")[None], (n, self.c_out)).astype(jnp.float32)

        return resblock_forward(
            x.astype(self.dtype),
            g1, b1v, pre2, g2, b2v,
            p(conv1m, "kernel"), p(conv1m, "bias"),
            p(conv2m, "kernel"), p(conv2m, "bias"),
            wr=None if resm is None else p(resm, "kernel"),
            br=None if resm is None else p(resm, "bias"),
            num_groups=self.num_groups,
            eps=GN_EPS,
        )
