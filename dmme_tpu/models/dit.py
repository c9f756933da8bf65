"""DiT — Diffusion Transformer denoiser (Peebles & Xie 2023,
arXiv:2212.09748), adaLN-Zero variant.

Capability beyond the reference (whose only denoisers are convolutional
UNets, src/dmme/models/{ddpm,iddpm}.py) — and the most TPU-native backbone
in the framework: every layer is a large dense matmul over a static token
grid, so the whole forward pass lands on the MXU with no resolution-
dependent control flow; attention goes through the shared fused op
(dmme_tpu.ops.attention.attention_heads); and tensor parallelism falls out
of the existing Megatron-style last-axis sharding rule
(parallel/mesh.py:fsdp_param_spec) because every weight is a Dense kernel —
the qkv/MLP-in projections shard column-parallel, and the SPMD partitioner
inserts the contraction all-reduces for the output projections.

Contract: identical to the UNets' — ``__call__(x, t, *, y=None,
train=False)`` over NHWC images with integer-or-float timesteps — so a DiT
drops into every harness (LitDDPM / LitIDDPM / LitFlow / CFG / distill)
and every sampler without new wiring. ``out_channels = 2 * in_channels``
gives the IDDPM learned-variance head (the paper's DiT also predicts Σ).

adaLN-Zero: each block's modulation MLP and the final projection are
zero-initialized, so at init every block is the identity and the model
output is exactly 0 — the residual trunk starts as a no-op and
conditioning grows from zero (tests/test_dit.py pins this property).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmme_tpu.models.blocks import TimeEmbedding
from dmme_tpu.ops.attention import attention_heads


def posemb_sincos_2d(gh: int, gw: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Fixed 2D sin-cos positional embedding, shape ``(gh * gw, dim)``.

    Half the channels encode the row coordinate, half the column, each as
    a standard sinusoidal embedding (ViT convention). Non-learned, so the
    same checkpoint structure serves any resolution whose grid fits the
    patch size (the flow sampler's resolution-shift story, diffusion/flow.py).
    """
    assert dim % 4 == 0, f"posemb dim {dim} must be divisible by 4"
    quarter = dim // 4
    omega = jnp.exp(
        jnp.arange(quarter, dtype=jnp.float32)
        * -(math.log(10000.0) / max(quarter - 1, 1))
    )
    yy, xx = jnp.meshgrid(
        jnp.arange(gh, dtype=jnp.float32),
        jnp.arange(gw, dtype=jnp.float32),
        indexing="ij",
    )
    y = yy.reshape(-1)[:, None] * omega[None, :]
    x = xx.reshape(-1)[:, None] * omega[None, :]
    pe = jnp.concatenate(
        [jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=1
    )
    return pe.astype(dtype)


def _norm(dtype):
    """Pre-modulation LayerNorm: NO learned scale/bias — adaLN supplies
    both per-sample from the conditioning vector."""
    return nn.LayerNorm(use_scale=False, use_bias=False, dtype=dtype)


def _modulate(h: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return h * (1.0 + scale) + shift


class DiTBlock(nn.Module):
    """One transformer block with adaLN-Zero conditioning.

    The 6·hidden modulation vector (shift/scale/gate for attention and MLP
    branches) comes from a zero-initialized Dense on SiLU(c), so both
    residual branches are gated off at init.
    """

    hidden: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    #: static dropout switch (attribute, not call arg, so ``nn.remat``
    #: needs no static_argnums)
    deterministic: bool = True
    #: >0 → the MLP branch becomes a mixture-of-experts FFN (models/moe.py)
    #: with this many experts, shardable over the ``expert`` mesh axis
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_router_noise: float = 1.0
    moe_sinkhorn_iters: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array):
        n, t, d = x.shape
        assert d % self.num_heads == 0, (d, self.num_heads)
        head_dim = d // self.num_heads

        mod = nn.Dense(
            6 * self.hidden,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="adaln_mod",
        )(nn.silu(c))[:, None, :]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        # ---- attention branch
        h = _modulate(_norm(self.dtype)(x), sh1, sc1)
        qkv = nn.Dense(
            3 * d, dtype=self.dtype, param_dtype=self.param_dtype, name="qkv"
        )(h)
        qkv = qkv.reshape(n, t, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = attention_heads(q, k, v, scale=head_dim ** -0.5)
        attn = nn.Dense(
            d, dtype=self.dtype, param_dtype=self.param_dtype, name="proj"
        )(attn.reshape(n, t, d))
        x = x + g1 * attn

        # ---- MLP branch (dense or mixture-of-experts)
        h = _modulate(_norm(self.dtype)(x), sh2, sc2)
        if self.num_experts > 0:
            from dmme_tpu.models.moe import MoEMlp

            h = MoEMlp(
                num_experts=self.num_experts,
                mlp_dim=int(d * self.mlp_ratio),
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                router_noise=self.moe_router_noise,
                sinkhorn_iters=self.moe_sinkhorn_iters,
                deterministic=self.deterministic,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="moe_mlp",
            )(h)
        else:
            h = nn.Dense(
                int(d * self.mlp_ratio),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="mlp_in",
            )(h)
            h = nn.gelu(h, approximate=True)
            if self.dropout > 0.0:
                h = nn.Dropout(
                    self.dropout, deterministic=self.deterministic
                )(h)
            h = nn.Dense(
                d, dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp_out",
            )(h)
        return x + g2 * h


class DiT(nn.Module):
    """Diffusion Transformer over NHWC images.

    Defaults are DiT-S-ish scaled to the 32px configs (patch 4 → 64
    tokens). ``num_classes`` adds a class-embedding table with a trailing
    null/unconditional row — the same convention as models/unet.py:218-226,
    so classifier-free guidance (diffusion/cfg.py) works unchanged.
    """

    patch_size: int = 4
    hidden: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    in_channels: int = 3
    #: None → in_channels (ε/velocity head); 2·in_channels → IDDPM-style
    #: learned-variance head (ε ‖ v)
    out_channels: Optional[int] = None
    num_classes: Optional[int] = None
    pos_dim: int = 256
    dropout: float = 0.0
    #: >0 → sparse MoE FFNs (models/moe.py) in every ``moe_stride``-th
    #: block (the others keep dense MLPs, the usual interleaving)
    num_experts: int = 0
    moe_stride: int = 2
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    #: router exploration-noise std during training (models/moe.py)
    moe_router_noise: float = 1.0
    #: training-time sinkhorn balancing iterations (models/moe.py; 0 = off)
    moe_sinkhorn_iters: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    #: rematerialize each block (trade FLOPs for HBM at depth)
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        *,
        y: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        n, ih, iw, ic = x.shape
        p = self.patch_size
        assert ih % p == 0 and iw % p == 0, (
            f"image {ih}x{iw} not divisible by patch {p}"
        )
        assert ic == self.in_channels, (ic, self.in_channels)
        out_ch = self.out_channels or self.in_channels
        gh, gw = ih // p, iw // p

        # patchify: one strided conv == one (gh·gw, p·p·C)×(p·p·C, hidden)
        # matmul on the MXU
        h = nn.Conv(
            self.hidden,
            (p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        h = h.reshape(n, gh * gw, self.hidden)
        h = h + posemb_sincos_2d(gh, gw, self.hidden, self.dtype)[None]

        # conditioning vector: timestep (+ class)
        c = TimeEmbedding(
            self.pos_dim, self.hidden, self.dtype, self.param_dtype,
            name="time_embed",
        )(t)
        if self.num_classes is not None:
            assert y is not None, "class-conditional DiT needs labels y"
            c = c + nn.Embed(
                self.num_classes + 1,  # last row = null/unconditional token
                self.hidden,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="class_embed",
            )(y)

        block_cls = nn.remat(DiTBlock) if self.remat else DiTBlock
        for i in range(self.depth):
            # MoE (if enabled) in every moe_stride-th block, starting from
            # the second — first block stays dense (routing on raw patch
            # embeddings is noise)
            moe_here = (
                self.num_experts > 0 and i % self.moe_stride == 1 % self.moe_stride
            )
            h = block_cls(
                hidden=self.hidden,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                deterministic=not train,
                num_experts=self.num_experts if moe_here else 0,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                moe_router_noise=self.moe_router_noise,
                moe_sinkhorn_iters=self.moe_sinkhorn_iters,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(h, c)

        # final layer: adaLN (shift/scale only) + zero-init projection
        mod = nn.Dense(
            2 * self.hidden,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="final_mod",
        )(nn.silu(c))[:, None, :]
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = _modulate(_norm(self.dtype)(h), shift, scale)
        h = nn.Dense(
            p * p * out_ch,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="final_proj",
        )(h)

        # unpatchify → (N, H, W, out_ch), f32 like the UNets' output
        h = h.reshape(n, gh, gw, p, p, out_ch)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, ih, iw, out_ch)
        return h.astype(jnp.float32)


# ---------------------------------------------------------------- presets
def DiT_S(patch_size: int = 4, **kwargs) -> DiT:
    """DiT-S (paper Table 1): hidden 384, depth 12, 6 heads (~33M)."""
    return DiT(patch_size=patch_size, hidden=384, depth=12, num_heads=6,
               **kwargs)


def DiT_B(patch_size: int = 4, **kwargs) -> DiT:
    """DiT-B: hidden 768, depth 12, 12 heads (~130M)."""
    return DiT(patch_size=patch_size, hidden=768, depth=12, num_heads=12,
               **kwargs)


def DiT_L(patch_size: int = 4, **kwargs) -> DiT:
    """DiT-L: hidden 1024, depth 24, 16 heads (~458M)."""
    return DiT(patch_size=patch_size, hidden=1024, depth=24, num_heads=16,
               **kwargs)
