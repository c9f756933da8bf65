"""The dmme UNet topology, re-expressed as a static layer plan + one linen module.

The reference builds its layer lists imperatively inside ``UNet.__init__``
(src/dmme/models/ddpm.py:203-279). Here the same topology is computed up
front by :func:`build_topology` into plain-data specs — easier to test for
parity (the plan is inspectable without instantiating parameters) and keeps
the module's ``__call__`` a flat Python loop that unrolls into one static XLA
graph (no data-dependent control flow).

Skip-connection discipline (parity-critical): the down path records the
feature map after the input conv AND after every down layer **including the
DownSamples**; every up-path ResBlock pops one record and channel-concats it.
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dmme_tpu.models.blocks import (
    Downsample,
    GNSiLU,
    ResBlock,
    TimeEmbedding,
    Upsample,
    conv3x3,
    group_norm,
)


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    kind: Literal["res", "down", "up"]
    c_out: int
    attention: bool = False
    #: resolution depth of this layer's OUTPUT (1 = input resolution);
    #: drives the deep-cache split (diffusion/deep_cache.py)
    depth: int = 0


def build_topology(
    channels_per_depth: Sequence[int],
    num_blocks: int,
    attention_depths: Sequence[int],
) -> Tuple[Tuple[LayerSpec, ...], Tuple[LayerSpec, ...], Tuple[LayerSpec, ...]]:
    """Compute (down, middle, up) layer plans.

    Mirrors the channel bookkeeping of the reference's constructor
    (src/dmme/models/ddpm.py:203-279): a flat ``channels`` ladder of
    ``1 + num_blocks·len(channels_per_depth)`` entries, downsample after each
    depth's block group except the last, and an up path that walks the ladder
    backwards inserting an extra (skip-consuming) ResBlock + Upsample at each
    depth boundary, closing with one final ResBlock at the input width.
    """
    cpd = tuple(channels_per_depth)
    attn = frozenset(attention_depths)
    ladder = [cpd[0]]
    for c in cpd:
        ladder.extend([c] * num_blocks)
    boundaries = {num_blocks * i for i in range(1, len(cpd))}

    down = []
    depth = 1
    for i in range(len(ladder) - 1):
        down.append(LayerSpec("res", ladder[i + 1], depth in attn, depth))
        if (i + 1) in boundaries:
            # a DownSample's OUTPUT is at the next depth
            down.append(LayerSpec("down", ladder[i + 1], depth=depth + 1))
            depth += 1

    c_mid = ladder[-1]
    d_mid = len(cpd)
    middle = (
        LayerSpec("res", c_mid, True, d_mid),
        LayerSpec("res", c_mid, False, d_mid),
    )

    up = []
    rev = ladder[::-1]
    depth = len(cpd)
    for i in range(len(rev) - 1):
        c_out = rev[i + 1]
        with_attention = depth in attn
        layer_num = len(ladder) - 1 - i
        up.append(LayerSpec("res", c_out, with_attention, depth))
        if (layer_num - 1) in boundaries:
            up.append(LayerSpec("res", c_out, with_attention, depth))
            # an UpSample's OUTPUT is at the next-shallower depth
            up.append(LayerSpec("up", c_out, depth=depth - 1))
            depth -= 1
    up.append(LayerSpec("res", ladder[0], 1 in attn, 1))

    return tuple(down), middle, tuple(up)


class UNet(nn.Module):
    """Timestep-conditioned UNet denoiser (NHWC).

    One module covers both reference variants:

    * DDPM UNet (src/dmme/models/ddpm.py:176-316): ``film=False``,
      ``num_heads=1``, ``out_channels = in_channels`` (ε-prediction).
    * IDDPM UNet (src/dmme/models/iddpm.py:126-265): ``film=True``,
      ``num_heads=4``, ``out_channels = 2·in_channels`` (ε ‖ v).

    ``remat`` wraps each ResBlock in ``jax.checkpoint`` — recompute
    activations in the backward pass instead of holding them in HBM.
    """

    in_channels: int = 3
    out_channels: int | None = None
    pos_dim: int = 128
    emb_dim: int = 512
    num_groups: int = 32
    dropout: float = 0.1
    channels_per_depth: Tuple[int, ...] = (128, 256, 256, 256)
    num_blocks: int = 2
    attention_depths: Tuple[int, ...] = (2,)
    film: bool = False
    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    #: fused Pallas GN+SiLU path — OPT-IN: measured 46.8 vs 29.9 ms/step
    #: end-to-end on v5e (docs/performance.md ablations; XLA fuses GN's
    #: normalize into the consumer conv, so the standalone kernel adds passes)
    fused_norm: bool = False
    #: mega-fused ResBlock forward (one Pallas kernel per block) for
    #: inference/sampling; ignored while training (see ops/resblock.py)
    fused_block: bool = False
    #: class-conditional mode: a label embedding added to the timestep
    #: embedding. The table has num_classes + 1 rows — index ``num_classes``
    #: is the NULL (unconditional) token used for classifier-free guidance
    #: training dropout and sampling (dmme_tpu.diffusion.cfg).
    num_classes: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        *,
        y: Optional[jax.Array] = None,
        train: bool = False,
        return_features: bool = False,
        cached=None,
        cache_depth: Optional[int] = None,
        deep_cache: Optional[jax.Array] = None,
        return_deep: bool = False,
    ):
        """Predict noise (and variance interpolation if configured) from NHWC ``x``.

        Args:
            x: image batch, shape (N, H, W, C), value range [-1, 1].
            t: integer timesteps, shape (N,) (broadcast from scalars upstream).
            train: enables dropout (requires a ``dropout`` rng).
            return_features: also return the encoder state
                ``(h_bottom, skips)`` for later reuse.
            cached: encoder state from a previous call — skips the entire
                down path and decodes with the CURRENT timestep embedding
                (encoder-reuse fast sampling, "Faster Diffusion"-style;
                see dmme_tpu.diffusion.fast).
            cache_depth: with ``return_deep``/``deep_cache``, the boundary
                for DEEP-feature caching ("DeepCache"-style,
                dmme_tpu.diffusion.deep_cache): resolution depths
                > cache_depth form the cached core. ``return_deep=True``
                also returns the deep-core output; ``deep_cache=<that
                array>`` skips the whole core (down suffix + middle + up
                prefix) and decodes the shallow layers with fresh skips
                and the CURRENT timestep embedding.
        """
        down_specs, middle_specs, up_specs = build_topology(
            self.channels_per_depth, self.num_blocks, self.attention_depths
        )

        n_shallow_down = n_deep_up = None
        if cache_depth is not None:
            assert cached is None, "deep cache and encoder cache are exclusive"
            assert 1 <= cache_depth < len(self.channels_per_depth), cache_depth
            n_shallow_down = sum(1 for s in down_specs if s.depth <= cache_depth)
            assert all(s.depth <= cache_depth for s in down_specs[:n_shallow_down])
            assert all(s.depth > cache_depth for s in down_specs[n_shallow_down:])
            # the deep core's last layer is the UpSample returning to
            # cache_depth resolution
            n_deep_up = (
                next(
                    i for i, s in enumerate(up_specs)
                    if s.kind == "up" and s.depth == cache_depth
                )
                + 1
            )

        block_cls = nn.remat(ResBlock) if self.remat else ResBlock

        def res(spec: LayerSpec, name: str):
            return block_cls(
                c_out=spec.c_out,
                with_attention=spec.attention,
                num_heads=self.num_heads,
                film=self.film,
                num_groups=self.num_groups,
                dropout=self.dropout,
                deterministic=not train,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_norm=self.fused_norm,
                fused_block=self.fused_block,
                name=name,
            )

        emb = TimeEmbedding(
            self.pos_dim, self.emb_dim, self.dtype, self.param_dtype, name="time_embed"
        )(t)
        if self.num_classes is not None:
            assert y is not None, "class-conditional UNet needs labels y"
            emb = emb + nn.Embed(
                self.num_classes + 1,  # last row = null/unconditional token
                self.emb_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="class_embed",
            )(y)

        reuse_deep = deep_cache is not None
        if cached is None:
            x = x.astype(self.dtype)
            h = conv3x3(
                self.channels_per_depth[0], 1, self.dtype, self.param_dtype,
                name="input_conv",
            )(x)

            skips = [h]
            n_down = n_shallow_down if reuse_deep else len(down_specs)
            for i, spec in enumerate(down_specs[:n_down]):
                if spec.kind == "res":
                    h = res(spec, f"down_{i}")(h, emb)
                else:
                    h = Downsample(
                        spec.c_out, self.dtype, self.param_dtype, name=f"down_{i}"
                    )(h)
                skips.append(h)
        else:
            h, skips = cached
            skips = list(skips)
        features = (h, tuple(skips))

        deep = None
        if reuse_deep:
            # the entire deep core (down suffix + middle + up prefix) is
            # replaced by the cached deep-out; decode shallow layers with
            # fresh skips and the CURRENT timestep embedding
            h = deep_cache.astype(self.dtype)
            up_start = n_deep_up
        else:
            for i, spec in enumerate(middle_specs):
                h = res(spec, f"middle_{i}")(h, emb)
            up_start = 0

        for i, spec in enumerate(up_specs):
            if i < up_start:
                continue
            if spec.kind == "res":
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = res(spec, f"up_{i}")(h, emb)
            else:
                h = Upsample(spec.c_out, self.dtype, self.param_dtype, name=f"up_{i}")(h)
            if return_deep and n_deep_up is not None and i == n_deep_up - 1:
                deep = h
        assert not skips, "unconsumed skip connections — topology mismatch"

        out_ch = self.out_channels or self.in_channels
        if self.fused_norm:
            h = GNSiLU(self.num_groups, self.dtype, name="out_norm")(h)
        else:
            h = group_norm(self.num_groups, name="out_norm")(h).astype(self.dtype)
            h = nn.silu(h)
        h = conv3x3(out_ch, 1, self.dtype, self.param_dtype, name="output_conv")(h)
        if return_deep:
            assert deep is not None, "return_deep requires cache_depth"
            return h, deep
        if return_features:
            return h, features
        return h
