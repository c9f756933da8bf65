"""Mega-fused ResBlock forward — one Pallas kernel per block, inference path.

Round-2 profiling (docs/performance.md) showed the per-op recoverable
overhead lives in the GN statistics / elementwise passes BETWEEN convs, and
that fusing GN alone loses to the relayout tax at every kernel boundary.
This kernel amortizes that boundary over the whole ResBlock
(reference semantics: src/dmme/models/ddpm.py:82-133 additive /
src/dmme/models/iddpm.py:89-118 FiLM):

    h = silu(GN1(x))                      ── stats on the fly
    h = conv3x3(h) + b1                   ── 9 shifted MXU matmuls
    h = silu(GN2(h + cond)) or silu(FiLM(GN2(h)))
    h = conv3x3(h) + b2
    out = h + (x | conv1x1(x))

HBM traffic per block: read x (+weights), write out — versus ~6-8 tensor
passes on the XLA path. Forward/inference only (sampling is pure forward;
training keeps the XLA path). Dropout is not applied (eval semantics).

Conv-as-shifted-matmul: the (B,H,W,C) block is zero-padded once in VMEM;
each of the 9 taps is a static slice reshaped to (B·H·W, C) — merging
non-lane dims is legal in Mosaic (only lane splits are not) — matmul'd
against that tap's (C_in, C_out) kernel slice with f32 accumulation.

Used via ``ResBlock(fused_block=True)`` / ``UNet(fused_block=True)`` when
not training; exact XLA fallback off-TPU. Measured end-to-end in
docs/performance.md before any default changes (round-1 lesson).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from dmme_tpu.ops.attention import on_tpu
from dmme_tpu.ops.group_norm import _onehot  # shared channel→group matmul

from dmme_tpu.models.blocks import GN_EPS  # single source for the GN epsilon


def _gn_silu(xf, gamma, beta, pre_bias, num_groups, eps):
    """f32 (B,H,W,C) → silu(GN(x + pre_bias)·γ + β), stats via one-hot matmul."""
    b, h, w, c = xf.shape
    cg = c // num_groups
    hw = h * w
    cnt = hw * cg
    chan_sum = jnp.sum(xf, axis=(1, 2))
    chan_sq = jnp.sum(jnp.square(xf), axis=(1, 2))
    usum = chan_sum + hw * pre_bias
    usq = chan_sq + 2.0 * pre_bias * chan_sum + hw * jnp.square(pre_bias)
    onehot = _onehot(c, num_groups)
    mean_g = jnp.dot(usum, onehot, preferred_element_type=jnp.float32) / cnt
    var_g = jnp.dot(usq, onehot, preferred_element_type=jnp.float32) / cnt - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)
    a = (inv_c * gamma)[:, None, None, :]
    d = (beta + (pre_bias - mean_c) * inv_c * gamma)[:, None, None, :]
    y = xf * a + d
    return y * jax.nn.sigmoid(y)


def _conv3x3(h, w9, bias, out_c, dtype):
    """h: (B,H,W,Cin) compute-dtype; w9: (9, Cin, Cout); returns f32."""
    b, hh, ww, cin = h.shape
    pad = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b * hh * ww, out_c), jnp.float32)
    for k in range(9):
        dy, dx = divmod(k, 3)
        tap = pad[:, dy : dy + hh, dx : dx + ww, :].reshape(b * hh * ww, cin)
        acc = acc + jnp.dot(
            tap, w9[k].astype(dtype), preferred_element_type=jnp.float32
        )
    return acc.reshape(b, hh, ww, out_c) + bias[0][None, None, None, :]


def _resblock_kernel(num_groups, eps, has_proj, dtype,
                     x_ref, g1_ref, b1v_ref, pre2_ref, g2_ref, b2v_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, *rest):
    if has_proj:
        wr_ref, br_ref, o_ref = rest
    else:
        (o_ref,) = rest
    xb = x_ref[...]
    bsz, h, w, cin = xb.shape
    xf = xb.astype(jnp.float32)
    zeros_in = jnp.zeros_like(g1_ref[...])

    h0 = _gn_silu(xf, g1_ref[...], b1v_ref[...], zeros_in, num_groups, eps)
    h1 = _conv3x3(h0.astype(dtype), w1_ref[...], b1_ref, o_ref.shape[-1], dtype)
    h2 = _gn_silu(h1, g2_ref[...], b2v_ref[...], pre2_ref[...], num_groups, eps)
    h3 = _conv3x3(h2.astype(dtype), w2_ref[...], b2_ref, o_ref.shape[-1], dtype)

    if has_proj:
        skip = jnp.dot(
            xb.reshape(bsz * h * w, cin),
            wr_ref[...].astype(dtype),
            preferred_element_type=jnp.float32,
        ).reshape(bsz, h, w, -1) + br_ref[0][None, None, None, :]
    else:
        skip = xf
    o_ref[...] = (h3 + skip).astype(o_ref.dtype)


def _resblock_xla(x, g1, b1v, pre2, g2, b2v, w1, b1, w2, b2, wr, br,
                  num_groups, eps):
    """Exact same math through plain jnp — fallback + test oracle."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    zeros_in = jnp.zeros_like(g1)
    h0 = _gn_silu(xf, g1, b1v, zeros_in, num_groups, eps)
    n, hh, ww, cin = x.shape
    cout = w1.shape[-1]

    def conv(h, w9, bias):
        pad = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((n, hh, ww, w9.shape[-1]), jnp.float32)
        for k in range(9):
            dy, dx = divmod(k, 3)
            tap = pad[:, dy : dy + hh, dx : dx + ww, :]
            acc = acc + jnp.einsum(
                "nhwc,cd->nhwd", tap, w9[k].astype(h.dtype),
                preferred_element_type=jnp.float32,
            )
        return acc + bias[None, None, None, :]

    h1 = conv(h0.astype(dtype), w1, b1)
    h2 = _gn_silu(h1, g2, b2v, pre2, num_groups, eps)
    h3 = conv(h2.astype(dtype), w2, b2)
    if wr is not None:
        skip = jnp.einsum(
            "nhwc,cd->nhwd", x, wr.astype(dtype),
            preferred_element_type=jnp.float32,
        ) + br[None, None, None, :]
    else:
        skip = xf
    return (h3 + skip).astype(dtype)


def _pick_block_n(n, h, w, cin, cout, itemsize) -> int:
    # residency: x + padded taps + two f32 intermediates + out
    per_sample = h * w * (cin + cout) * (itemsize + 8)
    if per_sample == 0:
        return 0
    budget = max(int(48e6 // per_sample), 0)
    block = min(budget - budget % 8, n, 32)
    while block >= 8 and n % block:
        block -= 8
    return block if block >= 8 and n % block == 0 else 0


def resblock_forward(
    x: jax.Array,
    g1, b1v,            # GN1 affine, (N, Cin) f32
    pre2, g2, b2v,      # GN2 pre-bias + affine, (N, Cout) f32
    w1, b1,             # (3,3,Cin,Cout) HWIO + (Cout,)
    w2, b2,             # (3,3,Cout,Cout) + (Cout,)
    wr: Optional[jax.Array] = None,   # (1,1,Cin,Cout) or None
    br: Optional[jax.Array] = None,
    num_groups: int = 32,
    eps: float = GN_EPS,
    force: Optional[str] = None,
) -> jax.Array:
    """Fused ResBlock forward (see module docstring). Inference only."""
    n, h, w_, cin = x.shape
    cout = w1.shape[-1]
    w1_9 = w1.reshape(9, cin, cout)
    w2_9 = w2.reshape(9, cout, cout)
    wr_m = None if wr is None else wr.reshape(cin, cout)

    if force == "xla" or (
        force is None
        and not (_HAS_PALLAS and on_tpu() and cout % num_groups == 0 and cout >= 128)
    ):
        return _resblock_xla(
            x, g1, b1v, pre2, g2, b2v, w1_9, b1, w2_9, b2, wr_m, br,
            num_groups, eps,
        )

    interpret = force == "interpret"
    block_n = n if interpret else _pick_block_n(n, h, w_, cin, cout, x.dtype.itemsize)
    if block_n == 0:
        return _resblock_xla(
            x, g1, b1v, pre2, g2, b2v, w1_9, b1, w2_9, b2, wr_m, br,
            num_groups, eps,
        )

    has_proj = wr_m is not None
    dtype = x.dtype

    def vec(c):
        return pl.BlockSpec((block_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    img_in = pl.BlockSpec((block_n, h, w_, cin), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    img_out = pl.BlockSpec((block_n, h, w_, cout), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    inputs = [x, g1, b1v, pre2, g2, b2v, w1_9, b1.reshape(1, cout),
              w2_9, b2.reshape(1, cout)]
    in_specs = [img_in, vec(cin), vec(cin), vec(cout), vec(cout), vec(cout),
                full((9, cin, cout)), full((1, cout)),
                full((9, cout, cout)), full((1, cout))]
    if has_proj:
        inputs += [wr_m, br.reshape(1, cout)]
        in_specs += [full((cin, cout)), full((1, cout))]

    kernel = functools.partial(
        _resblock_kernel, num_groups, eps, has_proj, dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w_, cout), dtype),
        grid=(n // block_n,),
        in_specs=in_specs,
        out_specs=img_out,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
