"""Fused GroupNorm(+pre-bias, +affine)+SiLU — Pallas forward AND backward.

Motivation (profiled, docs/performance.md): XLA runs GroupNorm as a separate
f32 convert+reduce pass over the activation followed by the normalize/silu
fusion — the activation crosses HBM twice in the forward and several more
times in the backward (round 1 measured GN statistics at ~19% of the train
step). Round 1's forward-only kernel LOST end-to-end because its custom VJP
recomputed through XLA; this version fuses both directions:

* forward: one VMEM residency computes group statistics, the normalization,
  the (per-sample) affine, and SiLU — one read of x, one write of y, plus a
  tiny (N, G) stats output saved for the backward.
* backward: one VMEM residency reads (x, dz), recomputes x̂ from the saved
  statistics (no extra HBM pass), and emits dx plus the (N, C) reductions
  dγ/dβ/dbias — replacing XLA's multi-pass reduce pipeline.

The optional ``pre_bias`` input folds the DDPM ResBlock's additive timestep
conditioning ``GN(h + cond)`` into the same kernel: a per-(N, C) bias shifts
the channel sums analytically (Σ(x+b) = Σx + HW·b, Σ(x+b)² = Σx² + 2bΣx +
HW·b²), so the separate add never materializes in HBM.

Mosaic notes (hard-won, round 1): the lane (=channel) dimension cannot be
reshaped/split inside a kernel — channel→group aggregation runs as a one-hot
matmul on the MXU; (B, C) blocks need B % 8 == 0; scoped VMEM defaults to
16 MB and is raised via CompilerParams.

Off-TPU or on shapes the heuristic rejects, an exact XLA fallback computes
identical math.
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


# ---------------------------------------------------------------- XLA exact
def _gn_silu_xla(x, gamma, beta, bias, num_groups, eps):
    """Reference path: silu(GN(x + bias)·gamma + beta), f32 statistics."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32) + bias[:, None, None, :]
    xg = xf.reshape(n, h * w, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xg).mean(axis=(1, 3), keepdims=True) - jnp.square(mean)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c)
    y = y * gamma[:, None, None, :] + beta[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


# ------------------------------------------------------------------ kernels
def _onehot(c, num_groups):
    cg = c // num_groups
    chan_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    return (chan_ids == grp_ids).astype(jnp.float32)  # (C, G)


def _fwd_kernel(num_groups, eps, x_ref, g_ref, b_ref, bias_ref,
                o_ref, mean_ref, inv_ref):
    xb = x_ref[...]  # (B, H, W, C)
    bsz, h, w, c = xb.shape
    cg = c // num_groups
    hw = h * w
    cnt = hw * cg
    xf = xb.astype(jnp.float32)
    bias = bias_ref[...]  # (B, C) f32

    # per-(sample, channel) sums over the spatial plane — lane dim stays C
    chan_sum = jnp.sum(xf, axis=(1, 2))                 # (B, C)
    chan_sq = jnp.sum(jnp.square(xf), axis=(1, 2))
    # fold the per-channel pre-bias into the sums analytically
    usum = chan_sum + hw * bias
    usq = chan_sq + 2.0 * bias * chan_sum + hw * jnp.square(bias)

    onehot = _onehot(c, num_groups)
    grp_sum = jnp.dot(usum, onehot, preferred_element_type=jnp.float32)
    grp_sq = jnp.dot(usq, onehot, preferred_element_type=jnp.float32)
    mean_g = grp_sum / cnt                               # (B, G)
    var_g = grp_sq / cnt - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_ref[...] = mean_g
    inv_ref[...] = inv_g

    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)

    g = g_ref[...]                                       # (B, C) f32
    b = b_ref[...]
    # y = (x + bias − mean)·inv·γ + β  =  x·a + d
    a = (inv_c * g)[:, None, None, :]
    d = (b + (bias - mean_c) * inv_c * g)[:, None, None, :]
    y = xf * a + d
    o_ref[...] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _bwd_kernel(num_groups, eps, x_ref, g_ref, b_ref, bias_ref, mean_ref,
                inv_ref, dz_ref, dx_ref, dg_ref, db_ref, dbias_ref):
    xb = x_ref[...]
    bsz, h, w, c = xb.shape
    cg = c // num_groups
    cnt = h * w * cg
    xf = xb.astype(jnp.float32)
    dz = dz_ref[...].astype(jnp.float32)

    onehot = _onehot(c, num_groups)
    mean_c = jnp.dot(mean_ref[...], onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_ref[...], onehot.T, preferred_element_type=jnp.float32)
    bias = bias_ref[...]
    g = g_ref[...]
    b = b_ref[...]

    xhat = (xf + (bias - mean_c)[:, None, None, :]) * inv_c[:, None, None, :]
    y = xhat * g[:, None, None, :] + b[:, None, None, :]
    s = jax.nn.sigmoid(y)
    dy = dz * (s * (1.0 + y * (1.0 - s)))                # d silu

    db_ref[...] = jnp.sum(dy, axis=(1, 2))               # (B, C)
    dg_ref[...] = jnp.sum(dy * xhat, axis=(1, 2))

    dxhat = dy * g[:, None, None, :]
    t1 = jnp.sum(dxhat, axis=(1, 2))                     # (B, C)
    t2 = jnp.sum(dxhat * xhat, axis=(1, 2))
    m1_g = jnp.dot(t1, onehot, preferred_element_type=jnp.float32) / cnt
    m2_g = jnp.dot(t2, onehot, preferred_element_type=jnp.float32) / cnt
    m1_c = jnp.dot(m1_g, onehot.T, preferred_element_type=jnp.float32)
    m2_c = jnp.dot(m2_g, onehot.T, preferred_element_type=jnp.float32)

    du = inv_c[:, None, None, :] * (
        dxhat - m1_c[:, None, None, :] - xhat * m2_c[:, None, None, :]
    )
    dx_ref[...] = du.astype(dx_ref.dtype)
    dbias_ref[...] = jnp.sum(du, axis=(1, 2))            # (B, C)


def _specs(block_n, h, w, c, g):
    img = pl.BlockSpec((block_n, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((block_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    grp = pl.BlockSpec((block_n, g), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return img, vec, grp


def _fwd_pallas(x, gamma, beta, bias, num_groups, eps, block_n, interpret=False):
    n, h, w, c = x.shape
    img, vec, grp = _specs(block_n, h, w, c, num_groups)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_groups, eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((n, num_groups), jnp.float32),
        ),
        grid=(n // block_n,),
        in_specs=[img, vec, vec, vec],
        out_specs=(img, grp, grp),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, gamma, beta, bias)


def _bwd_pallas(x, gamma, beta, bias, mean_g, inv_g, dz, num_groups, eps,
                block_n, interpret=False):
    n, h, w, c = x.shape
    img, vec, grp = _specs(block_n, h, w, c, num_groups)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_groups, eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),          # dx
            jax.ShapeDtypeStruct((n, c), jnp.float32),       # dgamma
            jax.ShapeDtypeStruct((n, c), jnp.float32),       # dbeta
            jax.ShapeDtypeStruct((n, c), jnp.float32),       # dbias
        ),
        grid=(n // block_n,),
        in_specs=[img, vec, vec, vec, grp, grp, img],
        out_specs=(img, vec, vec, vec),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, gamma, beta, bias, mean_g, inv_g, dz)


def _pick_block_n(n, h, w, c, itemsize) -> int:
    """Largest batch block (multiple of 8, dividing n, ≤32) whose fwd/bwd
    working set fits comfortably in scoped VMEM; 0 = use the XLA fallback."""
    # bwd residency: x + dz in, dx out (itemsize each) + ~4 f32 temps
    per_sample = h * w * c * (3 * itemsize + 16)
    if per_sample == 0:
        return 0
    budget = max(int(48e6 // per_sample), 0)
    block = min(budget, n, 32)  # 32 measured fastest on v5e
    block -= block % 8  # sublane tiling: (B, C) blocks need B % 8 == 0
    while block >= 8 and n % block:
        block -= 8
    return block if block >= 8 and n % block == 0 else 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused(x, gamma, beta, bias, num_groups, eps, block_n, interpret):
    y, _, _ = _fwd_pallas(x, gamma, beta, bias, num_groups, eps, block_n,
                          interpret)
    return y


def _fused_fwd(x, gamma, beta, bias, num_groups, eps, block_n, interpret):
    y, mean_g, inv_g = _fwd_pallas(
        x, gamma, beta, bias, num_groups, eps, block_n, interpret
    )
    return y, (x, gamma, beta, bias, mean_g, inv_g)


def _fused_bwd(num_groups, eps, block_n, interpret, res, dz):
    x, gamma, beta, bias, mean_g, inv_g = res
    dx, dgamma, dbeta, dbias = _bwd_pallas(
        x, gamma, beta, bias, mean_g, inv_g, dz, num_groups, eps, block_n,
        interpret,
    )
    return dx, dgamma, dbeta, dbias


_fused.defvjp(_fused_fwd, _fused_bwd)


def group_norm_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
    pre_bias: Optional[jax.Array] = None,
    force: Optional[str] = None,
) -> jax.Array:
    """silu(GN(x + pre_bias)·gamma + beta) with per-sample affine.

    ``x``: (N, H, W, C); ``gamma``/``beta``: (C,) or (N, C); ``pre_bias``:
    optional (N, C) channel bias added BEFORE normalization (the DDPM
    ResBlock's additive conditioning). ``force``: None (auto), "pallas",
    "xla", or "interpret" (CPU tests run the real kernels interpreted).
    Differentiable w.r.t. x, gamma, beta, and pre_bias.
    """
    n, h, w, c = x.shape
    if gamma.ndim == 1:
        gamma = jnp.broadcast_to(gamma[None, :], (n, c))
    if beta.ndim == 1:
        beta = jnp.broadcast_to(beta[None, :], (n, c))
    gamma = gamma.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    bias = (
        jnp.zeros((n, c), jnp.float32)
        if pre_bias is None
        else pre_bias.astype(jnp.float32)
    )

    if force == "interpret":
        return _fused(x, gamma, beta, bias, num_groups, eps, n, True)
    block_n = _pick_block_n(n, h, w, c, x.dtype.itemsize)
    if force == "pallas" and block_n == 0 and n % 8 == 0:
        block_n = 8  # forced: accept the VMEM pressure
    use_pallas = (
        _HAS_PALLAS and on_tpu() and c % num_groups == 0 and c >= 128
        if force is None
        else force == "pallas"
    )
    if use_pallas and block_n > 0:
        return _fused(x, gamma, beta, bias, num_groups, eps, block_n, False)
    return _gn_silu_xla(x, gamma, beta, bias, num_groups, eps)
