"""Fused GroupNorm(+affine)+SiLU Pallas kernel.

Motivation (profiled, docs/performance.md): XLA runs GroupNorm as a separate
convert+reduce pass over the activation followed by the normalize/silu
fusion — the activation is read from HBM twice. This kernel computes the
group statistics and the normalized, modulated, SiLU'd output in one VMEM
residency: one read, one write.

The affine is per-sample ``(N, C)`` so the IDDPM/ADM FiLM modulation
``gn(x)·(1+s)+b`` folds into the same kernel (callers pre-combine the GN
scale/bias with the FiLM scale/shift).

Forward = Pallas; backward = custom VJP recomputing through the XLA
reference (exact same math). Off-TPU or on odd shapes it falls back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from dmme_tpu.ops.attention import on_tpu


def _gn_silu_xla(x, gamma, beta, num_groups, eps):
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xf).mean(axis=(1, 3), keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c)
    y = y * gamma[:, None, None, :] + beta[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _gn_silu_kernel(num_groups, eps, x_ref, g_ref, b_ref, o_ref):
    xb = x_ref[...]  # (B, H, W, C)
    bsz, h, w, c = xb.shape
    cg = c // num_groups
    xf = xb.astype(jnp.float32)

    # per-(sample, channel) sums over the spatial plane — lane dim stays C
    chan_sum = jnp.sum(xf, axis=(1, 2))          # (B, C)
    chan_sq = jnp.sum(jnp.square(xf), axis=(1, 2))
    # channel→group aggregation as a one-hot matmul (Mosaic cannot split the
    # lane dim with a reshape; the MXU does it for free)
    chan_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (chan_ids == grp_ids).astype(jnp.float32)      # (C, G)
    grp_sum = jnp.dot(chan_sum, onehot, preferred_element_type=jnp.float32)
    grp_sq = jnp.dot(chan_sq, onehot, preferred_element_type=jnp.float32)
    cnt = h * w * cg
    mean_g = grp_sum / cnt                        # (B, G)
    var_g = grp_sq / cnt - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back to channels via the transposed one-hot
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)

    g = g_ref[...]                                # (B, C) f32
    b = b_ref[...]
    scale = (inv_c * g)[:, None, None, :]
    shift = (b - mean_c * inv_c * g)[:, None, None, :]
    y = xf * scale + shift
    o_ref[...] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_silu_pallas(x, gamma, beta, num_groups, eps, block_n, interpret=False):
    n, h, w, c = x.shape
    kernel = functools.partial(_gn_silu_kernel, num_groups, eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, gamma, beta)


def _pick_block_n(n, h, w, c, itemsize) -> int:
    # in + out + f32 scratch comfortably under ~10MB of VMEM; the (B, C)
    # affine blocks need B % 8 == 0 (sublane tiling), so blocks are
    # multiples of 8 dividing n — 0 means "use the XLA fallback".
    per_sample = h * w * c * (2 * itemsize + 4)
    if per_sample == 0:
        return 0
    budget = max(int(10e6 // per_sample), 0)
    block = min(budget - budget % 8, n, 32)  # 32 measured fastest on v5e
    while block >= 8 and n % block:
        block -= 8
    return block if block >= 8 and n % block == 0 else 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x, gamma, beta, num_groups, eps, block_n):
    return _gn_silu_pallas(x, gamma, beta, num_groups, eps, block_n)


def _fused_fwd(x, gamma, beta, num_groups, eps, block_n):
    return _fused(x, gamma, beta, num_groups, eps, block_n), (x, gamma, beta)


def _fused_bwd(num_groups, eps, block_n, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda xx, gg, bb: _gn_silu_xla(xx, gg, bb, num_groups, eps), x, gamma, beta
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def group_norm_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
    force: str | None = None,
) -> jax.Array:
    """silu(GN(x)·gamma + beta) with per-sample affine.

    ``x``: (N, H, W, C); ``gamma``/``beta``: (C,) or (N, C), float32.
    ``force``: None (auto), "pallas", "xla", or "interpret" (CPU tests).
    """
    n, h, w, c = x.shape
    if gamma.ndim == 1:
        gamma = jnp.broadcast_to(gamma[None, :], (n, c))
    if beta.ndim == 1:
        beta = jnp.broadcast_to(beta[None, :], (n, c))
    gamma = gamma.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    if force == "interpret":
        return _gn_silu_pallas(x, gamma, beta, num_groups, eps, n, interpret=True)
    block_n = _pick_block_n(n, h, w, c, x.dtype.itemsize)
    if force == "pallas" and block_n == 0 and n % 8 == 0:
        block_n = 8  # forced: accept the VMEM pressure
    use_pallas = (
        _HAS_PALLAS and on_tpu() and c % num_groups == 0 and c >= 128
        if force is None
        else force == "pallas"
    )
    if use_pallas and block_n > 0:
        return _fused(x, gamma, beta, num_groups, eps, block_n)
    return _gn_silu_xla(x, gamma, beta, num_groups, eps)
