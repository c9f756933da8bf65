"""Fused self-attention Pallas kernel for UNet feature maps.

The UNets attend over at most 16×16 = 256 tokens (SURVEY.md §5 "long
context": attention only runs at low-res stages), so one (T×D) tile per
batch×head fits comfortably in VMEM. The kernel fuses
QKᵀ → softmax → PV into a single pass: scores never round-trip to HBM
(XLA's unfused path materializes the (BH, T, T) probability tensor twice).

Forward is the Pallas kernel; backward is a custom VJP that recomputes the
probabilities with XLA einsums from the saved (q, k, v) — flash-attention
style rematerialization, cheap at these sizes.

Falls back to pure-XLA einsums off-TPU (CPU tests) and for shapes where the
tile would not fit VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/infra dependent; keep the module importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def on_tpu() -> bool:
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in platform or "axon" in platform


# VMEM budget heuristic: q,k,v,out tiles (4·T·D·4B) + scores (T·T·4B) ≤ ~8MB
def _fits_vmem(t: int, d: int) -> bool:
    return (4 * t * d + t * t) * 4 <= 8 * 1024 * 1024


def _attn_kernel(scale, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(s * scale, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float, interpret: bool = False
) -> jax.Array:
    bh, t, d = q.shape
    kernel = functools.partial(_attn_kernel, scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (t * t * d * 2),
            bytes_accessed=bh * t * d * 4 * 4,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(q, k, v)


def _attention_xla(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    s = jnp.einsum("btd,bsd->bts", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bts,bsd->btd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_fused(q, k, v, scale):
    return _attention_pallas(q, k, v, scale)


def _fused_fwd(q, k, v, scale):
    return _attention_pallas(q, k, v, scale), (q, k, v)


def _fused_bwd(scale, res, g):
    q, k, v = res
    # recompute probabilities (flash-style remat) and differentiate in XLA
    s = jnp.einsum("btd,bsd->bts", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    pv = p.astype(g.dtype)
    dv = jnp.einsum("bts,btd->bsd", pv, g)
    dp = jnp.einsum("btd,bsd->bts", g, v).astype(jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq = jnp.einsum("bts,bsd->btd", ds, k)
    dk = jnp.einsum("bts,btd->bsd", ds, q)
    return dq, dk, dv


_attention_fused.defvjp(_fused_fwd, _fused_bwd)


def attention_heads(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    force: str | None = None,
) -> jax.Array:
    """Multi-head attention on (N, T, H, D) tensors → (N, T, H, D).

    XLA path works on the head-structured layout directly (no transposes to
    materialize); the Pallas path flattens heads into the batch for the
    single-tile kernel. This is the entry the UNet attention blocks use.
    """
    n, t, h, d = q.shape
    # auto = XLA (end-to-end measurement; see docs/performance.md)
    use_pallas = False if force is None else force == "pallas"
    if use_pallas:
        def flat(x):
            return x.transpose(0, 2, 1, 3).reshape(n * h, t, d)

        out = _attention_fused(flat(q), flat(k), flat(v), scale)
        return out.reshape(n, h, t, d).transpose(0, 2, 1, 3)

    s = jnp.einsum("nqhd,nkhd->nhqk", q, k * scale)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", p, v)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
              force: str | None = None) -> jax.Array:
    """Batched single-tile attention: inputs (BH, T, D) → (BH, T, D).

    ``force``: None (auto), "pallas", or "xla".
    """
    bh, t, d = q.shape
    if force == "interpret":  # CPU correctness tests of the kernel itself
        return _attention_pallas(q, k, v, scale, interpret=True)
    # Auto currently prefers XLA: the kernel wins in isolation for d >= 128
    # bf16 (1.3-1.66x on v5e) but end-to-end the UNet train step measured
    # neutral-to-slightly-slower (attention is a small fraction at 16x16 and
    # the custom-VJP remat adds a forward recompute). Opt in per call with
    # force="pallas"; revisit with a fused bwd kernel.
    use_pallas = False if force is None else force == "pallas"
    if use_pallas:
        return _attention_fused(q, k, v, scale)
    return _attention_xla(q, k, v, scale)
