"""Microbenchmark: Pallas fused attention vs XLA einsum attention (real TPU).

Usage: python scripts/bench_ops.py
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import time

import jax
import jax.numpy as jnp

from dmme_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dmme_tpu.ops.attention import _attention_xla, attention


def timeit(fn, *args, iters=50):
    out = fn(*args)
    float(jnp.sum(out))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    print(f"device: {jax.devices()[0]}")
    for (bh, t, d, dtype) in [
        (128, 256, 256, jnp.bfloat16),   # DDPM UNet 16x16 single-head, batch 128
        (512, 256, 64, jnp.bfloat16),    # IDDPM 4 heads
        (128, 64, 256, jnp.bfloat16),    # 8x8 stage
        (128, 256, 256, jnp.float32),
    ]:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (bh, t, d), dtype)
        k = jax.random.normal(jax.random.fold_in(key, 1), (bh, t, d), dtype)
        v = jax.random.normal(jax.random.fold_in(key, 2), (bh, t, d), dtype)
        scale = d ** -0.5

        xla = jax.jit(lambda a, b, c: _attention_xla(a, b, c, scale))
        fused = jax.jit(lambda a, b, c: attention(a, b, c, scale, force="pallas"))
        t_xla = timeit(xla, q, k, v)
        t_fused = timeit(fused, q, k, v)
        print(
            f"BHxTxD={bh}x{t}x{d} {jnp.dtype(dtype).name}: "
            f"xla {t_xla*1e6:.1f}us  pallas {t_fused*1e6:.1f}us  "
            f"speedup {t_xla/t_fused:.2f}x"
        )


if __name__ == "__main__":
    import os, sys

    main()
    sys.stdout.flush()
    os._exit(0)
