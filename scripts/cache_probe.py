"""Instrument where bench.py's warmup time actually goes on the TPU.

Phases timed separately: jax import + device discovery, init_state
(jitted), train-chunk lower, compile (with persistent-cache hit/miss
logging), first execution. Run ONE at a time (single-tunnel axon).

Usage:  python scripts/cache_probe.py [--chunk 10]
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import logging
import os
import sys
import time

t_start = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - t_start:8.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    # surface persistent-cache hits/misses + compile events
    logging.basicConfig(level=logging.WARNING)
    for name in ("jax._src.compilation_cache", "jax._src.compiler",
                 "jax._src.cache_key"):
        logging.getLogger(name).setLevel(logging.DEBUG)
        logging.getLogger(name).addHandler(logging.StreamHandler(sys.stderr))

    import jax

    from dmme_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    mark(f"jax imported; cache dir {cache_dir}")

    dev = jax.devices()[0]
    mark(f"devices discovered: {dev}")

    import jax.numpy as jnp
    import numpy as np

    from dmme_tpu.data import CIFAR10
    from dmme_tpu.parallel import make_train_chunk
    from dmme_tpu.training import LitDDPM

    lit = LitDDPM(dtype=jnp.bfloat16)
    dm = CIFAR10(synthetic=True, synthetic_size=args.batch * args.chunk,
                 batch_size=args.batch)
    dm.setup("fit")
    mark("framework imported, data ready")

    rng = jax.random.PRNGKey(0)
    state = lit.init_state(rng, img_size=32)
    float(jnp.sum(state.params["params"]["input_conv"]["bias"]))  # sync
    mark("init_state done (synced)")

    chunk_fn = make_train_chunk(lit.make_loss_fn(dm), args.chunk)
    it = dm.train_iter(0)
    stacked = jnp.asarray(np.stack([next(it) for _ in range(args.chunk)]))
    float(jnp.sum(stacked))
    mark("batch staged on device")

    lowered = jax.jit(chunk_fn).lower(state, stacked, rng)
    mark("train chunk LOWERED (traced to StableHLO)")

    compiled = lowered.compile()
    mark("train chunk COMPILED")

    state2, metrics = compiled(state, stacked, rng)
    loss = float(jax.device_get(metrics["loss"])[-1])
    mark(f"first execution done, loss={loss:.4f}")

    t0 = time.perf_counter()
    state2, metrics = compiled(state2, stacked, rng)
    float(jax.device_get(metrics["loss"])[-1])
    mark(f"steady chunk: {(time.perf_counter()-t0)*1000/args.chunk:.2f} ms/step")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
