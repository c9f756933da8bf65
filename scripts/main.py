"""Raw training loop — the recipe script, working (unlike the reference's).

Counterpart of reference scripts/main.py:15-64 (which documents the canonical
DDPM CIFAR-10 recipe but uses stale imports). Same hyperparameters: batch
128, Adam lr 2e-4, warmup 5000, grad-clip 1.0, 800k steps, mixed precision —
expressed as this framework's chunked, donated train step.

Usage: python scripts/main.py [--steps N] [--synthetic] [--data-dir DIR]
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmme_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dmme_tpu.data import CIFAR10
from dmme_tpu.parallel import make_train_chunk
from dmme_tpu.training import LitDDPM


def train(steps: int, data_dir: str, synthetic: bool, chunk: int = 50):
    lit = LitDDPM(dtype=jnp.bfloat16)  # lr 2e-4, warmup 5000 defaults
    dm = CIFAR10(data_dir=data_dir, synthetic=synthetic, batch_size=128)
    dm.prepare_data()
    dm.setup("fit")

    rng = jax.random.PRNGKey(1337)
    state = lit.init_state(rng, img_size=32)
    chunk_fn = make_train_chunk(lit.make_loss_fn(dm), chunk)

    it = dm.train_iter(1337)
    done = 0
    t0 = time.time()
    while done < steps:
        stacked = jnp.asarray(np.stack([next(it) for _ in range(chunk)]))
        state, metrics = chunk_fn(state, stacked, rng)
        done += chunk
        loss = float(jax.device_get(metrics["loss"])[-1])
        ips = 128 * done / (time.time() - t0)
        print(f"step {done}: loss={loss:.4f} {ips:.0f} imgs/s", file=sys.stderr)
    return state


if __name__ == "__main__":
    import os

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800_000)
    p.add_argument("--data-dir", default=".")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()
    train(args.steps, args.data_dir, args.synthetic)
    sys.stderr.flush()
    os._exit(0)  # remote-TPU client threads would otherwise hold the tunnel
