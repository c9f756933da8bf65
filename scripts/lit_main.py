"""Programmatic fit() run — counterpart of reference scripts/lit_main.py:11-32
(working, unlike the reference's stale-import version).

Usage: python scripts/lit_main.py [--steps N] [--synthetic]
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse

import jax.numpy as jnp

from dmme_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dmme_tpu.callbacks import GenerateImage
from dmme_tpu.data import CIFAR10
from dmme_tpu.training import LitDDPM, fit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800_000)
    p.add_argument("--data-dir", default=".")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--root", default="runs/lit_main")
    args = p.parse_args()

    lit = LitDDPM(dtype=jnp.bfloat16)
    dm = CIFAR10(data_dir=args.data_dir, synthetic=args.synthetic, batch_size=128)
    fit(
        lit,
        dm,
        max_steps=args.steps,
        ckpt_dir=args.root,
        callbacks=[GenerateImage(out_dir=f"{args.root}/samples")],
    )


if __name__ == "__main__":
    import os
    import sys

    main()
    sys.stderr.flush()
    os._exit(0)  # remote-TPU client threads would otherwise hold the tunnel
