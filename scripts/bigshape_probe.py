"""Big-shape truth: step the ImageNet-64 IDDPM and LSUN-256 DDPM configs on
the real chip (VERDICT r2 next-round #3).

Measures per-config: train-step time (chunked, steady state), peak HBM, and
— for LSUN — the reference's exact batch-2 × accum-32 recipe. Synthetic
data (the models never see the real datasets; shapes/FLOPs are what's being
measured). Optionally re-runs the Pallas kernel ablations at these shapes
(``--ablate``): the round-2 conclusion predicted the fused kernels win only
at larger arithmetic intensity (docs/performance.md) — confirm or retire.

Run ONE at a time over the axon tunnel:

    python scripts/bigshape_probe.py imagenet64 [--ablate]
    python scripts/bigshape_probe.py lsun256 [--ablate]
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dmme_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def sync(x) -> float:
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def hbm_stats() -> dict:
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "peak_bytes_in_use_gib": round(
                stats.get("peak_bytes_in_use", 0) / 2**30, 3
            ),
            "bytes_limit_gib": round(stats.get("bytes_limit", 0) / 2**30, 3),
        }
    except Exception:
        return {}


def measure(lit, img_size, batch, *, chunk, accum=1, label=""):
    from dmme_tpu.data import CIFAR10
    from dmme_tpu.parallel import make_train_chunk, make_train_step
    from dmme_tpu.training.loop import _microbatched

    dm = CIFAR10(synthetic=True, synthetic_size=max(batch * accum * 2, 64),
                 batch_size=batch)
    # synthetic CIFAR renders 32px; resize by tiling for the probe
    dm.setup("fit")
    reps = img_size // 32
    dm.train_data = np.ascontiguousarray(
        np.tile(dm.train_data, (1, reps, reps, 1))
    )

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = lit.init_state(rng, img_size=img_size)
    sync(state.params)
    t_init = time.perf_counter() - t0

    loss_fn = lit.make_loss_fn(dm)
    it = dm.train_iter(0)
    if accum > 1:
        loss_fn = _microbatched(loss_fn, accum)
        step_fn = make_train_step(loss_fn)
        batches = jnp.asarray(np.stack([next(it) for _ in range(accum)]))
    else:
        step_fn = make_train_chunk(loss_fn, chunk)
        batches = jnp.asarray(np.stack([next(it) for _ in range(chunk)]))

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batches, rng)
    # metrics["loss"] explicitly — tree.leaves() orders keys alphabetically
    # (grad_norm first), which once mislabeled grad_norm as loss here
    loss = float(jax.device_get(metrics["loss"]).reshape(-1)[-1])
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    reps_timed = 3
    for _ in range(reps_timed):
        state, metrics = step_fn(state, batches, rng)
    float(jax.device_get(metrics["loss"]).reshape(-1)[-1])
    dt = time.perf_counter() - t0
    per_step = dt / (reps_timed * (chunk if accum == 1 else 1))
    out = {
        "config": label,
        "img_size": img_size,
        "batch": batch,
        "accum": accum,
        "train_step_ms": round(per_step * 1000, 2),
        "imgs_per_sec": round(batch * accum / per_step, 2),
        "init_s": round(t_init, 1),
        "compile_s": round(t_compile, 1),
        "loss": round(loss, 4),
        **hbm_stats(),
    }
    print(json.dumps(out), flush=True)
    return out


def imagenet64(ablate: bool):
    from dmme_tpu.models import iddpm as iddpm_models
    from dmme_tpu.training import LitIDDPM

    def build(**kw):
        return LitIDDPM(
            model=iddpm_models.UNet(
                channels_per_depth=(128, 256, 384, 512), num_blocks=3,
                attention_depths=(3, 4), num_heads=4, dropout=0.0,
                dtype=jnp.bfloat16, remat=True, **kw,
            ),
            timesteps=4000, schedule="cosine", loss_type="hybrid",
            lr=1e-4, warmup=5000,
        )

    # reference recipe: batch 128 (Nichol & Dhariwal); chunked steps
    measure(build(), 64, 128, chunk=4, label="iddpm/imagenet64")
    if ablate:
        measure(build(fused_norm=True), 64, 128, chunk=4,
                label="iddpm/imagenet64+fused_norm")


def lsun256(ablate: bool):
    from dmme_tpu.models import ddpm as ddpm_models
    from dmme_tpu.training import LitDDPM

    def build(**kw):
        return LitDDPM(
            model=ddpm_models.UNet(
                channels_per_depth=(128, 128, 256, 256, 512, 512),
                attention_depths=(5,), dropout=0.0,
                dtype=jnp.bfloat16, remat=True, **kw,
            ),
            timesteps=1000, lr=2e-5, warmup=5000,
        )

    # the reference's exact recipe: batch 2 x accum 32
    measure(build(), 256, 2, chunk=1, accum=32, label="ddpm/lsun256 b2xa32")
    # and the saturating single-step batch for a throughput view
    measure(build(), 256, 16, chunk=2, label="ddpm/lsun256 b16")
    if ablate:
        measure(build(fused_norm=True), 256, 16, chunk=2,
                label="ddpm/lsun256 b16+fused_norm")


def admu256(ablate: bool):
    """First on-chip exercise of the ADMU guided-diffusion upsampler preset
    (VERDICT r3 weak #6): one real 64→256 train step at its published shape
    — proves the preset compiles and fits HBM, and records its step time."""
    from dmme_tpu.models.adm import ADMU
    from dmme_tpu.training import LitUpsampler

    lit = LitUpsampler(
        factor=4,
        model=ADMU(256, dtype=jnp.bfloat16, out_channels=3,
                   learn_sigma=False, dropout=0.0),
        timesteps=1000, lr=1e-4, warmup=5000,
    )
    measure(lit, 256, 2, chunk=1, label="admu/64to256 b2 (upsampler preset)")
    del ablate


def dit_moe(ablate: bool):
    """On-chip step of the cifar10_dit_moe recipe (VERDICT r4 #2c): sparse
    MoE-DiT-S/4 (8 experts, top-2, every other block) under LitFlow at the
    CIFAR-10 shape, next to the dense DiT-S it grows from — proves the
    dispatch/combine einsum path compiles on the chip and records the
    sparsity tax at E=8/top-2 on one chip (no expert axis to shard over)."""
    from dmme_tpu.models.dit import DiT_S
    from dmme_tpu.training import LitFlow

    def build(**kw):
        return LitFlow(
            model=DiT_S(dtype=jnp.bfloat16, **kw), lr=1e-4, warmup=5000,
            moe_aux_weight=0.01 if kw.get("num_experts") else 0.0,
        )

    measure(build(), 32, 128, chunk=10, label="flow/dit-s dense")
    measure(
        build(num_experts=8, moe_stride=2, moe_top_k=2,
              moe_capacity_factor=1.25),
        32, 128, chunk=10, label="flow/cifar10_dit_moe e8top2",
    )
    del ablate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "which", choices=["imagenet64", "lsun256", "admu256", "dit_moe"]
    )
    ap.add_argument("--ablate", action="store_true")
    args = ap.parse_args()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    {"imagenet64": imagenet64, "lsun256": lsun256, "admu256": admu256,
     "dit_moe": dit_moe}[args.which](args.ablate)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly
