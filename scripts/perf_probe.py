"""Train-step perf probe — measures ONE variant end-to-end on the real TPU.

Usage:  python scripts/perf_probe.py <variant>
Train variants: base | remat | rbg | fused | opt:<k=v,...> (PJRT compiler opts)
Sampler variants: sample | sample_block (mega-fused ResBlock fwd kernel)
One process per run (single tunnel holder); hard-exits.

Measures the SAME chunked train program the fit loop uses (round-1 lesson:
kernels/toggles must be judged in the end-to-end chunk, not in isolation).
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import json
import sys
import time

variant = sys.argv[1] if len(sys.argv) > 1 else "base"

BATCH = 128
if variant.startswith("b") and variant[1:].isdigit():  # e.g. b256
    BATCH = int(variant[1:])

CHUNK_OVERRIDE = None
if variant.startswith("chunk"):  # e.g. chunk20: amortize per-chunk copies
    CHUNK_OVERRIDE = int(variant[5:])

import jax

if variant == "rbg":
    jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

from dmme_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dmme_tpu.data import CIFAR10
from dmme_tpu.models import ddpm as ddpm_models
from dmme_tpu.parallel import make_train_chunk
from dmme_tpu.training import LitDDPM

CHUNK, TIMED = 10, 4
if CHUNK_OVERRIDE:
    CHUNK = CHUNK_OVERRIDE
    TIMED = max(1, 40 // CHUNK)


def sample_main():
    """Sampler throughput, batch 128 (the bench.py sampling leg).
    sample = DDIM-50; sample_block = DDIM-50 with the fused ResBlock kernel;
    sample_dpm = DPM-Solver++(2M) 20 steps."""
    from dmme_tpu.diffusion import DDIM, DPMSolverPP, EDM
    from dmme_tpu.models import as_model_fn

    kw = {"fused_block": True} if variant == "sample_block" else {}
    model = ddpm_models.UNet(dtype=jnp.bfloat16, **kw)
    lit = LitDDPM(model=model, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = lit.init_state(rng, img_size=32)
    if variant == "sample_dpm":
        algo = DPMSolverPP.create(timesteps=1000, sub_timesteps=20)
    elif variant == "sample_edm":
        # 18-step Heun = 35 NFE (the paper's CIFAR-10 sampling setting)
        algo = EDM.create(steps=18)
    elif variant.startswith("sample_deep"):
        # sample_deep[:interval[:depth]] e.g. sample_deep:2:1
        from dmme_tpu.diffusion import DeepCachedDDIM

        parts = variant.split(":")
        interval = int(parts[1]) if len(parts) > 1 else 2
        depth = int(parts[2]) if len(parts) > 2 else 1
        algo = DeepCachedDDIM.create(
            timesteps=1000, sub_timesteps=50,
            refresh_interval=interval, cache_depth=depth,
        )
    else:
        algo = DDIM.create(timesteps=1000, sub_timesteps=50)
    model_fn = as_model_fn(model)
    if variant.startswith("sample_deep"):
        model_fn = model  # DeepCachedDDIM drives the module directly
    gen = jax.jit(algo.generate, static_argnums=(0, 3))
    params = state.ema_params
    out = gen(model_fn, params, jax.random.PRNGKey(1), (BATCH, 32, 32, 3))
    s0 = float(jnp.sum(out))
    print(f"# compile {time.perf_counter()-t0:.1f}s sum={s0:.3f}", file=sys.stderr)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = gen(model_fn, params, jax.random.PRNGKey(i), (BATCH, 32, 32, 3))
    s1 = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": variant,
        "ddim50_imgs_per_sec": round(BATCH * reps / dt, 1),
        "ms_per_50steps": round(1000 * dt / reps, 1),
        "out_sum": round(s1, 3),
    }))


def main():
    if variant.startswith("sample"):
        sample_main()
        return
    kw = {}
    if variant == "remat":
        kw["remat"] = True
    if variant == "fused":
        kw["fused_norm"] = True
    model = ddpm_models.UNet(dtype=jnp.bfloat16, **kw)
    lit = LitDDPM(model=model, dtype=jnp.bfloat16)
    dm = CIFAR10(synthetic=True, synthetic_size=BATCH * CHUNK, batch_size=BATCH)
    dm.setup("fit")

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = lit.init_state(rng, img_size=32)
    chunk_fn = make_train_chunk(lit.make_loss_fn(dm), CHUNK)
    it = dm.train_iter(0)
    stacked = jnp.asarray(np.stack([next(it) for _ in range(CHUNK)]))

    if variant.startswith("opt:"):
        # per-compile XLA/libtpu options travel through PJRT compile options
        # (the only channel that reaches the remote compile service)
        opts = dict(kv.split("=", 1) for kv in variant[4:].split(","))
        print(f"# compiler_options={opts}", file=sys.stderr)
        chunk_fn = (
            chunk_fn.lower(state, stacked, rng).compile(compiler_options=opts)
        )

    state, metrics = chunk_fn(state, stacked, rng)
    loss = float(jax.device_get(metrics["loss"])[-1])
    print(f"# compile {time.perf_counter()-t0:.1f}s loss={loss:.4f}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, metrics = chunk_fn(state, stacked, rng)
    last = float(jax.device_get(metrics["loss"])[-1])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": variant,
        "train_step_ms": round(1000 * dt / (CHUNK * TIMED), 2),
        "imgs_per_sec": round(BATCH * CHUNK * TIMED / dt, 1),
        "loss": round(last, 4),
    }))


if __name__ == "__main__":
    import os

    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
