"""Sampler quality probe: SWD vs the data for each sampling path.

Measures the quality cost of every sampler override — exact solvers and
the approximate feature-caching paths — on a TRAINED checkpoint, using
the same calibrated pixel-space sliced-Wasserstein metric as the
training-demo artifacts (scripts/demo_artifacts.py). This is the tool
behind the quality column in docs/performance.md's DeepCachedDPM table.

Usage (one TPU process at a time):

    python scripts/sampler_quality_probe.py --config configs/ddpm/shapes_demo.yaml \
        [--steps 20] [--n 256] \
        [--samplers dpm deep_dpm:2:1 deep_dpm:2:2 deep:2:1 cached:2]

Module-sampler specs are ``name[:refresh_interval[:cache_depth]]``.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument(
        "--samplers", nargs="+",
        default=["dpm", "deep_dpm:2:1", "deep_dpm:2:2", "deep_dpm:3:1"],
    )
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )  # repo root, so the script works without PYTHONPATH

    import numpy as np
    import jax

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.config import instantiate, load_config, validate_config
    from dmme_tpu.diffusion import make_sampler
    from dmme_tpu.diffusion.factory import MODULE_SAMPLERS, make_module_sampler
    from dmme_tpu.training.checkpoint import CheckpointManager
    from dmme_tpu.utils.norm import denorm

    sys.path.insert(0, os.path.dirname(__file__))
    from demo_artifacts import sliced_wasserstein

    cfg = validate_config(load_config(args.config))
    lit = instantiate(cfg["model"])
    dm = instantiate(cfg["data"])
    dm.setup("fit")
    img_size = int(dm.train_data.shape[1])
    state = lit.init_state(jax.random.PRNGKey(0), img_size=img_size)
    mgr = CheckpointManager(cfg["trainer"]["default_root_dir"])
    state = mgr.restore(state, step=max(mgr._mgr.all_steps()))

    real = dm.train_data[: args.n].astype(np.float32) / 255.0
    # latent harnesses integrate the solver in latent space and decode
    # (training/lit.py seam; identity for pixel harnesses)
    shape = lit.sample_space_shape(
        (args.n, img_size, img_size, lit.img_channels)
    )
    rng = jax.random.PRNGKey(args.seed)

    def swd_of(out):
        out = lit.to_images(out)
        out = np.clip(np.asarray(jax.device_get(denorm(out)), np.float32), 0, 1)
        return sliced_wasserstein(out, real)

    res = {}
    for spec in args.samplers:
        parts = spec.split(":")
        name = parts[0]
        if name in MODULE_SAMPLERS:
            interval = int(parts[1]) if len(parts) > 1 else 2
            depth = int(parts[2]) if len(parts) > 2 else 1
            algo = make_module_sampler(
                lit.diffusion_model, name, args.steps,
                refresh_interval=interval, cache_depth=depth,
            )
            out = jax.jit(algo.generate, static_argnums=(0, 3))(
                lit.model, state.ema_params, rng, shape
            )
        elif name == "flow":
            # flow[:order[:steps]] — Euler (1) vs midpoint (2) at an explicit
            # step count, so equal-NFE comparisons (euler-2N vs midpoint-N)
            # land in one probe invocation. NFE = order · steps.
            algo, adapt = make_sampler(
                lit.diffusion_model, "flow",
                int(parts[2]) if len(parts) > 2 else args.steps,
            )
            if len(parts) > 1:
                algo = algo.replace(order=int(parts[1]))
            out = jax.jit(algo.generate, static_argnums=(0, 3))(
                adapt(lit.model_fn), state.ema_params, rng, shape
            )
        else:
            algo, adapt = make_sampler(lit.diffusion_model, name, args.steps)
            out = jax.jit(algo.generate, static_argnums=(0, 3))(
                adapt(lit.model_fn), state.ema_params, rng, shape
            )
        res[spec] = round(swd_of(out), 4)
        print(f"# {spec}: swd={res[spec]}", file=sys.stderr)

    res["real_floor"] = round(
        sliced_wasserstein(
            dm.train_data[args.n : 2 * args.n].astype(np.float32) / 255.0, real
        ),
        4,
    )
    print(json.dumps({"steps": args.steps, "n": args.n, "swd": res}))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly
