"""Inpainting demo artifact: RePaint a masked region with a trained model.

Renders rows (original / masked input / inpainted) from a finished
``dmme_tpu.trainer fit`` run directory — evidence the sampling-time
conditioning works on a real trained checkpoint, not just the unit tests.

    python scripts/inpaint_demo.py --config configs/ddpm/shapes_demo.yaml \
        [--n 4] [--resample 1] [--out docs/assets/shapes_inpaint.png]
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--resample", type=int, default=1)
    ap.add_argument("--out", default="docs/assets/shapes_inpaint.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.config import instantiate, load_config, validate_config
    from dmme_tpu.diffusion import inpaint
    from dmme_tpu.training.checkpoint import CheckpointManager
    from dmme_tpu.utils.norm import denorm, norm

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from demo_artifacts import label_row, stack_rows, tile_row

    config = validate_config(load_config(args.config))
    lit = instantiate(config["model"])
    dm = instantiate(config["data"])
    dm.setup("fit")
    img_size = int(dm.train_data.shape[1])

    state = lit.init_state(jax.random.PRNGKey(0), img_size=img_size)
    state = CheckpointManager(config["trainer"]["default_root_dir"]).restore(state)
    step = int(jax.device_get(state.step))

    real = dm.train_data[: args.n].astype(np.float32) / 255.0
    known = norm(jnp.asarray(real))  # [0,1] → [-1,1]
    # mask: keep the left half, regenerate the right half
    mask = jnp.zeros((1, img_size, img_size, 1))
    mask = mask.at[:, :, : img_size // 2, :].set(1.0)

    out = inpaint(
        lit.diffusion_model, lit.model_fn, state.ema_params,
        jax.random.PRNGKey(7), known, mask, resample_steps=args.resample,
    )
    out = np.clip(np.asarray(jax.device_get(denorm(out)), np.float32), 0, 1)

    masked = real * np.asarray(mask) + 0.5 * (1 - np.asarray(mask))
    rows = [
        label_row((tile_row(real) * 255).astype(np.uint8), "original"),
        label_row((tile_row(masked) * 255).astype(np.uint8), "masked"),
        label_row((tile_row(out) * 255).astype(np.uint8), "inpainted"),
    ]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    stack_rows(rows, args.out)
    # the known half must be restored exactly
    err = float(np.abs(out[:, :, : img_size // 2] - real[:, :, : img_size // 2]).max())
    print(f"# wrote {args.out}", file=sys.stderr)
    import json

    print(json.dumps({
        "checkpoint_step": step, "n": args.n,
        "resample_steps": args.resample,
        "known_region_max_abs_err": round(err, 6),
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly when run on TPU
