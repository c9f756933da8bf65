"""Super-resolution demo artifact from a trained LitUpsampler run.

Rows: low-res input (nearest-blown-up for display) / bilinear baseline /
diffusion-upsampled / original. Prints PSNR of the diffusion SR and the
bilinear baseline against the originals — the honest comparison.

    python scripts/upsample_demo.py --config configs/ddpm/shapes_sr_demo.yaml
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import json
import os
import sys

import numpy as np


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--out", default="docs/assets/shapes_sr.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.config import instantiate, load_config, validate_config
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
    high = norm(jnp.asarray(real))
    low = lit.downsample(high)                      # (n, s/f, s/f, C)
    out = lit.generate(state, jax.random.PRNGKey(3), low_res=low)
    sr = np.clip(np.asarray(jax.device_get(denorm(out)), np.float32), 0, 1)

    bilinear = np.asarray(
        jax.image.resize(low, high.shape, "linear"), np.float32
    )
    bilinear = np.clip((bilinear + 1) / 2, 0, 1)
    low_disp = np.repeat(
        np.repeat(np.clip((np.asarray(low) + 1) / 2, 0, 1),
                  lit.factor, axis=1),
        lit.factor, axis=2,
    )

    rows = [
        label_row((tile_row(low_disp) * 255).astype(np.uint8), "low-res"),
        label_row((tile_row(bilinear) * 255).astype(np.uint8), "bilinear"),
        label_row((tile_row(sr) * 255).astype(np.uint8), "diffusion"),
        label_row((tile_row(real) * 255).astype(np.uint8), "original"),
    ]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    stack_rows(rows, args.out)
    print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps({
        "checkpoint_step": step,
        "factor": lit.factor,
        "psnr_bilinear": round(psnr(bilinear, real), 2),
        "psnr_diffusion": round(psnr(sr, real), 2),
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly when run on TPU
