"""Render the class-conditional (CFG) proof-of-control artifacts.

From a finished ``configs/ddpm/shapes_cfg_demo.yaml`` run: generate one row
of samples conditioned on class 0 (discs) and one on class 1 (squares)
with classifier-free guidance, and measure **class adherence** with a
geometric classifier that needs no trained network: for the rendered
shapes, area/max-radius² separates a disc (π) from a square (2) — a
generated image obeys its conditioning iff the statistic lands on the
requested side.

Usage:  python scripts/cfg_demo_artifacts.py --config configs/ddpm/shapes_cfg_demo.yaml
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import json
import os
import sys

import numpy as np


def classify_shape(img: np.ndarray) -> int:
    """0 = disc, 1 = square, -1 = unclassifiable. img: (H, W, 3) in [0,1].

    The foreground mask is "far from the median (background) color"; for a
    filled disc of max centroid distance d, area ≈ π·d²·(1/1)… precisely:
    disc: A/d² = π (d = radius); square: A/d² = 4s²/(2s²) = 2 (d = s·√2).
    Threshold at the geometric midpoint."""
    bg = np.median(img.reshape(-1, 3), axis=0)
    dist = np.linalg.norm(img - bg[None, None, :], axis=-1)
    mask = dist > 0.25
    area = float(mask.sum())
    if area < 16:  # no coherent shape
        return -1
    ys, xs = np.nonzero(mask)
    cy, cx = ys.mean(), xs.mean()
    d2 = ((ys - cy) ** 2 + (xs - cx) ** 2).max()
    if d2 < 4:
        return -1
    ratio = area / d2
    mid = (np.pi + 2.0) / 2.0  # 2.57
    return 0 if ratio > mid else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default="docs/assets/shapes_cfg")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--adhere-n", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.config import instantiate, load_config, validate_config
    from dmme_tpu.training.checkpoint import CheckpointManager
    from dmme_tpu.utils.norm import denorm

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from demo_artifacts import label_row, stack_rows, tile_row  # same directory

    config = validate_config(load_config(args.config))
    lit = instantiate(config["model"])
    dm = instantiate(config["data"])
    run_dir = config["trainer"]["default_root_dir"]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    dm.setup("fit")
    img_size = int(dm.train_data.shape[1])
    state = lit.init_state(jax.random.PRNGKey(0), img_size=img_size)
    mgr = CheckpointManager(run_dir)
    state = mgr.restore(state)
    step = int(jax.device_get(state.step))

    shape = (args.adhere_n, img_size, img_size, lit.img_channels)
    rows, adherence = [], {}
    rng = jax.random.PRNGKey(99)
    for cls, name in ((0, "discs"), (1, "squares")):
        y = jnp.full((args.adhere_n,), cls, jnp.int32)
        out = lit.generate(state, jax.random.fold_in(rng, cls), shape, y=y)
        out = np.clip(np.asarray(jax.device_get(denorm(out)), np.float32), 0, 1)
        preds = np.array([classify_shape(im) for im in out])
        ok = float((preds == cls).mean())
        adherence[name] = round(ok, 4)
        print(f"# class {name}: adherence {ok:.2%} "
              f"(unclassifiable {(preds == -1).mean():.1%})", file=sys.stderr)
        rows.append(
            label_row((tile_row(out[: args.n]) * 255).astype(np.uint8),
                      f"y={name}")
        )

    stack_rows(rows, args.out + "_classes.png")
    print(f"# wrote {args.out}_classes.png", file=sys.stderr)

    print(json.dumps({
        "run_dir": run_dir,
        "checkpoint_step": step,
        "guidance_scale": lit.guidance_scale,
        "class_adherence": adherence,
        "n_per_class": args.adhere_n,
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly
