"""Render the proof-of-learning artifacts from a finished training run.

Inputs: a run directory written by ``dmme_tpu.trainer fit`` (metrics.jsonl +
Orbax checkpoints at several steps, ``ckpt_max_to_keep: null``).

Outputs (committed into docs/assets/ for docs/training_demo.md):

* ``<prefix>_loss.png``         — train-loss curve over optimizer steps
* ``<prefix>_progression.png``  — one row of REAL dataset samples, then one
  row of EMA-weight samples per checkpoint step: the visible convergence
  from noise-like output to the data distribution
* ``<prefix>_samples.png``      — a large grid from the final checkpoint
* one JSON line with the summary numbers

The sampler scan is jitted ONCE and reused across checkpoints (params are
traced arguments — restoring a different checkpoint does not recompile).

Usage (one TPU process at a time):

    python scripts/demo_artifacts.py --config configs/ddpm/shapes_demo.yaml \
        [--sampler dpm --steps 20] [--n 16] [--out docs/assets/shapes_demo]
"""

import argparse
import json
import os
import sys

import numpy as np


def load_metrics(run_dir):
    steps, losses = [], []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                steps.append(rec["step"])
                losses.append(rec["loss"])
    return np.asarray(steps), np.asarray(losses)


def plot_loss(steps, losses, path, title):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # single-series line: slot-1 blue, thin marks, recessive grid, no legend
    # (the title names the series); direct label at the line end
    fig, ax = plt.subplots(figsize=(7, 3.4), dpi=160)
    ax.plot(steps, losses, color="#2a78d6", linewidth=1.6)
    ax.set_title(title, fontsize=11, color="#1a1a19", loc="left")
    ax.set_xlabel("optimizer step", fontsize=9, color="#5f5e56")
    ax.set_ylabel("train loss", fontsize=9, color="#5f5e56")
    ax.grid(True, color="#e8e6e0", linewidth=0.6)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.tick_params(colors="#5f5e56", labelsize=8)
    ax.annotate(
        f"{losses[-1]:.4f}", (steps[-1], losses[-1]),
        textcoords="offset points", xytext=(4, 2),
        fontsize=8, color="#1a1a19",
    )
    fig.tight_layout()
    fig.savefig(path, facecolor="white")
    print(f"# wrote {path}", file=sys.stderr)


def tile_row(images, pad=2):
    """(N, H, W, C) float [0,1] -> one horizontal strip uint8."""
    n, h, w, c = images.shape
    row = np.ones((h, n * (w + pad) - pad, c), np.float32)
    for i, img in enumerate(images):
        row[:, i * (w + pad) : i * (w + pad) + w] = img
    return row


def label_row(row_uint8, text, margin=52):
    from PIL import Image, ImageDraw

    h, w, c = row_uint8.shape
    out = np.full((h, w + margin, c), 255, np.uint8)
    out[:, margin:] = row_uint8
    img = Image.fromarray(out)
    ImageDraw.Draw(img).text((3, h // 2 - 5), text, fill=(26, 26, 25))
    return np.asarray(img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default="docs/assets/shapes_demo")
    ap.add_argument("--sampler", default="dpm")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--final-n", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.config import instantiate, load_config, validate_config
    from dmme_tpu.diffusion import make_sampler
    from dmme_tpu.training.checkpoint import CheckpointManager
    from dmme_tpu.utils.norm import denorm

    config = validate_config(load_config(args.config))
    lit = instantiate(config["model"])
    dm = instantiate(config["data"])
    run_dir = config["trainer"]["default_root_dir"]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    # ---- loss curve -------------------------------------------------------
    steps, losses = load_metrics(run_dir)
    plot_loss(
        steps, losses, args.out + "_loss.png",
        "DDPM on procedural Shapes — on-TPU fit via the CLI "
        f"({int(steps[-1])} steps, batch {dm.batch_size})",
    )

    # ---- per-checkpoint sample rows --------------------------------------
    dm.setup("fit")
    img_size = int(dm.train_data.shape[1])
    state = lit.init_state(jax.random.PRNGKey(0), img_size=img_size)
    mgr = CheckpointManager(run_dir)
    all_steps = sorted(mgr._mgr.all_steps())
    assert all_steps, f"no checkpoints under {run_dir}"

    algo, adapt = make_sampler(lit.diffusion_model, args.sampler, args.steps)
    model_fn = adapt(lit.model_fn)
    shape = (args.n, img_size, img_size, lit.img_channels)
    gen = jax.jit(algo.generate, static_argnums=(0, 3))

    rows = [
        label_row(
            (tile_row(dm.train_data[: args.n].astype(np.float32) / 255.0)
             * 255).astype(np.uint8),
            "data",
        )
    ]
    rng = jax.random.PRNGKey(1234)
    for ckpt_step in all_steps:
        state = mgr.restore(state, step=ckpt_step)
        out = gen(model_fn, state.ema_params, rng, shape)  # same rng: paired
        out = np.asarray(jax.device_get(denorm(out)), np.float32)
        rows.append(
            label_row((np.clip(tile_row(out), 0, 1) * 255).astype(np.uint8),
                      f"{ckpt_step}")
        )
        print(f"# sampled checkpoint step {ckpt_step}", file=sys.stderr)

    pad = 4
    h = rows[0].shape[0]
    width = max(r.shape[1] for r in rows)
    canvas = np.full(
        (len(rows) * (h + pad) - pad, width, rows[0].shape[2]), 255, np.uint8
    )
    for i, r in enumerate(rows):
        canvas[i * (h + pad) : i * (h + pad) + h, : r.shape[1]] = r
    from PIL import Image

    Image.fromarray(canvas).save(args.out + "_progression.png")
    print(f"# wrote {args.out}_progression.png", file=sys.stderr)

    # ---- final large grid -------------------------------------------------
    from dmme_tpu.utils.vis import make_history

    big_shape = (args.final_n, img_size, img_size, lit.img_channels)
    big = jax.jit(algo.generate, static_argnums=(0, 3))(
        model_fn, state.ema_params, jax.random.PRNGKey(7), big_shape
    )
    big = np.asarray(jax.device_get(denorm(big)), np.float32)
    grid = make_history([big])
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
        args.out + "_samples.png"
    )
    print(f"# wrote {args.out}_samples.png", file=sys.stderr)

    print(json.dumps({
        "run_dir": run_dir,
        "steps": int(steps[-1]),
        "first_logged_loss": round(float(losses[0]), 4),
        "final_loss": round(float(losses[-1]), 4),
        "checkpoints": [int(s) for s in all_steps],
        "sampler": args.sampler,
        "sample_steps": args.steps,
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly
