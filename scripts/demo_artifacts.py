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

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import json
import os
import sys

import numpy as np


def load_metrics(run_dir):
    # keep-last per step then sort: resumed runs append overlapping step
    # ranges to metrics.jsonl (fit re-runs steps after the restored
    # checkpoint), which would otherwise zigzag the curve
    by_step = {}
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                by_step[int(rec["step"])] = rec["loss"]
    steps = sorted(by_step)
    return np.asarray(steps), np.asarray([by_step[s] for s in steps])


def plot_loss(steps, losses, path, title):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # single-series line: slot-1 blue, thin marks, recessive grid, no legend
    # (the title names the series); direct label at the line end
    fig, ax = plt.subplots(figsize=(7, 3.4), dpi=160)
    ax.plot(steps, losses, color="#2a78d6", linewidth=1.6)
    ax.set_yscale("log")  # the loss spans 2.5 decades; linear flattens it
    ax.set_title(title, fontsize=11, color="#1a1a19", loc="left")
    ax.set_xlabel("optimizer step", fontsize=9, color="#5f5e56")
    ax.set_ylabel("train loss (log)", fontsize=9, color="#5f5e56")
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


def stack_rows(rows, path, pad=4):
    """Stack labeled row strips onto one white canvas and save as PNG
    (shared by the demo / CFG / distillation artifact scripts)."""
    h = rows[0].shape[0]
    width = max(r.shape[1] for r in rows)
    canvas = np.full(
        (len(rows) * (h + pad) - pad, width, rows[0].shape[2]), 255, np.uint8
    )
    for i, r in enumerate(rows):
        canvas[i * (h + pad) : i * (h + pad) + h, : r.shape[1]] = r
    from PIL import Image

    Image.fromarray(canvas).save(path)


def label_row(row_uint8, text, margin=52):
    from PIL import Image, ImageDraw

    h, w, c = row_uint8.shape
    out = np.full((h, w + margin, c), 255, np.uint8)
    out[:, margin:] = row_uint8
    img = Image.fromarray(out)
    ImageDraw.Draw(img).text((3, h // 2 - 5), text, fill=(26, 26, 25))
    return np.asarray(img)


def sliced_wasserstein(a, b, n_proj=128, seed=0):
    """SWD between two image sets in pixel space ((N,H,W,C) float [0,1]).

    Distribution-convergence evidence that needs no pretrained network:
    random-init Inception features are input-insensitive (round-2 finding,
    docs/evaluation.md), but pixel-space SWD cleanly separates "noise-like"
    from "on-distribution" sample sets and is exactly zero iff the
    projected marginals match."""
    rng = np.random.default_rng(seed)
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    dirs = rng.standard_normal((a.shape[1], n_proj))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    pa = np.sort(a @ dirs, axis=0)
    pb = np.sort(b @ dirs, axis=0)
    n = min(pa.shape[0], pb.shape[0])  # equal-quantile comparison
    qa = np.quantile(pa, np.linspace(0, 1, n), axis=0)
    qb = np.quantile(pb, np.linspace(0, 1, n), axis=0)
    return float(np.mean(np.abs(qa - qb)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default="docs/assets/shapes_demo")
    ap.add_argument("--sampler", default="dpm")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--swd-n", type=int, default=256)
    ap.add_argument("--final-n", type=int, default=64)
    ap.add_argument("--loss-only", action="store_true",
                    help="re-render the loss curve only (no device work)")
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
    family = config["model"]["class_path"].rsplit(".", 1)[-1].replace("Lit", "")
    plot_loss(
        steps, losses, args.out + "_loss.png",
        f"{family} on procedural Shapes — on-TPU fit via the CLI "
        f"({int(steps[-1])} steps, batch {dm.batch_size})",
    )
    if args.loss_only:
        return

    # ---- per-checkpoint sample rows --------------------------------------
    dm.setup("fit")
    img_size = int(dm.train_data.shape[1])
    state = lit.init_state(jax.random.PRNGKey(0), img_size=img_size)
    mgr = CheckpointManager(run_dir)
    all_steps = sorted(mgr._mgr.all_steps())
    assert all_steps, f"no checkpoints under {run_dir}"

    if args.sampler == "native":
        # the model's OWN configured sampler (e.g. IDDPM §4 strided with
        # learned variances) — consumes the raw network output, no adapter
        algo = getattr(lit, "sample_algorithm", None) or lit.diffusion_model
        model_fn = lit.model_fn
    else:
        algo, adapt = make_sampler(lit.diffusion_model, args.sampler, args.steps)
        model_fn = adapt(lit.model_fn)
    # ONE compiled shape serves both artifacts: the progression row shows
    # the first n of the swd_n samples drawn per checkpoint. Latent
    # harnesses integrate in latent space (training/lit.py seam — identity
    # for pixel harnesses); to_images decodes before the pixel-space SWD.
    shape = lit.sample_space_shape(
        (args.swd_n, img_size, img_size, lit.img_channels)
    )
    gen = jax.jit(algo.generate, static_argnums=(0, 3))

    real = dm.train_data[: args.swd_n].astype(np.float32) / 255.0
    rows = [
        label_row((tile_row(real[: args.n]) * 255).astype(np.uint8), "data")
    ]
    rng = jax.random.PRNGKey(1234)
    swd = {}
    for ckpt_step in all_steps:
        state = mgr.restore(state, step=ckpt_step)
        out = gen(model_fn, state.ema_params, rng, shape)  # same rng: paired
        out = lit.to_images(out)
        out = np.clip(np.asarray(jax.device_get(denorm(out)), np.float32), 0, 1)
        swd[int(ckpt_step)] = sliced_wasserstein(out, real)
        rows.append(
            label_row((tile_row(out[: args.n]) * 255).astype(np.uint8),
                      f"{ckpt_step}")
        )
        print(f"# checkpoint {ckpt_step}: swd={swd[int(ckpt_step)]:.3f}",
              file=sys.stderr)
    # the floor: SWD between two disjoint halves of the real set
    swd_floor = sliced_wasserstein(
        dm.train_data[args.swd_n : 2 * args.swd_n].astype(np.float32) / 255.0,
        real,
    )
    # the ceiling: uniform noise vs real
    swd_noise = sliced_wasserstein(
        np.random.default_rng(5).random(real.shape).astype(np.float32), real
    )

    stack_rows(rows, args.out + "_progression.png")
    print(f"# wrote {args.out}_progression.png", file=sys.stderr)

    # ---- final large grid -------------------------------------------------
    from dmme_tpu.utils.vis import make_history

    big_shape = lit.sample_space_shape(
        (args.final_n, img_size, img_size, lit.img_channels)
    )
    big = jax.jit(algo.generate, static_argnums=(0, 3))(
        model_fn, state.ema_params, jax.random.PRNGKey(7), big_shape
    )
    big = np.asarray(jax.device_get(denorm(lit.to_images(big))), np.float32)
    grid = make_history([big])
    from PIL import Image

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
        # distribution distance per checkpoint, with real-vs-real floor and
        # noise-vs-real ceiling for calibration
        "swd_per_checkpoint": {k: round(v, 4) for k, v in swd.items()},
        "swd_real_floor": round(swd_floor, 4),
        "swd_noise_ceiling": round(swd_noise, 4),
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly
