"""Evaluate progressively-distilled students against their teacher.

From a ``scripts/distill.py`` output tree: for each round's student,
restore its checkpoint, sample with its few-step v-parameterized sampler,
and score the samples with the same pixel-space SWD used by the main
training demo (calibrated by the real-vs-real floor). Emits one strip
image (teacher row + one row per student) and a JSON summary.

Usage:

    python scripts/distill_demo_artifacts.py \
        --config configs/ddpm/shapes_demo.yaml --distill-out runs/distill_shapes
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import glob
import json
import os
import re
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="teacher training config")
    ap.add_argument("--distill-out", default="runs/distill_shapes")
    ap.add_argument("--out", default="docs/assets/shapes_distill")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--swd-n", type=int, default=256)
    args = ap.parse_args()

    import jax

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.config import instantiate, load_config, validate_config
    from dmme_tpu.diffusion import DPMSolverPP, ProgressiveDistillation
    from dmme_tpu.models import as_model_fn
    from dmme_tpu.training.checkpoint import CheckpointManager
    from dmme_tpu.utils.norm import denorm

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from demo_artifacts import (label_row, sliced_wasserstein, stack_rows,
                                tile_row)

    config = validate_config(load_config(args.config))
    lit = instantiate(config["model"])
    dm = instantiate(config["data"])
    run_dir = config["trainer"]["default_root_dir"]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    dm.setup("fit")
    img_size = int(dm.train_data.shape[1])
    real = dm.train_data[: args.swd_n].astype(np.float32) / 255.0
    shape = (args.swd_n, img_size, img_size, lit.img_channels)
    rng = jax.random.PRNGKey(321)
    timesteps = lit.diffusion_model.timesteps

    # teacher baseline: the trained eps model through DPM-Solver++(2M)@20
    state = lit.init_state(jax.random.PRNGKey(0), img_size=img_size)
    state = CheckpointManager(run_dir).restore(state)
    dpm = DPMSolverPP.create(timesteps=timesteps, sub_timesteps=20)
    out = dpm.generate(as_model_fn(lit.model), state.ema_params, rng, shape)
    out = np.clip(np.asarray(jax.device_get(denorm(out)), np.float32), 0, 1)
    results = {"teacher_dpm20": {
        "nfe": 20, "swd": round(sliced_wasserstein(out, real), 4)}}
    rows = [label_row((tile_row(out[: args.n]) * 255).astype(np.uint8),
                      "teacher")]

    for round_dir in sorted(glob.glob(f"{args.distill_out}/round_*_steps_*")):
        steps = int(re.search(r"steps_(\d+)$", round_dir).group(1))
        pd = ProgressiveDistillation.create(
            timesteps=timesteps, student_steps=steps,
            student_parameterization="v",
        )
        # student state: same UNet tree as the teacher's lit
        sstate = lit.init_state(jax.random.PRNGKey(0), img_size=img_size)
        sstate = CheckpointManager(round_dir).restore(sstate)
        sampler = pd.student_sampler()
        out = sampler.generate(
            as_model_fn(lit.model), sstate.ema_params, rng, shape
        )
        out = np.clip(np.asarray(jax.device_get(denorm(out)), np.float32), 0, 1)
        swd = sliced_wasserstein(out, real)
        name = os.path.basename(round_dir)
        results[name] = {"nfe": steps, "swd": round(swd, 4)}
        rows.append(
            label_row((tile_row(out[: args.n]) * 255).astype(np.uint8),
                      f"{steps}-step")
        )
        print(f"# {name}: {steps} NFE swd={swd:.4f}", file=sys.stderr)

    results["real_floor_swd"] = round(sliced_wasserstein(
        dm.train_data[args.swd_n : 2 * args.swd_n].astype(np.float32) / 255.0,
        real), 4)

    stack_rows(rows, args.out + "_students.png")
    print(f"# wrote {args.out}_students.png", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the axon tunnel promptly
