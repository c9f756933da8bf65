"""Progressive distillation driver — halve sampling steps, round by round.

Usage:
    python scripts/distill.py --config configs/ddpm/cifar10.yaml \
        --start-steps 500 --rounds 3 --steps-per-round 10000 \
        --out runs/distill

Loads the teacher (model + latest checkpoint from the config's
default_root_dir), then runs ``rounds`` of progressive distillation
(Salimans & Ho 2022): round k trains an N/2^k-step student against the
previous round's model as teacher, through the standard ``fit`` loop (same
chunked/donated train step, EMA, Orbax checkpoints). Students use the "v"
parameterization (paper §4); the initial teacher may be ε-parameterized
(e.g. the shipped DDPM recipe) — the distiller converts internally.

Each round's student checkpoint lands in ``<out>/round_<k>_steps_<N>/``.
"""


from __future__ import annotations
if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="teacher training config")
    ap.add_argument("--start-steps", type=int, default=None,
                    help="first student's sampler steps (teacher uses 2x); "
                    "default = the model's timesteps // 2")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--steps-per-round", type=int, default=10_000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--decay", type=float, default=0.999,
                    help="student EMA decay; short distillation rounds need "
                    "a faster-adapting EMA than the 0.9999 training default "
                    "(at 3k steps, 0.9999 leaves the EMA ~74%% at its "
                    "random init — sampled pure noise)")
    ap.add_argument("--out", default="runs/distill")
    ap.add_argument("--teacher-parameterization", default=None,
                    help="override; defaults to the teacher config's setting")
    args = ap.parse_args(argv)

    import jax

    from dmme_tpu.config import instantiate, load_config
    from dmme_tpu.diffusion import ProgressiveDistillation
    from dmme_tpu.training import LitDistill, fit
    from dmme_tpu.training.checkpoint import CheckpointManager
    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    config = load_config(args.config)
    teacher_lit = instantiate(config["model"])
    data = instantiate(config["data"])
    tc = config.get("trainer") or {}

    img_size = tc.get("img_size") or getattr(data, "img_size", 32)
    state = teacher_lit.init_state(jax.random.PRNGKey(0), img_size=int(img_size))
    ckpt_dir = tc.get("default_root_dir")
    if ckpt_dir:
        mgr = CheckpointManager(ckpt_dir)
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"# teacher restored from {ckpt_dir} @ step {int(state.step)}")
        else:
            print("# WARNING: no teacher checkpoint found — distilling an "
                  "untrained teacher (smoke-test mode)", file=sys.stderr)

    teacher_model = teacher_lit.model
    teacher_params = state.ema_params
    teacher_param_type = args.teacher_parameterization or getattr(
        teacher_lit.diffusion_model, "parameterization", "eps"
    )
    timesteps = teacher_lit.diffusion_model.timesteps

    # default: the first round distills the full T-step teacher into T/2
    # (the teacher grid must fit: 2·steps <= T)
    steps = args.start_steps if args.start_steps is not None else timesteps // 2
    for k in range(args.rounds):
        pd = ProgressiveDistillation.create(
            timesteps=timesteps,
            student_steps=steps,
            teacher_parameterization=teacher_param_type,
            student_parameterization="v",
        )
        lit = LitDistill(
            teacher_model=teacher_model,
            teacher_params=teacher_params,
            distiller=pd,
            lr=args.lr,
            decay=args.decay,
            init_params=teacher_params if teacher_param_type == "v" else None,
        )
        out_dir = f"{args.out}/round_{k}_steps_{steps}"
        print(f"# round {k}: {2 * steps}-step teacher -> {steps}-step student "
              f"({args.steps_per_round} train steps) -> {out_dir}")
        st = fit(
            lit, data, max_steps=args.steps_per_round,
            seed=int(config.get("seed_everything", 1337)),
            ckpt_dir=out_dir,
            ckpt_every=args.steps_per_round,
            log_every=int(tc.get("log_every_n_steps", 50)),
        )
        # student becomes next round's teacher (now v-parameterized)
        teacher_model = lit.model
        teacher_params = st.ema_params
        teacher_param_type = "v"
        if steps % 2 == 1:
            break
        steps //= 2


if __name__ == "__main__":
    import os

    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # release the TPU tunnel promptly
