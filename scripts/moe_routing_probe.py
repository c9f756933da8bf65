"""MoE routing-health probe: train a MoE-DiT and watch the experts.

Expert collapse — the router sending (almost) every token to one expert —
is the classic MoE failure mode, and a falling loss does not rule it out
(the residual path hides dead experts). This script trains the
shapes_dit_moe_demo recipe (flow matching, MoE-DiT on the procedural
Shapes distribution) and, every ``--probe-every`` steps, reads each MoE
layer's per-expert routed fraction ``f_e`` (models/moe.py sows it into
the ``moe_stats`` collection) on a FIXED probe batch, logging

  * ``f_e`` itself,
  * its normalized entropy  H(f)/ln(E)  (1.0 = perfectly uniform), and
  * ``max_e f_e``           (→ 1.0 under collapse),

to stdout and ``--out`` (JSONL). Exit code is non-zero if the final probe
shows collapse (normalized entropy < 0.5 or max fraction > 0.9), so the
script doubles as an executable regression check; the unit-test version
is tests/test_moe.py::test_routing_stays_balanced_under_training.

Runs on whatever backend jax selects (TPU on the bench box; set
JAX_PLATFORMS=cpu for a host-only run). Results from the on-chip run are
recorded in docs/training_demo.md (MoE routing health section).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import argparse
import json
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--probe-every", type=int, default=200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--moe-aux-weight", type=float, default=0.01)
    ap.add_argument("--moe-z-weight", type=float, default=1e-3)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--out", default="runs/moe_routing_probe.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.data import Shapes
    from dmme_tpu.models.dit import DiT
    from dmme_tpu.parallel import make_train_chunk
    from dmme_tpu.training import LitFlow

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = DiT(
        patch_size=4, hidden=args.hidden, depth=args.depth,
        num_heads=args.heads, num_experts=args.experts, moe_stride=2,
        dtype=dtype,
    )
    lit = LitFlow(
        model=model, lr=args.lr, warmup=min(1000, args.steps // 4),
        decay=0.999, moe_aux_weight=args.moe_aux_weight,
        moe_z_weight=args.moe_z_weight, dtype=dtype,
    )
    dm = Shapes(size=args.probe_every * args.batch, batch_size=args.batch)
    dm.setup("fit")

    print(f"# device={jax.devices()[0]} experts={args.experts} "
          f"hidden={args.hidden} depth={args.depth} (MoE in every 2nd block)",
          flush=True)

    rng = jax.random.PRNGKey(0)
    state = lit.init_state(rng, img_size=dm.img_size)
    chunk = make_train_chunk(lit.make_loss_fn(dm), args.probe_every)
    it = dm.train_iter(0)

    # fixed probe batch in the model's [-1, 1] domain
    probe = (jnp.asarray(np.asarray(dm.train_data[: args.batch],
                                    np.float32)) / 255.0) * 2 - 1
    probe_t = jnp.full((args.batch,), 0.5, jnp.float32)

    @jax.jit
    def routed_fractions(params):
        _, vs = model.apply(params, probe, probe_t, mutable=["moe_stats"])
        return vs["moe_stats"]

    def probe_row(step, loss):
        stats = jax.device_get(routed_fractions(state.params))
        layers = {}
        for kp, f in jax.tree_util.tree_flatten_with_path(stats)[0]:
            name = jax.tree_util.keystr(kp)
            block = name.split("block_")[1].split("'")[0] if "block_" in name else name
            f = np.asarray(f, np.float64)
            h = float(-np.sum(f * np.log(np.maximum(f, 1e-9))) / math.log(len(f)))
            layers[f"block_{block}"] = {
                "f_e": [round(float(v), 4) for v in f],
                "entropy_norm": round(h, 4),
                "max": round(float(f.max()), 4),
            }
        row = {"step": step, "loss": round(float(loss), 5), "layers": layers}
        worst = min(v["entropy_norm"] for v in layers.values())
        peak = max(v["max"] for v in layers.values())
        print(f"step {step:6d}  loss {row['loss']:.5f}  "
              f"min-entropy {worst:.3f}  max-f_e {peak:.3f}", flush=True)
        return row, worst, peak

    rows = []
    rows.append(probe_row(0, float("nan"))[0])
    t0 = time.monotonic()
    steps_done = 0
    while steps_done < args.steps:
        stacked = jnp.asarray(
            np.stack([next(it) for _ in range(args.probe_every)])
        )
        state, metrics = chunk(state, stacked, jax.random.fold_in(rng, steps_done))
        steps_done += args.probe_every
        row, worst, peak = probe_row(
            steps_done, jax.device_get(metrics["loss"])[-1]
        )
        rows.append(row)
    wall = time.monotonic() - t0
    print(f"# {steps_done} steps in {wall:.1f}s "
          f"({steps_done * args.batch / wall:.0f} imgs/sec)", flush=True)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"# wrote {args.out}", flush=True)

    final = rows[-1]["layers"]
    worst = min(v["entropy_norm"] for v in final.values())
    peak = max(v["max"] for v in final.values())
    if worst < 0.5 or peak > 0.9:
        print(f"ROUTING COLLAPSE: entropy {worst:.3f}, max f_e {peak:.3f}")
        raise SystemExit(1)
    print(f"routing healthy: min normalized entropy {worst:.3f}, "
          f"max f_e {peak:.3f}")


if __name__ == "__main__":
    main()
