"""Measured baseline: reference torch recipe vs dmme-tpu on the SAME host CPU.

BASELINE.md says the reference publishes no numbers and the baseline "must
be measured". No GPU exists in this environment, so the one hardware-matched
comparison possible is CPU-to-CPU: run the reference's own training step
(its real code imported from /root/reference — model, equations, algorithm)
and this framework's jitted train step with identical hyperparameters
(default 32.4M-param UNet, T=1000, f32, same batch) on this host, and report
imgs/sec each. This does NOT replace the per-GPU estimate in bench.py (TPU
vs GPU is the real question); it replaces *guesswork about relative
efficiency* with a measured same-silicon ratio.

Usage: python scripts/measure_reference_cpu.py [batch] [iters] [device]
Writes one JSON line. Never touches the TPU tunnel. ``device`` defaults
to ``cpu``; pass ``cuda`` on a GPU box to measure the reference's REAL
baseline (fp16 autocast, its shipped recipe) — the operator TODO in
docs/operations.md that replaces bench.py's 220 imgs/sec estimate.
"""

if not __package__:  # launched by path: put the repo root on sys.path
    import _bootstrap  # noqa: F401

import importlib.util
import json
import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DEVICE = sys.argv[3] if len(sys.argv) > 3 else "cpu"


def load_reference():
    """Import the reference's real packages without pytorch_lightning
    (same pre-seeding trick as tests/test_torch_parity.py)."""
    base = "/root/reference/src/dmme"
    dmme = types.ModuleType("dmme")
    dmme.__path__ = [base]
    sys.modules["dmme"] = dmme
    spec = importlib.util.spec_from_file_location(
        "dmme.common.noise", f"{base}/common/noise.py"
    )
    noise = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(noise)
    for n in ("gaussian", "gaussian_like", "uniform_int", "pad"):
        setattr(dmme, n, getattr(noise, n))
    import dmme.diffusion_models  # noqa
    import dmme.models  # noqa

    return dmme


def measure_reference() -> float:
    import torch

    dmme = load_reference()
    torch.manual_seed(0)
    net = dmme.models.ddpm.UNet().to(DEVICE)  # default 35.7M-param config
    algo = dmme.diffusion_models.DDPM(net, timesteps=1000).to(DEVICE)
    opt = torch.optim.Adam(net.parameters(), lr=2e-4)
    x = torch.randn(BATCH, 3, 32, 32, device=DEVICE)
    # on CUDA, measure the reference's SHIPPED recipe: fp16 AMP
    # (configs/ddpm/cifar10.yaml precision 16 / scripts/main.py autocast)
    use_amp = DEVICE.startswith("cuda")

    def sync():
        if use_amp:
            torch.cuda.synchronize()

    def one_step():
        with torch.autocast(device_type="cuda", enabled=use_amp):
            loss = algo.training_step(x)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 1.0)
        opt.step()
        opt.zero_grad()

    one_step()  # warmup
    sync()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        one_step()
    sync()
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def measure_ours() -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dmme_tpu.data import CIFAR10
    from dmme_tpu.parallel import make_train_step
    from dmme_tpu.training import LitDDPM

    lit = LitDDPM()  # f32, same recipe (lr 2e-4, clip 1.0, EMA, warmup)
    dm = CIFAR10(synthetic=True, synthetic_size=BATCH * 2, batch_size=BATCH)
    dm.setup("fit")
    state = lit.init_state(jax.random.PRNGKey(0), img_size=32)
    step = make_train_step(lit.make_loss_fn(dm))
    batch = jnp.asarray(next(dm.train_iter(0)))
    rng = jax.random.PRNGKey(1)

    state, m = step(state, batch, rng)  # compile + warmup
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, batch, rng)
    float(jax.device_get(m["loss"]))
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def main():
    ref_ips = measure_reference()
    if DEVICE != "cpu":
        # GPU baseline mode: the jax side of this box has no GPU; report
        # the reference number alone (bench.py's BASELINE_IMGS_PER_SEC)
        print(json.dumps({
            "device": DEVICE, "batch": BATCH, "iters": ITERS,
            "reference_torch_imgs_per_sec": round(ref_ips, 3),
            "note": "reference shipped recipe (fp16 autocast on cuda); "
                    "paste into bench.py BASELINE_IMGS_PER_SEC and clear "
                    "vs_baseline_is_estimate",
        }))
        return
    ours_ips = measure_ours()
    print(json.dumps({
        "host": "cpu (same silicon both sides)",
        "batch": BATCH,
        "iters": ITERS,
        "reference_torch_imgs_per_sec": round(ref_ips, 3),
        "dmme_tpu_jax_imgs_per_sec": round(ours_ips, 3),
        "measured_ratio": round(ours_ips / ref_ips, 3),
        "note": "identical recipe (32.4M UNet, T=1000, f32, Adam+clip); "
                "our side additionally updates EMA every step",
    }))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
