"""Benchmark: CIFAR-10 DDPM training imgs/sec/chip + DDIM 50-step sampling.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Method: K train steps are chained in one jitted scan (weights pinned in HBM,
zero host round-trips inside a chunk — exactly how the fit loop runs), timed
over several chunks after warmup, synced by fetching the final loss.

Baseline: the reference publishes no numbers (BASELINE.md). The comparison
value is the reference recipe's throughput class on its era hardware —
DDPM CIFAR-10, batch 128, fp16 AMP, 32.4M-param UNet on a single modern GPU
runs ~1.5-2 it/s ≈ 220 imgs/sec/chip. BASELINE.json targets ≥3× on TPU.
"""

import json
import os
import subprocess
import sys
import threading
import time

BASELINE_IMGS_PER_SEC = 220.0  # see module docstring

# Wall-clock ceiling for the whole bench. The axon tunnel has two observed
# wedge modes: backend init stalls (BENCH_r03 — covered by probe_backend),
# and a rarer one seen 2026-08-20 where dispatch succeeds but every
# device->host fetch blocks forever. A watchdog converts either into the
# machine-readable error line instead of a silent driver-budget burn.
# Cold run measured 190s warmup + ~8 compiled legs => 1500s is ~2x headroom.
WATCHDOG_S = float(os.environ.get("DMME_BENCH_WATCHDOG_S", "1500"))

_stage = {"name": "startup", "since": time.time()}


def set_stage(name: str) -> None:
    _stage["name"] = name
    _stage["since"] = time.time()
    print(f"# stage: {name}", file=sys.stderr, flush=True)


def start_watchdog() -> None:
    def fire():
        fail_json(
            "watchdog",
            f"bench exceeded {WATCHDOG_S:.0f}s wall ceiling; stuck in stage "
            f"'{_stage['name']}' for {time.time() - _stage['since']:.0f}s "
            "(axon fetch-wedge mode: dispatch works, device->host blocks)",
        )

    t = threading.Timer(WATCHDOG_S, fire)
    t.daemon = True
    t.start()

BATCH = 128
CHUNK = 10          # train steps fused per device call
CHUNKS_TIMED = 4
SAMPLE_BATCH = 128
SAMPLE_REPEATS = 2

# v5e bf16 peak and the measured per-step FLOP count (docs/performance.md:87:
# 3.53 TFLOP fwd+bwd+opt at batch 128; floor 17.9 ms => MFU = floor/measured)
PEAK_TFLOPS_BF16 = 197.0
TRAIN_STEP_TFLOP = 3.53


def dit_train_tflop(batch, img=32, patch=4, d=384, depth=12, out_ch=3,
                    in_ch=3, mlp_ratio=4.0):
    """Analytic matmul FLOPs for one DiT train step (fwd + bwd = 3x fwd).

    Transformer FLOPs are exact from shapes (unlike the UNet's traced
    count): per block & token 2*(qkv 3d^2 + proj d^2 + mlp 2*r*d^2) plus
    attention 4*T*d, plus the per-sample adaLN modulation and the
    patch/unpatch projections.
    """
    tokens = (img // patch) ** 2
    per_block_token = 2 * (4 + 2 * mlp_ratio) * d * d + 4 * tokens * d
    per_block_sample = 2 * 6 * d * d  # adaLN modulation MLP
    fwd_sample = (
        depth * (tokens * per_block_token + per_block_sample)
        + 2 * tokens * (patch * patch * in_ch) * d      # patch embed
        + 2 * tokens * d * (patch * patch * out_ch)     # final proj
        + 2 * 2 * d * d                                 # final adaLN
    )
    return 3 * batch * fwd_sample / 1e12

PROBE_SNIPPET = (
    "import jax, os, sys; d = jax.devices(); "
    "print(d[0], flush=True); os._exit(0)"
)


def probe_backend(timeout_s: float = 60.0, attempts: int = 3):
    """Bounded-time backend-init probe in a subprocess, with retries.

    The axon TPU tunnel can stall indefinitely (BENCH_r03 died at backend
    init with UNAVAILABLE; the r3 judge reproduced a 9m40s silent hang), so
    backend init is treated as a fallible step: probe it in a short-lived
    subprocess that hard-exits, retry with backoff, and report diagnostics
    on failure instead of dying with a traceback.

    Returns (ok: bool, detail: str).
    """
    last = ""
    for attempt in range(attempts):
        if attempt:
            backoff = 10 * attempt
            print(f"# backend probe retry {attempt + 1}/{attempts} "
                  f"after {backoff}s backoff", file=sys.stderr, flush=True)
            time.sleep(backoff)
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE_SNIPPET],
                capture_output=True, text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {timeout_s:.0f}s (tunnel stalled?)"
            continue
        if r.returncode == 0 and r.stdout.strip():
            return True, r.stdout.strip().splitlines()[-1]
        last = f"probe rc={r.returncode}: {(r.stderr or '').strip()[-2000:]}"
    return False, last


def _python_processes():
    """List other python processes that could hold the single-process axon
    tunnel (diagnostic only — never kill by pattern)."""
    procs = []
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace").strip()
        except OSError:
            continue
        if "python" in cmd:
            procs.append(f"{pid}: {cmd[:160]}")
    return procs


def fail_json(stage: str, detail: str) -> None:
    """Emit a machine-readable error line so the driver never records
    parsed=null, then hard-exit."""
    print(json.dumps({
        "metric": "train imgs/sec/chip, CIFAR-10 DDPM UNet (batch 128, bf16)",
        "value": None,
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "error": f"{stage}: {detail}"[:4000],
        "diagnostics": {
            "python_processes": _python_processes()[:20],
            "jax_platforms_env": os.environ.get("JAX_PLATFORMS", ""),
        },
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(1)


def main():
    start_watchdog()
    ok, detail = probe_backend()
    if not ok:
        fail_json("backend_init", detail)
    print(f"# device: {detail}", file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dmme_tpu.data import CIFAR10
    from dmme_tpu.diffusion import DDIM
    from dmme_tpu.models import as_model_fn
    from dmme_tpu.parallel import make_train_chunk
    from dmme_tpu.training import LitDDPM

    try:
        run(jax, jnp, np, CIFAR10, DDIM, as_model_fn, make_train_chunk, LitDDPM,
            detail)
    except Exception:
        import traceback

        fail_json("run", traceback.format_exc()[-3500:])


def run(jax, jnp, np, CIFAR10, DDIM, as_model_fn, make_train_chunk, LitDDPM,
        device_str):
    # bf16 compute / f32 params (the reference trains fp16 AMP).
    lit = LitDDPM(dtype=jnp.bfloat16)
    dm = CIFAR10(synthetic=True, synthetic_size=BATCH * CHUNK, batch_size=BATCH)
    dm.setup("fit")

    # phase-split warmup timing + persistent-cache hit/miss accounting
    # (BENCH_r02 recorded an unexplained 805s warmup; the round-3 probe
    # measured 141s cold / expected seconds warm — keep the evidence in
    # every bench run so a regression is attributable, not a mystery)
    import logging

    cache_events = {"hit": 0, "miss": 0}

    class _CacheCounter(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "PERSISTENT COMPILATION CACHE MISS" in msg:
                cache_events["miss"] += 1
            elif "Persistent compilation cache hit" in msg:
                cache_events["hit"] += 1

    _logger = logging.getLogger("jax._src.compiler")
    _logger.setLevel(logging.DEBUG)
    _logger.addHandler(_CacheCounter())

    rng = jax.random.PRNGKey(0)
    set_stage("unet_init")
    t0 = time.perf_counter()
    state = lit.init_state(rng, img_size=32)
    float(jnp.sum(state.step))  # sync (block_until_ready unreliable on axon)
    t_init = time.perf_counter() - t0
    chunk_fn = make_train_chunk(lit.make_loss_fn(dm), CHUNK)

    it = dm.train_iter(0)
    stacked = jnp.asarray(np.stack([next(it) for _ in range(CHUNK)]))
    float(jnp.sum(stacked))
    t_stage = time.perf_counter() - t0 - t_init

    # compile + warmup (one chunk)
    set_stage("unet_train_compile")
    state, metrics = chunk_fn(state, stacked, rng)
    first_loss = float(jax.device_get(metrics["loss"])[-1])
    t_total = time.perf_counter() - t0
    print(
        f"# compile+warmup {t_total:.1f}s (init {t_init:.1f}s, stage "
        f"{t_stage:.1f}s, chunk compile+run {t_total - t_init - t_stage:.1f}s; "
        f"persistent cache hits={cache_events['hit']} "
        f"misses={cache_events['miss']}) loss={first_loss:.4f}",
        file=sys.stderr,
    )

    set_stage("unet_train_timed")
    t0 = time.perf_counter()
    for _ in range(CHUNKS_TIMED):
        state, metrics = chunk_fn(state, stacked, rng)
    last_loss = float(jax.device_get(metrics["loss"])[-1])  # full pipeline drain
    dt = time.perf_counter() - t0
    train_ips = BATCH * CHUNK * CHUNKS_TIMED / dt
    step_s = dt / (CHUNK * CHUNKS_TIMED)
    # model FLOP utilization vs v5e bf16 peak (meaningful on TPU only)
    mfu = TRAIN_STEP_TFLOP / step_s / PEAK_TFLOPS_BF16

    # ---- DiT-S/4 (flow matching, configs/flow/cifar10_dit.yaml recipe) at
    # the same CIFAR-10 shape — the transformer-backbone leg; FLOPs are
    # analytic, so its MFU needs no traced count ----
    from dmme_tpu.models.dit import DiT_S
    from dmme_tpu.training import LitFlow

    set_stage("dit_train")
    dit_lit = LitFlow(model=DiT_S(dtype=jnp.bfloat16), lr=1e-4)
    dit_state = dit_lit.init_state(rng, img_size=32)
    float(jnp.sum(dit_state.step))
    dit_chunk = make_train_chunk(dit_lit.make_loss_fn(dm), CHUNK)
    dit_state, dmetrics = dit_chunk(dit_state, stacked, rng)  # compile+warm
    float(jax.device_get(dmetrics["loss"])[-1])
    t0 = time.perf_counter()
    for _ in range(CHUNKS_TIMED):
        dit_state, dmetrics = dit_chunk(dit_state, stacked, rng)
    dit_last_loss = float(jax.device_get(dmetrics["loss"])[-1])
    ddt = time.perf_counter() - t0
    dit_ips = BATCH * CHUNK * CHUNKS_TIMED / ddt
    dit_step_s = ddt / (CHUNK * CHUNKS_TIMED)
    dit_tflop = dit_train_tflop(BATCH)
    dit_mfu = dit_tflop / dit_step_s / PEAK_TFLOPS_BF16
    assert np.isfinite(dit_last_loss), dit_last_loss

    # ---- DDIM 50-step sampler (quadratic tau over T=1000, eta=0) ----
    set_stage("ddim50_sample")
    algo = DDIM.create(timesteps=1000, sub_timesteps=50)
    model_fn = as_model_fn(lit.model)
    gen = jax.jit(algo.generate, static_argnums=(0, 3))
    params = state.ema_params
    out = gen(model_fn, params, jax.random.PRNGKey(1), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))  # sync compile
    t0 = time.perf_counter()
    for i in range(SAMPLE_REPEATS):
        out = gen(model_fn, params, jax.random.PRNGKey(i), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    sample_ips = SAMPLE_BATCH * SAMPLE_REPEATS / (time.perf_counter() - t0)

    # ---- DPM-Solver++(2M), 20 steps — 2nd-order ODE sampler (exact method;
    # DDIM-50-class quality at 20 NFE; order=1 ≡ canonical DDIM, tested) ----
    from dmme_tpu.diffusion import DPMSolverPP

    set_stage("dpm20_sample")
    dpm = DPMSolverPP.create(timesteps=1000, sub_timesteps=20)
    dgen = jax.jit(dpm.generate, static_argnums=(0, 3))
    out = dgen(model_fn, params, jax.random.PRNGKey(1), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for i in range(SAMPLE_REPEATS):
        out = dgen(model_fn, params, jax.random.PRNGKey(i), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    dpm_ips = SAMPLE_BATCH * SAMPLE_REPEATS / (time.perf_counter() - t0)

    # ---- EDM 18-step Heun (35 NFE; Karras et al. 2022 CIFAR-10 setting) ----
    from dmme_tpu.diffusion import EDM

    set_stage("edm18_sample")
    edm = EDM.create(steps=18)
    egen = jax.jit(edm.generate, static_argnums=(0, 3))
    out = egen(model_fn, params, jax.random.PRNGKey(1), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for i in range(SAMPLE_REPEATS):
        out = egen(model_fn, params, jax.random.PRNGKey(i), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    edm_ips = SAMPLE_BATCH * SAMPLE_REPEATS / (time.perf_counter() - t0)

    # ---- UniPC predictor-corrector, 10 NFE (exact method; its corrector
    # targets this very-low-NFE regime — see tests/test_unipc.py) ----
    from dmme_tpu.diffusion import UniPC

    set_stage("unipc10_sample")
    uni = UniPC.create(timesteps=1000, sub_timesteps=10)
    ugen = jax.jit(uni.generate, static_argnums=(0, 3))
    out = ugen(model_fn, params, jax.random.PRNGKey(1), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for i in range(SAMPLE_REPEATS):
        out = ugen(model_fn, params, jax.random.PRNGKey(i), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    unipc_ips = SAMPLE_BATCH * SAMPLE_REPEATS / (time.perf_counter() - t0)

    # ---- opt-in encoder-reuse sampler (approximate; docs/performance.md) ----
    from dmme_tpu.diffusion import CachedDDIM

    set_stage("cached_ddim_sample")
    fast = CachedDDIM.create(timesteps=1000, sub_timesteps=50, refresh_interval=2)
    fgen = jax.jit(fast.generate, static_argnums=(0, 3))
    out = fgen(lit.model, params, jax.random.PRNGKey(1), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for i in range(SAMPLE_REPEATS):
        out = fgen(lit.model, params, jax.random.PRNGKey(i), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    fast_ips = SAMPLE_BATCH * SAMPLE_REPEATS / (time.perf_counter() - t0)

    # ---- DeepCache on the DPM-Solver++ update (opt-in, approximate): the
    # 2nd-order solver's 20 NFE with the deep core refreshed every 2nd step ----
    from dmme_tpu.diffusion import DeepCachedDPM

    set_stage("deep_dpm_sample")
    ddpm_fast = DeepCachedDPM.create(
        timesteps=1000, sub_timesteps=20, refresh_interval=2
    )
    dfgen = jax.jit(ddpm_fast.generate, static_argnums=(0, 3))
    out = dfgen(lit.model, params, jax.random.PRNGKey(1), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for i in range(SAMPLE_REPEATS):
        out = dfgen(lit.model, params, jax.random.PRNGKey(i), (SAMPLE_BATCH, 32, 32, 3))
    float(jnp.sum(out))
    deep_dpm_ips = SAMPLE_BATCH * SAMPLE_REPEATS / (time.perf_counter() - t0)

    set_stage("emit_json")
    print(
        json.dumps(
            {
                "metric": "train imgs/sec/chip, CIFAR-10 DDPM UNet (batch 128, bf16)",
                "value": round(train_ips, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(train_ips / BASELINE_IMGS_PER_SEC, 3),
                # The reference publishes NO numbers (BASELINE.md); 220 is an
                # estimate of its recipe's GPU throughput class, not measured.
                "vs_baseline_is_estimate": True,
                "baseline_imgs_per_sec_estimate": BASELINE_IMGS_PER_SEC,
                "baseline_derivation": "DDPM CIFAR-10 batch 128 fp16 AMP, "
                "32.4M UNet, ~1.5-2 it/s on a single modern GPU (unpublished "
                "by reference; see BASELINE.md 'must be measured')",
                # MEASURED anchor (no GPU in this environment): the
                # reference's own torch training step on this host's CPU
                # (scripts/measure_reference_cpu.py, batch 16 x 3) — the only
                # same-environment baseline that exists.
                "reference_measured_cpu_imgs_per_sec": 3.1,
                "vs_reference_measured_cpu": round(train_ips / 3.1, 1),
                "ddim50_sample_imgs_per_sec_chip": round(sample_ips, 2),
                "dpm_solver_pp_2m_20step_imgs_per_sec_chip": round(dpm_ips, 2),
                "edm_heun18_imgs_per_sec_chip": round(edm_ips, 2),
                "unipc10_imgs_per_sec_chip": round(unipc_ips, 2),
                "ddim50_encoder_cached_imgs_per_sec_chip": round(fast_ips, 2),
                "dpm20_deep_cached_imgs_per_sec_chip": round(deep_dpm_ips, 2),
                "dit_train_imgs_per_sec_chip": round(dit_ips, 2),
                "dit_train_step_ms": round(1000 * dit_step_s, 2),
                "dit_mfu": round(dit_mfu, 3),
                "dit_tflop_per_step_analytic": round(dit_tflop, 3),
                "train_step_ms": round(1000 * step_s, 2),
                "mfu": round(mfu, 3),
                "mfu_derivation": f"{TRAIN_STEP_TFLOP} TFLOP/step "
                f"(docs/performance.md trace) / {PEAK_TFLOPS_BF16} TF/s "
                "v5e bf16 peak",
                "compile_warmup_s": round(t_total, 1),
                "compile_cache": dict(cache_events),
                "device": device_str,
                "final_loss": round(last_loss, 4),
            }
        )
    )


if __name__ == "__main__":
    import os

    main()
    sys.stdout.flush()
    sys.stderr.flush()
    # The axon PJRT client leaves non-daemon threads behind; a lingering
    # process would hold the single TPU tunnel and block every later jax
    # process. Hard-exit once the JSON line is out.
    os._exit(0)
