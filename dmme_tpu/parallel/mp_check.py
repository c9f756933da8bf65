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
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "mp_check_gloo_warmup", timeout_in_ms=240_000
        )
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

    lit = LitDDPM(
        model=ddpm_models.UNet(
            pos_dim=4, emb_dim=8, num_groups=2,
            channels_per_depth=(4, 8, 8, 8), num_blocks=1,
        ),
        timesteps=5,
    )
    dm = CIFAR10(
        synthetic=True, synthetic_size=64, batch_size=16, horizontal_flip=False
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
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "mp_check_pre_probe", timeout_in_ms=240_000
        )
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
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev_per_proc} "
        f"--xla_cpu_collective_timeout_seconds={max(300, timeout)}"
    )
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
    # drain ALL pipes concurrently: the workers run collectives, so a
    # non-first worker blocked writing to a full stderr pipe would stall the
    # barrier and deadlock a sequential communicate() on worker 0
    import threading

    outputs = [None] * nproc

    def drain(i, p):
        outputs[i] = p.communicate(timeout=timeout)

    threads = [
        threading.Thread(target=drain, args=(i, p)) for i, p in enumerate(procs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout + 30)

    results = []
    for p, out_err in zip(procs, outputs):
        if out_err is None:
            p.kill()
            raise RuntimeError("mp_check worker did not finish in time")
        out, err = out_err
        if p.returncode != 0:
            raise RuntimeError(
                f"mp_check worker failed (rc={p.returncode}):\n{err[-4000:]}"
            )
        line = [ln for ln in out.splitlines() if ln.startswith("PROBE ")][-1]
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
