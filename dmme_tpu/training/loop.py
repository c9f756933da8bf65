"""fit/test loops — the Trainer analogue.

Replaces pl.Trainer's role for this framework (reference call stack:
SURVEY.md §3.1). One donated, jitted train step; async dispatch (the host
loop stays ahead of the device); metrics fetched only at log boundaries;
Orbax checkpoints at the reference cadence (save_last + every N steps).
"""

from __future__ import annotations

import time
from typing import Any, Iterable, Optional, Sequence

import jax
import numpy as np

from dmme_tpu.parallel import (
    make_train_chunk,
    make_train_step,
    shard_batch,
    shard_state,
)
from dmme_tpu.training.checkpoint import CheckpointManager
from dmme_tpu.training.metrics import MetricLogger
from dmme_tpu.training.state import TrainState


def fit(
    lit,
    datamodule,
    max_steps: int,
    *,
    max_restarts: int = 0,
    resume: bool = False,
    **kwargs,
) -> TrainState:
    """Train ``lit`` on ``datamodule`` for ``max_steps`` optimizer steps.

    See :func:`_fit_once` for the full keyword surface. ``max_restarts``
    adds fault tolerance the reference never had (SURVEY.md §5 "failure
    detection / elastic recovery: none"): on an unexpected exception the
    loop restores the latest checkpoint and resumes, up to N times. The
    exact-resume machinery (per-step rng = fold_in(run_key, step), data
    iterator fast-forward, interrupt-safe saves) makes a restarted run
    bitwise-identical to an uninterrupted one — tested.
    """
    if max_restarts <= 0:
        return _fit_once(lit, datamodule, max_steps, resume=resume, **kwargs)
    if not kwargs.get("ckpt_dir"):
        raise ValueError("max_restarts needs ckpt_dir to recover from")
    attempts = 0
    while True:
        try:
            return _fit_once(
                lit, datamodule, max_steps,
                resume=resume or attempts > 0, **kwargs,
            )
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — deliberate recovery boundary
            attempts += 1
            if attempts > max_restarts:
                raise
            print(
                f"[fit] attempt {attempts}/{max_restarts} failed "
                f"({type(e).__name__}: {e}); restoring latest checkpoint "
                "and resuming",
                flush=True,
            )


def _fit_once(
    lit,
    datamodule,
    max_steps: int,
    *,
    seed: int = 1337,
    mesh=None,
    log_every: int = 50,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 100_000,
    ckpt_max_to_keep: Optional[int] = 3,
    callbacks: Sequence[Any] = (),
    state: Optional[TrainState] = None,
    resume: bool = False,
    accumulate_grad_batches: int = 1,
    steps_per_call: int = 1,
    debug_nans: bool = False,
    loggers=None,
    tensorboard: bool = False,
) -> TrainState:
    """One fit attempt (the body of :func:`fit`).

    Defaults mirror the reference recipe: seed 1337 (src/dmme/trainer.py:9),
    log every 50 steps, checkpoint every 100k + last
    (configs/ddpm/cifar10.yaml:11-14,49).

    ``steps_per_call > 1`` fuses that many optimizer steps into one scanned
    device program (`make_train_chunk`): one dispatch per chunk, weights
    pinned in HBM — the right mode for thin hosts and remote-attached TPUs.
    Logging/checkpoint cadences then snap to chunk boundaries.
    """
    if debug_nans:
        # the TPU analogue of the reference's detect_anomaly slot
        # (configs/ddpm/cifar10.yaml:63): fail loudly at the producing op
        jax.config.update("jax_debug_nans", True)

    datamodule.prepare_data()
    datamodule.setup("fit")

    # Multi-host SPMD (SURVEY §2 "Parallelism & distributed communication"):
    # every process runs this same loop; the mesh spans the global device
    # list, each host feeds its slice of the global batch, and XLA's
    # collectives do the rest. jax.distributed.initialize() must have been
    # called first (dmme_tpu.parallel.initialize).
    nproc = jax.process_count()
    if nproc > 1 and mesh is None:
        raise ValueError(
            "multi-process fit() needs a mesh over the global device list "
            "(e.g. make_mesh()); got mesh=None"
        )

    rng = jax.random.PRNGKey(seed)
    init_rng, run_rng = jax.random.split(rng)

    if state is None:
        img_size = getattr(datamodule, "img_size", None)
        if img_size is None:  # fall back to the loaded array's shape
            img_size = datamodule.train_data.shape[1]
        state = lit.init_state(init_rng, img_size=int(img_size))

    ckpt = (
        CheckpointManager(ckpt_dir, max_to_keep=ckpt_max_to_keep)
        if ckpt_dir
        else None
    )
    if resume and ckpt is not None and ckpt.latest_step() is not None:
        state = ckpt.restore(state)

    if mesh is not None:
        state = shard_state(state, mesh)

    # batch placement: single-process = device_put with the mesh layout;
    # multi-process = assemble a global array from per-host shards.
    if mesh is None:
        place_batch = None
    elif nproc > 1:
        from dmme_tpu.parallel.distributed import global_batch

        def place_batch(b, chunked=False):
            return global_batch(b, mesh, chunked)
    else:

        def place_batch(b, chunked=False):
            return shard_batch(b, mesh, chunked)

    loss_fn = lit.make_loss_fn(datamodule)
    if accumulate_grad_batches > 1:
        loss_fn = _microbatched(loss_fn, accumulate_grad_batches)
    if steps_per_call > 1:
        assert accumulate_grad_batches == 1, (
            "steps_per_call and accumulate_grad_batches are mutually exclusive"
        )
        train_step = make_train_chunk(loss_fn, steps_per_call)
    else:
        train_step = make_train_step(loss_fn)

    logger = MetricLogger(ckpt_dir, tensorboard=tensorboard, loggers=loggers)
    for cb in callbacks:
        _call(cb, "on_fit_start", lit=lit, state=state, logger=logger)

    start_step = int(jax.device_get(state.step))
    pending = None  # (step, metrics) fetched lazily
    t_last = time.time()
    imgs_since = 0

    # resume determinism: skip the batches already consumed so step k sees
    # the same data whether or not training was interrupted (per-step rng is
    # already reproducible via fold_in(run_key, step)). Datamodules that
    # support skip_batches fast-forward WITHOUT materializing (critical for
    # streaming LSUN: resuming at step 500k must not decode 500k batches).
    import inspect

    skip = start_step * max(accumulate_grad_batches, 1)
    try:
        it_params = inspect.signature(datamodule.train_iter).parameters
    except (TypeError, ValueError):
        it_params = {}
    has_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in it_params.values()
    )
    # skip_batches stays name-gated even under **kwargs: an iterator that
    # swallows-and-ignores it would silently break resume determinism,
    # while the manual fast-forward fallback below is always correct.
    supports_skip = "skip_batches" in it_params
    it_kwargs = {}
    if nproc > 1:
        # capability-gated like skip_batches: a user datamodule with the
        # documented train_iter(seed) signature must not crash multi-process
        # — but silently feeding every host the SAME data would duplicate
        # batches across the global batch, so refuse loudly instead.
        # A **kwargs signature is accepted (it worked before this check).
        if "process_index" not in it_params and not has_var_kw:
            raise ValueError(
                f"{type(datamodule).__name__}.train_iter does not accept "
                "process_index/process_count — required for multi-process "
                "training (each host must feed its shard of the global "
                "batch; see data/data_module.py)"
            )
        it_kwargs.update(process_index=jax.process_index(), process_count=nproc)
    if supports_skip:
        it = datamodule.train_iter(seed, skip_batches=skip, **it_kwargs)
    else:
        it = datamodule.train_iter(seed, **it_kwargs)
        for _ in range(skip):
            next(it)
    step = start_step
    # progress visible to the interrupt handler; "preempted" is the
    # deferred-SIGTERM flag checked at safe points in the loop
    holder = {"state": state, "preempted": False}
    # Preemption notices arrive as SIGTERM (cluster schedulers, `timeout`,
    # supervisors) — route them through the same graceful-save path as
    # Ctrl-C so a preempted run leaves a checkpoint at its true progress,
    # THEN re-deliver the signal with the default disposition so the
    # process still dies *by SIGTERM* (WIFSIGNALED): supervisors that
    # distinguish preemption from failure, and applications that catch
    # KeyboardInterrupt as "user abort", must not misread a preemption.
    # (Motivating incident: a SIGTERMed 256px run lost 2000 steps because
    # only KeyboardInterrupt saved.) Main thread only: signal.signal
    # raises ValueError elsewhere, and library code must not steal
    # handlers from an embedding application off the main thread.
    import os
    import signal
    import threading

    prev_sigterm = None
    sigterm_installed = False

    def _on_sigterm(signum, frame):
        # DEFERRED, not raised here: an immediate raise usually lands while
        # Python is blocked inside the step dispatch — before the loop has
        # rebound holder["state"] — leaving only the DONATED previous state
        # to save (verified by the subprocess preemption test). The loop
        # raises at its next safe point, where the freshest state is whole.
        holder["preempted"] = True

    def _restore_sigterm():
        nonlocal sigterm_installed
        if sigterm_installed:
            # a None return means "installed from C, unrepresentable
            # here"; fall back to the default disposition
            signal.signal(
                signal.SIGTERM,
                signal.SIG_DFL if prev_sigterm is None else prev_sigterm,
            )
            sigterm_installed = False

    if threading.current_thread() is threading.main_thread():
        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
            sigterm_installed = True
        except ValueError:
            pass
    try:
        # the handler stays installed through the FINAL save below too —
        # the multi-second last-checkpoint write is exactly as killable
        # as a training step
        try:
            state, step = _train_loop(
                lit, holder, step, max_steps, it, train_step, run_rng,
                place_batch, steps_per_call, accumulate_grad_batches,
                log_every, ckpt, ckpt_every, callbacks, logger, t_last,
                imgs_since, loss_fn,
            )
            holder["state"] = state
            if ckpt is not None:
                if ckpt.latest_step() != max_steps:
                    ckpt.save(max_steps, state, force=True)  # save_last parity
                ckpt.wait()
            for cb in callbacks:
                _call(cb, "on_fit_end", lit=lit, state=state, logger=logger)
            if holder.get("preempted"):
                # the notice arrived after the last loop check (e.g. during
                # the final save): everything is persisted — honor the
                # signal's termination semantics rather than swallowing it
                _restore_sigterm()
                os.kill(os.getpid(), signal.SIGTERM)
        except KeyboardInterrupt:
            # graceful preemption: persist progress before propagating (the
            # reference relies on Lightning's last-checkpoint only)
            state = holder["state"]
            if ckpt is not None:
                try:
                    done = int(jax.device_get(state.step))
                    if ckpt.latest_step() != done:
                        ckpt.save(done, state, force=True)
                    ckpt.wait()
                except Exception:
                    # an interrupt mid-step can leave the last state's
                    # buffers donated into the in-flight call; skip rather
                    # than mask the interrupt
                    pass
            if holder.get("preempted"):
                _restore_sigterm()
                os.kill(os.getpid(), signal.SIGTERM)  # die as SIGTERM
            raise
    finally:
        _restore_sigterm()
    logger.close()
    return state


def _train_loop(
    lit, holder, step, max_steps, it, train_step, run_rng, place_batch,
    steps_per_call, accumulate_grad_batches, log_every, ckpt, ckpt_every,
    callbacks, logger, t_last, imgs_since, loss_fn,
):
    state = holder["state"]
    while step < max_steps:
        stride = min(steps_per_call, max_steps - step)
        chunked = steps_per_call > 1 or accumulate_grad_batches > 1
        if steps_per_call > 1:
            if stride != steps_per_call:  # tail chunk: recompile-free fallback
                break
            batch = jax.tree.map(
                lambda *xs: np.stack(xs), *[next(it) for _ in range(stride)]
            )
        else:
            batch = next(it)
            if accumulate_grad_batches > 1:
                micro = [next(it) for _ in range(accumulate_grad_batches - 1)]
                # pytree-aware: labeled datamodules yield (images, labels)
                batch = jax.tree.map(lambda *xs: np.stack(xs), batch, *micro)
        if place_batch is not None:
            batch = place_batch(batch, chunked)
        state, metrics = train_step(state, batch, run_rng)
        holder["state"] = state
        if holder.get("preempted"):  # deferred SIGTERM: safe point, fresh state
            raise KeyboardInterrupt
        if steps_per_call > 1:
            metrics = jax.tree.map(lambda m: m[-1], metrics)
        lead = jax.tree.leaves(batch)[0]
        imgs_since += int(np.prod(lead.shape[:-3]))  # (..., H, W, C) leading dims
        step += stride
        pending = (step, metrics)

        if step % log_every < stride:
            s, m = pending
            m = jax.device_get(m)  # blocks; amortized over log_every steps
            now = time.time()
            m["imgs_per_sec"] = imgs_since / max(now - t_last, 1e-9)
            # LearningRateMonitor parity (reference configs attach it)
            if hasattr(lit, "lr") and hasattr(lit, "warmup"):
                m["lr"] = lit.lr * min(1.0, s / max(lit.warmup, 1))
            t_last, imgs_since = now, 0
            logger.log(s, m)
            for cb in callbacks:
                _call(
                    cb, "on_log",
                    step=s, lit=lit, state=state, metrics=m, logger=logger,
                )

        if ckpt is not None and step % ckpt_every < stride:
            ckpt.save(step, state)

        for cb in callbacks:
            _call(
                cb, "on_train_step_end",
                step=step, lit=lit, state=state, logger=logger,
                stride=stride,
            )

    # tail steps that don't fill a chunk run one-at-a-time
    if steps_per_call > 1 and step < max_steps:
        single = make_train_step(loss_fn)
        while step < max_steps:
            batch = next(it)
            if place_batch is not None:
                batch = place_batch(batch, False)
            state, _ = single(state, batch, run_rng)
            holder["state"] = state
            if holder.get("preempted"):
                raise KeyboardInterrupt
            step += 1

    return state, step


def _microbatched(loss_fn, k: int):
    """Gradient accumulation over k stacked microbatches (reference: LSUN
    configs accumulate_grad_batches=32).

    The gradient is taken INSIDE the scan body and summed in the carry —
    differentiating through a scanned mean-loss instead makes XLA save every
    microbatch's activations for the backward pass, which multiplies peak
    HBM by k (measured: the LSUN-256 b2×a32 recipe needs 24.9 GiB that way
    vs a 15.75 GiB chip; scripts/bigshape_probe.py). Returns a
    ``(params, rng, stacked) -> (loss, grads)`` function; marked with
    ``is_grad_fn`` so the train-step factories skip their own
    ``value_and_grad``."""
    import jax.numpy as jnp

    vg = jax.value_and_grad(loss_fn)

    def accum_grads(params, rng, stacked):
        keys = jax.random.split(rng, k)

        def body(carry, inp):
            key, mb = inp
            loss, grads = vg(params, key, mb)
            acc_loss, acc_grads = carry
            return (
                acc_loss + loss,
                jax.tree.map(jnp.add, acc_grads, grads),
            ), None

        zeros = jax.tree.map(lambda p: jnp.zeros_like(p), params)
        (total, grad_sum), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zeros), (keys, stacked)
        )
        return total / k, jax.tree.map(lambda g: g / k, grad_sum)

    accum_grads.is_grad_fn = True
    return accum_grads


def _call(cb, hook: str, **kwargs) -> None:
    """Invoke a callback hook with only the kwargs its signature accepts —
    lets hooks opt into extras (e.g. ``logger``) without breaking old ones."""
    fn = getattr(cb, hook, None)
    if fn is None:
        return
    import inspect

    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        fn(**kwargs)
        return
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        fn(**kwargs)
    else:
        fn(**{k: v for k, v in kwargs.items() if k in params})
