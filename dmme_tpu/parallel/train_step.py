"""SPMD train-step compilation.

The computation-follows-data idiom: :func:`shard_state` / :func:`shard_batch`
place the pytrees according to the mesh layout (params replicated or
ZeRO-sharded on ``fsdp``; batch split over all axes), and the jitted step
inherits those shardings — XLA's SPMD partitioner inserts the gradient
all-reduce / all-gather / reduce-scatter collectives over ICI from the
annotations alone. No hand-written communication (contrast: the reference
delegates DP wholesale to Lightning/NCCL and never implements it —
SURVEY.md §2).

The TrainState is donated: params, EMA, and optimizer state update in place
in HBM. On-device augmentation + normalization live inside ``loss_fn`` so
they fuse into the same program and the host ships raw uint8.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Callable

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dmme_tpu.parallel.mesh import batch_sharding, state_sharding

if TYPE_CHECKING:  # avoid a runtime cycle with dmme_tpu.training
    from dmme_tpu.training.state import TrainState
else:
    TrainState = Any

LossFn = Callable[[Any, jax.Array, Any], jax.Array]  # (params, rng, batch)


def _value_and_grad(loss_fn: LossFn):
    """``value_and_grad`` unless ``loss_fn`` already IS a grad function
    (``is_grad_fn`` marker — the gradient-accumulation wrapper takes its
    gradients inside its own scan; see training/loop.py:_microbatched)."""
    if getattr(loss_fn, "is_grad_fn", False):
        return loss_fn
    return jax.value_and_grad(loss_fn)


def make_train_step(loss_fn: LossFn, donate: bool = True):
    """Compile ``(state, batch, rng) -> (state, metrics)``.

    ``loss_fn(params, rng, batch)`` must be pure. Per-step rng is derived by
    folding the step counter into the run key, so resume-from-checkpoint
    reproduces the exact noise/timestep stream.
    """
    vg = _value_and_grad(loss_fn)

    def step(state: TrainState, batch, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        loss, grads = vg(state.params, step_rng, batch)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": global_norm(grads)}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_chunk(loss_fn: LossFn, steps: int, donate: bool = True):
    """Compile ``steps`` chained train steps as ONE program (scan-of-steps).

    ``(state, batches, rng) -> (state, metrics)`` where ``batches`` is the
    per-step batch stacked on a leading axis of length ``steps`` and
    ``metrics`` are the per-step loss/grad-norm stacked likewise.

    Why: a Python-loop step costs one dispatch round-trip per step; scanning
    K steps inside jit amortizes dispatch, keeps params/optimizer state
    pinned in HBM for the whole chunk, and lets XLA overlap the next step's
    input DMA with compute. The host only needs to prefetch K batches.
    """

    vg = _value_and_grad(loss_fn)

    def chunk(state: TrainState, batches, rng: jax.Array):
        def one(state: TrainState, batch):
            step_rng = jax.random.fold_in(rng, state.step)
            loss, grads = vg(state.params, step_rng, batch)
            new_state = state.apply_gradients(grads)
            return new_state, {"loss": loss, "grad_norm": global_norm(grads)}

        return jax.lax.scan(one, state, batches)

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_fn: LossFn):
    """Compile ``(params, batch, rng) -> loss`` (no dropout, no updates)."""

    def step(params, batch, rng):
        return loss_fn(params, rng, batch)

    return jax.jit(step)


def global_norm(tree: Any) -> jax.Array:
    """ℓ2 norm of a pytree, per-leaf reduction form.

    Measured on v5e (docs/performance.md): the per-leaf Σx² reduces FUSE
    into each leaf's weight-gradient fusion (free); a single ravel+reduce
    variant was 0.9 ms/step slower because the concat materializes. This
    expression also CSEs with optax.clip_by_global_norm's internal norm.
    """
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def clip_by_global_norm_fused(max_norm: float):
    """optax.clip_by_global_norm semantics with a single raveled reduction —
    OPT-IN: loses to the fused per-leaf form inside the train step on v5e
    (see global_norm); useful where updates aren't co-located with their
    weight-grad fusions (e.g. externally computed gradients)."""
    import optax

    def _ravel_norm(tree):
        flat, _ = jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda x: x.astype(jnp.float32), tree)
        )
        return jnp.sqrt(jnp.sum(jnp.square(flat)))

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = _ravel_norm(updates)
        trigger = g_norm < max_norm
        scale = jnp.where(trigger, 1.0, max_norm / jnp.maximum(g_norm, 1e-32))
        updates = jax.tree.map(lambda t: t * scale.astype(t.dtype), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def shard_state(
    state: TrainState, mesh: Mesh, min_weight_size: int = 2**14
) -> TrainState:
    """Place a TrainState onto the mesh layout (replicated / fsdp- and
    tensor-sharded leaves; ``min_weight_size`` gates which leaves shard —
    lower it for tiny test models so collectives actually form)."""
    return jax.device_put(state, state_sharding(state, mesh, min_weight_size))


def shard_batch(batch, mesh: Mesh, chunked: bool = False):
    """Split the batch axis across the mesh (``chunked`` = the input is
    (steps, batch, …) for a scan-of-steps program). Per-leaf rank-aware:
    image leaves also shard H over a ``spatial`` axis (see batch_sharding);
    label leaves stay batch-only."""
    return jax.device_put(
        batch,
        jax.tree.map(
            lambda x: batch_sharding(mesh, chunked, shape=np.shape(x)), batch
        ),
    )
