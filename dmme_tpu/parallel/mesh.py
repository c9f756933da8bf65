"""Device mesh and sharding layout helpers.

The reference has no parallelism of its own (SURVEY.md §2 — DP was delegated
to Lightning and pinned to one GPU). Here data/model parallelism is a
first-class component, built the TPU way: pick a mesh, annotate shardings
with ``NamedSharding``, let XLA insert the collectives over ICI.

Mesh axes:

* ``data``   — pure data parallelism; gradients all-reduce over ICI.
* ``fsdp``   — optional parameter/optimizer sharding (ZeRO-style): each leaf
  is split along its largest divisible axis; XLA turns the paired
  all-gather (params) / reduce-scatter (grads) into bandwidth-optimal
  collectives. The batch is sharded over data AND fsdp so every chip
  computes.
* ``tensor`` — optional tensor (channel) parallelism: conv kernels and
  dense matrices shard their OUTPUT-channel axis, so activations flow
  channel-sharded through the UNet (GroupNorm statistics stay device-local
  when the split lands on group boundaries, which it does for the shipped
  widths) and the SPMD partitioner inserts the contraction all-reduces.
  For the 32px CIFAR model tensor parallelism is latency-bound overkill;
  it exists for the 512-channel 256px LSUN UNet, where per-layer weights
  and activations are 4× larger.
* ``expert`` — expert parallelism for MoE-DiT models (models/moe.py):
  rank-3 ``(E, d_in, d_out)`` expert-weight stacks shard their expert
  axis, the batch is additionally sharded over this axis (GShard token
  layout), and the dispatch/combine einsums induce the token
  all-to-alls.

Multi-host: call :func:`jax.distributed.initialize` first; these helpers use
the global device list, so DCN crossing stays on the outermost (``data``)
axis where collective volume is smallest.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    spatial: int = 1,
    expert: int = 1,
) -> Mesh:
    """Build a ``(data, fsdp, expert, tensor, spatial)`` mesh. ``data=-1``
    absorbs the rest.

    Axis order = collective frequency (innermost rides the fastest ICI
    links): spatial parallelism exchanges conv halos at every layer,
    tensor parallelism all-reduces activations at every sharded
    contraction, fsdp all-gathers per layer, and the data axis' single
    gradient all-reduce tolerates the slower outer links / DCN.

    ``spatial`` is the image-model analogue of sequence parallelism: the
    activation H axis is sharded and XLA's SPMD partitioner inserts the
    halo exchanges for convolutions and the cross-device reductions for
    GroupNorm statistics automatically. Useful when ONE image's
    activations dominate HBM (256px+ UNets at tiny per-device batch);
    pointless at 32px where the batch axis offers all the parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * expert * tensor * spatial) == 0, (
            n, fsdp, expert, tensor, spatial,
        )
        data = n // (fsdp * expert * tensor * spatial)
    assert data * fsdp * expert * tensor * spatial == n, (
        f"mesh {data}x{fsdp}x{expert}x{tensor}x{spatial} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, fsdp, expert, tensor, spatial)
    return Mesh(arr, ("data", "fsdp", "expert", "tensor", "spatial"))


def batch_sharding(
    mesh: Mesh,
    chunked: bool = False,
    ndim: Optional[int] = None,
    shape: Optional[Sequence[int]] = None,
) -> NamedSharding:
    """Shard the batch axis over the data×fsdp mesh axes. ``chunked=True``
    for scan-of-steps inputs shaped (steps, batch, …): the steps axis stays
    unsharded (it is unstacked sequentially by the scan) and the batch axis
    — axis 1 — is the one split across devices.

    With a ``spatial`` mesh axis > 1, IMAGE leaves (batch, H, W, C)
    additionally shard H across ``spatial`` — sequence parallelism for conv
    nets, halo exchanges inserted by the SPMD partitioner. Pass ``shape``
    so image leaves are identified explicitly (trailing (H, W, C) with
    small channels-last C and H divisible by the spatial size); any other
    high-rank leaf stays batch-only. ``ndim`` alone (legacy) falls back to
    the rank heuristic and should be avoided for new call sites."""
    lead = (None,) if chunked else ()
    batch_axes = ("data", "fsdp")
    if mesh.shape.get("expert", 1) > 1:
        # tokens are data-sharded over expert groups too (GShard layout);
        # the MoE dispatch/combine einsums then induce the all-to-alls
        batch_axes = ("data", "fsdp", "expert")
    spec = lead + (batch_axes,)
    spatial = mesh.shape.get("spatial", 1)
    if spatial > 1:
        if shape is not None:
            is_image = (
                len(shape) >= len(spec) + 3
                and shape[-1] <= 16          # channels-last: C small
                and shape[-3] % spatial == 0  # H splits evenly
                and shape[-3] >= 2 * spatial  # each shard keeps >=2 rows
            )
        else:
            is_image = ndim is not None and ndim >= len(spec) + 3
        if is_image:
            spec = spec + ("spatial",)  # the H axis of (…, batch, H, W, C)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(
    shape: Sequence[int],
    mesh: Mesh,
    min_weight_size: int = 2**14,
    path: str = "",
) -> P:
    """Partition spec for one parameter.

    * ``expert`` axis (if >1): rank-3 leaves whose ``path`` names a MoE
      module (models/moe.py lives under ``moe_mlp``/``MoEMlp`` names)
      shard axis 0 — the (E, d_in, d_out) expert stack. The path gate is
      deliberate: rank/shape alone would silently mis-shard any future
      rank-3 non-expert weight (1D-conv kernel, per-head projection) on
      the expert axis (ADVICE r4). ``params_sharding``/``state_sharding``
      supply paths automatically; direct callers without a path never get
      expert sharding.
    * ``tensor`` axis (if >1): shard the OUTPUT-channel axis — the last axis
      of conv kernels (HWIO) and dense matrices — Megatron-style column
      parallelism; the SPMD partitioner propagates the channel sharding
      through activations and inserts contraction all-reduces.
    * ``fsdp`` axis (if >1): shard the largest remaining divisible axis
      (ZeRO-style). Small leaves stay replicated (their all-gather would
      cost more than it saves).
    """
    tensor_size = mesh.shape.get("tensor", 1)
    fsdp_size = mesh.shape.get("fsdp", 1)
    expert_size = mesh.shape.get("expert", 1)
    spec = [None] * len(shape)
    if int(np.prod(shape)) < min_weight_size:
        return P()
    ep_axis = None
    if (
        expert_size > 1
        and len(shape) == 3
        and shape[0] % expert_size == 0
        and "moe" in path.lower()
    ):
        ep_axis = 0
        spec[0] = "expert"
    tp_axis = None
    if tensor_size > 1 and len(shape) >= 2 and shape[-1] % tensor_size == 0:
        tp_axis = len(shape) - 1
        spec[tp_axis] = "tensor"
    if fsdp_size > 1:
        # prefer the last (lane) axis, then the largest
        order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
        for i in order:
            if i not in (tp_axis, ep_axis) and shape[i] % fsdp_size == 0:
                spec[i] = "fsdp"
                break
    if all(s is None for s in spec):
        return P()
    return P(*spec)


def params_sharding(params: Any, mesh: Mesh, min_weight_size: int = 2**14) -> Any:
    """A pytree of NamedShardings for a parameter tree (fsdp-aware).

    Maps WITH paths so module names reach the spec rule (the expert-axis
    gate keys on ``moe`` in the path; optimizer moments mirror the params
    dict, so their paths carry the same names)."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, p: NamedSharding(
            mesh,
            fsdp_param_spec(
                p.shape, mesh, min_weight_size, path=jax.tree_util.keystr(kp)
            ),
        ),
        params,
    )


def state_sharding(state: Any, mesh: Mesh, min_weight_size: int = 2**14) -> Any:
    """Shardings for a full TrainState: params/ema/opt_state leaves follow the
    fsdp layout (optimizer moments have parameter shapes); scalars replicate."""

    def leaf_sharding(kp, x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        return NamedSharding(
            mesh,
            fsdp_param_spec(
                shape, mesh, min_weight_size, path=jax.tree_util.keystr(kp)
            ),
        )

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
