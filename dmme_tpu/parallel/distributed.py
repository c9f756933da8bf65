"""Multi-host (multi-process) initialization.

On a TPU pod each host runs the same program; call :func:`initialize` first
thing and every helper in this package operates on the GLOBAL device list —
`make_mesh` spans hosts, `shard_batch` expects per-host batches placed with
`jax.make_array_from_process_local_data` (use :func:`global_batch`).
XLA routes mesh-axis collectives over ICI within a slice and DCN across
slices; keeping the ``data`` axis outermost (the default) puts the one
gradient all-reduce on the cheap path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` passthrough; on TPU pods all arguments
    are discovered automatically from the environment."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch(local_batch, mesh, chunked: bool = False):
    """Assemble a globally-sharded batch from this host's local shard.

    Every process passes its ``global_batch_size/process_count`` slice (see
    ``DataModule.train_iter(process_index=..., process_count=...)``); the
    result is ONE global jax.Array sharded over the mesh's batch axes whose
    addressable shards are exactly this host's data — zero cross-host data
    movement at assembly time. ``chunked`` marks (steps, batch, …) inputs.
    """
    from dmme_tpu.parallel.mesh import batch_sharding

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh, chunked, shape=np.shape(x)), np.asarray(x)
        ),
        local_batch,
    )
