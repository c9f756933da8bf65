"""Mesh/sharding layer — data and fully-sharded parallelism over TPU ICI."""

from dmme_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    params_sharding,
    state_sharding,
    fsdp_param_spec,
)
from dmme_tpu.parallel.train_step import (
    make_train_step,
    make_train_chunk,
    make_eval_step,
    shard_state,
    shard_batch,
    global_norm,
)
from dmme_tpu.parallel.distributed import initialize, global_batch

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "params_sharding",
    "state_sharding",
    "fsdp_param_spec",
    "make_train_step",
    "make_train_chunk",
    "make_eval_step",
    "shard_state",
    "shard_batch",
    "global_norm",
    "initialize",
    "global_batch",
]
