"""Pallas TPU kernels for the hot ops; XLA fallbacks everywhere off-TPU."""

from dmme_tpu.ops.attention import attention, on_tpu
from dmme_tpu.ops.group_norm import group_norm_silu

__all__ = ["attention", "group_norm_silu", "on_tpu"]
