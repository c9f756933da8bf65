"""Pallas TPU kernels for the hot ops; XLA fallbacks everywhere off-TPU."""

from dmme_tpu.ops.attention import attention, on_tpu

__all__ = ["attention", "on_tpu"]
