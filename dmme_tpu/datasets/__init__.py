"""Raw datasets (reference: src/dmme/datasets/__init__.py)."""

from dmme_tpu.datasets.lsun import LSUN, LSUNClass

__all__ = ["LSUN", "LSUNClass"]
