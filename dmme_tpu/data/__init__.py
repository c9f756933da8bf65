"""Data modules (reference: src/dmme/data_modules/__init__.py)."""

from dmme_tpu.data.data_module import DataModule, random_horizontal_flip
from dmme_tpu.data.cifar10 import CIFAR10

__all__ = ["DataModule", "CIFAR10", "random_horizontal_flip"]
