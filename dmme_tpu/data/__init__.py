"""Data modules (reference: src/dmme/data_modules/__init__.py)."""

from dmme_tpu.data.data_module import DataModule, random_horizontal_flip
from dmme_tpu.data.cifar10 import CIFAR10
from dmme_tpu.data.imagefolder import ImageFolder64
from dmme_tpu.data.lsun import LSUN
from dmme_tpu.data.lmdb_reader import LMDBReader
from dmme_tpu.data.shapes import Shapes

__all__ = [
    "DataModule",
    "CIFAR10",
    "ImageFolder64",
    "LSUN",
    "LMDBReader",
    "Shapes",
    "random_horizontal_flip",
]
