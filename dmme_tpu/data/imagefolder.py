"""ImageNet-64 (downsampled-ImageNet) data module.

Reads the standard downsampled-ImageNet archives
(``train_data_batch_{1..10}.npz``/``.npy`` with ``data`` rows of 3·64·64
channel-plane uint8, as distributed by image-net.org) from local disk, with
the same synthetic fallback as CIFAR-10 for bench/smoke runs. Used by the
IDDPM ImageNet-64 config (configs/iddpm/imagenet64.yaml).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import numpy as np

from dmme_tpu.data.data_module import DataModule, random_horizontal_flip


class ImageFolder64(DataModule):
    img_size = 64

    def __init__(
        self,
        data_dir: str = ".",
        batch_size: int = 128,
        horizontal_flip: bool = True,
        synthetic: bool = False,
        synthetic_size: int = 10_000,
        with_labels: bool = False,
    ):
        super().__init__(batch_size)
        self.data_dir = data_dir
        self.horizontal_flip = horizontal_flip
        self.synthetic = synthetic
        self.synthetic_size = synthetic_size
        self.with_labels = with_labels

    def _load(self):
        if self.synthetic:
            rng = np.random.default_rng(0)
            images = rng.integers(0, 256, (self.synthetic_size, 64, 64, 3), np.uint8)
            labels = rng.integers(0, 1000, (self.synthetic_size,), np.int32)
            return images, labels

        paths = sorted(
            glob.glob(os.path.join(self.data_dir, "train_data_batch_*.np[yz]"))
        )
        if not paths:
            raise FileNotFoundError(
                f"ImageNet-64 not found under {self.data_dir!r} (expected "
                "train_data_batch_*.npz). No network egress — place the "
                "downsampled-ImageNet archives on disk or pass synthetic=True."
            )
        parts, labels = [], []
        for p in paths:
            d = np.load(p, allow_pickle=True)
            data = d["data"] if hasattr(d, "keys") else d
            lab = (
                np.asarray(d["labels"], np.int32) - 1
                if hasattr(d, "keys") and "labels" in d
                else np.zeros(len(data), np.int32)
            )
            parts.append(
                np.asarray(data, np.uint8).reshape(-1, 3, 64, 64).transpose(0, 2, 3, 1)
            )
            labels.append(lab)
        return np.concatenate(parts), np.concatenate(labels)

    def setup_train(self) -> None:
        if self.train_data is None:
            self.train_data, labels = self._load()
            if self.with_labels:
                self.train_labels = labels

    def setup_test(self) -> None:
        self.setup_train()
        self.test_data = self.train_data
        self.test_labels = self.train_labels

    def augment(self, rng: jax.Array, batch: jax.Array) -> jax.Array:
        if not self.horizontal_flip:
            return batch
        return random_horizontal_flip(rng, batch)
