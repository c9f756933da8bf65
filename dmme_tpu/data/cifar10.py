"""CIFAR-10 data module (reference: src/dmme/data_modules/cifar10.py).

Reads the standard on-disk formats directly (no torchvision):

* python version — ``cifar-10-batches-py/data_batch_{1..5}`` pickle dicts
  with (N, 3072) uint8 rows in R|G|B channel-plane order;
* binary version — ``cifar-10-binary/.../data_batch_{1..5}.bin`` records of
  1 label byte + 3072 image bytes.

The reference downloads in ``prepare_data``; this environment has no network
egress, so the dataset must already be under ``data_dir``. For smoke tests
and throughput benches, ``synthetic=True`` fabricates a deterministic
uint8 dataset with the right shapes.

Augmentation: random horizontal flip (the reference's default aug), executed
on-device inside the jitted train step.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np

from dmme_tpu.data.data_module import DataModule, random_horizontal_flip

_TRAIN_PICKLES = [f"data_batch_{i}" for i in range(1, 6)]
_TRAIN_BINS = [f"data_batch_{i}.bin" for i in range(1, 6)]


def _from_planes(flat: np.ndarray) -> np.ndarray:
    """(N, 3072) channel-plane rows → (N, 32, 32, 3) NHWC uint8."""
    return flat.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)


class CIFAR10(DataModule):
    img_size = 32

    #: canonical python-version archive (torchvision's URL and md5)
    URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"
    MD5 = "c58f30108f718f92721af3b95e74349a"

    def __init__(
        self,
        data_dir: str = ".",
        batch_size: int = 128,
        horizontal_flip: bool = True,
        synthetic: bool = False,
        synthetic_size: int = 50_000,
        with_labels: bool = False,
        download: bool = False,
    ):
        super().__init__(batch_size)
        self.data_dir = data_dir
        self.horizontal_flip = horizontal_flip
        self.synthetic = synthetic
        self.synthetic_size = synthetic_size
        self.with_labels = with_labels
        self.download = download

    def prepare_data(self) -> None:
        """Download+extract the python-version archive when asked (the
        reference's ``prepare_data`` downloads via torchvision —
        src/dmme/data_modules/cifar10.py:36-37). Skip-if-exists; md5-checked.
        NOTE: this build environment has no egress — opt-in only."""
        if self.synthetic or not self.download:
            return
        if os.path.isdir(os.path.join(self.data_dir, "cifar-10-batches-py")):
            return
        import hashlib
        import tarfile
        import urllib.request

        os.makedirs(self.data_dir, exist_ok=True)
        archive = os.path.join(self.data_dir, "cifar-10-python.tar.gz")
        if not os.path.exists(archive):
            print(f"Downloading {self.URL}...")
            urllib.request.urlretrieve(self.URL, archive)
        with open(archive, "rb") as f:
            digest = hashlib.md5(f.read()).hexdigest()
        if digest != self.MD5:
            raise RuntimeError(
                f"CIFAR-10 archive md5 mismatch: {digest} != {self.MD5}"
            )
        with tarfile.open(archive, "r:gz") as tar:
            try:
                tar.extractall(self.data_dir, filter="data")  # no links/devices
            except TypeError:  # filter= needs >=3.12 (or 3.10.12/3.11.4)
                tar.extractall(self.data_dir)

    # ----------------------------------------------------------------- loading
    def _load(self):
        if self.synthetic:
            rng = np.random.default_rng(0)
            images = rng.integers(
                0, 256, (self.synthetic_size, 32, 32, 3), dtype=np.uint8
            )
            labels = rng.integers(0, 10, (self.synthetic_size,), dtype=np.int32)
            return images, labels

        py_dir = os.path.join(self.data_dir, "cifar-10-batches-py")
        if os.path.isdir(py_dir):
            parts, labels = [], []
            for name in _TRAIN_PICKLES:
                with open(os.path.join(py_dir, name), "rb") as f:
                    d = pickle.load(f, encoding="bytes")
                parts.append(_from_planes(np.asarray(d[b"data"], np.uint8)))
                labels.append(np.asarray(d[b"labels"], np.int32))
            return np.concatenate(parts), np.concatenate(labels)

        for bin_dir in (
            os.path.join(self.data_dir, "cifar-10-batches-bin"),
            os.path.join(self.data_dir, "cifar-10-binary", "cifar-10-batches-bin"),
        ):
            if os.path.isdir(bin_dir):
                parts, labels = [], []
                for name in _TRAIN_BINS:
                    raw = np.fromfile(os.path.join(bin_dir, name), np.uint8)
                    rec = raw.reshape(-1, 3073)
                    labels.append(rec[:, 0].astype(np.int32))
                    parts.append(_from_planes(rec[:, 1:]))
                return np.concatenate(parts), np.concatenate(labels)

        raise FileNotFoundError(
            f"CIFAR-10 not found under {self.data_dir!r} "
            "(expected cifar-10-batches-py/ or cifar-10-batches-bin/). "
            "This environment has no network egress; place the dataset on "
            "disk or pass synthetic=True for smoke/bench runs."
        )

    def setup_train(self) -> None:
        if self.train_data is None:
            self.train_data, labels = self._load()
            if self.with_labels:
                self.train_labels = labels

    def setup_test(self) -> None:
        # Reference parity: test stage reuses the train set without augs
        # (src/dmme/data_modules/data_module.py:38-39).
        self.setup_train()
        self.test_data = self.train_data
        self.test_labels = self.train_labels

    # ------------------------------------------------------------ device math
    def augment(self, rng: jax.Array, batch: jax.Array) -> jax.Array:
        if not self.horizontal_flip:
            return batch
        return random_horizontal_flip(rng, batch)
