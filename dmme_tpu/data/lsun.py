"""LSUN data module (reference: src/dmme/data_modules/lsun.py).

Category resolution and the resize→center-crop transform chain match the
reference (Resize(imgsize) + CenterCrop(imgsize), lsun.py:147-166). The
reference downloads via an ``aria2c`` subprocess (lsun.py:122-145); this
environment has no network egress, so ``prepare_data`` only verifies the
LMDBs exist and raises with instructions otherwise.

Host cost note: 256px LSUN images are stored as JPEG; decode+resize runs on
the host (PIL). ``cache_decoded`` materializes the decoded uint8 array once
to ``<category>_decoded_<size>.npy`` so later epochs are pure memory reads —
the right trade on a thin-host TPU VM.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from dmme_tpu.data.data_module import DataModule, random_horizontal_flip
from dmme_tpu.datasets.lsun import LSUN as LSUNDataset, SCENES, OBJECTS


def resize_center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Shorter-side resize to ``size`` then center crop (torchvision
    Resize+CenterCrop semantics) using PIL bilinear."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    pil = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    arr = np.asarray(pil, np.uint8)
    top = (nh - size) // 2
    left = (nw - size) // 2
    return arr[top : top + size, left : left + size]


class LSUN(DataModule):
    def __init__(
        self,
        data_dir: str = ".",
        category: str = "bedroom",
        split: str = "train",
        batch_size: int = 2,
        imgsize: int = 256,
        horizontal_flip: bool = True,
        cache_decoded: bool = True,
        limit: Optional[int] = None,
    ):
        super().__init__(batch_size)
        if category not in SCENES and category not in OBJECTS:
            raise ValueError(
                f"unknown LSUN category {category!r}; scenes={SCENES}, "
                f"objects={OBJECTS}"
            )
        self.data_dir = data_dir
        self.category = category
        self.split = split
        self.imgsize = imgsize
        self.img_size = imgsize
        self.horizontal_flip = horizontal_flip
        self.cache_decoded = cache_decoded
        self.limit = limit

    @property
    def lmdb_path(self) -> str:
        # objects ship as a single-category archive without split suffix
        name = (
            f"{self.category}_{self.split}_lmdb"
            if self.category in SCENES
            else f"{self.category}_lmdb"
        )
        return os.path.join(self.data_dir, name)

    def prepare_data(self) -> None:
        if not os.path.exists(self.lmdb_path):
            raise FileNotFoundError(
                f"LSUN LMDB not found at {self.lmdb_path}. This environment "
                "has no network egress — download "
                f"{self.category}_{self.split}_lmdb.zip from the LSUN mirrors "
                "and extract it under data_dir."
            )

    def setup_train(self) -> None:
        if self.train_data is not None:
            return
        cache = os.path.join(
            self.data_dir, f"{self.category}_{self.split}_decoded_{self.imgsize}.npy"
        )
        if self.cache_decoded and os.path.exists(cache):
            self.train_data = np.load(cache, mmap_mode="r")
            return
        ds = LSUNDataset(
            self.data_dir,
            classes=[f"{self.category}_{self.split}"]
            if self.category in SCENES
            else [self.category],
            transform=lambda img: resize_center_crop(img, self.imgsize),
        )
        n = len(ds) if self.limit is None else min(self.limit, len(ds))
        out = np.empty((n, self.imgsize, self.imgsize, 3), np.uint8)
        for i in range(n):
            out[i] = ds[i]
        if self.cache_decoded:
            np.save(cache, out)
            self.train_data = np.load(cache, mmap_mode="r")
        else:
            self.train_data = out

    def setup_test(self) -> None:
        self.setup_train()
        self.test_data = self.train_data

    def augment(self, rng: jax.Array, batch: jax.Array) -> jax.Array:
        if not self.horizontal_flip:
            return batch
        return random_horizontal_flip(rng, batch)
