"""Procedural shapes dataset — structured data generated in-process.

Purpose: *proof of learning* on a box with no network egress and no real
dataset on disk. ``CIFAR10(synthetic=True)`` fabricates uniform noise,
which a diffusion model cannot visibly learn; this module renders a
seeded, genuinely structured distribution — one anti-aliased disc or
square of a random palette color on a dark background — so that

* the training loss falls well below the noise floor of an unstructured
  dataset (the model can predict ε better where pixels are correlated);
* sample grids from a trained checkpoint visibly converge to "one bright
  shape on a dark field" — evidence a reader can SEE, not infer;
* relative FID (even with random-weight features) separates an early
  checkpoint from a late one.

Fills the role of the reference's CIFAR-10 datamodule
(src/dmme/data_modules/cifar10.py) in the on-TPU demonstration runs
(docs/training_demo.md). Deterministic: same seed → same dataset, on any
host. Rendering is fully vectorized numpy (50k images in ~1s).
"""

from __future__ import annotations

import numpy as np

from dmme_tpu.data.data_module import DataModule, random_horizontal_flip

# bright foreground palette / dark background palette (uint8 RGB)
_FG = np.array(
    [
        [231, 76, 60],   # red
        [46, 204, 113],  # green
        [52, 152, 219],  # blue
        [241, 196, 15],  # yellow
        [155, 89, 182],  # purple
        [230, 126, 34],  # orange
        [26, 188, 156],  # teal
        [236, 240, 241], # white
    ],
    dtype=np.float32,
)
_BG = np.array(
    [[25, 28, 36], [40, 30, 30], [28, 38, 30], [35, 35, 25]],
    dtype=np.float32,
)


def render_shapes(
    n: int, img_size: int = 32, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """(images uint8 (n, s, s, 3), labels int32 (n,)) — label 0 = disc,
    1 = square. Vectorized anti-aliased rendering."""
    rng = np.random.default_rng(seed)
    s = img_size
    # all randoms drawn up front (cheap, O(n)) so the dataset bytes for a
    # given seed are independent of the render chunking below
    shape_kind = rng.integers(0, 2, n).astype(np.int32)
    fg = _FG[rng.integers(0, len(_FG), n)]          # (n, 3)
    bg = _BG[rng.integers(0, len(_BG), n)]          # (n, 3)
    cx = rng.uniform(s * 0.3, s * 0.7, n).astype(np.float32)
    cy = rng.uniform(s * 0.3, s * 0.7, n).astype(np.float32)
    r = rng.uniform(s * 0.12, s * 0.3, n).astype(np.float32)

    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)  # (s, s)
    out = np.empty((n, s, s, 3), np.uint8)
    # chunked rendering: the (chunk, s, s) float32 temporaries dominate peak
    # host RAM (~0.25 MB/image at 256px, ×7 temporaries) — cap them so big
    # images (the 256px demo) don't need several GB transient
    chunk = max(1, min(n, (1 << 26) // (s * s * 4)))  # ~64 MB per temp
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        dx = xx[None] - cx[lo:hi, None, None]       # (chunk, s, s)
        dy = yy[None] - cy[lo:hi, None, None]
        dist_disc = np.sqrt(dx * dx + dy * dy)
        dist_square = np.maximum(np.abs(dx), np.abs(dy))
        dist = np.where(
            shape_kind[lo:hi, None, None] == 0, dist_disc, dist_square
        )
        # 1px anti-aliased edge
        alpha = np.clip(r[lo:hi, None, None] + 0.5 - dist, 0.0, 1.0)[..., None]
        img = (
            bg[lo:hi, None, None, :] * (1 - alpha)
            + fg[lo:hi, None, None, :] * alpha
        )
        out[lo:hi] = np.clip(img, 0, 255).astype(np.uint8)
    return out, shape_kind


class Shapes(DataModule):
    """Procedural discs-and-squares datamodule (structured, egress-free)."""

    img_size = 32

    def __init__(
        self,
        size: int = 50_000,
        batch_size: int = 128,
        img_size: int = 32,
        seed: int = 0,
        horizontal_flip: bool = True,
        with_labels: bool = False,
    ):
        super().__init__(batch_size)
        self.size = size
        self.img_size = img_size
        self.seed = seed
        self.horizontal_flip = horizontal_flip
        self.with_labels = with_labels

    def setup_train(self) -> None:
        if self.train_data is None:
            images, labels = render_shapes(self.size, self.img_size, self.seed)
            self.train_data = images
            if self.with_labels:
                self.train_labels = labels

    def setup_test(self) -> None:
        # Reference parity: test stage reuses the train set without augs
        # (src/dmme/data_modules/data_module.py:38-39).
        self.setup_train()
        self.test_data = self.train_data
        self.test_labels = self.train_labels

    def augment(self, rng, batch):
        if not self.horizontal_flip:
            return batch
        return random_horizontal_flip(rng, batch)
