"""Data-module base — host loads raw bytes, the device does the math.

TPU-native counterpart of the reference's Lightning ``DataModule``
(src/dmme/data_modules/data_module.py:26-69). The reference spins up
``cpu_count()`` DataLoader workers that decode, augment, and normalize on
the host. Feeding a TPU from a thin host inverts that split:

* the host only shuffles indices and slices uint8 arrays (zero-copy views
  where possible) — an order of magnitude cheaper than per-sample transforms;
* augmentation (:meth:`augment`) and normalization (:meth:`process`) are
  jnp functions executed INSIDE the jitted train step, fused with the model;
* batches are handed to jax asynchronously (dispatch is non-blocking), so
  host slicing overlaps device compute.

Reference semantics kept: ``setup("fit")``/``setup("test")`` map to
``setup_train``/``setup_test``; the test stage reuses the train set without
augmentations (src/dmme/data_modules/data_module.py:34-39).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dmme_tpu.utils.norm import norm


class DataModule:
    """Base class; subclasses populate ``self.train_data`` / ``self.test_data``
    as uint8 NHWC numpy arrays in :meth:`setup_train` / :meth:`setup_test`."""

    #: image side length, knowable WITHOUT loading the dataset (lets
    #: ``sample`` run from a checkpoint on a box that has no training data)
    img_size: Optional[int] = None

    def __init__(self, batch_size: int = 128):
        self.batch_size = batch_size
        self.train_data: Optional[np.ndarray] = None
        self.test_data: Optional[np.ndarray] = None
        # optional labels (e.g. classifier training); when set, iterators
        # yield (images, labels) tuples
        self.train_labels: Optional[np.ndarray] = None
        self.test_labels: Optional[np.ndarray] = None

    # -------------------------------------------------------------- lifecycle
    def prepare_data(self) -> None:
        """One-time host-side preparation (download/unpack). No-op by default:
        this environment has no network egress — datasets must be on disk."""

    def setup(self, stage: str) -> None:
        if stage in ("fit", "train"):
            self.setup_train()
        elif stage == "test":
            self.setup_test()
        else:
            raise ValueError(f"unknown stage: {stage}")

    def setup_train(self) -> None:
        raise NotImplementedError

    def setup_test(self) -> None:
        raise NotImplementedError

    # ------------------------------------------------------------- iteration
    def train_iter(
        self,
        seed: int = 0,
        *,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        skip_batches: int = 0,
    ) -> Iterator[np.ndarray]:
        """Infinite shuffled uint8 batches (host-side index shuffle only).

        Multi-host: with ``process_index``/``process_count`` set, every host
        draws the SAME global permutation (same seed) and yields its
        ``batch_size/process_count`` slice of each global batch — the local
        shard that :func:`dmme_tpu.parallel.global_batch` assembles into one
        globally-sharded array. ``batch_size`` stays the GLOBAL batch size,
        matching the single-process recipe exactly.

        ``skip_batches`` fast-forwards the stream (resume determinism)
        WITHOUT touching the data — only the permutation stream advances.
        """
        assert self.train_data is not None, "call setup('fit') first"
        data = self.train_data
        n = data.shape[0]
        rng = np.random.default_rng(seed)
        labels = self.train_labels
        lo, hi = 0, self.batch_size
        if process_count is not None and process_count > 1:
            assert self.batch_size % process_count == 0, (
                f"global batch {self.batch_size} not divisible by "
                f"{process_count} processes"
            )
            local = self.batch_size // process_count
            lo, hi = process_index * local, (process_index + 1) * local
        to_skip = skip_batches
        while True:
            perm = rng.permutation(n)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                if to_skip > 0:
                    to_skip -= 1
                    continue
                idx = perm[i : i + self.batch_size][lo:hi]
                if labels is None:
                    yield data[idx]
                else:
                    yield data[idx], labels[idx]

    def test_iter(self) -> Iterator[np.ndarray]:
        """One sequential pass over the test split (no shuffle, no augs)."""
        assert self.test_data is not None, "call setup('test') first"
        data = self.test_data
        labels = self.test_labels
        for i in range(0, data.shape[0] - self.batch_size + 1, self.batch_size):
            if labels is None:
                yield data[i : i + self.batch_size]
            else:
                yield data[i : i + self.batch_size], labels[i : i + self.batch_size]

    # ------------------------------------------------------- device-side math
    def process(self, batch: jax.Array) -> jax.Array:
        """uint8 [0,255] → float32 [−1,1] (reference transform chain
        ToTensor + ``dmme.norm``, src/dmme/data_modules/cifar10.py:39-44)."""
        return norm(batch.astype(jnp.float32) / 255.0)

    def augment(self, rng: jax.Array, batch: jax.Array) -> jax.Array:
        """Train-time augmentation, inside jit. Default: identity."""
        return batch

    def train_transform(self, rng: jax.Array, batch: jax.Array) -> jax.Array:
        return self.process(self.augment(rng, batch))


def random_horizontal_flip(rng: jax.Array, batch: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-sample horizontal flip (torchvision RandomHorizontalFlip parity),
    as a branchless where over the W-reversed batch — fuses on the VPU."""
    flip = jax.random.bernoulli(rng, p, (batch.shape[0],) + (1,) * (batch.ndim - 1))
    return jnp.where(flip, batch[:, :, ::-1, :], batch)
