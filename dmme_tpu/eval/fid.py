"""Fréchet Inception Distance — streaming statistics + closed form.

TPU-native counterpart of torchmetrics ``FrechetInceptionDistance`` as used
by the reference (src/dmme/lit_modules/ddpm.py:58-63,117-125). The
accumulator keeps only (n, Σx, ΣxxT) per distribution — O(d²) state that
lives on device, is exactly mergeable across hosts/devices (a ``psum`` over
the three buffers), and never stores features. The reference's
``reset_real_features=False`` behavior falls out naturally: real stats are
kept across ``reset`` calls unless explicitly cleared.

The matrix square root in the Fréchet formula is computed on host via
eigendecomposition of a symmetrized product (scipy-free, float64).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FeatureStats(NamedTuple):
    """Streaming first/second moments of feature vectors (d-dim)."""

    n: jax.Array          # ()     float64-ish count
    sum: jax.Array        # (d,)
    outer: jax.Array      # (d, d) sum of x xᵀ

    @classmethod
    def create(cls, dim: int, dtype=jnp.float32) -> "FeatureStats":
        return cls(
            n=jnp.zeros((), dtype),
            sum=jnp.zeros((dim,), dtype),
            outer=jnp.zeros((dim, dim), dtype),
        )

    def update(self, feats: jax.Array) -> "FeatureStats":
        """Add a batch of features, shape (N, d). Jittable; the xxᵀ is one
        (d×N)(N×d) matmul on the MXU."""
        feats = feats.astype(self.sum.dtype)
        return FeatureStats(
            n=self.n + feats.shape[0],
            sum=self.sum + feats.sum(axis=0),
            outer=self.outer + feats.T @ feats,
        )

    def merge(self, other: "FeatureStats") -> "FeatureStats":
        return FeatureStats(
            self.n + other.n, self.sum + other.sum, self.outer + other.outer
        )

    def moments(self) -> Tuple[np.ndarray, np.ndarray]:
        """(mean, unbiased covariance) in float64 on host."""
        n = float(jax.device_get(self.n))
        s = np.asarray(jax.device_get(self.sum), np.float64)
        o = np.asarray(jax.device_get(self.outer), np.float64)
        assert n > 1, "need at least 2 samples for covariance"
        mu = s / n
        cov = (o - n * np.outer(mu, mu)) / (n - 1)
        return mu, cov


def _sqrtm_product(c1: np.ndarray, c2: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """tr((C1 C2)^{1/2}) via the symmetric reformulation
    tr((S C2 S)^{1/2}) with S = C1^{1/2} — numerically stable with eigh."""
    w1, v1 = np.linalg.eigh(c1)
    s1 = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    m = s1 @ c2 @ s1
    w = np.linalg.eigvalsh((m + m.T) / 2)
    return float(np.sqrt(np.clip(w, 0, None)).sum())


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """FID = |μ1−μ2|² + tr(C1 + C2 − 2(C1 C2)^{1/2})."""
    diff = float(np.sum((mu1 - mu2) ** 2))
    return diff + float(np.trace(cov1) + np.trace(cov2)) - 2.0 * _sqrtm_product(cov1, cov2)


class FrechetInceptionDistance:
    """torchmetrics-shaped API over the streaming stats.

    ``update(feats, real=...)`` takes FEATURE batches (N, d) — feature
    extraction is the caller's concern (see ``dmme_tpu.eval.inception``),
    which keeps this metric device- and model-agnostic.
    """

    def __init__(self, dim: int = 2048, reset_real_features: bool = False):
        self.dim = dim
        self.reset_real_features = reset_real_features
        self.real = FeatureStats.create(dim)
        self.fake = FeatureStats.create(dim)
        self._real_override: "Tuple[np.ndarray, np.ndarray] | None" = None
        self._update = jax.jit(lambda s, f: s.update(f))

    # ------------------------------------------------- precomputed real stats
    def save_real_stats(self, path: str) -> None:
        """Persist the real distribution's (μ, Σ) in the pytorch-fid ``.npz``
        convention (keys ``mu``/``sigma``) so later runs skip the real pass."""
        mu, cov = self.real.moments()
        np.savez(path, mu=mu, sigma=cov)

    def load_real_stats(self, path: str) -> None:
        """Use precomputed real (μ, Σ) — accepts pytorch-fid stats files
        (e.g. the published fid_stats_cifar10_train.npz) or our own saves."""
        d = np.load(path)
        self._real_override = (
            np.asarray(d["mu"], np.float64),
            np.asarray(d["sigma"], np.float64),
        )

    def update(self, feats: jax.Array, real: bool) -> None:
        if real:
            self.real = self._update(self.real, feats)
        else:
            self.fake = self._update(self.fake, feats)

    def merge_across(self, axis_name: str):  # pragma: no cover - multihost
        """Inside pmap/shard_map: psum the stats pytrees across devices."""
        self.real = jax.lax.psum(self.real, axis_name)
        self.fake = jax.lax.psum(self.fake, axis_name)

    def compute(self) -> float:
        if self._real_override is not None:
            mu_r, cov_r = self._real_override
        else:
            mu_r, cov_r = self.real.moments()
        mu_f, cov_f = self.fake.moments()
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)

    def reset(self) -> None:
        self.fake = FeatureStats.create(self.dim)
        if self.reset_real_features:
            self.real = FeatureStats.create(self.dim)
