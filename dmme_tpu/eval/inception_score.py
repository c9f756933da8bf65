"""Inception Score — streaming over classifier logits.

Counterpart of torchmetrics ``InceptionScore`` as the reference uses it:
``kl_mean, kl_std = inception.compute(); score = exp(kl_mean)``
(src/dmme/lit_modules/ddpm.py:117-125).

IS = exp(E_x KL(p(y|x) ‖ p(y))). The marginal p(y) needs all samples, so we
stream Σ p(y|x), Σ p log p, and count; everything else is closed-form at
``compute``. State is three small device buffers — mergeable via psum.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ISStats(NamedTuple):
    n: jax.Array            # ()
    prob_sum: jax.Array     # (K,)   Σ p(y|x)
    plogp_sum: jax.Array    # ()     Σ_x Σ_y p log p
    plogp_per: jax.Array    # running Σ of per-sample Σ_y p log p squared (for std)

    @classmethod
    def create(cls, num_classes: int) -> "ISStats":
        return cls(
            n=jnp.zeros(()),
            prob_sum=jnp.zeros((num_classes,)),
            plogp_sum=jnp.zeros(()),
            plogp_per=jnp.zeros(()),
        )


class InceptionScore:
    """``num_classes=None`` sizes the state lazily from the first logits
    batch — 1008 for the FID-standard Inception, 1000 for torchvision
    (matches whatever ``make_feature_fn`` variant is in use)."""

    def __init__(self, num_classes: Optional[int] = None):
        self.num_classes = num_classes
        self.stats = ISStats.create(num_classes) if num_classes else None
        self._update = jax.jit(self._update_impl)

    @staticmethod
    def _update_impl(stats: ISStats, logits: jax.Array) -> ISStats:
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        p = jnp.exp(logp)
        per = jnp.sum(p * logp, axis=-1)  # (N,) Σ_y p log p per sample
        return ISStats(
            n=stats.n + logits.shape[0],
            prob_sum=stats.prob_sum + p.sum(axis=0),
            plogp_sum=stats.plogp_sum + per.sum(),
            plogp_per=stats.plogp_per + jnp.sum(jnp.square(per)),
        )

    def update(self, logits: jax.Array) -> None:
        if self.stats is None:
            self.num_classes = int(logits.shape[-1])
            self.stats = ISStats.create(self.num_classes)
        self.stats = self._update(self.stats, logits)

    def compute(self) -> Tuple[float, float]:
        """Returns (kl_mean, kl_std); score = exp(kl_mean).

        KL(p(y|x) ‖ p̄) = Σ_y p log p − Σ_y p log p̄. The first term streams
        exactly; the cross term uses the final marginal, so mean is exact and
        std is approximated with the same marginal (matching torchmetrics'
        single-split default behavior up to its 10-split chunking).
        """
        if self.stats is None:
            raise RuntimeError(
                "InceptionScore.compute() before any update(): no logits "
                "were ever seen (empty test iterator? dataset smaller than "
                "batch_size drops the only batch)"
            )
        n = float(jax.device_get(self.stats.n))
        assert n > 0
        marginal = np.asarray(jax.device_get(self.stats.prob_sum), np.float64) / n
        log_marginal = np.log(np.clip(marginal, 1e-12, None))
        # E_x[Σ p log p] − Σ_y p̄_y log p̄_y-ish cross term:
        plogp_mean = float(jax.device_get(self.stats.plogp_sum)) / n
        cross = float(marginal @ log_marginal)
        kl_mean = plogp_mean - cross
        # variance of the entropy part only (cross term is common to all x)
        var = max(float(jax.device_get(self.stats.plogp_per)) / n - plogp_mean**2, 0.0)
        return kl_mean, float(np.sqrt(var))

    def score(self) -> float:
        kl_mean, _ = self.compute()
        return float(np.exp(kl_mean))

    def reset(self) -> None:
        self.stats = ISStats.create(self.num_classes) if self.num_classes else None
