"""A minimal diagonal-Gaussian value type for the equations layer.

The reference's equations return ``torch.distributions.Normal`` objects
(reference: src/dmme/equations/ddpm/ddpm.py:24-72). The TPU-native analogue is
a tiny immutable pytree carrying ``(mean, std)`` plus pure methods — cheap to
construct inside ``jit``/``scan``, no dispatch machinery, and every operation
maps directly onto fused XLA elementwise ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * log(2 * pi)


class Gaussian(NamedTuple):
    """Diagonal Gaussian ``N(mean, std**2)`` as an immutable pytree."""

    mean: jax.Array
    std: jax.Array

    @property
    def variance(self) -> jax.Array:
        return jnp.square(self.std)

    def sample(self, key: jax.Array) -> jax.Array:
        """Reparameterized sample (differentiable w.r.t. mean/std)."""
        eps = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * eps

    def cdf(self, x: jax.Array) -> jax.Array:
        z = (x - self.mean) / self.std
        return 0.5 * (1.0 + jax.lax.erf(z / jnp.sqrt(2.0).astype(z.dtype)))

    def log_prob(self, x: jax.Array) -> jax.Array:
        z = (x - self.mean) / self.std
        return -0.5 * jnp.square(z) - jnp.log(self.std) - _HALF_LOG_2PI


def kl_divergence(q: Gaussian, p: Gaussian) -> jax.Array:
    """Elementwise ``KL(q || p)`` between diagonal Gaussians.

    Same closed form torch uses for ``kl_divergence(Normal, Normal)``
    (reference call site: src/dmme/equations/iddpm/losses.py:83).
    """
    var_ratio = jnp.square(q.std / p.std)
    t1 = jnp.square((q.mean - p.mean) / p.std)
    # log(var_ratio) computed from the stds, NOT from the ratio: when the
    # stds are many decades apart (IDDPM's learned variance spans e^±60 at
    # t==1 where beta_tilde == 0) the squared ratio underflows to exactly 0
    # and log(0) = -inf poisons the backward pass of the where-masked
    # branch with 0*inf = NaN (measured: T=5 hybrid training NaN'd at
    # step 2). log-of-std is finite whenever the stds themselves are.
    log_ratio = 2.0 * (jnp.log(q.std) - jnp.log(p.std))
    return 0.5 * (var_ratio + t1 - 1.0 - log_ratio)
