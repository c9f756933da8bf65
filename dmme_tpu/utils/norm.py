"""Image range normalization (reference: src/dmme/common/norm.py:4-11)."""

import jax.numpy as jnp


def norm(x):
    """Linearly map ``[0, 1]`` to ``[-1, 1]``."""
    return (x - 0.5) * 2.0


def denorm(x):
    """Inverse of :func:`norm` with clipping back to ``[0, 1]``."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
