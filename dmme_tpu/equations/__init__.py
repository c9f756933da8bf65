"""Pure-function equations layer (reference: src/dmme/equations/__init__.py).

Namespaced as ``eq.ddpm.*``, ``eq.ddim.*``, ``eq.iddpm.*`` — every function is
a pure map from arrays to arrays (or :class:`Gaussian` pytrees), traceable
under ``jit``/``scan``/``grad`` with no hidden state.
"""

from dmme_tpu.equations import ddpm
from dmme_tpu.equations import ddim
from dmme_tpu.equations import edm
from dmme_tpu.equations import flow
from dmme_tpu.equations import iddpm
from dmme_tpu.equations.gaussian import Gaussian, kl_divergence

__all__ = ["ddpm", "ddim", "edm", "flow", "iddpm", "Gaussian", "kl_divergence"]
