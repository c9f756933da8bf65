"""Encoder-reuse fast sampling (opt-in, approximate).

Implements the observation of "Faster Diffusion: Rethinking the Role of the
UNet Encoder" (Li et al., arXiv:2312.09608; retrieved in PAPERS.md): along
the reverse trajectory the UNet's *encoder* features change slowly, while
the decoder drives the denoising. At non-key steps the down path is skipped
entirely and the decoder runs on the most recent key step's encoder state
with the CURRENT timestep embedding.

This is an approximation — outputs differ from exact DDIM (quality is
reported close in the paper); ``refresh_interval=1`` is exactly canonical
DDIM (tested). It is a capability beyond the reference and is NOT used for
the DDIM-50 headline benchmark.

Works with ``dmme_tpu.models.unet.UNet`` (the module itself, not a bare
``model_fn``, since it needs the feature-capture API).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dmme_tpu.diffusion.ddim import DDIM
from dmme_tpu.diffusion.ddpm import _bcast
import dmme_tpu.equations as eq


@struct.dataclass
class CachedDDIM(DDIM):
    """Deterministic DDIM whose sampler refreshes encoder features every
    ``refresh_interval`` steps and decodes-only in between."""

    refresh_interval: int = struct.field(pytree_node=False, default=2)

    @classmethod
    def create(cls, timesteps: int = 1000, sub_timesteps: int = 50,
               tau_schedule: str = "quadratic", refresh_interval: int = 2,
               parameterization: str = "eps") -> "CachedDDIM":
        base = DDIM.create(timesteps, sub_timesteps, tau_schedule,
                           variant="canonical", parameterization=parameterization)
        return cls(
            schedule=base.schedule, timesteps=timesteps, tau=base.tau,
            sub_timesteps=base.sub_timesteps, eta=0.0, variant="canonical",
            refresh_interval=refresh_interval, parameterization=parameterization,
        )

    def generate(self, module, params, rng: jax.Array, img_shape: Tuple[int, ...]):
        """x_T → x_0; one jitted scan; encoder runs only on key steps."""
        x = jax.random.normal(rng, img_shape, jnp.float32)
        iis = jnp.arange(self.sub_timesteps, 0, -1, dtype=jnp.int32)

        def tau_of(i):
            i = jnp.broadcast_to(jnp.asarray(i, jnp.int32), (img_shape[0],))
            return i, self.tau[i], self.tau[i - 1]

        # initialize the cache structure from the first (key) step's shapes
        i0, tau_i0, _ = tau_of(self.sub_timesteps)
        cache0 = jax.eval_shape(
            lambda p, xx, tt: module.apply(p, xx, tt, return_features=True)[1],
            params, x, tau_i0,
        )
        cache0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cache0)

        def update(x, out, tau_i, tau_prev):
            ab_t = _bcast(self.schedule.alpha_bar[tau_i], x.ndim)
            ab_prev = _bcast(self.schedule.alpha_bar[tau_prev], x.ndim)
            eps = self.clipped_eps(x, ab_t, self.to_eps(out, x, ab_t))
            p = eq.ddim.reverse_process_canonical(x, ab_t, ab_prev, eps, 0.0)
            return p.mean

        def body(carry, i):
            x, cache = carry
            _, tau_i, tau_prev = tau_of(i)
            k = self.sub_timesteps - i  # 0-based step index; k==0 is first
            is_key = (k % self.refresh_interval) == 0

            def full(_):
                eps, new_cache = module.apply(
                    params, x, tau_i, return_features=True
                )
                return eps.astype(x.dtype), new_cache

            def reuse(_):
                eps = module.apply(params, x, tau_i, cached=cache)
                return eps.astype(x.dtype), cache

            eps, cache_out = jax.lax.cond(is_key, full, reuse, None)
            return (update(x, eps, tau_i, tau_prev), cache_out), None

        (x0, _), _ = jax.lax.scan(body, (x, cache0), iis)
        return x0
