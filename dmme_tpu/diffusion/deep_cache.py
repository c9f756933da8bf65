"""DeepCache-style fast sampling (opt-in, approximate).

Implements the idea of "DeepCache: Accelerating Diffusion Models for Free"
(Ma et al. 2023) / block caching ("Cache Me if You Can", Wimbauer et al.
2023, retrieved in PAPERS.md): along the reverse trajectory the UNet's
DEEP features change slowly while the shallow (high-resolution) layers
drive the per-step refinement. At non-key steps the entire deep core —
down-path suffix, middle, up-path prefix below ``cache_depth`` — is
replaced by the most recent key step's cached deep output, and only the
shallow layers run with the CURRENT timestep embedding.

Complementary to :class:`CachedDDIM` (encoder reuse, diffusion/fast.py):
that caches the DOWN path and recomputes the decoder; this caches the deep
CORE and recomputes the shallow encoder+decoder. Which wins depends on
where the parameters sit — for the CIFAR UNet (ch 128,256,256,256, most
blocks at depths ≥ 2) the deep core carries ~19 of 23 ResBlocks, so the
non-key step cost is roughly the 4 shallow blocks + in/out convs.

``refresh_interval=1`` is exactly canonical DDIM (tested). Like CachedDDIM
this is an approximation — outputs differ from exact DDIM.

Works with ``dmme_tpu.models.unet.UNet`` (needs the deep-cache call API,
not a bare model_fn).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

import dmme_tpu.equations as eq
from dmme_tpu.diffusion.ddim import DDIM
from dmme_tpu.diffusion.ddpm import _bcast
from dmme_tpu.diffusion.dpm_solver import DPMSolverPP


@struct.dataclass
class DeepCachedDDIM(DDIM):
    """Deterministic DDIM that refreshes the UNet's deep core every
    ``refresh_interval`` steps and reuses it in between."""

    refresh_interval: int = struct.field(pytree_node=False, default=2)
    cache_depth: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, timesteps: int = 1000, sub_timesteps: int = 50,
               tau_schedule: str = "quadratic", refresh_interval: int = 2,
               cache_depth: int = 1,
               parameterization: str = "eps") -> "DeepCachedDDIM":
        base = DDIM.create(timesteps, sub_timesteps, tau_schedule,
                           variant="canonical", parameterization=parameterization)
        return cls(
            schedule=base.schedule, timesteps=timesteps, tau=base.tau,
            sub_timesteps=base.sub_timesteps, eta=0.0, variant="canonical",
            parameterization=base.parameterization,
            refresh_interval=refresh_interval, cache_depth=cache_depth,
        )

    def generate(self, module, params, rng: jax.Array, img_shape: Tuple[int, ...]):
        """x_T → x_0; one jitted scan; the deep core runs on key steps only."""
        x = jax.random.normal(rng, img_shape, jnp.float32)
        iis = jnp.arange(self.sub_timesteps, 0, -1, dtype=jnp.int32)

        def tau_of(i):
            i = jnp.broadcast_to(jnp.asarray(i, jnp.int32), (img_shape[0],))
            return self.tau[i], self.tau[i - 1]

        # cache structure from the first (key) step's shapes
        tau_i0, _ = tau_of(self.sub_timesteps)
        deep0 = jax.eval_shape(
            lambda p, xx, tt: module.apply(
                p, xx, tt, cache_depth=self.cache_depth, return_deep=True
            )[1],
            params, x, tau_i0,
        )
        deep0 = jnp.zeros(deep0.shape, deep0.dtype)

        def update(x, out, tau_i, tau_prev):
            ab_t = _bcast(self.schedule.alpha_bar[tau_i], x.ndim)
            ab_prev = _bcast(self.schedule.alpha_bar[tau_prev], x.ndim)
            eps = self.clipped_eps(x, ab_t, self.to_eps(out.astype(x.dtype), x, ab_t))
            return eq.ddim.reverse_process_canonical(x, ab_t, ab_prev, eps, 0.0).mean

        def body(carry, i):
            x, deep = carry
            tau_i, tau_prev = tau_of(i)
            k = self.sub_timesteps - i  # 0-based step index; k==0 first
            is_key = (k % self.refresh_interval) == 0

            def full(_):
                out, new_deep = module.apply(
                    params, x, tau_i,
                    cache_depth=self.cache_depth, return_deep=True,
                )
                return out, new_deep

            def reuse(_):
                out = module.apply(
                    params, x, tau_i,
                    cache_depth=self.cache_depth, deep_cache=deep,
                )
                return out, deep

            out, deep_out = jax.lax.cond(is_key, full, reuse, None)
            return (update(x, out, tau_i, tau_prev), deep_out), None

        (x0, _), _ = jax.lax.scan(body, (x, deep0), iis)
        return x0


@struct.dataclass
class DeepCachedDPM(DPMSolverPP):
    """DPM-Solver++(2M) with DeepCache: the two fastest sampling paths
    composed. The solver already reaches DDIM-50 quality in ~20 NFE; the
    deep-core cache then halves the cost of the remaining evaluations
    (non-key steps run only the shallow layers above ``cache_depth``).

    ``refresh_interval=1`` is exactly :class:`DPMSolverPP` (tested).
    Same module-call API requirement as :class:`DeepCachedDDIM`."""

    refresh_interval: int = struct.field(pytree_node=False, default=2)
    cache_depth: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, timesteps: int = 1000, sub_timesteps: int = 20,
               tau_schedule: str = "quadratic", refresh_interval: int = 2,
               cache_depth: int = 1, order: int = 2,
               schedule=None,
               parameterization: str = "eps") -> "DeepCachedDPM":
        base = DPMSolverPP.create(
            timesteps, sub_timesteps, tau_schedule, order=order,
            schedule=schedule, parameterization=parameterization,
        )
        return cls(
            schedule=base.schedule, tau=base.tau, timesteps=timesteps,
            sub_timesteps=base.sub_timesteps, order=base.order,
            parameterization=base.parameterization, clip_x0=base.clip_x0,
            refresh_interval=refresh_interval, cache_depth=cache_depth,
        )

    def generate(self, module, params, rng: jax.Array, img_shape: Tuple[int, ...]):
        """x_T → x_0 with the 2M multistep update; the deep core runs on
        key steps only. Mirrors :meth:`DPMSolverPP.generate` exactly
        (same rng split, same lower-order guards) so interval 1 is the
        canonical solver."""
        x_key, _ = jax.random.split(rng)
        x_t = jax.random.normal(x_key, img_shape, jnp.float32)
        idxs = jnp.arange(self.sub_timesteps, 0, -1, dtype=jnp.int32)

        t0 = jnp.broadcast_to(self.tau[self.sub_timesteps], (img_shape[0],))
        deep0 = jax.eval_shape(
            lambda p, xx, tt: module.apply(
                p, xx, tt, cache_depth=self.cache_depth, return_deep=True
            )[1],
            params, x_t, t0,
        )
        deep0 = jnp.zeros(deep0.shape, deep0.dtype)

        def body(carry, i):
            x, prev_x0, prev_h, deep = carry
            t = self.tau[i]
            t_prev = self.tau[i - 1]
            a_t, s_t, lam_t = self._coeffs(t)
            a_p, s_p, lam_p = self._coeffs(t_prev)

            t_vec = jnp.broadcast_to(t, (x.shape[0],))
            k = self.sub_timesteps - i  # 0-based step index; k==0 first
            is_key = (k % self.refresh_interval) == 0

            def full(_):
                out, new_deep = module.apply(
                    params, x, t_vec,
                    cache_depth=self.cache_depth, return_deep=True,
                )
                return out, new_deep

            def reuse(_):
                out = module.apply(
                    params, x, t_vec,
                    cache_depth=self.cache_depth, deep_cache=deep,
                )
                return out, deep

            out, deep_out = jax.lax.cond(is_key, full, reuse, None)
            out = out.astype(jnp.float32)
            if self.parameterization == "v":
                out = eq.ddpm.eps_from_v(out, x, jnp.square(a_t))
            x0 = (x - s_t * out) / a_t
            if self.clip_x0:
                x0 = jnp.clip(x0, -1.0, 1.0)

            h = lam_p - lam_t
            ratio = jnp.exp(-h)
            first = (s_p / s_t) * x - a_p * (ratio - 1.0) * x0

            if self.order == 1:
                new_x = first
            else:
                r = prev_h / h
                c = 1.0 / (2.0 * jnp.maximum(r, 1e-38))
                d = (1.0 + c) * x0 - c * prev_x0
                second = (s_p / s_t) * x - a_p * (ratio - 1.0) * d
                use_first = (prev_h == 0.0) | (t_prev == 0)
                new_x = jnp.where(use_first, first, second)
            # degenerate repeated-τ entry: identity step (see
            # dpm_solver.py — s_p/s_t is 0/0 when t == t_prev)
            new_x = jnp.where(t == t_prev, x, new_x)

            return (new_x, x0, h, deep_out), None

        init = (x_t, jnp.zeros_like(x_t), jnp.float32(0.0), deep0)
        (x_0, _, _, _), _ = jax.lax.scan(body, init, idxs)
        return x_0
