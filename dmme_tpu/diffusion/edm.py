"""EDM — "Elucidating the Design Space of Diffusion-Based Generative Models"
(Karras et al. 2022, arXiv:2206.00364). Continuous-σ diffusion with the
preconditioned denoiser and the 2nd-order Heun sampler (paper Algorithm 2).

Capability beyond the reference (discrete DDPM/DDIM/IDDPM only). Same
framework conventions as the other algorithms: an immutable
``flax.struct`` pytree of hyperparameters, ``loss``/``loss_given`` for
training (injectable draws for golden tests), and ``generate`` as one
``lax.scan`` — weights resident, zero host round-trips. The denoiser
network is the SAME UNet as the discrete algorithms; it is conditioned on
``c_noise(σ)`` (a float) through the same sinusoidal time embedding.

Sampler cost: 2·steps − 1 network evaluations (Heun's correction is skipped
on the final σ→0 step via ``lax.cond``); ``order=1`` gives plain Euler at
``steps`` evaluations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

import dmme_tpu.equations as eq

ModelFn = Callable[..., jax.Array]


def _bcast(a: jax.Array, ndim: int) -> jax.Array:
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


@struct.dataclass
class EDM:
    """EDM training + Heun sampling over continuous noise levels.

    Defaults are the paper's Table 1 "EDM" column and Algorithm 2's
    deterministic setting (``s_churn=0``). Set ``s_churn > 0`` for the
    stochastic sampler (paper §4, Table 5).
    """

    sigmas: jax.Array                   # (steps+1,) Karras grid, last = 0
    sigma_data: float = struct.field(pytree_node=False, default=0.5)
    #: grid-shape exponent, kept so the grid can be rebuilt at a different
    #: step count with the SAME σ range (diffusion/factory.py)
    rho: float = struct.field(pytree_node=False, default=7.0)
    p_mean: float = struct.field(pytree_node=False, default=-1.2)
    p_std: float = struct.field(pytree_node=False, default=1.2)
    steps: int = struct.field(pytree_node=False, default=18)
    order: int = struct.field(pytree_node=False, default=2)
    s_churn: float = struct.field(pytree_node=False, default=0.0)
    s_min: float = struct.field(pytree_node=False, default=0.0)
    s_max: float = struct.field(pytree_node=False, default=float("inf"))
    s_noise: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def create(
        cls,
        steps: int = 18,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        sigma_data: float = 0.5,
        p_mean: float = -1.2,
        p_std: float = 1.2,
        order: int = 2,
        s_churn: float = 0.0,
        s_min: float = 0.0,
        s_max: float = float("inf"),
        s_noise: float = 1.0,
    ) -> "EDM":
        assert order in (1, 2), order
        return cls(
            sigmas=eq.edm.karras_sigmas(steps, sigma_min, sigma_max, rho),
            sigma_data=sigma_data,
            rho=rho,
            p_mean=p_mean,
            p_std=p_std,
            steps=steps,
            order=order,
            s_churn=s_churn,
            s_min=s_min,
            s_max=s_max,
            s_noise=s_noise,
        )

    # --------------------------------------------------------------- denoiser
    def denoise(
        self,
        model_fn: ModelFn,
        params: Any,
        x: jax.Array,
        sigma: jax.Array,
        *,
        train: bool = False,
        rngs=None,
    ) -> jax.Array:
        """D_θ(x; σ) = c_skip·x + c_out·F_θ(c_in·x, c_noise) — the
        preconditioned denoiser (paper eq. 7). ``sigma`` is scalar or (N,)."""
        sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (x.shape[0],))
        c = eq.edm.precond(sigma, self.sigma_data)
        f = model_fn(
            params, _bcast(c.c_in, x.ndim) * x, c.c_noise, train=train, rngs=rngs
        ).astype(x.dtype)
        return _bcast(c.c_skip, x.ndim) * x + _bcast(c.c_out, x.ndim) * f

    # ------------------------------------------------------------------ train
    def loss(
        self,
        model_fn: ModelFn,
        params: Any,
        rng: jax.Array,
        x_0: jax.Array,
        *,
        train: bool = True,
    ) -> jax.Array:
        """E[λ(σ)·‖D(x₀+n; σ) − x₀‖²], ln σ ~ N(P_mean, P_std²) (paper eq. 8)."""
        s_key, n_key, d_key = jax.random.split(rng, 3)
        sigma = eq.edm.sample_sigma_lognormal(
            s_key, x_0.shape[0], self.p_mean, self.p_std
        )
        noise = jax.random.normal(n_key, x_0.shape, x_0.dtype)
        return self.loss_given(
            model_fn, params, x_0, sigma, noise, train=train, dropout_rng=d_key
        )

    def loss_given(
        self,
        model_fn: ModelFn,
        params: Any,
        x_0: jax.Array,
        sigma: jax.Array,
        noise: jax.Array,
        *,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """EDM loss with *injected* σ and unit noise — deterministic core of
        :meth:`loss` for golden/parity tests (same pattern as DDPM.loss_given)."""
        x_sig = x_0 + _bcast(sigma, x_0.ndim) * noise
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        d = self.denoise(model_fn, params, x_sig, sigma, train=train, rngs=rngs)
        w = _bcast(eq.edm.loss_weight(sigma, self.sigma_data), x_0.ndim)
        return jnp.mean(w * jnp.square(d - x_0.astype(d.dtype)))

    # ----------------------------------------------------------------- sample
    def sampling_step(
        self,
        model_fn: ModelFn,
        params: Any,
        x: jax.Array,
        i: jax.Array,
        rng: jax.Array,
    ) -> jax.Array:
        """One Heun step σ_i → σ_{i+1} (paper Algorithm 2, lines 3-9),
        with the churn perturbation when ``s_churn > 0`` (lines 4-6)."""
        sig = self.sigmas[i]
        sig_next = self.sigmas[i + 1]

        gamma = jnp.where(
            (sig >= self.s_min) & (sig <= self.s_max),
            jnp.minimum(self.s_churn / self.steps, jnp.sqrt(2.0) - 1.0),
            0.0,
        )
        sig_hat = sig * (1.0 + gamma)
        eps = self.s_noise * jax.random.normal(rng, x.shape, jnp.float32)
        x_hat = x + jnp.sqrt(jnp.maximum(sig_hat**2 - sig**2, 0.0)) * eps

        d = (x_hat - self.denoise(model_fn, params, x_hat, sig_hat)) / sig_hat
        x_euler = x_hat + (sig_next - sig_hat) * d

        if self.order == 1:
            return x_euler

        def heun(x_e):
            d2 = (x_e - self.denoise(model_fn, params, x_e, sig_next)) / jnp.maximum(
                sig_next, 1e-38
            )
            return x_hat + (sig_next - sig_hat) * 0.5 * (d + d2)

        # final step (σ_next == 0): first-order only — D(x; 0) is outside the
        # trained σ range and d2 would divide by zero
        return jax.lax.cond(sig_next > 0.0, heun, lambda x_e: x_e, x_euler)

    def generate(
        self,
        model_fn: ModelFn,
        params: Any,
        rng: jax.Array,
        img_shape: Tuple[int, ...],
        *,
        history_length: Optional[int] = None,
    ):
        """x ~ N(0, σ_max² I) → x₀ in one ``lax.scan`` over the σ grid.

        Same history-capture contract as DDPM.generate (evenly spaced frames
        incl. the final x₀) so the GenerateImage callback works unchanged.
        """
        x_key, scan_key = jax.random.split(rng)
        x = self.sigmas[0] * jax.random.normal(x_key, img_shape, jnp.float32)
        idxs = jnp.arange(self.steps, dtype=jnp.int32)

        from dmme_tpu.diffusion.ddpm import capture_frame, make_history_capture

        capture, history0 = make_history_capture(
            self.steps, history_length, img_shape
        )

        def body(carry, i):
            x = carry if capture is None else carry[0]
            step_key = jax.random.fold_in(scan_key, i)
            x = self.sampling_step(model_fn, params, x, i, step_key)
            if capture is None:
                return x, None
            _, hist = carry
            hist = capture_frame(capture, hist, i, x)
            return (x, hist), None

        if capture is None:
            x0, _ = jax.lax.scan(body, x, idxs)
            return x0
        (x0, history), _ = jax.lax.scan(body, (x, history0), idxs)
        return x0, history
