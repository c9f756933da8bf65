"""DDPM algorithm — schedule pytree + pure train/sample functions.

TPU-native counterpart of reference src/dmme/diffusion_models/ddpm.py. The
reference is a stateful ``nn.Module`` holding buffers and a tqdm Python loop
over 1000 sequential UNet calls (``generate``, :113-133). Here the algorithm
is an immutable pytree of schedule constants (resident in HBM, gathered
per-step) and every step is a pure function:

* :meth:`loss` — the training objective, differentiable w.r.t. params.
* :meth:`sampling_step` — one reverse step, jittable.
* :meth:`generate` — the full reverse process as a single jitted
  ``lax.scan``: weights stay resident, schedule gathers are fused, and there
  are zero host round-trips for the entire trajectory.

Denoiser contract: ``model_fn(params, x, t, *, train=False, rngs=None)``
returning the network output for NHWC ``x`` and int32 ``t`` of shape (N,).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

import dmme_tpu.equations as eq
from dmme_tpu.equations.ddpm import Schedule


ModelFn = Callable[..., jax.Array]


def _bcast(a: jax.Array, ndim: int) -> jax.Array:
    """Reshape a (N,)-vector of per-sample constants to broadcast over NHWC."""
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def make_history_capture(n_steps: int, history_length, img_shape):
    """Shared on-device trajectory-capture state for every sampler's
    ``history_length`` contract: ``history_length`` evenly-spaced frames
    (always including the final x₀) written into a preallocated buffer.

    Returns ``(capture, history0)`` — ``(None, None)`` when capture is off.
    """
    if history_length is None:
        return None, None
    idx = jnp.linspace(0, n_steps - 1, history_length).round().astype(jnp.int32)
    want = jnp.zeros((n_steps,), jnp.bool_).at[idx].set(True)
    slot = jnp.cumsum(want) - 1
    history0 = jnp.zeros((history_length,) + tuple(img_shape), jnp.float32)
    return (want, slot), history0


def capture_frame(capture, hist: jax.Array, k, x: jax.Array) -> jax.Array:
    """Write ``x`` into its slot if 0-based step index ``k`` is a capture
    point (no-op write of the existing frame otherwise — scan-friendly)."""
    want, slot = capture
    frame = jnp.where(want[k], x, hist[slot[k]])
    return jax.lax.dynamic_update_slice(
        hist, frame[None], (slot[k],) + (0,) * x.ndim
    )


@struct.dataclass
class DDPM:
    """Denoising Diffusion Probabilistic Model (Ho et al. 2020).

    Fields are the precomputed schedule arrays, shape ``(T+1,)`` with the
    1-based indexing convention (index 0 is a sentinel; SURVEY.md §1).
    """

    schedule: Schedule
    timesteps: int = struct.field(pytree_node=False, default=1000)
    #: network output convention: "eps" (reference parity) or "v"
    #: (Salimans & Ho 2022 velocity — better-conditioned target at high ᾱ;
    #: every sampler converts back to ε via eq.ddpm.eps_from_v)
    parameterization: str = struct.field(pytree_node=False, default="eps")
    #: Min-SNR-γ loss weighting (Hang et al. 2023); None = uniform
    #: (reference parity). Typical γ = 5.0.
    snr_gamma: Optional[float] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        start: float = 0.0001,
        end: float = 0.02,
        parameterization: str = "eps",
        snr_gamma: Optional[float] = None,
    ) -> "DDPM":
        assert parameterization in ("eps", "v"), parameterization
        beta = eq.ddpm.linear_schedule(timesteps, start, end)
        return cls(
            schedule=eq.ddpm.schedule_from_beta(beta),
            timesteps=timesteps,
            parameterization=parameterization,
            snr_gamma=snr_gamma,
        )

    def to_eps(self, out: jax.Array, x_t: jax.Array, alpha_bar_t: jax.Array) -> jax.Array:
        """Map the network's output to ε under the active parameterization."""
        if self.parameterization == "v":
            return eq.ddpm.eps_from_v(out, x_t, alpha_bar_t)
        return out

    # ------------------------------------------------------------------ train
    def sample_timesteps(self, key: jax.Array, batch: int) -> jax.Array:
        """t ~ Uniform{1, …, T−1} — reference parity: T itself is never drawn
        (src/dmme/diffusion_models/ddpm.py:65-70, torch.randint exclusive top).
        """
        return jax.random.randint(key, (batch,), 1, self.timesteps, dtype=jnp.int32)

    def loss(
        self,
        model_fn: ModelFn,
        params: Any,
        rng: jax.Array,
        x_0: jax.Array,
        *,
        train: bool = True,
    ) -> jax.Array:
        """L_simple = E‖ε − ε_θ(x_t, t)‖² (reference training_step, :53-81).

        Samples ε explicitly and forms x_t = √ᾱ_t x_0 + √(1−ᾱ_t) ε — equal in
        distribution to the reference's rsample-then-recover dance
        (SURVEY.md §2 deviation 3) but one fused multiply-add on the VPU.
        """
        t_key, n_key, d_key = jax.random.split(rng, 3)
        n = x_0.shape[0]
        t = self.sample_timesteps(t_key, n)
        noise = jax.random.normal(n_key, x_0.shape, x_0.dtype)
        return self.loss_given(
            model_fn, params, x_0, t, noise, train=train, dropout_rng=d_key
        )

    def loss_given(
        self,
        model_fn: ModelFn,
        params: Any,
        x_0: jax.Array,
        t: jax.Array,
        noise: jax.Array,
        *,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """L_simple with *injected* t and ε — deterministic core of
        :meth:`loss`; lets parity tests drive the exact same draw through the
        reference torch step (tests/test_torch_parity.py)."""
        alpha_bar_t = _bcast(self.schedule.alpha_bar[t], x_0.ndim)
        x_t = eq.ddpm.q_sample(x_0, alpha_bar_t, noise)
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        out = model_fn(params, x_t, t, train=train, rngs=rngs)
        if self.parameterization == "v":
            target = eq.ddpm.v_target(x_0, alpha_bar_t, noise)
        else:
            target = noise
        if self.snr_gamma is None:
            return eq.ddpm.simple_loss(target, out.astype(x_0.dtype))
        w = eq.ddpm.min_snr_weight(
            alpha_bar_t, self.snr_gamma, self.parameterization
        )
        return jnp.mean(w * jnp.square(target - out.astype(x_0.dtype)))

    # ----------------------------------------------------------------- sample
    def sampling_step(
        self,
        model_fn: ModelFn,
        params: Any,
        x_t: jax.Array,
        t: jax.Array,
        rng: jax.Array,
    ) -> jax.Array:
        """One ancestral step x_t → x_{t−1} with fixed variance σ² = β_t.

        At t == 1 the noise is dropped by overwriting with the mean
        (reference: src/dmme/diffusion_models/ddpm.py:83-111).
        ``t`` is an int32 array of shape (N,) or a scalar.
        """
        t = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (x_t.shape[0],))
        beta_t = _bcast(self.schedule.beta[t], x_t.ndim)
        alpha_t = _bcast(self.schedule.alpha[t], x_t.ndim)
        alpha_bar_t = _bcast(self.schedule.alpha_bar[t], x_t.ndim)

        out = model_fn(params, x_t, t).astype(x_t.dtype)
        eps_hat = self.to_eps(out, x_t, alpha_bar_t)
        p = eq.ddpm.reverse_process(x_t, beta_t, alpha_t, alpha_bar_t, eps_hat, beta_t)
        x_prev = p.sample(rng)
        return jnp.where(_bcast(t, x_t.ndim) == 1, p.mean, x_prev)

    def generate(
        self,
        model_fn: ModelFn,
        params: Any,
        rng: jax.Array,
        img_shape: Tuple[int, ...],
        *,
        history_length: Optional[int] = None,
    ):
        """Full reverse process x_T → x_0 as one ``lax.scan``.

        The reference's Python loop with tqdm (:113-133) becomes a single
        compiled scan: T sequential UNet applications with weights resident
        in HBM. With ``history_length`` set, evenly-spaced frames (always
        including the final x_0) are written into a preallocated buffer via
        ``dynamic_update_slice`` — the pattern the GenerateImage callback
        consumes (reference: src/dmme/callbacks/generate.py:37-88).

        Returns ``x_0`` or ``(x_0, history)`` with history shaped
        ``(history_length, *img_shape)``.
        """
        x_key, scan_key = jax.random.split(rng)
        x_t = jax.random.normal(x_key, img_shape, jnp.float32)
        ts = jnp.arange(self.timesteps, 0, -1, dtype=jnp.int32)

        capture, history0 = make_history_capture(
            self.timesteps, history_length, img_shape
        )

        def body(carry, t):
            if capture is None:
                x = carry
            else:
                x, hist = carry
            step_key = jax.random.fold_in(scan_key, t)
            x = self.sampling_step(model_fn, params, x, t, step_key)
            if capture is None:
                return x, None
            hist = capture_frame(capture, hist, self.timesteps - t, x)
            return (x, hist), None

        if capture is None:
            x_0, _ = jax.lax.scan(body, x_t, ts)
            return x_0
        (x_0, history), _ = jax.lax.scan(body, (x_t, history0), ts)
        return x_0, history

    # ---------------------------------------------------------------- forward
    def __call__(self, model_fn: ModelFn, params: Any, x: jax.Array, t: jax.Array) -> jax.Array:
        """Delegate to the denoiser (reference ``forward``, :135-144)."""
        return model_fn(params, x, t)
