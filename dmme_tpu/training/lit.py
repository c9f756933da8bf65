"""High-level training modules: LitDDPM / LitDDIM / LitIDDPM.

API mirror of the reference's Lightning modules
(src/dmme/lit_modules/{ddpm,ddim,iddpm}.py) — same constructor surface
(lr, warmup, decay, timesteps, …), same division of labor (optimization,
logging, metrics only — the algorithm lives in ``dmme_tpu.diffusion``) —
but realized as a thin, stateless harness over pure functions:

* optimizer = optax chain (global-norm clip 1.0 + Adam + per-step warmup),
  the reference's exact recipe (lit_modules/ddpm.py:127-135 + configs);
* EMA folds into the train step (state.ema_params), replacing the callback;
* ``loss_fn`` composes on-device augmentation → normalization → diffusion
  loss into one jittable function over raw uint8 batches.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dmme_tpu import models as model_lib
from dmme_tpu.diffusion import DDIM, DDPM, EDM, IDDPM, FlowMatching
from dmme_tpu.training.lr_schedule import warmup_schedule
from dmme_tpu.training.state import TrainState


class LitDDPM:
    """DDPM training harness (reference: src/dmme/lit_modules/ddpm.py:21-141)."""

    def __init__(
        self,
        lr: float = 2e-4,
        warmup: int = 5000,
        decay: float = 0.9999,
        diffusion_model: Optional[DDPM] = None,
        model: Any = None,
        timesteps: int = 1000,
        grad_clip: float = 1.0,
        img_channels: int = 3,
        dtype: Any = jnp.float32,
        ema_every_n_steps: int = 1,
        validate_original_weights: bool = False,
        num_classes: Optional[int] = None,
        cond_dropout: float = 0.1,
        parameterization: str = "eps",
        snr_gamma: Optional[float] = None,
        guidance_scale: float = 1.0,
        moe_aux_weight: float = 0.0,
        moe_z_weight: float = 1e-3,
    ) -> None:
        self.lr = lr
        self.warmup = warmup
        self.decay = decay
        self.grad_clip = grad_clip
        self.img_channels = img_channels
        # Reference EMA option surface (callbacks/ema.py:27-46): cadence of
        # the moving-average update, and whether evaluation should use the
        # raw (original) weights instead of the EMA copy.
        self.ema_every_n_steps = ema_every_n_steps
        self.validate_original_weights = validate_original_weights
        # Classifier-free guidance training (dmme_tpu.diffusion.cfg):
        # class-conditional model + label dropout to the null token.
        self.num_classes = num_classes
        self.cond_dropout = cond_dropout
        #: sampling-time classifier-free guidance weight (1.0 = plain
        #: conditional; only used when num_classes is set)
        self.guidance_scale = guidance_scale
        #: >0 → add the MoE router losses (models/moe.py, ``sow``-ed into
        #: the "losses" collection) to the diffusion loss: the Switch
        #: load-balance aux at ``moe_aux_weight`` and the raw St-MoE router
        #: z-loss at ``moe_z_weight`` (default 1e-3, the St-MoE paper
        #: value). Required for MoE-DiT models — without it the router
        #: collapses onto one expert. Every harness's make_loss_fn routes
        #: its model calls through :meth:`loss_model_fn` +
        #: :meth:`add_moe_aux` so no override can silently drop these.
        self.moe_aux_weight = moe_aux_weight
        self.moe_z_weight = moe_z_weight

        if model is None:
            model = model_lib.ddpm.UNet(
                in_channels=img_channels, dtype=dtype, num_classes=num_classes
            )
        self.model = model
        self.model_fn = model_lib.as_model_fn(model)

        if diffusion_model is None:
            diffusion_model = DDPM.create(
                timesteps, parameterization=parameterization, snr_gamma=snr_gamma
            )
        self.diffusion_model = diffusion_model

    # ------------------------------------------------------------- optimizer
    def make_optimizer(self) -> optax.GradientTransformation:
        """Adam + warmup + global-norm clip 1.0 (reference recipe:
        configs/ddpm/cifar10.yaml gradient_clip_val + lit_modules/ddpm.py:127-135).

        Note (measured, docs/performance.md): optax's per-leaf global-norm
        reduces look expensive in a trace but are FREE here — XLA fuses each
        per-leaf Σx² into that leaf's weight-gradient fusion. A single-
        reduction ravel variant (dmme_tpu.parallel.clip_by_global_norm_fused)
        measured 0.9 ms/step SLOWER (the concat materializes); kept opt-in."""
        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip),
            optax.adam(warmup_schedule(self.lr, self.warmup)),
        )

    # ------------------------------------------------------------------ state
    def model_in_channels(self) -> int:
        """Channels of the NETWORK input (hook: conditioned models — e.g.
        the upsampler's x_t ‖ cond concat — take more than img_channels)."""
        return self.img_channels

    def init_state(self, rng: jax.Array, img_size: int = 32) -> TrainState:
        x = jnp.zeros(
            (1, img_size, img_size, self.model_in_channels()), jnp.float32
        )
        t = jnp.zeros((1,), jnp.int32)
        tx = self.make_optimizer()

        # The ENTIRE state creation runs as ONE jitted program: model.init +
        # the EMA copy + optimizer zeros. Eager creation dispatches ~900 tiny
        # ops (3 per weight leaf) — pathological over a remote-TPU link: it
        # was 175 s of BENCH_r02's unexplained 805 s warmup, vs seconds as a
        # single compiled (and persistently cached) program.
        def _create(rng_):
            if self.num_classes is not None:
                params = self.model.init(rng_, x, t, y=jnp.zeros((1,), jnp.int32))
            else:
                params = self.model.init(rng_, x, t)
            # init makes every collection mutable, so MoE models also
            # return their sown "losses"/"moe_stats" scalars — keep only
            # real weights (the train state must hold parameters, nothing
            # else)
            params = {
                k: v for k, v in params.items()
                if k not in ("losses", "moe_stats")
            }
            return TrainState.create(
                params,
                tx,
                ema_decay=self.decay,
                ema_every_n_steps=self.ema_every_n_steps,
            )

        return jax.jit(_create)(rng)

    # ------------------------------------------------------------------- loss
    def make_loss_fn(self, datamodule=None):
        """Loss over raw (uint8) batches: on-device augment → normalize →
        diffusion loss, all inside one jitted program.

        Labeled batches ``(images, labels)`` train the class-conditional
        model; with ``num_classes`` set, ``cond_dropout`` of the labels are
        replaced by the null token each step (classifier-free guidance
        training, diffusion/cfg.py). Conditioning enters ONLY through a
        bound model_fn — the diffusion algorithms stay label-agnostic."""

        def loss_fn(params, rng, batch):
            if isinstance(batch, (tuple, list)):
                x, y = batch
            else:
                x, y = batch, None
            if datamodule is not None:
                aug_rng, rng = jax.random.split(rng)
                x = datamodule.train_transform(aug_rng, x)
            # latent-space seam (training/latent.py LatentMixin): pixel
            # harnesses pass through untouched (and the rng stream is only
            # split by implementations that consume it)
            x, rng = self.encode_target(rng, x)
            # aux_box collects MoE router losses sown during model calls in
            # THIS trace (models/moe.py); appending tracers to a python list
            # and consuming them in the same jaxpr is sound
            aux_box: list = []
            base_fn = self.loss_model_fn(aux_box)
            model_fn = base_fn
            if y is not None and self.num_classes is not None:
                drop_rng, rng = jax.random.split(rng)
                drop = jax.random.bernoulli(drop_rng, self.cond_dropout, y.shape)
                y_used = jnp.where(drop, jnp.int32(self.num_classes), y.astype(jnp.int32))

                def model_fn(params, xt, t, *, train=False, rngs=None):
                    return base_fn(
                        params, xt, t, y=y_used, train=train, rngs=rngs
                    )

            loss = self.diffusion_model.loss(model_fn, params, rng, x, train=True)
            return self.add_moe_aux(loss, aux_box)

        return loss_fn

    def loss_model_fn(self, aux_box: list):
        """Base model_fn for a TRAINING loss trace.

        With ``moe_aux_weight > 0`` the returned fn also collects the MoE
        router losses sown into the "losses" collection (models/moe.py)
        into ``aux_box`` as ``(aux_sum, z_sum)`` tuples; otherwise it is
        plain ``self.model_fn``. SHARED by every harness's make_loss_fn
        override (LitDDPM/LitDistill/LitUpsampler/…) so a subclass cannot
        accept ``moe_aux_weight`` and silently ignore it (ADVICE r4). Close
        the loss with :meth:`add_moe_aux`."""
        if self.moe_aux_weight <= 0:
            return self.model_fn

        def model_fn(params, x, t, *, y=None, train=False, rngs=None):
            kwargs = {} if y is None else {"y": y}
            out, vs = self.model.apply(
                params, x, t, train=train, rngs=rngs,
                mutable=["losses"], **kwargs,
            )
            flat = jax.tree_util.tree_flatten_with_path(vs.get("losses", {}))[0]
            if flat:
                z = [v for kp, v in flat if "moe_z" in jax.tree_util.keystr(kp)]
                aux = [v for kp, v in flat if "moe_z" not in jax.tree_util.keystr(kp)]
                aux_box.append((sum(aux) if aux else 0.0, sum(z) if z else 0.0))
            return out

        return model_fn

    def add_moe_aux(self, loss, aux_box: list):
        """loss + moe_aux_weight·Σaux + moe_z_weight·Σz over the router
        losses :meth:`loss_model_fn` collected (no-op when none were)."""
        if not aux_box:
            return loss
        aux = sum(a for a, _ in aux_box)
        z = sum(z_ for _, z_ in aux_box)
        return loss + self.moe_aux_weight * aux + self.moe_z_weight * z

    # --------------------------------------------------- latent-space seam
    # Identity in pixel-space harnesses; training/latent.py's LatentMixin
    # overrides all four so any LitDDPM-family formulation trains/samples
    # in a frozen VAE's latent space. Every sampling surface (sample CLI's
    # --trainer.sampler override, evaluate(), serving) routes solver shapes
    # through sample_space_shape and outputs through to_images.
    def encode_target(self, rng, x):
        """Training-target transform inside the loss trace; returns
        (target, rng) and must NOT consume rng in the identity case (the
        pixel harnesses' rng streams are pinned by tests)."""
        return x, rng

    def encode_eval(self, x):
        return x

    def sample_space_shape(self, img_shape):
        """IMAGE shape → the shape the diffusion solver integrates."""
        return img_shape

    def to_images(self, out):
        """Solver output → images (decode step of latent harnesses)."""
        return out

    def eval_loss(self, params, rng, x, y=None):
        """Eval-mode diffusion loss on a processed batch (the validate
        path). Conditional models condition on the TRUE labels, no
        dropout; conditioned subclasses (LitUpsampler) bind their own
        model_fn here so evaluate() stays conditioning-agnostic."""
        x = self.encode_eval(x)
        model_fn = self.model_fn
        if y is not None and self.num_classes is not None:
            y = jnp.asarray(y, jnp.int32)

            def model_fn(p_, xt, t, *, train=False, rngs=None):
                return self.model_fn(p_, xt, t, y=y, train=train, rngs=rngs)

        return self.diffusion_model.loss(model_fn, params, rng, x, train=False)

    # -------------------------------------------------------------- inference
    def __call__(self, params, x_t: jax.Array, t, rng: jax.Array) -> jax.Array:
        """One denoising step (reference LitDDPM.forward, :65-79).

        ``t`` may be a python int (broadcast over the batch) or an int array.
        """
        return self.diffusion_model.sampling_step(self.model_fn, params, x_t, t, rng)

    def generate(
        self,
        state: TrainState,
        rng: jax.Array,
        img_shape: Tuple[int, ...],
        *,
        use_ema: Optional[bool] = None,
        history_length: Optional[int] = None,
        y: Optional[jax.Array] = None,
    ):
        """Sample with the EMA weights (the reference swaps to EMA for eval —
        callbacks/ema.py:72-94; here EMA params are read directly).

        ``use_ema=None`` resolves from ``validate_original_weights``
        (reference EMA knob, callbacks/ema.py:27-46).

        Class-conditional models sample through classifier-free guidance
        (diffusion/cfg.py) at ``guidance_scale``: ``y`` gives the classes
        to generate; ``y=None`` draws them uniformly — so GenerateImage /
        sample / test all work on CFG models without extra wiring."""
        if use_ema is None:
            use_ema = not self.validate_original_weights
        params = state.ema_params if use_ema else state.params
        model_fn, rng = self.sampling_model_fn(rng, img_shape[0], y)
        return self.diffusion_model.generate(
            model_fn, params, rng, img_shape, history_length=history_length
        )

    def sampling_model_fn(self, rng, n: int, y=None):
        """(model_fn, rng) for sampling: unconditional models pass through;
        class-conditional models get the classifier-free wrapper with
        given/uniform labels (see :meth:`generate`)."""
        if self.num_classes is None:
            return self.model_fn, rng
        from dmme_tpu.diffusion import classifier_free

        y_key, rng = jax.random.split(rng)
        if y is None:
            y = jax.random.randint(
                y_key, (n,), 0, self.num_classes, dtype=jnp.int32
            )
        return (
            classifier_free(
                self.model_fn, y, self.guidance_scale, null_label=self.num_classes
            ),
            rng,
        )


class LitDDIM(LitDDPM):
    """DDIM harness (reference: src/dmme/lit_modules/ddim.py:11-45) —
    constructor-only subclass swapping in the strided sampler."""

    def __init__(
        self,
        lr: float = 2e-4,
        warmup: int = 5000,
        decay: float = 0.9999,
        diffusion_model: Optional[DDIM] = None,
        model: Any = None,
        timesteps: int = 1000,
        sample_steps: int = 50,
        tau_schedule: str = "quadratic",
        variant: str = "canonical",
        parameterization: str = "eps",
        snr_gamma: Optional[float] = None,
        **kwargs,
    ):
        if diffusion_model is None:
            diffusion_model = DDIM.create(
                timesteps, sample_steps, tau_schedule, variant=variant,
                parameterization=parameterization, snr_gamma=snr_gamma,
            )
        super().__init__(
            lr, warmup, decay, diffusion_model, model, timesteps, **kwargs
        )


class LitEDM(LitDDPM):
    """EDM harness (no reference counterpart — capability beyond the
    reference): continuous-σ preconditioned training (Karras et al. 2022)
    on the same UNet, sampled with the 2nd-order Heun solver.

    Note the diffusion algorithm conditions the network on c_noise(σ) — a
    float — through the same sinusoidal time embedding; no model change."""

    def __init__(
        self,
        lr: float = 1e-3,
        warmup: int = 5000,
        decay: float = 0.9999,
        diffusion_model: Optional[EDM] = None,
        model: Any = None,
        sample_steps: int = 18,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        sigma_data: float = 0.5,
        p_mean: float = -1.2,
        p_std: float = 1.2,
        order: int = 2,
        s_churn: float = 0.0,
        **kwargs,
    ):
        if diffusion_model is None:
            diffusion_model = EDM.create(
                steps=sample_steps,
                sigma_min=sigma_min,
                sigma_max=sigma_max,
                rho=rho,
                sigma_data=sigma_data,
                p_mean=p_mean,
                p_std=p_std,
                order=order,
                s_churn=s_churn,
            )
        super().__init__(lr, warmup, decay, diffusion_model, model, **kwargs)

    def __call__(self, params, x_t, i, rng):
        """One Heun step at σ-grid index ``i`` (EDM has no integer-t ancestral
        step; the grid index plays the reference's ``t`` role here)."""
        return self.diffusion_model.sampling_step(self.model_fn, params, x_t, i, rng)


class LitFlow(LitDDPM):
    """Flow-matching / rectified-flow harness (no reference counterpart —
    capability beyond the reference): straight-path velocity regression
    (dmme_tpu.diffusion.FlowMatching) on the same UNet, sampled by
    integrating the learned ODE with the Euler or midpoint solver.

    The network is conditioned on ``t · time_scale`` through the same
    sinusoidal time embedding (t ∈ [0,1] alone would collapse the
    embedding's low frequencies); classifier-free guidance and the
    conditional-model machinery are inherited unchanged — the CFG wrapper
    composes over velocities exactly as it does over ε predictions."""

    def __init__(
        self,
        lr: float = 2e-4,
        warmup: int = 5000,
        decay: float = 0.9999,
        diffusion_model: Optional["FlowMatching"] = None,
        model: Any = None,
        sample_steps: int = 25,
        order: int = 2,
        shift: float = 1.0,
        t_sample: str = "logit_normal",
        logit_mean: float = 0.0,
        logit_std: float = 1.0,
        **kwargs,
    ):
        if diffusion_model is None:
            diffusion_model = FlowMatching.create(
                steps=sample_steps,
                order=order,
                shift=shift,
                t_sample=t_sample,
                logit_mean=logit_mean,
                logit_std=logit_std,
            )
        super().__init__(lr, warmup, decay, diffusion_model, model, **kwargs)

    def __call__(self, params, x_t, i, rng=None):
        """One ODE step at t-grid index ``i`` (deterministic; ``rng``
        accepted for signature parity with the ancestral samplers)."""
        return self.diffusion_model.sampling_step(
            self.model_fn, params, x_t, i, rng
        )


class LitDistill(LitDDPM):
    """Progressive-distillation harness (no reference counterpart).

    Trains a student to halve the teacher's deterministic sampling steps
    (dmme_tpu.diffusion.distill). Plugs into the standard ``fit`` loop: the
    teacher's parameters ride in the loss closure as device constants (no
    gradient, stop_gradient'd in the loss), and ``generate``/callbacks use
    the student's N-step DDIM sampler.

    Programmatic API (the teacher comes from a live state or checkpoint —
    see scripts/distill.py for the round-driving workflow)."""

    def __init__(
        self,
        teacher_model: Any,
        teacher_params: Any,
        distiller,
        model: Any = None,
        lr: float = 1e-4,
        warmup: int = 0,
        decay: float = 0.9999,
        init_params: Any = None,
        **kwargs,
    ):
        if model is None:
            model = teacher_model  # same architecture by default
        super().__init__(
            lr, warmup, decay,
            diffusion_model=distiller.student_sampler(),
            model=model, **kwargs,
        )
        self.distiller = distiller
        self.teacher_fn = model_lib.as_model_fn(teacher_model)
        self.teacher_params = teacher_params
        #: paper practice: initialize the student FROM the teacher
        self.init_params = init_params

    def init_state(self, rng: jax.Array, img_size: int = 32) -> TrainState:
        state = super().init_state(rng, img_size)
        if self.init_params is not None:
            # deep copies: params and ema_params must NOT alias each other
            # (or the teacher closure) — the donated train step would donate
            # the same buffer twice. One jitted program, not per-leaf eager
            # copies (minutes over a remote-TPU link).
            copy2 = jax.jit(
                lambda p: (jax.tree.map(jnp.copy, p), jax.tree.map(jnp.copy, p))
            )
            params, ema_params = copy2(self.init_params)
            state = state.replace(params=params, ema_params=ema_params)
        return state

    def make_loss_fn(self, datamodule=None):
        def loss_fn(params, rng, batch):
            x = batch[0] if isinstance(batch, (tuple, list)) else batch
            if datamodule is not None:
                aug_rng, rng = jax.random.split(rng)
                x = datamodule.train_transform(aug_rng, x)
            # the STUDENT routes through the shared aux collector so
            # distilling a MoE-DiT keeps its router losses (the teacher is
            # frozen — its routers need no regularization)
            aux_box: list = []
            loss = self.distiller.loss(
                self.teacher_fn, self.teacher_params,
                self.loss_model_fn(aux_box), params, rng, x, train=True,
            )
            return self.add_moe_aux(loss, aux_box)

        return loss_fn


class LitIDDPM(LitDDPM):
    """IDDPM harness (reference: src/dmme/lit_modules/iddpm.py:12-54) —
    variance-learning UNet + hybrid loss."""

    def __init__(
        self,
        lr: float = 1e-4,
        warmup: int = 5000,
        decay: float = 0.9999,
        diffusion_model: Optional[IDDPM] = None,
        model: Any = None,
        timesteps: int = 1000,
        loss_type: str = "hybrid",
        gamma: float = 0.001,
        schedule: str = "cosine",
        offset: float = 0.008,
        start: float = 0.0001,
        end: float = 0.02,
        img_channels: int = 3,
        dtype: Any = jnp.float32,
        sample_steps: Optional[int] = None,
        **kwargs,
    ):
        if model is None:
            # num_classes must reach the default UNet here — LitDDPM's own
            # conditional-model default never runs for LitIDDPM (model is
            # built before super().__init__), and a silently-unconditional
            # model would discard the labels without error
            model = model_lib.iddpm.UNet(
                in_channels=img_channels, dtype=dtype,
                num_classes=kwargs.get("num_classes"),
            )
        if diffusion_model is None:
            diffusion_model = IDDPM.create(
                timesteps, loss_type, gamma, schedule, offset, start, end
            )
        # IDDPM §4 fast sampling: train on the full grid, SAMPLE on a
        # respaced K-step grid with learned variances (IDDPM.strided).
        self.sample_algorithm = (
            diffusion_model.strided(sample_steps)
            if sample_steps is not None and hasattr(diffusion_model, "strided")
            else None
        )
        super().__init__(
            lr, warmup, decay, diffusion_model, model, timesteps,
            img_channels=img_channels, dtype=dtype, **kwargs,
        )

    def generate(self, state, rng, img_shape, *, use_ema=None,
                 history_length=None, y=None):
        if self.sample_algorithm is None:
            return super().generate(
                state, rng, img_shape, use_ema=use_ema,
                history_length=history_length, y=y,
            )
        if use_ema is None:
            use_ema = not self.validate_original_weights
        params = state.ema_params if use_ema else state.params
        model_fn, rng = self.sampling_model_fn(rng, img_shape[0], y)
        return self.sample_algorithm.generate(
            model_fn, params, rng, img_shape, history_length=history_length
        )


class LitUpsampler(LitDDPM):
    """Super-resolution diffusion harness — the guided-diffusion upsampler
    stack the reference's stale tests promise via ``ADMU`` but never
    implement (tests/test_adm.py in /root/reference).

    Denoises the HIGH-res x_t conditioned on the LOW-res image, bilinearly
    upsampled and concatenated on channels (network input = 2C). Training
    pairs are built on the fly inside the jitted loss: low = exact
    ``factor``× average-pool of the batch, cond = bilinear resize back.
    Conditioning enters ONLY through a bound model_fn — the diffusion
    algorithm stays image-agnostic (same pattern as the CFG labels).

    Any diffusion_model/parameterization LitDDPM supports works; the
    default network is the DDPM UNet with ``in_channels=2C`` (plug
    ``models.adm.ADMU`` for the guided-diffusion 256px recipe).
    Sampling needs a conditioning source: ``generate(state, rng,
    low_res=...)`` — see scripts/upsample_demo.py for the artifact flow.
    """

    def __init__(
        self,
        factor: int = 4,
        model: Any = None,
        img_channels: int = 3,
        dtype: Any = jnp.float32,
        **kwargs,
    ) -> None:
        self.factor = int(factor)
        assert self.factor >= 2, factor
        if kwargs.get("num_classes") is not None:
            # the class-conditional cascade stage is not implemented: the
            # labels would silently never reach the network (the exact trap
            # the LitIDDPM comment warns about) — reject loudly instead
            raise NotImplementedError(
                "LitUpsampler does not support num_classes yet; train an "
                "unconditional upsampler or use a class-conditional base "
                "model + unconditional upsampler (the common cascade setup)"
            )
        if model is None:
            model = model_lib.ddpm.UNet(
                in_channels=2 * img_channels,
                out_channels=img_channels,
                dtype=dtype,
            )
        super().__init__(
            model=model, img_channels=img_channels, dtype=dtype, **kwargs
        )

    def model_in_channels(self) -> int:
        return 2 * self.img_channels  # x_t ‖ upsampled low-res

    # --------------------------------------------------------- conditioning
    def downsample(self, x: jax.Array) -> jax.Array:
        """Exact ``factor``× average pool (the classic SR pairing; bilinear
        jax.image.resize would alias on the way down)."""
        n, h, w, c = x.shape
        f = self.factor
        assert h % f == 0 and w % f == 0, (x.shape, f)
        return x.reshape(n, h // f, f, w // f, f, c).mean(axis=(2, 4))

    def bound_model_fn(self, cond: jax.Array, base_fn=None):
        """model_fn with the upsampled conditioning concatenated on
        channels; ``cond`` must already be at the high resolution.
        ``base_fn`` lets the training loss route through the shared MoE
        aux collector (:meth:`LitDDPM.loss_model_fn`)."""
        base_fn = base_fn or self.model_fn

        def model_fn(params, x_t, t, *, train=False, rngs=None):
            return base_fn(
                params,
                jnp.concatenate([x_t, cond.astype(x_t.dtype)], axis=-1), t,
                train=train, rngs=rngs,
            )

        return model_fn

    # ------------------------------------------------------------------- loss
    def make_loss_fn(self, datamodule=None):
        def loss_fn(params, rng, batch):
            x = batch[0] if isinstance(batch, (tuple, list)) else batch
            if datamodule is not None:
                aug_rng, rng = jax.random.split(rng)
                x = datamodule.train_transform(aug_rng, x)
            cond = jax.image.resize(self.downsample(x), x.shape, "linear")
            aux_box: list = []
            loss = self.diffusion_model.loss(
                self.bound_model_fn(cond, self.loss_model_fn(aux_box)),
                params, rng, x, train=True,
            )
            return self.add_moe_aux(loss, aux_box)

        return loss_fn

    # -------------------------------------------------------------- inference
    def generate(
        self,
        state: TrainState,
        rng: jax.Array,
        img_shape: Optional[Tuple[int, ...]] = None,
        *,
        low_res: Optional[jax.Array] = None,
        use_ema: Optional[bool] = None,
        history_length: Optional[int] = None,
        y: Optional[jax.Array] = None,
    ):
        """Upsample ``low_res`` ((N, h, w, C) in the model's [-1, 1] domain)
        to (N, h·factor, w·factor, C). The unconditional ``img_shape``-only
        call other Lit modules support cannot apply here — an upsampler has
        nothing to upsample — so it fails loudly with the fix."""
        if low_res is None:
            raise ValueError(
                "LitUpsampler.generate needs low_res=(N, h, w, C) in [-1, 1] "
                "— an upsampler samples conditioned on a low-res input; see "
                "scripts/upsample_demo.py (the CLI sample/test subcommands "
                "have no conditioning source for upsampler configs)"
            )
        n, h, w, c = low_res.shape
        out_shape = (n, h * self.factor, w * self.factor, c)
        if img_shape is not None and tuple(img_shape) != out_shape:
            # the output shape is DERIVED (low_res × factor); a conflicting
            # caller-supplied img_shape must not be silently ignored
            raise ValueError(
                f"img_shape {tuple(img_shape)} conflicts with "
                f"low_res×factor = {out_shape}; omit img_shape or fix low_res"
            )
        cond = jax.image.resize(
            jnp.asarray(low_res, jnp.float32), out_shape, "linear"
        )
        if use_ema is None:
            use_ema = not self.validate_original_weights
        params = state.ema_params if use_ema else state.params
        return self.diffusion_model.generate(
            self.bound_model_fn(cond), params, rng, out_shape,
            history_length=history_length,
        )

    def eval_loss(self, params, rng, x, y=None):
        cond = jax.image.resize(self.downsample(x), x.shape, "linear")
        return self.diffusion_model.loss(
            self.bound_model_fn(cond), params, rng, x, train=False
        )
