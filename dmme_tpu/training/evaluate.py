"""Evaluation loop — FID + Inception Score over generated samples.

Mirror of the reference's test path (src/dmme/lit_modules/ddpm.py:91-125 +
SURVEY.md §3.3): per test batch, update FID with real images, generate a
same-shaped batch with the EMA weights, update FID(fake) + IS; at the end
compute fid and inception_score = exp(kl_mean).

Feature extraction runs through the JAX InceptionV3
(``dmme_tpu.eval.inception``); pass ``inception_weights`` (a torchvision
inception_v3 state_dict file) for meaningful absolute values.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dmme_tpu.eval.fid import FrechetInceptionDistance
from dmme_tpu.eval.inception import make_feature_fn
from dmme_tpu.training.checkpoint import CheckpointManager
from dmme_tpu.utils.norm import denorm


def validate(
    lit,
    datamodule,
    *,
    ckpt_dir: Optional[str] = None,
    ckpt_step: Optional[int] = None,
    seed: int = 1337,
    max_batches: Optional[int] = None,
    use_ema: Optional[bool] = None,
    state=None,
) -> Dict[str, float]:
    """Validation loop with REAL semantics (not a test alias): the average
    eval-mode diffusion loss over the test split — no generation, so it is
    cheap enough to run mid-training. Lightning's `validate` analogue for a
    model whose val metric is the denoising objective."""
    import numpy as np

    from dmme_tpu.parallel import make_eval_step

    if use_ema is None:
        use_ema = not getattr(lit, "validate_original_weights", False)
    datamodule.prepare_data()
    datamodule.setup("test")

    rng = jax.random.PRNGKey(seed)
    if state is None:
        img_size = getattr(datamodule, "img_size", None)
        if img_size is None:
            img_size = datamodule.test_data.shape[1]
        state = lit.init_state(rng, img_size=int(img_size))
        if ckpt_dir is not None:
            mgr = CheckpointManager(ckpt_dir)
            if ckpt_step is not None or mgr.latest_step() is not None:
                # ckpt_step pins a specific saved step (e.g. an early
                # checkpoint for relative-FID trend analysis)
                state = mgr.restore(state, step=ckpt_step)

    params = state.ema_params if use_ema else state.params

    def eval_loss(p, rng_, batch):
        # labeled datamodules (with_labels=True, the CFG setup) yield
        # (images, labels) tuples; conditioning (labels / the upsampler's
        # low-res concat) is bound by the Lit class itself
        if isinstance(batch, (tuple, list)):
            x, y = batch
        else:
            x, y = batch, None
        x = datamodule.process(x)
        if hasattr(lit, "eval_loss"):
            return lit.eval_loss(p, rng_, x, y)
        # out-of-tree Lit-like modules predating the eval_loss hook: the
        # old duck-typed contract (model_fn + diffusion_model)
        return lit.diffusion_model.loss(lit.model_fn, p, rng_, x, train=False)

    step = make_eval_step(eval_loss)
    losses = []
    for i, batch in enumerate(datamodule.test_iter()):
        if max_batches is not None and i >= max_batches:
            break
        batch = jax.tree.map(jnp.asarray, batch)
        losses.append(
            float(jax.device_get(step(params, batch, jax.random.fold_in(rng, i))))
        )
    return {
        "val/loss": float(np.mean(losses)) if losses else float("nan"),
        "num_batches": len(losses),
        "use_ema": use_ema,
    }


def _reject_conditioned_input(lit, where: str) -> None:
    """Conditioned-input models (LitUpsampler: network input = x_t ‖ cond)
    cannot run the unconditional generation paths — fail with the fix
    instead of a cryptic conv shape error deep in the jitted scan.

    The comparison baseline is the width of the space the SOLVER
    integrates — ``latent_channels`` for latent harnesses (whose denoiser
    legitimately differs from img_channels), img_channels otherwise."""
    get = getattr(lit, "model_in_channels", None)
    solver_ch = getattr(
        lit, "latent_channels", getattr(lit, "img_channels", None)
    )
    if get is not None and solver_ch is not None and get() != solver_ch:
        raise ValueError(
            f"{where} has no conditioning source for a conditioned-input "
            f"model ({type(lit).__name__}); sample through "
            "lit.generate(..., low_res=...) — see scripts/upsample_demo.py"
        )


def test(
    lit,
    datamodule,
    *,
    ckpt_dir: Optional[str] = None,
    ckpt_step: Optional[int] = None,
    seed: int = 1337,
    max_batches: Optional[int] = None,
    inception_weights: Optional[str] = None,
    use_ema: Optional[bool] = None,
    state=None,
    mesh=None,
    fid_stats: Optional[str] = None,
    save_fid_stats: Optional[str] = None,
    sampler: Optional[str] = None,
    sample_steps: Optional[int] = None,
) -> Dict[str, float]:
    """FID/IS evaluation. With ``mesh`` set, generation and feature
    extraction shard over the device mesh (params replicated, batch split) —
    the full-T reverse scan is the dominant cost and parallelizes linearly;
    the streaming FID/IS statistics are batch-order invariant so values are
    unchanged (tested vs single-device).

    ``fid_stats``: precomputed real-distribution (μ, Σ) ``.npz`` in the
    pytorch-fid convention — skips the real feature pass entirely.
    ``save_fid_stats``: write this run's real stats for reuse.
    ``sampler``/``sample_steps``: generation-time solver override (same
    names as the sample subcommand; e.g. ``sampler="dpm"`` evaluates FID
    at 20 NFE — 2.4× cheaper than DDIM-50 per generated batch)."""
    if use_ema is None:
        # Reference EMA knob ``validate_original_weights`` (callbacks/
        # ema.py:27-46): evaluate the raw weights instead of the EMA copy.
        use_ema = not getattr(lit, "validate_original_weights", False)
    _reject_conditioned_input(lit, "test")
    if not hasattr(lit, "diffusion_model"):
        raise ValueError(
            f"evaluate() scores diffusion harnesses; {type(lit).__name__} "
            "has no sampler. For a LitVAE, FID over prior decodes is not "
            "the codec metric — use `validate` (reconstruction ELBO), or "
            "evaluate the latent-diffusion harness trained on top of it."
        )
    datamodule.prepare_data()
    datamodule.setup("test")

    rng = jax.random.PRNGKey(seed)
    if state is None:
        img_size = getattr(datamodule, "img_size", None)
        if img_size is None:
            img_size = datamodule.test_data.shape[1]
        state = lit.init_state(rng, img_size=int(img_size))
        if ckpt_dir is not None:
            mgr = CheckpointManager(ckpt_dir)
            if ckpt_step is not None or mgr.latest_step() is not None:
                # ckpt_step pins a specific saved step (e.g. an early
                # checkpoint for relative-FID trend analysis)
                state = mgr.restore(state, step=ckpt_step)

    feature_fn = make_feature_fn(inception_weights)
    from dmme_tpu.eval.inception_score import InceptionScore

    fid = FrechetInceptionDistance()
    inception = InceptionScore()  # class count follows the feature net
    if fid_stats is not None:
        fid.load_real_stats(fid_stats)

    params = state.ema_params if use_ema else state.params

    # Generation-time solver override (shared factory with the sample
    # subcommand: reuses the trained schedule and adapts ε‖v outputs).
    if sampler is not None:
        from dmme_tpu.diffusion import make_sampler

        algo, adapt = make_sampler(lit.diffusion_model, sampler, sample_steps)
    else:
        if sample_steps is not None:
            raise ValueError(
                "sample_steps without sampler would be silently ignored — "
                "set sampler (ddim|dpm|unipc|edm) too"
            )
        algo, adapt = lit.diffusion_model, (lambda fn: fn)

    # Conditional models generate through the CFG wrapper. Labels must be a
    # TRACED argument (closing the wrapper over each batch's y would make a
    # fresh static model_fn per batch -> recompile of the full reverse scan
    # every batch).
    conditional = getattr(lit, "num_classes", None) is not None
    if conditional:
        from dmme_tpu.diffusion import classifier_free

        def _generate(params_, rng_, y, shape):
            fn = classifier_free(
                lit.model_fn, y, getattr(lit, "guidance_scale", 1.0),
                null_label=lit.num_classes,
            )
            return algo.generate(adapt(fn), params_, rng_, shape)

        gen_static = (3,)
        gen_fn = _generate
    else:
        gen_static = (0, 3)
        gen_fn = algo.generate
        # built ONCE: the adapted model_fn is a static argnum — a fresh
        # closure per batch would recompile the reverse scan every iteration
        base_model_fn = adapt(lit.model_fn)

    place = None
    if mesh is not None:
        from dmme_tpu.parallel.mesh import batch_sharding, replicated

        params = jax.device_put(params, replicated(mesh))
        bs = batch_sharding(mesh)
        gen = jax.jit(
            gen_fn,
            static_argnums=gen_static,
            out_shardings=bs,  # SPMD partitions the whole reverse scan
        )

        def place(x):
            return jax.device_put(x, bs)
    else:
        gen = jax.jit(gen_fn, static_argnums=gen_static)

    n_batches = 0
    for i, batch in enumerate(datamodule.test_iter()):
        if max_batches is not None and i >= max_batches:
            break
        if isinstance(batch, (tuple, list)):  # labeled (CFG) datamodule
            images, labels = batch
        else:
            images, labels = batch, None
        real = jnp.asarray(images).astype(jnp.float32) / 255.0  # [0,1]
        if place is not None:
            real = place(real)
        if fid_stats is None:  # precomputed stats skip the real pass
            feats, _ = feature_fn(real)
            fid.update(feats, real=True)

        gen_rng = jax.random.fold_in(rng, i)
        if conditional:
            # condition on the batch's true labels when available
            # (class-balanced FID — guided-diffusion convention), else
            # draw classes uniformly
            if labels is not None:
                y = jnp.asarray(labels, jnp.int32)
            else:
                y_key, gen_rng = jax.random.split(gen_rng)
                y = jax.random.randint(
                    y_key, (real.shape[0],), 0, lit.num_classes, jnp.int32
                )
            fake = gen(params, gen_rng, y, lit.sample_space_shape(real.shape))
        else:
            fake = gen(
                base_model_fn, params, gen_rng,
                lit.sample_space_shape(real.shape),
            )
        # latent harnesses decode solver output to images (identity for
        # pixel-space harnesses — training/lit.py latent-space seam)
        fake = lit.to_images(fake)
        fake = denorm(fake)  # [-1,1] -> [0,1]
        feats, logits = feature_fn(fake)
        fid.update(feats, real=False)
        inception.update(logits)
        n_batches += 1

    if save_fid_stats is not None and fid_stats is None:
        fid.save_real_stats(save_fid_stats)
    kl_mean, kl_std = inception.compute()
    results = {
        "fid": fid.compute(),
        "inception_score": float(jnp.exp(kl_mean)),
        "inception_score_std": kl_std,
        "num_batches": n_batches,
        # methodology stamp: FID from different solvers/weights must not be
        # compared as if equivalent
        "use_ema": use_ema,
        "sampler": sampler or "default",
        "sample_steps": sample_steps,
    }
    if inception_weights is None:
        results["warning"] = (
            "randomly-initialized InceptionV3 (no weights file provided): "
            "metric values are not comparable to published FID/IS"
        )
    return results
