"""Classifier-free guidance tests (conditional UNet + CFG wrapper)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.diffusion import DDIM, DDPM, DPMSolverPP, classifier_free
from dmme_tpu.models import as_model_fn, ddpm as ddpm_models

TINY = dict(
    pos_dim=4, emb_dim=8, num_groups=2, channels_per_depth=(4, 8, 8, 8),
    num_blocks=1,
)
K = 10  # classes; null token index = K


def make_cond_model(rng):
    model = ddpm_models.UNet(**TINY, num_classes=K)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1, 2], jnp.int32)
    params = model.init(rng, x, t, y=jnp.zeros((2,), jnp.int32))
    return model, as_model_fn(model), params


class TestConditionalUNet:
    @pytest.mark.slow
    def test_label_changes_output(self, rng):
        model, model_fn, params = make_cond_model(rng)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 3))
        t = jnp.array([3, 5], jnp.int32)
        a = model_fn(params, x, t, y=jnp.array([0, 0]))
        b = model_fn(params, x, t, y=jnp.array([7, 7]))
        assert a.shape == x.shape
        assert float(jnp.max(jnp.abs(a - b))) > 1e-6

    def test_embed_has_null_row(self, rng):
        model, _, params = make_cond_model(rng)
        assert params["params"]["class_embed"]["embedding"].shape[0] == K + 1

    def test_unconditional_model_rejects_nothing(self, rng):
        # unconditional models keep their old signature untouched
        model = ddpm_models.UNet(**TINY)
        x = jnp.zeros((1, 16, 16, 3))
        params = model.init(rng, x, jnp.zeros((1,), jnp.int32))
        out = as_model_fn(model)(params, x, jnp.zeros((1,), jnp.int32))
        assert out.shape == x.shape


class TestClassifierFree:
    def test_w0_equals_null_labels(self, rng):
        """w = 0 ⇒ pure unconditional prediction."""
        _, model_fn, params = make_cond_model(rng)
        x = jax.random.normal(jax.random.fold_in(rng, 2), (2, 16, 16, 3))
        t = jnp.array([4, 9], jnp.int32)
        guided = classifier_free(model_fn, jnp.array([3, 6]), 0.0, null_label=K)
        want = model_fn(params, x, t, y=jnp.full((2,), K))
        got = guided(params, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_w1_equals_conditional(self, rng):
        """w = 1 ⇒ the plain conditional model."""
        _, model_fn, params = make_cond_model(rng)
        x = jax.random.normal(jax.random.fold_in(rng, 3), (2, 16, 16, 3))
        t = jnp.array([4, 9], jnp.int32)
        y = jnp.array([3, 6])
        guided = classifier_free(model_fn, y, 1.0, null_label=K)
        want = model_fn(params, x, t, y=y)
        got = guided(params, x, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_null_labels_make_w_irrelevant(self, rng):
        _, model_fn, params = make_cond_model(rng)
        x = jax.random.normal(jax.random.fold_in(rng, 4), (2, 16, 16, 3))
        t = jnp.array([2, 7], jnp.int32)
        nulls = jnp.full((2,), K)
        a = classifier_free(model_fn, nulls, 0.0, K)(params, x, t)
        b = classifier_free(model_fn, nulls, 5.0, K)(params, x, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("algo_cls", ["ddpm", "ddim", "dpm"])
    def test_every_sampler_works_guided(self, rng, algo_cls):
        """The wrapper has the unconditional signature, so ancestral DDPM,
        DDIM, and DPM-Solver++ all sample guided without modification."""
        _, model_fn, params = make_cond_model(rng)
        guided = classifier_free(model_fn, jnp.array([1, 2]), 3.0, K)
        algo = {
            "ddpm": lambda: DDPM.create(timesteps=5),
            "ddim": lambda: DDIM.create(timesteps=20, sub_timesteps=4),
            "dpm": lambda: DPMSolverPP.create(timesteps=20, sub_timesteps=4),
        }[algo_cls]()
        out = algo.generate(guided, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestCFGTraining:
    @pytest.mark.slow
    def test_label_dropout_loss_runs_and_differs(self, rng):
        """LitDDPM(num_classes) consumes (x, y) batches; the conditional
        loss differs from the unconditional model's and is differentiable."""
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.training import LitDDPM

        lit = LitDDPM(
            model=ddpm_models.UNet(**TINY, num_classes=10),
            diffusion_model=DDPM.create(timesteps=5),
            num_classes=10,
            cond_dropout=0.5,
        )
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=8, with_labels=True)
        dm.setup("fit")
        state = lit.init_state(rng, img_size=32)
        loss_fn = lit.make_loss_fn(dm)
        batch = next(dm.train_iter(0))
        assert isinstance(batch, tuple)
        x8 = (jnp.asarray(batch[0]), jnp.asarray(batch[1]))
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, jax.random.PRNGKey(1), x8
        )
        assert np.isfinite(float(loss))
        # the class embedding receives gradient (labels actually flow)
        g = grads["params"]["class_embed"]["embedding"]
        assert float(jnp.max(jnp.abs(g))) > 0

    @pytest.mark.slow
    def test_fit_smoke_conditional(self, rng):
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.training import LitDDPM, fit

        lit = LitDDPM(
            model=ddpm_models.UNet(**TINY, num_classes=10),
            diffusion_model=DDPM.create(timesteps=5),
            num_classes=10,
        )
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=8, with_labels=True)
        state = fit(lit, dm, max_steps=2, seed=0, log_every=10)
        assert int(jax.device_get(state.step)) == 2


class TestReviewRegressions:
    """Fixes from the round-2 self-review (see commit message)."""

    def test_cfg_guides_eps_only_for_variance_models(self):
        """ε‖v output: w applies to ε; v passes through from the COND branch
        (guided-diffusion convention) — extrapolated v would leave [0,1]."""
        import jax.numpy as jnp
        import numpy as np

        from dmme_tpu.diffusion import classifier_free

        C = 2

        def model(params, x, t, y=None, train=False, rngs=None):
            # eps depends on label; v is label-dependent too (to detect
            # which branch the v-half comes from)
            lab = y.reshape((-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
            eps = x * 0 + lab
            v = x * 0 + 10.0 + lab
            return jnp.concatenate([eps, v], axis=-1)

        x = jnp.zeros((2, 4, 4, C), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        y = jnp.asarray([1, 1], jnp.int32)
        out = classifier_free(model, y, guidance_scale=3.0, null_label=5)(
            None, x, t
        )
        eps, v = jnp.split(out, 2, axis=-1)
        # eps: uncond(5) + 3*(cond(1) - uncond(5)) = 5 + 3*(-4) = -7
        np.testing.assert_allclose(np.asarray(eps), -7.0, atol=1e-5)
        # v: conditional branch verbatim = 10 + 1 (NOT extrapolated = 10-11)
        np.testing.assert_allclose(np.asarray(v), 11.0, atol=1e-5)

    def test_lit_iddpm_num_classes_reaches_default_unet(self):
        from dmme_tpu.training import LitIDDPM

        lit = LitIDDPM(timesteps=8, num_classes=10)  # default model path
        assert lit.model.num_classes == 10

    def test_conditional_generate_end_to_end(self):
        """Sampling a CFG-trained model through lit.generate must work (it
        used to trip the UNet's y-assertion via the GenerateImage path)."""
        import jax
        import jax.numpy as jnp

        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.training import LitDDPM

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1, num_classes=3,
            ),
            timesteps=6, warmup=10, num_classes=3, guidance_scale=2.0,
        )
        state = lit.init_state(jax.random.PRNGKey(0), img_size=8)
        out = lit.generate(state, jax.random.PRNGKey(1), (2, 8, 8, 3))
        assert out.shape == (2, 8, 8, 3) and bool(jnp.all(jnp.isfinite(out)))
        # explicit labels work too
        out2 = lit.generate(
            state, jax.random.PRNGKey(1), (2, 8, 8, 3),
            y=jnp.asarray([0, 2], jnp.int32),
        )
        assert out2.shape == (2, 8, 8, 3)

    def test_validate_with_labeled_datamodule(self, tmp_path):
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.training import LitDDPM
        from dmme_tpu.training.evaluate import validate

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1, num_classes=10,
            ),
            timesteps=6, warmup=10, num_classes=10,
        )
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=8,
                     with_labels=True)
        res = validate(lit, dm, max_batches=1)
        assert res["num_batches"] == 1
        import math

        assert math.isfinite(res["val/loss"])

    @pytest.mark.slow
    def test_fit_accumulate_with_labels(self, tmp_path):
        """Gradient accumulation over (images, labels) tuple batches
        (np.stack on tuples used to crash)."""
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.training import LitDDPM, fit

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1, num_classes=10,
            ),
            timesteps=6, warmup=10, num_classes=10,
        )
        dm = CIFAR10(synthetic=True, synthetic_size=32, batch_size=4,
                     with_labels=True)
        state = fit(lit, dm, max_steps=2, accumulate_grad_batches=2,
                    log_every=100)
        import jax

        assert int(jax.device_get(state.step)) == 2
