"""ADM family tests — the working version of the reference's stale
tests/test_adm.py (which imports a module that never existed).

Tiny configs for speed; one 128px structural test at minimal width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.models import adm, as_model_fn

TINY = dict(
    model_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_resolutions=(8,),
    num_head_channels=16,
)


class TestADM:
    @pytest.mark.slow
    def test_adm_forward_shape(self, rng):
        model = adm.ADM(image_size=16, class_conditional=False, **TINY)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([1, 5], jnp.int32)
        params = jax.jit(model.init)(rng, x, t)
        out = model.apply(params, x, t)
        assert out.shape == (2, 16, 16, 6)  # learn_sigma: eps || v

    @pytest.mark.slow
    def test_class_conditional(self, rng):
        model = adm.ADMG(image_size=16, num_classes=10, **TINY)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([1, 5], jnp.int32)
        y = jnp.array([3, 7], jnp.int32)
        params = jax.jit(model.init)(rng, x, t, y)
        # zero-init makes the fresh output 0 for any y; nudge all params off
        # zero so label conditioning becomes observable
        params = jax.tree.map(lambda p: p + 0.01, params)
        out = model.apply(params, x, t, y)
        assert out.shape == (2, 16, 16, 6)
        out2 = model.apply(params, x, t, jnp.array([1, 1], jnp.int32))
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    @pytest.mark.slow
    def test_admu_upsampler_channels(self, rng):
        model = adm.ADMU(image_size=16, **TINY)
        x = jnp.zeros((1, 16, 16, 6))  # noisy hi-res || upsampled lo-res
        t = jnp.ones((1,), jnp.int32)
        params = jax.jit(model.init)(rng, x, t)
        out = model.apply(params, x, t)
        assert out.shape == (1, 16, 16, 12)

    @pytest.mark.slow
    def test_zero_init_output(self, rng):
        """ADM residual branches and output conv are zero-initialized: the
        fresh network's output must be exactly zero."""
        model = adm.ADM(image_size=16, class_conditional=False, **TINY)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        t = jnp.array([1, 5], jnp.int32)
        params = jax.jit(model.init)(rng, x, t)
        out = model.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_classifier_logits(self, rng):
        model = adm.classifier(image_size=16, num_classes=10, model_channels=32,
                               channel_mult=(1, 2), num_res_blocks=1,
                               attention_resolutions=(8,), num_head_channels=16)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([1, 5], jnp.int32)
        params = jax.jit(model.init)(rng, x, t)
        logits = model.apply(params, x, t)
        assert logits.shape == (2, 10)

    @pytest.mark.slow
    def test_adm_128_structure(self, rng):
        """128px forward at minimal width — structural check of the 5-level
        multiscale path (the reference test's intent)."""
        model = adm.ADM(
            image_size=128, class_conditional=False,
            model_channels=32, num_head_channels=16,
        )
        x = jnp.zeros((1, 128, 128, 3))
        t = jnp.ones((1,), jnp.int32)
        params = jax.jit(model.init)(rng, x, t)
        out = model.apply(params, x, t)
        assert out.shape == (1, 128, 128, 6)

    @pytest.mark.slow
    def test_encoder_cache_api(self, rng):
        """ADM supports the same feature-capture/reuse API as the UNet."""
        model = adm.ADM(image_size=16, class_conditional=False, **TINY)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        t = jnp.array([3, 3], jnp.int32)
        params = jax.jit(model.init)(rng, jnp.zeros_like(x), t)
        params = jax.tree.map(lambda p: p + 0.01, params)  # off zero-init
        out, cache = model.apply(params, x, t, return_features=True)
        out2 = model.apply(params, x, t, cached=cache)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-5)

    @pytest.mark.slow
    def test_guided_sampling_with_adm(self, rng):
        """Classifier-guided DDIM over ADM — inside jit, tiny shapes."""
        from dmme_tpu.diffusion import ClassifierGuidedDDIM

        gen = adm.ADMG(image_size=16, num_classes=10, **TINY)
        clf = adm.classifier(image_size=16, num_classes=10, model_channels=32,
                             channel_mult=(1, 2), num_res_blocks=1,
                             attention_resolutions=(8,), num_head_channels=16)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([1, 2], jnp.int32)
        y = jnp.array([0, 1], jnp.int32)
        gen_params = jax.jit(gen.init)(rng, x, t, y)
        clf_params = jax.jit(clf.init)(jax.random.fold_in(rng, 1), x, t)

        # epsilon-only model_fn: drop the variance half of the ADM output
        def model_fn(params, xx, tt, **kw):
            out = gen.apply(params, xx, tt, y)
            return jnp.split(out, 2, axis=-1)[0]

        def clf_fn(params, xx, tt, **kw):
            return clf.apply(params, xx, tt)

        algo = ClassifierGuidedDDIM.create(timesteps=50, sub_timesteps=3,
                                           guidance_scale=1.0)
        out = algo.guided_generate(
            model_fn, gen_params, clf_fn, clf_params, y,
            jax.random.PRNGKey(0), (2, 16, 16, 3),
        )
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()
