"""Encoder-reuse fast sampler tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from dmme_tpu.diffusion import DDIM, CachedDDIM
from dmme_tpu.models import as_model_fn, ddpm as ddpm_models

TINY = dict(
    pos_dim=4, emb_dim=8, num_groups=2, channels_per_depth=(4, 8, 8, 8), num_blocks=1
)


def make_model(rng):
    model = ddpm_models.UNet(**TINY)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1, 2], jnp.int32)
    params = model.init(rng, x, t)
    return model, params


class TestUNetFeatureAPI:
    @pytest.mark.slow
    def test_return_features_and_reuse_roundtrip(self, rng):
        model, params = make_model(rng)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        t = jnp.array([5, 5], jnp.int32)
        out, cache = model.apply(params, x, t, return_features=True)
        assert out.shape == (2, 16, 16, 3)
        # decoding with the captured cache at the same t reproduces the output
        out2 = model.apply(params, x, t, cached=cache)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-5)

    def test_cached_ignores_x_but_uses_t(self, rng):
        model, params = make_model(rng)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        t = jnp.array([5, 5], jnp.int32)
        _, cache = model.apply(params, x, t, return_features=True)
        a = model.apply(params, x, t, cached=cache)
        b = model.apply(params, x * 100.0, t, cached=cache)  # x unused
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = model.apply(params, x, jnp.array([9, 9], jnp.int32), cached=cache)
        assert not np.allclose(np.asarray(a), np.asarray(c))  # t matters


class TestCachedDDIM:
    def test_interval1_equals_canonical_ddim(self, rng):
        model, params = make_model(rng)
        fast = CachedDDIM.create(timesteps=100, sub_timesteps=6, refresh_interval=1)
        plain = DDIM.create(timesteps=100, sub_timesteps=6, variant="canonical")
        key = jax.random.PRNGKey(3)
        a = fast.generate(model, params, key, (2, 16, 16, 3))
        # plain.generate splits its rng; replicate the same x_T stream
        x0 = jax.random.normal(key, (2, 16, 16, 3), jnp.float32)
        fn = as_model_fn(model)
        x = x0
        for i in range(6, 0, -1):
            x = plain.sampling_step(fn, params, x, jnp.full((2,), i, jnp.int32),
                                    jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(a), np.asarray(x), rtol=1e-4, atol=1e-5)

    def test_interval2_close_but_not_equal(self, rng):
        model, params = make_model(rng)
        fast = CachedDDIM.create(timesteps=100, sub_timesteps=6, refresh_interval=2)
        exact = CachedDDIM.create(timesteps=100, sub_timesteps=6, refresh_interval=1)
        key = jax.random.PRNGKey(4)
        a = fast.generate(model, params, key, (2, 16, 16, 3))
        b = exact.generate(model, params, key, (2, 16, 16, 3))
        assert a.shape == b.shape
        assert np.isfinite(np.asarray(a)).all()
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_jittable(self, rng):
        model, params = make_model(rng)
        fast = CachedDDIM.create(timesteps=100, sub_timesteps=4, refresh_interval=2)
        gen = jax.jit(fast.generate, static_argnums=(0, 3))
        out = gen(model, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        assert out.shape == (2, 16, 16, 3)
