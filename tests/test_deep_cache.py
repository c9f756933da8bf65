"""DeepCache-style sampler — exactness at interval 1, approximation beyond.

Same test strategy as CachedDDIM (tests/test_fast_sampler.py): the
refresh_interval=1 path must be EXACTLY canonical DDIM; interval > 1 is
close but not equal; the UNet-level split is exact when the deep feature
comes from the same timestep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.diffusion import DDIM, DPMSolverPP, DeepCachedDDIM, DeepCachedDPM
from dmme_tpu.models import as_model_fn, ddpm as ddpm_models

TINY = dict(
    pos_dim=4, emb_dim=8, num_groups=2, channels_per_depth=(4, 8, 16, 32),
    num_blocks=2,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = ddpm_models.UNet(**TINY)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.zeros((2,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
    return model, params


class TestUNetDeepSplit:
    @pytest.mark.parametrize("depth", [1, 2, 3])
    def test_same_t_reuse_is_exact(self, model_and_params, depth):
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        t = jnp.asarray([3, 7], jnp.int32)
        plain = model.apply(params, x, t)
        full, deep = model.apply(params, x, t, cache_depth=depth, return_deep=True)
        np.testing.assert_allclose(np.asarray(full), np.asarray(plain), atol=1e-6)
        reuse = model.apply(params, x, t, cache_depth=depth, deep_cache=deep)
        np.testing.assert_allclose(np.asarray(reuse), np.asarray(plain), atol=1e-5)


class TestDeepCachedDDIM:
    def test_interval1_equals_canonical_ddim(self, model_and_params):
        model, params = model_and_params
        algo = DeepCachedDDIM.create(timesteps=40, sub_timesteps=6,
                                     refresh_interval=1)
        ddim = DDIM.create(timesteps=40, sub_timesteps=6)
        key = jax.random.PRNGKey(2)
        # DDIM.generate splits rng; DeepCachedDDIM uses it directly (same
        # contract as CachedDDIM) — drive both from the same x_T instead
        out_a = algo.generate(model, params, key, (2, 32, 32, 3))
        x_t = jax.random.normal(key, (2, 32, 32, 3), jnp.float32)
        out_b = x_t
        for i in range(6, 0, -1):
            out_b = ddim.sampling_step(
                as_model_fn(model), params, out_b, jnp.full((2,), i, jnp.int32),
                jax.random.PRNGKey(0),
            )
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=2e-4
        )

    def test_interval2_close_but_not_equal(self, model_and_params):
        model, params = model_and_params
        key = jax.random.PRNGKey(3)
        exact = DeepCachedDDIM.create(timesteps=40, sub_timesteps=6,
                                      refresh_interval=1)
        approx = DeepCachedDDIM.create(timesteps=40, sub_timesteps=6,
                                       refresh_interval=2, cache_depth=2)
        a = np.asarray(exact.generate(model, params, key, (2, 32, 32, 3)))
        b = np.asarray(approx.generate(model, params, key, (2, 32, 32, 3)))
        assert np.all(np.isfinite(b))
        assert not np.allclose(a, b, atol=1e-6)      # it IS an approximation
        assert np.abs(a - b).mean() < 0.5 * np.abs(a).mean()  # but close


class TestDeepCachedDPM:
    def test_interval1_equals_canonical_dpm(self, model_and_params):
        model, params = model_and_params
        algo = DeepCachedDPM.create(timesteps=40, sub_timesteps=6,
                                    refresh_interval=1)
        dpm = DPMSolverPP.create(timesteps=40, sub_timesteps=6)
        key = jax.random.PRNGKey(4)
        # both split the rng the same way -> identical x_T trajectory
        a = algo.generate(model, params, key, (2, 32, 32, 3))
        b = dpm.generate(as_model_fn(model), params, key, (2, 32, 32, 3))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_interval2_close_but_not_equal(self, model_and_params):
        model, params = model_and_params
        key = jax.random.PRNGKey(5)
        exact = DeepCachedDPM.create(timesteps=40, sub_timesteps=6,
                                     refresh_interval=1)
        approx = DeepCachedDPM.create(timesteps=40, sub_timesteps=6,
                                      refresh_interval=2, cache_depth=2)
        a = np.asarray(exact.generate(model, params, key, (2, 32, 32, 3)))
        b = np.asarray(approx.generate(model, params, key, (2, 32, 32, 3)))
        assert np.all(np.isfinite(b))
        assert not np.allclose(a, b, atol=1e-6)
        assert np.abs(a - b).mean() < 0.5 * np.abs(a).mean()

    def test_degenerate_tau_entry_finite(self, model_and_params):
        """Same τ_1 = 0 identity-step guard as DPMSolverPP (round-3
        review finding)."""
        model, params = model_and_params
        algo = DeepCachedDPM.create(timesteps=40, sub_timesteps=20,
                                    refresh_interval=2)
        assert int(algo.tau[1]) == 0
        out = algo.generate(model, params, jax.random.PRNGKey(0),
                            (2, 32, 32, 3))
        assert np.isfinite(np.asarray(out)).all()

    def test_factory_builds_deep_dpm_with_trained_schedule(self):
        from dmme_tpu.diffusion import DDPM
        from dmme_tpu.diffusion.factory import make_module_sampler

        base = DDPM.create(timesteps=40)
        algo = make_module_sampler(base, "deep_dpm", 6, cache_depth=2)
        assert isinstance(algo, DeepCachedDPM)
        assert algo.sub_timesteps == 6 and algo.cache_depth == 2
        assert not algo.clip_x0  # linear schedule: parity preserved
        np.testing.assert_array_equal(
            np.asarray(algo.schedule.alpha_bar), np.asarray(base.schedule.alpha_bar)
        )
