"""RePaint-style inpainting (diffusion/inpaint.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.diffusion import DDPM, IDDPM, inpaint
from dmme_tpu.models import as_model_fn

from tests.test_diffusion import TinyDenoiser

SHAPE = (2, 16, 16, 3)


@pytest.fixture
def setup(rng):
    model = TinyDenoiser()
    params = model.init(rng, jnp.zeros(SHAPE), jnp.array([1, 2], jnp.int32))
    algo = DDPM.create(timesteps=20)
    known = jnp.tile(
        jnp.linspace(-0.5, 0.5, 16)[None, :, None, None], (2, 1, 16, 3)
    ).transpose(0, 2, 1, 3)
    mask = jnp.zeros((1, 16, 16, 1)).at[:, :, :8, :].set(1.0)  # left half known
    return algo, as_model_fn(model), params, known, mask


class TestInpaint:
    def test_known_region_restored_exactly(self, setup):
        """The final composite runs q_sample at t−1 = 0 where ᾱ = 1 (the
        sentinel row), so known pixels come back bit-near-exactly."""
        algo, fn, params, known, mask = setup
        out = jax.jit(
            lambda p, k: inpaint(algo, fn, p, k, known=known, mask=mask)
        )(params, jax.random.PRNGKey(0))
        out = np.asarray(out)
        np.testing.assert_allclose(
            out[:, :, :8], np.asarray(known)[:, :, :8], atol=1e-5
        )
        assert np.isfinite(out).all()
        # the generated half must actually be generated, not copied
        assert np.abs(out[:, :, 8:] - np.asarray(known)[:, :, 8:]).max() > 0.05

    def test_known_content_conditions_generation(self, setup):
        """The model sees the composited known pixels at every step, so a
        different known image must change the GENERATED region too."""
        algo, fn, params, known, mask = setup
        out_a = inpaint(algo, fn, params, jax.random.PRNGKey(0),
                        known=known, mask=mask)
        out_b = inpaint(algo, fn, params, jax.random.PRNGKey(0),
                        known=-known, mask=mask)
        a = np.asarray(out_a)[:, :, 8:]
        b = np.asarray(out_b)[:, :, 8:]
        assert np.abs(a - b).max() > 1e-3

    def test_resample_harmonization(self, setup):
        algo, fn, params, known, mask = setup
        one = inpaint(algo, fn, params, jax.random.PRNGKey(1),
                      known=known, mask=mask, resample_steps=1)
        two = inpaint(algo, fn, params, jax.random.PRNGKey(1),
                      known=known, mask=mask, resample_steps=2)
        one, two = np.asarray(one), np.asarray(two)
        assert np.isfinite(two).all()
        # harmonization changes the generated region but not the known one
        assert np.abs(one[:, :, 8:] - two[:, :, 8:]).max() > 1e-4
        np.testing.assert_allclose(two[:, :, :8], np.asarray(known)[:, :, :8],
                                   atol=1e-5)

    def test_works_with_learned_variance_iddpm(self, rng):
        model = TinyDenoiser(out_channels=6)
        params = model.init(rng, jnp.zeros(SHAPE), jnp.array([1, 2], jnp.int32))
        algo = IDDPM.create(timesteps=20)
        known = jnp.zeros(SHAPE)
        mask = jnp.ones((1, 16, 16, 1)).at[:, 4:12, 4:12, :].set(0.0)
        out = inpaint(algo, as_model_fn(model), params, jax.random.PRNGKey(2),
                      known=known, mask=mask)
        out = np.asarray(out)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[:, :2, :2], 0.0, atol=1e-5)
