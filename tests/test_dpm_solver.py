"""DPM-Solver++ tests.

The decisive one: order=1 is ALGEBRAICALLY the canonical eta=0 DDIM update
(x <- alpha_prev*x0 + sigma_prev*eps), so the full order-1 trajectory must
match our DDIM sampler step for step.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dmme_tpu.diffusion import DDIM, DPMSolverPP
from dmme_tpu.models import as_model_fn, ddpm as ddpm_models

TINY = dict(
    pos_dim=4, emb_dim=8, num_groups=2, channels_per_depth=(4, 8, 8, 8),
    num_blocks=1,
)


def make_model(rng):
    model = ddpm_models.UNet(**TINY)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1, 2], jnp.int32)
    params = model.init(rng, x, t)
    return as_model_fn(model), params


class TestDPMSolverPP:
    def test_order1_equals_canonical_ddim(self, rng):
        model_fn, params = make_model(rng)
        kw = dict(timesteps=100, sub_timesteps=10, tau_schedule="quadratic")
        ddim = DDIM.create(variant="canonical", eta=0.0, **kw)
        dpm = DPMSolverPP.create(order=1, **kw)
        key = jax.random.PRNGKey(7)
        a = ddim.generate(model_fn, params, key, (2, 16, 16, 3))
        b = dpm.generate(model_fn, params, key, (2, 16, 16, 3))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)

    def test_degenerate_tau_entry_finite(self, rng):
        """τ_1 = 0 (quadratic tables at T/S² < 0.5) repeats τ_0 = 0, making
        the τ=0→0 step's s_p/s_t = 0/0 before the identity guard
        (round-3 review finding)."""
        model_fn, params = make_model(rng)
        algo = DPMSolverPP.create(timesteps=100, sub_timesteps=50,
                                  tau_schedule="quadratic", order=2)
        assert int(algo.tau[1]) == 0
        out = algo.generate(model_fn, params, jax.random.PRNGKey(0),
                            (2, 16, 16, 3))
        assert np.isfinite(np.asarray(out)).all()

    def test_order2_finite_and_distinct(self, rng):
        model_fn, params = make_model(rng)
        kw = dict(timesteps=100, sub_timesteps=10)
        one = DPMSolverPP.create(order=1, **kw)
        two = DPMSolverPP.create(order=2, **kw)
        key = jax.random.PRNGKey(3)
        a = one.generate(model_fn, params, key, (2, 16, 16, 3))
        b = two.generate(model_fn, params, key, (2, 16, 16, 3))
        assert np.isfinite(np.asarray(b)).all()
        # the 2nd-order correction must actually do something
        assert float(jnp.max(jnp.abs(a - b))) > 1e-6

    def test_final_step_is_first_order(self, rng):
        """lower_order_final regression: with S=2 every order-2 step falls
        back to first order (step 1 has no history, step 2 is final), so
        order=2 must equal order=1 EXACTLY. Before the t_prev==0 guard the
        final step ran the 2nd-order branch with 1/(2r) ≈ 39 (the sigma
        clamp made λ(τ=0) finite), amplifying the last update ~39×."""
        model_fn, params = make_model(rng)
        kw = dict(timesteps=100, sub_timesteps=2)
        one = DPMSolverPP.create(order=1, **kw)
        two = DPMSolverPP.create(order=2, **kw)
        key = jax.random.PRNGKey(11)
        a = one.generate(model_fn, params, key, (2, 16, 16, 3))
        b = two.generate(model_fn, params, key, (2, 16, 16, 3))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)

    def test_jittable_and_shape(self, rng):
        model_fn, params = make_model(rng)
        dpm = DPMSolverPP.create(timesteps=50, sub_timesteps=5)
        gen = jax.jit(dpm.generate, static_argnums=(0, 3))
        out = gen(model_fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_linear_tau_variant(self, rng):
        model_fn, params = make_model(rng)
        dpm = DPMSolverPP.create(
            timesteps=100, sub_timesteps=8, tau_schedule="linear"
        )
        out = dpm.generate(model_fn, params, jax.random.PRNGKey(1), (1, 16, 16, 3))
        assert np.isfinite(np.asarray(out)).all()


class TestEpsOnlyAdapter:
    @pytest.mark.slow
    def test_iddpm_model_drives_fast_samplers(self):
        """IDDPM's 2C-channel (eps || v) output drives DDIM and DPM-Solver++
        through models.eps_only (capability the reference lacks: its IDDPM
        samples only through the ancestral loop)."""
        import jax
        import jax.numpy as jnp

        from dmme_tpu.diffusion import DDIM, DPMSolverPP
        from dmme_tpu.models import as_model_fn, eps_only, iddpm as iddpm_models

        model = iddpm_models.UNet(
            pos_dim=4, emb_dim=8, num_groups=2,
            channels_per_depth=(4, 8, 8, 8), num_blocks=1,
        )
        x = jnp.zeros((2, 8, 8, 3), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        fn = eps_only(as_model_fn(model))
        assert fn(params, x, t).shape == (2, 8, 8, 3)

        for algo in (
            DDIM.create(20, sub_timesteps=4),
            DPMSolverPP.create(20, sub_timesteps=4),
        ):
            out = algo.generate(fn, params, jax.random.PRNGKey(1), (2, 8, 8, 3))
            assert out.shape == (2, 8, 8, 3)
            assert bool(jnp.all(jnp.isfinite(out)))


class TestDPMHistory:
    def test_history_contract(self):
        """history_length works like the other samplers (Lit drop-in)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from dmme_tpu.diffusion import DPMSolverPP

        def model(params, x, t, train=False, rngs=None):
            return jnp.tanh(x)

        algo = DPMSolverPP.create(20, sub_timesteps=5)
        x0, hist = algo.generate(
            model, None, jax.random.PRNGKey(0), (2, 4, 4, 3), history_length=3
        )
        assert hist.shape == (3, 2, 4, 4, 3)
        np.testing.assert_allclose(np.asarray(hist[-1]), np.asarray(x0), atol=0)
        # without history: same final state
        x0_plain = algo.generate(model, None, jax.random.PRNGKey(0), (2, 4, 4, 3))
        np.testing.assert_allclose(np.asarray(x0_plain), np.asarray(x0), atol=0)
