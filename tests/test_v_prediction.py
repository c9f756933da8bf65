"""v-prediction (Salimans & Ho 2022) — algebraic exactness + sampler equivalence.

Key property under test: a v-network and an ε-network related by the exact
conversion v = √ᾱ·ε − √(1−ᾱ)·x₀ must drive every sampler to IDENTICAL
outputs (the adapters are algebraic inverses, not approximations), and the
v-loss of the exact-target model must be 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dmme_tpu.equations as eq
from dmme_tpu.diffusion import DDIM, DDPM, DPMSolverPP
from dmme_tpu.training import LitDDPM


def test_v_roundtrip_exact():
    """eps_from_v(v_target(x0, ᾱ, ε), q_sample(x0, ᾱ, ε), ᾱ) == ε to roundoff."""
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(4, 3, 3, 2), jnp.float32)
    noise = jnp.asarray(rng.randn(4, 3, 3, 2), jnp.float32)
    ab = jnp.asarray([0.01, 0.3, 0.9, 0.999], jnp.float32).reshape(4, 1, 1, 1)
    x_t = eq.ddpm.q_sample(x0, ab, noise)
    v = eq.ddpm.v_target(x0, ab, noise)
    back = eq.ddpm.eps_from_v(v, x_t, ab)
    np.testing.assert_allclose(np.asarray(back), np.asarray(noise), atol=1e-5)


def _paired_models(key):
    """A fixed random ε-'network' and its exact v-twin.

    eps_model is a deterministic function of (x, t); v_model converts its
    output through the algebra so both parameterizations describe the SAME
    denoiser. Needs the schedule to convert, hence the factory.
    """
    shift = float(jax.random.uniform(key, ()))

    def eps_model(params, x, t, train=False, rngs=None):
        mix = 0.5 * x + 0.3 * jnp.roll(x, 1, axis=-1) + shift
        return jnp.tanh(mix) + 0.01 * t.reshape((-1,) + (1,) * (x.ndim - 1))

    def make_v_model(schedule):
        def v_model(params, x, t, train=False, rngs=None):
            ab = schedule.alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
            eps = eps_model(params, x, t)
            # v = (ε − √(1−ᾱ)·x_t)/√ᾱ  (inverse of eps_from_v)
            return (eps - jnp.sqrt(1.0 - ab) * x) / jnp.sqrt(jnp.maximum(ab, 1e-20))

        return v_model

    return eps_model, make_v_model


@pytest.mark.parametrize("algo_name", ["ddpm", "ddim", "dpm"])
def test_sampler_equivalence_eps_vs_v(algo_name):
    """Same denoiser expressed in both parameterizations ⇒ same samples."""
    key = jax.random.PRNGKey(0)
    eps_model, make_v_model = _paired_models(key)
    T = 20
    if algo_name == "ddpm":
        a_eps = DDPM.create(T)
        a_v = DDPM.create(T, parameterization="v")
    elif algo_name == "ddim":
        a_eps = DDIM.create(T, sub_timesteps=5)
        a_v = DDIM.create(T, sub_timesteps=5, parameterization="v")
    else:
        a_eps = DPMSolverPP.create(T, sub_timesteps=5)
        a_v = DPMSolverPP.create(T, sub_timesteps=5, parameterization="v")
    v_model = make_v_model(a_eps.schedule)

    shape = (2, 4, 4, 3)
    gkey = jax.random.PRNGKey(7)
    out_eps = a_eps.generate(eps_model, None, gkey, shape)
    out_v = a_v.generate(v_model, None, gkey, shape)
    np.testing.assert_allclose(
        np.asarray(out_v), np.asarray(out_eps), atol=2e-4
    )


def test_v_loss_zero_for_exact_target():
    algo = DDPM.create(50, parameterization="v")
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(3, 4, 4, 2), jnp.float32)
    noise = jnp.asarray(rng.randn(3, 4, 4, 2), jnp.float32)
    t = jnp.asarray([1, 20, 49], jnp.int32)

    def oracle(params, x, tt, train=False, rngs=None):
        ab = algo.schedule.alpha_bar[tt].reshape((-1,) + (1,) * (x.ndim - 1))
        # reconstruct (x0, ε) from the closure — the oracle returns the exact v
        return eq.ddpm.v_target(x0, ab, noise)

    loss = float(algo.loss_given(oracle, None, x0, t, noise))
    assert loss == pytest.approx(0.0, abs=1e-10)


def test_lit_ddpm_v_trains():
    from dmme_tpu.models import ddpm as ddpm_models

    lit = LitDDPM(
        model=ddpm_models.UNet(
            pos_dim=4, emb_dim=8, num_groups=2,
            channels_per_depth=(4, 8, 8, 8), num_blocks=1,
        ),
        timesteps=10,
        warmup=10,
        parameterization="v",
    )
    assert lit.diffusion_model.parameterization == "v"
    state = lit.init_state(jax.random.PRNGKey(0), img_size=8)
    loss_fn = lit.make_loss_fn()
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(p, jax.random.PRNGKey(1), x)
    )(state.params)
    assert jnp.isfinite(loss)
    assert all(
        bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads)
    )


class TestMinSNR:
    """Min-SNR-γ loss weighting (Hang et al. 2023)."""

    def test_weight_formula_golden(self):
        ab = np.asarray([0.001, 0.5, 0.9, 0.9999], np.float64)
        s = ab / (1 - ab)
        got_eps = np.asarray(eq.ddpm.min_snr_weight(jnp.asarray(ab, jnp.float32), 5.0))
        got_v = np.asarray(
            eq.ddpm.min_snr_weight(jnp.asarray(ab, jnp.float32), 5.0, "v")
        )
        # rtol 1e-3: at ᾱ=0.9999 the f32 computation of 1−ᾱ loses ~4 digits
        np.testing.assert_allclose(got_eps, np.minimum(s, 5.0) / s, rtol=1e-3)
        np.testing.assert_allclose(got_v, np.minimum(s, 5.0) / (s + 1), rtol=1e-3)

    def test_huge_gamma_equals_uniform_eps(self):
        """γ → ∞ ⇒ w ≡ 1 on the ε objective ⇒ loss == unweighted L_simple."""
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(3, 4, 4, 2), jnp.float32)
        noise = jnp.asarray(rng.randn(3, 4, 4, 2), jnp.float32)
        t = jnp.asarray([1, 25, 49], jnp.int32)

        def model(params, x, tt, train=False, rngs=None):
            return 0.3 * x

        plain = DDPM.create(50)
        weighted = DDPM.create(50, snr_gamma=1e9)
        l0 = float(plain.loss_given(model, None, x0, t, noise))
        l1 = float(weighted.loss_given(model, None, x0, t, noise))
        assert l1 == pytest.approx(l0, rel=1e-6)

    def test_weighted_loss_matches_manual(self):
        rng = np.random.RandomState(1)
        x0 = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
        noise = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
        t = jnp.asarray([3, 40], jnp.int32)
        gamma = 5.0

        def model(params, x, tt, train=False, rngs=None):
            return 0.1 * x + 0.05

        algo = DDPM.create(50, snr_gamma=gamma)
        got = float(algo.loss_given(model, None, x0, t, noise))

        ab = np.asarray(algo.schedule.alpha_bar)[np.asarray(t)][:, None, None, None]
        x_t = np.sqrt(ab) * np.asarray(x0) + np.sqrt(1 - ab) * np.asarray(noise)
        err = np.asarray(noise) - (0.1 * x_t + 0.05)
        s = ab / (1 - ab)
        w = np.minimum(s, gamma) / s
        want = float((w * err**2).mean())
        assert got == pytest.approx(want, rel=1e-5)

    def test_lit_ddim_forwards_snr_gamma(self):
        """Regression: LitDDIM builds its own DDIM before super().__init__,
        so snr_gamma must be forwarded explicitly (it was once dropped)."""
        from dmme_tpu.training import LitDDIM

        lit = LitDDIM(timesteps=10, sample_steps=5, snr_gamma=3.0,
                      parameterization="v",
                      model=object())  # model unused for this check
        assert lit.diffusion_model.snr_gamma == 3.0
        assert lit.diffusion_model.parameterization == "v"

    def test_lit_snr_gamma_trains(self):
        from dmme_tpu.models import ddpm as ddpm_models

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1,
            ),
            timesteps=10, warmup=10, parameterization="v", snr_gamma=5.0,
        )
        assert lit.diffusion_model.snr_gamma == 5.0
        state = lit.init_state(jax.random.PRNGKey(0), img_size=8)
        loss = lit.make_loss_fn()(
            state.params, jax.random.PRNGKey(1), jnp.zeros((2, 8, 8, 3), jnp.float32)
        )
        assert jnp.isfinite(loss)
