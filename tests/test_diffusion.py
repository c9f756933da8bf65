"""Algorithm-level tests for DDPM / DDIM / IDDPM / guidance.

Follows the reference's test strategy (tiny stand-in denoisers, shape and
NaN checks, t==1 edge via tiny T — SURVEY.md §4) and adds what it lacks:
analytic golden checks of the sampler update and determinism-under-rng.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dmme_tpu.diffusion import (
    DDPM,
    DDIM,
    IDDPM,
    ClassifierGuidedDDPM,
    ClassifierGuidedDDIM,
    classifier_grad,
)
from dmme_tpu.models import as_model_fn
from dmme_tpu.models.blocks import sinusoidal_position_embedding


class TinyDenoiser(nn.Module):
    """2-conv stand-in for the UNet (reference pattern:
    tests/test_guidance.py:41-56)."""

    out_channels: int = 3

    @nn.compact
    def __call__(self, x, t, *, train=False):
        emb = sinusoidal_position_embedding(t, 8)
        h = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))(x)
        h = h + nn.Dense(8)(emb)[:, None, None, :]
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)))(h)


class TinyClassifier(nn.Module):
    """Noisy classifier stand-in (reference: tests/test_guidance.py:59-72)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, t, *, train=False):
        emb = sinusoidal_position_embedding(t, 8)
        h = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))(x)
        h = h + nn.Dense(8)(emb)[:, None, None, :]
        h = nn.silu(h).mean(axis=(1, 2))
        return nn.Dense(self.num_classes)(h)


@pytest.fixture
def denoiser(rng):
    model = TinyDenoiser()
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1, 2], dtype=jnp.int32)
    params = model.init(rng, x, t)
    return as_model_fn(model), params


@pytest.fixture
def iddpm_denoiser(rng):
    model = TinyDenoiser(out_channels=6)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1, 2], dtype=jnp.int32)
    params = model.init(rng, x, t)
    return as_model_fn(model), params


class TestDDPM:
    def test_loss_finite_scalar_and_differentiable(self, denoiser, rng):
        fn, params = denoiser
        algo = DDPM.create(timesteps=100)
        x0 = jax.random.normal(rng, (3, 16, 16, 3))

        def loss_fn(p):
            return algo.loss(fn, p, jax.random.PRNGKey(1), x0)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert loss.shape == ()
        assert np.isfinite(loss)
        assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))

    def test_sampling_step_shape(self, denoiser, rng):
        fn, params = denoiser
        algo = DDPM.create(timesteps=100)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        out = jax.jit(algo.sampling_step, static_argnums=0)(
            fn, params, x, jnp.full((2,), 50, jnp.int32), jax.random.PRNGKey(2)
        )
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_t1_step_is_deterministic_mean(self, denoiser, rng):
        fn, params = denoiser
        algo = DDPM.create(timesteps=100)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        t1 = jnp.ones((2,), jnp.int32)
        a = algo.sampling_step(fn, params, x, t1, jax.random.PRNGKey(0))
        b = algo.sampling_step(fn, params, x, t1, jax.random.PRNGKey(999))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_sampling_step_mean_formula(self, rng):
        """With a zero-output denoiser the update mean is x/sqrt(alpha_t)."""
        algo = DDPM.create(timesteps=10)

        def zero_fn(params, x, t, **kw):
            return jnp.zeros_like(x)

        x = jax.random.normal(rng, (2, 8, 8, 3))
        t = jnp.full((2,), 1, jnp.int32)  # t=1: returns the mean exactly
        out = algo.sampling_step(zero_fn, None, x, t, jax.random.PRNGKey(0))
        alpha_1 = np.asarray(algo.schedule.alpha)[1]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x) / np.sqrt(alpha_1), rtol=1e-5
        )

    def test_generate_shape_and_determinism(self, denoiser):
        fn, params = denoiser
        algo = DDPM.create(timesteps=20)
        gen = jax.jit(algo.generate, static_argnums=(0, 3))
        a = gen(fn, params, jax.random.PRNGKey(7), (2, 16, 16, 3))
        b = gen(fn, params, jax.random.PRNGKey(7), (2, 16, 16, 3))
        assert a.shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_generate_history(self, denoiser):
        fn, params = denoiser
        algo = DDPM.create(timesteps=20)
        x0, hist = algo.generate(
            fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3), history_length=5
        )
        assert hist.shape == (5, 2, 16, 16, 3)
        # final frame is the final sample
        np.testing.assert_allclose(np.asarray(hist[-1]), np.asarray(x0), rtol=1e-6)
        # all frames populated (no all-zero frame)
        assert all(np.abs(np.asarray(f)).sum() > 0 for f in np.asarray(hist))

    def test_timestep_sampling_range(self):
        algo = DDPM.create(timesteps=10)
        t = algo.sample_timesteps(jax.random.PRNGKey(0), 2000)
        t = np.asarray(t)
        assert t.min() >= 1
        assert t.max() <= 9  # never samples T (reference parity)


class TestDDIM:
    def test_generate_shape(self, denoiser):
        fn, params = denoiser
        algo = DDIM.create(timesteps=100, sub_timesteps=5)
        out = jax.jit(algo.generate, static_argnums=(0, 3))(
            fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3)
        )
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_variants_differ(self, denoiser):
        fn, params = denoiser
        ref = DDIM.create(timesteps=100, sub_timesteps=5, variant="reference")
        canon = DDIM.create(timesteps=100, sub_timesteps=5, variant="canonical")
        a = ref.generate(fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        b = canon.generate(fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_deterministic_sampler_ignores_rng(self, denoiser):
        fn, params = denoiser
        algo = DDIM.create(timesteps=100, sub_timesteps=5)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        i = jnp.full((2,), 3, jnp.int32)
        a = algo.sampling_step(fn, params, x, i, jax.random.PRNGKey(0))
        b = algo.sampling_step(fn, params, x, i, jax.random.PRNGKey(42))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_training_inherited_from_ddpm(self, denoiser, rng):
        fn, params = denoiser
        algo = DDIM.create(timesteps=100, sub_timesteps=5)
        loss = algo.loss(fn, params, rng, jax.random.normal(rng, (2, 16, 16, 3)))
        assert np.isfinite(loss)

    @pytest.mark.parametrize("eta", [0.0, 0.5])
    def test_degenerate_tau_entry_finite(self, denoiser, eta):
        """Quadratic τ tables have τ_1 = 0 whenever T/S² < 0.5 — including
        the reference's own T=1000/S=50 DDIM config. The ᾱ_{τ_1} = 1
        sentinel made the canonical update compute η·inf = NaN (for ANY η,
        0 included) until round 3; the whole sample came out NaN
        (round-3 review finding)."""
        fn, params = denoiser
        algo = DDIM.create(timesteps=100, sub_timesteps=50,
                           tau_schedule="quadratic", eta=eta)
        assert int(algo.tau[1]) == 0  # the degenerate entry under test
        out = jax.jit(algo.generate, static_argnums=(0, 3))(
            fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3)
        )
        assert np.isfinite(np.asarray(out)).all()


class TestIDDPM:
    @pytest.mark.parametrize("loss_type", ["hybrid", "simple", "vlb"])
    def test_losses_finite_and_differentiable(self, iddpm_denoiser, rng, loss_type):
        fn, params = iddpm_denoiser
        # T=2 forces the t==1 edge case (reference: tests/test_iddpm.py:27-34)
        algo = IDDPM.create(timesteps=2, loss_type=loss_type)
        x0 = jnp.clip(jax.random.normal(rng, (4, 16, 16, 3)) * 0.5, -1, 1)

        def loss_fn(p):
            return algo.loss(fn, p, jax.random.PRNGKey(3), x0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(loss), loss_type
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves), loss_type
        assert any(np.abs(np.asarray(g)).sum() > 0 for g in leaves), loss_type

    def test_cosine_sampling_step(self, iddpm_denoiser, rng):
        fn, params = iddpm_denoiser
        algo = IDDPM.create(timesteps=100)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        out = algo.sampling_step(fn, params, x, jnp.full((2,), 50, jnp.int32), jax.random.PRNGKey(0))
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_generate(self, iddpm_denoiser):
        # Shape-only (matching the reference's test): with an UNTRAINED net
        # the cosine schedule's clipped tail (beta_T = 0.999 => 1/sqrt(alpha_T)
        # ~ 31x) amplifies ancestral samples to overflow; only a trained
        # denoiser cancels it. Finiteness is covered by the linear variant.
        fn, params = iddpm_denoiser
        algo = IDDPM.create(timesteps=10)
        out = algo.generate(fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        assert out.shape == (2, 16, 16, 3)

    def test_generate_linear_finite(self, iddpm_denoiser):
        fn, params = iddpm_denoiser
        algo = IDDPM.create(timesteps=10, schedule="linear")
        out = algo.generate(fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("loss_type", ["hybrid", "vlb"])
    def test_extreme_variance_head_gradient_finite(self, iddpm_denoiser, rng, loss_type):
        """Regression: an unconstrained v head at t==1 (where beta_tilde == 0)
        interpolates the variance across e^±60; (sigma_q/sigma_p)^2 underflowed
        to 0, log(0) = -inf in the where-masked KL branch, and the backward
        pass NaN'd through 0*inf — a real T=5 CLI fit hit NaN grads at step 2.
        The fix: kl_divergence takes the log term from the stds, and
        interpolate_variance clamps the log-variance to the finite-exp range."""
        fn, params = iddpm_denoiser

        def wild_fn(p, x, t, **kw):
            out = fn(p, x, t, **kw)
            eps, v = jnp.split(out, 2, axis=-1)
            # push v far outside [0, 1]: underflow AND overflow pixels
            return jnp.concatenate([eps, v * 50.0], axis=-1)

        algo = IDDPM.create(timesteps=5, loss_type=loss_type)
        x0 = jnp.clip(jax.random.normal(rng, (4, 16, 16, 3)) * 0.5, -1, 1)
        # t == 1 for every sample: the exact poisoned branch
        t = jnp.ones((4,), jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        loss, grads = jax.value_and_grad(
            lambda p: algo.loss_given(wild_fn, p, x0, t, noise)
        )(params)
        assert np.isfinite(loss), loss_type
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves), loss_type

    def test_linear_schedule_variant(self, iddpm_denoiser, rng):
        fn, params = iddpm_denoiser
        algo = IDDPM.create(timesteps=100, schedule="linear")
        loss = algo.loss(fn, params, rng, jax.random.normal(rng, (2, 16, 16, 3)))
        assert np.isfinite(loss)


class TestClipX0:
    """Sampler-override robustness on near-zero terminal ᾱ schedules.

    A trained cosine-schedule IDDPM (ᾱ_T ≈ 2e-15) sampled through the
    DDIM/DPM overrides NaN'd / emitted noise on hardware: the x̂₀
    division at t=T amplifies ε error by ~1/√ᾱ_T ≈ 2e7. The factory
    auto-enables the official-IDDPM ``clip_denoised`` remedy exactly for
    those schedules, and MUST leave it off for linear schedules to keep
    bit-parity with the reference solvers."""

    def test_factory_enables_clip_for_cosine_only(self):
        from dmme_tpu.diffusion import make_sampler

        cosine = IDDPM.create(timesteps=50)
        linear = DDPM.create(timesteps=50)
        for name in ("ddim", "dpm"):
            algo_c, _ = make_sampler(cosine, name, 5)
            algo_l, _ = make_sampler(linear, name, 5)
            assert algo_c.clip_x0, (name, "cosine")
            assert not algo_l.clip_x0, (name, "linear")

    @pytest.mark.parametrize("name", ["ddim", "dpm"])
    def test_cosine_override_generates_finite(self, iddpm_denoiser, name):
        from dmme_tpu.diffusion import make_sampler

        fn, params = iddpm_denoiser
        base = IDDPM.create(timesteps=50)
        algo, adapt = make_sampler(base, name, 5)
        out = algo.generate(adapt(fn), params, jax.random.PRNGKey(0),
                            (2, 16, 16, 3))
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all(), name

    def test_clip_noop_when_x0_in_range(self, denoiser):
        """On a linear schedule with a bounded x̂₀, clip_x0=True must be a
        numerical no-op — the flag changes robustness, not semantics."""
        fn, params = denoiser

        def small_fn(p, x, t, **kw):
            # keep ε̂ tiny so x̂₀ = (x_t − √(1−ᾱ)ε̂)/√ᾱ stays in [−1, 1]
            # for the in-range x_t this sampler trajectory produces
            return fn(p, x, t, **kw) * 1e-3

        a = DDIM.create(timesteps=50, sub_timesteps=5, variant="canonical")
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.1
        i = jnp.full((2,), 2, jnp.int32)  # τ-table index, mid-trajectory
        with_clip = a.replace(clip_x0=True).sampling_step(
            small_fn, params, x, i, jax.random.PRNGKey(2))
        without = a.sampling_step(small_fn, params, x, i, jax.random.PRNGKey(2))
        np.testing.assert_allclose(
            np.asarray(with_clip), np.asarray(without), rtol=1e-5
        )


class TestGuidance:
    @pytest.fixture
    def classifier(self, rng):
        model = TinyClassifier()
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([1, 2], dtype=jnp.int32)
        params = model.init(jax.random.fold_in(rng, 99), x, t)
        return as_model_fn(model), params

    def test_classifier_grad_shape_and_per_sample(self, classifier, rng):
        cfn, cparams = classifier
        x = jax.random.normal(rng, (3, 16, 16, 3))
        t = jnp.full((3,), 5, jnp.int32)
        y = jnp.array([0, 3, 7], jnp.int32)
        g = classifier_grad(cfn, cparams, y, x, t)
        assert g.shape == x.shape
        assert np.isfinite(np.asarray(g)).all()
        # per-sample property: changing sample j's label must not change
        # sample i's gradient (the reference's [:, y] indexing violates this)
        y2 = y.at[2].set(1)
        g2 = classifier_grad(cfn, cparams, y2, x, t)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g2[0]), rtol=1e-6)
        assert not np.allclose(np.asarray(g[2]), np.asarray(g2[2]))

    def test_guided_ddpm_generate(self, denoiser, classifier):
        fn, params = denoiser
        cfn, cparams = classifier
        algo = ClassifierGuidedDDPM.create(timesteps=10, guidance_scale=1.0)
        y = jnp.array([1, 2], jnp.int32)
        out = jax.jit(algo.guided_generate, static_argnums=(0, 2, 6))(
            fn, params, cfn, cparams, y, jax.random.PRNGKey(0), (2, 16, 16, 3)
        )
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_guided_ddim_generate(self, denoiser, classifier):
        fn, params = denoiser
        cfn, cparams = classifier
        algo = ClassifierGuidedDDIM.create(timesteps=100, sub_timesteps=5, guidance_scale=1.0)
        y = jnp.array([1, 2], jnp.int32)
        out = algo.guided_generate(
            fn, params, cfn, cparams, y, jax.random.PRNGKey(0), (2, 16, 16, 3)
        )
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_guidance_changes_output(self, denoiser, classifier):
        fn, params = denoiser
        cfn, cparams = classifier
        guided = ClassifierGuidedDDIM.create(timesteps=100, sub_timesteps=5, guidance_scale=5.0)
        plain = DDIM.create(timesteps=100, sub_timesteps=5, variant="canonical")
        y = jnp.array([1, 2], jnp.int32)
        a = guided.guided_generate(fn, params, cfn, cparams, y, jax.random.PRNGKey(0), (2, 16, 16, 3))
        b = plain.generate(fn, params, jax.random.PRNGKey(0), (2, 16, 16, 3))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestStridedIDDPM:
    """IDDPM §4 fast sampling: schedule respacing with learned variances."""

    def tiny_var_model(self):
        """Deterministic 2C-output stand-in: (eps, v) from a fixed map."""
        import jax.numpy as jnp

        def fn(params, x, t, train=False, rngs=None):
            eps = jnp.tanh(0.5 * x + 0.1)
            v = jnp.zeros_like(x) + 0.3
            return jnp.concatenate([eps, v], axis=-1)

        return fn

    def test_respaced_alpha_bar_matches_original(self):
        algo = IDDPM.create(timesteps=100)
        s = algo.strided(10)
        import numpy as np

        tau = np.asarray(s.timestep_map)
        # all interior points telescope exactly; the final point is
        # beta-clipped to 0.999 exactly as the base cosine schedule's own
        # construction clips (so it cannot match the raw ratio there)
        np.testing.assert_allclose(
            np.asarray(s.schedule.alpha_bar)[:-1],
            np.asarray(algo.schedule.alpha_bar)[tau][:-1],
            rtol=2e-5,
        )
        assert s.timesteps == 10 and s.schedule.beta.shape == (11,)

    def test_identity_stride_reproduces_full_sampler(self):
        import jax
        import numpy as np

        T = 12
        algo = IDDPM.create(timesteps=T)
        s = algo.strided(T)  # identity respacing
        fn = self.tiny_var_model()
        key = jax.random.PRNGKey(0)
        a = algo.generate(fn, None, key, (2, 4, 4, 3))
        b = s.generate(fn, None, key, (2, 4, 4, 3))
        # identical rng stream and math; the respaced β is recomputed from
        # the ᾱ ratio in float64 so values differ only by roundoff (~3e-5
        # relative), amplified through 12 stochastic steps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-3)

    def test_strided_runs_and_conditions_on_original_t(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        T, K = 50, 5
        algo = IDDPM.create(timesteps=T)
        s = algo.strided(K)
        seen = []

        def probe(params, x, t, train=False, rngs=None):
            seen.append(np.asarray(t)[0])
            eps = jnp.zeros_like(x)
            return jnp.concatenate([eps, jnp.zeros_like(x)], axis=-1)

        # trace once (un-jitted steps via sampling_step) to observe t values
        x = jnp.zeros((1, 4, 4, 1), jnp.float32)
        for i in (K, 1):
            s.sampling_step(probe, None, x, i, jax.random.PRNGKey(0))
        tau = np.asarray(s.timestep_map)
        assert seen[0] == tau[K] and seen[1] == tau[1]
        assert tau[K] == T  # last kept point is the full-noise end

        out = s.generate(self.tiny_var_model(), None, jax.random.PRNGKey(1), (2, 4, 4, 3))
        assert out.shape == (2, 4, 4, 3)
        assert bool(jnp.all(jnp.isfinite(out)))
