"""Golden-value and property tests for the equations layer.

The reference only smoke-tests losses for NaN (SURVEY.md §4); here we verify
the schedule tables and process distributions against independent float64
recomputations of the paper formulas, plus torch cross-checks for the
linspace/round semantics the reference relies on.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dmme_tpu.equations as eq
from dmme_tpu.equations.gaussian import Gaussian, kl_divergence


class TestDDPMSchedule:
    def test_linear_schedule_matches_torch_linspace(self):
        import torch

        T = 1000
        beta = np.asarray(eq.ddpm.linear_schedule(T))
        ref = torch.linspace(0.0001, 0.02, T).numpy()
        assert beta.shape == (T + 1,)
        assert beta[0] == 0.0
        np.testing.assert_allclose(beta[1:], ref, rtol=1e-6, atol=1e-9)

    def test_alpha_bar_cumprod(self):
        T = 1000
        sched = eq.ddpm.schedule_from_beta(eq.ddpm.linear_schedule(T))
        beta64 = np.linspace(0.0001, 0.02, T, dtype=np.float64)
        ab64 = np.cumprod(1.0 - beta64)
        assert sched.alpha_bar.shape == (T + 1,)
        assert sched.alpha_bar[0] == 1.0
        np.testing.assert_allclose(np.asarray(sched.alpha_bar)[1:], ab64, rtol=1e-4)
        assert sched.timesteps == T

    def test_forward_process_moments(self, rng):
        x0 = jax.random.normal(rng, (4, 8, 8, 3))
        ab = jnp.full((4, 1, 1, 1), 0.3)
        q = eq.ddpm.forward_process(x0, ab)
        np.testing.assert_allclose(q.mean, np.sqrt(0.3) * np.asarray(x0), rtol=1e-6)
        np.testing.assert_allclose(q.std, np.sqrt(0.7), rtol=1e-6)

    def test_q_sample_equals_forward_process_sample(self, rng):
        x0 = jax.random.normal(rng, (2, 8, 8, 3))
        ab = jnp.full((2, 1, 1, 1), 0.5)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        q = eq.ddpm.forward_process(x0, ab)
        np.testing.assert_allclose(
            eq.ddpm.q_sample(x0, ab, noise), q.mean + q.std * noise, rtol=1e-6
        )

    def test_reverse_process_mean_formula(self, rng):
        x_t = jax.random.normal(rng, (2, 4, 4, 3))
        eps = jax.random.normal(jax.random.fold_in(rng, 1), x_t.shape)
        beta, alpha, ab = 0.01, 0.99, 0.5
        p = eq.ddpm.reverse_process(x_t, beta, alpha, ab, eps, variance=beta)
        want = (np.asarray(x_t) - beta / math.sqrt(1 - ab) * np.asarray(eps)) / math.sqrt(alpha)
        np.testing.assert_allclose(p.mean, want, rtol=1e-5)
        np.testing.assert_allclose(p.std, math.sqrt(beta), rtol=1e-6)

    def test_simple_loss_is_mse(self, rng):
        a = jax.random.normal(rng, (3, 4, 4, 3))
        b = jax.random.normal(jax.random.fold_in(rng, 1), a.shape)
        np.testing.assert_allclose(
            eq.ddpm.simple_loss(a, b), np.mean((np.asarray(a) - np.asarray(b)) ** 2), rtol=1e-6
        )


class TestDDIMTau:
    @pytest.mark.parametrize("T,S", [(1000, 50), (1000, 100), (100, 5)])
    def test_tau_tables_match_torch_round(self, T, S):
        import torch

        lin = np.asarray(eq.ddim.linear_tau(T, S))
        quad = np.asarray(eq.ddim.quadratic_tau(T, S))
        i = torch.arange(0, S + 1)
        np.testing.assert_array_equal(lin, torch.round(T / S * i).long().numpy())
        np.testing.assert_array_equal(
            quad, torch.round(T / S**2 * i**2).long().numpy()
        )
        assert lin[0] == 0 and quad[0] == 0

    def test_karras_tau_properties(self):
        """σ^{1/ρ} spacing on the trained schedule (arXiv:2206.00364):
        length S+1, sentinel 0, endpoints at t=T and the low-noise end,
        monotone, and denser at low noise than at high noise."""
        beta = eq.ddpm.linear_schedule(1000)
        ab = eq.ddpm.schedule_from_beta(beta).alpha_bar
        tau = np.asarray(eq.ddim.karras_tau(ab, 10))
        assert tau.shape == (11,)
        assert tau[0] == 0
        assert tau[1] >= 1  # never maps onto the ᾱ=1 sentinel row
        # σ_max clamps at 80 (EDM default) — the top node sits at the
        # timestep where σ crosses 80, near but not at T
        sigma = np.sqrt((1 - np.asarray(ab)[1:]) / np.asarray(ab)[1:])
        assert abs(np.log(sigma[tau[-1] - 1]) - np.log(80.0)) < 0.05
        assert (np.diff(tau) >= 0).all()
        # ρ=7 concentrates steps at LOW noise: early gaps smaller than late
        assert tau[2] - tau[1] < tau[-1] - tau[-2]
        # dispatcher parity + a loud error for karras without a schedule
        np.testing.assert_array_equal(
            tau, np.asarray(eq.ddim.make_tau("karras", 1000, 10, ab))
        )
        with pytest.raises(ValueError, match="alpha_bar"):
            eq.ddim.make_tau("karras", 1000, 10)

    def test_karras_tau_does_not_collapse_on_cosine(self):
        """Cosine schedules reach σ(T) ≈ 2·10⁷; without the σ_max clamp the
        grid put 6 of 10 nodes past the penultimate timestep (round-3
        review finding). All S real nodes must be distinct at T=1000."""
        ab = eq.iddpm.cosine_schedule(1000)
        tau = np.asarray(eq.ddim.karras_tau(ab, 10))
        assert len(np.unique(tau[1:])) == 10, tau

    def test_canonical_eta0_drops_noise_keeps_direction(self, rng):
        x_t = jax.random.normal(rng, (2, 4, 4, 3))
        eps = jax.random.normal(jax.random.fold_in(rng, 1), x_t.shape)
        ab_t, ab_prev = 0.5, 0.8
        p = eq.ddim.reverse_process_canonical(x_t, ab_t, ab_prev, eps, eta=0.0)
        x0 = (np.asarray(x_t) - math.sqrt(1 - ab_t) * np.asarray(eps)) / math.sqrt(ab_t)
        want = math.sqrt(ab_prev) * x0 + math.sqrt(1 - ab_prev) * np.asarray(eps)
        np.testing.assert_allclose(p.mean, want, rtol=1e-5)
        np.testing.assert_allclose(p.std, 0.0, atol=1e-7)

    def test_canonical_eta1_matches_ddpm_posterior_variance(self):
        ab_t, ab_prev = 0.5, 0.8
        x = jnp.zeros((1, 2, 2, 1))
        p = eq.ddim.reverse_process_canonical(x, ab_t, ab_prev, x, eta=1.0)
        alpha_t = ab_t / ab_prev
        beta_t = 1 - alpha_t
        want_var = (1 - ab_prev) / (1 - ab_t) * beta_t
        np.testing.assert_allclose(np.square(np.asarray(p.std)), want_var, rtol=1e-5)

    def test_reference_variant_reproduces_reference_update(self, rng):
        # The reference divides by sqrt(alpha_bar_{t-1}) and takes the mean of
        # forward_process(x0_hat, alpha_bar_{t-1}): net update
        # x <- x - sqrt(1-ab_t)*eps + sqrt(1-ab_prev)*eps... check exact algebra.
        x_t = jax.random.normal(rng, (2, 4, 4, 3))
        eps = jax.random.normal(jax.random.fold_in(rng, 1), x_t.shape)
        ab_t, ab_prev = 0.5, 0.8
        p = eq.ddim.reverse_process(x_t, ab_t, ab_prev, eps)
        x0_ref = (np.asarray(x_t) - math.sqrt(1 - ab_t) * np.asarray(eps)) / math.sqrt(ab_prev)
        want_mean = math.sqrt(ab_prev) * x0_ref
        np.testing.assert_allclose(p.mean, want_mean, rtol=1e-5)


class TestIDDPM:
    def test_cosine_schedule_values(self):
        T, s = 4000, 0.008
        ab = np.asarray(eq.iddpm.cosine_schedule(T, s))
        t = np.arange(0, T + 1, dtype=np.float64)
        f = np.cos((t / T + s) / (1 + s) * np.pi / 2) ** 2
        want = f / f[0]
        assert ab.shape == (T + 1,)
        assert not np.isnan(ab).any()
        np.testing.assert_allclose(ab, want, rtol=1e-4, atol=1e-6)
        assert ab[0] == 1.0

    def test_cosine_beta_schedule_clip_and_pad(self):
        sched = eq.iddpm.cosine_beta_schedule(4000)
        beta = np.asarray(sched.beta)
        assert beta[0] == 1.0  # padded with 1 (reference diffusion_models/iddpm.py:51-52)
        assert (beta[1:] <= 0.999 + 1e-7).all() and (beta[1:] >= 0).all()
        assert np.asarray(sched.alpha)[0] == 0.0
        # alpha_bar stays the raw cosine curve
        np.testing.assert_allclose(
            np.asarray(sched.alpha_bar), np.asarray(eq.iddpm.cosine_schedule(4000)), rtol=1e-6
        )

    def test_discrete_nll_matches_torch_distributions(self, rng):
        import torch

        x0 = np.clip(np.random.RandomState(0).randn(2, 4, 4, 3) * 0.5, -1, 1).astype(np.float32)
        mean = np.random.RandomState(1).randn(*x0.shape).astype(np.float32) * 0.1
        std = np.full_like(x0, 0.3)
        ours = np.asarray(eq.iddpm.discrete_nll_loss(jnp.asarray(x0), Gaussian(jnp.asarray(mean), jnp.asarray(std))))

        tp = torch.distributions.Normal(torch.tensor(mean), torch.tensor(std))
        tx = torch.tensor(x0)
        f_plus = torch.where(tx < 1, tp.cdf(tx + 1 / 255), torch.ones_like(tx))
        f_minus = torch.where(tx > -1, tp.cdf(tx - 1 / 255), torch.zeros_like(tx))
        want = -torch.log((f_plus - f_minus).clamp(1e-12))
        np.testing.assert_allclose(ours, want.numpy(), rtol=1e-3, atol=1e-5)

    def test_kl_divergence_matches_torch(self):
        import torch

        qm, qs = np.float32(0.3), np.float32(0.5)
        pm, ps = np.float32(-0.2), np.float32(0.8)
        ours = np.asarray(kl_divergence(Gaussian(jnp.asarray(qm), jnp.asarray(qs)), Gaussian(jnp.asarray(pm), jnp.asarray(ps))))
        want = torch.distributions.kl_divergence(
            torch.distributions.Normal(torch.tensor(qm), torch.tensor(qs)),
            torch.distributions.Normal(torch.tensor(pm), torch.tensor(ps)),
        ).numpy()
        np.testing.assert_allclose(ours, want, rtol=1e-4)

    def test_loss_vlb_finite_and_differentiable(self, rng):
        """Exercises the t==1 edge (reference pattern: tests/test_iddpm.py with T=2)."""
        T = 2
        sched = eq.iddpm.cosine_beta_schedule(T)
        n = 4
        t = jnp.array([1, 1, 2, 2], dtype=jnp.int32)
        x0 = jax.random.normal(rng, (n, 4, 4, 3)) * 0.5

        def gather(a):
            return a[t].reshape(n, 1, 1, 1)

        beta_t, alpha_t, ab_t = gather(sched.beta), gather(sched.alpha), gather(sched.alpha_bar)
        ab_prev = sched.alpha_bar[t - 1].reshape(n, 1, 1, 1)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        x_t = eq.ddpm.q_sample(x0, ab_t, noise)

        def loss_fn(eps_and_v):
            eps, v = eps_and_v
            bt = eq.iddpm.beta_tilde(beta_t, ab_t, ab_prev)
            var = eq.iddpm.interpolate_variance(v, beta_t, bt)
            return eq.iddpm.loss_vlb(eps, var, x_t, t, x0, beta_t, alpha_t, ab_t, ab_prev)

        eps = jax.random.normal(jax.random.fold_in(rng, 2), x0.shape)
        v = jnp.full_like(x0, 0.5)
        loss, grads = jax.value_and_grad(loss_fn)((eps, v))
        assert np.isfinite(loss)
        assert np.isfinite(np.asarray(grads[0])).all()
        assert np.isfinite(np.asarray(grads[1])).all()
        # stop-gradient on eps: only the variance head should receive gradient
        assert np.allclose(np.asarray(grads[0]), 0.0)
        assert not np.allclose(np.asarray(grads[1]), 0.0)


class TestPadAndGaussian:
    def test_pad_prepends_value(self):
        x = jnp.ones((3, 2))
        y = eq.ddpm.pad(x, 5.0) if hasattr(eq.ddpm, "pad") else None
        from dmme_tpu.utils import pad

        y = pad(x, 5.0)
        assert y.shape == (4, 2)
        assert (np.asarray(y)[0] == 5.0).all()

    def test_gaussian_sample_and_logprob(self, rng):
        import torch

        g = Gaussian(jnp.float32(1.0), jnp.float32(2.0))
        x = jnp.float32(0.5)
        want = torch.distributions.Normal(torch.tensor(1.0), torch.tensor(2.0)).log_prob(
            torch.tensor(0.5)
        )
        np.testing.assert_allclose(np.asarray(g.log_prob(x)), want.numpy(), rtol=1e-5)
        want_cdf = torch.distributions.Normal(torch.tensor(1.0), torch.tensor(2.0)).cdf(
            torch.tensor(0.5)
        )
        np.testing.assert_allclose(np.asarray(g.cdf(x)), want_cdf.numpy(), rtol=1e-5)
