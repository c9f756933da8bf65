"""EDM (Karras et al. 2022) — golden equation tests + sampler exactness.

Technique mirrors the suite's pattern for the other algorithms: float64
numpy oracles for the closed-form pieces, analytic models for sampler
exactness (the probability-flow ODE with a constant denoiser is linear in
σ, so Euler AND Heun must integrate it exactly — any discretization bug
breaks equality, not just a tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dmme_tpu.equations as eq
from dmme_tpu.diffusion import EDM
from dmme_tpu.training import LitEDM


# ---------------------------------------------------------------- equations
def test_karras_sigma_grid_golden():
    steps, smin, smax, rho = 18, 0.002, 80.0, 7.0
    got = np.asarray(eq.edm.karras_sigmas(steps, smin, smax, rho))
    i = np.arange(steps, dtype=np.float64)
    want = (
        smax ** (1 / rho) + i / (steps - 1) * (smin ** (1 / rho) - smax ** (1 / rho))
    ) ** rho
    assert got.shape == (steps + 1,)
    np.testing.assert_allclose(got[:-1], want, rtol=1e-6)
    assert got[-1] == 0.0
    assert got[0] == pytest.approx(smax, rel=1e-6)
    assert got[-2] == pytest.approx(smin, rel=1e-6)
    assert np.all(np.diff(got) < 0)  # strictly decreasing


def test_precond_identities():
    """Exact algebraic invariants of the Table-1 coefficients:
    c_in²·(σ²+σ_d²) = 1 (unit-variance input), λ·c_out² = 1 (unit effective
    weight on F), c_skip = σ_d²/(σ²+σ_d²), c_noise = ln(σ)/4."""
    sd = 0.5
    sigma = jnp.asarray([0.002, 0.1, 1.0, 10.0, 80.0], jnp.float32)
    c = eq.edm.precond(sigma, sd)
    lam = eq.edm.loss_weight(sigma, sd)
    np.testing.assert_allclose(c.c_in**2 * (sigma**2 + sd**2), 1.0, rtol=1e-5)
    np.testing.assert_allclose(lam * c.c_out**2, 1.0, rtol=1e-5)
    np.testing.assert_allclose(c.c_skip, sd**2 / (sigma**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c.c_noise), np.log(np.asarray(sigma)) / 4, rtol=1e-5)


def test_sigma_lognormal_distribution():
    s = eq.edm.sample_sigma_lognormal(jax.random.PRNGKey(0), 20000)
    ln = np.log(np.asarray(s))
    assert ln.mean() == pytest.approx(-1.2, abs=0.05)
    assert ln.std() == pytest.approx(1.2, abs=0.05)


def test_loss_given_closed_form():
    """With F ≡ 0, D = c_skip·x_σ and the loss has a numpy closed form."""
    algo = EDM.create(steps=4)
    rng = np.random.RandomState(0)
    x0 = rng.randn(3, 4, 4, 2).astype(np.float32)
    noise = rng.randn(3, 4, 4, 2).astype(np.float32)
    sigma = np.asarray([0.1, 1.0, 7.0], np.float32)

    def zero_model(params, x, t, train=False, rngs=None):
        return jnp.zeros_like(x)

    got = float(
        algo.loss_given(zero_model, None, jnp.asarray(x0), jnp.asarray(sigma), jnp.asarray(noise))
    )
    sd = 0.5
    s = sigma.astype(np.float64)[:, None, None, None]
    c_skip = sd**2 / (s**2 + sd**2)
    lam = (s**2 + sd**2) / (s * sd) ** 2
    x_sig = x0 + s * noise
    want = (lam * (c_skip * x_sig - x0) ** 2).mean()
    assert got == pytest.approx(want, rel=1e-4)



def make_denoiser_model(target_fn, sd=0.5):
    """Model F whose preconditioned denoiser is exactly D(x;σ) = target_fn(x).

    Inverts EDM's wrapping: the network receives x_in = c_in·x and must
    return F = (D − c_skip·x)/c_out, with σ recovered from c_noise = ln(σ)/4
    and x recovered from x_in (x = x_in/c_in = x_in·√(σ²+σ_d²)).
    """

    def model(params, x_in, cn, train=False, rngs=None):
        sigma = jnp.exp(4.0 * cn).reshape((-1,) + (1,) * (x_in.ndim - 1))
        root = jnp.sqrt(sigma**2 + sd**2)
        x = x_in * root                      # undo c_in
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / root
        return (target_fn(x) - c_skip * x) / c_out

    return model


# ------------------------------------------------------------ sampler exact
@pytest.mark.parametrize("order", [1, 2])
def test_sampler_exact_for_constant_denoiser(order):
    """If D(x;σ) ≡ X0 (constant), the PF-ODE dx/dσ = (x−X0)/σ is linear with
    solution x(σ) = X0 + σ·K — Euler and Heun integrate it EXACTLY, so the
    sampler must return X0 (σ_N = 0) bit-for-bit up to float roundoff."""
    X0 = jnp.full((2, 4, 4, 3), 0.7, jnp.float32)
    algo = EDM.create(steps=8, order=order)
    const_model = make_denoiser_model(lambda x: X0)

    out = algo.generate(const_model, None, jax.random.PRNGKey(0), (2, 4, 4, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=1e-4)


def test_heun_second_order_convergence():
    """Analytic oracle: D(x;σ) = a·x gives dx/dσ = (1−a)x/σ with exact
    solution x(σ) = x_T·(σ/σ_max)^{1−a}; the sampler's final (first-order)
    σ_min→0 step maps that to a·x(σ_min). On a non-stiff range (σ_min=5)
    Heun-8 must beat Euler-8 by well over 2× AND beat Euler-16 (order, not
    constant). Measured on CPU: Euler-8 0.148, Euler-16 0.067, Heun-8 0.033."""
    a, smin, smax = 0.5, 5.0, 80.0
    model = make_denoiser_model(lambda x: a * x)
    key = jax.random.PRNGKey(1)
    shape = (2, 4, 4, 1)
    x_t = smax * jax.random.normal(jax.random.split(key)[0], shape, jnp.float32)
    exact = a * ((smin / smax) ** (1 - a)) * x_t

    def err(steps, order):
        out = EDM.create(
            steps=steps, sigma_min=smin, sigma_max=smax, order=order
        ).generate(model, None, key, shape)
        return float(jnp.abs(out - exact).mean() / jnp.abs(exact).mean())

    err_e8, err_e16, err_h8 = err(8, 1), err(16, 1), err(8, 2)
    assert err_h8 < err_e8 / 2.5, (err_h8, err_e8)
    assert err_h8 < err_e16, (err_h8, err_e16)


# ------------------------------------------------------------- integration
def tiny_unet():
    from dmme_tpu.models import ddpm as ddpm_models

    return ddpm_models.UNet(
        pos_dim=4, emb_dim=8, num_groups=2, channels_per_depth=(4, 8, 8, 8),
        num_blocks=1,
    )


def test_lit_edm_train_and_sample():
    lit = LitEDM(model=tiny_unet(), sample_steps=4, warmup=10)
    state = lit.init_state(jax.random.PRNGKey(0), img_size=8)
    loss_fn = lit.make_loss_fn()
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(p, jax.random.PRNGKey(1), x)
    )(state.params)
    assert jnp.isfinite(loss)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)

    out = lit.generate(state, jax.random.PRNGKey(2), (2, 8, 8, 3))
    assert out.shape == (2, 8, 8, 3) and bool(jnp.all(jnp.isfinite(out)))


def test_generate_history_contract():
    """history_length frames, last frame == final x₀ (GenerateImage contract)."""
    algo = EDM.create(steps=6)
    X0 = jnp.zeros((1, 4, 4, 1), jnp.float32)
    const_model = make_denoiser_model(lambda x: X0)

    x0, hist = algo.generate(
        const_model, None, jax.random.PRNGKey(0), (1, 4, 4, 1), history_length=3
    )
    assert hist.shape == (3, 1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(hist[-1]), np.asarray(x0), atol=0)


def test_stochastic_churn_finite_and_different():
    algo_d = EDM.create(steps=6)
    algo_s = EDM.create(steps=6, s_churn=10.0)
    X0 = jnp.full((1, 4, 4, 1), 0.3, jnp.float32)
    const_model = make_denoiser_model(lambda x: X0)

    key = jax.random.PRNGKey(3)
    out_d = algo_d.generate(const_model, None, key, (1, 4, 4, 1))
    out_s = algo_s.generate(const_model, None, key, (1, 4, 4, 1))
    assert bool(jnp.all(jnp.isfinite(out_s)))
    # constant denoiser ⇒ churn noise is exactly re-absorbed by the linear
    # ODE, so even the stochastic path lands on X0
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(X0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(X0), atol=1e-4)
