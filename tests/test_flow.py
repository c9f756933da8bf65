"""Flow matching / rectified flow — golden equation tests, closed-form
marginal-field sampler exactness, solver order, and harness integration.

Technique mirrors tests/test_edm.py: float64 numpy oracles for the
closed-form pieces, analytic velocity fields for sampler exactness. The
key analytic facts used (derived from the joint Gaussian of
x_t = (1−t)·x₀ + t·ε):

* point-mass data x₀ ≡ c:        v*(x, t) = (x − c)/t, whose trajectories
  are STRAIGHT lines into c — every explicit solver integrates it exactly,
  and even a SINGLE Euler step from t=1 lands on c (the rectified-flow
  one-step property).
* Gaussian data x₀ ~ N(0, s²I):  v*(x, t) = (t − (1−t)s²)/τ²(t) · x with
  τ²(t) = (1−t)²s² + t², solved by x(t) = x(1)·τ(t)  (τ(1) = 1), so the
  exact endpoint is x(0) = s·x(1). Curved for s ≠ 1 — separates solver
  orders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dmme_tpu.equations as eq
from dmme_tpu.diffusion import DDPM, FlowMatching, make_sampler
from dmme_tpu.training import LitFlow

TIME_SCALE = 1000.0


# ---------------------------------------------------------------- equations
def test_interpolate_endpoints_and_golden():
    rng = np.random.RandomState(0)
    x0 = rng.randn(3, 4, 4, 2).astype(np.float32)
    x1 = rng.randn(3, 4, 4, 2).astype(np.float32)
    t = np.asarray([0.0, 0.3, 1.0], np.float32)
    got = np.asarray(eq.flow.interpolate(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(t)))
    want = (1 - t[:, None, None, None]) * x0 + t[:, None, None, None] * x1
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(got[0], x0[0], atol=0)   # t=0 → data
    np.testing.assert_allclose(got[2], x1[2], atol=0)   # t=1 → noise
    np.testing.assert_allclose(
        np.asarray(eq.flow.velocity_target(jnp.asarray(x0), jnp.asarray(x1))),
        x1 - x0, atol=0,
    )


def test_time_grid_and_shift():
    ts = np.asarray(eq.flow.time_grid(8))
    assert ts.shape == (9,)
    assert ts[0] == 1.0 and ts[-1] == 0.0
    assert np.all(np.diff(ts) < 0)
    np.testing.assert_allclose(ts, np.linspace(1, 0, 9), rtol=1e-6)

    # SD3 eq. 23 golden: s·t/(1+(s−1)·t); fixes endpoints, monotone
    s = 3.0
    t = np.linspace(0, 1, 11)
    got = np.asarray(eq.flow.shift_time(jnp.asarray(t, jnp.float32), s))
    np.testing.assert_allclose(got, s * t / (1 + (s - 1) * t), rtol=1e-6)
    shifted = np.asarray(eq.flow.time_grid(8, shift=s))
    assert shifted[0] == pytest.approx(1.0) and shifted[-1] == 0.0
    assert np.all(np.diff(shifted) < 0)
    # s>1 pushes interior grid points toward t=1 (high noise)
    assert np.all(shifted[1:-1] > ts[1:-1])


def test_logit_normal_t_distribution():
    t = eq.flow.sample_t_logit_normal(jax.random.PRNGKey(0), 20000, 0.0, 1.0)
    z = np.asarray(jax.scipy.special.logit(t))
    assert z.mean() == pytest.approx(0.0, abs=0.05)
    assert z.std() == pytest.approx(1.0, abs=0.05)
    assert float(t.min()) > 0.0 and float(t.max()) < 1.0


def test_loss_given_closed_form():
    """With v_θ ≡ 0 the loss is exactly mean((x₁ − x₀)²)."""
    algo = FlowMatching.create(steps=4)
    rng = np.random.RandomState(1)
    x0 = rng.randn(3, 4, 4, 2).astype(np.float32)
    x1 = rng.randn(3, 4, 4, 2).astype(np.float32)
    t = np.asarray([0.2, 0.5, 0.9], np.float32)

    def zero_model(params, x, t, train=False, rngs=None):
        return jnp.zeros_like(x)

    got = float(
        algo.loss_given(zero_model, None, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(x1))
    )
    assert got == pytest.approx(((x1 - x0) ** 2).mean(), rel=1e-5)


def test_loss_zero_for_perfect_model():
    """A model returning the true conditional velocity has zero loss at
    every (t, ε) draw — the regression target is exactly representable."""
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    x1 = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    target = x1 - x0

    def perfect(params, x, t, train=False, rngs=None):
        return target

    algo = FlowMatching.create(steps=4)
    got = float(algo.loss_given(perfect, None, x0, jnp.asarray([0.3, 0.8]), x1))
    assert got == pytest.approx(0.0, abs=1e-10)


# ------------------------------------------------------------ sampler exact
def field_model(v_of_xt):
    """Wrap an analytic marginal field v(x, t) as a model_fn; undoes the
    network-side time scaling (the algorithm passes t·time_scale)."""

    def model(params, x, t_scaled, train=False, rngs=None):
        t = (jnp.asarray(t_scaled, jnp.float32) / TIME_SCALE).reshape(
            (-1,) + (1,) * (x.ndim - 1)
        )
        return v_of_xt(x, t)

    return model


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("steps", [1, 7])
def test_point_mass_exact_any_step_count(order, steps):
    """Point-mass data: the marginal field's trajectories are straight, so
    EVERY explicit method at EVERY step count — including ONE Euler step —
    lands exactly on c (rectified flow's defining property)."""
    c = 0.7
    model = field_model(lambda x, t: (x - c) / jnp.maximum(t, 1e-12))
    algo = FlowMatching.create(steps=steps, order=order)
    out = algo.generate(model, None, jax.random.PRNGKey(0), (2, 4, 4, 3))
    np.testing.assert_allclose(np.asarray(out), c, atol=1e-4)


def test_gaussian_field_endpoint_and_order():
    """Gaussian-data marginal field (curved for s ≠ 1): exact endpoint is
    s·x(1). Midpoint-8 must beat Euler-8 by well over 2× AND beat Euler-16
    (order, not constant). Measured on CPU: Euler-8 0.0307, Euler-16
    0.0156, midpoint-8 0.0025."""
    s = 0.1

    def v(x, t):
        tau2 = (1 - t) ** 2 * s**2 + t**2
        return (t - (1 - t) * s**2) / tau2 * x

    model = field_model(v)
    key = jax.random.PRNGKey(1)
    shape = (2, 4, 4, 1)
    x1 = jax.random.normal(key, shape, jnp.float32)
    exact = s * x1

    def err(steps, order):
        out = FlowMatching.create(steps=steps, order=order).generate(
            model, None, key, shape
        )
        return float(jnp.abs(out - exact).mean() / jnp.abs(exact).mean())

    err_e8, err_e16, err_m8 = err(8, 1), err(16, 1), err(8, 2)
    assert err_m8 < err_e8 / 2.5, (err_m8, err_e8)
    assert err_m8 < err_e16, (err_m8, err_e16)


def test_generate_history_contract():
    """history_length frames, last frame == final x₀ (GenerateImage
    contract, same as every other algorithm)."""
    c = 0.3
    model = field_model(lambda x, t: (x - c) / jnp.maximum(t, 1e-12))
    algo = FlowMatching.create(steps=6)
    x0, hist = algo.generate(
        model, None, jax.random.PRNGKey(0), (1, 4, 4, 1), history_length=3
    )
    assert hist.shape == (3, 1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(hist[-1]), np.asarray(x0), atol=0)


# ------------------------------------------------------------- integration
def tiny_unet(**kw):
    from dmme_tpu.models import ddpm as ddpm_models

    return ddpm_models.UNet(
        pos_dim=4, emb_dim=8, num_groups=2, channels_per_depth=(4, 8, 8, 8),
        num_blocks=1, **kw,
    )


def test_lit_flow_train_and_sample():
    lit = LitFlow(model=tiny_unet(), sample_steps=4, warmup=10)
    state = lit.init_state(jax.random.PRNGKey(0), img_size=8)
    loss_fn = lit.make_loss_fn()
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)  # normalized domain (no datamodule)
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(p, jax.random.PRNGKey(1), x)
    )(state.params)
    assert jnp.isfinite(loss)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)

    out = lit.generate(state, jax.random.PRNGKey(2), (2, 8, 8, 3))
    assert out.shape == (2, 8, 8, 3) and bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_lit_flow_conditional_cfg():
    """Class-conditional flow: the CFG wrapper extrapolates VELOCITIES the
    same way it extrapolates ε — no flow-specific wiring."""
    lit = LitFlow(
        model=tiny_unet(num_classes=3), num_classes=3, sample_steps=3,
        warmup=10, guidance_scale=2.0,
    )
    state = lit.init_state(jax.random.PRNGKey(0), img_size=8)
    loss_fn = lit.make_loss_fn()
    batch = (jnp.zeros((2, 8, 8, 3), jnp.float32), jnp.asarray([0, 2]))
    loss = loss_fn(state.params, jax.random.PRNGKey(1), batch)
    assert jnp.isfinite(loss)
    out = lit.generate(
        state, jax.random.PRNGKey(2), (2, 8, 8, 3), y=jnp.asarray([1, 1])
    )
    assert out.shape == (2, 8, 8, 3) and bool(jnp.all(jnp.isfinite(out)))


def test_factory_flow_override():
    trained = FlowMatching.create(steps=25, order=2, shift=3.0)
    algo, adapt = make_sampler(trained, "flow", 12)
    assert isinstance(algo, FlowMatching)
    assert algo.steps == 12 and algo.shift == 3.0 and algo.order == 2
    # shifted grid survives the rebuild
    np.testing.assert_allclose(
        np.asarray(algo.ts), np.asarray(eq.flow.time_grid(12, 3.0)), rtol=1e-6
    )

    with pytest.raises(ValueError, match="sampler=flow"):
        make_sampler(DDPM.create(timesteps=10), "flow", 4)
    with pytest.raises(ValueError, match="discrete-schedule"):
        make_sampler(trained, "ddim", 4)
