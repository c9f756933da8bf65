"""Progressive distillation — target exactness + loss/round mechanics.

The defining property under test: the x̃₀ target is the unique point whose
ONE student DDIM step from x_t reproduces the teacher's TWO steps — checked
against explicitly composed sampling steps of a generic nonlinear teacher,
not just the constant-denoiser case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dmme_tpu.equations as eq
from dmme_tpu.diffusion import DDIM
from dmme_tpu.diffusion.distill import ProgressiveDistillation, ddim_step_from_x0
from dmme_tpu.diffusion.ddpm import _bcast


def eps_toy_model(params, x, t, train=False, rngs=None):
    """Deterministic nonlinear stand-in ε-network."""
    return jnp.tanh(0.7 * x + 0.2 * jnp.roll(x, 1, axis=-1)) + 0.003 * t.reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


class TestGrids:
    def test_student_grid_nests_in_teacher(self):
        pd = ProgressiveDistillation.create(timesteps=100, student_steps=10)
        np.testing.assert_array_equal(
            np.asarray(pd.student_tau), np.asarray(pd.teacher_tau)[::2]
        )
        assert pd.student_tau.shape == (11,)
        assert pd.teacher_tau.shape == (21,)
        assert int(pd.student_tau[0]) == 0

    def test_next_round_halves(self):
        pd = ProgressiveDistillation.create(timesteps=100, student_steps=8)
        nxt = pd.next_round()
        assert nxt.student_steps == 4
        np.testing.assert_array_equal(
            np.asarray(nxt.teacher_tau), np.asarray(pd.student_tau)
        )
        np.testing.assert_array_equal(
            np.asarray(nxt.student_tau), np.asarray(pd.student_tau)[::2]
        )


class TestTarget:
    def test_constant_denoiser_target_is_x0(self):
        """Teacher D ≡ X0 ⇒ two-step endpoint is the one-step update of X0
        ⇒ x̃₀ == X0 exactly (closed-form algebra, atol roundoff)."""
        pd = ProgressiveDistillation.create(
            timesteps=50, student_steps=5, teacher_parameterization="v"
        )
        X0 = jnp.full((2, 4, 4, 3), 0.4, jnp.float32)

        def teacher_v(params, x, t, train=False, rngs=None):
            ab = pd.schedule.alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
            a, s = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
            return (a * x - X0) / jnp.maximum(s, 1e-20)  # v with x̂₀ = X0

        x_t = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3), jnp.float32)
        for i_val in (1, 3, 5):
            i = jnp.full((2,), i_val, jnp.int32)
            tgt = pd.teacher_target_x0(teacher_v, None, x_t, i)
            np.testing.assert_allclose(np.asarray(tgt), np.asarray(X0), atol=2e-5)

    def test_one_student_step_equals_two_teacher_steps(self):
        """Generic nonlinear teacher: plugging x̃₀ into the one-step DDIM
        update must land exactly on the composed two-step endpoint."""
        pd = ProgressiveDistillation.create(
            timesteps=60, student_steps=6, teacher_parameterization="eps"
        )
        teacher_ddim = DDIM(
            schedule=pd.schedule, timesteps=60, tau=pd.teacher_tau,
            sub_timesteps=12, eta=0.0, variant="canonical",
        )
        x_t = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3), jnp.float32)
        i_val = 4  # student index; teacher indices 2i, 2i-1
        i = jnp.full((2,), i_val, jnp.int32)

        # composed endpoint via the production sampler (two sampling_steps)
        k = jax.random.PRNGKey(2)  # unused (eta=0) but required
        x_mid = teacher_ddim.sampling_step(eps_toy_model, None, x_t, 2 * i, k)
        x_pp = teacher_ddim.sampling_step(eps_toy_model, None, x_mid, 2 * i - 1, k)

        tgt = pd.teacher_target_x0(eps_toy_model, None, x_t, i)
        t = pd.student_tau[i]
        t_prev = pd.student_tau[i - 1]
        ab_t = _bcast(pd.schedule.alpha_bar[t], x_t.ndim)
        ab_p = _bcast(pd.schedule.alpha_bar[t_prev], x_t.ndim)
        one_step = ddim_step_from_x0(
            x_t, tgt, jnp.sqrt(ab_t), jnp.sqrt(1 - ab_t),
            jnp.sqrt(ab_p), jnp.sqrt(1 - ab_p),
        )
        np.testing.assert_allclose(
            np.asarray(one_step), np.asarray(x_pp), atol=1e-5
        )


class TestLoss:
    def test_loss_zero_for_oracle_student(self):
        pd = ProgressiveDistillation.create(timesteps=50, student_steps=5)

        def teacher_v(params, x, t, train=False, rngs=None):
            ab = pd.schedule.alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
            a, s = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
            x0 = jnp.tanh(x)  # some denoiser
            return (a * x - x0) / jnp.maximum(s, 1e-20)

        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(2, 4, 4, 3) * 0.3, jnp.float32)
        noise = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
        i = jnp.asarray([2, 5], jnp.int32)

        def oracle_student(params, x, t, train=False, rngs=None):
            # return the v whose x̂₀ equals the distillation target
            ab = pd.schedule.alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
            a, s = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
            # recover i from t (test-only trick: invert the student grid)
            tgt = pd.teacher_target_x0(teacher_v, None, x, i)
            return (a * x - tgt) / jnp.maximum(s, 1e-20)

        loss = float(
            pd.loss_given(teacher_v, None, oracle_student, None, x0, i, noise)
        )
        assert loss == pytest.approx(0.0, abs=1e-8)

    @pytest.mark.slow
    def test_loss_finite_and_differentiable_tiny_unets(self):
        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.models import as_model_fn

        teacher = ddpm_models.UNet(
            pos_dim=4, emb_dim=8, num_groups=2,
            channels_per_depth=(4, 8, 8, 8), num_blocks=1,
        )
        student = ddpm_models.UNet(
            pos_dim=4, emb_dim=8, num_groups=2,
            channels_per_depth=(4, 8, 8, 8), num_blocks=1,
        )
        k = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 8, 8, 3), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        tp = jax.jit(teacher.init)(k, x, t)
        sp = jax.jit(student.init)(jax.random.fold_in(k, 1), x, t)

        pd = ProgressiveDistillation.create(
            timesteps=16, student_steps=4,
            teacher_parameterization="eps", student_parameterization="v",
        )
        x0 = jax.random.uniform(k, (2, 8, 8, 3), jnp.float32, -1, 1)

        def loss_of(p):
            return pd.loss(
                as_model_fn(teacher), tp, as_model_fn(student), p,
                jax.random.PRNGKey(3), x0,
            )

        loss, grads = jax.value_and_grad(loss_of)(sp)
        assert jnp.isfinite(loss)
        assert all(
            bool(jnp.all(jnp.isfinite(g))) for g in jax.tree_util.tree_leaves(grads)
        )
        # teacher params got stop_gradient'd: grads exist only for student tree
        sampler = pd.student_sampler()
        out = sampler.generate(as_model_fn(student), sp, jax.random.PRNGKey(4), (2, 8, 8, 3))
        assert out.shape == (2, 8, 8, 3) and bool(jnp.all(jnp.isfinite(out)))
