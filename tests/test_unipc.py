"""UniPC predictor–corrector solver.

The coefficients are pinned by EXACTNESS tests against analytically
solvable probability-flow ODEs (fake models whose x̂₀(λ) is a known
polynomial — the variation-of-constants solution is then closed-form),
plus algebraic-identity and convergence-order checks. This is stronger
than shape/NaN smoke tests: a wrong Lagrange weight fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.diffusion import DDIM, DPMSolverPP, UniPC

SHAPE = (2, 8, 8, 3)


def lam_of(schedule, t):
    ab = schedule.alpha_bar[t]
    return 0.5 * (jnp.log(ab) - jnp.log(jnp.maximum(1.0 - ab, 1e-38)))


def poly_x0_model(schedule, coeffs):
    """model_fn whose implied x̂₀(λ_t) = Σ c_k λ_t^k (same for every pixel):
    returns the ε that makes (x − σε)/α equal that x̂₀."""

    def model_fn(params, x, t):
        ab = schedule.alpha_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        alpha = jnp.sqrt(ab)
        sigma = jnp.sqrt(jnp.maximum(1.0 - ab, 1e-38))
        lam = 0.5 * (jnp.log(ab) - jnp.log(jnp.maximum(1.0 - ab, 1e-38)))
        x0 = sum(c * lam**k for k, c in enumerate(coeffs))
        x0 = jnp.broadcast_to(x0, x.shape)
        return (x - alpha * x0) / sigma

    return model_fn


class TestUniPC:
    def test_constant_x0_exact(self):
        """x̂₀ ≡ c: the exact ODE solution lands every solver step on
        x_t = α_t·c + (σ_t/σ_s)(x_s − α_s·c); the whole trajectory must be
        exact, so x_0 == c to float32 roundoff."""
        algo = UniPC.create(timesteps=100, sub_timesteps=6)
        fn = poly_x0_model(algo.schedule, [0.37])
        out = jax.jit(algo.generate, static_argnums=(0, 3))(
            fn, None, jax.random.PRNGKey(0), SHAPE
        )
        np.testing.assert_allclose(np.asarray(out), 0.37, rtol=0, atol=1e-4)

    def test_order1_no_corrector_equals_canonical_ddim(self):
        """(σ_t/σ_s)x + α_t(1−e^{−h})x̂₀ is algebraically the canonical η=0
        DDIM update — same identity DPMSolverPP order-1 satisfies."""
        kw = dict(timesteps=100, sub_timesteps=8, tau_schedule="linear")
        uni = UniPC.create(order=1, corrector=False, **kw)
        ddim = DDIM.create(variant="canonical", eta=0.0, **kw)

        import flax.linen as nn

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, t):
                emb = jnp.sin(t.astype(jnp.float32))[:, None, None, None]
                return nn.Conv(3, (3, 3))(x + emb)

        m = Tiny()
        params = m.init(jax.random.PRNGKey(0), jnp.zeros(SHAPE),
                        jnp.zeros((SHAPE[0],), jnp.int32))

        def fn(p, x, t):
            return m.apply(p, x, t)

        key = jax.random.PRNGKey(7)
        a = uni.generate(fn, params, key, SHAPE)
        b = ddim.generate(fn, params, key, SHAPE)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_linear_x0_interior_frames_exact(self):
        """x̂₀(λ) = a + bλ (x-independent): the linear corrector keeps every
        internal anchor state exact, and the 2-node predictor from an exact
        anchor is exact — so every captured frame from the SECOND step on
        must match the closed-form solution, even though the first
        (first-order warm-up) frame does not. A wrong Lagrange weight in
        either the predictor or the corrector fails this. (The final τ=0
        frame is excluded: the true solution diverges as σ→0 for
        λ-unbounded x̂₀ and every solver standardly outputs x̂₀ there.)"""
        S = 8
        algo = UniPC.create(timesteps=1000, sub_timesteps=S,
                            tau_schedule="linear")
        a_c, b_c = 0.2, 0.05
        fn = poly_x0_model(algo.schedule, [a_c, b_c])
        _, hist = algo.generate(fn, None, jax.random.PRNGKey(1), SHAPE,
                                history_length=S)
        hist = np.asarray(hist)  # frame k = predicted state at node S-1-k

        # closed form per step (float64):
        # x_t = (σt/σs)x_s + αt[(a + b(λt−1)) − e^{−h}(a + b(λs−1))]
        sched = np.asarray(algo.schedule.alpha_bar, np.float64)
        tau = np.asarray(algo.tau)
        x = np.asarray(
            jax.random.normal(
                jax.random.split(jax.random.PRNGKey(1))[0], SHAPE, jnp.float32
            ),
            np.float64,
        )
        exact = {}
        for i in range(S, 1, -1):  # stop at node 1 (τ=0 excluded)
            ab_s, ab_t = sched[tau[i]], sched[tau[i - 1]]
            si_s, si_t = np.sqrt(1 - ab_s), np.sqrt(1 - ab_t)
            al_t = np.sqrt(ab_t)
            l_s = 0.5 * (np.log(ab_s) - np.log(1 - ab_s))
            l_t = 0.5 * (np.log(ab_t) - np.log(1 - ab_t))
            x = (si_t / si_s) * x + al_t * (
                (a_c + b_c * (l_t - 1))
                - np.exp(-(l_t - l_s)) * (a_c + b_c * (l_s - 1))
            )
            exact[i - 1] = x.copy()  # state at node i-1

        frame1_err = np.abs(hist[0] - exact[S - 1]).max()
        for k in range(1, S - 1):  # frames 2..S-1 → nodes S-2..1
            err = np.abs(hist[k] - exact[S - 1 - k]).max()
            assert err < 2e-4, (k, err)
        # the warm-up frame is genuinely first-order — if IT were also
        # exact (below the interior tolerance) the test would be vacuous
        assert frame1_err > 2.5e-4, frame1_err

        # DPM-Solver++(2M)'s midpoint form is NOT exact on this ODE: the
        # corrector buys real accuracy at equal NFE
        dpm = DPMSolverPP.create(timesteps=1000, sub_timesteps=S,
                                 tau_schedule="linear")
        _, hist_d = dpm.generate(fn, None, jax.random.PRNGKey(1), SHAPE,
                                 history_length=S)
        err_dpm = np.abs(np.asarray(hist_d)[S - 2] - exact[1]).max()
        err_uni = np.abs(hist[S - 2] - exact[1]).max()
        assert err_uni < 0.1 * err_dpm, (err_uni, err_dpm)

    def test_convergence_order_on_linear_ode(self):
        """x̂₀ = κ·x has the closed form x(λt) = (σt/σs)·x(λs)·
        exp(κ[asinh e^{λt} − asinh e^{λs}]). On aligned linear-τ grids,
        compare the captured state at τ = T/2: doubling the steps must
        shrink the error at ≥2nd order (ratio ≥ 3), and the corrected
        solver must beat DPM-Solver++(2M) at equal NFE."""
        T, kappa = 1000, 0.4

        def kx_model(schedule):
            def fn(params, x, t):
                ab = schedule.alpha_bar[t].reshape(
                    (-1,) + (1,) * (x.ndim - 1)
                )
                alpha = jnp.sqrt(ab)
                sigma = jnp.sqrt(jnp.maximum(1.0 - ab, 1e-38))
                return (x - alpha * (kappa * x)) / sigma

            return fn

        def exact_at(schedule, x0, t_from, t_to):
            ab = np.asarray(schedule.alpha_bar, np.float64)
            l_s = 0.5 * (np.log(ab[t_from]) - np.log(1 - ab[t_from]))
            l_t = 0.5 * (np.log(ab[t_to]) - np.log(1 - ab[t_to]))
            si_s, si_t = np.sqrt(1 - ab[t_from]), np.sqrt(1 - ab[t_to])
            g = np.arcsinh(np.exp(l_t)) - np.arcsinh(np.exp(l_s))
            return (si_t / si_s) * np.asarray(x0, np.float64) * np.exp(
                kappa * g
            )

        errs = {}
        for S in (8, 16):
            algo = UniPC.create(timesteps=T, sub_timesteps=S,
                                tau_schedule="linear")
            fn = kx_model(algo.schedule)
            _, hist = algo.generate(fn, None, jax.random.PRNGKey(2), SHAPE,
                                    history_length=S)
            x_T = np.asarray(
                jax.random.normal(
                    jax.random.split(jax.random.PRNGKey(2))[0], SHAPE,
                    jnp.float32,
                )
            )
            # frame index of node τ = T/2: node S-1-k = S/2 ⇒ k = S/2 - 1
            k = S // 2 - 1
            got = np.asarray(hist)[k]
            want = exact_at(algo.schedule, x_T, T, T // 2)
            errs[S] = np.abs(got - want).max()
        assert errs[16] < errs[8] / 3, errs

        dpm = DPMSolverPP.create(timesteps=T, sub_timesteps=8,
                                 tau_schedule="linear")
        fn = kx_model(dpm.schedule)
        _, hist_d = dpm.generate(fn, None, jax.random.PRNGKey(2), SHAPE,
                                 history_length=8)
        x_T = np.asarray(
            jax.random.normal(
                jax.random.split(jax.random.PRNGKey(2))[0], SHAPE, jnp.float32
            )
        )
        err_dpm = np.abs(
            np.asarray(hist_d)[3] - exact_at(dpm.schedule, x_T, T, T // 2)
        ).max()
        assert errs[8] < err_dpm, (errs[8], err_dpm)

    def test_degenerate_tau_entry_finite(self):
        """Same τ₁ = 0 guard contract as DDIM/DPM (identity step)."""
        algo = UniPC.create(timesteps=100, sub_timesteps=50,
                            tau_schedule="quadratic")
        assert int(algo.tau[1]) == 0
        fn = poly_x0_model(algo.schedule, [0.1])
        out = jax.jit(algo.generate, static_argnums=(0, 3))(
            fn, None, jax.random.PRNGKey(0), SHAPE
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_factory_override_reuses_trained_schedule(self):
        from dmme_tpu.diffusion import DDPM, make_sampler
        from dmme_tpu.diffusion.iddpm import IDDPM

        base = DDPM.create(timesteps=100)
        algo, adapt = make_sampler(base, "unipc", 7)
        assert isinstance(algo, UniPC)
        assert algo.sub_timesteps == 7 and not algo.clip_x0
        np.testing.assert_array_equal(
            np.asarray(algo.schedule.alpha_bar),
            np.asarray(base.schedule.alpha_bar),
        )
        # cosine schedule: the near-zero terminal-ᾱ clamp must auto-enable
        cos = IDDPM.create(timesteps=100, schedule="cosine")
        algo2, _ = make_sampler(cos, "unipc")
        assert algo2.clip_x0
        assert algo2.sub_timesteps == 10  # unipc NFE default

    def test_karras_spacing_end_to_end(self):
        """tau_schedule='karras' rides the same create() surface on all
        three discrete solvers and samples finite."""
        from dmme_tpu.diffusion import DDIM

        for cls in (UniPC, DPMSolverPP, DDIM):
            algo = cls.create(timesteps=1000, sub_timesteps=8,
                              tau_schedule="karras")
            fn = poly_x0_model(algo.schedule, [0.2])
            out = jax.jit(algo.generate, static_argnums=(0, 3))(
                fn, None, jax.random.PRNGKey(3), SHAPE
            )
            assert np.isfinite(np.asarray(out)).all(), cls.__name__
            # top node = the σ=80 (EDM σ_max clamp) crossing, near T
            assert 900 < int(algo.tau[-1]) <= 1000

    def test_history_capture(self):
        algo = UniPC.create(timesteps=100, sub_timesteps=6)
        fn = poly_x0_model(algo.schedule, [0.0])
        out, hist = algo.generate(
            fn, None, jax.random.PRNGKey(0), SHAPE, history_length=3
        )
        assert out.shape == SHAPE and hist.shape == (3,) + SHAPE
        np.testing.assert_allclose(
            np.asarray(hist[-1]), np.asarray(out), atol=1e-6
        )
