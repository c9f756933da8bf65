"""Pallas kernel correctness tests (interpret mode on CPU; the real-TPU
microbench lives in scripts/bench_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.ops.attention import _attention_xla, attention


class TestFusedAttention:
    @pytest.mark.parametrize("t,d", [(64, 64), (256, 128)])
    def test_interpret_matches_xla(self, rng, t, d):
        q = jax.random.normal(rng, (4, t, d))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (4, t, d))
        v = jax.random.normal(jax.random.fold_in(rng, 2), (4, t, d))
        scale = d ** -0.5
        ref = _attention_xla(q, k, v, scale)
        got = attention(q, k, v, scale, force="interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_auto_falls_back_on_cpu(self, rng):
        q = jax.random.normal(rng, (2, 16, 32))
        out = attention(q, q, q, 0.1)  # must not require TPU
        assert out.shape == (2, 16, 32)

    def test_custom_vjp_matches_xla_grads(self, rng):
        """The fused path's hand-written backward must equal autodiff of the
        XLA reference (checked via the interpret-mode forward)."""
        from dmme_tpu.ops import attention as ops_attention

        q = jax.random.normal(rng, (2, 32, 64))
        k = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 64))
        v = jax.random.normal(jax.random.fold_in(rng, 2), (2, 32, 64))
        scale = 0.125

        from dmme_tpu.ops.attention import _fused_bwd, _attention_xla

        def loss_ref(args):
            return jnp.sum(jnp.sin(_attention_xla(*args, scale)))

        gq, gk, gv = jax.grad(loss_ref)((q, k, v))

        # cotangent at the output of attention:
        out = _attention_xla(q, k, v, scale)
        g_out = jnp.cos(out)
        dq, dk, dv = _fused_bwd(scale, (q, k, v), g_out)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), rtol=2e-3, atol=2e-4)

    def test_bf16_path(self, rng):
        q = jax.random.normal(rng, (2, 64, 128), jnp.bfloat16)
        ref = _attention_xla(q, q, q, 0.08)
        got = attention(q, q, q, 0.08, force="interpret")
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=1e-2
        )


class TestGroupNormSiLU:
    def _ref(self, x, gamma, beta, groups):
        """flax GroupNorm + silu reference."""
        from flax import linen as nn

        gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32)
        params = {"params": {"scale": gamma, "bias": beta}}
        return jax.nn.silu(gn.apply(params, x))

    def test_interpret_matches_flax(self, rng):
        from dmme_tpu.ops.group_norm import group_norm_silu

        x = jax.random.normal(rng, (4, 8, 8, 32)) * 2 + 1
        gamma = jax.random.normal(jax.random.fold_in(rng, 1), (32,)) * 0.1 + 1
        beta = jax.random.normal(jax.random.fold_in(rng, 2), (32,)) * 0.1
        ref = self._ref(x, gamma, beta, 8)
        got = group_norm_silu(x, gamma, beta, 8, force="interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_xla_fallback_matches_flax(self, rng):
        from dmme_tpu.ops.group_norm import group_norm_silu

        x = jax.random.normal(rng, (2, 8, 8, 16))
        gamma = jnp.ones((16,))
        beta = jnp.zeros((16,))
        ref = self._ref(x, gamma, beta, 4)
        got = group_norm_silu(x, gamma, beta, 4, force="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_per_sample_affine_folds_film(self, rng):
        """gn(x)*(1+s)+b == fused with gamma'=(1+s), beta'=b."""
        from dmme_tpu.ops.group_norm import group_norm_silu

        x = jax.random.normal(rng, (2, 4, 4, 16))
        s = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16)) * 0.1
        b = jax.random.normal(jax.random.fold_in(rng, 2), (2, 16)) * 0.1
        base = self._ref(x, jnp.ones((16,)), jnp.zeros((16,)), 4)
        # undo silu to get gn out, apply film, re-silu — instead compute directly:
        from flax import linen as nn

        gn = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.float32)
        gnout = gn.apply({"params": {"scale": jnp.ones((16,)), "bias": jnp.zeros((16,))}}, x)
        ref = jax.nn.silu(gnout * (1 + s[:, None, None, :]) + b[:, None, None, :])
        got = group_norm_silu(x, 1.0 + s, b, 4, force="interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_custom_vjp_matches_xla_grads(self, rng):
        from dmme_tpu.ops.group_norm import _gn_silu_xla, _fused_bwd

        x = jax.random.normal(rng, (2, 4, 4, 16))
        gamma = jnp.broadcast_to(jnp.ones((16,)), (2, 16))
        beta = jnp.zeros((2, 16))

        def loss(args):
            return jnp.sum(jnp.sin(_gn_silu_xla(*args, 4, 1e-5)))

        gx, gg, gb = jax.grad(loss)((x, gamma, beta))
        out = _gn_silu_xla(x, gamma, beta, 4, 1e-5)
        cot = jnp.cos(out)
        dx, dgamma, dbeta = _fused_bwd(4, 1e-5, 2, (x, gamma, beta), cot)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(gx), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dgamma), np.asarray(gg), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dbeta), np.asarray(gb), rtol=2e-3, atol=2e-4)
