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
