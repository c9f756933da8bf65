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
        """jax.grad through the fused (interpret-mode Pallas fwd+bwd) path
        must equal autodiff of the exact XLA composition — for x, gamma,
        beta AND the pre-bias input."""
        from dmme_tpu.ops.group_norm import group_norm_silu

        x = jax.random.normal(rng, (2, 4, 4, 16))
        gamma = jnp.ones((2, 16)) + 0.1 * jax.random.normal(jax.random.fold_in(rng, 1), (2, 16))
        beta = 0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (2, 16))
        bias = 0.2 * jax.random.normal(jax.random.fold_in(rng, 3), (2, 16))

        def loss(force):
            def f(args):
                xx, gg, bb, cc = args
                return jnp.sum(jnp.sin(group_norm_silu(
                    xx, gg, bb, 4, pre_bias=cc, force=force)))
            return f

        want = jax.grad(loss("xla"))((x, gamma, beta, bias))
        got = jax.grad(loss("interpret"))((x, gamma, beta, bias))
        for w, g, name in zip(want, got, ("dx", "dgamma", "dbeta", "dbias")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4, err_msg=name
            )

    def test_shared_gamma_grad_reduces_over_batch(self, rng):
        """(C,)-shaped affine params: the batch reduction of dgamma happens
        in the broadcast transpose — fused and XLA paths must agree."""
        from dmme_tpu.ops.group_norm import group_norm_silu

        x = jax.random.normal(rng, (4, 4, 4, 16))
        gamma = jnp.ones((16,))
        beta = jnp.zeros((16,))

        def loss(force):
            def f(args):
                gg, bb = args
                return jnp.sum(jnp.cos(group_norm_silu(x, gg, bb, 4, force=force)))
            return f

        want = jax.grad(loss("xla"))((gamma, beta))
        got = jax.grad(loss("interpret"))((gamma, beta))
        for w, g in zip(want, got):
            assert g.shape == w.shape
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-4)

    def test_pre_bias_matches_explicit_add(self, rng):
        """GN(x + bias_c) via the analytic sum-shift == explicit add."""
        from dmme_tpu.ops.group_norm import group_norm_silu

        x = jax.random.normal(rng, (2, 4, 4, 16))
        bias = jax.random.normal(jax.random.fold_in(rng, 5), (2, 16))
        explicit = x + bias[:, None, None, :].astype(x.dtype)
        ref = self._ref(explicit, jnp.ones((16,)), jnp.zeros((16,)), 4)
        got = group_norm_silu(
            x, jnp.ones((16,)), jnp.zeros((16,)), 4, pre_bias=bias,
            force="interpret",
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)

    def test_resblock_fused_matches_unfused(self, rng):
        """ResBlock(fused_norm=True) on CPU (XLA fallback) == the legacy
        unfused composition, forward and gradients, both conditioning modes."""
        from dmme_tpu.models.blocks import ResBlock

        for film in (False, True):
            block = lambda fused: ResBlock(
                c_out=16, num_groups=4, dropout=0.0, film=film,
                fused_norm=fused,
            )
            x = jax.random.normal(rng, (2, 8, 8, 16))
            emb = jax.random.normal(jax.random.fold_in(rng, 1), (2, 12))
            params = block(True).init(rng, x, emb)
            # identical param tree => same init works for both
            outs, grads = [], []
            for fused in (True, False):
                def loss(p):
                    return jnp.sum(jnp.sin(block(fused).apply(p, x, emb)))
                l, g = jax.value_and_grad(loss)(params)
                outs.append(l)
                grads.append(g)
            np.testing.assert_allclose(float(outs[0]), float(outs[1]), rtol=1e-5)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
                ),
                grads[0], grads[1],
            )


class TestFusedResBlock:
    """Mega-fused ResBlock forward kernel (ops/resblock.py)."""

    def _args(self, rng, cin, cout, n=3, h=8, w=8, groups=4):
        ks = jax.random.split(rng, 12)
        x = jax.random.normal(ks[0], (n, h, w, cin))
        g1 = 1 + 0.1 * jax.random.normal(ks[1], (n, cin))
        b1v = 0.1 * jax.random.normal(ks[2], (n, cin))
        pre2 = 0.3 * jax.random.normal(ks[3], (n, cout))
        g2 = 1 + 0.1 * jax.random.normal(ks[4], (n, cout))
        b2v = 0.1 * jax.random.normal(ks[5], (n, cout))
        w1 = 0.1 * jax.random.normal(ks[6], (3, 3, cin, cout))
        b1 = 0.1 * jax.random.normal(ks[7], (cout,))
        w2 = 0.1 * jax.random.normal(ks[8], (3, 3, cout, cout))
        b2 = 0.1 * jax.random.normal(ks[9], (cout,))
        wr = 0.1 * jax.random.normal(ks[10], (1, 1, cin, cout)) if cin != cout else None
        br = 0.1 * jax.random.normal(ks[11], (cout,)) if cin != cout else None
        return (x, g1, b1v, pre2, g2, b2v, w1, b1, w2, b2), dict(
            wr=wr, br=br, num_groups=groups
        )

    @pytest.mark.parametrize("cin,cout", [(16, 16), (16, 32)])
    def test_kernel_interpret_matches_xla(self, rng, cin, cout):
        from dmme_tpu.ops.resblock import resblock_forward

        args, kw = self._args(rng, cin, cout)
        ref = resblock_forward(*args, force="xla", **kw)
        got = resblock_forward(*args, force="interpret", **kw)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize("film", [False, True])
    @pytest.mark.parametrize("cout", [16, 32])
    def test_fused_block_matches_standard_resblock(self, rng, film, cout):
        """ResBlock(fused_block=True) (XLA fallback on CPU) == the standard
        composition, with an IDENTICAL parameter tree."""
        from dmme_tpu.models.blocks import ResBlock

        std = ResBlock(c_out=cout, num_groups=4, dropout=0.0, film=film)
        fused = ResBlock(
            c_out=cout, num_groups=4, dropout=0.0, film=film, fused_block=True
        )
        x = jax.random.normal(rng, (3, 8, 8, 16))
        emb = jax.random.normal(jax.random.fold_in(rng, 1), (3, 12))
        p1 = std.init(rng, x, emb)
        p2 = fused.init(rng, x, emb)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            p1, p2,
        )
        a = std.apply(p1, x, emb)
        b = fused.apply(p1, x, emb)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=2e-5
        )

    def test_fused_block_ignored_in_training(self, rng):
        """fused_block must not change the training path (dropout active)."""
        from dmme_tpu.models.blocks import ResBlock

        block = ResBlock(
            c_out=16, num_groups=4, dropout=0.5, deterministic=False,
            fused_block=True,
        )
        x = jax.random.normal(rng, (2, 8, 8, 16))
        emb = jax.random.normal(jax.random.fold_in(rng, 1), (2, 12))
        params = block.init({"params": rng, "dropout": jax.random.PRNGKey(9)}, x, emb)
        out = block.apply(params, x, emb, rngs={"dropout": jax.random.PRNGKey(5)})
        assert out.shape == (2, 8, 8, 16)


class TestBlockPicker:
    def test_block_multiple_of_8(self):
        """n=12 must fall back (0), not return a 12-row block that violates
        the (B % 8 == 0) sublane constraint (self-review finding)."""
        from dmme_tpu.ops.group_norm import _pick_block_n

        assert _pick_block_n(12, 32, 32, 128, 2) == 0
        assert _pick_block_n(16, 32, 32, 128, 2) in (8, 16)
        assert _pick_block_n(128, 32, 32, 128, 2) % 8 == 0
