"""UNet topology, shape, and parameter-count tests.

The reference only checks the default UNet's output shape
(tests/test_unet.py:6-14); we additionally pin the layer plan and the
~35.7M-param count derived in SURVEY.md §6 so topology regressions are loud.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.models import ddpm, iddpm
from dmme_tpu.models.unet import build_topology, LayerSpec


def count_params(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


class TestTopology:
    def test_default_plan_counts(self):
        down, middle, up = build_topology((128, 256, 256, 256), 2, (2,))
        assert sum(1 for s in down if s.kind == "res") == 8
        assert sum(1 for s in down if s.kind == "down") == 3
        assert len(middle) == 2 and middle[0].attention and not middle[1].attention
        assert sum(1 for s in up if s.kind == "res") == 12
        assert sum(1 for s in up if s.kind == "up") == 3
        # skips: 1 (input conv) + 11 down layers == 12 up resblocks
        assert 1 + len(down) == sum(1 for s in up if s.kind == "res")

    def test_attention_placement(self):
        down, _, up = build_topology((128, 256, 256, 256), 2, (2,))
        # down: attention on the two depth-2 blocks (16x16 for 32px input)
        attn_down = [i for i, s in enumerate(down) if s.kind == "res" and s.attention]
        assert len(attn_down) == 2
        # up: three attention blocks at depth 2
        attn_up = [s for s in up if s.kind == "res" and s.attention]
        assert len(attn_up) == 3

    def test_six_depth_lsun_plan(self):
        # LSUN 256px config: ch (128,128,256,256,512,512)
        down, middle, up = build_topology((128, 128, 256, 256, 512, 512), 2, (2,))
        assert sum(1 for s in down if s.kind == "down") == 5
        assert sum(1 for s in up if s.kind == "res") == 1 + len(down)


TINY = dict(
    pos_dim=4, emb_dim=8, num_groups=2, channels_per_depth=(4, 8, 16, 32), num_blocks=2
)


class TestDDPMUNet:
    def test_tiny_forward_shape(self, rng):
        model = ddpm.UNet(**TINY)
        x = jnp.zeros((2, 32, 32, 3))
        t = jnp.array([1, 5], dtype=jnp.int32)
        params = model.init(rng, x, t)
        out = model.apply(params, x, t)
        assert out.shape == (2, 32, 32, 3)

    @pytest.mark.slow
    def test_default_param_count(self, rng):
        model = ddpm.UNet()
        x = jnp.zeros((1, 32, 32, 3))
        t = jnp.zeros((1,), dtype=jnp.int32)
        params = model.init(rng, x, t)
        n = count_params(params)
        # Exact match with the reference torch UNet at default config
        # (sum(p.numel()) == 32,416,643; SURVEY.md §6's ~35.7M estimate was off).
        assert n == 32_416_643, n

    @pytest.mark.slow
    def test_dropout_needs_rng_only_in_train(self, rng):
        model = ddpm.UNet(**TINY)
        x = jnp.ones((2, 32, 32, 3))
        t = jnp.array([1, 2], dtype=jnp.int32)
        params = model.init(rng, x, t)
        out_eval = model.apply(params, x, t)
        out_train = model.apply(
            params, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        assert out_train.shape == out_eval.shape
        # dropout actually fires in train mode
        assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))

    @pytest.mark.slow
    def test_grad_flows(self, rng):
        model = ddpm.UNet(**TINY)
        x = jnp.ones((2, 32, 32, 3))
        t = jnp.array([1, 2], dtype=jnp.int32)
        params = model.init(rng, x, t)

        def loss(p):
            return jnp.mean(jnp.square(model.apply(p, x, t)))

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
        assert any(np.abs(np.asarray(leaf)).sum() > 0 for leaf in flat)

    @pytest.mark.slow
    def test_bf16_compute(self, rng):
        model = ddpm.UNet(**TINY, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 32, 32, 3))
        t = jnp.array([1, 2], dtype=jnp.int32)
        params = model.init(rng, x, t)
        # params stay f32
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
        out = model.apply(params, x, t)
        assert out.dtype == jnp.bfloat16

    @pytest.mark.slow
    def test_remat_matches(self, rng):
        x = jnp.ones((2, 32, 32, 3))
        t = jnp.array([1, 2], dtype=jnp.int32)
        m1 = ddpm.UNet(**TINY)
        m2 = ddpm.UNet(**TINY, remat=True)
        params = m1.init(rng, x, t)
        np.testing.assert_allclose(
            np.asarray(m1.apply(params, x, t)),
            np.asarray(m2.apply(params, x, t)),
            rtol=1e-5,
            atol=1e-6,
        )


class TestIDDPMUNet:
    def test_tiny_forward_outputs_eps_and_v(self, rng):
        model = iddpm.UNet(**TINY, num_heads=2)
        x = jnp.zeros((2, 32, 32, 3))
        t = jnp.array([1, 5], dtype=jnp.int32)
        params = model.init(rng, x, t)
        out = model.apply(params, x, t)
        assert out.shape == (2, 32, 32, 6)

    def test_attention_at_two_depths(self):
        down, _, up = build_topology((4, 8, 16, 32), 2, (2, 3))
        assert sum(1 for s in down if s.attention) == 4  # depths 2 and 3
