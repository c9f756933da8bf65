"""LitUpsampler — super-resolution diffusion harness (training/lit.py).

The reference's stale tests promise an ADMU upsampler model but no
training/sampling path for it (tests/test_adm.py fails at import there);
this harness supplies both, for any 2C-input denoiser.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.data import CIFAR10
from dmme_tpu.models import ddpm as ddpm_models
from dmme_tpu.training import LitUpsampler, fit


def tiny_upsampler(factor=2, timesteps=8):
    model = ddpm_models.UNet(
        in_channels=6, out_channels=3, pos_dim=4, emb_dim=8, num_groups=2,
        channels_per_depth=(4, 8, 8, 8), num_blocks=1,
    )
    return LitUpsampler(
        factor=factor, model=model, timesteps=timesteps, warmup=2
    )


class TestLitUpsampler:
    def test_downsample_is_average_pool(self):
        lit = tiny_upsampler(factor=2)
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        low = lit.downsample(x)
        assert low.shape == (2, 4, 4, 3)
        np.testing.assert_allclose(
            np.asarray(low[0, 0, 0, 0]),
            np.asarray(x[0, :2, :2, 0]).mean(),
            rtol=1e-6,
        )

    @pytest.mark.slow
    def test_loss_finite_and_differentiable(self, rng):
        lit = tiny_upsampler()
        state = lit.init_state(rng, img_size=16)
        loss_fn = lit.make_loss_fn()
        x = jax.random.normal(rng, (4, 16, 16, 3))
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, jax.random.PRNGKey(1), x
        )
        assert np.isfinite(float(loss))
        assert all(
            np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads)
        )

    def test_generate_upsamples_low_res(self, rng):
        lit = tiny_upsampler(factor=2)
        state = lit.init_state(rng, img_size=16)
        low = jax.random.uniform(rng, (2, 8, 8, 3), minval=-1, maxval=1)
        out = lit.generate(state, jax.random.PRNGKey(0), low_res=low)
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()
        # the conditioning must actually steer generation
        out_b = lit.generate(state, jax.random.PRNGKey(0), low_res=-low)
        assert np.abs(np.asarray(out) - np.asarray(out_b)).max() > 1e-3

    def test_generate_without_low_res_fails_loudly(self, rng):
        lit = tiny_upsampler()
        state = lit.init_state(rng, img_size=16)
        with pytest.raises(ValueError, match="low_res"):
            lit.generate(state, jax.random.PRNGKey(0), (2, 16, 16, 3))

    def test_num_classes_rejected_loudly(self):
        """A silently-unconditional class-conditional upsampler is the trap
        the LitIDDPM comment warns about — refuse instead."""
        with pytest.raises(NotImplementedError, match="num_classes"):
            LitUpsampler(factor=2, num_classes=10)

    def test_unconditional_surfaces_fail_with_fix(self, rng):
        """test()/sample-override/serve have no conditioning source: they
        must fail with a pointer, not a conv shape error in the scan."""
        from dmme_tpu.training.evaluate import test as fid_test

        lit = tiny_upsampler()
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=4)
        with pytest.raises(ValueError, match="low_res"):
            fid_test(lit, dm, state=lit.init_state(rng, img_size=32))

    def test_img_shape_conflict_rejected(self, rng):
        lit = tiny_upsampler(factor=2)
        state = lit.init_state(rng, img_size=16)
        low = jnp.zeros((2, 8, 8, 3))
        with pytest.raises(ValueError, match="conflicts"):
            lit.generate(state, jax.random.PRNGKey(0), (2, 64, 64, 3),
                         low_res=low)

    def test_validate_binds_conditioning(self, rng):
        """evaluate.validate drives lit.eval_loss — the upsampler's
        low-res concat must be bound there too, not just in training."""
        from dmme_tpu.training.evaluate import validate

        lit = tiny_upsampler()
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=4)
        state = lit.init_state(rng, img_size=32)  # CIFAR synthetic is 32px
        res = validate(lit, dm, state=state, max_batches=1)
        assert np.isfinite(res["val/loss"])

    @pytest.mark.slow
    def test_fit_end_to_end(self, tmp_path, rng):
        """The real fit loop: on-the-fly (low, high) pairing inside the
        jitted loss, uint8 batches, checkpointing."""
        lit = tiny_upsampler()
        dm = CIFAR10(synthetic=True, synthetic_size=32, batch_size=8)
        state = fit(
            lit, dm, max_steps=3,
            ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=100, log_every=100,
        )
        assert int(jax.device_get(state.step)) == 3
