"""Latent diffusion — VAE codec, the latent-space seam, and the two-stage
recipe end-to-end.

Capability beyond the reference (its src/dmme/lit_modules/ train in pixel
space only). Coverage mirrors the harness-test strategy of
tests/test_training.py: unit math (KL golden value, shape algebra) +
behavioral invariants (scale precedence, rng-stream pinning) + a real
two-stage fit through the public fit loop with checkpoint restore.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.data import Shapes
from dmme_tpu.models.unet import UNet
from dmme_tpu.models.vae import ConvVAE, kl_divergence
from dmme_tpu.training import (LitDDPM, LitLatentDDPM, LitLatentFlow, LitVAE,
                               fit)


def tiny_vae(latent_channels=2):
    return ConvVAE(
        latent_channels=latent_channels, base_channels=8,
        channel_multipliers=(1, 2), num_res_blocks=1, num_groups=4,
    )


def tiny_unet(in_channels=2):
    return UNet(
        in_channels=in_channels, channels_per_depth=(8, 16), num_blocks=1,
        attention_depths=(), num_groups=4, pos_dim=8, emb_dim=16,
    )


# ------------------------------------------------------------------ the VAE
class TestConvVAE:
    def test_shapes_and_factor(self, rng):
        vae = tiny_vae()
        assert vae.factor == 2
        x = jnp.zeros((2, 8, 8, 3))
        params = vae.init(rng, x, jax.random.PRNGKey(1))
        mean, logvar = vae.apply(params, x, method=ConvVAE.encode)
        assert mean.shape == logvar.shape == (2, 4, 4, 2)
        rec = vae.apply(params, mean, method=ConvVAE.decode)
        assert rec.shape == x.shape
        rec2, m2, lv2 = vae.apply(params, x, jax.random.PRNGKey(2))
        assert rec2.shape == x.shape and m2.shape == (2, 4, 4, 2)

    def test_factor_four(self):
        assert ConvVAE(channel_multipliers=(1, 2, 4)).factor == 4

    def test_fully_convolutional_one_checkpoint_many_sizes(self, rng):
        """Params are image-size independent: init at 8px, run at 16px."""
        vae = tiny_vae()
        params = vae.init(rng, jnp.zeros((1, 8, 8, 3)), jax.random.PRNGKey(1))
        mean, _ = vae.apply(
            params, jnp.zeros((1, 16, 16, 3)), method=ConvVAE.encode
        )
        assert mean.shape == (1, 8, 8, 2)

    def test_logvar_clipped(self, rng):
        """The posterior variance bound keeps exp(logvar) finite under any
        transient blow-up (SD convention, models/vae.py)."""
        vae = tiny_vae()
        x = 1e6 * jax.random.normal(rng, (1, 8, 8, 3))
        params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                          jax.random.PRNGKey(1))
        _, logvar = vae.apply(params, x, method=ConvVAE.encode)
        assert float(jnp.max(logvar)) <= 20.0
        assert float(jnp.min(logvar)) >= -30.0
        assert np.isfinite(float(jnp.exp(logvar).sum()))

    def test_kl_golden(self):
        # KL(N(0,I) || N(0,I)) = 0
        z = jnp.zeros((4, 3))
        assert float(kl_divergence(z, z)) == 0.0
        # analytic: 0.5 * mean(mu^2 + e^lv - 1 - lv)
        mean = jnp.asarray([[1.0, -2.0]])
        logvar = jnp.asarray([[0.5, -1.0]])
        want = 0.5 * np.mean(
            np.array([1.0, 4.0]) + np.exp([0.5, -1.0]) - 1.0 - np.array([0.5, -1.0])
        )
        np.testing.assert_allclose(float(kl_divergence(mean, logvar)), want,
                                   rtol=1e-6)


class TestLitVAE:
    def test_loss_and_surfaces(self, rng):
        lit = LitVAE(model=tiny_vae(), img_channels=3, lr=1e-3, warmup=1)
        state = lit.init_state(rng, img_size=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
        loss = lit.make_loss_fn()(state.params, jax.random.PRNGKey(2), x)
        assert np.isfinite(float(loss))
        # eval_loss is deterministic (decodes the posterior MEAN)
        e1 = lit.eval_loss(state.params, jax.random.PRNGKey(3), x)
        e2 = lit.eval_loss(state.params, jax.random.PRNGKey(4), x)
        assert float(e1) == float(e2)
        # generate keeps the GenerateImage/sample surface alive
        out = lit.generate(state, jax.random.PRNGKey(5), (2, 8, 8, 3))
        assert out.shape == (2, 8, 8, 3)
        final, hist = lit.generate(
            state, jax.random.PRNGKey(6), (2, 8, 8, 3), history_length=3
        )
        assert final.shape == (2, 8, 8, 3) and hist.shape == (3, 2, 8, 8, 3)
        rec = lit.reconstruct(state, x)
        assert rec.shape == x.shape

    def test_codec_learns(self, rng):
        """A few steps of real optimization reduce the reconstruction+KL
        objective — the stage-1 proof-of-learning at unit scale."""
        import optax

        lit = LitVAE(model=tiny_vae(), img_channels=3, lr=3e-3, warmup=1)
        state = lit.init_state(rng, img_size=8)
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 3),
                               minval=-1.0, maxval=1.0)
        loss_fn = lit.make_loss_fn()
        tx = lit.make_optimizer()
        opt_state = tx.init(state.params)
        params = state.params

        @jax.jit
        def step(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, key, x)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        first = None
        for i in range(30):
            params, opt_state, loss = step(
                params, opt_state, jax.random.PRNGKey(100 + i)
            )
            if first is None:
                first = float(loss)
        assert float(loss) < 0.7 * first


# ------------------------------------------------------- the latent mixin
@pytest.fixture(scope="module")
def vae_and_params():
    vae = tiny_vae()
    lit = LitVAE(model=vae, img_channels=3)
    state = lit.init_state(jax.random.PRNGKey(0), img_size=8)
    return vae, state.ema_params


class TestLatentSeam:
    def test_pixel_harness_hooks_are_identity(self, rng):
        """The base-class seam must not perturb pixel harnesses: identity
        transforms and — critically — an UNTOUCHED rng stream (the pixel
        harnesses' per-step rng folds are pinned by the resume tests)."""
        lit = LitDDPM(model=tiny_unet(3), timesteps=10, img_channels=3)
        x = jnp.ones((2, 4, 4, 3))
        out, rng_out = lit.encode_target(rng, x)
        assert out is x and rng_out is rng
        assert lit.encode_eval(x) is x
        assert lit.sample_space_shape((2, 4, 4, 3)) == (2, 4, 4, 3)
        assert lit.to_images(x) is x

    def test_sample_space_shape(self, vae_and_params):
        vae, params = vae_and_params
        lat = LitLatentDDPM(vae=vae, vae_params=params, latent_scale=1.0,
                            model=tiny_unet(), timesteps=10)
        assert lat.sample_space_shape((4, 8, 8, 3)) == (4, 4, 4, 2)
        with pytest.raises(ValueError, match="not divisible"):
            lat.sample_space_shape((4, 9, 9, 3))
        with pytest.raises(ValueError, match="not divisible"):
            lat.init_state(jax.random.PRNGKey(0), img_size=9)

    def test_encode_target_applies_scale(self, vae_and_params, rng):
        """Latents scale linearly with latent_scale, and the posterior
        sample actually carries encoder information (differs per input)."""
        vae, params = vae_and_params
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3),
                               minval=-1, maxval=1)
        mk = lambda s: LitLatentDDPM(
            vae=vae, vae_params=params, latent_scale=s,
            model=tiny_unet(), timesteps=10,
        )
        z1, rng1 = mk(1.0).encode_target(rng, x)
        z2, rng2 = mk(2.0).encode_target(rng, x)
        assert z1.shape == (4, 4, 4, 2)
        np.testing.assert_allclose(np.asarray(z2), 2 * np.asarray(z1),
                                   rtol=1e-5)
        # the mixin consumes rng (posterior sampling) — stream must advance
        assert not np.array_equal(np.asarray(rng1), np.asarray(rng))
        # deterministic eval path: posterior mean, no rng
        e1 = mk(1.0).encode_eval(x)
        assert e1.shape == (4, 4, 4, 2)

    def test_to_images_decodes_and_handles_history(self, vae_and_params):
        vae, params = vae_and_params
        lat = LitLatentDDPM(vae=vae, vae_params=params, latent_scale=1.5,
                            model=tiny_unet(), timesteps=10)
        z = jnp.ones((2, 4, 4, 2))
        img = lat.to_images(z)
        assert img.shape == (2, 8, 8, 3)
        hist = lat.to_images(jnp.stack([z, z, z]))
        assert hist.shape == (3, 2, 8, 8, 3)
        np.testing.assert_allclose(np.asarray(hist[0]), np.asarray(img),
                                   rtol=1e-6)

    def test_default_model_built_at_latent_width(self, vae_and_params):
        """model=None builds the denoiser at latent_channels, not
        img_channels — the base class would get this wrong."""
        vae, params = vae_and_params
        lat = LitLatentDDPM(vae=vae, vae_params=params, latent_scale=1.0,
                            timesteps=10)
        assert lat.model.in_channels == vae.latent_channels
        assert lat.model_in_channels() == vae.latent_channels

    def test_missing_codec_raises(self):
        with pytest.raises(ValueError, match="vae_ckpt"):
            LitLatentDDPM(model=tiny_unet(), timesteps=10)

    def test_unresolved_scale_raises(self, vae_and_params):
        vae, params = vae_and_params
        lat = LitLatentDDPM(vae=vae, vae_params=params,
                            model=tiny_unet(), timesteps=10)
        with pytest.raises(ValueError, match="latent_scale unresolved"):
            lat.make_loss_fn(None)

    def test_scale_precedence_json_then_computed(self, vae_and_params,
                                                 tmp_path):
        vae, params = vae_and_params
        ckpt = str(tmp_path / "vae_run")
        os.makedirs(ckpt)
        # (a) persisted json wins over calibration
        with open(os.path.join(ckpt, "latent_scale.json"), "w") as f:
            json.dump({"latent_scale": 3.25}, f)
        lat = LitLatentDDPM(vae=vae, vae_params=params, vae_ckpt=ckpt,
                            model=tiny_unet(), timesteps=10)
        lat.make_loss_fn(None)  # resolves without a datamodule
        assert lat._require_scale() == 3.25
        # (b) explicit value wins over json
        lat2 = LitLatentDDPM(vae=vae, vae_params=params, vae_ckpt=ckpt,
                             latent_scale=0.5, model=tiny_unet(),
                             timesteps=10)
        assert lat2._require_scale() == 0.5
        # (c) no json → calibrated from data AND persisted for later
        # sample/test/serve sessions
        ckpt2 = str(tmp_path / "vae_run2")
        lat3 = LitLatentDDPM(vae=vae, vae_params=params, vae_ckpt=ckpt2,
                             model=tiny_unet(), timesteps=10,
                             scale_probe_n=16)
        dm = Shapes(size=32, batch_size=8, img_size=8, horizontal_flip=False)
        lat3.make_loss_fn(dm)
        s = lat3._require_scale()
        assert s > 0 and np.isfinite(s)
        with open(os.path.join(ckpt2, "latent_scale.json")) as f:
            assert json.load(f)["latent_scale"] == s


# ------------------------------------------------------ two-stage end-to-end
class TestTwoStage:
    @pytest.mark.slow
    def test_vae_fit_then_latent_fit_and_generate(self, tmp_path):
        """The full Rombach two-stage recipe through the PUBLIC fit loop:
        stage-1 LitVAE fit (checkpointed) → stage-2 LitLatentDDPM restores
        the codec from vae_ckpt, auto-calibrates the latent scale, trains,
        and generates decoded IMAGES; the scale json lands next to the VAE
        checkpoint for later sample/test/serve sessions."""
        dm = Shapes(size=64, batch_size=8, img_size=8, horizontal_flip=False)
        vae_dir = str(tmp_path / "vae")
        vae = tiny_vae()
        fit(
            LitVAE(model=vae, img_channels=3, lr=1e-3, warmup=1),
            dm, max_steps=3, ckpt_dir=vae_dir, ckpt_every=3, log_every=100,
        )

        lat = LitLatentDDPM(
            vae=vae, vae_ckpt=vae_dir, model=tiny_unet(), timesteps=10,
            lr=1e-3, warmup=1, scale_probe_n=16,
        )
        state = fit(lat, dm, max_steps=3, log_every=100)
        assert int(jax.device_get(state.step)) == 3
        assert os.path.exists(os.path.join(vae_dir, "latent_scale.json"))

        out = lat.generate(state, jax.random.PRNGKey(0), (2, 8, 8, 3))
        assert out.shape == (2, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()
        # reverse-trajectory history decodes to image space too
        final, hist = lat.generate(
            state, jax.random.PRNGKey(1), (2, 8, 8, 3), history_length=2
        )
        assert final.shape == (2, 8, 8, 3)
        assert hist.shape == (2, 2, 8, 8, 3)

    @pytest.mark.slow
    def test_latent_flow_trains(self, vae_and_params):
        """The mixin composes onto ANY LitDDPM-family formulation: one
        optimizer step of latent flow matching (the SD3 recipe's seam)."""
        import optax

        vae, params = vae_and_params
        lat = LitLatentFlow(vae=vae, vae_params=params, latent_scale=1.0,
                            model=tiny_unet(), lr=1e-3, warmup=1)
        state = lat.init_state(jax.random.PRNGKey(0), img_size=8)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3),
                               minval=-1, maxval=1)
        loss_fn = lat.make_loss_fn()
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, jax.random.PRNGKey(2), x
        )
        assert np.isfinite(float(loss))
        norms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
        assert sum(jax.tree.leaves(norms)) > 0
        out = lat.generate(state, jax.random.PRNGKey(3), (2, 8, 8, 3))
        assert out.shape == (2, 8, 8, 3)
