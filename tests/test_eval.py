"""FID / Inception Score / InceptionV3 tests.

The reference has no metric tests at all (metrics delegated to torchmetrics);
here the streaming statistics, the Fréchet closed form, the IS math, and the
Conv+BN folding are each verified against independent references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmme_tpu.eval import (
    FeatureStats,
    FrechetInceptionDistance,
    InceptionScore,
    InceptionV3,
    frechet_distance,
)


class TestFeatureStats:
    def test_streaming_moments_match_numpy(self):
        rs = np.random.RandomState(0)
        feats = rs.randn(500, 16).astype(np.float32)
        stats = FeatureStats.create(16)
        for i in range(0, 500, 100):
            stats = stats.update(jnp.asarray(feats[i : i + 100]))
        mu, cov = stats.moments()
        np.testing.assert_allclose(mu, feats.mean(0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cov, np.cov(feats, rowvar=False), rtol=1e-3, atol=1e-4)

    def test_merge_equals_single_pass(self):
        rs = np.random.RandomState(1)
        a = rs.randn(100, 8).astype(np.float32)
        b = rs.randn(50, 8).astype(np.float32)
        s1 = FeatureStats.create(8).update(jnp.asarray(a)).update(jnp.asarray(b))
        s2 = FeatureStats.create(8).update(jnp.asarray(a)).merge(
            FeatureStats.create(8).update(jnp.asarray(b))
        )
        np.testing.assert_allclose(np.asarray(s1.outer), np.asarray(s2.outer), rtol=1e-5)


class TestFrechet:
    def test_identical_distributions_zero(self):
        rs = np.random.RandomState(2)
        mu = rs.randn(8)
        a = rs.randn(8, 8)
        cov = a @ a.T + np.eye(8)
        assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6

    def test_univariate_closed_form(self):
        # d=1: FID = (mu1-mu2)^2 + (s1-s2)^2
        got = frechet_distance(
            np.array([1.0]), np.array([[4.0]]), np.array([3.0]), np.array([[9.0]])
        )
        np.testing.assert_allclose(got, (1 - 3) ** 2 + (2 - 3) ** 2, rtol=1e-6)

    def test_matches_scipy_sqrtm(self):
        import scipy.linalg

        rs = np.random.RandomState(3)
        a = rs.randn(6, 6)
        b = rs.randn(6, 6)
        c1 = a @ a.T + 0.1 * np.eye(6)
        c2 = b @ b.T + 0.1 * np.eye(6)
        mu1, mu2 = rs.randn(6), rs.randn(6)
        want = (
            np.sum((mu1 - mu2) ** 2)
            + np.trace(c1 + c2 - 2 * scipy.linalg.sqrtm(c1 @ c2).real)
        )
        got = frechet_distance(mu1, c1, mu2, c2)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_precomputed_real_stats_roundtrip(self, tmp_path):
        """save_real_stats -> load_real_stats must reproduce the streaming
        FID exactly (pytorch-fid mu/sigma npz convention)."""
        rs = np.random.RandomState(9)
        real = rs.randn(200, 8).astype(np.float32)
        fake = rs.randn(200, 8).astype(np.float32) + 1.0

        a = FrechetInceptionDistance(dim=8)
        a.update(jnp.asarray(real), real=True)
        a.update(jnp.asarray(fake), real=False)
        want = a.compute()
        path = str(tmp_path / "stats.npz")
        a.save_real_stats(path)

        b = FrechetInceptionDistance(dim=8)
        b.load_real_stats(path)
        b.update(jnp.asarray(fake), real=False)
        np.testing.assert_allclose(b.compute(), want, rtol=1e-10)
        d = np.load(path)
        assert set(d.files) >= {"mu", "sigma"}  # pytorch-fid convention

    def test_fid_metric_end_to_end(self):
        rs = np.random.RandomState(4)
        fid = FrechetInceptionDistance(dim=8)
        real = rs.randn(300, 8).astype(np.float32)
        fake = rs.randn(300, 8).astype(np.float32) + 2.0
        fid.update(jnp.asarray(real), real=True)
        fid.update(jnp.asarray(fake), real=False)
        v = fid.compute()
        assert v > 8.0  # |mu diff|^2 ~ 8*4=32ish minus cov noise
        # reset keeps real stats (reset_real_features=False parity)
        fid.reset()
        fid.update(jnp.asarray(real), real=False)
        assert fid.compute() < v


class TestInceptionScore:
    def test_uniform_logits_score_one(self):
        logits = jnp.zeros((64, 10))
        m = InceptionScore(num_classes=10)
        m.update(logits)
        np.testing.assert_allclose(m.score(), 1.0, rtol=1e-5)

    def test_onehot_classes_score_k(self):
        # Confident predictions uniformly covering K classes: IS -> K
        k = 10
        logits = jnp.eye(k).repeat(10, axis=0) * 50.0
        m = InceptionScore(num_classes=k)
        m.update(logits)
        np.testing.assert_allclose(m.score(), k, rtol=1e-3)

    def test_matches_direct_computation(self):
        rs = np.random.RandomState(5)
        logits = rs.randn(40, 7).astype(np.float32) * 3
        m = InceptionScore(num_classes=7)
        m.update(jnp.asarray(logits[:25]))
        m.update(jnp.asarray(logits[25:]))
        kl_mean, _ = m.compute()

        p = np.exp(logits - logits.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        marginal = p.mean(0)
        kl = (p * (np.log(p) - np.log(marginal))).sum(1).mean()
        np.testing.assert_allclose(kl_mean, kl, rtol=1e-4)


class TestInceptionV3:
    @pytest.mark.slow
    def test_forward_shapes(self, rng):
        # default = FID-standard topology (1008 logits, pytorch-fid)
        model = InceptionV3()
        x = jnp.zeros((1, 299, 299, 3))
        params = jax.jit(model.init)(rng, x)
        feats, logits = model.apply(params, x)
        assert feats.shape == (1, 2048)
        assert logits.shape == (1, 1008)

    @pytest.mark.slow
    def test_forward_shapes_torchvision_variant(self, rng):
        model = InceptionV3(variant="torchvision")
        x = jnp.zeros((1, 299, 299, 3))
        params = jax.jit(model.init)(rng, x)
        feats, logits = model.apply(params, x)
        assert feats.shape == (1, 2048)
        assert logits.shape == (1, 1000)

    def test_convbn_folding_matches_torch(self):
        """The state-dict converter's fold W'=W·γ/√(σ²+ε), b'=β−γμ/√(σ²+ε)
        must reproduce torch's eval-mode Conv→BN exactly."""
        import torch

        torch.manual_seed(0)
        conv = torch.nn.Conv2d(3, 4, 3, bias=False)
        bn = torch.nn.BatchNorm2d(4, eps=1e-3)
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.data.normal_()
        bn.bias.data.normal_()
        bn.eval()
        x = torch.randn(2, 3, 8, 8)
        with torch.no_grad():
            want = bn(conv(x)).numpy().transpose(0, 2, 3, 1)

        w = conv.weight.detach().numpy()
        scale = bn.weight.detach().numpy() / np.sqrt(
            bn.running_var.numpy() + 1e-3
        )
        w_folded = (w * scale[:, None, None, None]).transpose(2, 3, 1, 0)
        b_folded = bn.bias.detach().numpy() - bn.running_mean.numpy() * scale

        got = jax.lax.conv_general_dilated(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(w_folded),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_folded
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestEvaluateLoop:
    @pytest.mark.slow
    def test_end_to_end_tiny(self, rng, tmp_path):
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.diffusion import DDPM
        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.training import LitDDPM
        from dmme_tpu.training.evaluate import test as run_test

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1,
            ),
            diffusion_model=DDPM.create(timesteps=5),
        )
        dm = CIFAR10(synthetic=True, synthetic_size=8, batch_size=4)
        results = run_test(lit, dm, seed=0, max_batches=1)
        assert np.isfinite(results["fid"])
        assert np.isfinite(results["inception_score"])
        assert "warning" in results  # random inception weights

    @pytest.mark.slow
    def test_sharded_eval_matches_single_device(self, rng, tmp_path):
        """test(mesh=8-device) must produce the same FID/IS as single-device
        (same seed; SPMD partitioning is a pure re-layout). Also covers the
        fid_stats save/skip path end-to-end."""
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.diffusion import DDPM
        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.parallel import make_mesh
        from dmme_tpu.training import LitDDPM
        from dmme_tpu.training.evaluate import test as run_test

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1,
            ),
            diffusion_model=DDPM.create(timesteps=4),
        )
        dm = CIFAR10(synthetic=True, synthetic_size=16, batch_size=8)
        stats = str(tmp_path / "real.npz")
        single = run_test(lit, dm, seed=0, max_batches=1, save_fid_stats=stats)
        sharded = run_test(lit, dm, seed=0, max_batches=1, mesh=make_mesh())
        np.testing.assert_allclose(sharded["fid"], single["fid"], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            sharded["inception_score"], single["inception_score"], rtol=1e-3
        )
        # precomputed-stats path reproduces the same FID
        from_stats = run_test(lit, dm, seed=0, max_batches=1, fid_stats=stats)
        np.testing.assert_allclose(from_stats["fid"], single["fid"], rtol=1e-6)


class TestSamplerOverrideInTest:
    @pytest.mark.slow
    def test_fid_with_dpm_override(self, tmp_path):
        """trainer-test's sampler override: FID evaluation through
        DPM-Solver++ at few NFE (2.4x cheaper generation)."""
        from dmme_tpu.data import CIFAR10
        from dmme_tpu.models import ddpm as ddpm_models
        from dmme_tpu.training import LitDDPM
        from dmme_tpu.training.evaluate import test as run_test

        lit = LitDDPM(
            model=ddpm_models.UNet(
                pos_dim=4, emb_dim=8, num_groups=2,
                channels_per_depth=(4, 8, 8, 8), num_blocks=1,
            ),
            timesteps=8, warmup=10,
        )
        dm = CIFAR10(synthetic=True, synthetic_size=8, batch_size=4)
        res = run_test(lit, dm, max_batches=1, sampler="dpm", sample_steps=3)
        assert "fid" in res and res["num_batches"] == 1
