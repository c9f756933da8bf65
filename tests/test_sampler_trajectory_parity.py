"""Sampler-TRAJECTORY parity vs the reference's own torch sampling loops.

The last parity surface (VERDICT r3 next-round #3): test_torch_parity.py pins
train-step losses/gradients and UNet forwards, but the reverse-process CHAIN
was only proven against this repo's own reading of the equations. Here the
reference's real ``DDPM.sampling_step`` (src/dmme/diffusion_models/
ddpm.py:83-111), ``DDIM.sampling_step`` (ddim.py:55-77) and
``IDDPM.sampling_step`` (iddpm.py:118-148) are driven step-by-step with the
SAME weights and the SAME injected per-step noise as this repo's jitted
``generate`` scan, and every intermediate x_t along the trajectory must
match to f32 roundoff.

Noise injection: this repo's ``Gaussian.sample(key)`` draws
``eps = normal(key, mean.shape)`` with ``key = fold_in(scan_key, t)``
(diffusion/ddpm.py generate body). The test precomputes that exact eps
sequence and monkeypatches ``torch.distributions.Normal.sample`` to consume
it, so both loops realize the identical stochastic trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dmme_tpu.models import as_model_fn, ddpm as ddpm_models, iddpm as iddpm_models
from dmme_tpu.utils.torch_convert import copy_unet as _copy_unet
from dmme_tpu.utils.torch_convert import load_reference_model_module as _load_ref

from tests.test_torch_parity import TINY, _load_ref_dmme


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.tensor(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def _nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return x_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture
def no_torch_validate_args():
    """The reference's DDIM builds ``Normal(mean, std=0)`` at the τ₀=0 step
    (ᾱ=1; it only ever reads ``.mean`` there — diffusion_models/ddim.py:77).
    Modern torch validates ``scale > 0`` by default and raises; the
    reference predates strict validation, so relax it for this test only."""
    torch.distributions.Distribution.set_default_validate_args(False)
    yield
    torch.distributions.Distribution.set_default_validate_args(True)


def _inject_noise(monkeypatch, eps_seq):
    """Make every ``Normal(...).sample()`` realize ``mean + std * eps`` with
    eps taken from ``eps_seq`` (NCHW torch tensors), in call order."""
    it = iter(eps_seq)

    def sample(self, sample_shape=torch.Size()):
        assert sample_shape == torch.Size(), sample_shape
        return self.mean + self.stddev * next(it)

    monkeypatch.setattr(torch.distributions.Normal, "sample", sample)


def _jax_trajectory(algo, model_fn, params, rng, shape, n_steps):
    """Run the repo's REAL jitted generate scan, capturing every frame."""
    x0, hist = jax.jit(
        lambda p, r: algo.generate(
            model_fn, p, r, shape, history_length=n_steps
        )
    )(params, rng)
    np.testing.assert_allclose(
        np.asarray(hist[-1]), np.asarray(x0), rtol=0, atol=0
    )
    return np.asarray(hist)  # hist[k] = x after the step at t = n_steps - k


def _step_keys(rng, shape, ts):
    """The per-step eps the repo's scan will draw: fold_in(scan_key, t)."""
    x_key, scan_key = jax.random.split(rng)
    x_T = np.asarray(jax.random.normal(x_key, shape, jnp.float32))
    eps = [
        np.asarray(
            jax.random.normal(jax.random.fold_in(scan_key, int(t)), shape, jnp.float32)
        )
        for t in ts
    ]
    return x_T, eps


@pytest.mark.slow
def test_ddpm_ancestral_trajectory_matches_reference(rng, monkeypatch):
    """T=25 ancestral chain: every x_t of the repo's lax.scan == the
    reference's Python loop over its own sampling_step, shared weights +
    injected noise."""
    dmme_ref = _load_ref_dmme()
    ref_models = _load_ref("ddpm")
    T, shape = 25, (2, 16, 16, 3)

    torch.manual_seed(3)
    net = ref_models.UNet(**TINY, dropout=0.0, attention_depths=(2,)).eval()
    ref_algo = dmme_ref.diffusion_models.DDPM(net, timesteps=T)

    from dmme_tpu.diffusion import DDPM

    model = ddpm_models.UNet(**TINY, dropout=0.0, attention_depths=(2,))
    params = model.init(rng, jnp.zeros(shape), jnp.zeros((2,), jnp.int32))
    params = _copy_unet(params, net, film=False, heads=1)
    algo = DDPM.create(timesteps=T)

    gen_rng = jax.random.PRNGKey(11)
    ts = list(range(T, 0, -1))
    x_T, eps_seq = _step_keys(gen_rng, shape, ts)
    hist = _jax_trajectory(algo, as_model_fn(model), params, gen_rng, shape, T)

    # reference loop (generate's body, :113-133, without tqdm), same draw
    _inject_noise(monkeypatch, [_nchw(e) for e in eps_seq])
    all_t = torch.arange(0, T + 1).unsqueeze(1)
    x = _nchw(x_T)
    with torch.no_grad():
        for k, t in enumerate(ts):
            x = ref_algo.sampling_step(x, all_t[t])
            np.testing.assert_allclose(
                hist[k], _nhwc(x), rtol=2e-3, atol=1e-4,
                err_msg=f"trajectory diverged at t={t} (step {k})",
            )


@pytest.mark.slow
def test_ddim_reference_variant_trajectory_matches_reference(
    rng, monkeypatch, no_torch_validate_args
):
    """T=100/S=10 quadratic-τ deterministic chain vs the reference's
    DDIM.sampling_step (incl. its x̂₀/√ᾱ_{τ_{i−1}} deviation — this is what
    variant='reference' exists to be bit-compatible with)."""
    dmme_ref = _load_ref_dmme()
    ref_models = _load_ref("ddpm")
    T, S, shape = 100, 10, (2, 16, 16, 3)

    torch.manual_seed(4)
    net = ref_models.UNet(**TINY, dropout=0.0, attention_depths=(2,)).eval()
    ref_algo = dmme_ref.diffusion_models.DDIM(
        net, timesteps=T, sub_timesteps=S, tau_schedule="quadratic"
    )

    from dmme_tpu.diffusion import DDIM

    model = ddpm_models.UNet(**TINY, dropout=0.0, attention_depths=(2,))
    params = model.init(rng, jnp.zeros(shape), jnp.zeros((2,), jnp.int32))
    params = _copy_unet(params, net, film=False, heads=1)
    algo = DDIM.create(
        timesteps=T, sub_timesteps=S, tau_schedule="quadratic",
        variant="reference",
    )
    np.testing.assert_array_equal(
        np.asarray(algo.tau), ref_algo.tau.numpy().reshape(-1)
    )

    gen_rng = jax.random.PRNGKey(12)
    x_T, _ = _step_keys(gen_rng, shape, [])
    hist = _jax_trajectory(algo, as_model_fn(model), params, gen_rng, shape, S)

    all_i = torch.arange(0, S + 1).unsqueeze(1)
    x = _nchw(x_T)
    with torch.no_grad():
        for k, i in enumerate(range(S, 0, -1)):
            x = ref_algo.sampling_step(x, all_i[i])
            np.testing.assert_allclose(
                hist[k], _nhwc(x), rtol=2e-3, atol=1e-4,
                err_msg=f"trajectory diverged at i={i} (step {k})",
            )


@pytest.mark.slow
def test_iddpm_learned_variance_trajectory_matches_reference(rng, monkeypatch):
    """T=20 cosine-schedule chain with LEARNED variance vs the reference's
    IDDPM.sampling_step (model output chunked into ε‖v, Σ interpolated
    between β and β̃). Batch 1: the reference MHA scrambles batch>1
    (PARITY.md deviation 6)."""
    dmme_ref = _load_ref_dmme()
    ref_models = _load_ref("iddpm")
    T, shape = 20, (1, 16, 16, 3)

    torch.manual_seed(5)
    net = ref_models.UNet(**TINY, dropout=0.0, attention_depths=(2, 3)).eval()
    ref_algo = dmme_ref.diffusion_models.IDDPM(net, timesteps=T)

    from dmme_tpu.diffusion import IDDPM

    model = iddpm_models.UNet(
        **TINY, dropout=0.0, attention_depths=(2, 3), num_heads=4
    )
    params = model.init(rng, jnp.zeros(shape), jnp.zeros((1,), jnp.int32))
    params = _copy_unet(params, net, film=True, heads=4)
    algo = IDDPM.create(timesteps=T)

    np.testing.assert_allclose(
        np.asarray(algo.schedule.alpha_bar),
        ref_algo.alpha_bar.numpy().reshape(-1),
        rtol=1e-6, atol=1e-7,
    )

    gen_rng = jax.random.PRNGKey(13)
    ts = list(range(T, 0, -1))
    x_T, eps_seq = _step_keys(gen_rng, shape, ts)
    hist = _jax_trajectory(algo, as_model_fn(model), params, gen_rng, shape, T)

    _inject_noise(monkeypatch, [_nchw(e) for e in eps_seq])
    all_t = torch.arange(0, T + 1).unsqueeze(1)
    x = _nchw(x_T)
    with torch.no_grad():
        for k, t in enumerate(ts):
            x = ref_algo.sampling_step(x, all_t[t])
            np.testing.assert_allclose(
                hist[k], _nhwc(x), rtol=2e-3, atol=2e-4,
                err_msg=f"trajectory diverged at t={t} (step {k})",
            )
