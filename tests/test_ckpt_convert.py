"""Checkpoint migration: reference Lightning .ckpt → dmme-tpu Orbax run dir.

End-to-end through scripts/convert_torch_ckpt.py: a (tiny) reference torch
UNet's Lightning-style checkpoint is converted, restored through the
framework's own CheckpointManager, and the flax forward must match the
torch forward on the same input — proving the migration path preserves the
exact weights, not just shapes.
"""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dmme_tpu.config import instantiate, load_config
from dmme_tpu.training.checkpoint import CheckpointManager
from dmme_tpu.utils.torch_convert import (
    load_reference_model_module,
    strip_state_dict_prefix,
)

TINY = dict(pos_dim=4, emb_dim=8, num_groups=2,
            channels_per_depth=(4, 8, 16, 32), num_blocks=2)


def _write_config(tmp_path, out_dir):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(textwrap.dedent(f"""
        seed_everything: 7
        trainer:
          default_root_dir: {out_dir}
        model:
          class_path: dmme_tpu.training.LitDDPM
          init_args:
            timesteps: 10
            warmup: 10
            model:
              class_path: dmme_tpu.models.ddpm.UNet
              init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                           channels_per_depth: [4, 8, 16, 32], num_blocks: 2,
                           dropout: 0.0, attention_depths: [2]}}
        data:
          class_path: dmme_tpu.data.CIFAR10
          init_args: {{synthetic: true, synthetic_size: 16, batch_size: 4}}
        """))
    return cfg


def _real_lightning_nesting(net):
    """Build the reference's actual module tree via real torch modules:
    LitDDPM.diffusion_model = DDPM, DDPM.model = UNet
    (/root/reference/src/dmme/lit_modules/ddpm.py:51-56), so state_dict()
    produces genuine ``diffusion_model.model.*`` keys — not a hand-written
    prefix that could mask a mismatch."""
    ddpm = torch.nn.Module()
    ddpm.model = net
    lit = torch.nn.Module()
    lit.diffusion_model = ddpm
    return lit


class TestStripPrefix:
    def test_lightning_double_prefix(self):
        sd = {"model.model.input_conv.weight": 1, "model.model.x.y": 2,
              "model.model.beta": 3}
        out = strip_state_dict_prefix(sd)
        assert out == {"input_conv.weight": 1, "x.y": 2}  # buffers dropped

    def test_real_reference_nesting(self):
        net = torch.nn.Module()
        net.input_conv = torch.nn.Conv2d(3, 4, 1)
        sd = _real_lightning_nesting(net).state_dict()
        assert "diffusion_model.model.input_conv.weight" in sd
        out = strip_state_dict_prefix(sd)
        assert set(out) == {"input_conv.weight", "input_conv.bias"}

    def test_bare_unet(self):
        sd = {"input_conv.weight": 1}
        assert strip_state_dict_prefix(sd) == sd

    def test_no_anchor_raises(self):
        with pytest.raises(ValueError):
            strip_state_dict_prefix({"whatever": 1})


class TestConvertScript:
    @pytest.mark.slow
    def test_roundtrip_forward_parity(self, tmp_path):
        ref = load_reference_model_module("ddpm")
        net = ref.UNet(**TINY, dropout=0.0, attention_depths=(2,)).eval()
        ckpt = tmp_path / "last.ckpt"
        torch.save(
            {
                "state_dict": _real_lightning_nesting(net).state_dict(),
                "global_step": 1234,
            },
            ckpt,
        )

        out_dir = tmp_path / "migrated"
        cfg = _write_config(tmp_path, out_dir)

        from scripts.convert_torch_ckpt import main

        main(["--ckpt", str(ckpt), "--config", str(cfg), "--out", str(out_dir)])

        config = load_config(str(cfg))
        lit = instantiate(config["model"])
        state = lit.init_state(jax.random.PRNGKey(1), img_size=32)
        mgr = CheckpointManager(str(out_dir))
        assert mgr.latest_step() == 1234
        state = mgr.restore(state)
        assert int(jax.device_get(state.step)) == 1234

        x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
        t = np.asarray([3, 7], np.int64)
        with torch.no_grad():
            want = (
                net(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    torch.from_numpy(t))
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        got = lit.model.apply(
            state.params, jnp.asarray(x), jnp.asarray(t, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
        # EMA defaults to the raw weights when no sidecar is given
        got_ema = lit.model.apply(
            state.ema_params, jnp.asarray(x), jnp.asarray(t, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(got_ema), want, atol=2e-5)
