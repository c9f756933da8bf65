"""Config-instantiation and CLI tests (reference surface: LightningCLI YAMLs)."""

import os
import textwrap

import numpy as np
import pytest

from dmme_tpu.config import apply_overrides, instantiate, load_config


class TestInstantiate:
    def test_class_path_tree(self):
        node = {
            "class_path": "dmme_tpu.training.LitDDPM",
            "init_args": {
                "lr": 1e-3,
                "model": {
                    "class_path": "dmme_tpu.models.ddpm.UNet",
                    "init_args": {
                        "pos_dim": 4,
                        "emb_dim": 8,
                        "num_groups": 2,
                        "channels_per_depth": [4, 8, 8, 8],
                        "num_blocks": 1,
                    },
                },
            },
        }
        lit = instantiate(node)
        assert lit.lr == 1e-3
        assert lit.model.channels_per_depth == (4, 8, 8, 8)

    def test_dtype_string_canonicalized(self):
        import jax.numpy as jnp

        node = {
            "class_path": "dmme_tpu.training.LitDDPM",
            "init_args": {"dtype": "bf16", "timesteps": 10},
        }
        lit = instantiate(node)
        assert lit.model.dtype == jnp.bfloat16

    def test_overrides(self):
        cfg = {"model": {"init_args": {"lr": 1.0}}}
        apply_overrides(cfg, ["--model.init_args.lr", "2e-4", "trainer.max_steps=7"])
        assert cfg["model"]["init_args"]["lr"] == 2e-4
        assert cfg["trainer"]["max_steps"] == 7


class TestShippedConfigs:
    @pytest.mark.parametrize(
        "path",
        [
            "configs/ddpm/cifar10.yaml",
            "configs/ddim/cifar10.yaml",
            "configs/iddpm/cifar10.yaml",
            "configs/edm/cifar10.yaml",
            "configs/ddpm/cifar10_vpred.yaml",
        ],
    )
    def test_configs_instantiate(self, path):
        cfg = load_config(os.path.join(os.path.dirname(__file__), "..", path))
        assert cfg["seed_everything"] == 1337
        model = instantiate(cfg["model"])
        data = instantiate(cfg["data"])
        assert model.diffusion_model is not None
        assert data.batch_size == 128

    def test_reference_hyperparameters_ddpm(self):
        cfg = load_config(
            os.path.join(os.path.dirname(__file__), "..", "configs/ddpm/cifar10.yaml")
        )
        args = cfg["model"]["init_args"]
        assert args["lr"] == 2e-4 and args["warmup"] == 5000
        assert args["decay"] == 0.9999 and args["timesteps"] == 1000
        assert cfg["trainer"]["max_steps"] == 800_000

    def test_reference_hyperparameters_iddpm(self):
        cfg = load_config(
            os.path.join(os.path.dirname(__file__), "..", "configs/iddpm/cifar10.yaml")
        )
        args = cfg["model"]["init_args"]
        assert args["timesteps"] == 4000
        assert args["start"] == 2.5e-5 and args["end"] == 5e-3
        assert args["lr"] == 1e-4


class TestTrainerCLI:
    def test_fit_tiny_run(self, tmp_path):
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                seed_everything: 7
                trainer:
                  max_steps: 2
                  log_every_n_steps: 1
                  ckpt_every_n_steps: 100
                  default_root_dir: {tmp_path}/run
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    warmup: 10
                    timesteps: 10
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 16, batch_size: 4}}
                """
            )
        )
        from dmme_tpu.trainer import main

        main(["fit", "--config", str(cfg)])
        assert (tmp_path / "run" / "metrics.jsonl").exists()

    def test_validate_subcommand(self, tmp_path, capsys):
        """validate = mean eval loss over the test split, no generation
        (real semantics, not a test alias — VERDICT r1 missing #6)."""
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                trainer:
                  default_root_dir: {tmp_path}/runv
                  limit_val_batches: 2
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    timesteps: 4
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 16, batch_size: 4}}
                """
            )
        )
        from dmme_tpu.trainer import main

        main(["validate", "--config", str(cfg)])
        out = capsys.readouterr().out
        assert "val/loss" in out and "'num_batches': 2" in out

    @pytest.mark.slow
    def test_test_subcommand(self, tmp_path, capsys):
        """fit 1 step -> test: restores the checkpoint and reports FID/IS."""
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                trainer:
                  max_steps: 1
                  log_every_n_steps: 10
                  ckpt_every_n_steps: 1
                  default_root_dir: {tmp_path}/runt
                  limit_test_batches: 1
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    timesteps: 4
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 8, batch_size: 4}}
                """
            )
        )
        from dmme_tpu.trainer import main

        main(["fit", "--config", str(cfg)])
        main(["test", "--config", str(cfg)])
        out = capsys.readouterr().out
        assert "fid" in out and "inception_score" in out

    def test_sample_subcommand(self, tmp_path):
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                trainer: {{default_root_dir: {tmp_path}/run2}}
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    timesteps: 5
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 8, batch_size: 4}}
                """
            )
        )
        from dmme_tpu.trainer import main

        main(["sample", "--config", str(cfg)])
        import glob

        assert glob.glob(str(tmp_path / "run2" / "samples" / "*"))

    def test_sample_sampler_override(self, tmp_path):
        """trainer.sampler swaps the generation-time sampler (train DDPM,
        sample with DPM-Solver++) and sample_batch is honored."""
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                trainer: {{default_root_dir: {tmp_path}/runs}}
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    timesteps: 8
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 8, batch_size: 4}}
                """
            )
        )
        from dmme_tpu.trainer import main

        main(["sample", "--config", str(cfg), "--trainer.sampler", "dpm",
              "--trainer.sample_steps", "3", "--trainer.sample_batch", "4"])
        import glob

        paths = glob.glob(str(tmp_path / "runs" / "samples" / "*dpm3*"))
        assert len(paths) == 1
        # the predictor–corrector override rides the same surface
        main(["sample", "--config", str(cfg), "--trainer.sampler", "unipc",
              "--trainer.sample_steps", "4", "--trainer.sample_batch", "4"])
        assert glob.glob(str(tmp_path / "runs" / "samples" / "*unipc4*"))

    def test_predict_subcommand(self, tmp_path):
        """predict = per-batch raw .npy samples in [0,1] (real semantics,
        not a sample alias)."""
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                trainer:
                  default_root_dir: {tmp_path}/run3
                  limit_predict_batches: 2
                  predict_batch: 3
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    timesteps: 5
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 8, batch_size: 4}}
                """
            )
        )
        import numpy as np

        from dmme_tpu.trainer import main

        main(["predict", "--config", str(cfg)])
        files = sorted((tmp_path / "run3" / "predictions").glob("*.npy"))
        assert len(files) == 2
        a = np.load(files[0])
        assert a.shape == (3, 32, 32, 3) and a.dtype == np.float32
        assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0
        b = np.load(files[1])
        assert not np.array_equal(a, b)  # per-batch rng fold_in

    @pytest.mark.slow
    def test_sample_sampler_override_iddpm(self, tmp_path):
        """Regression (self-review): the override must adapt IDDPM's
        2C-channel output (eps_only) AND reuse the trained cosine schedule
        rather than rebuilding a default linear one."""
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                trainer: {{default_root_dir: {tmp_path}/runs2}}
                model:
                  class_path: dmme_tpu.training.LitIDDPM
                  init_args:
                    timesteps: 8
                    model:
                      class_path: dmme_tpu.models.iddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 8, batch_size: 4}}
                """
            )
        )
        from dmme_tpu.diffusion import make_sampler
        from dmme_tpu.config import load_config, instantiate

        lit = instantiate(load_config(str(cfg))["model"])
        algo, _ = make_sampler(lit.diffusion_model, "dpm", 3)
        import numpy as np

        # schedule reuse: the override's alpha_bar IS the trained cosine one
        np.testing.assert_array_equal(
            np.asarray(algo.schedule.alpha_bar),
            np.asarray(lit.diffusion_model.schedule.alpha_bar),
        )

        from dmme_tpu.trainer import main

        main(["sample", "--config", str(cfg), "--trainer.sampler", "dpm",
              "--trainer.sample_steps", "3", "--trainer.sample_batch", "2"])
        import glob

        assert glob.glob(str(tmp_path / "runs2" / "samples" / "*dpm3*"))

    def test_sample_unknown_sampler_clean_error(self, tmp_path):
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                trainer: {{default_root_dir: {tmp_path}/runs3}}
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    timesteps: 6
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 8, batch_size: 4}}
                """
            )
        )
        from dmme_tpu.trainer import main

        # no sample_steps given: must be the informative ValueError, not a
        # KeyError from the step-defaults dict (self-review finding)
        with pytest.raises(ValueError, match="unknown sampler"):
            main(["sample", "--config", str(cfg), "--trainer.sampler", "heun"])


class TestStrictConfig:
    """LightningCLI parity: unknown keys anywhere in the tree fail loudly
    (reference jsonargparse behavior, src/dmme/trainer.py:9)."""

    def _cfg(self, tmp_path, extra=""):
        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            textwrap.dedent(
                f"""
                seed_everything: 7
                trainer:
                  max_steps: 1
                  default_root_dir: {tmp_path}/run
                {extra}
                model:
                  class_path: dmme_tpu.training.LitDDPM
                  init_args:
                    warmup: 10
                    timesteps: 10
                    model:
                      class_path: dmme_tpu.models.ddpm.UNet
                      init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                                   channels_per_depth: [4, 8, 8, 8], num_blocks: 1}}
                data:
                  class_path: dmme_tpu.data.CIFAR10
                  init_args: {{synthetic: true, synthetic_size: 16, batch_size: 4}}
                """
            )
        )
        return cfg

    def test_typoed_trainer_key_rejected(self, tmp_path):
        from dmme_tpu.config import ConfigError
        from dmme_tpu.trainer import main

        cfg = self._cfg(tmp_path, extra="  max_step: 5")  # typo (no 's')
        with pytest.raises(ConfigError, match="max_step"):
            main(["fit", "--config", str(cfg)])

    def test_typoed_override_rejected(self, tmp_path):
        from dmme_tpu.config import ConfigError
        from dmme_tpu.trainer import main

        cfg = self._cfg(tmp_path)
        with pytest.raises(ConfigError, match="lrr"):
            main(["fit", "--config", str(cfg),
                  "--model.init_args.lrr", "1e-4"])

    def test_typoed_init_arg_rejected(self, tmp_path):
        from dmme_tpu.config import ConfigError, validate_config, load_config

        cfg = self._cfg(tmp_path)
        config = load_config(str(cfg))
        config["model"]["init_args"]["leraning_rate"] = 1e-4
        with pytest.raises(ConfigError, match="leraning_rate"):
            validate_config(config)

    def test_unknown_top_level_rejected(self, tmp_path):
        from dmme_tpu.config import ConfigError, validate_config, load_config

        config = load_config(str(self._cfg(tmp_path)))
        config["modle"] = {}
        with pytest.raises(ConfigError, match="modle"):
            validate_config(config)

    def test_bad_mesh_axis_rejected(self, tmp_path):
        from dmme_tpu.config import ConfigError, validate_config, load_config

        config = load_config(str(self._cfg(tmp_path)))
        config["trainer"]["mesh"] = {"data": -1, "fsbp": 2}  # typo
        with pytest.raises(ConfigError, match="fsbp"):
            validate_config(config)

    def test_shipped_configs_validate(self):
        import glob
        import os

        from dmme_tpu.config import validate_config, load_config

        # anchor to the repo root so the test is cwd-independent, and
        # assert non-empty so a configs/ rename can't pass vacuously
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(
            glob.glob(os.path.join(root, "configs", "**", "*.yaml"),
                      recursive=True)
        )
        assert len(paths) >= 6  # at least the six reference-mirrored configs
        for path in paths:
            validate_config(load_config(path))

    def test_print_config(self, tmp_path, capsys):
        import yaml

        from dmme_tpu.trainer import main

        cfg = self._cfg(tmp_path)
        main(["fit", "--config", str(cfg), "--print_config",
              "--model.init_args.lr", "3e-4"])
        out = capsys.readouterr().out
        resolved = yaml.safe_load(out)
        assert resolved["model"]["init_args"]["lr"] == 3e-4
        # print_config must NOT have trained anything
        assert not (tmp_path / "run" / "metrics.jsonl").exists()

    def test_introspective_help(self, tmp_path, capsys):
        from dmme_tpu.trainer import main

        main(["fit", "--config", str(self._cfg(tmp_path)), "--help"])
        out = capsys.readouterr().out
        # constructor args of the config's target classes are listed
        assert "dmme_tpu.training.LitDDPM" in out
        assert "lr" in out and "warmup" in out
        assert "synthetic_size" in out  # data class args too
        assert "max_steps" in out      # trainer key listing

    def test_override_through_null_key(self, tmp_path):
        """Shipped configs carry `mesh: null`; a dotted override through it
        must apply, not TypeError on None[...] (round-3 review finding)."""
        from dmme_tpu.config import apply_overrides, load_config

        cfg = self._cfg(tmp_path, extra="  mesh: null")
        config = apply_overrides(
            load_config(str(cfg)), ["--trainer.mesh.data", "2"]
        )
        assert config["trainer"]["mesh"] == {"data": 2}

    def test_callbacks_mapping_rejected(self, tmp_path):
        """callbacks given as a mapping (common YAML mistake) must fail at
        parse time, not as an obscure iteration TypeError after device
        init (round-3 review finding)."""
        from dmme_tpu.config import ConfigError, load_config, validate_config

        config = load_config(str(self._cfg(tmp_path)))
        config["trainer"]["callbacks"] = {
            "class_path": "dmme_tpu.callbacks.ProfileTrace"
        }
        with pytest.raises(ConfigError, match="must be a LIST"):
            validate_config(config)

    def test_override_through_scalar_rejected(self, tmp_path):
        """A dotted override that traverses a scalar (`--trainer.max_steps.typo`)
        must fail loudly instead of silently replacing the value with a dict
        (round-3 review finding)."""
        from dmme_tpu.config import ConfigError, apply_overrides, load_config

        config = load_config(str(self._cfg(tmp_path)))
        with pytest.raises(ConfigError, match="max_steps"):
            apply_overrides(config, ["--trainer.max_steps.typo", "5"])
        assert config["trainer"]["max_steps"] == 1  # untouched

    def test_bare_string_callback_rejected(self, tmp_path):
        """A bare class-path string in callbacks would pass through
        instantiate() unconstructed and silently never run (round-3 review
        finding)."""
        from dmme_tpu.config import ConfigError, load_config, validate_config

        config = load_config(str(self._cfg(tmp_path)))
        config["trainer"]["callbacks"] = ["dmme_tpu.callbacks.ProfileTrace"]
        with pytest.raises(ConfigError, match="class_path"):
            validate_config(config)

    def test_bare_string_model_rejected(self, tmp_path):
        from dmme_tpu.config import ConfigError, load_config, validate_config

        config = load_config(str(self._cfg(tmp_path)))
        config["model"] = "dmme_tpu.training.LitDDPM"
        with pytest.raises(ConfigError, match="class_path"):
            validate_config(config)

    def test_help_survives_missing_config(self, capsys):
        """--help with an unreadable config must degrade, not traceback
        (round-3 review finding)."""
        from dmme_tpu.trainer import main

        main(["fit", "--config", "/nonexistent/cfg.yaml", "--help"])
        out = capsys.readouterr().out
        assert "could not introspect" in out

    def test_help_with_config_equals_form(self, tmp_path, capsys):
        from dmme_tpu.trainer import main

        cfg = self._cfg(tmp_path)
        main(["fit", f"--config={cfg}", "--help"])
        out = capsys.readouterr().out
        assert "dmme_tpu.training.LitDDPM" in out
