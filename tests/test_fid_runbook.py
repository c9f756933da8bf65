"""FID calibration runbook — the OPERATOR path, end-to-end through the CLI.

docs/evaluation.md tells an operator with the real weights file to run:

    python scripts/convert_inception.py pt_inception-*.pth --out fid.npz
    dmme_tpu.trainer test --config cfg.yaml \
        --trainer.inception_weights fid.npz --trainer.save_fid_stats real.npz
    dmme_tpu.trainer test ... --trainer.fid_stats real.npz   # later runs

This test executes that EXACT command chain (the CLI entry points, not the
library calls) against the torch-twin state_dict as a stand-in for the
download (tests/torch_inception.py — the only link this box cannot
exercise is the download itself; docs/evaluation.md pins the sha256 of the
two real files). Verified: the chain runs, the results carry no
random-weights warning, and the precomputed-stats path reproduces the
direct path's FID exactly.
"""

import json
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

from tests.torch_inception import TorchInceptionV3, randomize  # noqa: E402


def test_filename_hash_verification(tmp_path):
    """torch.hub's -<8hex> filename convention is enforced: a wrong embedded
    hash (corrupt/wrong download) fails loudly; the full sha256 is computed
    either way."""
    import hashlib

    from scripts.convert_inception import verify_filename_hash

    good = tmp_path / "plain.pth"
    good.write_bytes(b"payload")
    digest = verify_filename_hash(str(good))
    assert digest == hashlib.sha256(b"payload").hexdigest()

    named = tmp_path / f"weights-{digest[:8]}.pth"
    named.write_bytes(b"payload")
    assert verify_filename_hash(str(named)) == digest

    bad = tmp_path / "weights-00000000.pth"
    bad.write_bytes(b"payload")
    with pytest.raises(SystemExit, match="sha256 mismatch"):
        verify_filename_hash(str(bad))


def test_operator_chain_through_cli(tmp_path, capsys):
    # step 0 (the only un-executable link): the operator downloads
    # pt_inception-2015-12-05-6726825d.pth; stand-in = randomized twin.
    # (No torch.hub hash suffix in the stand-in's name — the converter
    # verifies an embedded -<8hex> against the file's sha256.)
    pth = tmp_path / "pt_inception_standin.pth"
    torch.save(randomize(TorchInceptionV3(variant="fid"), seed=11).state_dict(),
               str(pth))

    # step 1: convert to the inference-ready npz
    from scripts.convert_inception import main as convert_main

    npz = tmp_path / "inception_fid.npz"
    convert_main([str(pth), "--out", str(npz)])
    assert npz.exists()

    # step 2: trainer test with the converted weights, persisting real stats
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(textwrap.dedent(f"""
        seed_everything: 7
        trainer:
          default_root_dir: {tmp_path}/run
        model:
          class_path: dmme_tpu.training.LitDDPM
          init_args:
            timesteps: 5
            warmup: 10
            model:
              class_path: dmme_tpu.models.ddpm.UNet
              init_args: {{pos_dim: 4, emb_dim: 8, num_groups: 2,
                           channels_per_depth: [4, 8, 8, 8], num_blocks: 1,
                           dropout: 0.0, attention_depths: [2]}}
        data:
          class_path: dmme_tpu.data.CIFAR10
          init_args: {{synthetic: true, synthetic_size: 8, batch_size: 4}}
        """))

    from dmme_tpu.trainer import main as cli

    stats = tmp_path / "real_stats.npz"
    cli(["test", "--config", str(cfg),
         "--trainer.inception_weights", str(npz),
         "--trainer.limit_test_batches", "1",
         "--trainer.save_fid_stats", str(stats)])
    out1 = eval(capsys.readouterr().out.strip().splitlines()[-1])
    assert "warning" not in out1, "real-weights path must not warn"
    # 4-sample covariances make the trace formula numerically ~0; a tiny
    # negative epsilon is expected noise, a large value would be a bug
    assert np.isfinite(out1["fid"]) and out1["fid"] > -1e-3
    assert stats.exists()

    # step 3: later runs reuse the precomputed real stats — same FID
    cli(["test", "--config", str(cfg),
         "--trainer.inception_weights", str(npz),
         "--trainer.limit_test_batches", "1",
         "--trainer.fid_stats", str(stats)])
    out2 = eval(capsys.readouterr().out.strip().splitlines()[-1])
    assert "warning" not in out2
    np.testing.assert_allclose(out2["fid"], out1["fid"], rtol=1e-6)
