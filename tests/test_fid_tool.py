"""scripts/fid.py — the standalone FID tool over directories/npy/stats files.

Uses the randomly-initialized Inception (no weights in env): values are
self-consistent, which is exactly what the invariants here need —
FID(X, X) == 0, FID(X, Y) > 0, directory and npy inputs of the same
pixels agree, and --save-stats round-trips through the npz path.
"""

import numpy as np
import pytest

from scripts.fid import main as fid_main


@pytest.fixture(scope="module")
def image_sets(tmp_path_factory):
    root = tmp_path_factory.mktemp("fid")
    rng = np.random.RandomState(0)
    a = rng.rand(24, 16, 16, 3).astype(np.float32)
    b = np.clip(a + 0.35 * rng.rand(24, 16, 16, 3).astype(np.float32), 0, 1)
    np.save(root / "a.npy", a)
    np.save(root / "b.npy", b)

    from PIL import Image

    adir = root / "a_png"
    adir.mkdir()
    quant = (a * 255).round().astype(np.uint8)
    for i, img in enumerate(quant):
        Image.fromarray(img).save(adir / f"{i:03d}.png")
    np.save(root / "a_q.npy", quant)  # same 8-bit pixels as the PNGs
    return root


def _fid_of(capsys, argv):
    fid_main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert out.startswith("FID: ")
    return float(out.split()[-1])


@pytest.mark.slow
def test_self_fid_is_zero(image_sets, capsys):
    root = str(image_sets)
    v = _fid_of(capsys, [f"{root}/a.npy", f"{root}/a.npy", "--batch-size", "8"])
    assert v == pytest.approx(0.0, abs=1e-3)


@pytest.mark.slow
def test_png_dir_equals_same_npy_pixels(image_sets, capsys):
    """Directory loader == npy loader on the same pixels: FID ≈ 0.

    (With the randomly-initialized Inception in this env the features are
    nearly input-insensitive, so set-SEPARATION can't be asserted here —
    that's covered analytically via stats files below.)"""
    root = str(image_sets)
    v = _fid_of(capsys, [f"{root}/a_png", f"{root}/a_q.npy", "--batch-size", "8"])
    assert v == pytest.approx(0.0, abs=1e-3)


def test_stats_files_analytic_fid(capsys, tmp_path):
    """All-npz path needs no network; diagonal-covariance FID has a closed
    form FID = |Δμ|² + Σᵢ(s1ᵢ + s2ᵢ − 2√(s1ᵢ s2ᵢ))."""
    d = 8
    rng = np.random.RandomState(3)
    mu1, mu2 = rng.rand(d), rng.rand(d)
    s1, s2 = rng.rand(d) + 0.5, rng.rand(d) + 0.5
    p1, p2 = str(tmp_path / "s1.npz"), str(tmp_path / "s2.npz")
    np.savez(p1, mu=mu1, sigma=np.diag(s1))
    np.savez(p2, mu=mu2, sigma=np.diag(s2))
    want = float(
        np.sum((mu1 - mu2) ** 2) + np.sum(s1 + s2 - 2 * np.sqrt(s1 * s2))
    )
    v = _fid_of(capsys, [p1, p2])
    assert v == pytest.approx(want, rel=1e-5)


@pytest.mark.slow
def test_save_stats_roundtrip(image_sets, capsys, tmp_path):
    root = str(image_sets)
    stats = str(tmp_path / "a_stats.npz")
    fid_main([f"{root}/a.npy", "--save-stats", stats, "--batch-size", "8"])
    capsys.readouterr()
    v = _fid_of(capsys, [stats, f"{root}/b.npy", "--batch-size", "8"])
    v_direct = _fid_of(
        capsys, [f"{root}/a.npy", f"{root}/b.npy", "--batch-size", "8"]
    )
    assert v == pytest.approx(v_direct, rel=1e-4)
    d = np.load(stats)
    assert d["mu"].shape == (2048,) and d["sigma"].shape == (2048, 2048)
