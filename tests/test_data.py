"""Data-module tests: CIFAR-10 on-disk formats + download automation.

The reference downloads CIFAR-10 via torchvision in ``prepare_data``
(src/dmme/data_modules/cifar10.py:36-37); here the download path is
exercised with a mocked ``urlretrieve`` serving a real (tiny) tar.gz.
"""

import hashlib
import io
import os
import pickle
import tarfile

import numpy as np
import pytest

from dmme_tpu.data import CIFAR10


def _make_archive(path: str, n_per_batch: int = 4) -> str:
    """Real cifar-10-python.tar.gz layout with tiny random batches."""
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for i in range(1, 6):
            d = {
                b"data": rng.integers(
                    0, 256, (n_per_batch, 3072), dtype=np.uint8
                ),
                b"labels": list(rng.integers(0, 10, n_per_batch)),
            }
            blob = pickle.dumps(d)
            info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{i}")
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))
    data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
    return hashlib.md5(data).hexdigest()


class TestCifarDownload:
    def test_download_extract_load(self, tmp_path, monkeypatch):
        src = str(tmp_path / "src.tar.gz")
        md5 = _make_archive(src)
        calls = []

        def fake_urlretrieve(url, out):
            calls.append(url)
            with open(src, "rb") as f, open(out, "wb") as g:
                g.write(f.read())

        import urllib.request

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)
        monkeypatch.setattr(CIFAR10, "MD5", md5)

        dm = CIFAR10(data_dir=str(tmp_path / "data"), batch_size=4, download=True)
        dm.prepare_data()
        assert calls == [CIFAR10.URL]
        assert os.path.isdir(tmp_path / "data" / "cifar-10-batches-py")

        dm.setup("fit")
        assert dm.train_data.shape == (20, 32, 32, 3)

        # skip-if-exists: second prepare_data downloads nothing
        dm.prepare_data()
        assert len(calls) == 1

    def test_md5_mismatch_raises(self, tmp_path, monkeypatch):
        src = str(tmp_path / "src.tar.gz")
        _make_archive(src)

        def fake_urlretrieve(url, out):
            with open(src, "rb") as f, open(out, "wb") as g:
                g.write(f.read())

        import urllib.request

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)
        dm = CIFAR10(data_dir=str(tmp_path / "data"), download=True)
        with pytest.raises(RuntimeError, match="md5 mismatch"):
            dm.prepare_data()

    def test_no_download_by_default(self, tmp_path):
        dm = CIFAR10(data_dir=str(tmp_path))
        dm.prepare_data()  # no-op, no network touched
        with pytest.raises(FileNotFoundError):
            dm.setup("fit")


class TestShapes:
    """Procedural structured dataset (proof-of-learning runs)."""

    def test_deterministic_and_structured(self):
        from dmme_tpu.data.shapes import Shapes, render_shapes

        a, la = render_shapes(64, 32, seed=3)
        b, lb = render_shapes(64, 32, seed=3)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)
        assert a.shape == (64, 32, 32, 3) and a.dtype == np.uint8
        assert set(np.unique(la)) <= {0, 1}
        # structured, not noise: per-image pixel correlation is high — a
        # flat background + one shape means most neighboring pixels match
        x = a.astype(np.float32)
        horiz_diff = np.abs(x[:, :, 1:] - x[:, :, :-1]).mean()
        rng = np.random.default_rng(0)
        noise = rng.integers(0, 256, a.shape).astype(np.float32)
        noise_diff = np.abs(noise[:, :, 1:] - noise[:, :, :-1]).mean()
        assert horiz_diff < noise_diff / 4

    def test_datamodule_contract(self):
        from dmme_tpu.data import Shapes

        dm = Shapes(size=32, batch_size=8, with_labels=True)
        dm.setup("fit")
        it = dm.train_iter(0)
        batch, labels = next(it)
        assert batch.shape == (8, 32, 32, 3) and batch.dtype == np.uint8
        assert labels.shape == (8,)
        dm.setup("test")
        assert dm.test_data is dm.train_data
