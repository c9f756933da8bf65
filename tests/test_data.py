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
