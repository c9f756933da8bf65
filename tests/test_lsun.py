"""LMDB reader + LSUN dataset tests over hand-written LMDB fixtures."""

import io
import os
import pickle

import numpy as np
import pytest

from dmme_tpu.data.lmdb_reader import LMDBReader
from dmme_tpu.datasets.lsun import LSUN, LSUNClass
from tests.lmdb_fixture import write_lmdb


def _jpeg(color, size=(40, 30)) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="JPEG")
    return buf.getvalue()


class TestLMDBReader:
    def test_small_kv_single_leaf(self, tmp_path):
        kv = {f"k{i:03d}".encode(): f"value-{i}".encode() for i in range(10)}
        path = tmp_path / "small.mdb"
        write_lmdb(str(path), kv)
        with LMDBReader(str(path)) as r:
            assert len(r) == 10
            got = {k: bytes(v) for k, v in r.items()}
            assert got == kv
            assert bytes(r.get(b"k003")) == b"value-3"
            assert r.get(b"missing") is None

    def test_overflow_values(self, tmp_path):
        big = os.urandom(10_000)
        kv = {b"big": big, b"small": b"x"}
        path = tmp_path / "ov.mdb"
        write_lmdb(str(path), kv)
        with LMDBReader(str(path)) as r:
            assert bytes(r.get(b"big")) == big
            assert bytes(r.get(b"small")) == b"x"

    def test_branch_tree(self, tmp_path):
        kv = {f"key{i:04d}".encode(): f"v{i}".encode() for i in range(50)}
        path = tmp_path / "tree.mdb"
        write_lmdb(str(path), kv, leaf_split=10)
        with LMDBReader(str(path)) as r:
            got = {k: bytes(v) for k, v in r.items()}
            assert got == kv
            # keys come back sorted
            assert list(got.keys()) == sorted(kv.keys())
            for k in (b"key0000", b"key0009", b"key0010", b"key0049"):
                assert bytes(r.get(k)) == kv[k]
            assert r.get(b"key9999") is None

    def test_meta_selection_uses_latest_txn(self, tmp_path):
        kv = {b"a": b"1"}
        path = tmp_path / "meta.mdb"
        write_lmdb(str(path), kv)  # stale meta (page 0) has INVALID root
        with LMDBReader(str(path)) as r:
            assert len(r) == 1


class TestLSUNClass:
    def test_decode_and_cache(self, tmp_path):
        kv = {
            b"aaa": _jpeg((255, 0, 0)),
            b"bbb": _jpeg((0, 255, 0)),
            b"corrupt": b"not a jpeg",
        }
        root = tmp_path / "bedroom_train_lmdb"
        write_lmdb(str(root), kv)
        ds = LSUNClass(str(root))
        assert len(ds) == 2  # corrupt value skipped during validation
        img = ds[0]
        assert img.shape == (30, 40, 3) and img.dtype == np.uint8
        # cache file created and reused
        caches = [p for p in os.listdir(tmp_path) if p.startswith("_cache_")]
        assert len(caches) == 1
        ds2 = LSUNClass(str(root))
        assert ds2.keys == ds.keys

    def test_blacklist(self, tmp_path):
        kv = {b"good": _jpeg((1, 2, 3)), b"bad": _jpeg((9, 9, 9))}
        root = tmp_path / "cat_lmdb"
        write_lmdb(str(root), kv)
        ds = LSUNClass(str(root), blacklist=[b"bad"])
        assert len(ds) == 1 and ds.keys == [b"good"]


class TestLSUNConcat:
    def test_multi_class_routing(self, tmp_path):
        for name, color in [("bedroom_train", (255, 0, 0)), ("tower_train", (0, 0, 255))]:
            write_lmdb(
                str(tmp_path / f"{name}_lmdb"),
                {f"{name}{i}".encode(): _jpeg(color) for i in range(3)},
            )
        ds = LSUN(str(tmp_path), classes=["bedroom_train", "tower_train"])
        assert len(ds) == 6
        # index 4 routes to the second db
        img = ds[4]
        assert img[0, 0, 2] > 200  # blue-ish


class TestLSUNDataModule:
    def test_end_to_end(self, tmp_path):
        from dmme_tpu.data import LSUN as LSUNModule

        write_lmdb(
            str(tmp_path / "bedroom_train_lmdb"),
            {f"k{i}".encode(): _jpeg((i * 30 % 255, 0, 0), size=(300, 280))
             for i in range(4)},
        )
        dm = LSUNModule(
            data_dir=str(tmp_path), category="bedroom", batch_size=2, imgsize=64,
        )
        dm.prepare_data()
        dm.setup("fit")
        assert dm.train_data.shape == (4, 64, 64, 3)
        batch = next(dm.train_iter(0))
        assert batch.shape == (2, 64, 64, 3)
        # decoded cache written
        assert os.path.exists(tmp_path / "bedroom_train_decoded_64.npy")

    def test_missing_raises(self, tmp_path):
        from dmme_tpu.data import LSUN as LSUNModule

        dm = LSUNModule(data_dir=str(tmp_path), category="bedroom")
        with pytest.raises(FileNotFoundError):
            dm.prepare_data()

    def test_unknown_category(self):
        from dmme_tpu.data import LSUN as LSUNModule

        with pytest.raises(ValueError):
            LSUNModule(category="not_a_category")
