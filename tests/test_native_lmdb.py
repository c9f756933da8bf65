"""Native (C++) LMDB reader tests — must agree byte-for-byte with the pure-
Python reader on the same fixtures, plus a small scan-throughput check."""

import os
import time

import numpy as np
import pytest

from dmme_tpu.data.lmdb_reader import LMDBReader, NativeLMDBReader, open_lmdb
from dmme_tpu.native import load_lmdb_native
from tests.lmdb_fixture import write_lmdb

needs_native = pytest.mark.skipif(
    load_lmdb_native() is None, reason="g++/native backend unavailable"
)


@needs_native
class TestNativeLMDB:
    def test_matches_python_reader(self, tmp_path):
        kv = {f"key{i:05d}".encode(): os.urandom(60 + i % 50) for i in range(200)}
        kv[b"huge"] = os.urandom(20_000)  # overflow pages
        path = str(tmp_path / "t.mdb")
        write_lmdb(path, kv, leaf_split=20)

        with LMDBReader(path) as py, NativeLMDBReader(path) as nat:
            assert len(py) == len(nat) == len(kv)
            py_items = [(k, bytes(v)) for k, v in py.items()]
            nat_items = [(k, bytes(v)) for k, v in nat.items()]
            assert py_items == nat_items
            for k in (b"key00000", b"key00199", b"huge"):
                assert bytes(nat.get(k)) == bytes(py.get(k))
            assert nat.get(b"nope") is None

    def test_open_lmdb_prefers_native(self, tmp_path):
        path = str(tmp_path / "t2.mdb")
        write_lmdb(path, {b"a": b"1"})
        r = open_lmdb(path)
        assert isinstance(r, NativeLMDBReader)
        r.close()

    def test_scan_full_agreement_on_large_db(self, tmp_path):
        kv = {f"k{i:06d}".encode(): bytes(50) for i in range(5000)}
        path = str(tmp_path / "big.mdb")
        write_lmdb(path, kv, leaf_split=40)

        with LMDBReader(path) as py:
            t0 = time.perf_counter()
            n_py = sum(1 for _ in py.items())
            t_py = time.perf_counter() - t0
        with NativeLMDBReader(path) as nat:
            t0 = time.perf_counter()
            n_nat = sum(1 for _ in nat.items())
            t_nat = time.perf_counter() - t0
        assert n_py == n_nat == 5000
        # timing is informational only: with tiny values the per-item ctypes
        # marshalling dominates and wall times are noisy on a shared 1-core
        # host. The native win shows on real (KB..MB JPEG) values.
        print(f"scan: python {t_py*1e3:.1f}ms native {t_nat*1e3:.1f}ms")
