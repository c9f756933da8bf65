"""Native (C++) runtime components, bound via ctypes.

Currently: the LMDB data-file walker (``lmdb_scan.cc``) used by
``dmme_tpu.data.lmdb_reader`` when available. The shared library is built on
first use with the system ``g++`` and cached next to the source; everything
degrades gracefully to the pure-Python implementations when no compiler is
present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lmdb_scan.cc")
_LIB = os.path.join(_DIR, "liblmdb_scan.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_lmdb_native() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first call; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.lmdb_open.restype = ctypes.c_void_p
        lib.lmdb_open.argtypes = [ctypes.c_char_p]
        lib.lmdb_close.argtypes = [ctypes.c_void_p]
        lib.lmdb_entries.restype = ctypes.c_uint64
        lib.lmdb_entries.argtypes = [ctypes.c_void_p]
        lib.lmdb_iter_new.restype = ctypes.c_void_p
        lib.lmdb_iter_new.argtypes = [ctypes.c_void_p]
        lib.lmdb_iter_next.restype = ctypes.c_int
        lib.lmdb_iter_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.lmdb_iter_free.argtypes = [ctypes.c_void_p]
        lib.lmdb_get.restype = ctypes.c_int
        lib.lmdb_get.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
        return _lib
