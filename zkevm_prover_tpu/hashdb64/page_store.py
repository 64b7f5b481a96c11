"""ctypes binding for the native page store (native/pagestore.cpp).

The shared library is compiled on first use (g++ -O2 -shared); the image has
no pybind11, so the C ABI + ctypes is the binding path (build note in the
top-level README).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "native", "pagestore.cpp")
_LIB = os.path.join(_DIR, "native", "libpagestore.so")
_lock = threading.Lock()
_lib = None

KEY_LEN = 32
MAX_VAL = 160


def build_library(force: bool = False) -> str:
    """Compile the native library if missing/stale; returns its path."""
    with _lock:
        if (not force and os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
        return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_library())
    lib.pagestore_open.restype = ctypes.c_void_p
    lib.pagestore_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.pagestore_close.argtypes = [ctypes.c_void_p]
    lib.pagestore_flush.argtypes = [ctypes.c_void_p]
    lib.pagestore_record_count.restype = ctypes.c_uint64
    lib.pagestore_record_count.argtypes = [ctypes.c_void_p]
    lib.pagestore_page_count.restype = ctypes.c_uint64
    lib.pagestore_page_count.argtypes = [ctypes.c_void_p]
    lib.pagestore_set.restype = ctypes.c_int
    lib.pagestore_set.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32,
    ]
    lib.pagestore_get.restype = ctypes.c_int
    lib.pagestore_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_char_p]
    _lib = lib
    return lib


class PageStore:
    """mmap'd 4 KB page KV store: 32-byte keys -> <=160-byte values."""

    def __init__(self, path: str, bucket_bits: int = 10):
        self._lib = _load()
        self._h = self._lib.pagestore_open(path.encode(), bucket_bits)
        if not self._h:
            raise OSError(f"cannot open page store {path}")
        self._local = threading.Lock()

    def set(self, key: bytes, value: bytes) -> None:
        assert len(key) == KEY_LEN and len(value) <= MAX_VAL
        with self._local:
            rc = self._lib.pagestore_set(self._h, key, value, len(value))
        if rc != 0:
            raise OSError("pagestore_set failed")

    def get(self, key: bytes) -> bytes | None:
        assert len(key) == KEY_LEN
        buf = ctypes.create_string_buffer(MAX_VAL)
        with self._local:
            n = self._lib.pagestore_get(self._h, key, buf)
        return None if n < 0 else buf.raw[:n]

    def flush(self) -> None:
        self._lib.pagestore_flush(self._h)

    def __len__(self) -> int:
        return self._lib.pagestore_record_count(self._h)

    @property
    def page_count(self) -> int:
        return self._lib.pagestore_page_count(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.pagestore_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
