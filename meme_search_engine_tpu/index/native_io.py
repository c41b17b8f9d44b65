"""Record IO backends: C++ thread-pool reader with a pure-python fallback.

``open_reader(path, record_size)`` returns an object with
``read_batch(ids) -> list[bytes]``. The native backend (native/diskio.cpp)
fans pread(2) calls across a worker pool — the portable equivalent of
the reference's io_uring beam reads (query_disk_index.rs:73-81,159-167).
It is compiled on first use via ``make -C native`` and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdiskio.so")
_lib = None
_lib_failed = False


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.diskio_open.restype = ctypes.c_void_p
        lib.diskio_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.diskio_read_batch.restype = ctypes.c_int64
        lib.diskio_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_char_p,
        ]
        lib.diskio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:  # noqa: BLE001 — fall back to python IO
        _lib_failed = True
    return _lib


class NativeReader:
    def __init__(self, path: str, record_size: int, n_threads: int = 0):
        lib = _load_native()
        assert lib is not None
        self._lib = lib
        self.record_size = record_size
        self._handle = lib.diskio_open(
            path.encode(), record_size, n_threads
        )
        if not self._handle:
            raise OSError(f"diskio_open failed for {path}")

    def read_batch(self, ids: Sequence[int]) -> List[bytes]:
        n = len(ids)
        ids_arr = (ctypes.c_int64 * n)(*ids)
        buf = ctypes.create_string_buffer(n * self.record_size)
        ok = self._lib.diskio_read_batch(self._handle, ids_arr, n, buf)
        if ok != n:
            raise OSError(f"short batch read: {ok}/{n}")
        raw = buf.raw
        return [
            raw[i * self.record_size : (i + 1) * self.record_size]
            for i in range(n)
        ]

    def close(self):
        if self._handle:
            self._lib.diskio_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


class PythonReader:
    """os.pread fallback (functionally identical, serial)."""

    def __init__(self, path: str, record_size: int):
        self._fd = os.open(path, os.O_RDONLY)
        self.record_size = record_size

    def read_batch(self, ids: Sequence[int]) -> List[bytes]:
        return [
            os.pread(self._fd, self.record_size, i * self.record_size)
            for i in ids
        ]

    def close(self):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None


def open_reader(path: str, record_size: int, prefer_native: bool = True):
    if prefer_native and _load_native() is not None:
        try:
            return NativeReader(path, record_size)
        except OSError:
            pass
    return PythonReader(path, record_size)
