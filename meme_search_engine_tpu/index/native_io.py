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
    _ABI_VERSION = 2
    try:
        # always invoke make: it is a cheap no-op when the .so is up to
        # date, and it rebuilds a stale prebuilt library whose ABI
        # predates the ctypes prototypes below (a silently ignored
        # trailing argument would no-op the feature it carries)
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s", "libdiskio.so"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            if not os.path.exists(_LIB_PATH):
                raise
        lib = ctypes.CDLL(_LIB_PATH)
        try:
            lib.diskio_abi_version.restype = ctypes.c_int64
            abi = int(lib.diskio_abi_version())
        except AttributeError:
            abi = 1
        if abi != _ABI_VERSION:
            raise RuntimeError(
                f"libdiskio.so ABI {abi} != expected {_ABI_VERSION}; "
                f"run `make -C {_NATIVE_DIR} clean all`"
            )
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
        lib.disknav_open.restype = ctypes.c_void_p
        lib.disknav_open.argtypes = [
            ctypes.c_void_p,  # reader handle
            ctypes.c_int64,   # count
            ctypes.c_int64,   # d
            ctypes.c_void_p,  # pq_codes
            ctypes.c_int64,   # n_chunks
            ctypes.c_int64,   # n_centroids
            ctypes.c_void_p,  # descriptors
            ctypes.c_int64,   # n_desc
        ]
        lib.disknav_search.restype = ctypes.c_int64
        lib.disknav_search.argtypes = [
            ctypes.c_void_p,                  # nav
            ctypes.POINTER(ctypes.c_float),   # lut
            ctypes.POINTER(ctypes.c_float),   # query
            ctypes.POINTER(ctypes.c_float),   # desc_scales
            ctypes.c_int,                     # use_desc
            ctypes.c_int64,                   # start_id
            ctypes.c_int64,                   # beamwidth
            ctypes.c_int64,                   # search_list
            ctypes.POINTER(ctypes.c_int64),   # out_ids
            ctypes.POINTER(ctypes.c_float),   # out_scores
            ctypes.c_int64,                   # max_out
            ctypes.POINTER(ctypes.c_int64),   # counters
            ctypes.c_int64,                   # spec (speculative reads/hop)
        ]
        lib.disknav_close.argtypes = [ctypes.c_void_p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.pack_records.restype = ctypes.c_int64
        lib.pack_records.argtypes = [
            ctypes.c_char_p,                  # vec_bytes
            ctypes.c_int64,                   # vec_nbytes per record
            i32p,                             # verts (nrec, vcap)
            i32p,                             # vcounts
            ctypes.c_int64,                   # vcap
            ctypes.c_int64,                   # id0
            ctypes.POINTER(ctypes.c_int64),   # timestamps
            ctypes.POINTER(ctypes.c_int64),   # dims (nrec, 2)
            ctypes.POINTER(ctypes.c_double),  # scores (nrec, nscores)
            ctypes.c_int64,                   # nscores
            ctypes.c_char_p,                  # urls (concatenated utf8)
            ctypes.POINTER(ctypes.c_int64),   # url_offs (nrec+1)
            i32p,                             # shards (nrec, scap)
            i32p,                             # shard_counts
            ctypes.c_int64,                   # scap
            ctypes.c_int64,                   # nrec
            ctypes.c_int64,                   # pad_size
            ctypes.c_char_p,                  # out (nrec * pad_size)
            ctypes.c_char_p,                  # dead (nrec)
        ]
        lib.stitch_refill.restype = None
        lib.stitch_refill.argtypes = [
            i32p,             # graph (n, r)
            i32p,             # degrees (n,)
            ctypes.c_int64,   # n
            i32p,             # in_ns (P,)
            ctypes.c_int64,   # n_pairs
            i32p,             # cands (P, r)
            ctypes.c_int64,   # bp
            ctypes.c_int64,   # max_add
            ctypes.c_int64,   # r
        ]
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


class NativeNav:
    """The beam-search hot loop, native (native/diskio.cpp disknav_*).

    The whole per-query loop — beam pop, pread fan-out, msgpack record
    parse, seen-bitmap admission, PQ LUT-sum, descriptor add, frontier
    truncation, final ranking — runs behind one GIL-releasing ctypes
    call, the portable equivalent of the reference's compiled
    thread-per-core search (query_disk_index.rs:144-212, 711-742).
    Round 2 measured the Python per-hop loop GIL-bound (2 threads slower
    than 1); this is the fix.

    ``pq_codes`` / ``descriptors`` are borrowed (the caller must keep
    the backing mmaps alive for the Nav's lifetime).
    """

    def __init__(
        self,
        reader: "NativeReader",
        count: int,
        d: int,
        pq_codes,
        n_centroids: int,
        descriptors,
    ):
        import numpy as np

        lib = _load_native()
        assert lib is not None and isinstance(reader, NativeReader)
        self._lib = lib
        self._reader = reader  # keep the reader (and its handle) alive
        self._pq = pq_codes
        self._desc = descriptors
        self.count = count
        self.n_desc = int(descriptors.shape[1])
        assert pq_codes.dtype == np.uint8 and pq_codes.flags.c_contiguous
        assert descriptors.dtype == np.uint8 and descriptors.flags.c_contiguous
        self._handle = lib.disknav_open(
            reader._handle,
            count,
            d,
            pq_codes.ctypes.data_as(ctypes.c_void_p),
            int(pq_codes.shape[1]),
            n_centroids,
            descriptors.ctypes.data_as(ctypes.c_void_p),
            self.n_desc,
        )
        if not self._handle:
            raise OSError("disknav_open failed")

    def search(
        self,
        lut,
        query,
        desc_scales,
        use_desc: bool,
        start_id: int,
        beamwidth: int,
        search_list: int,
        spec: int = 0,
    ):
        """Returns (ids int64[n], scores f32[n], node_reads, pq_cmps) —
        visited nodes ranked by exact score desc. spec > 0 additionally
        fetches the next-best `spec` frontier candidates per hop in the
        same IO fan-out (results identical; IO schedule deeper)."""
        import numpy as np

        lut = np.ascontiguousarray(lut, np.float32)
        query = np.ascontiguousarray(query, np.float32)
        desc_scales = np.ascontiguousarray(desc_scales, np.float32)
        max_out = search_list + beamwidth + 1
        out_ids = np.empty(max_out, np.int64)
        out_scores = np.empty(max_out, np.float32)
        counters = np.zeros(2, np.int64)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int64)
        n = self._lib.disknav_search(
            self._handle,
            lut.ctypes.data_as(fp),
            query.ctypes.data_as(fp),
            desc_scales.ctypes.data_as(fp),
            1 if use_desc else 0,
            start_id,
            beamwidth,
            search_list,
            out_ids.ctypes.data_as(ip),
            out_scores.ctypes.data_as(fp),
            max_out,
            counters.ctypes.data_as(ip),
            int(spec),
        )
        if n < 0:
            raise OSError("disknav_search failed (corrupt record?)")
        return (
            out_ids[:n],
            out_scores[:n],
            int(counters[0]),
            int(counters[1]),
        )

    def close(self):
        if self._handle:
            self._lib.disknav_close(self._handle)
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


def native_stitch_refill(
    graph, degrees, in_ns, cands, bp: int, max_add: int, r: int
) -> bool:
    """Run the RobustStitch slot-refill loop natively (exact sequential
    semantics, native/diskio.cpp stitch_refill). Mutates ``graph`` in
    place. Returns False when the native library is unavailable or the
    arrays are not in the expected layout (caller falls back to the
    python loop)."""
    import numpy as np

    lib = _load_native()
    if lib is None:
        return False
    if not (
        graph.dtype == np.int32
        and graph.flags.c_contiguous
        and cands.dtype == np.int32
        and cands.flags.c_contiguous
        and graph.shape[1] == r
        and cands.shape[1] == r
    ):
        return False
    degrees32 = np.ascontiguousarray(degrees, np.int32)
    in_ns32 = np.ascontiguousarray(in_ns, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.stitch_refill(
        graph.ctypes.data_as(i32p),
        degrees32.ctypes.data_as(i32p),
        graph.shape[0],
        in_ns32.ctypes.data_as(i32p),
        len(in_ns32),
        cands.ctypes.data_as(i32p),
        bp,
        max_add,
        r,
    )
    return True


def native_pack_records(
    vec_bytes,        # (nrec, d) fp16 C-contiguous — raw record payload
    verts_rows,       # (nrec, vcap) int32 padded
    vert_counts,      # (nrec,) int32
    id0: int,
    timestamps,       # (nrec,) int64
    dims,             # (nrec, 2) int64
    scores,           # (nrec, nscores) float64 or None
    urls,             # sequence of str
    shard_rows,       # (nrec, scap) int32 padded
    shard_counts,     # (nrec,) int32
    pad_size: int,
):
    """Pack a batch of index records natively (native/pack.cpp).

    Returns ``(records_bytes, dead_bool_array)`` — byte-identical to a
    loop of ``PackedIndexEntry.pack_ex`` (parity-tested) — or ``None``
    when the native library is unavailable (caller falls back).
    Raises ValueError when a record exceeds the pad even with its URL
    dropped, mirroring the python packer.
    """
    import numpy as np

    lib = _load_native()
    if lib is None:
        return None
    nrec = len(vert_counts)
    vec_bytes = np.ascontiguousarray(vec_bytes)
    assert vec_bytes.ndim == 2 and len(vec_bytes) == nrec
    verts_rows = np.ascontiguousarray(verts_rows, np.int32)
    vert_counts = np.ascontiguousarray(vert_counts, np.int32)
    shard_rows = np.ascontiguousarray(shard_rows, np.int32)
    shard_counts = np.ascontiguousarray(shard_counts, np.int32)
    timestamps = np.ascontiguousarray(timestamps, np.int64)
    dims = np.ascontiguousarray(dims, np.int64)
    if dims.shape != (nrec, 2):
        # native pack hard-codes a 2-element dimensions array; the
        # Python packer encodes whatever length the manifest holds, so
        # anything else must take the fallback loop to keep byte parity
        return None
    if scores is None:
        nscores = 0
        scores_arr = np.zeros((nrec, 0), np.float64)
    else:
        scores_arr = np.ascontiguousarray(scores, np.float64)
        nscores = scores_arr.shape[1]
    encoded = [u.encode("utf-8") for u in urls]
    url_blob = b"".join(encoded)
    url_offs = np.zeros(nrec + 1, np.int64)
    np.cumsum([len(e) for e in encoded], out=url_offs[1:])
    out = ctypes.create_string_buffer(nrec * pad_size)
    dead = np.zeros(nrec, np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    ndead = lib.pack_records(
        vec_bytes.ctypes.data_as(ctypes.c_char_p),
        vec_bytes.strides[0],
        verts_rows.ctypes.data_as(i32p),
        vert_counts.ctypes.data_as(i32p),
        verts_rows.shape[1],
        id0,
        timestamps.ctypes.data_as(i64p),
        dims.ctypes.data_as(i64p),
        scores_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nscores,
        url_blob,
        url_offs.ctypes.data_as(i64p),
        shard_rows.ctypes.data_as(i32p),
        shard_counts.ctypes.data_as(i32p),
        shard_rows.shape[1],
        nrec,
        pad_size,
        out,
        dead.ctypes.data_as(ctypes.c_char_p),
    )
    if ndead < 0:
        raise ValueError(
            f"record {id0 + (-1 - ndead)} exceeds pad size even without URL"
        )
    return out.raw, dead.astype(bool)


def open_reader(path: str, record_size: int, prefer_native: bool = True):
    if prefer_native and _load_native() is not None:
        try:
            return NativeReader(path, record_size)
        except OSError:
            pass
    return PythonReader(path, record_size)
