"""ctypes binding for the native paged vector store (native/vector_store.cpp).

The host tier of larger-than-memory indexes: fp32 rows on disk / host DRAM,
gathered by id with parallel memcpy and madvise prefetch; only gathered
blocks are uploaded to the device. Falls back to a numpy memmap when the
shared library can't be built (e.g. no compiler at runtime).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "libvector_store.so"
_BUILD_LOCK = threading.Lock()
_LIB = None
_LIB_TRIED = False


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        _LIB_TRIED = True
        try:
            if not _LIB_PATH.exists() or (
                _LIB_PATH.stat().st_mtime
                < (_NATIVE_DIR / "vector_store.cpp").stat().st_mtime
            ):
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
        except Exception:
            return None
        lib.vs_open.restype = ctypes.c_void_p
        lib.vs_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int64]
        lib.vs_num_rows.restype = ctypes.c_int64
        lib.vs_num_rows.argtypes = [ctypes.c_void_p]
        lib.vs_gather.restype = ctypes.c_int
        lib.vs_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.vs_prefetch.restype = ctypes.c_int
        lib.vs_prefetch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.vs_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load_lib() is not None


class PagedVectorStore:
    """Row store over a raw binary file: rows of `dim` float32 values."""

    def __init__(self, path: str | Path, dim: int, header_bytes: int = 0,
                 threads: int | None = None):
        self.path = str(path)
        self.dim = int(dim)
        self.row_bytes = self.dim * 4
        self.threads = threads or min(os.cpu_count() or 1, 16)
        self._lib = _load_lib()
        self._handle = None
        self._mm = None
        if self._lib is not None:
            h = self._lib.vs_open(
                self.path.encode(), self.row_bytes, header_bytes
            )
            if h:
                self._handle = ctypes.c_void_p(h)
        if self._handle is None:  # fallback: numpy memmap
            self._mm = np.memmap(self.path, dtype=np.float32, mode="r",
                                 offset=header_bytes)
            self._mm = self._mm.reshape(-1, self.dim)

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    @property
    def num_rows(self) -> int:
        if self._handle is not None:
            return int(self._lib.vs_num_rows(self._handle))
        return int(self._mm.shape[0])

    def gather(self, ids) -> np.ndarray:
        """Fetch rows by id -> [n, dim] f32 (out-of-range ids zero-filled)."""
        ids = np.ascontiguousarray(np.asarray(ids, np.int64).reshape(-1))
        n = ids.shape[0]
        out = np.empty((n, self.dim), np.float32)
        if self._handle is not None:
            rc = self._lib.vs_gather(
                self._handle,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n,
                out.ctypes.data_as(ctypes.c_char_p),
                self.threads,
            )
            if rc != 0:
                raise RuntimeError("vs_gather failed")
            return out
        valid = (ids >= 0) & (ids < self._mm.shape[0])
        out[:] = 0.0
        out[valid] = self._mm[ids[valid]]
        return out

    def prefetch(self, ids) -> None:
        if self._handle is None:
            return
        ids = np.ascontiguousarray(np.asarray(ids, np.int64).reshape(-1))
        self._lib.vs_prefetch(
            self._handle,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ids.shape[0],
        )

    def close(self) -> None:
        if self._handle is not None:
            self._lib.vs_close(self._handle)
            self._handle = None
        self._mm = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_row_file(path: str | Path, vectors: np.ndarray) -> None:
    """Write vectors [n, d] to the raw row format this store reads, plus a
    CRC sidecar ({path}.crc) so check_integrity can verify the row file —
    the reference puts a CodecUtil footer on EVERY segment file and
    checkIntegrity re-reads them all (JVectorReader.java:84-96). A footer
    inside the row file would break the store's size/row_bytes arithmetic
    (and the mmap offsets the C++ gather uses), so the checksum rides
    beside it."""
    import struct
    import zlib

    arr = np.ascontiguousarray(vectors, dtype=np.float32)
    arr.tofile(str(path))
    # stream the CRC over a flat view (no full-array copy — the 10M tier
    # writes multi-GB row files)
    flat = memoryview(arr).cast("B")
    crc, step = 0, 1 << 24
    for s in range(0, len(flat), step):
        crc = zlib.crc32(flat[s:s + step], crc)
    Path(str(path) + ".crc").write_bytes(
        struct.pack("<QQ", crc & 0xFFFFFFFF, arr.nbytes))


def verify_row_file(path: str | Path, chunk_bytes: int = 1 << 24) -> bool:
    """Stream-verify a row file against its CRC sidecar (checkIntegrity
    leg for the raw row tier). Missing sidecar -> True (pre-sidecar
    segments stay readable, BWC); mismatch or truncation -> raises."""
    import struct
    import zlib

    from opensearch_jvector_tpu.index.store import CorruptSegmentError

    sidecar = Path(str(path) + ".crc")
    if not sidecar.exists():
        return True
    blob = sidecar.read_bytes()
    if len(blob) != 16:
        raise CorruptSegmentError(
            f"{sidecar}: malformed CRC sidecar ({len(blob)} bytes, want 16)"
        )
    want_crc, want_bytes = struct.unpack("<QQ", blob)
    p = Path(path)
    if p.stat().st_size != want_bytes:
        raise CorruptSegmentError(
            f"{p}: row file is {p.stat().st_size} bytes, sidecar says "
            f"{want_bytes}"
        )
    crc = 0
    with open(p, "rb") as f:
        while True:
            chunk = f.read(chunk_bytes)
            if not chunk:
                break
            crc = zlib.crc32(chunk, crc)
    if (crc & 0xFFFFFFFF) != want_crc:
        raise CorruptSegmentError(
            f"{p}: row checksum mismatch ({crc & 0xFFFFFFFF:#x} != "
            f"{want_crc:#x})"
        )
    return True
