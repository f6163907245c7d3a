"""Dict-like persistent shard stores.

Reference parity: syconn/backend/base.py:32-280 (``StorageBase``/``FSBase``):
a shard file maps object IDs to values; values are held compressed in memory
and decompressed on first access. Differences by design:

* codec is zstd (not lz4),
* writes are atomic (tmp file + rename),
* locking is an optional fcntl flock (the pipeline itself is single-writer).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Iterator, Optional

import threading

import numpy as np
import zstandard as zstd

from ..utils.locking import InterProcessLock, LockTimeout

# zstd (de)compressor objects are not thread-safe -> thread-local instances
_tls = threading.local()


def _cctx() -> zstd.ZstdCompressor:
    c = getattr(_tls, "cctx", None)
    if c is None:
        c = _tls.cctx = zstd.ZstdCompressor(level=3)
    return c


def _dctx() -> zstd.ZstdDecompressor:
    d = getattr(_tls, "dctx", None)
    if d is None:
        d = _tls.dctx = zstd.ZstdDecompressor()
    return d


class StorageBase:
    """Base class: pickled dict of ``id -> compressed payload`` on disk."""

    # subclasses set this to encode/decode values
    def _encode(self, value: Any) -> Any:
        return value

    def _decode(self, payload: Any) -> Any:
        return payload

    def __init__(
        self,
        inp_p: str,
        read_only: bool = True,
        disable_locking: bool = False,
        timeout: float = 30.0,
        cache_decomp: bool = True,
    ):
        self._path = inp_p
        self.read_only = read_only
        self._disable_locking = disable_locking
        self._timeout = timeout
        self._cache_decomp = cache_decomp
        self._dc_intern: dict = {}
        self._cache_dc: dict = {}
        self._lock: Optional[InterProcessLock] = None
        if inp_p is not None:
            self.pull()

    # ------------------------------------------------------------------ util
    @property
    def path(self) -> str:
        return self._path

    def _lock_path(self) -> str:
        d, b = os.path.split(self._path)
        return os.path.join(d, f".{b}.lk")

    def _acquire_lock(self):
        if self._disable_locking or self.read_only or self._lock is not None:
            return
        self._lock = InterProcessLock(self._lock_path())
        if not self._lock.acquire(timeout=self._timeout):
            self._lock = None
            raise LockTimeout(
                f"Could not acquire write lock for {self._path} within {self._timeout}s."
            )

    def _release_lock(self):
        if self._lock is not None:
            self._lock.release()
            self._lock = None

    # ------------------------------------------------------------------- IO
    def pull(self):
        """(Re-)read the shard file."""
        self._acquire_lock()
        if os.path.isfile(self._path):
            with open(self._path, "rb") as f:
                self._dc_intern = pickle.load(f)
        else:
            self._dc_intern = {}

    def push(self):
        """Write the shard file atomically and release the write lock."""
        if self.read_only:
            self._release_lock()
            return
        d = os.path.dirname(self._path)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = self._path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(self._dc_intern, f, protocol=4)
        os.replace(tmp, self._path)
        self._release_lock()

    def save2pkl(self, path: Optional[str] = None):
        if path is not None:
            self._path = path
            self.read_only = False
        self.push()

    # ------------------------------------------------------------- dict API
    def __getitem__(self, key):
        if key in self._cache_dc:
            return self._cache_dc[key]
        value = self._decode(self._dc_intern[key])
        if self._cache_decomp:
            self._cache_dc[key] = value
        return value

    def __setitem__(self, key, value):
        if self.read_only:
            raise RuntimeError(f"Store {self._path} is read-only.")
        self._cache_dc[key] = value
        self._dc_intern[key] = self._encode(value)

    def __delitem__(self, key):
        self._dc_intern.pop(key, None)
        self._cache_dc.pop(key, None)

    def __contains__(self, key) -> bool:
        return key in self._dc_intern

    def __len__(self) -> int:
        return len(self._dc_intern)

    def __iter__(self) -> Iterator:
        return iter(self._dc_intern)

    def keys(self):
        return self._dc_intern.keys()

    def items(self):
        for k in self._dc_intern:
            yield k, self[k]

    def values(self):
        for k in self._dc_intern:
            yield self[k]

    def get(self, key, default=None):
        return self[key] if key in self else default

    def update(self, other: dict):
        for k, v in other.items():
            self[k] = v

    def clear_cache(self):
        self._cache_dc.clear()

    def __del__(self):
        try:
            self._release_lock()
        except Exception:
            pass


class BTBase:
    """Stub for a future big-table backend (reference: syconn/backend/base.py
    keeps the same placeholder for non-filesystem stores)."""

    def __init__(self, *a, **kw):
        raise NotImplementedError("Big-table backend not implemented; use FS stores.")


FSBase = StorageBase  # reference alias


def compress_payload(arr: np.ndarray) -> tuple:
    """zstd-compress an ndarray, keeping dtype/shape for exact round-trip."""
    arr = np.ascontiguousarray(arr)
    return (_cctx().compress(arr.tobytes()), str(arr.dtype), arr.shape)


def decompress_payload(payload: tuple) -> np.ndarray:
    buf, dtype, shape = payload
    return np.frombuffer(_dctx().decompress(buf), dtype=np.dtype(dtype)).reshape(shape).copy()
