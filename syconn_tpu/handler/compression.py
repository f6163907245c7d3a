"""Array (de)compression and HDF5 helpers.

The reference stores compressed arrays as lz4 strings
(reference: syconn/handler/compression.py). This rebuild uses zstandard —
faster decompression at comparable ratios on the EM payloads — while keeping
the same helper API shape (string lists <-> arrays, h5 read/write).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Union

import threading

import h5py
import numpy as np
import zstandard as zstd

__all__ = [
    "compress_arr",
    "decompress_arr",
    "arrtolz4string_list",
    "lz4string_listtoarr",
    "load_from_h5py",
    "save_to_h5py",
]

# zstd (de)compressor objects are not thread-safe -> thread-local instances
_tls = threading.local()


def _cctx(level: int = 3) -> zstd.ZstdCompressor:
    if level != 3:
        return zstd.ZstdCompressor(level=level)
    c = getattr(_tls, "cctx", None)
    if c is None:
        c = _tls.cctx = zstd.ZstdCompressor(level=3)
    return c


def _dctx() -> zstd.ZstdDecompressor:
    d = getattr(_tls, "dctx", None)
    if d is None:
        d = _tls.dctx = zstd.ZstdDecompressor()
    return d


def compress_arr(arr: np.ndarray, level: int = 3) -> bytes:
    """Compress an ndarray (C-contiguous bytes; dtype/shape kept by caller)."""
    arr = np.ascontiguousarray(arr)
    return _cctx(level).compress(arr.tobytes())


def decompress_arr(buf: bytes, dtype, shape) -> np.ndarray:
    raw = _dctx().decompress(buf)
    return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()


def arrtolz4string_list(arr: np.ndarray) -> List[bytes]:
    """Compress an array into a list of byte strings (API-parity helper).

    Name retained from the reference API; the codec is zstd.
    """
    if arr is None or arr.size == 0:
        return [b""]
    return [_cctx().compress(np.ascontiguousarray(arr).tobytes())]


def lz4string_listtoarr(
    str_lst: Union[List[bytes], bytes], dtype=np.float32, shape=None
) -> np.ndarray:
    """Inverse of :func:`arrtolz4string_list`."""
    if isinstance(str_lst, bytes):
        str_lst = [str_lst]
    if len(str_lst) == 0 or (len(str_lst) == 1 and str_lst[0] == b""):
        out = np.zeros((0,), dtype=dtype)
        return out if shape is None else out.reshape(shape)
    parts = [np.frombuffer(_dctx().decompress(s), dtype=dtype) for s in str_lst]
    arr = np.concatenate(parts) if len(parts) > 1 else parts[0]
    if shape is not None:
        arr = arr.reshape(shape)
    return arr.copy()


def load_from_h5py(
    path: str, hdf5_names: Optional[Sequence[str]] = None, as_dict: bool = False
) -> Union[List[np.ndarray], Dict[str, np.ndarray]]:
    """Load datasets from an HDF5 file (reference API parity)."""
    with h5py.File(path, "r") as f:
        if hdf5_names is None:
            hdf5_names = list(f.keys())
        if as_dict:
            return {name: f[name][()] for name in hdf5_names}
        return [f[name][()] for name in hdf5_names]


def save_to_h5py(
    data: Union[Dict[str, np.ndarray], Iterable[np.ndarray]],
    path: str,
    hdf5_names: Optional[Sequence[str]] = None,
    overwrite: bool = True,
    compression: bool = True,
):
    """Save arrays to an HDF5 file (reference API parity)."""
    import os

    if os.path.isfile(path) and overwrite:
        os.remove(path)
    if not isinstance(data, dict):
        data_list = list(data)
        if hdf5_names is None or len(hdf5_names) != len(data_list):
            raise ValueError("hdf5_names must match the number of arrays.")
        data = dict(zip(hdf5_names, data_list))
    kwargs = {"compression": "gzip", "compression_opts": 1} if compression else {}
    with h5py.File(path, "w") as f:
        for name, arr in data.items():
            f.create_dataset(name, data=arr, **kwargs)
