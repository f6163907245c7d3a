"""BinarySearchStore: O(log n) sparse attribute lookup over sorted IDs.

Reference parity: syconn/backend/storage.py:629 — used for the global
``sv -> ssv`` reverse mapping (super_segmentation_dataset.py:335-353).
IDs are sorted once at build time and split into contiguous shards inside a
single HDF5 file; queries binary-search the shard boundaries, then the shard.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import h5py
import numpy as np


class BinarySearchStore:
    def __init__(
        self,
        path,
        ids: Optional[np.ndarray] = None,
        attributes: Optional[Dict[str, np.ndarray]] = None,
        n_shards: int = 10,
        overwrite: bool = False,
    ):
        self._path = path
        self._file: Optional[h5py.File] = None
        if ids is not None:
            if attributes is None:
                raise ValueError("attributes required when building a store.")
            self._build(np.asarray(ids), attributes, n_shards, overwrite)
        else:
            self._open()

    # ------------------------------------------------------------------ build
    def _h5(self, mode: str) -> h5py.File:
        if isinstance(self._path, (str, bytes)):
            return h5py.File(self._path, mode)
        # file-like object (e.g. tempfile)
        return h5py.File(self._path, mode, driver="fileobj")

    def _build(self, ids: np.ndarray, attributes: Dict[str, np.ndarray], n_shards: int, overwrite: bool):
        import os

        if isinstance(self._path, str) and os.path.isfile(self._path):
            if not overwrite:
                raise FileExistsError(self._path)
            os.remove(self._path)
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        bounds = np.linspace(0, len(ids_sorted), n_shards + 1).astype(np.int64)
        with self._h5("w") as f:
            f.attrs["n_shards"] = n_shards
            f.attrs["n_elements"] = len(ids_sorted)
            # first ID of each shard, for shard lookup
            f.create_dataset(
                "shard_starts",
                data=ids_sorted[np.minimum(bounds[:-1], len(ids_sorted) - 1)]
                if len(ids_sorted)
                else np.zeros(n_shards, ids.dtype),
            )
            f.create_dataset("bounds", data=bounds)
            for si in range(n_shards):
                g = f.create_group(f"shard_{si}")
                sl = slice(bounds[si], bounds[si + 1])
                g.create_dataset("ids", data=ids_sorted[sl])
                for key, vals in attributes.items():
                    g.create_dataset(key, data=np.asarray(vals)[order][sl])
        self._open()

    def _open(self):
        self._file = self._h5("r")

    # ------------------------------------------------------------------ query
    @property
    def n_shards(self) -> int:
        return int(self._file.attrs["n_shards"])

    @property
    def id_array(self) -> np.ndarray:
        return np.concatenate(
            [self._file[f"shard_{si}"]["ids"][()] for si in range(self.n_shards)]
        )

    @property
    def attr_names(self):
        g = self._file["shard_0"]
        return [k for k in g.keys() if k != "ids"]

    def get_attributes(self, ids: np.ndarray, attr_key: str) -> np.ndarray:
        """Look up ``attr_key`` for each query ID (must exist in the store)."""
        ids = np.asarray(ids)
        bounds = self._file["bounds"][()]
        out = None
        # assign each query to a shard via the global sorted order
        shard_starts = self._file["shard_starts"][()]
        shard_ix = np.searchsorted(shard_starts, ids, side="right") - 1
        shard_ix = np.clip(shard_ix, 0, self.n_shards - 1)
        for si in np.unique(shard_ix):
            sel = shard_ix == si
            g = self._file[f"shard_{int(si)}"]
            sids = g["ids"][()]
            vals = g[attr_key][()]
            pos = np.searchsorted(sids, ids[sel])
            pos = np.clip(pos, 0, max(len(sids) - 1, 0))
            found = len(sids) > 0 and True
            if not found:
                raise KeyError("Empty shard queried.")
            if not np.all(sids[pos] == ids[sel]):
                missing = ids[sel][sids[pos] != ids[sel]]
                raise KeyError(f"IDs not found in store: {missing[:10]} ...")
            if out is None:
                out = np.empty(len(ids), dtype=vals.dtype)
            out[sel] = vals[pos]
        if out is None:
            out = np.zeros(0, dtype=np.uint64)
        return out

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_file"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._open()

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None
