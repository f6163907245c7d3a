"""Object-oriented biology interface over the exported connectivity matrix.

Reference parity: syconn/analysis/bio_interface.py:80-298 — ``Dataset`` /
``Neuron`` / ``Compartment`` / ``Synapse`` wrappers with path-density,
synapse-size and asymmetry-fraction properties.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .. import global_params

__all__ = ["ConnectomeDataset", "Neuron", "Synapse"]


class Synapse:
    def __init__(self, row: dict):
        self.id = int(row["ids"])
        self.partners = np.asarray(row["partners"], np.uint64)
        self.coord = np.asarray(row["coords"], np.int64)
        self.size_vx = int(row["sizes"])
        self.sign = int(row["signs"])
        self.prob = float(row["probs"])
        self.celltypes = np.asarray(row.get("celltypes", [-1, -1]))
        self.axoness = np.asarray(row.get("axoness", [-1, -1]))

    @property
    def is_inhibitory(self) -> bool:
        return self.sign < 0

    def __repr__(self):
        return f"Synapse(id={self.id}, partners={self.partners.tolist()}, sign={self.sign})"


class Neuron:
    def __init__(self, ssv_id: int, dataset: "ConnectomeDataset"):
        self.id = int(ssv_id)
        self._ds = dataset
        self._ssv = None

    @property
    def ssv(self):
        if self._ssv is None:
            from ..reps.super_segmentation import SuperSegmentationDataset

            ssd = SuperSegmentationDataset(working_dir=self._ds.wd)
            self._ssv = ssd.get_super_segmentation_object(self.id)
        return self._ssv

    @property
    def synapses(self) -> List[Synapse]:
        return [s for s in self._ds.synapses if self.id in s.partners]

    @property
    def n_synapses(self) -> int:
        return len(self.synapses)

    @property
    def total_synapse_size(self) -> int:
        return int(sum(s.size_vx for s in self.synapses))

    @property
    def asymmetry_fraction(self) -> float:
        syns = self.synapses
        if not syns:
            return float("nan")
        return float(np.mean([s.sign > 0 for s in syns]))

    @property
    def celltype(self):
        return self.ssv.lookup_in_attribute_dict("celltype_cnn_e3")

    @property
    def skeleton_path_length_um(self) -> float:
        """Total skeleton cable length in µm."""
        if not self.ssv.load_skeleton():
            return 0.0
        sk = self.ssv.skeleton
        scale = np.array(global_params.config["scaling"], np.float64)
        nodes = np.asarray(sk["nodes"], np.float64) * scale[None]
        edges = np.asarray(sk["edges"], np.int64).reshape(-1, 2)
        if len(edges) == 0:
            return 0.0
        return float(np.linalg.norm(nodes[edges[:, 0]] - nodes[edges[:, 1]], axis=1).sum() / 1e3)

    @property
    def synapse_density_per_um(self) -> float:
        l = self.skeleton_path_length_um
        return self.n_synapses / l if l > 0 else float("nan")

    def partners(self) -> List[int]:
        out = set()
        for s in self.synapses:
            out.update(int(p) for p in s.partners if int(p) != self.id)
        return sorted(out)

    def __repr__(self):
        return f"Neuron(id={self.id}, n_synapses={self.n_synapses})"


class ConnectomeDataset:
    """Analysis entry point over the exported matrix
    (reference ``Dataset``, bio_interface.py:80)."""

    def __init__(self, working_dir: Optional[str] = None, matrix_path: Optional[str] = None):
        self.wd = working_dir or global_params.config.working_dir
        if matrix_path is None:
            matrix_path = os.path.join(str(self.wd), "connectivity_matrix", "conn_mat.npz")
        self._data = dict(np.load(matrix_path, allow_pickle=False))
        self.synapses = [
            Synapse({k: self._data[k][i] for k in self._data}) for i in range(len(self._data["ids"]))
        ]

    @property
    def neuron_ids(self) -> np.ndarray:
        if len(self.synapses) == 0:
            return np.zeros(0, np.uint64)
        return np.unique(np.concatenate([s.partners for s in self.synapses]))

    def neuron(self, ssv_id: int) -> Neuron:
        return Neuron(ssv_id, self)

    @property
    def neurons(self) -> List[Neuron]:
        return [self.neuron(int(i)) for i in self.neuron_ids]

    def wiring(self):
        from ..reps.connectivity_helper import generate_wiring_array

        return generate_wiring_array(wd=self.wd)

    def __repr__(self):
        return f"ConnectomeDataset(wd={self.wd!r}, n_synapses={len(self.synapses)})"
