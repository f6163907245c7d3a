"""Object-oriented biology interface over the exported connectivity matrix.

Reference parity: syconn/analysis/bio_interface.py — the lightweight
matrix wrappers (``ConnectomeDataset``/``Neuron``/``Synapse``) plus the
in-memory analysis model (reference :80-298 ``Dataset`` / ``Neuron`` /
``Compartment`` / ``Organelle`` / ``Spine`` and :707
``init_in_mem_dataset``): neurons split into axon/dendrite/soma
compartments with per-compartment skeleton cable length, organelles mapped
to compartments through nearest-skeleton-node compartment labels,
path-density / volume-path-density / asymmetry-fraction /
head-to-other-ratio statistics, spine objects carrying the measured
spine-head volumes, skeleton path distances (reference :1067
``get_skeleton_path_distance``), per-neuron feature vectors (reference
:377 ``update_neuron_features``) and dense connectivity matrices
(reference :1583 ``build_conn_mat``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .. import global_params

__all__ = [
    "ConnectomeDataset",
    "Neuron",
    "Synapse",
    "Dataset",
    "BioNeuron",
    "Compartment",
    "BioSynapse",
    "Organelle",
    "Spine",
    "init_in_mem_dataset",
    "get_skeleton_path_distance",
    "build_conn_mat",
    "neuron_features",
    "feature_labels",
]

# compartment codes written by the semseg/point models
DENDRITE, AXON, SOMA, BOUTON, TERMINAL = 0, 1, 2, 3, 4
AXON_LIKE = (AXON, BOUTON, TERMINAL)
SPINE_HEAD = 1  # spiness label of a spine head


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
        self.spiness = np.asarray(row.get("spiness", [-1, -1]))
        self.spinehead_vol = float(row.get("spinehead_vol", 0.0))

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


# --------------------------------------------------------------------------
# In-memory analysis model (reference bio_interface.py:80-298, :707)
# --------------------------------------------------------------------------


class BioSynapse:
    """A synapse with pre/post roles resolved from compartment labels
    (reference ``Synapse``, bio_interface.py:266). ``size`` is the signed
    contact area proxy in µm³ (negative = symmetric/inhibitory)."""

    def __init__(self, ID, pre, post, size, post_morph, pre_morph,
                 post_spine_vol, coordinate, prob):
        self.id = int(ID)
        self.pre = pre
        self.post = post
        self.size = float(size)
        self.post_morph = int(post_morph)   # spiness label at the post site
        self.pre_morph = pre_morph          # 'axon' | 'bouton' | 'terminal'
        self.post_spine_vol = float(post_spine_vol)
        self.coordinate = np.asarray(coordinate, np.int64)
        self.prob = float(prob)

    def __repr__(self):
        return (f"BioSynapse(id={self.id}, pre={self.pre.ID}, "
                f"post={self.post.ID}, size={self.size:.4f})")


class Organelle:
    """A mitochondrion or vesicle cloud mapped into a neuron's compartment
    (reference ``Organelle``, bio_interface.py:288)."""

    def __init__(self, ID, parent, o_type, size, coordinate):
        self.id = int(ID)
        self.parent = parent
        self.type = str(o_type)
        self.size = float(size)
        self.coordinate = np.asarray(coordinate, np.int64)


class Spine:
    """A spine-head site on a dendrite (reference ``Spine``,
    bio_interface.py:297); ``volume`` is the watershed-measured head volume
    in µm³ (exec_syns.run_spinehead_volume_calc)."""

    def __init__(self, ID, dendrite, volume, coordinate):
        self.id = int(ID)
        self.dendrite = dendrite
        self.synapses: Dict[int, BioSynapse] = {}
        self.volume = float(volume)
        self.coordinate = np.asarray(coordinate, np.int64)


class Compartment:
    """One anatomical compartment of a neuron (reference ``Compartment``,
    bio_interface.py:119): containers for synapses/mitos/vesicles plus
    skeleton cable length and the derived density statistics."""

    def __init__(self, neuron=None):
        self.neuron = neuron
        self.synapses: Dict[int, BioSynapse] = {}
        self.mitos: Dict[int, Organelle] = {}
        self.vesicles: Dict[int, Organelle] = {}
        self.skel_length = 0.0  # µm

    # -- size arrays -------------------------------------------------------
    @property
    def synapse_sizes(self):
        return (np.array([s.size for s in self.synapses.values()])
                if self.synapses else np.zeros(1))

    @property
    def abs_synapse_sizes(self):
        return np.abs(self.synapse_sizes)

    @property
    def mito_sizes(self):
        return (np.array([o.size for o in self.mitos.values()])
                if self.mitos else np.zeros(1))

    @property
    def vesicle_sizes(self):
        return (np.array([o.size for o in self.vesicles.values()])
                if self.vesicles else np.zeros(1))

    # -- path densities (per µm of skeleton cable) --------------------------
    def _density(self, count):
        return count / self.skel_length if self.skel_length > 0 else 0.0

    @property
    def synapse_path_density(self):
        return self._density(len(self.synapses))

    @property
    def mitos_path_density(self):
        return self._density(len(self.mitos))

    @property
    def vesicles_path_density(self):
        return self._density(len(self.vesicles))

    @property
    def synapse_vol_path_density(self):
        return self._density(float(np.sum(self.abs_synapse_sizes)))

    @property
    def mitos_vol_path_density(self):
        return self._density(float(np.sum(self.mito_sizes)))

    @property
    def vesicles_vol_path_density(self):
        return self._density(float(np.sum(self.vesicle_sizes)))

    # -- composition -------------------------------------------------------
    @property
    def fraction_asym(self):
        """Asymmetric (excitatory, size > 0) fraction of total synapse size."""
        s = self.synapse_sizes
        asym = float(np.sum(s[s > 0]))
        sym = float(np.sum(np.abs(s[s < 0])))
        tot = asym + sym
        return asym / tot if tot > 0 else float("nan")

    @property
    def head_other_ratio(self):
        """Spine-head synapse size over total synapse size."""
        head = sum(abs(s.size) for s in self.synapses.values()
                   if s.post_morph == SPINE_HEAD)
        other = sum(abs(s.size) for s in self.synapses.values()
                    if s.post_morph != SPINE_HEAD)
        tot = head + other
        return head / tot if tot > 0 else float("nan")

    @property
    def post_neurons(self):
        return [s.post for s in self.synapses.values()]

    @property
    def pre_neurons(self):
        return [s.pre for s in self.synapses.values()]


class BioNeuron:
    """A neuron with axon/dendrite/soma compartments (reference ``Neuron``,
    bio_interface.py:99)."""

    def __init__(self, ID, celltype=None):
        self.ID = int(ID)
        self.celltype = celltype
        self.celltype_certainty = float("nan")
        self.axon = Compartment(self)
        self.dendrite = Compartment(self)
        self.soma = Compartment(self)
        self.spines: Dict[int, Spine] = {}
        self.skeleton = None
        self.in_analysis_set = False
        self._nx_cache = None

    @property
    def compartments(self):
        return {"axon": self.axon, "dendrite": self.dendrite, "soma": self.soma}

    @property
    def total_skel_length(self):
        return self.axon.skel_length + self.dendrite.skel_length + self.soma.skel_length

    def __repr__(self):
        return (f"BioNeuron(ID={self.ID}, celltype={self.celltype}, "
                f"ax={len(self.axon.synapses)}syn, "
                f"de={len(self.dendrite.synapses)}syn)")


class Dataset:
    """In-memory analysis dataset: synapse- and neuron-centric access
    (reference ``Dataset``, bio_interface.py:80)."""

    def __init__(self):
        self.neurons: Dict[int, BioNeuron] = {}
        self.synapses: Dict[int, BioSynapse] = {}
        self.mitos: Dict[int, Organelle] = {}
        self.vesicles: Dict[int, Organelle] = {}
        self.spines: Dict[int, Spine] = {}

    def __repr__(self):
        return (f"Dataset({len(self.neurons)} neurons, "
                f"{len(self.synapses)} synapses, {len(self.mitos)} mitos, "
                f"{len(self.vesicles)} vesicles, {len(self.spines)} spines)")


def _comp_of_label(n: BioNeuron, label: int) -> Optional[Compartment]:
    if label in AXON_LIKE:
        return n.axon
    if label == DENDRITE:
        return n.dendrite
    if label == SOMA:
        return n.soma
    return None


def init_in_mem_dataset(
    working_dir: Optional[str] = None,
    matrix_path: Optional[str] = None,
    min_syn_per_neuron: int = 0,
    syn_prob_t: Optional[float] = None,
) -> Dataset:
    """Populate a :class:`Dataset` from the exported matrix + caches
    (reference ``init_in_mem_dataset``, bio_interface.py:707).

    Synapses are kept when one partner's compartment is axon-like and the
    other's is dendrite/soma (axo-axonic etc. are skipped, as in the
    reference); the axon-like side becomes ``pre``. Organelles (mi/vc) are
    assigned to compartments via the nearest skeleton node's compartment
    label, per-compartment cable lengths come from edge sums over node
    labels, and spine-head synapses spawn :class:`Spine` objects carrying
    the measured head volumes.
    """
    wd = working_dir or global_params.config.working_dir
    cfg = global_params.config
    scale = np.asarray(cfg["scaling"], np.float64)
    vx_um3 = float(np.prod(scale)) / 1e9

    cd = ConnectomeDataset(wd, matrix_path=matrix_path)
    ds = Dataset()
    syn_cnt = 0
    for s in cd.synapses:
        if syn_prob_t is not None and s.prob < syn_prob_t:
            continue
        ax = np.asarray(s.axoness)
        pre_ix = post_ix = None
        for a, b in ((0, 1), (1, 0)):
            if int(ax[a]) in AXON_LIKE and int(ax[b]) in (DENDRITE, SOMA):
                pre_ix, post_ix = a, b
        if pre_ix is None:
            continue  # axo-axonic / dendro-dendritic / unclassified
        pre_id = int(s.partners[pre_ix])
        post_id = int(s.partners[post_ix])
        for nid, ct in ((pre_id, int(s.celltypes[pre_ix])),
                        (post_id, int(s.celltypes[post_ix]))):
            if nid not in ds.neurons:
                ds.neurons[nid] = BioNeuron(nid, celltype=ct if ct >= 0 else None)
        pre_n = ds.neurons[pre_id]
        post_n = ds.neurons[post_id]
        pre_morph = {AXON: "axon", BOUTON: "bouton", TERMINAL: "terminal"}[int(ax[pre_ix])]
        spiness = np.asarray(getattr(s, "spiness", [-1, -1]))
        head_vol = float(getattr(s, "spinehead_vol", 0.0) or 0.0)
        syn_cnt += 1
        bs = BioSynapse(
            syn_cnt, pre_n, post_n,
            size=float(s.sign) * float(s.size_vx) * vx_um3,
            post_morph=int(spiness[post_ix]),
            pre_morph=pre_morph,
            post_spine_vol=head_vol,
            coordinate=s.coord,
            prob=s.prob,
        )
        ds.synapses[syn_cnt] = bs
        pre_n.axon.synapses[syn_cnt] = bs
        target = post_n.dendrite if int(ax[post_ix]) == DENDRITE else post_n.soma
        target.synapses[syn_cnt] = bs
        if bs.post_morph == SPINE_HEAD:
            sp = Spine(syn_cnt, post_n, head_vol, s.coord)
            sp.synapses[syn_cnt] = bs
            post_n.spines[syn_cnt] = sp
            ds.spines[syn_cnt] = sp

    for n in ds.neurons.values():
        n.in_analysis_set = (
            len(n.dendrite.synapses) >= min_syn_per_neuron
            or len(n.axon.synapses) >= min_syn_per_neuron
        )

    # ----- per-neuron structure from the SSD/SD caches ---------------------
    from ..reps.segmentation import SegmentationDataset
    from ..reps.super_segmentation import SuperSegmentationDataset

    ssd = SuperSegmentationDataset(working_dir=wd)
    org_caches = {}
    for co in ("mi", "vc"):
        try:
            sd = SegmentationDataset(co, working_dir=wd)
            ids = sd.ids
            org_caches[co] = (
                {int(i): k for k, i in enumerate(ids)},
                sd.load_numpy_data("size"),
                sd.load_numpy_data("rep_coord"),
            )
        except Exception:
            org_caches[co] = None

    org_cnt = {"mi": 0, "vc": 0}
    known_ids = set(int(i) for i in ssd.ssv_ids)
    for nid, n in ds.neurons.items():
        if nid not in known_ids or not n.in_analysis_set:
            continue
        ssv = ssd.get_super_segmentation_object(nid)
        ssv.load_attr_dict()
        if n.celltype is None:
            n.celltype = ssv.attr_dict.get("celltype_cnn_e3")
        n.celltype_certainty = float(
            ssv.attr_dict.get("celltype_cnn_e3_certainty", float("nan")) or float("nan")
        )
        if not ssv.load_skeleton():
            continue
        sk = ssv.skeleton
        n.skeleton = sk
        nodes = np.asarray(sk["nodes"], np.float64)
        if len(nodes) == 0:
            continue
        nodes_um = nodes * scale[None] / 1e3
        labels = None
        for key in ("axoness_avg10000", "axoness"):
            if key in sk:
                labels = np.asarray(sk[key], np.int64)
                break
        edges = np.asarray(sk.get("edges", np.zeros((0, 2))), np.int64).reshape(-1, 2)
        if labels is not None and len(edges):
            elen = np.linalg.norm(nodes_um[edges[:, 0]] - nodes_um[edges[:, 1]], axis=1)
            e_lab = labels[edges[:, 0]]  # first node classifies the edge
            n.axon.skel_length = float(elen[np.isin(e_lab, AXON_LIKE)].sum())
            n.dendrite.skel_length = float(elen[e_lab == DENDRITE].sum())
            n.soma.skel_length = float(elen[e_lab == SOMA].sum())
        # organelles -> compartments via nearest skeleton node
        if labels is not None:
            from scipy.spatial import cKDTree

            tree = cKDTree(nodes_um)
            for co, store in (("mi", ds.mitos), ("vc", ds.vesicles)):
                cache = org_caches.get(co)
                if cache is None:
                    continue
                id2ix, sizes, reps = cache
                for oid in np.atleast_1d(ssv.attr_dict.get(co, [])):
                    ix = id2ix.get(int(oid))
                    if ix is None:
                        continue
                    coord = np.asarray(reps[ix], np.float64)
                    _, node_ix = tree.query(coord * scale / 1e3, k=1)
                    comp = _comp_of_label(n, int(labels[node_ix]))
                    org_cnt[co] += 1
                    org = Organelle(org_cnt[co], n, co,
                                    float(sizes[ix]) * vx_um3, reps[ix])
                    store[org_cnt[co]] = org
                    if comp is not None:
                        (comp.mitos if co == "mi" else comp.vesicles)[org_cnt[co]] = org
    return ds


def get_skeleton_path_distance(
    neuron: BioNeuron,
    c1,
    c2,
    max_query_coord_dist: float = 1.5,
) -> float:
    """Skeleton path distance (µm) between the nodes nearest to two
    coordinates (voxel frame), via Dijkstra over the edge-length graph
    (reference: bio_interface.py:1067). Returns inf when either coordinate
    is farther than ``max_query_coord_dist`` µm from the skeleton or the
    nodes are disconnected."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra
    from scipy.spatial import cKDTree

    sk = neuron.skeleton
    if sk is None or not len(sk.get("nodes", [])):
        return float("inf")
    scale = np.asarray(global_params.config["scaling"], np.float64)
    nodes_um = np.asarray(sk["nodes"], np.float64) * scale[None] / 1e3
    edges = np.asarray(sk.get("edges", np.zeros((0, 2))), np.int64).reshape(-1, 2)
    tree = cKDTree(nodes_um)
    d1, i1 = tree.query(np.asarray(c1, np.float64) * scale / 1e3, k=1)
    d2, i2 = tree.query(np.asarray(c2, np.float64) * scale / 1e3, k=1)
    if d1 > max_query_coord_dist or d2 > max_query_coord_dist:
        return float("inf")
    n = len(nodes_um)
    w = np.linalg.norm(nodes_um[edges[:, 0]] - nodes_um[edges[:, 1]], axis=1)
    g = coo_matrix((np.concatenate([w, w]),
                    (np.concatenate([edges[:, 0], edges[:, 1]]),
                     np.concatenate([edges[:, 1], edges[:, 0]]))), shape=(n, n))
    dist = dijkstra(g.tocsr(), directed=False, indices=int(i1))
    return float(dist[int(i2)])


def build_conn_mat(ds: Dataset, neurons: Optional[List[int]] = None,
                   min_syn_size: float = 0.0):
    """Dense (pre x post) summed-synapse-size matrix over ``neurons``
    (reference: bio_interface.py:1583). Returns (matrix, ids)."""
    ids = sorted(neurons) if neurons is not None else sorted(ds.neurons)
    ix = {nid: k for k, nid in enumerate(ids)}
    mat = np.zeros((len(ids), len(ids)), np.float64)
    for s in ds.synapses.values():
        if abs(s.size) < min_syn_size:
            continue
        a = ix.get(s.pre.ID)
        b = ix.get(s.post.ID)
        if a is not None and b is not None:
            mat[a, b] += abs(s.size)
    return mat, np.asarray(ids, np.uint64)


def feature_labels(dendrite=True, axon=True, soma=True) -> List[str]:
    """Names of the per-neuron feature vector entries (reference
    ``get_feature_labels``, bio_interface.py:567)."""
    per_comp = [
        "syn_path_density", "syn_vol_path_density", "mito_path_density",
        "mito_vol_path_density", "vc_path_density", "vc_vol_path_density",
        "fraction_asym", "head_other_ratio", "skel_length",
        "mean_syn_size", "median_syn_size",
    ]
    out = []
    for name, on in (("dendrite", dendrite), ("axon", axon), ("soma", soma)):
        if on:
            out += [f"{name}_{f}" for f in per_comp]
    return out


def neuron_features(n: BioNeuron, dendrite=True, axon=True, soma=True) -> np.ndarray:
    """Morphology/connectivity feature vector of one neuron (reference
    ``update_neuron_features``, bio_interface.py:377); NaNs where a
    statistic is undefined (e.g. no synapses in a compartment)."""
    comps = []
    if dendrite:
        comps.append(n.dendrite)
    if axon:
        comps.append(n.axon)
    if soma:
        comps.append(n.soma)
    out = []
    for c in comps:
        sizes = c.abs_synapse_sizes if c.synapses else np.array([np.nan])
        out += [
            c.synapse_path_density, c.synapse_vol_path_density,
            c.mitos_path_density, c.mitos_vol_path_density,
            c.vesicles_path_density, c.vesicles_vol_path_density,
            c.fraction_asym, c.head_other_ratio, c.skel_length,
            float(np.mean(sizes)), float(np.median(sizes)),
        ]
    return np.asarray(out, np.float64)
