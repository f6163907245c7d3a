"""Dense-prediction helper layer: model getters, GT IO, label converters.

Reference parity: syconn/handler/prediction.py — model-path getters
(:978-1076), ``certainty_estimate`` :1197, celltype label str<->int
converters :1230-1418, GT import/export (:49 ``load_gt_from_kzip``,
:389 ``create_h5_gt_file``). The tiled inference engine itself lives in
syconn_tpu/inference/dense.py (``predict_dense_to_kd``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from .. import global_params
from ..inference.dense import DenseTilePredictor, predict_dense_to_kd  # noqa: F401
from ..inference.points import certainty_estimate  # noqa: F401

__all__ = [
    "predict_dense_to_kd",
    "certainty_estimate",
    "get_myelin_cnn",
    "get_organelle_cnn",
    "get_syntype_cnn",
    "get_celltype_model_pts",
    "get_glia_model_pts",
    "get_compartment_model_pts",
    "get_tripletnet_model_pts",
    "int2str_converter",
    "str2int_converter",
    "certainty_celltype",
    "create_h5_gt_file",
    "load_gt_from_h5",
]

# Celltype label semantics (reference: handler/prediction.py:1230-1418,
# j0126 8-class convention)
CELLTYPE_LABELS: Dict[int, str] = {
    0: "EA",   # excitatory axon
    1: "MSN",  # medium spiny neuron
    2: "GP",   # globus pallidus
    3: "INT",  # interneuron
    4: "STN",  # subthalamic
    5: "FS",   # fast spiking
    6: "LTS",  # low-threshold spiking
    7: "NGF",  # neurogliaform
}
_STR2INT = {v: k for k, v in CELLTYPE_LABELS.items()}

AXONESS_LABELS = {0: "dendrite", 1: "axon", 2: "soma"}
SPINESS_LABELS = {0: "shaft", 1: "head", 2: "neck", 3: "other"}


def int2str_converter(label, gt_type: str = "ctgt_j0251_v2") -> str:
    """Integer label -> name (reference: :1230)."""
    table = {
        "axgt": AXONESS_LABELS,
        "spgt": SPINESS_LABELS,
    }.get(gt_type, CELLTYPE_LABELS)
    return table.get(int(label), str(label))


def str2int_converter(name: str, gt_type: str = "ctgt_j0251_v2") -> int:
    if gt_type == "axgt":
        inv = {v: k for k, v in AXONESS_LABELS.items()}
    elif gt_type == "spgt":
        inv = {v: k for k, v in SPINESS_LABELS.items()}
    else:
        inv = _STR2INT
    return int(inv[name])


def certainty_celltype(logit_rows: np.ndarray) -> float:
    """(reference: super_segmentation_object.py:3193)"""
    return certainty_estimate(logit_rows)


# ------------------------------------------------------------ model getters
def _unet(mpath, variant):
    from ..models.io import get_or_init_model
    from ..models.unet3d import UNet3D, unet_variants

    return get_or_init_model(
        mpath, lambda: (UNet3D(**unet_variants(variant)), (1, 64, 64, 32, 1))
    )


def get_myelin_cnn():
    """(reference: :1047)"""
    return _unet(global_params.config.mpath_myelin, "myelin")


def get_organelle_cnn():
    return _unet(global_params.config.mpath_organelles, "organelles")


def get_syntype_cnn():
    return _unet(global_params.config.mpath_syntype, "syntype")


def get_celltype_model_pts():
    """(reference: prediction_pts.py:1698)"""
    from ..models.io import get_or_init_model
    from ..models.pointnet import PointClassNet

    return get_or_init_model(
        global_params.config.mpath_celltype_pts,
        lambda: (PointClassNet(n_classes=8), (1, 2048, 7)),
    )


def get_glia_model_pts():
    from ..models.io import get_or_init_model
    from ..models.pointnet import PointSegNet

    return get_or_init_model(
        global_params.config.mpath_glia_pts,
        lambda: (PointSegNet(n_classes=2), (1, 2048, 7)),
    )


def get_compartment_model_pts():
    from ..models.io import get_or_init_model
    from ..models.pointnet import PointSegNet

    return get_or_init_model(
        global_params.config.mpath_compartment_pts,
        lambda: (PointSegNet(n_classes=3), (1, 2048, 7)),
    )


def get_tripletnet_model_pts():
    from ..models.io import get_or_init_model
    from ..models.pointnet import PointClassNet

    ndim = int(global_params.config["tcmn"]["ndim_embedding"])
    return get_or_init_model(
        global_params.config.mpath_tnet_pts,
        lambda: (PointClassNet(n_classes=2, embed_dim=ndim), (1, 2048, 7)),
    )


# ------------------------------------------------------------------- GT IO
def create_h5_gt_file(path: str, raw: np.ndarray, labels: np.ndarray):
    """(reference: :389)"""
    from .compression import save_to_h5py

    save_to_h5py({"raw": raw, "label": labels}, path)


def load_gt_from_h5(path: str):
    from .compression import load_from_h5py

    return load_from_h5py(path, hdf5_names=["raw", "label"])


def load_gt_from_kzip(kzip_path: str, gt_type: str = "axgt"):
    """Annotated-skeleton ground truth from a k.zip (reference: :49).

    Expects an ``annotation.xml`` (KNOSSOS nml) whose per-thing comments
    name the label (e.g. 'axon'/'dendrite'/'soma'). Returns
    (node coords (N, 3), integer labels (N,)).
    """
    import xml.etree.ElementTree as ET

    from .basics import read_txt_from_zip

    nml = read_txt_from_zip(kzip_path, "annotation.xml").decode()
    root = ET.fromstring(nml)
    coords, labels = [], []
    for thing in root.iter("thing"):
        comment = (thing.get("comment") or "").strip()
        try:
            lab = str2int_converter(comment, gt_type) if comment else -1
        except KeyError:
            try:
                lab = int(comment)
            except ValueError:
                lab = -1
        for node in thing.iter("node"):
            coords.append(
                [float(node.get("x")), float(node.get("y")), float(node.get("z"))]
            )
            labels.append(lab)
    return np.asarray(coords, np.float32).reshape(-1, 3), np.asarray(labels, np.int64)
