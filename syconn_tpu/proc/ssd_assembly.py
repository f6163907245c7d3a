"""Standalone cell import/export via k.zip archives.

Reference parity: syconn/proc/ssd_assembly.py — ``init_sso_from_kzip`` :20,
``init_ssd_from_kzips`` :136. A cell archive carries meshes (per object
type), the skeleton, sample locations and the attribute dict, so example
workflows run without a working directory.
"""

from __future__ import annotations

import io
import json
import os
import pickle
import zipfile
from typing import Dict, List, Optional

import numpy as np

__all__ = ["save_sso_to_kzip", "init_sso_from_kzip", "init_ssd_from_kzips"]

_MESH_TYPES = ["sv", "mi", "vc", "sj", "syn_ssv"]


def save_sso_to_kzip(ssv, path: str, mesh_types=("sv", "mi", "vc", "sj")) -> str:
    """Export one cell reconstruction into a standalone archive."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        meta = {"id": int(ssv.id), "scaling": np.asarray(ssv.scaling).tolist()}
        zf.writestr("meta.json", json.dumps(meta))
        ssv.load_attr_dict()
        zf.writestr("attr_dict.pkl", pickle.dumps(ssv.attr_dict, protocol=4))
        for t in mesh_types:
            try:
                mesh = ssv.load_mesh(t)
            except Exception:
                continue
            if mesh is None or len(mesh[1]) == 0:
                continue
            buf = io.BytesIO()
            np.savez_compressed(
                buf,
                ind=np.asarray(mesh[0]),
                vert=np.asarray(mesh[1]),
                norm=np.asarray(mesh[2]) if len(mesh) > 2 else np.zeros(0, np.float32),
            )
            zf.writestr(f"mesh_{t}.npz", buf.getvalue())
        if ssv.load_skeleton():
            buf = io.BytesIO()
            np.savez_compressed(buf, **{k: np.asarray(v) for k, v in ssv.skeleton.items()})
            zf.writestr("skeleton.npz", buf.getvalue())
    return path


def init_sso_from_kzip(path: str, sso_id: Optional[int] = None):
    """Re-instantiate a standalone cell from an archive
    (reference: ssd_assembly.py:20). Works without a working directory."""
    from ..reps.super_segmentation import SuperSegmentationObject

    with zipfile.ZipFile(path, "r") as zf:
        names = set(zf.namelist())
        meta = json.loads(zf.read("meta.json")) if "meta.json" in names else {}
        ssv_id = sso_id if sso_id is not None else int(meta.get("id", 1))
        scaling = np.asarray(meta.get("scaling", [1, 1, 1]), np.float32)
        attr_dict = (
            pickle.loads(zf.read("attr_dict.pkl")) if "attr_dict.pkl" in names else {}
        )
        ssv = SuperSegmentationObject(
            ssv_id,
            working_dir=None,
            version="kzip",
            scaling=scaling,
            sv_ids=attr_dict.get("sv_ids", [ssv_id]),
        )
        ssv.attr_dict = attr_dict
        ssv._standalone = True
        for t in _MESH_TYPES:
            fname = f"mesh_{t}.npz"
            if fname in names:
                with zf.open(fname) as f:
                    data = np.load(io.BytesIO(f.read()))
                    ssv._meshes[t] = [data["ind"], data["vert"], data["norm"]]
        if "skeleton.npz" in names:
            with zf.open("skeleton.npz") as f:
                data = np.load(io.BytesIO(f.read()))
                ssv.skeleton = {k: data[k] for k in data.files}
    return ssv


def init_ssd_from_kzips(dir_path: str):
    """Load all cell archives from a directory (reference: :136)."""
    import glob

    out = []
    for p in sorted(glob.glob(os.path.join(dir_path, "*.k.zip"))):
        out.append(init_sso_from_kzip(p))
    return out
