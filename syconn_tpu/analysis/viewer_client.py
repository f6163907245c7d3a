"""Viewer gate client (KNOSSOS-plugin analog).

Reference parity: syconn/analysis/syconn_knossos_viewer.py — the PythonQt
KNOSSOS plugin. Its capabilities split into (a) the REST gate client
``SyConnGateInteraction`` (:26 — mesh streaming with a threaded download
queue, synapse/celltype tables with probability + axo-dendritic filters,
attribute push/pull) and (b) Qt widgets rendering into KNOSSOS. This module
provides (a) in full as :class:`SyConnClient` (UI-framework free) plus the
viewer-side capability as scene export: ``export_scene_kzip`` writes the
selected neurite/synapse meshes and the skeleton into a ``.k.zip`` KNOSSOS
can open directly — mesh streaming into a viewer without PythonQt.

Mesh components stream as raw little-endian bytes (``?format=raw``; the
reference plugin parses JSON number lists) with a JSON fallback for older
servers.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from queue import Empty, Queue
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["SyConnClient", "int2str_label_converter"]


def int2str_label_converter(label, gt_type: str) -> str:
    """Semantic name of an integer prediction label (reference:
    syconn_knossos_viewer.py:966). ``axgt``: compartments, ``spgt``:
    spines, ``ctgt*``: cell types (delegated to handler.prediction)."""
    if isinstance(label, (list, np.ndarray)):
        if len(label) != 1:
            raise ValueError("Multiple labels given.")
        label = label[0]
    label = int(label)
    if gt_type == "axgt":
        return {0: "dendrite", 1: "axon", 2: "soma"}.get(label, "N/A")
    if gt_type == "spgt":
        return {0: "neck", 1: "head", 2: "shaft", 3: "other"}.get(label, "N/A")
    from ..handler.prediction import int2str_converter

    return int2str_converter(label, gt_type)


class SyConnClient:
    """Gate client (reference ``SyConnGateInteraction``,
    syconn_knossos_viewer.py:26)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 10001,
        timeout: float = 30.0,
        synthresh: float = 0.5,
        axodend_only: bool = True,
        n_download_workers: int = 2,
    ):
        self.base = f"http://{host}:{port}"
        self.timeout = timeout
        self.synthresh = float(synthresh)
        self.axodend_only = bool(axodend_only)
        # threaded mesh download queue (reference :90-160)
        self._down_queue: Queue = Queue()
        self._results: Dict[Tuple[int, str], Dict[str, np.ndarray]] = {}
        self._results_lock = threading.Lock()
        self._workers = []
        for _ in range(int(n_download_workers)):
            t = threading.Thread(target=self._download_worker, daemon=True)
            t.start()
            self._workers.append(t)

    # ------------------------------------------------------------ transport
    def _get(self, route: str) -> dict:
        with urllib.request.urlopen(self.base + route, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _get_raw(self, route: str) -> Optional[bytes]:
        with urllib.request.urlopen(self.base + route, timeout=self.timeout) as r:
            data = r.read()
            if r.headers.get("Content-Type", "") == "application/octet-stream":
                return data
            return None

    def _post(self, route: str, payload: dict) -> dict:
        data = json.dumps(payload).encode()
        req = urllib.request.Request(
            self.base + route, data=data, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _fetch_component(self, ssv_id: int, obj_type: str, comp: str) -> np.ndarray:
        dtype = np.uint32 if comp == "ind" else np.float32
        route = (
            f"/ssv_{comp}/{ssv_id}" if obj_type == "sv"
            else f"/ssv_obj_{comp}/{ssv_id}/{obj_type}"
        )
        raw = self._get_raw(route + "?format=raw")
        if raw is not None:
            return np.frombuffer(raw, dtype)
        return np.asarray(self._get(route)[comp], dtype)  # JSON fallback

    # ------------------------------------------------------------- queries
    def ssv_list(self) -> List[int]:
        return [int(i) for i in self._get("/ssv_list")["ssvs"]]

    def ssv_mesh(self, ssv_id: int, obj_type: str = "sv") -> Dict[str, np.ndarray]:
        """Mesh via the three binary component streams (reference
        ``get_ssv_obj_mesh`` :142)."""
        return {
            "ind": self._fetch_component(ssv_id, obj_type, "ind").astype(np.int64),
            "vert": self._fetch_component(ssv_id, obj_type, "vert"),
            "norm": self._fetch_component(ssv_id, obj_type, "norm"),
        }

    get_ssv_obj_mesh = ssv_mesh

    def ssv_skeleton(self, ssv_id: int) -> Dict[str, np.ndarray]:
        sk = self._get(f"/ssv_skeleton/{ssv_id}")
        return {k: np.asarray(v) for k, v in sk.items()}

    def svs_of_ssv(self, ssv_id: int) -> np.ndarray:
        return np.asarray(self._get(f"/svs_of_ssv/{ssv_id}")["svs"], np.uint64)

    def ssv_of_sv(self, sv_id: int) -> Optional[int]:
        v = self._get(f"/ssv_of_sv/{sv_id}")["ssv"]
        return int(v) if v is not None else None

    def celltype_of_ssv(self, ssv_id: int) -> dict:
        d = self._get(f"/ct_of_ssv/{ssv_id}")
        if d.get("ct") is not None:
            d["ct_str"] = int2str_label_converter(d["ct"], "ctgt_j0251_v2")
        return d

    def synapse_table(self, synthresh: Optional[float] = None,
                      axodend_only: Optional[bool] = None) -> Dict[str, np.ndarray]:
        """Synapse metadata filtered like the plugin's table (reference
        :414 ``populate_syn_list`` / :32 ``synthresh``/``axodend_only``):
        probability >= threshold; optionally only axo-dendritic synapses
        (one partner axon-like, the other dendrite/soma)."""
        synthresh = self.synthresh if synthresh is None else float(synthresh)
        axodend_only = self.axodend_only if axodend_only is None else bool(axodend_only)
        data = {k: np.asarray(v) for k, v in self._get("/all_syn_meta").items()}
        n = len(data.get("ids", []))
        if n == 0:
            return data
        sel = np.asarray(data["syn_prob"], np.float64) >= synthresh
        if axodend_only and "partner_axoness" in data:
            ax = np.asarray(data["partner_axoness"], np.int64).reshape(n, 2)
            a_axonal = np.isin(ax[:, 0], (1, 3, 4))
            b_axonal = np.isin(ax[:, 1], (1, 3, 4))
            a_dendritic = np.isin(ax[:, 0], (0, 2))
            b_dendritic = np.isin(ax[:, 1], (0, 2))
            sel &= (a_axonal & b_dendritic) | (b_axonal & a_dendritic)
        return {k: v[sel] for k, v in data.items()}

    def pull_so_attr(self, so_id: int, obj_type: str, attr_key: str):
        return self._get(f"/pull_so_attr/{so_id}/{obj_type}/{attr_key}")["value"]

    def push_so_attr(self, so_id: int, obj_type: str, attr_key: str, value) -> bool:
        return bool(
            self._post(f"/push_so_attr/{so_id}/{obj_type}/{attr_key}", {"value": value})["ok"]
        )

    # ----------------------------------------------- threaded mesh downloads
    def _download_worker(self):
        while True:
            try:
                item = self._down_queue.get(timeout=1.0)
            except Empty:
                continue
            if item is None:
                return
            ssv_id, obj_type = item
            try:
                mesh = self.ssv_mesh(ssv_id, obj_type)
            except Exception as e:  # pragma: no cover - network failure path
                mesh = {"error": str(e)}
            with self._results_lock:
                self._results[(int(ssv_id), obj_type)] = mesh
            self._down_queue.task_done()

    def add_ssv_obj_mesh_to_down_queue(self, ssv_id: int, obj_type: str = "sv"):
        """Enqueue a mesh download (reference :117)."""
        self._down_queue.put((int(ssv_id), obj_type))

    def wait_for_all_downloads(self):
        """Block until the queue drains (reference :103)."""
        self._down_queue.join()

    def get_ssv_obj_mesh_from_results_store(self, ssv_id: int, obj_type: str = "sv"):
        """Pop a finished download, or None when still pending (reference :127)."""
        with self._results_lock:
            return self._results.pop((int(ssv_id), obj_type), None)

    # --------------------------------------------------------- viewer export
    def export_scene_kzip(self, path: str, ssv_ids: List[int],
                          obj_types: Tuple[str, ...] = ("sv",),
                          with_skeletons: bool = True,
                          with_synapses: bool = True) -> str:
        """Write selected cells (+ their synapse table rows) into a
        ``.k.zip`` a KNOSSOS instance opens directly — the viewer-side
        capability of the reference plugin (:834 ``ssv_to_knossos``, :891
        ``ssv_skel_to_knossos_tree``) without a Qt embedding."""
        import os
        import zipfile

        from ..proc.meshes import _make_ply
        from ..skeleton.io import skeleton_to_nml

        files: Dict[str, bytes] = {}
        for ssv_id in ssv_ids:
            for ot in obj_types:
                m = self.ssv_mesh(ssv_id, ot)
                if len(m["vert"]) == 0:
                    continue
                files[f"mesh_{ssv_id}_{ot}.ply"] = _make_ply(
                    m["ind"], m["vert"], m["norm"]
                )
            if with_skeletons:
                sk = self.ssv_skeleton(ssv_id)
                if sk and len(sk.get("nodes", [])):
                    nml = skeleton_to_nml(sk, comment=f"ssv {ssv_id}")
                    files[f"skeleton_{ssv_id}.nml"] = nml.encode()
        if with_synapses:
            table = self.synapse_table()
            files["synapses.json"] = json.dumps(
                {k: np.asarray(v).tolist() for k, v in table.items()}
            ).encode()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for name, data in files.items():
                zf.writestr(name, data)
        return path
