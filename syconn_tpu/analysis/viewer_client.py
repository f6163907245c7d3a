"""REST client for viewers (KNOSSOS-plugin analog).

Reference parity: syconn/analysis/syconn_knossos_viewer.py — the PythonQt
KNOSSOS plugin's ``SyConnGateInteraction`` REST client (mesh streaming,
synapse/celltype tables). This client is UI-framework free; a viewer embeds
it and renders the returned arrays.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Dict, List, Optional

import numpy as np

__all__ = ["SyConnClient"]


class SyConnClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 10001, timeout: float = 30.0):
        self.base = f"http://{host}:{port}"
        self.timeout = timeout

    def _get(self, route: str) -> dict:
        with urllib.request.urlopen(self.base + route, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _post(self, route: str, payload: dict) -> dict:
        data = json.dumps(payload).encode()
        req = urllib.request.Request(
            self.base + route, data=data, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    # ------------------------------------------------------------- queries
    def ssv_list(self) -> List[int]:
        return [int(i) for i in self._get("/ssv_list")["ssvs"]]

    def ssv_mesh(self, ssv_id: int, obj_type: str = "sv") -> Dict[str, np.ndarray]:
        m = self._get(f"/ssv_obj_mesh/{ssv_id}/{obj_type}")
        return {
            "ind": np.asarray(m["ind"], np.int64),
            "vert": np.asarray(m["vert"], np.float32),
            "norm": np.asarray(m.get("norm", []), np.float32),
        }

    def ssv_skeleton(self, ssv_id: int) -> Dict[str, np.ndarray]:
        sk = self._get(f"/ssv_skeleton/{ssv_id}")
        return {k: np.asarray(v) for k, v in sk.items()}

    def svs_of_ssv(self, ssv_id: int) -> np.ndarray:
        return np.asarray(self._get(f"/svs_of_ssv/{ssv_id}")["svs"], np.uint64)

    def ssv_of_sv(self, sv_id: int) -> Optional[int]:
        v = self._get(f"/ssv_of_sv/{sv_id}")["ssv"]
        return int(v) if v is not None else None

    def celltype_of_ssv(self, ssv_id: int) -> dict:
        return self._get(f"/ct_of_ssv/{ssv_id}")

    def synapse_table(self) -> Dict[str, np.ndarray]:
        data = self._get("/all_syn_meta")
        return {k: np.asarray(v) for k, v in data.items()}

    def pull_so_attr(self, so_id: int, obj_type: str, attr_key: str):
        return self._get(f"/pull_so_attr/{so_id}/{obj_type}/{attr_key}")["value"]

    def push_so_attr(self, so_id: int, obj_type: str, attr_key: str, value) -> bool:
        return bool(
            self._post(f"/push_so_attr/{so_id}/{obj_type}/{attr_key}", {"value": value})["ok"]
        )
