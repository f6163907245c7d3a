"""Pipeline timing and model-performance helpers.

Reference parity: syconn/proc/stats.py:582 (``FileTimer``) — named wall-clock
step timings persisted to ``<wd>/.timing.pkl``, with dataset-volume
normalization and a human-readable report.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from ..handler.basics import load_pkl2obj, write_obj2pkl


class FileTimer:
    """Named step timer persisted to a pickle file.

    Usage::

        ftimer = FileTimer(wd + '/.timing.pkl')
        ftimer.start('Preparation')
        ...
        ftimer.stop()
    """

    def __init__(self, path: str, overwrite: bool = False, add_detail_vols: bool = False):
        if os.path.isdir(path):
            path = os.path.join(path, ".timing.pkl")
        self.path = path
        self.timings: Dict[str, float] = {}
        self._start_t: Optional[float] = None
        self._cur_name: Optional[str] = None
        self.dataset_shape = None
        self.dataset_scale = None
        if not overwrite and os.path.isfile(path):
            try:
                stored = load_pkl2obj(path)
                self.timings = stored.get("timings", {})
                self.dataset_shape = stored.get("dataset_shape")
                self.dataset_scale = stored.get("dataset_scale")
            except Exception:
                pass

    def start(self, name: str):
        if self._cur_name is not None:
            raise RuntimeError(f"Timer '{self._cur_name}' still running.")
        self._cur_name = name
        self._start_t = time.perf_counter()

    def stop(self):
        if self._cur_name is None:
            raise RuntimeError("No timer running.")
        dt = time.perf_counter() - self._start_t
        self.timings[self._cur_name] = self.timings.get(self._cur_name, 0.0) + dt
        self._cur_name = None
        self._start_t = None
        self._save()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._cur_name is not None:
            self.stop()

    def _save(self):
        write_obj2pkl(
            self.path,
            {
                "timings": self.timings,
                "dataset_shape": self.dataset_shape,
                "dataset_scale": self.dataset_scale,
            },
        )

    # ------------------------------------------------------------- reporting
    @property
    def dataset_nvoxels(self) -> Optional[float]:
        if self.dataset_shape is None:
            return None
        return float(np.prod(np.array(self.dataset_shape, dtype=np.float64))) / 1e9

    @property
    def dataset_mm3(self) -> Optional[float]:
        if self.dataset_shape is None or self.dataset_scale is None:
            return None
        vx_nm3 = float(np.prod(np.array(self.dataset_scale, dtype=np.float64)))
        return self.dataset_nvoxels * 1e9 * vx_nm3 / 1e18

    def prepare_report(self) -> str:
        total = sum(self.timings.values())
        lines = [f"Total wall-clock: {total:.1f} s"]
        if self.dataset_nvoxels:
            lines[0] += f" ({self.dataset_nvoxels:.3f} GVx)"
        for name, dt in self.timings.items():
            frac = 100.0 * dt / total if total else 0.0
            lines.append(f"  [{name}] {dt:.1f} s ({frac:.1f}%)")
        return "\n".join(lines)


def model_performance(
    probas: np.ndarray,
    labels: np.ndarray,
    model_dir: Optional[str] = None,
    prefix: str = "",
    n_labels: Optional[int] = None,
) -> str:
    """Classification report (+ confusion matrix) for model evaluation
    (reference: proc/stats.py ``model_performance``)."""
    from sklearn.metrics import classification_report, confusion_matrix

    probas = np.asarray(probas)
    preds = probas.argmax(axis=1) if probas.ndim == 2 else probas
    rep = classification_report(labels, preds, zero_division=0)
    cm = confusion_matrix(labels, preds)
    text = f"{prefix}\n{rep}\nconfusion matrix:\n{cm}\n"
    if model_dir is not None:
        import os

        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(model_dir, f"{prefix or 'model'}_performance.txt"), "w") as f:
            f.write(text)
    return text
