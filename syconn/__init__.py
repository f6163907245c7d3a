"""Compatibility alias package: reference-style imports.

``import syconn...`` paths map onto :mod:`syconn_tpu` so code written
against the reference's import surface (e.g. ``from syconn import
global_params``; ``from syconn.reps.segmentation import
SegmentationDataset``) runs on this framework unchanged. The ``syconn.mp``
namespace maps to the in-process executor (``syconn_tpu.parallel``).
"""

import sys as _sys

import syconn_tpu as _impl
from syconn_tpu import global_params  # noqa: F401

_ALIASES = {
    "syconn.handler": "syconn_tpu.handler",
    "syconn.handler.config": "syconn_tpu.handler.config",
    "syconn.handler.basics": "syconn_tpu.handler.basics",
    "syconn.handler.compression": "syconn_tpu.handler.compression",
    "syconn.handler.prediction": "syconn_tpu.handler.prediction",
    "syconn.handler.prediction_pts": "syconn_tpu.inference.points",
    "syconn.handler.multiviews": "syconn_tpu.handler.multiviews",
    "syconn.handler.training": "syconn_tpu.handler.training",
    "syconn.backend": "syconn_tpu.backend",
    "syconn.backend.base": "syconn_tpu.backend.base",
    "syconn.backend.storage": "syconn_tpu.backend",
    "syconn.reps": "syconn_tpu.reps",
    "syconn.reps.segmentation": "syconn_tpu.reps.segmentation",
    "syconn.reps.super_segmentation": "syconn_tpu.reps.super_segmentation",
    "syconn.reps.super_segmentation_object": "syconn_tpu.reps.super_segmentation",
    "syconn.reps.super_segmentation_dataset": "syconn_tpu.reps.super_segmentation",
    "syconn.reps.super_segmentation_helper": "syconn_tpu.reps.super_segmentation_helper",
    "syconn.reps.rep_helper": "syconn_tpu.reps.rep_helper",
    "syconn.reps.connectivity_helper": "syconn_tpu.reps.connectivity_helper",
    "syconn.reps.views": "syconn_tpu.reps.views",
    "syconn.proc": "syconn_tpu.proc",
    "syconn.proc.sd_proc": "syconn_tpu.proc.sd_proc",
    "syconn.proc.ssd_proc": "syconn_tpu.proc.ssd_proc",
    "syconn.proc.meshes": "syconn_tpu.proc.meshes",
    "syconn.proc.graphs": "syconn_tpu.proc.graphs",
    "syconn.proc.image": "syconn_tpu.proc.image",
    "syconn.proc.skeleton": "syconn_tpu.proc.skeleton",
    "syconn.proc.stats": "syconn_tpu.proc.stats",
    "syconn.proc.glia_splitting": "syconn_tpu.proc.glia_splitting",
    "syconn.proc.ssd_assembly": "syconn_tpu.proc.ssd_assembly",
    "syconn.proc.rendering": "syconn_tpu.render.views",
    "syconn.extraction": "syconn_tpu.extraction",
    "syconn.extraction.object_extraction_wrapper": "syconn_tpu.extraction.object_extraction",
    "syconn.extraction.object_extraction_steps": "syconn_tpu.extraction.object_extraction",
    "syconn.extraction.cs_extraction_steps": "syconn_tpu.extraction.cs_extraction",
    "syconn.extraction.cs_processing_steps": "syconn_tpu.extraction.cs_processing",
    "syconn.extraction.find_object_properties": "syconn_tpu.ops.contacts",
    "syconn.exec": "syconn_tpu.exec",
    "syconn.exec.exec_init": "syconn_tpu.exec.exec_init",
    "syconn.exec.exec_dense_prediction": "syconn_tpu.exec.exec_dense_prediction",
    "syconn.exec.exec_inference": "syconn_tpu.exec.exec_inference",
    "syconn.exec.exec_skeleton": "syconn_tpu.exec.exec_skeleton",
    "syconn.exec.exec_syns": "syconn_tpu.exec.exec_syns",
    "syconn.exec.exec_render": "syconn_tpu.exec.exec_render",
    "syconn.exec.exec_analysis_prep": "syconn_tpu.exec.exec_analysis_prep",
    "syconn.mp": "syconn_tpu.parallel",
    "syconn.mp.mp_utils": "syconn_tpu.parallel.executor",
    "syconn.mp.batchjob_utils": "syconn_tpu.parallel.executor",
    "syconn.analysis": "syconn_tpu.analysis",
    "syconn.analysis.server": "syconn_tpu.analysis.server",
    "syconn.analysis.bio_interface": "syconn_tpu.analysis.bio_interface",
    "syconn.cnn": "syconn_tpu.cnn",
    "syconn.global_params": "syconn_tpu.global_params",
}

import importlib as _importlib

for _alias, _target in _ALIASES.items():
    try:
        _sys.modules[_alias] = _importlib.import_module(_target)
    except Exception:  # pragma: no cover - optional heavy deps
        pass

__version__ = _impl.__version__
