"""Dense prediction orchestration — user-facing pipeline step 1.

Reference parity: syconn/exec/exec_dense_prediction.py (``predict_myelin``
:12, ``predict_synapsetype`` :57, ``predict_cellorganelles`` :79,
``predict_er`` :105, ``predict_golgi`` :129). Each function loads (or, if
absent, seeds) the task's model from the working directory's model dir and
runs the tiled TPU inference over the dataset, writing probability maps
into the chunked-volume layout the extraction steps consume.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .. import global_params
from ..handler.config import initialize_logging
from ..inference.dense import predict_dense_to_kd
from ..models.io import get_or_init_model
from ..models.unet3d import UNet3D, unet_variants


def _load_unet(mpath: str, variant: str):
    def builder():
        kw = unet_variants(variant)
        return UNet3D(**kw), (1, 64, 64, 32, 1)

    return get_or_init_model(mpath, builder)


def _tile_params(mag: int, tile_shape=None, halo=None):
    cfg = global_params.config
    if tile_shape is None:
        tile_shape = tuple(cfg["tpu"]["chunk_shape"])
    if halo is None:
        halo = (32, 32, 16)
    # shrink tiles for small (example/test) volumes, but snap to power-of-two
    # buckets: every distinct tile shape costs a full XLA compile, so shapes
    # must repeat across datasets/mags
    from ..handler.basics import kd_factory

    kd = kd_factory(cfg.kd_seg_path) if os.path.isdir(cfg.kd_seg_path) else None
    if kd is not None:
        import numpy as _np

        sh = kd.mag_shape(mag)

        def bucket(t, s):
            b = 1 << max(5, int(_np.floor(_np.log2(max(int(s), 32)))))  # >= 32
            return int(min(t, b))

        tile_shape = tuple(bucket(t, s) for t, s in zip(tile_shape, sh))
    return tile_shape, halo


def predict_myelin(mag: Optional[int] = None, tile_shape=None, halo=None):
    """Myelin probability map at ``mag`` (reference: exec_dense_prediction.py:12).

    ``mag=None`` reads the deployment mag from the model meta (the packaged
    toy-world model trains at mag 2 — its sheaths are 2-3 mag-1 voxels thin;
    the reference's mag 4 is calibrated for real 10nm EM) and falls back to
    the reference's 4."""
    log = initialize_logging("dense_prediction")
    cfg = global_params.config
    from ..models.io import load_model_meta

    meta = load_model_meta(cfg.mpath_myelin)
    if mag is None:
        mag = int(meta.get("mag", 4))
    model, params = _load_unet(cfg.mpath_myelin, "myelin")
    tile_shape, halo = _tile_params(mag, tile_shape, halo)
    # binary head with a calibrated threshold: threshold ON DEVICE and
    # read back bit-packed masks — 16x less downlink than the uint8 prob
    # map (at 0.726 GVx the prob readback alone was 176 s over the
    # relay); the store then holds 0/255, which every prob-threshold
    # consumer (map_myelin2coords) reads identically
    thr = meta.get("threshold")
    mode = "probs" if thr is None else "masks"
    thresholds = None
    if thr is not None:
        thresholds = [0.5] * model.n_classes
        thresholds[1] = float(thr) / 255.0
    stats = predict_dense_to_kd(
        cfg.kd_seg_path,
        target_paths={"myelin": cfg.kd_myelin_path},
        model=model,
        params=params,
        channel_mapping={"myelin": 1},
        mag=mag,
        tile_shape=tile_shape,
        halo=halo,
        target_mags=(1,),
        mode=mode,
        thresholds=thresholds,
    )
    log.info("predict_myelin: %.1f MVx/s", stats["mvox_per_s"])
    return stats


def predict_synapsetype(mag: int = 1, tile_shape=None, halo=None):
    """Symmetric/asymmetric synapse-type maps
    (reference: exec_dense_prediction.py:57). Writes kd_sym/kd_asym."""
    log = initialize_logging("dense_prediction")
    cfg = global_params.config
    model, params = _load_unet(cfg.mpath_syntype, "syntype")
    tile_shape, halo = _tile_params(mag, tile_shape, halo)
    stats = predict_dense_to_kd(
        cfg.kd_seg_path,
        target_paths={"asym": cfg.kd_asym_path, "sym": cfg.kd_sym_path},
        model=model,
        params=params,
        channel_mapping={"asym": 1, "sym": 2},
        mag=mag,
        tile_shape=tile_shape,
        halo=halo,
        target_mags=(1, 2),
    )
    log.info("predict_synapsetype: %.1f MVx/s", stats["mvox_per_s"])
    return stats


def predict_cellorganelles(mag: int = 1, tile_shape=None, halo=None):
    """Organelle probability maps (mi/vc/sj)
    (reference: exec_dense_prediction.py:79)."""
    log = initialize_logging("dense_prediction")
    cfg = global_params.config
    model, params = _load_unet(cfg.mpath_organelles, "organelles")
    tile_shape, halo = _tile_params(mag, tile_shape, halo)
    stats = predict_dense_to_kd(
        cfg.kd_seg_path,
        target_paths={
            "mi": cfg.kd_mi_path,
            "vc": cfg.kd_vc_path,
            "sj": cfg.kd_sj_path,
        },
        model=model,
        params=params,
        channel_mapping={"mi": 1, "vc": 2, "sj": 3},
        mag=mag,
        tile_shape=tile_shape,
        halo=halo,
        target_mags=(1, 2),
    )
    log.info("predict_cellorganelles: %.1f MVx/s", stats["mvox_per_s"])
    return stats


def predict_er(mag: int = 1, **kw):
    """(reference: exec_dense_prediction.py:105)"""
    cfg = global_params.config
    model, params = _load_unet(cfg.mpath_er, "er")
    tile_shape, halo = _tile_params(mag)
    return predict_dense_to_kd(
        cfg.kd_seg_path,
        target_paths={"er": cfg.kd_er_path},
        model=model, params=params, channel_mapping={"er": 1},
        mag=mag, tile_shape=tile_shape, halo=halo, target_mags=(1, 2),
    )


def predict_golgi(mag: int = 1, **kw):
    """(reference: exec_dense_prediction.py:129)"""
    cfg = global_params.config
    model, params = _load_unet(cfg.mpath_golgi, "golgi")
    tile_shape, halo = _tile_params(mag)
    return predict_dense_to_kd(
        cfg.kd_seg_path,
        target_paths={"golgi": cfg.kd_golgi_path},
        model=model, params=params, channel_mapping={"golgi": 1},
        mag=mag, tile_shape=tile_shape, halo=halo, target_mags=(1, 2),
    )
