"""Train -> deploy loop: models trained on the toy ground truth drive the
extraction pipeline to reproduce known objects.

CPU-budget note: 400 steps of the small U-Net underfit (high precision, low
recall); the assertions check that the learning signal reaches extraction
(all detected objects are real), not segmentation quality. The example
pipeline's ``--train_models`` path trains full-size models on the TPU."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.mark.slow
def test_trained_organelle_pipeline(working_dir):
    from syconn_tpu import global_params
    from syconn_tpu.cnn.toy import train_toy_dense_models
    from syconn_tpu.handler.basics import clear_kd_cache
    from syconn_tpu.handler.config import generate_default_conf
    from syconn_tpu.exec.exec_dense_prediction import predict_cellorganelles
    from syconn_tpu.extraction.object_extraction import generate_subcell_kd_from_proba
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.utils.testdata import generate_toy_world
    from scipy import ndimage

    clear_kd_cache()
    generate_default_conf(
        working_dir, scaling=(10, 10, 20),
        key_value_pairs=[
            ("cell_objects", {
                "extract_morph_op": {"mi": ["binary_closing"], "vc": ["binary_closing"], "sj": []},
                "min_obj_vx": {"mi": 100, "vc": 50, "sj": 20},
            }),
        ],
        force_overwrite=True,
    )
    global_params.config._parse_config()
    cfg = global_params.config

    world = generate_toy_world(shape=(96, 96, 48), n_cells=3, seed=11)
    kd = ChunkedVolume.create(cfg.kd_seg_path, scale=(10, 10, 20),
                              boundary=world["seg"].shape, chunk_shape=(96, 96, 48))
    kd.save_raw(world["raw"])
    kd.save_seg(world["seg"])

    train_toy_dense_models(
        world, steps=400, tile=(64, 64, 32), tasks=("organelles",),
        # small variant: CPU-affordable test; the loaded-arch path is the same
        variant_overrides={"organelles": dict(features=(32, 64), strides=((2, 2, 2),))},
    )

    # trained model -> probability maps -> instance extraction
    predict_cellorganelles(mag=1, tile_shape=(96, 96, 48), halo=(16, 16, 8))
    stats = generate_subcell_kd_from_proba("mi", chunk_size=(96, 96, 48))
    got = stats["n_objects"]
    assert got > 0, "trained model produced no mitochondria"
    # objects above the size threshold (sub-min_obj_vx specks are dropped by
    # the downstream dataset filter) must overlap ground truth
    seg = ChunkedVolume.open(cfg.kd_organelle_seg_paths["mi"]).load_seg(size=world["mi"].shape)
    gt = world["mi"] > 0
    min_vx = int(cfg["cell_objects"]["min_obj_vx"]["mi"])
    ids, counts = np.unique(seg[seg > 0], return_counts=True)
    big = ids[counts >= min_vx]
    assert len(big) > 0, "no above-threshold detections"
    precisions = [
        float(((seg == oid) & gt).sum() / (seg == oid).sum()) for oid in big[:20]
    ]
    frac_real = float(np.mean([p > 0.5 for p in precisions]))
    assert frac_real >= 0.6, (
        f"most above-threshold detections must be real mitochondria "
        f"(got {frac_real:.2f} of {len(precisions)}; precisions {precisions})"
    )
    recall = (gt & (seg > 0)).sum() / gt.sum()
    assert recall > 0.03, f"no learning signal reached extraction: {recall:.3f}"
