"""Regenerate the packaged pretrained weights on neuron-morphology worlds.

The quality suite (tests/test_quality.py) scores pipeline outputs against
construction ground truth on held-out worlds; this driver trains all 8
task models (dense: organelles/myelin/syntype; points: celltype/glia/
compartment/spiness/tnet) on a pool of training worlds, reports held-out
metrics, and copies the weights into ``syconn_tpu/models/pretrained/``.

Reference analog: the 22 elektronn3 training scripts (syconn/cnn/cnn_*.py)
plus the published model zoo; here one driver + jitted optax loops
(models/train.py) on the TPU.

Usage:
    python -m syconn_tpu.cnn.train_pretrained \
        --n_worlds 8 --steps_dense 1600 --steps_pts 3200 --package
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import numpy as np

# the quality suite's held-out seeds — never train on them
HELD_OUT_SEEDS = (777, 1901, 2718)


def dense_heldout_iou(world, tasks=("organelles",)) -> dict:
    """IoU of the persisted dense models on a held-out world."""
    from .. import global_params
    from ..inference.dense import DenseTilePredictor
    from ..models.io import get_or_init_model
    from ..models.unet3d import UNet3D, unet_variants

    cfg = global_params.config
    out = {}
    for task in tasks:
        def builder(t=task):
            return UNet3D(**unet_variants(t)), (1, 64, 64, 32, 1)

        model, params = get_or_init_model(getattr(cfg, f"mpath_{task}"), builder)
        pred = DenseTilePredictor(
            model, params, tile_shape=(128, 128, 64), halo=(16, 16, 8),
            mode="probs",
        )
        probs = pred.predict_array(world["raw"])
        lab = np.argmax(probs, axis=-1)
        if task == "organelles":
            gt = np.zeros(world["raw"].shape, np.int32)
            gt[world["mi"] > 0] = 1
            gt[world["vc"] > 0] = 2
            gt[world["sj"] > 0] = 3
            names = {1: "mi", 2: "vc", 3: "sj"}
        else:
            gt = (world.get("myelin", np.zeros_like(lab)) > 0).astype(np.int32)
            names = {1: "myelin"}
        for c, nm in names.items():
            inter = int(((lab == c) & (gt == c)).sum())
            union = int(((lab == c) | (gt == c)).sum())
            out[f"{task}_{nm}_iou"] = inter / max(union, 1)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_worlds", type=int, default=8)
    parser.add_argument("--shape", type=int, nargs=3, default=[160, 160, 80])
    parser.add_argument("--n_cells", type=int, default=8)
    parser.add_argument("--steps_dense", type=int, default=1600)
    parser.add_argument("--steps_pts", type=int, default=3200)
    parser.add_argument("--eval_seed", type=int, default=555)
    parser.add_argument("--wd", type=str, default="")
    parser.add_argument("--package", action="store_true",
                        help="copy the trained weights into "
                             "syconn_tpu/models/pretrained/")
    args = parser.parse_args()

    from .. import global_params
    from ..handler.config import generate_default_conf
    from ..utils.testdata_neuro import generate_neuron_world
    from .toy import train_toy_dense_models
    from .toy_points import eval_toy_point_models, train_toy_point_models

    wd = args.wd or tempfile.mkdtemp(prefix="syconn_train_wd_")
    generate_default_conf(wd, scaling=(10, 10, 20), force_overwrite=True)
    global_params.wd = wd
    cfg = global_params.config

    t0 = time.time()
    seeds = [s for s in range(1000) if s not in HELD_OUT_SEEDS][: args.n_worlds]
    worlds = []
    for s in seeds:
        worlds.append(generate_neuron_world(
            shape=tuple(args.shape), n_cells=args.n_cells, seed=s))
        print(f"world seed {s} generated ({time.time() - t0:.0f}s)", flush=True)
    held = generate_neuron_world(
        shape=tuple(args.shape), n_cells=args.n_cells, seed=args.eval_seed)

    print("=== dense training ===", flush=True)
    dense_acc = train_toy_dense_models(
        worlds, steps=args.steps_dense,
        tasks=("organelles", "myelin", "syntype"),
        variant_overrides={"organelles": dict(
            features=(32, 64), strides=((2, 2, 2),), patch=(2, 2, 2))},
        log_cb=lambda m: print(m, flush=True),
    )
    print("dense train metrics:", dense_acc, flush=True)
    iou = dense_heldout_iou(held)
    print("dense held-out IoU:", iou, flush=True)

    print("=== point training ===", flush=True)
    pts_acc = train_toy_point_models(
        worlds, steps=args.steps_pts,
        log_cb=lambda m: print(m, flush=True),
    )
    print("point train metrics:", pts_acc, flush=True)
    ev = eval_toy_point_models(held)
    print("point held-out metrics:", ev, flush=True)

    report = {"dense_train": dense_acc, "dense_heldout_iou": iou,
              "pts_train": pts_acc, "pts_heldout": ev,
              "n_worlds": args.n_worlds, "steps_dense": args.steps_dense,
              "steps_pts": args.steps_pts, "seconds": time.time() - t0}
    with open(os.path.join(wd, "train_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)

    if args.package:
        from ..models.io import packaged_model_path

        name_map = {
            "organelles": cfg.mpath_organelles,
            "myelin": cfg.mpath_myelin,
            "syntype": cfg.mpath_syntype,
            "celltype_pts": cfg.mpath_celltype_pts,
            "glia_pts": cfg.mpath_glia_pts,
            "compartment_pts": cfg.mpath_compartment_pts,
            "spiness": cfg.mpath_spiness,
            "tnet_pts": cfg.mpath_tnet_pts,
        }
        for name, src in name_map.items():
            dst = packaged_model_path(name)
            if not os.path.isdir(src):
                print(f"WARNING: no trained weights at {src}", flush=True)
                continue
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            shutil.copytree(src, dst)
            print(f"packaged {name} -> {dst}", flush=True)


if __name__ == "__main__":
    main()
