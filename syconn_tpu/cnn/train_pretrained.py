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
    """IoU of the persisted dense models on a held-out world, each scored
    at its deployment mag (model meta ``mag``: raw mean-pooled, GT
    any-pooled — matching the KD pyramid and predict_* behavior)."""
    from .. import global_params
    from ..inference.dense import DenseTilePredictor
    from ..models.io import get_or_init_model, load_model_meta
    from ..models.unet3d import UNet3D, unet_variants

    cfg = global_params.config
    out = {}
    for task in tasks:
        def builder(t=task):
            return UNet3D(**unet_variants(t)), (1, 64, 64, 32, 1)

        mpath = getattr(cfg, f"mpath_{task}")
        model, params = get_or_init_model(mpath, builder)
        try:
            meta = load_model_meta(mpath)
        except FileNotFoundError:
            meta = {}
        mag = int(meta.get("mag", 1))
        # binary heads deploy at their calibrated probability threshold
        # (model meta, cnn/toy.calibrate_binary_threshold) — score the
        # exact deployment decision rule, not argmax
        bin_thr = meta.get("threshold")

        def _pool(a, f, how):
            s = (np.asarray(a.shape) // f) * f
            a = a[: s[0], : s[1], : s[2]]
            r = a.reshape(s[0] // f, f, s[1] // f, f, s[2] // f, f)
            return r.mean((1, 3, 5)).astype(np.uint8) if how == "mean" else r.max((1, 3, 5))

        raw = world["raw"] if mag == 1 else _pool(world["raw"], mag, "mean")
        tile = tuple(np.minimum((128, 128, 64), raw.shape))
        pred = DenseTilePredictor(
            model, params, tile_shape=tile, halo=(16, 16, 8), mode="probs",
        )
        probs = pred.predict_array(raw)
        if model.n_classes == 2 and bin_thr is not None:
            lab = (probs[..., 1] >= int(bin_thr)).astype(np.int64)
        else:
            lab = np.argmax(probs, axis=-1)
        if task == "organelles":
            gt = np.zeros(world["raw"].shape, np.int32)
            gt[world["mi"] > 0] = 1
            gt[world["vc"] > 0] = 2
            gt[world["sj"] > 0] = 3
            names = {1: "mi", 2: "vc", 3: "sj"}
        elif task in ("er", "golgi"):
            gt = (world[task] > 0).astype(np.int32)
            names = {1: task}
        else:
            gt = (world.get("myelin", np.zeros(world["raw"].shape)) > 0).astype(np.int32)
            names = {1: "myelin"}
            # the model's training target is the mag-pooled sheath DILATED
            # by 2 (cnn/toy.py: the deployment consumer probes skeleton
            # nodes, so the map is trained to cover stretch interiors);
            # score against the same target definition — the thin-sheath
            # IoU would penalize exactly the intended over-coverage.
            # Node-level deployment quality is QUALITY_*.json myelin recall.
        if mag != 1:
            gt = _pool(gt, mag, "any")
        if task == "myelin":
            from scipy import ndimage as _ndi

            from .toy import myelin_dilation

            gt = _ndi.binary_dilation(
                gt > 0, iterations=myelin_dilation(mag)).astype(np.int32)
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
    parser.add_argument("--pipeline_worlds", type=int, default=0,
                        help="process this many training worlds through the "
                             "FULL pipeline (subprocess, packaged dense "
                             "models) and train the point models on the "
                             "resulting reconstruction clouds — the "
                             "deployment distribution")
    parser.add_argument("--pipe_dir", type=str, default="",
                        help="cache dir for the pipeline-processed training "
                             "worlds (reused across runs)")
    parser.add_argument("--skip_dense", action="store_true",
                        help="keep the packaged dense models; train points only")
    parser.add_argument("--skip_pts", action="store_true",
                        help="keep the packaged point models; train dense only")
    parser.add_argument("--dense_tasks", type=str, nargs="+",
                        default=["organelles", "myelin", "syntype"],
                        help="which dense models to (re)train")
    parser.add_argument("--pts_tasks", type=str, nargs="+",
                        default=["celltype", "glia", "compartment", "spiness", "tnet"],
                        help="which point models to (re)train")
    parser.add_argument("--comp_npoints", type=int, default=0,
                        help="compartment semseg context points (0 = the "
                             "shared --npoints/2048 geometry)")
    parser.add_argument("--comp_ctx", type=float, default=0.0,
                        help="compartment semseg context size in nm (0 = "
                             "the shared 20000 nm geometry). World-scaled "
                             "contexts keep the axon/dendrite caliber cue "
                             "visible after coordinate normalization")
    parser.add_argument("--ct_npoints", type=int, default=1024,
                        help="hybrid celltype context points (0 disables the "
                             "hybrid head and trains the local-only model)")
    parser.add_argument("--ct_ctx", type=float, default=3200.0,
                        help="hybrid celltype context size in nm. The hybrid "
                             "head (point context + whole-cell morphology "
                             "scalars) only trains when --pipeline_worlds "
                             "provides reconstruction clouds; measured r4: "
                             "local-only 0.56 end-to-end vs hybrid 0.77")
    parser.add_argument("--myelin_mag", type=int, default=1,
                        help="deployment mag for the myelin model. The toy "
                             "world's sheaths are 2-3 mag-1 voxels thin — "
                             "mag 4 (the reference's choice on real 10nm EM) "
                             "under-resolves them; examples/start.py reads "
                             "the trained mag from the model meta")
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

    dense_acc, iou = {}, {}
    if not args.skip_dense:
        print("=== dense training ===", flush=True)
        dense_acc = train_toy_dense_models(
            worlds, steps=args.steps_dense,
            tasks=tuple(args.dense_tasks),
            variant_overrides={"organelles": dict(
                features=(32, 64), strides=((2, 2, 2),), patch=(2, 2, 2))},
            task_mags={"myelin": args.myelin_mag},
            log_cb=lambda m: print(m, flush=True),
        )
        print("dense train metrics:", dense_acc, flush=True)
        iou = dense_heldout_iou(held, tasks=tuple(
            t for t in args.dense_tasks
            if t in ("organelles", "myelin", "er", "golgi")))
        print("dense held-out IoU:", iou, flush=True)

    extra = None
    if args.pipeline_worlds:
        # reconstruction clouds in the deployment distribution: run the
        # full pipeline (with the PACKAGED dense models) on training seeds
        # and harvest mesh-vertex clouds + GT labels from the results
        from ..utils.quality_metrics import run_quality_pipeline
        from .toy_points import pipeline_cloud_pools

        pdir = args.pipe_dir or os.path.join(wd, "pipe_worlds")
        os.makedirs(pdir, exist_ok=True)
        comp_geom = ((args.comp_npoints, args.comp_ctx)
                     if args.comp_npoints and args.comp_ctx else None)
        ct_geom = ((args.ct_npoints, args.ct_ctx)
                   if args.ct_npoints and args.ct_ctx else None)
        ep_all, esp_all, esps_all, espg_all = [], [], [], []
        ecomp_all, ect_all = [], []
        for s in seeds[: args.pipeline_worlds]:
            pwd = os.path.join(pdir, f"seed{s}")
            if not os.path.exists(os.path.join(pwd, "neuron_gt.npz")):
                t1 = time.time()
                run_quality_pipeline(pwd, s, shape=tuple(args.shape),
                                     n_cells=args.n_cells)
                print(f"pipeline world seed {s}: {time.time() - t1:.0f}s",
                      flush=True)
            got = pipeline_cloud_pools(pwd, seed=s, comp_geom=comp_geom,
                                       ct_geom=ct_geom)
            ep, esp, esps, espg = got[:4]
            ep_all.extend(ep)
            esp_all.extend(esp)
            esps_all.extend(esps)
            espg_all.extend(espg)
            if comp_geom is not None or ct_geom is not None:
                ecomp_all.extend(got[4])
            if ct_geom is not None:
                ect_all.extend(got[5])
            print(f"pipeline world seed {s}: {len(ep)} cells harvested "
                  f"({len(esps)} spine-centered spiness pools)", flush=True)
        extra = (ep_all, esp_all, esps_all, espg_all, ecomp_all, ect_all)
        global_params.wd = wd  # pipeline_cloud_pools restores, but be sure
        global_params.config._parse_config()

    pts_acc, ev = {}, {}
    if not args.skip_pts:
        print("=== point training ===", flush=True)
        pts_acc = train_toy_point_models(
            worlds, steps=args.steps_pts,
            tasks=tuple(args.pts_tasks),
            log_cb=lambda m: print(m, flush=True),
            extra_pools=extra,
            comp_geom=((args.comp_npoints, args.comp_ctx)
                       if args.comp_npoints and args.comp_ctx else None),
            ct_geom=((args.ct_npoints, args.ct_ctx)
                     if args.pipeline_worlds and args.ct_npoints and args.ct_ctx
                     else None),
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
            "er": cfg.mpath_er,
            "golgi": cfg.mpath_golgi,
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
