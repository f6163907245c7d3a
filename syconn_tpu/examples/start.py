"""Full-pipeline example driver (reference shape: examples/start.py).

Runs every stage on a synthetic EM cube (generated on the fly when no data
directory is given): dense predictions -> object extraction -> cell
assembly -> skeletons -> synapses -> compartments -> embeddings -> celltype
-> connectivity-matrix export. Timings are recorded per step (FileTimer)
exactly like the reference's published benchmark
(docs/instructions.rst:87-112).
"""

import argparse
import os
import sys

import numpy as np

from syconn_tpu import global_params
from syconn_tpu.handler.config import generate_default_conf, initialize_logging
from syconn_tpu.proc.stats import FileTimer


def _write_timing_json(wd, args, ftimer):
    """Committed-receipt artifact: per-step seconds as JSON next to the pkl.

    Reruns of a prepared working dir (prep with --until_step 0, pipeline
    later without --overwrite) merge into the existing artifact so the
    'Preparation' row from the prep invocation survives.
    """
    import json as _json

    path = os.path.join(wd, "timing.json")
    steps = {}
    if os.path.isfile(path):
        try:
            with open(path) as f:
                steps = _json.load(f).get("steps_s", {})
        except Exception:
            steps = {}
    steps.update({k: round(float(v), 2) for k, v in ftimer.timings.items()})
    with open(path, "w") as f:
        _json.dump({
            "shape": list(args.shape),
            "n_cells": args.n_cells,
            "world": args.world,
            "gvx": float(np.prod(args.shape)) / 1e9,
            "steps_s": steps,
        }, f, indent=1)


def main():
    parser = argparse.ArgumentParser(description="syconn_tpu example run")
    parser.add_argument("--working_dir", type=str, default="")
    parser.add_argument("--shape", type=int, nargs=3, default=[256, 256, 128],
                        help="synthetic cube shape (x y z)")
    parser.add_argument("--n_cells", type=int, default=6)
    parser.add_argument("--log_level", type=str, default="INFO")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--prior_astrocyte_removal", action="store_true")
    parser.add_argument("--run_server", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--chunk_size", type=int, nargs=3, default=[128, 128, 64],
                        help="extraction/skeleton chunk shape; larger chunks "
                             "amortize per-chunk host work at GVx scale")
    parser.add_argument("--train_models", action="store_true",
                        help="train the dense models on the toy ground truth "
                             "before running inference (train->deploy loop)")
    parser.add_argument("--train_steps", type=int, default=800)
    parser.add_argument("--use_views", action="store_true",
                        help="use the multi-view (rendered 2D projections) "
                             "models instead of point-cloud models for "
                             "compartments/celltype/embeddings")
    parser.add_argument("--organelles", type=str, default="mi,vc",
                        help="comma-separated cell organelles to process "
                             "(subset of mi,vc,er,golgi; sj is always used "
                             "for synapses)")
    parser.add_argument("--world", type=str, default="voronoi",
                        choices=("voronoi", "neuron"),
                        help="synthetic world flavor: 'voronoi' (dense cell "
                             "packing, throughput benchmarks) or 'neuron' "
                             "(tubular morphology with celltype/compartment/"
                             "spine/myelin ground truth for quality checks)")
    parser.add_argument("--predict_organelles", action="store_true",
                        help="produce the mi/vc/sj probability maps by dense "
                             "model inference on the raw volume (packaged or "
                             "working-dir weights) instead of copying the "
                             "generator's ground-truth maps")
    parser.add_argument("--kv", type=str, action="append", default=[],
                        help="extra config override 'section.key=value' "
                             "(repeatable; value parsed as YAML). E.g. "
                             "physical parameters that must follow the "
                             "dataset's scale: --kv compartments."
                             "dist_axoness_averaging=500 on a toy-extent "
                             "world (reference default 10000 nm assumes "
                             "mm-scale neurites)")
    parser.add_argument("--until_step", type=int, default=99,
                        help="stop after this pipeline step (0 = data "
                             "preparation only, 6 = synapse detection). "
                             "Training-world generation for the point "
                             "models only needs geometry + syn_ssv, not "
                             "the inference steps 7-9")
    parser.add_argument("--shard_pipeline", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="run the hot pipeline steps sharded over ALL "
                             "attached devices (object extraction, contact "
                             "detection and property scans over an 'sp' mesh "
                             "axis with ICI halo exchange; dense inference "
                             "batch-sharded over 'data'). Default: on "
                             "whenever >1 device is attached; "
                             "--no-shard_pipeline forces serial")
    args = parser.parse_args()

    organelles = [o.strip() for o in args.organelles.split(",") if o.strip()]
    assert set(organelles) <= {"mi", "vc", "er", "golgi"}, organelles

    # a wedged device relay hangs the first in-process jax call forever,
    # and a relay whose DOWNLINK wedges mid-transfer (observed 0.1 MB/s
    # with a live control plane) would block the first step that reads
    # predictions back. Probe both in a subprocess with hard deadlines and
    # pin the whole run to the CPU backend when the device cannot deliver
    # results (utils/linkprobe.py, utils/jaxcfg.gate_platform_on_link).
    from syconn_tpu.utils.jaxcfg import gate_platform_on_link

    _plat, _pinned = gate_platform_on_link(return_pinned=True)
    if _pinned:
        print("WARNING: accelerator link down or unusable - forcing CPU")
    wd = args.working_dir or os.path.expanduser("~/syconn_tpu_example/")
    scale = np.array([10, 10, 20])
    chunk_size = tuple(int(c) for c in args.chunk_size)

    generate_default_conf(
        wd,
        scale,
        key_value_pairs=[
            ("glia", {"prior_astrocyte_removal": args.prior_astrocyte_removal}),
            ("use_point_models", not args.use_views),
            ("syntype_avail", True),
            ("min_cc_size_ssv", 500),
            ("log_level", 20 if args.log_level == "INFO" else 10),
            ("process_cell_organelles", organelles),
            ("cell_objects", {
                # per-key config fallback is top-level: nested dicts replace
                # the defaults wholesale, so every enabled organelle needs
                # its entries here. The neuron-morphology world builds
                # organelles at realistic-to-its-tube-calibers sizes
                # (~30-80 voxels), far below the dense Voronoi world's
                # blobs — thresholds must follow or every mi/vc is
                # size-filtered away and the celltype point clouds lose
                # their organelle channels entirely.
                "extract_morph_op": {"mi": ["binary_closing"], "vc": ["binary_closing"], "sj": [],
                                     "er": ["binary_closing"], "golgi": ["binary_closing"]},
                "min_obj_vx": ({"mi": 20, "vc": 10, "sj": 10, "er": 20, "golgi": 20,
                                "sv": 1, "cs": 10, "syn": 10, "syn_ssv": 20}
                               if args.world == "neuron" else
                               {"mi": 200, "vc": 100, "sj": 30, "er": 100, "golgi": 100,
                                "sv": 1, "cs": 10, "syn": 10, "syn_ssv": 20}),
                "sizethresholds": ({"mi": 20, "vc": 10, "sj": 10, "er": 20, "golgi": 20}
                                   if args.world == "neuron" else
                                   {"mi": 200, "vc": 100, "sj": 30, "er": 100, "golgi": 100}),
            }),
            ("skeleton", {"kimimaro_skelgen": {"dust_threshold": 200},
                          "kimimaro_merge": {"dust_threshold": 150, "tick_threshold": 300}}),
        ] + ([("tpu", {"shard_pipeline": bool(args.shard_pipeline)})]
             if args.shard_pipeline is not None else []),
        force_overwrite=True,
    )
    global_params.wd = wd
    log = initialize_logging("example_run", log_dir=wd + "/logs/")
    cfg = global_params.config

    if args.kv:
        # generic config overrides: sections replace defaults wholesale, so
        # merge each override into the EFFECTIVE section before writing
        import copy

        import yaml as _yaml

        for kv in args.kv:
            path, _, raw = kv.partition("=")
            keys = path.strip().split(".")
            val = _yaml.safe_load(raw)
            if len(keys) == 1:
                cfg[keys[0]] = val
            else:
                section = copy.deepcopy(cfg[keys[0]])
                node = section
                for k in keys[1:-1]:
                    node = node.setdefault(k, {})
                node[keys[-1]] = val
                cfg[keys[0]] = section
        cfg.write_config()

    ftimer = FileTimer(wd + "/.timing.pkl", overwrite=True)
    ftimer.dataset_shape = list(args.shape)
    ftimer.dataset_scale = scale.tolist()

    # ------------------------------------------------------------ toy data
    log.info("Step 0/9 - Preparation (synthetic EM world %s)", args.shape)
    ftimer.start("Preparation")
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.io.graph import save_svgraph
    from syconn_tpu.utils.testdata import generate_toy_world

    def make_world():
        if args.world == "neuron":
            from syconn_tpu.utils.testdata_neuro import generate_neuron_world

            return generate_neuron_world(shape=tuple(args.shape),
                                         n_cells=args.n_cells, seed=args.seed)
        return generate_toy_world(shape=tuple(args.shape),
                                  n_cells=args.n_cells, seed=args.seed)

    from syconn_tpu.io import resident

    world = None
    if args.overwrite or not os.path.isdir(cfg.kd_seg_path):
        world = make_world()
        kd = ChunkedVolume.create(cfg.kd_seg_path, scale=scale, boundary=world["seg"].shape,
                                  chunk_shape=chunk_size)
        kd.save_raw(world["raw"], mags=[1, 2, 4])
        kd.save_seg(world["seg"], mags=[1, 2])
        # register the working set HBM-resident: dense prediction, object
        # extraction and contact detection then slice from device memory
        # instead of re-streaming volumes over the link (disk stays the
        # durability layer). Device-generated worlds hand their fields over
        # zero-copy (world["_device"]); host fields upload once.
        dev_fields = world.get("_device") or {}
        resident.put(cfg.kd_seg_path, "raw", world["raw"])
        resident.put(cfg.kd_seg_path, "seg",
                     dev_fields.get("seg", world["seg"]))
        predicted_cos = {"mi", "vc", "sj"} if args.predict_organelles else set()
        for co in organelles + ["sj", "sym", "asym"]:
            if co in predicted_cos:
                continue
            cv = ChunkedVolume.create(getattr(cfg, f"kd_{co}_path"), scale=scale,
                                      boundary=world["seg"].shape, chunk_shape=chunk_size)
            cv.save_raw(world[co], mags=[1, 2])
            if co in organelles or co == "sj":
                resident.put(getattr(cfg, f"kd_{co}_path"), "raw",
                             dev_fields.get(co, world[co]))
        save_svgraph(world["rag"], cfg.init_svgraph_path)
        if args.world == "neuron":
            # persist the construction ground truth for quality scoring
            sv_ids = np.asarray(sorted(world["sv2cell"]), np.uint64)
            np.savez_compressed(
                os.path.join(wd, "neuron_gt.npz"),
                celltype_gt=world["celltype_gt"],
                compart=world["compart"],
                spiness=world["spiness"],
                myelin=world["myelin"],
                sv_ids=sv_ids,
                sv_cells=np.asarray([world["sv2cell"][int(s)] for s in sv_ids],
                                    np.int64),
                syn_coords=np.asarray([s["coord_vx"] for s in world["syn_gt"]],
                                      np.float64).reshape(-1, 3),
                syn_pre=np.asarray([s["pre_cell"] for s in world["syn_gt"]], np.int64),
                syn_post=np.asarray([s["post_cell"] for s in world["syn_gt"]], np.int64),
                syn_sign=np.asarray([1 if s["sign"] == "asym" else -1
                                     for s in world["syn_gt"]], np.int8),
                syn_on_spine=np.asarray([s["on_spine"] for s in world["syn_gt"]], bool),
                syn_head_vol=np.asarray([s["head_vol_vx"] for s in world["syn_gt"]],
                                        np.float64),
            )
    elif resident.enabled():
        # reused working dir: hydrate the resident store from disk once
        kd = ChunkedVolume.open(cfg.kd_seg_path)
        resident.put(cfg.kd_seg_path, "raw", kd.load_raw())
        seg_host = kd.load_seg()
        if seg_host.max(initial=0) < 2**31:
            resident.put(cfg.kd_seg_path, "seg", seg_host)
        del seg_host
        for co in organelles + ["sj"]:
            p = getattr(cfg, f"kd_{co}_path")
            if os.path.isdir(p):
                resident.put(p, "raw", ChunkedVolume.open(p).load_raw())
    if args.predict_organelles:
        from syconn_tpu.exec import exec_dense_prediction as _edp

        log.info("Predicting mi/vc/sj probability maps from raw (dense model)")
        _edp.predict_cellorganelles(mag=1)
    ftimer.stop()

    if args.train_models:
        log.info("Step 0.5/9 - Training dense models on the toy ground truth")
        ftimer.start("Model training")
        if world is None:
            world = generate_toy_world(shape=tuple(args.shape), n_cells=args.n_cells, seed=args.seed)
        from syconn_tpu.cnn.toy import train_toy_dense_models

        accs = train_toy_dense_models(
            world, steps=args.train_steps, log_cb=log.info,
            tasks=("organelles", "myelin"),
            # finer patch resolves the small toy organelles
            variant_overrides={"organelles": dict(features=(32, 64), strides=((2, 2, 2),), patch=(2, 2, 2))},
        )
        log.info("trained toy models: %s", accs)
        # trained organelle predictions now replace the generated prob maps
        for co in ["mi", "vc", "sj"]:
            import shutil

            p = getattr(cfg, f"kd_{co}_path")
            if os.path.isdir(p):
                shutil.rmtree(p)
        from syconn_tpu.exec import exec_dense_prediction as _edp

        _edp.predict_cellorganelles(mag=1)
        ftimer.stop()

    if args.until_step < 1:
        # data-preparation-only run: build the world + working dir on disk
        # (e.g. ahead of a benchmark session) and leave the pipeline for a
        # later invocation WITHOUT --overwrite, which re-hydrates the
        # resident store from the chunk store and continues from step 1.
        log.info("until_step < 1: stopping after Preparation")
        _write_timing_json(wd, args, ftimer)
        return

    from syconn_tpu.exec import (
        exec_dense_prediction,
        exec_inference,
        exec_init,
        exec_skeleton,
        exec_syns,
    )

    log.info("Step 1/9 - Predicting sub-cellular structures")
    ftimer.start("Dense predictions")
    exec_dense_prediction.predict_myelin()  # mag from the model meta
    ftimer.stop()

    log.info("Step 2/9 - Creating SegmentationDatasets (incl. SV meshes)")
    ftimer.start("SD generation")
    exec_init.init_cell_subcell_sds(chunk_size=chunk_size, overwrite=args.overwrite)
    exec_init.run_create_rag()
    ftimer.stop()

    log.info("Step 3/9 - Astrocyte separation")
    if cfg.prior_astrocyte_removal:
        ftimer.start("Astrocyte separation")
        exec_inference.run_astrocyte_prediction_pts()
        exec_inference.run_astrocyte_splitting()
        ftimer.stop()
    else:
        log.info("Astrocyte separation disabled. Skipping.")

    log.info("Step 4/9 - Creating SuperSegmentationDataset")
    ftimer.start("SSD generation")
    exec_init.run_create_neuron_ssd(overwrite=args.overwrite)
    ftimer.stop()

    log.info("Step 5/9 - Skeleton generation")
    ftimer.start("Skeleton generation")
    exec_skeleton.run_skeleton_generation(map_myelin=True, cube_size=chunk_size)
    ftimer.stop()

    log.info("Step 6/9 - Synapse detection")
    ftimer.start("Synapse detection")
    exec_syns.run_syn_generation(chunk_size=chunk_size, overwrite=args.overwrite)
    ftimer.stop()

    log.info("Step 6.5/9 - Contact detection")
    ftimer.start("Contact detection")
    if cfg["cell_contacts"]["generate_cs_ssv"]:
        exec_syns.run_cs_ssv_generation(overwrite=args.overwrite)
    ftimer.stop()

    if args.until_step >= 7:
        log.info("Step 7/9 - Compartment prediction")
        ftimer.start("Compartment predictions")
        exec_inference.run_semsegaxoness_prediction()
        exec_inference.run_semsegspiness_prediction()
        exec_syns.run_spinehead_volume_calc()
        ftimer.stop()

    if args.until_step >= 8:
        log.info("Step 8/9 - Cell-morphology embeddings")
        ftimer.start("Morphology extraction")
        exec_inference.run_morphology_embedding()
        ftimer.stop()

    if args.until_step >= 9:
        log.info("Step 9/9 - Celltype analysis")
        ftimer.start("Celltype analysis")
        exec_inference.run_celltype_prediction()
        ftimer.stop()

        log.info("Step - Matrix export")
        ftimer.start("Matrix export")
        exec_syns.run_matrix_export()
        ftimer.stop()

    log.info("\n" + ftimer.prepare_report())
    _write_timing_json(wd, args, ftimer)
    if args.run_server:
        from syconn_tpu.analysis.server import main as server_main

        sys.argv = ["syconn.server", f"--working_dir={wd}", "--port=10001"]
        server_main()


if __name__ == "__main__":
    main()
