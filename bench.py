"""Headline benchmark: chunked 3D semantic segmentation throughput (1 chip).

Runs the full dense-prediction path (the pipeline's compute core and
BASELINE.json's metric "Mvox/s/chip chunked 3D semseg"): a synthetic EM
volume is pushed through the 4-class organelle 3D U-Net on the attached
TPU. Headline is the HBM-resident rate (volume lives in device memory
across pipeline steps, class outputs consumed in HBM — the production path
since round 3); the streaming disk-to-disk rate is reported when the relay
downlink can carry results.

Baseline (BASELINE.md [2], docs/instructions.rst:94): the reference predicts
the 0.726 GVx example cube's myelin map at mag 4 (= 11.34 MVx at output
resolution) in 62 s on 2x Quadro RTX 5000 => 0.183 Mvox/s effective.

Crash-safety contract (VERDICT r3 #2): this script ALWAYS prints exactly one
JSON line, ALWAYS mirrors it to ``bench_last.json``, and ALWAYS exits 0 —
the device link is probed in a SUBPROCESS before any in-process backend
init, every device call is deadline-wrapped, every failure is caught into
the JSON detail, and the process hard-exits so deadline-abandoned transfer
threads cannot abort C++ teardown (the rc-134 mechanism in BENCH_r03).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import traceback

import numpy as np

BASELINE_MVOX_S = 11.34e6 / 62.0 / 1e6  # reference dense-prediction step
METRIC = "dense_3d_semseg_mvox_per_s_per_chip"

# peak dense bf16 TFLOP/s per chip (public figures)
PEAK_BF16_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,  # Trillium
    "v6p": 918.0,
}


def _emit(result: dict) -> None:
    line = json.dumps(result)
    print(line)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_last.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    sys.stdout.flush()
    sys.stderr.flush()


def _fail(error: str, **detail) -> dict:
    return {
        "metric": METRIC,
        "value": 0.0,
        "unit": "Mvox/s",
        "vs_baseline": 0.0,
        "detail": dict(error=error, **detail),
    }


def _device_peak_tflops(dev) -> float | None:
    kind = (getattr(dev, "device_kind", "") or "").lower().replace(" ", "")
    for k, v in PEAK_BF16_TFLOPS.items():
        if k in kind:
            return v
    # axon relay devices report e.g. 'TPU v5 lite'
    if "v5lite" in kind or "v5l" in kind:
        return PEAK_BF16_TFLOPS["v5e"]
    return None


def _tile_flops(pred, params, x) -> float | None:
    """FLOPs of one compiled tile forward. With the Pallas conv engine
    active, XLA's cost analysis sees only the custom-call shells (near-zero
    flops -> fake MFU), so the analytic conv count is used instead; it runs
    ~20% above XLA's own count for the SAME graph (transpose-conv taps are
    counted per output there), so the two are comparable but the analytic
    number is the canonical per-output*27-taps accounting."""
    if getattr(pred, "_use_pallas", False):
        try:
            from syconn_tpu.models.unet_engine import unet_flops

            return unet_flops(pred.model, np.asarray(x).shape)
        except Exception:
            return None
    try:
        import jax.numpy as jnp

        lowered = pred._fwd.lower(params, jnp.asarray(x))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _split_timings(pred, x, reps: int = 5, measure_read: bool = True):
    """Median upload / compute / readback seconds for one tile batch."""
    import jax
    import jax.numpy as jnp

    ups, comps, reads = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        xd = jax.device_put(jnp.asarray(x))
        xd.block_until_ready()
        t1 = time.perf_counter()
        out = pred._fwd(pred._params, xd)
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        if measure_read:
            _ = np.asarray(out)
        t3 = time.perf_counter()
        ups.append(t1 - t0)
        comps.append(t2 - t1)
        reads.append(t3 - t2)
    return (
        float(np.median(ups)),
        float(np.median(comps)),
        float(np.median(reads)) if measure_read else None,
    )


def _bench_kernels(run_with_deadline) -> dict:
    """Device-resident voxel-kernel rates (VERDICT r4 #5: the contact/props
    kernel numbers must come from a driver-captured receipt, not a commit
    message). Measures the two production contact paths and the resident
    props scan on a synthetic blocky segmentation (32x32x16 label blocks,
    ~9% boundary voxels — denser than real tissue, i.e. conservative)."""
    import jax
    import jax.numpy as jnp

    from syconn_tpu.ops.contacts_jax import CsDispatcher, ResidentCsDetector
    from syconn_tpu.ops.props_jax import ResidentPropsScanner

    rngk = np.random.default_rng(7)
    core = (256, 256, 128)
    block = (32, 32, 16)
    lab = rngk.integers(
        1, 5000,
        size=tuple(core[i] // block[i] for i in range(3)), dtype=np.int32)
    seg = np.repeat(np.repeat(np.repeat(
        lab, block[0], 0), block[1], 1), block[2], 2)
    vox = float(np.prod(core))
    out: dict = {"volume_mvox": round(vox / 1e6, 1),
                 "seg": "random 32x32x16 label blocks"}

    def _med(rates):
        return round(float(np.median(rates)), 2) if rates else None

    # production resident path: chunks sliced in HBM, sparse readback
    def _resident_cs():
        seg_dev = jax.device_put(jnp.asarray(seg))
        det = ResidentCsDetector(seg_dev, chunk=(128, 128, 64))
        cixs = [(x, y, z) for x in range(det.grid[0])
                for y in range(det.grid[1]) for z in range(det.grid[2])]
        det.fetch(det.dispatch(cixs[0]))  # compile
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for h in [det.dispatch(c) for c in cixs]:
                det.fetch(h)
            rates.append(vox / (time.perf_counter() - t0) / 1e6)
        return rates

    def _measure(fn, key):
        # one kernel failing (e.g. a Mosaic lowering rejection) must not
        # erase the other measurements — record per-key errors instead
        try:
            ok, r = run_with_deadline(fn, 300.0)
        except Exception as e:  # noqa: BLE001
            out[key] = None
            out[key + "_error"] = repr(e)[:300]
            return
        out[key] = _med(r) if ok else None

    _measure(_resident_cs, "contact_resident_xla_mvox_per_s")

    # streaming path: Pallas Mosaic kernel incl. host candidate prep +
    # dense fetch (what CsDispatcher does per extraction chunk)
    def _pallas_cs():
        h = (6, 6, 3)
        seg_h = np.pad(seg, [(h[i], h[i]) for i in range(3)])
        disp = CsDispatcher(kernel="pallas")
        disp.fetch(disp.dispatch(seg_h[:64, :64, :32]))  # compile
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            disp.fetch(disp.dispatch(seg_h))
            rates.append(vox / (time.perf_counter() - t0) / 1e6)
        return rates

    _measure(_pallas_cs, "contact_pallas_e2e_mvox_per_s")

    # resident per-chunk object-property scan (SD generation's hot scan)
    def _props():
        seg_dev = jax.device_put(jnp.asarray(seg))
        sc = ResidentPropsScanner(seg_dev, chunk=(256, 256, 64))
        sc.props((0, 0, 0), max_ids=4096)  # compile
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for cz in range(2):
                sc.props((0, 0, cz), max_ids=4096)
            rates.append(vox / (time.perf_counter() - t0) / 1e6)
        return rates

    _measure(_props, "props_resident_mvox_per_s")
    return out


def _run() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from syconn_tpu.utils import linkcfg
    from syconn_tpu.utils.linkprobe import probe_link_subprocess, run_with_deadline

    # -------------------------------------------------------- link triage
    # Probe the relay link in a SUBPROCESS before this process initializes
    # any backend: a wedged downlink means block_until_ready never returns
    # for ANY device work (observed: not even a computed scalar comes back),
    # so there is nothing to measure and nothing worth attaching to.
    # a placeholder artifact first: even an externally-killed run leaves a
    # record (overwritten by the real emit on every normal path)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_last.json"), "w") as f:
            f.write(json.dumps(_fail("benchmark did not complete "
                                     "(killed during link probe or run)")) + "\n")
    except OSError:
        pass
    forced = os.environ.get("SYCONN_TPU_PLATFORM", "")
    ambient = os.environ.get("JAX_PLATFORMS", "")
    on_tpu = (forced or ambient).strip().lower() not in ("cpu",) and (
        forced or ambient) != ""
    link_up, link_down = (float("inf"), float("inf"))
    if not (forced or ambient):
        # unset ambient: the probe child resolves the real default backend
        link_up, link_down = probe_link_subprocess(timeout_s=180.0)
        on_tpu = link_up != float("inf")
    elif on_tpu:
        link_up, link_down = probe_link_subprocess(timeout_s=180.0)
        if link_down <= 0.0:
            # transient wedge? one retry before declaring the link dead
            time.sleep(5.0)
            link_up, link_down = probe_link_subprocess(timeout_s=180.0)
    min_down = linkcfg.get("min_downlink_mbps")
    if on_tpu and link_up < 2.0:
        return _fail("device link down (uplink unusable)",
                     link_up_mbps=round(link_up, 2),
                     link_down_mbps=round(link_down, 2))
    if on_tpu and link_down <= 0.0:
        return _fail(
            "device downlink wedged: uploads land but no result of any size "
            "returns (block_until_ready cannot complete) — no device "
            "measurement is possible this session",
            link_up_mbps=round(link_up, 2),
            link_down_mbps=0.0)
    stream_ok = (not on_tpu) or link_down >= min_down

    # ---------------------------------------------------------------- setup
    import jax
    import jax.numpy as jnp

    from syconn_tpu.inference.dense import (DenseTilePredictor,
                                            ResidentDensePredictor,
                                            predict_dense_to_kd)
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.models.io import init_model_params
    from syconn_tpu.models.unet3d import UNet3D, unet_variants

    shape = (768, 768, 384)  # 226 MVx synthetic volume
    tile = (384, 384, 192)
    halo = (32, 32, 16)
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, shape, dtype=np.uint8)

    tmp = tempfile.mkdtemp(prefix="syconn_bench_")
    src = ChunkedVolume.create(
        os.path.join(tmp, "src"), scale=(10, 10, 20), boundary=shape, chunk_shape=tile
    )
    src.save_raw(vol)

    model = UNet3D(**unet_variants("organelles"))
    # init at a small shape (params are shape-agnostic; full-res tracing of
    # the big tile would materialize the depth-to-space transpose)
    params = init_model_params(model, (1, 64, 64, 32, 1))
    thresholds = (0.5, 0.4286, 0.2857, 0.1905)

    # ------------------------------------------- HBM-resident measurement
    # The production path since round 3: the volume lives in device memory
    # across pipeline steps (io/resident.py); tiles are sliced in HBM and
    # downstream consumers read the class outputs in HBM. Measured FIRST
    # and independently of the streaming path's health (VERDICT r3 #2c).
    res_rates: list[float] = []
    packed_dev = None
    rpred = None
    if on_tpu:
        rpred = ResidentDensePredictor(
            model, params, tile_shape=tile, halo=halo, mode="masks",
            thresholds=thresholds, batch_size=1,
        )

        def _resident_warm():
            vd = jax.device_put(jnp.asarray(vol))
            vd.block_until_ready()
            pk, gr = rpred.predict_volume_packed(vd)  # compile
            c = rpred.class_volume_device(pk, gr, 1, shape)
            jax.block_until_ready((pk, c))
            return vd

        ok, vol_dev = run_with_deadline(_resident_warm, 900.0)
        if not ok:
            return _fail("device compute unreachable (compile/dispatch hung)",
                         link_up_mbps=round(link_up, 2),
                         link_down_mbps=round(link_down, 2))
        for _ in range(3):
            t0 = time.perf_counter()
            packed_dev, grid_r = rpred.predict_volume_packed(vol_dev)
            cls = rpred.class_volume_device(packed_dev, grid_r, 1, shape)
            okb, _ = run_with_deadline(
                lambda: jax.block_until_ready((packed_dev, cls)), 600.0)
            if not okb:
                break  # mid-run wedge: keep whatever iterations completed
            res_rates.append(float(np.prod(shape)) / (time.perf_counter() - t0) / 1e6)
        res_rates.sort()

    # ------------------------------------------------- voxel-kernel rates
    kernels = None
    if on_tpu and res_rates:
        try:
            kernels = _bench_kernels(run_with_deadline)
        except Exception as e:  # receipt must survive a kernel-bench crash
            kernels = {"error": repr(e)}

    # d2h drain (disk durability) — timed ONCE, after the last timed
    # iteration so abandoned readback threads cannot skew resident rates;
    # it overlaps the next step in the real pipeline
    drain_s = None
    if packed_dev is not None and stream_ok and res_rates:
        t0 = time.perf_counter()
        okd, _ = run_with_deadline(lambda: np.asarray(packed_dev), 120.0)
        drain_s = (time.perf_counter() - t0) if okd else None

    # ------------------------------------------------------------- warm-up
    # the SAME predictor instance is reused by the timed streaming run, so
    # compilation and first-dispatch overheads stay out of the measurement
    pred = DenseTilePredictor(
        model, params, tile_shape=tile, halo=halo, mode="masks",
        thresholds=thresholds, batch_size=1,
    )
    warm = np.zeros((1,) + tuple(np.add(tile, np.multiply(2, halo))), np.uint8)

    flops_tile, up_s, comp_s, read_s = None, None, None, None
    if stream_ok:
        ok, _ = run_with_deadline(lambda: pred.predict_tiles(warm), 900.0)
        if ok:
            flops_tile = _tile_flops(pred, pred._params, warm)
            okt, tr = run_with_deadline(lambda: _split_timings(pred, warm), 600.0)
            if okt:
                up_s, comp_s, read_s = tr
            else:
                stream_ok = False
    else:
        def _warm_noread():
            out = pred._fwd(pred._params, jnp.asarray(warm))
            jax.block_until_ready(out)

        ok, _ = run_with_deadline(_warm_noread, 600.0)
        if ok:
            okf, ft = run_with_deadline(
                lambda: _tile_flops(pred, pred._params, warm), 240.0)
            flops_tile = ft if okf else None
            okt, tr = run_with_deadline(
                lambda: _split_timings(pred, warm, measure_read=False), 300.0)
            if okt:
                up_s, comp_s, read_s = tr

    # ---------------------------------------------------------------- run
    # streaming mode: disk -> device -> disk, thresholding fused on device,
    # 1 bit/voxel readback. Three passes, median reported.
    runs = []
    if stream_ok:
        for r in range(3):
            stats = predict_dense_to_kd(
                os.path.join(tmp, "src"),
                target_paths={
                    "mi": os.path.join(tmp, f"mi{r}"),
                    "vc": os.path.join(tmp, f"vc{r}"),
                    "sj": os.path.join(tmp, f"sj{r}"),
                },
                model=model,
                params=params,
                channel_mapping={"mi": 1, "vc": 2, "sj": 3},
                tile_shape=tile,
                halo=halo,
                target_mags=(1, 2),
                show_progress=False,
                mode="masks",
                thresholds=thresholds,
                predictor=pred,
                pipeline_depth=4,
            )
            runs.append(stats)
    if runs:
        rates = sorted(s["mvox_per_s"] for s in runs)
        stream_mvox_s = float(np.median(rates))
        spread = (rates[-1] - rates[0]) / 2.0
        stats = min(runs, key=lambda s: abs(s["mvox_per_s"] - stream_mvox_s))
    else:
        rates, stream_mvox_s, spread, stats = [], None, None, None

    mvox_s = (float(np.median(res_rates)) if res_rates
              else (stream_mvox_s if stream_mvox_s else 0.0))

    # FLOPs accounting: each tile computes tile+2*halo voxels of conv work
    tile_in_vox = float(np.prod(np.add(tile, np.multiply(2, halo))))
    core_vox = float(np.prod(tile))
    flops_per_in_vox = flops_tile / tile_in_vox if flops_tile else None
    achieved_tflops = (
        mvox_s * 1e6 * (tile_in_vox / core_vox) * flops_per_in_vox / 1e12
        if flops_per_in_vox
        else None
    )
    dev = jax.devices()[0]
    peak = _device_peak_tflops(dev)
    mfu = (achieved_tflops / peak * 100.0) if (achieved_tflops and peak) else None

    return {
        "metric": METRIC,
        "value": round(mvox_s, 2),
        "unit": "Mvox/s",
        "vs_baseline": round(mvox_s / BASELINE_MVOX_S, 1),
        "detail": {
            "resident_mvox_per_s": [round(r, 2) for r in res_rates],
            "resident_d2h_drain_s": round(drain_s, 2) if drain_s else None,
            "streaming_mvox_per_s": [round(r, 2) for r in rates],
            "streaming_median_pm_spread": (
                f"{stream_mvox_s:.2f} ± {spread:.2f}"
                if stream_mvox_s is not None else None),
            "link_up_mbps": (round(link_up, 1)
                             if np.isfinite(link_up) else None),
            "link_down_mbps": (round(link_down, 1)
                               if np.isfinite(link_down) else None),
            "volume_mvox": (stats["n_voxels"] / 1e6 if stats
                            else float(np.prod(shape)) / 1e6),
            "seconds": round(stats["seconds"], 2) if stats else None,
            "device": str(dev),
            "flops_per_input_voxel": round(flops_per_in_vox, 1) if flops_per_in_vox else None,
            "achieved_tflops": round(achieved_tflops, 2) if achieved_tflops else None,
            "peak_bf16_tflops": peak,
            "mfu_pct": round(mfu, 2) if mfu else None,
            "tile_split_s": {
                "upload": round(up_s, 3) if up_s is not None else None,
                "compute": round(comp_s, 3) if comp_s is not None else None,
                "readback": round(read_s, 3) if read_s is not None else None,
            },
            # chip-limited rate (what a locally-attached v5e would sustain);
            # end-to-end is transfer-bound through the tunneled relay link
            "compute_only_mvox_per_s": (round(core_vox / comp_s / 1e6, 1)
                                        if comp_s else None),
            # which conv lowering actually ran (receipt for the engine
            # switch: ops/conv3d_pallas.py vs XLA Conv3D). Recorded PER
            # MEASUREMENT: resident and streaming use separate predictor
            # instances and either can hit _pallas_fallback() mid-run
            # (ADVICE r4). Headline string = the headline measurement's.
            "conv_engine": (
                "pallas" if getattr(rpred if rpred is not None else pred,
                                    "_use_pallas", False) else "xla"),
            "conv_engine_by_mode": {
                "resident": (
                    ("pallas" if getattr(rpred, "_use_pallas", False)
                     else "xla") if rpred is not None else None),
                "streaming": ("pallas" if getattr(pred, "_use_pallas", False)
                              else "xla"),
            },
            "kernels": kernels,
            "model": "UNet3D organelles patchified (4,4,2)->(64,128,256) 4-class, bf16, fused threshold+bitpack readback",
            "baseline": "reference myelin dense prediction 11.34 MVx / 62 s on 2 GPUs",
        },
    }


def main():
    try:
        result = _run()
    except BaseException as e:  # noqa: BLE001 - the JSON line must always print
        tb = traceback.format_exc().strip().splitlines()
        result = _fail(f"benchmark raised: {e!r}", traceback_tail=tb[-4:])
    _emit(result)


if __name__ == "__main__":
    main()
    # hard exit: deadline-abandoned device-transfer threads must not run
    # interpreter/C++ teardown (BENCH_r03: "FATAL: exception not rethrown",
    # SIGABRT rc 134). Everything durable is already flushed by _emit().
    os._exit(0)
