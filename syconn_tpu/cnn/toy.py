"""Quick task-model training on the synthetic EM world.

Gives the example pipeline real (not seed-initialized) models: the toy
world's organelle/myelin masks are ground truth, so a few hundred optimizer
steps make the dense predictions match the generating process — and the
downstream extraction then reproduces the known objects. This is the
train -> deploy loop of the reference's cnn/ scripts in miniature.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import numpy as np

from .. import global_params

log = logging.getLogger("syconn_tpu.toy_train")

__all__ = ["train_toy_dense_models"]


def myelin_dilation(mag: int) -> int:
    """Training-target dilation for the myelin sheath, in voxels AT ``mag``.

    The deployment probe reads the map at skeleton nodes — axon CENTERS,
    r_axon (~2-2.4 mag-1 voxels in the neuron worlds) inside the sheath's
    inner surface — so the target must cover ~3 mag-1 voxels of stretch
    interior regardless of the training mag. Shared by the trainer
    (cnn/toy.py) and the held-out scorer (train_pretrained.
    dense_heldout_iou) so the receipt scores the exact training target."""
    return max(1, int(round(3 / max(int(mag), 1))))


def _pool_mean(a, f):
    """2x^k mean-pool a uint8 volume (the KD raw pyramid's downsampling)."""
    s = (np.asarray(a.shape) // f) * f
    a = a[: s[0], : s[1], : s[2]]
    return (
        a.reshape(s[0] // f, f, s[1] // f, f, s[2] // f, f)
        .mean(axis=(1, 3, 5))
        .astype(np.uint8)
    )


def _pool_any(a, f):
    """any-pool a label volume (a coarse voxel is fg if any child is)."""
    s = (np.asarray(a.shape) // f) * f
    a = a[: s[0], : s[1], : s[2]]
    return a.reshape(s[0] // f, f, s[1] // f, f, s[2] // f, f).max(axis=(1, 3, 5))


def train_toy_dense_models(
    world,
    steps: int = 300,
    tile=(64, 64, 32),
    batch: int = 2,
    tasks: Sequence[str] = ("organelles", "myelin"),
    learning_rate: float = 2e-3,
    seed: int = 0,
    log_cb=None,
    variant_overrides: Optional[Dict[str, dict]] = None,
    task_mags: Optional[Dict[str, int]] = None,
) -> Dict[str, float]:
    """Train dense models on toy-world ground truth and persist them to the
    working directory's model paths. Returns final accuracies.

    ``world``: one world dict or a sequence of them — multiple worlds give
    the rare thin classes enough variety to generalize (a single 384^3
    neuron world holds only ~25 synapse junctions; models trained on it
    scored sj recall 0.875 on the training world and 0.07 held out).
    """
    import jax.numpy as jnp

    from ..models.io import save_model
    from ..models.train import make_train_state, make_train_step
    from ..models.unet3d import UNet3D, unet_variants

    cfg = global_params.config
    rng = np.random.default_rng(seed)
    worlds = [world] if isinstance(world, dict) else list(world)
    raws = [w["raw"] for w in worlds]
    req_tile = np.asarray(tile)
    if task_mags is None:
        # myelin deploys at mag 4 (exec_dense_prediction.predict_myelin);
        # a model trained at mag 1 predicts NOTHING on mean-pooled mag-4
        # input (measured: mag-4 recall 0, mag-1 recall 0.98) — train each
        # task at its deployment mag.
        task_mags = {"myelin": 4}

    # labels per task, per world
    label_vols: Dict[str, list] = {}
    if "organelles" in tasks:
        vols = []
        for w in worlds:
            lab = np.zeros(w["raw"].shape, np.int32)
            lab[w["mi"] > 0] = 1
            lab[w["vc"] > 0] = 2
            lab[w["sj"] > 0] = 3
            vols.append(lab)
        label_vols["organelles"] = vols
    if "myelin" in tasks:
        vols = []
        for w in worlds:
            if "myelin" in w:  # neuron world: real sheath ground truth
                lab = (w["myelin"] > 0).astype(np.int32)
            else:  # Voronoi toy proxy: dark membrane voxels count as myelin
                lab = ((w["cells"] == 0) & (w["raw"] < 90)).astype(np.int32)
            vols.append(lab)
        label_vols["myelin"] = vols
    if "syntype" in tasks:
        vols = []
        for w in worlds:
            lab = np.zeros(w["raw"].shape, np.int32)
            lab[w["asym"] > 0] = 1
            lab[w["sym"] > 0] = 2
            vols.append(lab)
        label_vols["syntype"] = vols
    for co in ("er", "golgi"):  # binary organelle tasks (reference:
        # cnn/cnn_er.py trains these the same way as the mi/vc/sj nets)
        if co in tasks:
            label_vols[co] = [(w[co] > 0).astype(np.int32) for w in worlds]

    accs = {}
    for task in tasks:
        kw = dict(unet_variants(task))
        if variant_overrides and task in variant_overrides:
            kw.update(variant_overrides[task])
        model = UNet3D(**kw)
        mag = int(task_mags.get(task, 1))
        t_raws = raws if mag == 1 else [_pool_mean(r, mag) for r in raws]
        task_vols = label_vols[task]
        if mag != 1:
            task_vols = [_pool_any(lv, mag) for lv in task_vols]
        if task == "myelin":
            # the deployment consumer probes skeleton NODES — tube centers,
            # not sheath voxels (map_myelin2coords + 10µm majority window).
            # Dilate the 1-2-voxel sheath labels so the trained map covers
            # the myelinated stretch interior the probes actually hit.
            from scipy import ndimage as _ndi

            task_vols = [
                _ndi.binary_dilation(
                    (lv > 0), iterations=myelin_dilation(mag)
                ).astype(np.int32)
                for lv in task_vols
            ]
        # tile must divide by the model's total per-axis downsampling
        # (patchify * encoder strides), and fit the (possibly mag-pooled)
        # smallest world
        factor = np.asarray(kw.get("patch", (4, 4, 2)), np.int64).copy()
        for s in kw.get("strides", ((2, 2, 2), (2, 2, 2))):
            factor *= np.asarray(s, np.int64)
        tile = np.minimum(req_tile, np.min([r.shape for r in t_raws], axis=0))
        tile = np.maximum(tile // factor, 1) * factor
        his = [np.array(r.shape) - tile for r in t_raws]
        state = make_train_state(model, (1, *tile, 1), learning_rate=learning_rate)
        # inverse-frequency class weights (organelles are <3% of the volume)
        from ..models.train import weighted_xent

        # foreground-centered tiles half the time, CLASS-BALANCED: pick a
        # present foreground class uniformly, then a voxel of it. Without
        # the balancing, abundant classes (mi/vc blobs) crowd out thin rare
        # ones (sj is ~100x rarer) and the rare class never anchors a tile
        # (observed: sj heldout recall 0.12 with pooled fg sampling).
        fg_by_wc = [
            [c for c in (np.argwhere(lv == cc)
                         for cc in range(1, model.n_classes)) if len(c)]
            for lv in task_vols
        ]

        def sample_tile():
            wi = rng.integers(len(worlds))
            fbc = fg_by_wc[wi]
            if fbc and rng.random() < 0.5:
                cls = fbc[rng.integers(len(fbc))]
                c = cls[rng.integers(len(cls))]
                off = np.clip(c - np.asarray(tile) // 2, 0, his[wi])
            else:
                off = np.array([rng.integers(0, h + 1) for h in his[wi]])
            sl = tuple(slice(o, o + t) for o, t in zip(off, tile))
            return t_raws[wi][sl], task_vols[wi][sl]
        # class weights from the EFFECTIVE sampled distribution: with
        # fg-centered oversampling the rare classes are already boosted in
        # the batch stream, so weighting by the *global* volume frequency
        # double-counts the correction and pushes precision to ~2%.
        # Estimate the per-class frequency under the actual sampling policy
        # and temper that (sqrt, cap 4).
        freqs = np.ones(model.n_classes, np.float64)
        for _ in range(256):
            _, lv = sample_tile()
            freqs += np.bincount(lv.reshape(-1), minlength=model.n_classes)
        weights = np.sqrt(freqs.sum() / freqs)
        # cap 24: thin rare classes (a synapse junction is ~1/2000 of the
        # sampled voxels even with class-balanced fg tiles) contribute
        # ~0.2% of the loss under a cap of 4 and get ignored entirely
        # (heldout sj recall 0.007); sqrt-of-effective-frequency with this
        # cap keeps them in play without the full-1/f precision collapse
        weights = np.minimum(weights / weights.min(), 24.0)
        weights = weights / weights.mean()
        step_fn = make_train_step(loss_fn=weighted_xent(weights))
        acc = 0.0
        for i in range(steps):
            xs, ys = [], []
            for _ in range(batch):
                rv, lv = sample_tile()
                xs.append(rv[..., None].astype(np.float32))
                ys.append(lv)
            state, m = step_fn(state, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)))
            if (i + 1) % 50 == 0:
                acc = float(m["acc"])
                (log_cb or log.info)(f"[{task}] step {i + 1}/{steps} acc {acc:.3f}")
        mpath = getattr(cfg, f"mpath_{task}")
        meta = {"task": task, "toy_steps": steps, "mag": mag}
        if model.n_classes == 2:
            # binary heads over-fire under the fg-boosted sampling/loss
            # weights (measured: myelin precision 0.15 at argmax despite
            # recall 0.75) — calibrate the deployment threshold on the
            # TRAINING worlds and ship it in the model meta; consumers
            # (map_myelin2coords, the held-out scorer) read it from there
            thr, cal_iou = calibrate_binary_threshold(
                model, state.params, t_raws[:2], task_vols[:2])
            meta.update({"threshold": thr, "calib_train_iou": cal_iou})
            (log_cb or log.info)(
                f"[{task}] calibrated threshold {thr} (train IoU {cal_iou:.3f})")
        save_model(mpath, model, state.params, extra_meta=meta)
        accs[task] = acc
    return accs


def calibrate_binary_threshold(model, params, raws, targets):
    """Pick the fg-probability threshold (uint8 0-255 scale) maximizing
    voxel IoU of ``probs[..., 1] >= thr/255`` against the binary targets
    on (training) worlds. Returns ``(threshold, iou_at_threshold)``.

    Post-hoc threshold calibration is standard practice for imbalanced
    dense heads (the reference tunes per-task ``probathresholds`` in
    config.yml:117 the same way, by hand); computing it from the training
    worlds keeps the held-out receipt honest."""
    from ..inference.dense import DenseTilePredictor

    fg_list, tg_list = [], []
    for raw, tgt in zip(raws, targets):
        tile = tuple(int(t) for t in np.minimum((128, 128, 64), raw.shape))
        pred = DenseTilePredictor(model, params, tile_shape=tile,
                                  halo=(16, 16, 8), mode="probs")
        probs = pred.predict_array(raw)  # uint8 0-255 probabilities
        fg_list.append(np.asarray(probs[..., 1], np.uint8).reshape(-1))
        tg_list.append((np.asarray(tgt) > 0).reshape(-1))
    fg = np.concatenate(fg_list)
    tg = np.concatenate(tg_list)
    best_thr, best_iou = 128, -1.0
    for thr in range(8, 249, 8):
        p = fg >= thr
        inter = float(np.count_nonzero(p & tg))
        union = float(np.count_nonzero(p | tg))
        iou = inter / max(union, 1.0)
        if iou > best_iou:
            best_thr, best_iou = thr, iou
    return int(best_thr), float(best_iou)
