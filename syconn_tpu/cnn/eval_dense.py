"""Held-out voxel metrics of the packaged dense models, as a JSON receipt.

Generates never-trained neuron worlds and scores every packaged dense
model (organelles 4-class, myelin binary) at its deployment mag with
``train_pretrained.dense_heldout_iou``. The committed artifact
(``MODELS_r04.json``) backs the README's dense-model table; regenerate
with:

    python -m syconn_tpu.cnn.eval_dense [--seeds 777 1901 2718] \
        [--out MODELS_r04.json]

Reference analog: the per-model validation metrics logged by the
reference's training scripts (syconn/cnn/cnn_*.py, elektronn3 trainer
validation loop); here the synthetic construction is exact GT.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[777, 1901, 2718])
    p.add_argument("--shape", type=int, nargs=3, default=[160, 160, 80])
    p.add_argument("--n_cells", type=int, default=8)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args()

    # CPU-pinned receipt driver: the models are tiny and the scoring is
    # deterministic; an ambient accelerator platform (sitecustomize pins
    # JAX_PLATFORMS) must not capture it — a wedged device link would
    # hang the readback. setdefault is NOT enough under an ambient pin.
    if not os.environ.get("SYCONN_TPU_PLATFORM"):
        os.environ["JAX_PLATFORMS"] = "cpu"
    from .. import global_params
    from ..handler.config import generate_default_conf
    from ..utils.testdata_neuro import generate_neuron_world
    from .train_pretrained import dense_heldout_iou

    # activate a wd whose model paths resolve to the packaged weights
    wd = tempfile.mkdtemp(prefix="syconn_eval_dense_")
    generate_default_conf(wd, scaling=(10, 10, 20), force_overwrite=True)
    global_params.wd = wd

    # score every packaged dense model (er/golgi only exist when trained)
    from ..models.io import model_exists, packaged_model_path

    tasks = ["organelles", "myelin"] + [
        t for t in ("er", "golgi") if model_exists(packaged_model_path(t))
    ]
    per_seed = {}
    for seed in args.seeds:
        world = generate_neuron_world(
            shape=tuple(args.shape), n_cells=args.n_cells, seed=seed)
        per_seed[seed] = dense_heldout_iou(world, tasks=tuple(tasks))
        print(f"seed {seed}: {json.dumps(per_seed[seed])}", flush=True)

    mean = {k: float(np.mean([per_seed[s][k] for s in args.seeds]))
            for k in per_seed[args.seeds[0]]}
    report = {
        "seeds": {str(s): per_seed[s] for s in args.seeds},
        "mean": mean,
        "shape": list(args.shape), "n_cells": args.n_cells,
        "driver": "python -m syconn_tpu.cnn.eval_dense",
        "models": "syconn_tpu/models/pretrained/{%s}" % ",".join(tasks),
        # the myelin score is IoU against the *training-target*
        # definition (GT sheath mask pooled to deployment mag, then
        # dilated by myelin_dilation(mag) ~ 3 mag-1-equivalent voxels —
        # see cnn/toy.myelin_dilation and train_pretrained.
        # dense_heldout_iou); record that here so the number is
        # interpretable without reading code
        "gt_definition": {
            "organelles_*_iou": "argmax vs GT label at deployment mag",
            "myelin_myelin_iou": "binary IoU vs pooled GT sheath mask "
                                 "dilated by myelin_dilation(mag) "
                                 "(training-target def.)",
            "er_er_iou/golgi_golgi_iou": "binary IoU vs GT mask at "
                                         "deployment mag",
        },
    }
    print("MEAN:", json.dumps(mean), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("report:", args.out)


if __name__ == "__main__":
    main()
