"""Spine semantic segmentation on a standalone cell archive
(reference shape: examples/semseg_spine.py — multi-view spine semseg on
data/1_spineexample.k.zip; here: point-based spiness on any cell kzip)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kzip", required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--out_ply", default=None, help="mesh colored by spiness")
    args = parser.parse_args()

    from syconn_tpu.inference.points import ContextPredictor, extract_contexts, sso2pointcloud
    from syconn_tpu.models.io import get_or_init_model
    from syconn_tpu.models.pointnet import PointSegNet
    from syconn_tpu.proc.ssd_assembly import init_sso_from_kzip

    ssv = init_sso_from_kzip(args.kzip)
    coords, types = sso2pointcloud(ssv)
    mpath = args.model or os.path.join(os.path.dirname(args.kzip), "models", "spiness")
    model, params = get_or_init_model(mpath, lambda: (PointSegNet(n_classes=4), (1, 2048, 7)))
    pred = ContextPredictor(model, params, npoints=2048)
    ctxs, idx_lists = extract_contexts(coords, types, ctx_size_nm=8000, npoints=2048)
    out = pred.predict(ctxs)
    vote = np.zeros((len(coords), out.shape[-1]), np.float32)
    for m, ixs in enumerate(idx_lists):
        probs = np.exp(out[m]) / np.exp(out[m]).sum(-1, keepdims=True)
        np.add.at(vote, ixs, probs)
    labels = np.argmax(vote, axis=-1)
    for k, name in enumerate(["shaft", "head", "neck", "other"]):
        print(f"  {name}: {(labels == k).mean() * 100:.1f}%")
    if args.out_ply:
        from syconn_tpu.proc.meshes import write_mesh2kzip

        mesh = ssv.load_mesh("sv")
        write_mesh2kzip(args.out_ply, mesh[0], mesh[1], None, None, "spiness.ply")
        print(f"mesh written to {args.out_ply}")


if __name__ == "__main__":
    main()
