"""Axon/dendrite/soma compartment prediction on a standalone cell archive
(reference shape: examples/semseg_axon.py — kzip cell + semseg + skeleton
mapping, no working directory needed)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kzip", required=True, help="cell archive (*.k.zip)")
    parser.add_argument("--model", default=None, help="compartment model dir")
    parser.add_argument("--out", default=None, help="output kzip with annotated skeleton")
    args = parser.parse_args()

    from syconn_tpu.inference.points import ContextPredictor, extract_contexts, sso2pointcloud
    from syconn_tpu.models.io import get_or_init_model
    from syconn_tpu.models.pointnet import PointSegNet
    from syconn_tpu.proc.ssd_assembly import init_sso_from_kzip
    from syconn_tpu.skeleton.io import skeleton_to_kzip

    ssv = init_sso_from_kzip(args.kzip)
    coords, types = sso2pointcloud(ssv)
    print(f"cell {ssv.id}: {len(coords)} surface points")
    mpath = args.model or os.path.join(os.path.dirname(args.kzip), "models", "compartment_pts")
    model, params = get_or_init_model(mpath, lambda: (PointSegNet(n_classes=3), (1, 2048, 7)))
    pred = ContextPredictor(model, params, npoints=2048)
    ctxs, idx_lists = extract_contexts(coords, types, ctx_size_nm=20000, npoints=2048)
    out = pred.predict(ctxs)
    vote = np.zeros((len(coords), out.shape[-1]), np.float32)
    for m, ixs in enumerate(idx_lists):
        probs = np.exp(out[m]) / np.exp(out[m]).sum(-1, keepdims=True)
        np.add.at(vote, ixs, probs)
    labels = np.argmax(vote, axis=-1)
    names = ["dendrite", "axon", "soma"]
    for k, name in enumerate(names):
        print(f"  {name}: {(labels == k).mean() * 100:.1f}% of surface")
    if ssv.load_skeleton() and args.out:
        from scipy import spatial

        sk = ssv.skeleton
        nodes = np.asarray(sk["nodes"], np.float64) * np.asarray(ssv.scaling)[None]
        _, ixs = spatial.cKDTree(coords).query(nodes)
        sk["axoness"] = labels[ixs]
        skeleton_to_kzip(sk, args.out, scaling=ssv.scaling, comment="axoness")
        print(f"annotated skeleton written to {args.out}")


if __name__ == "__main__":
    main()
