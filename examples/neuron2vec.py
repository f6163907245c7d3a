"""Unsupervised morphology embeddings for a set of cell archives
(reference shape: examples/neuron2vec.py — triplet-trained embedding)."""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kzip_dir", required=True, help="directory of *.k.zip cells")
    parser.add_argument("--model", default=None)
    args = parser.parse_args()

    from syconn_tpu.inference.points import ContextPredictor, extract_contexts, sso2pointcloud
    from syconn_tpu.models.io import get_or_init_model
    from syconn_tpu.models.pointnet import PointClassNet
    from syconn_tpu.proc.ssd_assembly import init_ssd_from_kzips

    cells = init_ssd_from_kzips(args.kzip_dir)
    print(f"{len(cells)} cells loaded")
    mpath = args.model or os.path.join(args.kzip_dir, "models", "tnet_pts")
    model, params = get_or_init_model(
        mpath, lambda: (PointClassNet(n_classes=2, embed_dim=10), (1, 2048, 7))
    )
    pred = ContextPredictor(model, params, npoints=2048)
    embeddings = {}
    for ssv in cells:
        coords, types = sso2pointcloud(ssv)
        if len(coords) == 0:
            continue
        ctxs, _ = extract_contexts(coords, types, ctx_size_nm=20000, npoints=2048, n_contexts=8)
        out = pred.predict(ctxs)
        embeddings[ssv.id] = out["embedding"].mean(axis=0)
        print(f"cell {ssv.id}: z = {np.round(embeddings[ssv.id], 3)}")
    # pairwise distances
    ids = sorted(embeddings)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = np.linalg.norm(embeddings[ids[i]] - embeddings[ids[j]])
            print(f"  d({ids[i]}, {ids[j]}) = {d:.3f}")


if __name__ == "__main__":
    main()
