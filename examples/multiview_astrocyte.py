"""Glia/astrocyte classification of a standalone cell via multi-view CMN
(reference shape: examples/multiview_astrocyte.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--kzip", required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--nb_views", type=int, default=2)
    args = parser.parse_args()

    import jax.numpy as jnp

    from syconn_tpu.models.cmn import MultiViewCMN
    from syconn_tpu.models.io import get_or_init_model
    from syconn_tpu.proc.ssd_assembly import init_sso_from_kzip
    from syconn_tpu.render.views import render_sampled_sso

    ssv = init_sso_from_kzip(args.kzip)
    views, locs = render_sampled_sso(ssv, ws=(128, 64), nb_views=args.nb_views, comp_window=8000)
    print(f"rendered {len(views)} view locations")
    mpath = args.model or os.path.join(os.path.dirname(args.kzip), "models", "glia_cmn")
    model, params = get_or_init_model(
        mpath, lambda: (MultiViewCMN(n_classes=2, widths=(16, 32, 64)),
                        (1, args.nb_views, 128, 64, 4)),
    )
    # (L, nb_views, C, W, H) -> (L, nb_views, W, H, C)
    x = np.moveaxis(views, 2, -1).astype(np.float32)
    logits = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    glia_proba = float(probs[:, 1].mean())
    print(f"cell {ssv.id}: glia probability {glia_proba:.3f} "
          f"({'astrocyte' if glia_proba > 0.5 else 'neuron'})")


if __name__ == "__main__":
    main()
