"""Random-cube property extraction (reference: tests/test_mapobjects_dense.py
— random uint64 cubes through map_subcell_extract_props)."""

import numpy as np
import pytest


def test_random_uint64_cubes(rng):
    from syconn_tpu.ops.props import map_subcell_extract_props

    cell = rng.integers(0, 1 << 40, size=(24, 24, 16)).astype(np.uint64)
    cell[rng.random(cell.shape) < 0.3] = 0
    sub = rng.integers(0, 1 << 40, size=(2, 24, 24, 16)).astype(np.uint64)
    sub[rng.random(sub.shape) < 0.5] = 0
    cell_props, sc_props, mappings = map_subcell_extract_props(cell, sub)
    rep_dc, bb_dc, sz_dc = cell_props
    el, cnt = np.unique(cell, return_counts=True)
    cnt, el = cnt[el != 0], el[el != 0]
    assert set(sz_dc.keys()) == {int(e) for e in el}
    for e, c in zip(el, cnt):
        assert sz_dc[int(e)] == int(c)
        r = rep_dc[int(e)]
        assert cell[r[0], r[1], r[2]] == e
    # mapping counts exact for a sample of pairs
    for ii in range(2):
        for sc_id, inner in list(mappings[ii].items())[:20]:
            for c_id, n in inner.items():
                assert n == int(((sub[ii] == sc_id) & (cell == c_id)).sum())


def test_dense_unet_learns_blobs(rng):
    """The patchified U-Net must learn a simple intensity->label mapping
    (bright blobs = class 1) — end-to-end training-harness check."""
    import jax.numpy as jnp

    from syconn_tpu.models.train import make_train_state, make_train_step
    from syconn_tpu.models.unet3d import UNet3D

    def sample_batch(b=2):
        xs, ys = [], []
        for _ in range(b):
            vol = np.full((32, 32, 16), 80, np.float32)
            lab = np.zeros((32, 32, 16), np.int32)
            for _ in range(4):
                c = rng.integers(6, 26, 3)
                r = int(rng.integers(3, 6))
                xx, yy, zz = np.ogrid[:32, :32, :16]
                ball = (xx - c[0]) ** 2 + (yy - c[1]) ** 2 + ((zz - c[2]) * 2) ** 2 < r**2
                vol[ball] = 200
                lab[ball] = 1
            vol += rng.normal(0, 10, vol.shape)
            xs.append(np.clip(vol, 0, 255)[..., None])
            ys.append(lab)
        return np.stack(xs), np.stack(ys)

    model = UNet3D(features=(16, 32), strides=((2, 2, 2),), patch=(2, 2, 2), n_classes=2)
    state = make_train_state(model, (1, 32, 32, 16, 1), learning_rate=3e-3)
    step = make_train_step()
    acc = 0.0
    for i in range(60):
        x, y = sample_batch()
        state, m = step(state, jnp.asarray(x), jnp.asarray(y))
        acc = float(m["acc"])
    assert acc > 0.9, f"dense U-Net failed to learn blob segmentation (acc={acc})"
