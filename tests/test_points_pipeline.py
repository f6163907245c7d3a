"""Cross-cell pipelined point inference (reference:
syconn/handler/prediction_pts.py:294 producer/consumer shape).

The round-2 per-cell loop dispatched one short batch per cell; the
pipeline must pack contexts from many cells into full fixed-shape device
batches while loader/writer threads overlap the device."""

import numpy as np


class _CountingPredictor:
    """ContextPredictor stand-in that records batch occupancy."""

    def __init__(self, batch=16, npoints=64, n_feat=4):
        self.batch = batch
        self.npoints = npoints
        self.n_feat = n_feat
        self.dispatched = []  # rows per dispatch (before padding)

    def dispatch(self, chunk):
        self.dispatched.append(len(chunk))
        if len(chunk) < self.batch:
            pad = np.zeros((self.batch - len(chunk),) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        # "model": per-context mean of the first coordinate column
        return {"logits": chunk[:, :, 0].mean(axis=1, keepdims=True)}

    def fetch(self, dev):
        return dev


def test_pipeline_batches_across_items_and_matches_serial():
    from syconn_tpu.inference.points import ContextPipeline

    rng = np.random.default_rng(0)
    B = 16
    # 64 "cells" with 3-7 contexts each — every cell smaller than the batch
    items = list(range(64))
    ctx_of = {
        i: rng.normal(size=(int(rng.integers(3, 8)), 64, 7)).astype(np.float32)
        for i in items
    }
    total = sum(len(c) for c in ctx_of.values())

    pred = _CountingPredictor(batch=B)
    pipe = ContextPipeline(pred, n_loaders=4, n_writers=4)

    def load(i):
        return ctx_of[i], None

    got = {}

    def post(i, out, aux):
        got[i] = out["logits"][:, 0]
        return 1

    n = sum(pipe.run(items, load, post))
    assert n == len(items)

    # correctness: per-item outputs equal the serial computation
    for i in items:
        expect = ctx_of[i][:, :, 0].mean(axis=1)
        assert np.allclose(got[i], expect), i

    # the device batch stays full: every dispatch except possibly the last
    # carries a full batch, and the dispatch count is the theoretical
    # minimum — NOT one-dispatch-per-cell
    assert pipe.n_rows == total
    assert len(pred.dispatched) == -(-total // B)
    assert all(d == B for d in pred.dispatched[:-1])
    assert len(pred.dispatched) < len(items) // 2


def test_pipeline_handles_empty_items():
    from syconn_tpu.inference.points import ContextPipeline

    pred = _CountingPredictor(batch=4)
    pipe = ContextPipeline(pred)

    def load(i):
        if i % 2 == 0:
            return None, f"aux{i}"
        return np.ones((2, 64, 7), np.float32) * i, None

    seen = {}

    def post(i, out, aux):
        seen[i] = (out is None, aux)
        return 1

    n = sum(pipe.run(list(range(10)), load, post))
    assert n == 10
    for i in range(10):
        if i % 2 == 0:
            assert seen[i] == (True, f"aux{i}")
        else:
            assert seen[i][0] is False


def test_context_predictor_mesh_sharded_matches_serial():
    """Mesh-sharded point inference (VERDICT r3 weak #6): with a ``data``
    axis over all 8 virtual devices, ContextPredictor must (a) produce
    exactly the single-device outputs on >= 64 cells' contexts and (b)
    physically divide every dispatched batch across all devices — each
    device holds batch/N rows, so on real chips per-batch latency is the
    single-chip time at 1/N occupancy (virtual CPU devices share one core,
    so wall-clock N x cannot be asserted here)."""
    import jax
    from jax.sharding import Mesh

    from syconn_tpu.inference.points import ContextPipeline, ContextPredictor
    from syconn_tpu.models.io import init_model_params
    from syconn_tpu.models.pointnet import PointClassNet

    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.array(devs), ("data",))

    npoints, nf = 128, 4
    model = PointClassNet(n_classes=8, widths=(16, 32), k=4)
    params = init_model_params(model, (1, npoints, 3 + nf))

    rng = np.random.default_rng(7)
    items = list(range(64))
    ctx_of = {
        i: rng.normal(size=(int(rng.integers(2, 6)), npoints, 3 + nf)).astype(
            np.float32)
        for i in items
    }

    def run(pred):
        pipe = ContextPipeline(pred, n_loaders=2, n_writers=2)
        got = {}

        def load(i):
            return ctx_of[i], None

        def post(i, out, aux):
            got[i] = out["logits"]
            return 1

        assert sum(pipe.run(items, load, post)) == len(items)
        return got

    serial = run(ContextPredictor(model, params, npoints=npoints, batch=16))
    pred_m = ContextPredictor(model, params, npoints=npoints, batch=16, mesh=mesh)
    assert pred_m.batch == 16  # multiple of 8 already
    sharded = run(pred_m)

    for i in items:
        np.testing.assert_allclose(sharded[i], serial[i], rtol=1e-5, atol=1e-5)

    # physical division of work: a dispatched batch lands 2 rows per device
    dev_out = pred_m.dispatch(np.stack([ctx_of[0][0]] * 16))
    shards = dev_out["logits"].addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape[0] == 2 for s in shards)
    assert len({s.device for s in shards}) == 8


def test_context_predictor_mesh_rounds_batch_up():
    import jax
    from jax.sharding import Mesh

    from syconn_tpu.inference.points import ContextPredictor
    from syconn_tpu.models.io import init_model_params
    from syconn_tpu.models.pointnet import PointClassNet

    mesh = Mesh(np.array(jax.devices()), ("data",))
    model = PointClassNet(n_classes=4, widths=(16,), k=4)
    params = init_model_params(model, (1, 64, 7))
    pred = ContextPredictor(model, params, npoints=64, batch=10, mesh=mesh)
    assert pred.batch == 16  # rounded up to a multiple of 8
    out = pred.dispatch(np.zeros((3, 64, 7), np.float32))
    assert np.asarray(out["logits"]).shape[0] == 16


def test_hybrid_celltype_global_scalars():
    """PointClassNet(n_global=k) consumes contexts with k trailing constant
    channels (append_global_scalars), and the packaged-meta norm round-trips
    through save_model/load_model (the deployed hybrid celltype path)."""
    import tempfile

    import jax

    from syconn_tpu.inference.points import append_global_scalars
    from syconn_tpu.models.io import (init_model_params, load_model,
                                      load_model_meta, save_model)
    from syconn_tpu.models.pointnet import PointClassNet

    rng = np.random.default_rng(0)
    ctxs = rng.normal(size=(3, 64, 7)).astype(np.float32)
    scal = np.arange(5, dtype=np.float32)
    mu, sd = np.ones(5, np.float32), 2 * np.ones(5, np.float32)
    x = append_global_scalars(ctxs, scal, (mu, sd))
    assert x.shape == (3, 64, 12)
    # constant per point, normalized
    assert np.allclose(x[:, :, 7:], ((scal - mu) / (sd + 1e-9))[None, None])
    assert np.allclose(x[:, :, :7], ctxs)

    model = PointClassNet(n_classes=4, widths=(16,), k=4, n_global=5)
    params = init_model_params(model, (1, 64, 12))
    out = model.apply({"params": params}, x)
    assert np.asarray(out["logits"]).shape == (3, 4)
    # the scalars must influence the logits (routed around the backbone)
    out2 = model.apply({"params": params},
                       append_global_scalars(ctxs, scal + 3.0, (mu, sd)))
    assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))

    with tempfile.TemporaryDirectory() as d:
        save_model(d, model, params, extra_meta={
            "npoints": 64, "ctx_nm": 3200.0,
            "global_norm_mu": [float(v) for v in mu],
            "global_norm_sd": [float(v) for v in sd]})
        m2, p2 = load_model(d)
        meta = load_model_meta(d)
        assert m2.n_global == 5
        assert np.allclose(meta["global_norm_mu"], mu)
        out3 = m2.apply({"params": p2}, x)
        assert np.allclose(np.asarray(out["logits"]),
                           np.asarray(out3["logits"]), atol=1e-5)
