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
