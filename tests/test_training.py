import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_class_train_step_converges():
    import jax.numpy as jnp

    from syconn_tpu.models.pointnet import PointClassNet
    from syconn_tpu.models.train import make_class_train_step, make_train_state

    model = PointClassNet(n_classes=2, widths=(16, 32), k=4)
    state = make_train_state(model, (1, 64, 7), learning_rate=5e-3)
    step = make_class_train_step(dict_output=True)
    rng = np.random.default_rng(0)
    # two separable classes: clouds shifted along x
    xs, ys = [], []
    for k in range(2):
        for _ in range(8):
            pts = rng.normal(size=(64, 7)).astype(np.float32) * 0.1
            pts[:, 0] += (k * 2 - 1) * 0.8
            xs.append(pts)
            ys.append(k)
    x = np.stack(xs)
    y = np.asarray(ys, np.int32)
    accs = []
    for _ in range(30):
        state, m = step(state, jnp.asarray(x), jnp.asarray(y))
        accs.append(float(m["acc"]))
    assert accs[-1] > 0.9


def test_triplet_train_step_reduces_loss():
    import jax.numpy as jnp

    from syconn_tpu.models.pointnet import PointClassNet
    from syconn_tpu.models.train import make_train_state, make_triplet_train_step

    model = PointClassNet(n_classes=2, widths=(16, 32), k=4, embed_dim=4)
    state = make_train_state(model, (1, 64, 7), learning_rate=3e-3)
    # margin 1.0 so random embeddings start with nonzero loss
    step = make_triplet_train_step(margin=1.0)
    rng = np.random.default_rng(0)

    def cloud(shift):
        pts = rng.normal(size=(4, 64, 7)).astype(np.float32) * 0.1
        pts[..., 0] += shift
        return pts

    losses = []
    for _ in range(25):
        xa, xp, xn = cloud(-1.0), cloud(-1.0), cloud(1.0)
        state, m = step(state, jnp.asarray(xa), jnp.asarray(xp), jnp.asarray(xn))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_dense_volume_data(tmp_path, rng):
    from syconn_tpu.io.chunked import ChunkedVolume
    from syconn_tpu.models.traindata import DenseVolumeData

    p = str(tmp_path / "raw")
    vol = rng.integers(0, 255, (64, 64, 32), dtype=np.uint8)
    cv = ChunkedVolume.create(p, scale=(10, 10, 20), boundary=vol.shape, chunk_shape=(32, 32, 32))
    cv.save_raw(vol)

    def label_fn(off, size):
        return np.zeros(tuple(size), np.int32)

    it = iter(DenseVolumeData(p, label_fn, tile_shape=(32, 32, 16), batch_size=2))
    x, y = next(it)
    assert x.shape == (2, 32, 32, 16, 1)
    assert y.shape == (2, 32, 32, 16)


def test_model_performance_report():
    from syconn_tpu.proc.stats import model_performance

    probas = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]])
    labels = np.array([0, 1, 0])
    rep = model_performance(probas, labels)
    assert "precision" in rep and "confusion" in rep
