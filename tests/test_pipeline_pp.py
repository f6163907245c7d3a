"""Pipeline-parallel axis (parallel/pipeline.py): GPipe schedule over a
'pp' mesh axis must match the serial stage composition exactly, including
gradients, and train."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from syconn_tpu.parallel.pipeline import (
    _stage_fn,
    init_stage_params,
    make_pipeline_train_step,
    pipeline_apply,
    pipeline_loss,
)

N_STAGES = 4


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:N_STAGES])
    return Mesh(devs, ("pp",))


def _serial(params, x):
    for s in range(N_STAGES):
        x = _stage_fn(jax.tree.map(lambda a: a[s], params), x)
    return x


def test_pipeline_forward_matches_serial(mesh):
    key = jax.random.PRNGKey(0)
    params = init_stage_params(key, N_STAGES, width=32)
    x_mb = jax.random.normal(jax.random.PRNGKey(1), (6, 8, 32))  # M=6 microbatches
    out = pipeline_apply(params, x_mb, mesh)
    ref = jax.vmap(lambda x: _serial(params, x))(x_mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match_serial(mesh):
    key = jax.random.PRNGKey(2)
    params = init_stage_params(key, N_STAGES, width=16)
    x_mb = jax.random.normal(jax.random.PRNGKey(3), (5, 4, 16))
    y_mb = jax.random.normal(jax.random.PRNGKey(4), (5, 4, 16))

    def serial_loss(p):
        out = jax.vmap(lambda x: _serial(p, x))(x_mb)
        return jnp.mean((out - y_mb) ** 2)

    g_pipe = jax.grad(pipeline_loss)(params, x_mb, y_mb, mesh)
    g_ser = jax.grad(serial_loss)(params)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(g_pipe[k]), np.asarray(g_ser[k]), rtol=1e-4, atol=1e-5
        )


def test_pipeline_train_step_learns(mesh):
    key = jax.random.PRNGKey(5)
    params = init_stage_params(key, N_STAGES, width=16)
    step, place = make_pipeline_train_step(mesh, lr=5e-3)
    params = place(params)
    x_mb = jax.random.normal(jax.random.PRNGKey(6), (4, 8, 16))
    y_mb = x_mb * 0.5 + 0.1
    losses = []
    for _ in range(30):
        params, loss = step(params, x_mb, y_mb)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    # params stayed sharded over pp
    shard_axis = params["w"].sharding.spec
    assert "pp" in str(shard_axis)
