"""Pipeline parallelism over a ``pp`` mesh axis.

The reference scales across GPUs by process-level batch jobs (reference
syconn/mp/batchjob_utils.py); model parallelism beyond data-parallel does
not exist there. On TPU pods the idiomatic extra axis is a compute
pipeline: stages of a residual trunk live on successive devices along a
``pp`` mesh axis, microbatches stream through via ``ppermute`` ring sends
riding ICI, and ``lax.scan`` keeps the schedule a single compiled program.

Implementation is the classic GPipe schedule expressed with
``shard_map``: with S stages and M microbatches, T = M + S - 1 ticks; at
tick t device s computes microbatch t - s (predicated with ``jnp.where``
— control flow stays static for XLA). The whole pipeline is
differentiable: the backward of ``ppermute`` is the reverse ``ppermute``,
so ``jax.grad`` through :func:`pipeline_loss` yields the standard
forward+backward pipeline schedule without hand-written bubbles.

Stages must share one activation width (residual blocks), which is how
pipeline-friendly trunks are designed anyway.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.jaxcfg import setup_jax

setup_jax()

try:  # jax >= 0.4.30
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map

__all__ = [
    "init_stage_params",
    "stack_stage_params",
    "pipeline_apply",
    "pipeline_loss",
    "make_pipeline_train_step",
]


def init_stage_params(key, n_stages: int, width: int, n_layers: int = 2,
                      dtype=jnp.float32):
    """Residual-MLP stage params stacked on a leading (n_stages,) axis —
    the axis that shards over ``pp``. Each stage: ``n_layers`` dense
    layers of constant ``width`` with a residual connection."""
    keys = jax.random.split(key, n_stages * n_layers).reshape(n_stages, n_layers, 2)
    w = jax.vmap(
        jax.vmap(lambda k: jax.random.normal(k, (width, width), dtype)
                 * np.sqrt(2.0 / width))
    )(keys)
    b = jnp.zeros((n_stages, n_layers, width), dtype)
    return {"w": w, "b": b}


def stack_stage_params(per_stage):
    """Stack a list of per-stage pytrees into leading-axis-stacked params."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)


def _stage_fn(params, x):
    """One pipeline stage: residual MLP block. params: {'w': (L, d, d),
    'b': (L, d)} for the local stage."""
    h = x
    for i in range(params["w"].shape[0]):
        h = jnp.maximum(jnp.dot(h, params["w"][i]) + params["b"][i], 0.0)
    return x + h


def _pipeline_shard(params, x_mb, axis: str, stage_fn):
    """Body run per device under shard_map. ``params`` leading axis is the
    local pp shard (size 1); ``x_mb`` (M, mb, d) is replicated."""
    s = jax.lax.axis_index(axis)
    n_stages = jax.lax.psum(1, axis)
    local = jax.tree.map(lambda a: a[0], params)
    m = x_mb.shape[0]
    t_total = m + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    outs0 = jnp.zeros_like(x_mb)
    act0 = jnp.zeros_like(x_mb[0])
    # the scan carry varies per pp device while the zeros derive from the
    # replicated input — mark them varying for shard_map's axis typing
    if hasattr(jax.lax, "pvary"):
        act0, outs0 = jax.lax.pvary((act0, outs0), (axis,))

    def tick(carry, t):
        act_in, outs = carry
        # stage 0 injects microbatch t; later stages consume the ring input
        feed = x_mb[jnp.clip(t, 0, m - 1)]
        inp = jnp.where(s == 0, feed, act_in)
        out = stage_fn(local, inp)
        # microbatch leaving the last stage at tick t entered at t-(S-1)
        oi = t - (n_stages - 1)
        oi_c = jnp.clip(oi, 0, m - 1)
        write = (oi >= 0) & (oi < m) & (s == n_stages - 1)
        outs = outs.at[oi_c].set(jnp.where(write, out, outs[oi_c]))
        act_next = jax.lax.ppermute(out, axis, perm)
        return (act_next, outs), None

    (_, outs), _ = jax.lax.scan(tick, (act0, outs0), jnp.arange(t_total))
    # only the last stage holds real outputs; broadcast along the ring so
    # every device returns the same (out_specs = replicated)
    outs = jnp.where(s == n_stages - 1, outs, 0.0)
    return jax.lax.psum(outs, axis)


def pipeline_apply(params, x_mb, mesh: Mesh, axis: str = "pp",
                   stage_fn: Callable = _stage_fn):
    """Run the pipelined trunk. ``params`` pytree with leading axis
    n_stages (sharded over ``axis``); ``x_mb`` (n_microbatch, mb, d)
    replicated. Returns (n_microbatch, mb, d)."""
    f = shard_map(
        partial(_pipeline_shard, axis=axis, stage_fn=stage_fn),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), params), P()),
        out_specs=P(),
    )
    return f(params, x_mb)


def pipeline_loss(params, x_mb, y_mb, mesh: Mesh, axis: str = "pp",
                  stage_fn: Callable = _stage_fn):
    """Mean-squared-error through the pipeline (regression head keeps the
    demo self-contained; swap ``stage_fn``/loss for real models)."""
    out = pipeline_apply(params, x_mb, mesh, axis, stage_fn)
    return jnp.mean((out - y_mb) ** 2)


def make_pipeline_train_step(mesh: Mesh, axis: str = "pp",
                             stage_fn: Callable = _stage_fn,
                             lr: float = 1e-2):
    """SGD train step over the pipeline; params stay sharded over ``pp``."""

    @jax.jit
    def step(params, x_mb, y_mb):
        loss, grads = jax.value_and_grad(pipeline_loss)(
            params, x_mb, y_mb, mesh, axis, stage_fn
        )
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    def place(params):
        spec = jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), params)
        return jax.device_put(params, spec)

    return step, place
