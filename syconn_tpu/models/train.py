"""Training harness for dense voxel models.

Replaces the reference's elektronn3 ``Trainer``/``StoppableTrainer`` usage
(reference: syconn/cnn/cnn_myelin.py and 21 sibling scripts) with a jitted
optax loop. Sharding: parameters replicated, batch sharded over the mesh's
"data" axis, and optionally the z-axis of the volume over "sp" — XLA's SPMD
partitioner inserts the halo exchanges for spatially partitioned
convolutions and the gradient psums over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["TrainState", "make_train_state", "make_train_step", "train_dense"]


class TrainState(train_state.TrainState):
    pass


def make_train_state(
    model,
    example_shape: Tuple[int, ...],
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    seed: int = 0,
    total_steps: Optional[int] = None,
) -> TrainState:
    """``total_steps`` switches the constant LR to linear-warmup (3%) +
    cosine decay to lr/30 — measurably better final accuracy on the small
    point models than a flat 1e-3 (the reference's elektronn3 schedulers
    play the same role, e.g. cnn_celltype_ptcnv.py's StepLR)."""
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros(example_shape, jnp.float32))["params"]
    if total_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate / 10.0,
            peak_value=learning_rate,
            warmup_steps=max(int(total_steps * 0.03), 1),
            decay_steps=int(total_steps),
            end_value=learning_rate / 30.0,
        )
    else:
        lr = learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def softmax_xent_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, class_weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels; label -1 = ignore.
    ``class_weights`` re-weights per-voxel losses by their label's weight
    (for heavily imbalanced dense targets)."""
    valid = labels >= 0
    safe_labels = jnp.maximum(labels, 0)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, safe_labels)
    w = valid.astype(losses.dtype)
    if class_weights is not None:
        w = w * class_weights[safe_labels]
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1e-6)


def weighted_xent(class_weights) -> Callable:
    cw = jnp.asarray(class_weights, jnp.float32)

    def loss(logits, labels):
        return softmax_xent_loss(logits, labels, class_weights=cw)

    return loss


def state_shardings(state, mesh: Mesh, tensor_axis: str = "tp"):
    """Tensor-parallel parameter layout: every kernel's output-feature
    (last) dim shards over ``tensor_axis`` when divisible; optimizer moments
    mirror the parameters. XLA SPMD partitions the conv contractions and
    inserts the reduce-scatters/all-gathers."""
    tp = mesh.shape.get(tensor_axis, 1)

    def spec_of(leaf):
        if (
            tp > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.shape[-1] % tp == 0
            and leaf.shape[-1] >= 2 * tp
        ):
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + [tensor_axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_of, state)


def make_train_step(
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    spatial_axis: Optional[str] = "sp",
    tensor_axis: Optional[str] = None,
    loss_fn: Callable = softmax_xent_loss,
    state_template=None,
):
    """Build a jitted ``step(state, x, y) -> (state, metrics)``.

    With a mesh: batch shards over ``data_axis``; the volume's z-axis over
    ``spatial_axis`` (XLA inserts conv halo exchanges); with ``tensor_axis``
    (requires ``state_template`` for the layout) parameters shard
    tensor-parallel over their feature dims.
    """

    def step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray):
        def compute_loss(params):
            logits = state.apply_fn({"params": params}, x)
            return loss_fn(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        valid = y >= 0
        acc = jnp.sum((jnp.argmax(logits, -1) == y) & valid) / jnp.maximum(
            jnp.sum(valid), 1)  # ignore-label (-1) points excluded
        return new_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    spatial = spatial_axis if spatial_axis in mesh.axis_names else None
    x_spec = P(data_axis, None, None, spatial, None)
    y_spec = P(data_axis, None, None, spatial)
    repl = NamedSharding(mesh, P())
    if tensor_axis and tensor_axis in mesh.axis_names and state_template is not None:
        state_shard = state_shardings(state_template, mesh, tensor_axis)
    else:
        state_shard = repl
    return jax.jit(
        step,
        in_shardings=(state_shard, NamedSharding(mesh, x_spec), NamedSharding(mesh, y_spec)),
        out_shardings=(state_shard, repl),
        donate_argnums=(0,),
    )


def make_class_train_step(mesh: Optional[Mesh] = None, dict_output: bool = False):
    """Jitted classification step; handles models that return dicts with a
    'logits' entry (PointClassNet)."""

    def step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray):
        def compute_loss(params):
            out = state.apply_fn({"params": params}, x)
            logits = out["logits"] if dict_output else out
            return softmax_xent_loss(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        valid = y >= 0
        acc = jnp.sum((jnp.argmax(logits, -1) == y) & valid) / jnp.maximum(
            jnp.sum(valid), 1)  # ignore-label (-1) points excluded
        return new_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, dsh, dsh), out_shardings=(repl, repl), donate_argnums=(0,))


def triplet_loss(za: jnp.ndarray, zp: jnp.ndarray, zn: jnp.ndarray, margin: float = 0.2):
    """Margin triplet loss on normalized embeddings (tCMN training,
    reference: syconn/cnn/cnn_tnet*.py)."""
    d_ap = jnp.sum((za - zp) ** 2, axis=-1)
    d_an = jnp.sum((za - zn) ** 2, axis=-1)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))


def make_triplet_train_step(embed_key: Optional[str] = "embedding", margin: float = 0.2):
    """Jitted triplet step for embedding models (dict output with
    ``embedding``, or a raw embedding output when ``embed_key`` is None)."""

    def step(state: TrainState, xa, xp, xn):
        def compute_loss(params):
            def emb(x):
                out = state.apply_fn({"params": params}, x)
                return out[embed_key] if embed_key else out

            return triplet_loss(emb(xa), emb(xp), emb(xn), margin)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def train_dense(
    model,
    data_iter: Iterator[Tuple[np.ndarray, np.ndarray]],
    n_steps: int,
    example_shape: Tuple[int, ...],
    learning_rate: float = 1e-3,
    mesh: Optional[Mesh] = None,
    log_every: int = 50,
    state: Optional[TrainState] = None,
    log=None,
):
    """Train on an iterator of (x, y) batches; returns the final state."""
    if state is None:
        state = make_train_state(model, example_shape, learning_rate)
    step_fn = make_train_step(mesh)
    history = []
    for i in range(n_steps):
        x, y = next(data_iter)
        state, metrics = step_fn(state, jnp.asarray(x), jnp.asarray(y))
        if (i + 1) % log_every == 0 or i == n_steps - 1:
            m = jax.device_get(metrics)
            history.append((i + 1, float(m["loss"]), float(m["acc"])))
            if log is not None:
                log.info("step %d loss %.4f acc %.4f", i + 1, m["loss"], m["acc"])
    return state, history
