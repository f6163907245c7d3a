"""Point-cloud models for cell-level inference (celltype, glia,
compartments, morphology embeddings).

Replaces the reference's LightConvPoint/MorphX point models
(reference: syconn/handler/prediction_pts.py:1698-1767 model factories;
training scripts syconn/cnn/cnn_celltype_ptcnv*.py etc.) with a TPU-first
design: fixed-size point contexts (static shapes for XLA), per-point MLPs
on the MXU, and symmetric global pooling — a PointNet-style backbone with a
local-neighborhood aggregation stage (kNN gather + max) that captures local
geometry without dynamic structures.

Inputs are (B, N, 3 + F): normalized xyz + feature channels (one-hot object
type: cell surface / mitochondrion / vesicle cloud / synapse, plus optional
myelin flag — reference: prediction_pts.py:2452 ``sso2hc``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["PointClassNet", "PointSegNet", "knn_group"]


def knn_group(xyz: jnp.ndarray, feats: jnp.ndarray, k: int = 16) -> jnp.ndarray:
    """Aggregate each point's k nearest neighbors' features (max pool).

    Dense distance matrix (N x N) — contexts are <= 4096 points, so this
    maps onto the MXU instead of irregular gather structures.
    """
    d2 = jnp.sum((xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)  # (B,N,N)
    _, idx = jax.lax.top_k(-d2, k)  # (B, N, k)
    # plain per-batch gather (vmap) — an explicit (B, N, N, C) broadcast
    # before the gather would be O(N^2 C) memory
    grouped = jax.vmap(lambda f, ix: f[ix])(feats, idx)  # (B, N, k, C)
    return jnp.max(grouped, axis=2)


class _PointBackbone(nn.Module):
    widths: Sequence[int] = (64, 128, 256)
    k: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    knn_stages: int = 1

    @nn.compact
    def __call__(self, pts):
        xyz = pts[..., :3].astype(jnp.float32)
        h = pts.astype(self.dtype)
        for i, w in enumerate(self.widths):
            h = nn.Dense(w, dtype=self.dtype)(h)
            h = nn.LayerNorm(dtype=jnp.float32)(h).astype(self.dtype)
            h = nn.gelu(h)
            if i < self.knn_stages:
                # local-geometry aggregation stage(s): stacking them grows
                # the receptive field (neighbors-of-neighbors), which
                # per-point MLP + one global pool cannot express
                h = jnp.concatenate([h, knn_group(xyz, h, self.k)], axis=-1)
        return h  # (B, N, widths[-1] [+ widths[i] per knn stage concat])


class PointClassNet(nn.Module):
    """Whole-context classification / embedding net (celltype, glia,
    triplet morphology embeddings).

    ``n_global`` > 0: the LAST n_global feature channels of every point are
    per-CELL scalars (constant across the context — global morphology:
    path length, soma caliber, myelin fraction, organelle/synapse
    densities). They bypass the point backbone and join the pooled context
    embedding — the reference's celltype CMN injects whole-cell scalars
    (syn-sign ratio) beside the conv features the same way
    (syconn/cnn/cnn_celltype_cmn.py:21-103 StackedConv2ScalarWithLatentAdd).
    """

    n_classes: int = 8
    widths: Sequence[int] = (64, 128, 256)
    k: int = 16
    embed_dim: int = 0  # >0: also emit an embedding head (tCMN analog)
    dtype: jnp.dtype = jnp.bfloat16
    knn_stages: int = 1
    n_global: int = 0

    @nn.compact
    def __call__(self, pts):
        scal = None
        if self.n_global > 0:
            scal = pts[:, 0, -self.n_global:].astype(jnp.float32)
            pts = pts[..., : pts.shape[-1] - self.n_global]
        h = _PointBackbone(self.widths, self.k, self.dtype, self.knn_stages)(pts)
        g = jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], axis=-1)
        if scal is not None:
            s = nn.Dense(64, dtype=jnp.float32, name="global_proj")(scal)
            s = nn.gelu(nn.LayerNorm(dtype=jnp.float32)(s))
            g = jnp.concatenate([g, s.astype(g.dtype)], axis=-1)
        g = nn.Dense(256, dtype=self.dtype)(g)
        g = nn.gelu(nn.LayerNorm(dtype=jnp.float32)(g).astype(self.dtype))
        out = {}
        logits = nn.Dense(self.n_classes, dtype=jnp.float32, name="cls_head")(g)
        out["logits"] = logits
        if self.embed_dim > 0:
            z = nn.Dense(self.embed_dim, dtype=jnp.float32, name="embed_head")(g)
            out["embedding"] = z / jnp.maximum(
                jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-6
            )
        return out


class PointSegNet(nn.Module):
    """Per-point semantic segmentation (compartments: dendrite/axon/soma
    (+ bouton/terminal), spines; glia vertices)."""

    n_classes: int = 3
    widths: Sequence[int] = (64, 128, 256)
    k: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    knn_stages: int = 1

    @nn.compact
    def __call__(self, pts):
        h = _PointBackbone(self.widths, self.k, self.dtype, self.knn_stages)(pts)
        g = jnp.max(h, axis=1, keepdims=True)  # global context
        hg = jnp.concatenate([h, jnp.broadcast_to(g, h.shape[:-1] + (g.shape[-1],))], axis=-1)
        hg = nn.Dense(128, dtype=self.dtype)(hg)
        hg = nn.gelu(nn.LayerNorm(dtype=jnp.float32)(hg).astype(self.dtype))
        return nn.Dense(self.n_classes, dtype=jnp.float32, name="seg_head")(hg)
