"""Multi-view "chunked multi-view network" (CMN) models.

Replaces the reference's elektronn3 2D-conv-over-views models
(reference: syconn/cnn/cnn_celltype_cmn.py:21-103
``StackedConv2ScalarWithLatentAdd``; view models for glia/axon/spine
semseg) operating on rendered 2D views of cell surfaces.

TPU-first notes: views arrive as (B, V, H, W, C) uint8 stacks; the conv
trunk runs per view (folded into the batch), view features fuse by
symmetric pooling (permutation invariant over views); bf16 on the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["MultiViewCMN", "TripletCMN", "ViewSemSegNet"]


class _ViewTrunk(nn.Module):
    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        h = (x.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
        for w in self.widths:
            h = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(h)
            h = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h).astype(self.dtype)
            h = nn.gelu(h)
        return jnp.mean(h, axis=(1, 2))  # (N, widths[-1])


class MultiViewCMN(nn.Module):
    """View-stack classifier (celltype / glia): per-view conv trunk +
    permutation-invariant fusion + optional scalar side inputs
    (syn-sign ratios etc., reference ``...WithLatentAdd``)."""

    n_classes: int = 8
    widths: Sequence[int] = (32, 64, 128, 256)
    n_scalar: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, views, scalars: Optional[jnp.ndarray] = None):
        b, v = views.shape[0], views.shape[1]
        flat = views.reshape((b * v,) + views.shape[2:])
        f = _ViewTrunk(self.widths, self.dtype)(flat).reshape(b, v, -1)
        g = jnp.concatenate([jnp.max(f, axis=1), jnp.mean(f, axis=1)], axis=-1)
        if self.n_scalar > 0:
            s = scalars if scalars is not None else jnp.zeros((b, self.n_scalar))
            g = jnp.concatenate([g, s.astype(g.dtype)], axis=-1)
        g = nn.gelu(nn.Dense(256, dtype=self.dtype)(g))
        return nn.Dense(self.n_classes, dtype=jnp.float32, name="head")(g)


class TripletCMN(nn.Module):
    """Morphology-embedding net (tCMN, reference: syconn/cnn/cnn_tnet*.py):
    same trunk, normalized embedding output; trained with a triplet loss."""

    embed_dim: int = 10
    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, views):
        b, v = views.shape[0], views.shape[1]
        flat = views.reshape((b * v,) + views.shape[2:])
        f = _ViewTrunk(self.widths, self.dtype)(flat).reshape(b, v, -1)
        g = jnp.concatenate([jnp.max(f, axis=1), jnp.mean(f, axis=1)], axis=-1)
        z = nn.Dense(self.embed_dim, dtype=jnp.float32, name="embed")(g)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-6)


class ViewSemSegNet(nn.Module):
    """Per-pixel view segmentation (spine/axon semseg on rendered views,
    reference: cnn_spineseg.py / cnn_axonseg.py): small 2D U-Net over
    single views."""

    n_classes: int = 5
    widths: Sequence[int] = (32, 64, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        h = (x.astype(jnp.float32) / 127.5 - 1.0).astype(self.dtype)
        skips = []
        for i, w in enumerate(self.widths):
            h = nn.Conv(w, (3, 3), padding="SAME", dtype=self.dtype)(h)
            h = nn.gelu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h).astype(self.dtype))
            if i < len(self.widths) - 1:
                skips.append(h)
                h = nn.Conv(self.widths[i + 1], (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(h)
        for i in reversed(range(len(self.widths) - 1)):
            h = nn.ConvTranspose(self.widths[i], (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = nn.Conv(self.widths[i], (3, 3), padding="SAME", dtype=self.dtype)(h)
            h = nn.gelu(nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h).astype(self.dtype))
        return nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32, name="head")(h)
