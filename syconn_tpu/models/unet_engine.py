"""Inference engine for :class:`syconn_tpu.models.unet3d.UNet3D` with the
fused Pallas conv blocks.

Replays the exact module graph of ``UNet3D.__call__`` from the flax params
pytree, but runs every SAME-padded 3x3x3 ConvBlock through
:func:`syconn_tpu.ops.conv3d_pallas.conv3x3x3_ln_gelu` (27 accumulated MXU
matmuls + fused LayerNorm/GELU epilogue, ~87% of the net's FLOPs) while
the cheap strided/transpose convs and the 1x1x1 head stay on XLA. Training
keeps the flax module; serving swaps in this engine (inference/dense.py)
when SYCONN_TPU_PALLAS_CONV permits — the separation mirrors the
reference's train-in-elektronn3 / serve-compiled split
(syconn/handler/prediction.py:594).

Numerics: identical op order per layer; conv tap accumulation order
differs from XLA's conv schedule (both f32 accumulations rounded to bf16)
— agreement to bf16 resolution, asserted in tests/test_conv_pallas.py.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv3d_pallas import conv3x3x3_ln_gelu
from .unet3d import UNet3D, space_to_depth

__all__ = ["unet_apply_packed", "engine_supported"]


def engine_supported(model) -> bool:
    """The engine covers the UNet3D family as built by ``unet_variants``:
    SAME 3x3x3 conv blocks, stride-2 transitions, patchify stem."""
    return isinstance(model, UNet3D)


def _block(params, name, h, interpret):
    p = params[name]
    for i in range(2):
        h = conv3x3x3_ln_gelu(
            h,
            p[f"Conv_{i}"]["kernel"],
            p[f"Conv_{i}"]["bias"],
            p[f"LayerNorm_{i}"]["scale"],
            p[f"LayerNorm_{i}"]["bias"],
            interpret=interpret,
        )
    return h


_DN = ("NDHWC", "DHWIO", "NDHWC")


def _engine_opt(name: str, default: bool = True) -> bool:
    """Per-component engine toggles for on-chip A/B timing
    (``SYCONN_TPU_ENGINE_{UP_PHASES,DOWN_PHASES,FUSED_HEAD}=0|1``).
    The r5 refinements were committed under a wedged device link; these
    flags let bench.py attribute wall-clock to each one on real hardware
    without rebuilding the engine."""
    v = os.environ.get(f"SYCONN_TPU_ENGINE_{name}")
    return default if v is None else v == "1"


def _down(params, name, h, stride, interpret):
    """Strided transition conv: stride-2 SAME runs through the
    phase-decomposed Pallas kernel (27 half-res matmuls, the last ~7% of
    model FLOPs that r4 left on XLA's Conv3D lowering); other strides or
    odd extents fall back to XLA."""
    from ..ops.conv3d_pallas import conv_down2x_bias

    p = params[name]
    even = all(int(s) % 2 == 0 for s in h.shape[1:4])
    if (tuple(int(s) for s in stride) == (2, 2, 2) and even
            and _engine_opt("DOWN_PHASES")):
        return conv_down2x_bias(h, p["kernel"], p["bias"],
                                interpret=interpret)
    y = jax.lax.conv_general_dilated(
        h, p["kernel"].astype(jnp.bfloat16),
        window_strides=tuple(int(s) for s in stride), padding="SAME",
        dimension_numbers=_DN,
    )
    return y + p["bias"].astype(jnp.bfloat16)


def _up(params, name, h, stride, interpret):
    """flax ConvTranspose (SAME, k=3, s=2) via the subpixel-phase Pallas
    kernel (ops/conv3d_pallas.conv_transpose2x_bias): each output parity
    phase is a small conv over the half-res input with its own tap subset,
    so the MXU does exactly the transpose conv's FLOPs (the r4 engine's
    zero-stuffed formulation did 8x that, 7/8 of it on stuffed zeros).
    ``SYCONN_TPU_ENGINE_UP_PHASES=0`` selects the zero-stuffed fused
    formulation instead (more FLOPs but one large aligned kernel — the
    faster choice is an empirical, per-chip question).
    Non-2 strides fall back to lax.conv_transpose."""
    from ..ops.conv3d_pallas import conv_transpose2x_bias

    p = params[name]
    if tuple(int(s) for s in stride) != (2, 2, 2):
        y = jax.lax.conv_transpose(
            h, p["kernel"].astype(jnp.bfloat16),
            strides=tuple(int(s) for s in stride), padding="SAME",
            dimension_numbers=_DN, transpose_kernel=False,
        )
        return y + p["bias"].astype(jnp.bfloat16)
    if not _engine_opt("UP_PHASES"):
        # zero-stuffed: SAME 3x3x3 conv over the 2x dilated volume with
        # the input at ODD indices ((2,1) transpose padding absorbed into
        # the stuffing offset; exact vs nn.ConvTranspose)
        b, X, Y, Z, C = h.shape
        xd = jnp.zeros((b, 2 * X, 2 * Y, 2 * Z, C), jnp.bfloat16)
        xd = xd.at[:, 1::2, 1::2, 1::2, :].set(h.astype(jnp.bfloat16))
        zeros = jnp.zeros((p["kernel"].shape[-1],), jnp.float32)
        return conv3x3x3_ln_gelu(
            xd, p["kernel"], p["bias"], zeros, zeros,
            interpret=interpret, epilogue="bias",
        )
    return conv_transpose2x_bias(h, p["kernel"], p["bias"],
                                 interpret=interpret)


def unet_apply_packed(model: UNet3D, params, x, interpret: bool = None):
    """= ``model.apply({'params': params}, x, full_res=False)`` with the
    Pallas conv blocks. x: (B, X, Y, Z, 1) raw voxels (uint8 value range).
    Returns packed logits (B, X/px, Y/py, Z/pz, n_classes * pvox)."""
    if interpret is None:
        # Mosaic kernels need a TPU; CPU (tests, opt-in) interprets
        interpret = jax.default_backend() == "cpu"
    feats: Tuple[int, ...] = tuple(model.features)
    depth = len(feats)
    h = (x.astype(jnp.float32) / 127.5 - 1.0).astype(jnp.bfloat16)
    h = space_to_depth(h, tuple(model.patch))
    skips = []
    for i in range(depth):
        h = _block(params, f"ConvBlock_{i}", h, interpret)
        if i < depth - 1:
            skips.append(h)
            h = _down(params, f"Conv_{i}", h, model.strides[i], interpret)
    hp = params["head"]
    for k, i in enumerate(reversed(range(depth - 1))):
        h = _up(params, f"ConvTranspose_{k}", h, model.strides[i], interpret)
        h = jnp.concatenate([h, skips[i].astype(jnp.bfloat16)], axis=-1)
        name = f"ConvBlock_{depth + k}"
        if i == 0 and _engine_opt("FUSED_HEAD"):
            # final decoder block: fuse the 1x1x1 head into the second
            # conv's epilogue — the full-res activation never leaves VMEM
            p = params[name]
            h = conv3x3x3_ln_gelu(
                h, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
                interpret=interpret,
            )
            return conv3x3x3_ln_gelu(
                h, p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
                p["LayerNorm_1"]["scale"], p["LayerNorm_1"]["bias"],
                interpret=interpret,
                head_w=hp["kernel"], head_b=hp["bias"],
            )
        h = _block(params, name, h, interpret)
    # depth == 1 (no decoder): head on XLA
    hf = h.astype(jnp.float32)
    head = jax.lax.conv_general_dilated(
        hf, hp["kernel"].astype(jnp.float32), window_strides=(1, 1, 1),
        padding="SAME", dimension_numbers=_DN,
    ) + hp["bias"].astype(jnp.float32)
    return head


def unet_apply_full(model: UNet3D, params, x, interpret: bool = None):
    """Full-resolution variant (mirrors ``full_res=True``)."""
    from .unet3d import depth_to_space

    head = unet_apply_packed(model, params, x, interpret=interpret)
    pvox = int(np.prod(model.patch))
    b, sx, sy, sz, _ = head.shape
    lg = head.reshape(b, sx, sy, sz, model.n_classes, pvox)
    lg = jnp.moveaxis(lg, -2, -1)
    return depth_to_space(lg.reshape(b, sx, sy, sz, -1), tuple(model.patch))


def unet_flops(model: UNet3D, in_shape) -> float:
    """Analytic forward FLOPs for one (B, X, Y, Z) uint8 input: 2*27*S*
    Cin*Cout per 3x3x3 conv, the 1x1x1 head at 2*S*Cin*Cout. Transpose
    convs count at INPUT (half) resolution — 27 taps over S/8 positions —
    which is exactly what the subpixel-phase kernel executes; the r4
    accounting credited the zero-stuffed formulation's 8x work as
    "achieved" FLOPs (ADVICE r4). Used by bench.py when the Pallas engine
    is active: XLA cost analysis reports 0 flops for custom calls, which
    would fake a low MFU."""
    B, X, Y, Z = (int(v) for v in in_shape[:4])
    p = tuple(int(v) for v in model.patch)
    feats = tuple(int(f) for f in model.features)
    s = [X // p[0], Y // p[1], Z // p[2]]
    pvox = p[0] * p[1] * p[2]
    cin = pvox  # space_to_depth of the single raw channel
    total = 0.0
    sizes = []
    for i, f in enumerate(feats):
        S = B * s[0] * s[1] * s[2]
        total += 2 * 27 * S * cin * f + 2 * 27 * S * f * f  # ConvBlock
        sizes.append((tuple(s), f))
        if i < len(feats) - 1:
            st = tuple(int(v) for v in model.strides[i])
            s = [s[0] // st[0], s[1] // st[1], s[2] // st[2]]
            S2 = B * s[0] * s[1] * s[2]
            total += 2 * 27 * S2 * f * feats[i + 1]  # strided down conv
            cin = feats[i + 1]
    for i in reversed(range(len(feats) - 1)):
        up_shape, f = sizes[i]
        S = B * up_shape[0] * up_shape[1] * up_shape[2]
        sp = int(np.prod(model.strides[i]))
        total += 2 * 27 * (S // sp) * feats[i + 1] * f  # transpose conv
        # (subpixel phases: 27 taps spread over the sp output parities)
        total += 2 * 27 * S * (2 * f) * f + 2 * 27 * S * f * f  # ConvBlock
    S = B * sizes[0][0][0] * sizes[0][0][1] * sizes[0][0][2]
    total += 2 * S * feats[0] * (model.n_classes * pvox)  # head
    return float(total)
