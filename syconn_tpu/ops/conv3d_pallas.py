"""Pallas TPU kernel: fused 3x3x3 conv + LayerNorm + GELU ("ConvBlock" unit).

The dense U-Net's FLOPs live in its SAME-padded 3x3x3 convolutions
(models/unet3d.py ConvBlock — reference counterpart: the elektronn3 U-Nets
behind syconn/handler/prediction.py:594). XLA's Conv3D lowering ran the
whole organelles net at ~13% MFU on v5e (BENCH r3/r4 receipts); this kernel
reformulates each conv block as 27 accumulated MXU matmuls over a
VMEM-resident window and fuses the normalization + activation epilogue so
the conv output never round-trips HBM:

* grid over (batch, x-blocks, y-blocks); each instance DMAs its
  (BX+2, BY+2, Zp, Cin) halo window from the HBM-resident padded input
  (full-extent minor dim keeps the DMA aligned; Zp is the z extent rounded
  to the bf16 sublane tile);
* for each tap (dx, dy, dz): a static shifted slice of the window,
  collapsed to (BX*BY*Zs, Cin) — layout-free when Zs is a sublane multiple
  — and one MXU matmul against the (Cin, Cout) tap weights, accumulated in
  float32;
* epilogue: bias, round-to-bf16 (matching the flax conv's bf16 output),
  LayerNorm in f32 (flax epsilon 1e-6), GELU, cast, write.

Numerics: identical op order to ``ConvBlock`` except the conv's internal
accumulation order (27 ordered tap matmuls vs XLA's conv schedule) — both
accumulate f32 and round to bf16, so results agree to bf16 resolution
(exactness-tested vs the flax module in tests/test_conv_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jaxcfg import setup_jax

setup_jax()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3x3_ln_gelu", "pallas_convs_enabled"]


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_block(extent: int, target: int = 8) -> int:
    """Largest divisor of ``extent`` that is <= target (>=1)."""
    for b in range(min(target, extent), 0, -1):
        if extent % b == 0:
            return b
    return 1


def pallas_convs_enabled() -> bool:
    """Default-on for TPU backends, opt-out via SYCONN_TPU_PALLAS_CONV=0
    (and opt-in on other backends via =1, which runs in interpret mode)."""
    import os

    v = os.environ.get("SYCONN_TPU_PALLAS_CONV")
    if v is not None:
        return v not in ("0", "false", "False")
    return jax.default_backend() not in ("cpu",)


@partial(jax.jit, static_argnames=("interpret", "epilogue"))
def conv3x3x3_ln_gelu(x, w, b, ln_scale, ln_bias, interpret=False,
                      epilogue="ln_gelu"):
    """y = GELU(LayerNorm(Conv3D_same_3x3x3(x, w) + b)).

    Args:
        x: (B, X, Y, Z, Cin) bfloat16.
        w: (3, 3, 3, Cin, Cout) conv kernel (flax ``Conv.kernel`` layout).
        b: (Cout,) conv bias.
        ln_scale, ln_bias: (Cout,) LayerNorm params (f32); ignored for
            ``epilogue="bias"``.
        epilogue: "ln_gelu" (ConvBlock unit) or "bias" (linear conv — the
            zero-dilated ConvTranspose formulation uses this).
    Returns:
        (B, X, Y, Z, Cout) bfloat16.
    """
    B, X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    BX = _pick_block(X)
    BY = _pick_block(Y)
    # z extents: Zs = sliceable core rounded to the bf16 sublane tile (16)
    # so the (BX, BY, Zs, Cin) -> (BX*BY*Zs, Cin) collapse is layout-free;
    # Zp = padded window extent with room for the +-1 z taps
    Zs = _ceil_to(Z, 16)
    Zp = Zs + 16
    # lane-dim alignment: Mosaic requires HBM memref slices to be
    # 128-aligned along the minor dim (v5e rejection: "Slice shape along
    # dimension 4 must be aligned to tiling (128), but is 8" for the
    # patchify stem's Cin=8). Pad Cin up to the lane tile — the MXU pads
    # the contraction dim to 128 internally, so the extra zeros cost only
    # window-DMA bytes, not FLOP time.
    Cp = _ceil_to(Cin, 128)
    # SAME halo of 1 + z padding to Zp (zeros; rows >= Z+2 are garbage that
    # the epilogue never reads back into real rows — LN is per-position)
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, 1), (1, 1), (1, Zp - Z - 1), (0, Cp - Cin)),
    )
    w = w.astype(jnp.bfloat16).reshape(27, Cin, Cout)
    if Cp != Cin:
        w = jnp.pad(w, ((0, 0), (0, Cp - Cin), (0, 0)))
    b = b.astype(jnp.bfloat16).reshape(1, Cout)
    ln_scale = ln_scale.astype(jnp.float32).reshape(1, Cout)
    ln_bias = ln_bias.astype(jnp.float32).reshape(1, Cout)
    M = BX * BY * Zs

    nx = X // BX
    ny = Y // BY
    nsteps = B * nx * ny

    def kernel(x_hbm, w_ref, b_ref, g_ref, bt_ref, out_ref, win, sem):
        bb = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        # TPU grids run sequentially on a core and scratch persists across
        # steps: double-buffer the halo-window DMA so step k's fetch
        # overlaps step k-1's 27 matmuls (the L0 window is ~3 MB — serial
        # start();wait() left the MXU idle for the whole transfer).
        k = (bb * nx + i) * ny + j

        def win_dma(slot, kk):
            b2 = kk // (nx * ny)
            i2 = (kk // ny) % nx
            j2 = kk % ny
            return pltpu.make_async_copy(
                x_hbm.at[b2, pl.ds(i2 * BX, BX + 2),
                         pl.ds(j2 * BY, BY + 2), :, :],
                win.at[slot],
                sem.at[slot],
            )

        @pl.when(k == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(k + 1 < nsteps)
        def _():
            win_dma((k + 1) % 2, k + 1).start()

        win_dma(k % 2, k).wait()
        wk = win[k % 2]
        acc = jnp.zeros((M, Cout), jnp.float32)
        for dx in range(3):
            for dy in range(3):
                sl_xy = wk[dx : dx + BX, dy : dy + BY]
                for dz in range(3):
                    sl = sl_xy[:, :, dz : dz + Zs, :].reshape(M, Cp)
                    acc = acc + jnp.dot(
                        sl, w_ref[dx * 9 + dy * 3 + dz],
                        preferred_element_type=jnp.float32,
                    )
        # conv epilogue matching flax op order: round the f32 accumulator
        # to bf16, add the bf16 bias IN bf16 (nn.Conv promotes bias to its
        # compute dtype), then LayerNorm in f32 + GELU (flax LN: eps 1e-6,
        # E[x^2] variance)
        hb = acc.astype(jnp.bfloat16) + b_ref[...]
        if epilogue == "bias":
            y = hb
        else:
            h = hb.astype(jnp.float32)
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu
            y = (h - mu) * jax.lax.rsqrt(var + 1e-6) * g_ref[...] + bt_ref[...]
            y = jax.nn.gelu(y).astype(jnp.bfloat16)
        out_ref[...] = y.reshape(1, BX, BY, Zs, Cout)[:, :, :, :Z, :]

    flops = 2 * 27 * B * X * Y * Z * Cin * Cout
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z, Cout), jnp.bfloat16),
        grid=(B, X // BX, Y // BY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w (27, Cin, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln bias
        ],
        out_specs=pl.BlockSpec(
            (1, BX, BY, Z, Cout),
            lambda bb, i, j: (bb, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BX + 2, BY + 2, Zp, Cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + B * X * Y * Z * Cout * 2,
            transcendentals=B * X * Y * Z * Cout,
        ),
        # the double-buffered window (2 x ~3.3 MB at Zp=Cp=128) plus the
        # f32 accumulator overflows Mosaic's default 16 MB scoped-VMEM
        # budget; v5e has 128 MB VMEM per core — raise the cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w, b, ln_scale, ln_bias)
