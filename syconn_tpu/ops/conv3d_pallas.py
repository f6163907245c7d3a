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

__all__ = ["conv3x3x3_ln_gelu", "conv_transpose2x_bias",
           "conv_down2x_bias", "pallas_convs_enabled"]


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
                      epilogue="ln_gelu", head_w=None, head_b=None):
    """y = GELU(LayerNorm(Conv3D_same_3x3x3(x, w) + b)).

    Args:
        x: (B, X, Y, Z, Cin) bfloat16.
        w: (3, 3, 3, Cin, Cout) conv kernel (flax ``Conv.kernel`` layout).
        b: (Cout,) conv bias.
        ln_scale, ln_bias: (Cout,) LayerNorm params (f32); ignored for
            ``epilogue="bias"``.
        epilogue: "ln_gelu" (ConvBlock unit) or "bias" (linear conv — the
            zero-dilated ConvTranspose formulation uses this).
        head_w, head_b: optional fused 1x1x1 head ((Cout, Nh) f32 matmul +
            bias applied to the GELU output in f32, the engine's final
            layer) — the returned array is then the (B, X, Y, Z, Nh) f32
            logits and the intermediate activation never touches HBM.
    Returns:
        (B, X, Y, Z, Cout) bfloat16, or (B, X, Y, Z, Nh) float32 with a
        fused head.
    """
    B, X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    BX = _pick_block(X)
    BY = _pick_block(Y)
    # z extent rounded to the bf16 sublane tile (16) so the
    # (BX, BY, Zs, Cin) -> (BX*BY*Zs, Cin) collapse is layout-free
    Zs = _ceil_to(Z, 16)
    # lane-dim alignment: Mosaic requires HBM memref slices to be
    # 128-aligned along the minor dim (v5e rejection: "Slice shape along
    # dimension 4 must be aligned to tiling (128), but is 8" for the
    # patchify stem's Cin=8). Pad Cin up to the lane tile — the MXU pads
    # the contraction dim to 128 internally, so the extra zeros cost only
    # window-DMA bytes, not FLOP time.
    Cp = _ceil_to(Cin, 128)
    # SAME halo of 1; z padded to Zs+2 so three z-shifted Zs-windows exist
    # (zeros; rows >= Z+2 are garbage the epilogue never reads back into
    # real rows — LN is per-position). The three shifts are materialized
    # as separate HBM buffers by XLA slices: an in-kernel z-offset DMA is
    # a SUBLANE-dim slice and Mosaic requires tile-aligned (8) offsets
    # ("Failed to prove that a tile index in dimension 3 is divisible by
    # the tiling"); offset-0 DMAs from pre-shifted buffers are aligned.
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, 1), (1, 1), (1, Zs + 1 - Z), (0, Cp - Cin)),
    )
    xz = [jax.lax.slice_in_dim(xp, dz, dz + Zs, axis=3) for dz in range(3)]
    w = w.astype(jnp.bfloat16).reshape(27, Cin, Cout)
    if Cp != Cin:
        w = jnp.pad(w, ((0, 0), (0, Cp - Cin), (0, 0)))
    b = b.astype(jnp.bfloat16).reshape(1, Cout)
    ln_scale = ln_scale.astype(jnp.float32).reshape(1, Cout)
    ln_bias = ln_bias.astype(jnp.float32).reshape(1, Cout)
    fused_head = head_w is not None
    if fused_head:
        assert epilogue == "ln_gelu", "head fuses onto the ConvBlock unit"
        head_w = head_w.astype(jnp.float32).reshape(-1, head_w.shape[-1])
        Nh = int(head_w.shape[-1])
        head_b = head_b.astype(jnp.float32).reshape(1, Nh)
    C_last = Nh if fused_head else Cout
    out_dtype = jnp.float32 if fused_head else jnp.bfloat16
    M = BX * BY * Zs

    nx = X // BX
    ny = Y // BY
    nsteps = B * nx * ny

    def kernel(x0_hbm, x1_hbm, x2_hbm, w_ref, b_ref, g_ref, bt_ref, *rest):
        x_hbms = (x0_hbm, x1_hbm, x2_hbm)
        if fused_head:
            hw_ref, hb_ref, out_ref, win, sem = rest
        else:
            hw_ref = hb_ref = None
            out_ref, win, sem = rest
        bb = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        # TPU grids run sequentially on a core and scratch persists across
        # steps: double-buffer the halo-window DMA so step k's fetch
        # overlaps step k-1's 27 matmuls (the L0 window is ~3 MB — serial
        # start();wait() left the MXU idle for the whole transfer).
        #
        # THREE z-shifted copies of the window are fetched (win[slot, dz]
        # holds the window starting at z offset dz): a dz in {1, 2} slice
        # of a single window shifts the SUBLANE dim by a non-tile amount
        # and Mosaic lowers the tap operand gather through per-sublane
        # rotations (~6x slower than an aligned block copy — this was the
        # single largest MFU loss in the r4 engine). With pre-shifted
        # copies every tap slices only the two MAJOR dims, so all 27
        # matmul operands are tile-aligned gathers. The 3x window DMA is
        # free bandwidth-wise: it overlaps compute and HBM has headroom.
        k = (bb * nx + i) * ny + j

        def win_dma(slot, dz, kk):
            b2 = kk // (nx * ny)
            i2 = (kk // ny) % nx
            j2 = kk % ny
            return pltpu.make_async_copy(
                x_hbms[dz].at[b2, pl.ds(i2 * BX, BX + 2),
                              pl.ds(j2 * BY, BY + 2), :, :],
                win.at[slot, dz],
                sem.at[slot, dz],
            )

        @pl.when(k == 0)
        def _():
            for dz in range(3):
                win_dma(0, dz, 0).start()

        @pl.when(k + 1 < nsteps)
        def _():
            for dz in range(3):
                win_dma((k + 1) % 2, dz, k + 1).start()

        for dz in range(3):
            win_dma(k % 2, dz, k).wait()
        acc = jnp.zeros((M, Cout), jnp.float32)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    sl = win[k % 2, dz, dx : dx + BX, dy : dy + BY].reshape(
                        M, Cp)
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
        if fused_head:
            # 1x1x1 head as one f32 matmul on the (bf16-rounded, matching
            # the unfused engine) activation — the logits leave the kernel,
            # the activation never touches HBM
            y = jnp.dot(y.astype(jnp.float32), hw_ref[...],
                        preferred_element_type=jnp.float32) + hb_ref[...]
        out_ref[...] = y.reshape(1, BX, BY, Zs, C_last)[:, :, :, :Z, :]

    flops = 2 * 27 * B * X * Y * Z * Cin * Cout
    operands = [xz[0], xz[1], xz[2], w, b, ln_scale, ln_bias]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # z-shift 0, stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # z-shift 1
        pl.BlockSpec(memory_space=pl.ANY),  # z-shift 2
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w (27, Cin, Cout)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln scale
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln bias
    ]
    if fused_head:
        operands += [head_w, head_b]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        flops += 2 * B * X * Y * Z * Cout * Nh
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z, C_last), out_dtype),
        grid=(B, X // BX, Y // BY),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, BX, BY, Z, C_last),
            lambda bb, i, j: (bb, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, BX + 2, BY + 2, Zs, Cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
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
    )(*operands)


@partial(jax.jit, static_argnames=("interpret",))
def conv_transpose2x_bias(x, w, b, interpret=False):
    """flax ``nn.ConvTranspose`` (SAME, k=3, s=2) + bias via SUBPIXEL phase
    decomposition: each of the 8 output parity phases is a small conv over
    the half-resolution input with its own tap subset (1/2/4/8 of the 27
    taps — their union is all 27), so the MXU does exactly the transpose
    conv's FLOPs. The r4 engine ran the equivalent zero-stuffed SAME conv
    over the 2x grid — 8x the necessary matmul work, 7/8 of it multiplying
    stuffed zeros.

    Derivation (per axis, output index e = 2u + p, SAME pad 1, input at
    odd stuffed positions): phase p=0 receives taps d in {0, 2} reading
    x[u-1], x[u]; phase p=1 receives tap d=1 reading x[u]. Verified exact
    vs nn.ConvTranspose in tests/test_conv_pallas.py.

    Args:
        x: (B, X, Y, Z, Cin) bfloat16 (half-resolution input).
        w: (3, 3, 3, Cin, Cout) flax ConvTranspose kernel.
        b: (Cout,) bias.
    Returns:
        (B, 2X, 2Y, 2Z, Cout) bfloat16.
    """
    B, X, Y, Z, Cin = x.shape
    Cout = w.shape[-1]
    BX = _pick_block(X)
    BY = _pick_block(Y)
    Zs = _ceil_to(Z, 16)
    Cp = _ceil_to(Cin, 128)
    # low-side halo of 1 (x[u-1]); z padded so two Zs-extent shifted
    # windows exist (offsets 0 and 1), materialized as separate HBM
    # buffers (in-kernel sublane-offset DMAs must be tile-aligned)
    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (1, 0), (1, 0), (1, Zs - Z), (0, Cp - Cin)),
    )
    xz = [jax.lax.slice_in_dim(xp, dz, dz + Zs, axis=3) for dz in range(2)]
    w = w.astype(jnp.bfloat16).reshape(27, Cin, Cout)
    if Cp != Cin:
        w = jnp.pad(w, ((0, 0), (0, Cp - Cin), (0, 0)))
    b = b.astype(jnp.bfloat16).reshape(1, Cout)
    M = BX * BY * Zs
    nx = X // BX
    ny = Y // BY
    nsteps = B * nx * ny
    # per-axis tap sets: phase 0 <- d in {0: x[u-1], 2: x[u]};
    # phase 1 <- d=1: x[u]. Window index = 0 for x[u-1], 1 for x[u].
    D = ({0: 0, 2: 1}, {1: 1})

    def kernel(x0_hbm, x1_hbm, w_ref, b_ref, out_ref, win, sem):
        x_hbms = (x0_hbm, x1_hbm)
        bb = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        k = (bb * nx + i) * ny + j

        def win_dma(slot, dz, kk):
            b2 = kk // (nx * ny)
            i2 = (kk // ny) % nx
            j2 = kk % ny
            return pltpu.make_async_copy(
                x_hbms[dz].at[b2, pl.ds(i2 * BX, BX + 1),
                              pl.ds(j2 * BY, BY + 1), :, :],
                win.at[slot, dz],
                sem.at[slot, dz],
            )

        @pl.when(k == 0)
        def _():
            for dz in range(2):
                win_dma(0, dz, 0).start()

        @pl.when(k + 1 < nsteps)
        def _():
            for dz in range(2):
                win_dma((k + 1) % 2, dz, k + 1).start()

        for dz in range(2):
            win_dma(k % 2, dz, k).wait()
        ys = []
        for px in range(2):
            for py in range(2):
                for pz in range(2):
                    acc = jnp.zeros((M, Cout), jnp.float32)
                    for dx, ox in D[px].items():
                        for dy, oy in D[py].items():
                            for dz, oz in D[pz].items():
                                sl = win[k % 2, oz, ox : ox + BX,
                                         oy : oy + BY].reshape(M, Cp)
                                acc = acc + jnp.dot(
                                    sl, w_ref[dx * 9 + dy * 3 + dz],
                                    preferred_element_type=jnp.float32,
                                )
                    ys.append(acc.astype(jnp.bfloat16) + b_ref[...])
        out = jnp.concatenate(ys, axis=-1)
        out_ref[...] = out.reshape(1, BX, BY, Zs, 8 * Cout)[:, :, :, :Z, :]

    flops = 2 * 27 * B * X * Y * Z * Cin * Cout  # = 2*27/8 * (2X*2Y*2Z)...
    phased = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z, 8 * Cout), jnp.bfloat16),
        grid=(B, X // BX, Y // BY),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BX, BY, Z, 8 * Cout),
            lambda bb, i, j: (bb, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, BX + 1, BY + 1, Zs, Cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + B * X * Y * Z * 8 * Cout * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xz[0], xz[1], w, b)
    # interleave phases: (B, X, Y, Z, (px, py, pz), Cout) -> full res
    ph = phased.reshape(B, X, Y, Z, 2, 2, 2, Cout)
    ph = ph.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return ph.reshape(B, 2 * X, 2 * Y, 2 * Z, Cout)


@partial(jax.jit, static_argnames=("interpret",))
def conv_down2x_bias(x, w, b, interpret=False):
    """flax ``nn.Conv`` (SAME, k=3, strides=2) + bias via input-phase
    decomposition: out[o] = sum_d W_d x[2o + d] (XLA's SAME for stride 2
    pads low=0/high=1), so tap d reads input phase (d % 2) at half-res
    offset d // 2 in {0, +1}. The phases are stacked along lanes (each
    zero-padded to the 128 lane tile so every tap's channel slice is
    lane-aligned) and the two half-res z offsets come from pre-shifted
    HBM buffers (sublane-offset DMAs must be tile-aligned). 27 matmuls
    at half resolution — exactly the strided conv's FLOPs; the r4 engine
    left these on XLA's Conv3D lowering (~13% MFU).

    Args:
        x: (B, X, Y, Z, Cin) bfloat16, even extents.
        w: (3, 3, 3, Cin, Cout) flax Conv kernel.
        b: (Cout,) bias.
    Returns:
        (B, X/2, Y/2, Z/2, Cout) bfloat16.
    """
    B, X, Y, Z, Cin = x.shape
    assert X % 2 == 0 and Y % 2 == 0 and Z % 2 == 0
    Cout = w.shape[-1]
    X2, Y2, Z2 = X // 2, Y // 2, Z // 2
    BX = _pick_block(X2)
    BY = _pick_block(Y2)
    Zs = _ceil_to(Z2, 16)
    Cpp = _ceil_to(Cin, 128)  # per-phase lane padding
    xb = x.astype(jnp.bfloat16)
    # phase stack (lane-major order px, py, pz), each phase padded high by
    # 1 in x/y (offset +1 taps) and to Zs+1 in z (two shifted z windows)
    phases = []
    for px in range(2):
        for py in range(2):
            for pz in range(2):
                ph = xb[:, px::2, py::2, pz::2, :]
                ph = jnp.pad(ph, ((0, 0), (0, 1), (0, 1),
                                  (0, Zs + 1 - Z2), (0, Cpp - Cin)))
                phases.append(ph)
    xs = jnp.concatenate(phases, axis=-1)  # (B, X2+1, Y2+1, Zs+1, 8*Cpp)
    xz = [jax.lax.slice_in_dim(xs, dz, dz + Zs, axis=3) for dz in range(2)]
    w = w.astype(jnp.bfloat16).reshape(27, Cin, Cout)
    if Cpp != Cin:
        w = jnp.pad(w, ((0, 0), (0, Cpp - Cin), (0, 0)))
    b = b.astype(jnp.bfloat16).reshape(1, Cout)
    M = BX * BY * Zs
    nx = X2 // BX
    ny = Y2 // BY
    nsteps = B * nx * ny

    def kernel(x0_hbm, x1_hbm, w_ref, b_ref, out_ref, win, sem):
        x_hbms = (x0_hbm, x1_hbm)
        bb = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        k = (bb * nx + i) * ny + j

        def win_dma(slot, dz, kk):
            b2 = kk // (nx * ny)
            i2 = (kk // ny) % nx
            j2 = kk % ny
            return pltpu.make_async_copy(
                x_hbms[dz].at[b2, pl.ds(i2 * BX, BX + 1),
                              pl.ds(j2 * BY, BY + 1), :, :],
                win.at[slot, dz],
                sem.at[slot, dz],
            )

        @pl.when(k == 0)
        def _():
            for dz in range(2):
                win_dma(0, dz, 0).start()

        @pl.when(k + 1 < nsteps)
        def _():
            for dz in range(2):
                win_dma((k + 1) % 2, dz, k + 1).start()

        for dz in range(2):
            win_dma(k % 2, dz, k).wait()
        acc = jnp.zeros((M, Cout), jnp.float32)
        for dx in range(3):
            px, ox = dx % 2, dx // 2
            for dy in range(3):
                py, oy = dy % 2, dy // 2
                for dz in range(3):
                    pz, oz = dz % 2, dz // 2
                    g = (px * 4 + py * 2 + pz) * Cpp
                    sl = win[k % 2, oz, ox : ox + BX, oy : oy + BY, :,
                             g : g + Cpp].reshape(M, Cpp)
                    acc = acc + jnp.dot(
                        sl, w_ref[dx * 9 + dy * 3 + dz],
                        preferred_element_type=jnp.float32,
                    )
        y = acc.astype(jnp.bfloat16) + b_ref[...]
        out_ref[...] = y.reshape(1, BX, BY, Zs, Cout)[:, :, :, :Z2, :]

    flops = 2 * 27 * B * X2 * Y2 * Z2 * Cin * Cout
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, X2, Y2, Z2, Cout), jnp.bfloat16),
        grid=(B, nx, ny),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BX, BY, Z2, Cout),
            lambda bb, i, j: (bb, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, BX + 1, BY + 1, Zs, 8 * Cpp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + B * X2 * Y2 * Z2 * Cout * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xz[0], xz[1], w, b)
