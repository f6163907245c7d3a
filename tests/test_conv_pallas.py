"""Exactness of the fused Pallas conv block vs the flax ConvBlock.

Runs the Pallas kernel in interpret mode on the CPU test mesh; on a real
TPU the same code path compiles to Mosaic (bench.py measures it there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syconn_tpu.models.unet3d import ConvBlock
from syconn_tpu.ops.conv3d_pallas import conv3x3x3_ln_gelu


def _ref_block(params, x):
    """The flax ConvBlock's FIRST conv+LN+GELU unit, applied with the given
    params — the exact composite the kernel fuses."""
    import flax.linen as nn

    class One(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                        dtype=jnp.bfloat16)(x)
            x = nn.LayerNorm(dtype=jnp.float32)(x).astype(jnp.bfloat16)
            return nn.gelu(x)

    return One(features=params["Conv_0"]["kernel"].shape[-1]).apply(
        {"params": params}, x)


@pytest.mark.parametrize("shape,cin,cout", [
    ((1, 16, 16, 16, 32), 32, 64),   # stem widths
    ((2, 8, 8, 24, 64), 64, 64),     # z not a sublane multiple
    ((1, 14, 14, 14, 48), 48, 64),   # x/y needing block divisor < 8
])
def test_conv_pallas_matches_flax(shape, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2.0,
                    jnp.bfloat16)
    import flax.linen as nn

    class One(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(cout, (3, 3, 3), padding="SAME",
                        dtype=jnp.bfloat16)(x)
            x = nn.LayerNorm(dtype=jnp.float32)(x).astype(jnp.bfloat16)
            return nn.gelu(x)

    mod = One()
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    ref = np.asarray(mod.apply({"params": params}, x), np.float32)
    got = np.asarray(
        conv3x3x3_ln_gelu(
            x,
            jnp.asarray(params["Conv_0"]["kernel"]),
            jnp.asarray(params["Conv_0"]["bias"]),
            jnp.asarray(params["LayerNorm_0"]["scale"]),
            jnp.asarray(params["LayerNorm_0"]["bias"]),
            interpret=True,
        ),
        np.float32,
    )
    assert got.shape == ref.shape
    # accumulation order differs from XLA's conv schedule; both are f32
    # accumulations rounded to bf16, so agreement is to bf16 resolution
    denom = np.maximum(np.abs(ref), 1e-2)
    rel = np.abs(got - ref) / denom
    assert np.median(rel) < 2e-2, float(np.median(rel))
    assert np.mean(rel > 0.1) < 0.02, float(np.mean(rel > 0.1))


def test_convblock_pallas_helper_matches_module():
    """ConvBlock = two fused units chained; validates the composition the
    inference engine uses (inference/dense.py pallas path)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16, 32)).astype(np.float32),
                    jnp.bfloat16)
    mod = ConvBlock(features=64)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(mod.apply({"params": params}, x), np.float32)
    h = x
    for i in range(2):
        h = conv3x3x3_ln_gelu(
            h,
            jnp.asarray(params[f"Conv_{i}"]["kernel"]),
            jnp.asarray(params[f"Conv_{i}"]["bias"]),
            jnp.asarray(params[f"LayerNorm_{i}"]["scale"]),
            jnp.asarray(params[f"LayerNorm_{i}"]["bias"]),
            interpret=True,
        )
    got = np.asarray(h, np.float32)
    denom = np.maximum(np.abs(ref), 1e-2)
    rel = np.abs(got - ref) / denom
    assert np.median(rel) < 2e-2, float(np.median(rel))
    assert np.mean(rel > 0.15) < 0.02, float(np.mean(rel > 0.15))


@pytest.mark.parametrize("variant", ["myelin", "organelles"])
def test_unet_engine_matches_flax(variant):
    """The Pallas inference engine replays the whole UNet3D graph from the
    params pytree; packed logits must match model.apply to bf16 tolerance
    (inference/dense.py swaps it in when SYCONN_TPU_PALLAS_CONV permits)."""
    from syconn_tpu.models.unet3d import UNet3D, unet_variants
    from syconn_tpu.models.unet_engine import unet_apply_packed

    m = UNet3D(**unet_variants(variant))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 255, size=(1, 32, 32, 16, 1)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(2), x)["params"]
    ref = np.asarray(
        m.apply({"params": params}, x, full_res=False), np.float32)
    got = np.asarray(
        unet_apply_packed(m, params, x, interpret=True), np.float32)
    assert got.shape == ref.shape
    denom = np.maximum(np.abs(ref), 0.05)
    rel = np.abs(got - ref) / denom
    assert np.median(rel) < 3e-2, float(np.median(rel))
    # the downstream consumer is argmax/threshold over classes: the class
    # decision must agree nearly everywhere. Random-init logits are
    # near-tied (no trained margins), so a ~1% flip rate is the bf16
    # noise floor here; trained models separate classes by whole logits.
    C = m.n_classes
    pv = ref.shape[-1] // C
    ra = ref.reshape(ref.shape[:-1] + (C, pv)).argmax(-2)
    ga = got.reshape(got.shape[:-1] + (C, pv)).argmax(-2)
    assert np.mean(ra != ga) < 2e-2, float(np.mean(ra != ga))


def test_unet_engine_trained_mask_agreement():
    """On the TRAINED packaged organelles weights the engine's thresholded
    masks must agree with flax apply at >99.9% of voxels — the guarantee
    the deployment path (DenseTilePredictor pallas swap) rests on."""
    from syconn_tpu.models.io import (load_model, model_exists,
                                      packaged_model_path)
    from syconn_tpu.models.unet_engine import unet_apply_packed

    mp = packaged_model_path("organelles")
    if not model_exists(mp):
        pytest.skip("packaged organelles model not present")
    model, params = load_model(mp)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, 255, size=(1, 32, 32, 16, 1)),
                    jnp.float32)
    ref = np.asarray(
        model.apply({"params": params}, x, full_res=False), np.float32)
    got = np.asarray(
        unet_apply_packed(model, params, x, interpret=True), np.float32)
    C = model.n_classes
    pv = ref.shape[-1] // C
    rp = jax.nn.softmax(ref.reshape(ref.shape[:-1] + (C, pv)), axis=-2)
    gp = jax.nn.softmax(got.reshape(got.shape[:-1] + (C, pv)), axis=-2)
    # flips happen only at threshold-straddling voxels (prob ~ 0.5); the
    # uniform-noise input puts far more mass there than real EM (measured:
    # median per-voxel prob diff 3.5e-5, p99 0.017)
    flips = np.mean((np.asarray(rp) >= 0.5) != (np.asarray(gp) >= 0.5))
    assert flips < 3e-3, float(flips)
    d = np.abs(np.asarray(rp) - np.asarray(gp))
    assert np.median(d) < 1e-3, float(np.median(d))


@pytest.mark.parametrize("shape,cout", [
    ((1, 16, 16, 16, 32), 64),
    ((1, 8, 8, 24, 48), 64),   # z2 not a sublane multiple, odd Cin tile
])
def test_conv_down2x_phases_matches_flax(shape, cout):
    """Input-phase-decomposed strided conv == nn.Conv(SAME, k=3, s=2) to
    bf16 resolution (the stride-2 transition convs the r4 engine left on
    XLA's Conv3D lowering)."""
    import flax.linen as nn

    from syconn_tpu.ops.conv3d_pallas import conv_down2x_bias

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mod = nn.Conv(features=cout, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                  padding="SAME", dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(mod.apply({"params": params}, x), np.float32)
    got = np.asarray(conv_down2x_bias(
        x, params["kernel"], params["bias"], interpret=True), np.float32)
    assert got.shape == ref.shape
    denom = np.maximum(np.abs(ref), 1e-2)
    rel = np.abs(got - ref) / denom
    assert np.median(rel) < 2e-2, float(np.median(rel))
    assert np.mean(rel > 0.1) < 0.02, float(np.mean(rel > 0.1))


def test_conv_transpose2x_phases_matches_flax():
    """Subpixel-phase transpose conv == nn.ConvTranspose(SAME, k=3, s=2)
    to bf16 resolution (it does 1/8th the zero-stuffed formulation's MXU
    work)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from syconn_tpu.ops.conv3d_pallas import conv_transpose2x_bias

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16, 24)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mod = nn.ConvTranspose(features=16, kernel_size=(3, 3, 3),
                           strides=(2, 2, 2), padding="SAME")
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(mod.apply({"params": params}, x), np.float32)
    got = np.asarray(conv_transpose2x_bias(
        x, params["kernel"], params["bias"], interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.02)
