"""Device kernels must match the host (native/numpy) golden kernels."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_object_properties_device_matches_host(rng):
    from syconn_tpu.ops.props import object_properties_arrays
    from syconn_tpu.ops.props_jax import object_properties_tpu

    vol = rng.integers(0, 50, size=(32, 24, 16)).astype(np.uint32)
    ids_h, rep_h, bb_h, sz_h = object_properties_arrays(vol)
    ids_d, rep_d, bb_d, sz_d = object_properties_tpu(vol, max_ids=128)
    assert np.array_equal(ids_h, ids_d)
    assert np.array_equal(sz_h, sz_d)
    assert np.array_equal(bb_h, bb_d)
    assert np.array_equal(rep_h, rep_d)  # first-occurrence rep coords


def test_object_properties_device_overflow(rng):
    from syconn_tpu.ops.props_jax import object_properties_tpu

    vol = np.arange(1, 1001, dtype=np.uint32).reshape(10, 10, 10)
    with pytest.raises(ValueError):
        object_properties_tpu(vol, max_ids=64)


def test_pair_counts_device_matches_host(rng):
    import jax.numpy as jnp

    from syconn_tpu.ops.props import pair_counts
    from syconn_tpu.ops.props_jax import pair_counts_tpu

    a = rng.integers(0, 6, size=(16, 16, 8)).astype(np.uint32)
    b = rng.integers(0, 6, size=(16, 16, 8)).astype(np.uint32)
    ah, bh, ch = pair_counts(a, b)
    ad, bd, cd = pair_counts_tpu(a, b, max_pairs=128)
    got = sorted(zip(ad.tolist(), bd.tolist(), cd.tolist()))
    expect = sorted(zip(ah.tolist(), bh.tolist(), ch.tolist()))
    assert got == expect


def test_pair_counts_tpu_overflow_raises(rng):
    from syconn_tpu.ops.props_jax import pair_counts_tpu

    # 16 unique (a, b) combinations > max_pairs=8 must raise, not merge
    a = rng.integers(1, 5, size=(8, 8, 8)).astype(np.uint32)
    b = rng.integers(1, 5, size=(8, 8, 8)).astype(np.uint32)
    with pytest.raises(ValueError):
        pair_counts_tpu(a, b, max_pairs=8)


@pytest.mark.parametrize("seed", [0, 1])
def test_detect_cs_device_matches_host(seed):
    from syconn_tpu.ops.contacts import detect_cs
    from syconn_tpu.ops.contacts_jax import detect_cs_tpu

    rng = np.random.default_rng(seed)
    stencil = (5, 5, 3)
    # blocky segmentation (realistic spatial coherence)
    base = rng.integers(0, 4, size=(6, 6, 4)).astype(np.uint32)
    seg = np.kron(base, np.ones((6, 6, 6), np.uint32))  # (36, 36, 24)
    host = detect_cs(seg, stencil=np.asarray(stencil, np.int32))
    dev = detect_cs_tpu(seg, stencil=stencil, tile=(16, 16, 8), K=16)
    assert host.shape == dev.shape
    assert np.array_equal(host, dev)


def test_detect_cs_device_two_cubes():
    from syconn_tpu.ops.contacts import cs_pair_unpack
    from syconn_tpu.ops.contacts_jax import detect_cs_tpu

    seg = np.zeros((40, 40, 24), np.uint32)
    seg[4:18, 10:30, 4:20] = 4
    seg[20:36, 10:30, 4:20] = 9  # 2-voxel gap along x
    packed = detect_cs_tpu(seg, stencil=(13, 13, 7), tile=(16, 16, 8), K=16)
    lo, hi = cs_pair_unpack(packed[packed != 0])
    assert set(lo.tolist()) == {4} and set(hi.tolist()) == {9}


def test_detect_cs_device_overflow_fallback():
    """A tile with more unique labels than K must fall back to the host
    kernel and still be exact."""
    from syconn_tpu.ops.contacts import detect_cs
    from syconn_tpu.ops.contacts_jax import detect_cs_tpu

    rng = np.random.default_rng(2)
    seg = rng.integers(0, 60, size=(24, 24, 16)).astype(np.uint32)  # high diversity
    host = detect_cs(seg, stencil=np.asarray((5, 5, 3), np.int32))
    dev = detect_cs_tpu(seg, stencil=(5, 5, 3), tile=(16, 16, 8), K=8)
    assert np.array_equal(host, dev)


def test_morphology_device_matches_scipy(rng):
    from syconn_tpu.ops.morphology import apply_morphological_operations, get_aniso_struct
    from syconn_tpu.ops.morphology_jax import morphology_chain_device

    struct = get_aniso_struct((10, 10, 20))
    mask = rng.random((32, 28, 20)) < 0.4
    for ops in [["binary_dilation"], ["binary_erosion"],
                ["binary_opening", "binary_closing"],
                ["binary_closing", "binary_erosion", "binary_erosion"]]:
        host = apply_morphological_operations(mask.copy(), ops, struct=struct)
        dev = morphology_chain_device(mask, ops, struct)
        assert np.array_equal(host, dev), f"mismatch for {ops}"


def test_object_segmentation_chunk_device_matches_host(rng):
    from syconn_tpu.extraction.object_extraction import object_segmentation_chunk
    from syconn_tpu.ops.morphology import get_aniso_struct

    struct = get_aniso_struct((10, 10, 20))
    prob = np.zeros((48, 48, 24), np.uint8)
    prob[8:24, 8:24, 4:20] = 255
    prob[28:44, 8:24, 4:20] = 255
    ops = ["binary_opening", "binary_closing", "binary_erosion"]
    host = object_segmentation_chunk(prob, 128, ops, struct, min_seed_vx=5, use_device=False)
    dev = object_segmentation_chunk(prob, 128, ops, struct, min_seed_vx=5, use_device=True)
    assert np.array_equal(host > 0, dev > 0)
    # same component structure (labels may permute)
    assert len(np.unique(host)) == len(np.unique(dev))


def test_detect_cs_pallas_matches_host():
    """The hand-written Pallas kernel (interpret mode on CPU; Mosaic on TPU)
    must match the native host kernel exactly, including the smallest-id
    tie-break and the boundary gate."""
    from syconn_tpu.ops.contacts import detect_cs
    from syconn_tpu.ops.contacts_pallas import detect_cs_pallas

    rng = np.random.default_rng(3)
    seg = np.kron(
        rng.integers(0, 5, size=(10, 10, 6)).astype(np.uint32),
        np.ones((6, 6, 6), np.uint32),
    )
    host = detect_cs(seg)
    pal = detect_cs_pallas(seg, tile_xy=(16, 16), K=16)
    assert np.array_equal(host, pal)


def test_cs_dispatcher_pallas_path():
    """CsDispatcher(kernel='pallas') must round-trip through prep/device/
    finish and agree with the host kernel (overflow columns included)."""
    from syconn_tpu.ops.contacts import detect_cs
    from syconn_tpu.ops.contacts_jax import CsDispatcher

    rng = np.random.default_rng(4)
    seg = np.kron(
        rng.integers(0, 24, size=(12, 12, 6)).astype(np.uint32),
        np.ones((4, 4, 6), np.uint32),
    )  # enough diversity to overflow some K=8 columns
    host = detect_cs(seg)
    d = CsDispatcher(tile=(16, 16, 8), K=8, kernel="pallas")
    assert np.array_equal(host, d.fetch(d.dispatch(seg)))


def test_connected_components_device_golden(rng):
    """Device CC (relabel-min + pointer jumping) == scipy label, including
    first-occurrence numbering, on random and adversarial masks."""
    from syconn_tpu.ops.cc import connected_components
    from syconn_tpu.ops.cc_jax import connected_components_tpu

    def check(mask):
        lab_s, n_s = connected_components(mask, device=False)
        lab_d, n_d = connected_components_tpu(mask)
        assert n_s == n_d
        assert np.array_equal(lab_s, lab_d)

    # random sparse + dense masks
    for p in (0.05, 0.3, 0.6, 0.9):
        check(rng.random((24, 20, 16)) < p)
    # adversarial: serpentine corridor (worst case for pure propagation)
    m = np.zeros((32, 32, 4), bool)
    for i in range(0, 32, 2):
        m[i, :, :] = True
        if (i // 2) % 2 == 0:
            m[i + 1, -1, :] = True
        elif i + 1 < 32:
            m[i + 1, 0, :] = True
    check(m)
    # two voxel-thin diagonally-adjacent lines (6-conn must NOT merge)
    m = np.zeros((10, 10, 10), bool)
    m[2, 2, :] = True
    m[3, 3, :] = True
    lab, n = connected_components_tpu(m)
    assert n == 2
    # empty + full
    check(np.zeros((8, 8, 8), bool))
    check(np.ones((8, 8, 8), bool))
