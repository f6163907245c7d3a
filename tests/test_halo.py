"""Multi-chip sharded-volume processing on the 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture()
def mesh8():
    from syconn_tpu.parallel.device import get_device_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return get_device_mesh(8, axis_names=("sp",), mesh_shape=(8,))


def test_sharded_boundary_matches_serial(mesh8, rng):
    from syconn_tpu.ops.contacts import detect_seg_boundaries
    from syconn_tpu.parallel.halo import sharded_boundary_mask

    base = rng.integers(0, 4, size=(16, 8, 4)).astype(np.int32)
    vol = np.kron(base, np.ones((4, 4, 4), np.int32))  # (64, 32, 16)
    serial = detect_seg_boundaries(vol.astype(np.uint32))
    sharded = sharded_boundary_mask(vol, mesh8)
    assert sharded.shape == serial.shape
    assert np.array_equal(sharded.astype(bool), serial)


def test_halo_exchange_identity_kernel(mesh8):
    """The exchanged halo contains exactly the neighbors' border slabs."""
    import jax.numpy as jnp

    from syconn_tpu.parallel.halo import sharded_volume_apply

    vol = np.arange(64 * 4 * 4, dtype=np.int32).reshape(64, 4, 4)

    def kernel(padded):
        # return the left halo slab broadcast over the local extent: every
        # local row reports its shard's left-neighbor value
        return jnp.broadcast_to(padded[:1], (padded.shape[0] - 2,) + padded.shape[1:])

    out = sharded_volume_apply(kernel, vol, mesh8, halo=1)
    # shard i (rows 8i..8i+8) must report row 8i-1 (edge-replicated for i=0)
    for i in range(8):
        expect_row = max(8 * i - 1, 0)
        assert np.array_equal(out[8 * i], vol[expect_row])


def test_sharded_props_pipeline(mesh8, rng):
    """Sharded boundary + per-shard device props compose with host merge."""
    from syconn_tpu.ops.props import merge_prop_arrays, object_properties_arrays
    from syconn_tpu.parallel.halo import sharded_boundary_mask

    base = rng.integers(0, 5, size=(8, 4, 2)).astype(np.int32)
    vol = np.kron(base, np.ones((8, 8, 8), np.int32))
    # per-shard host props + global merge == serial props
    shards = np.split(vol, 8, axis=0)
    parts = [object_properties_arrays(s.astype(np.uint32)) for s in shards]
    offsets = [(8 * i, 0, 0) for i in range(8)]
    ids, rep, bb, sz = merge_prop_arrays(parts, offsets=offsets)
    full = object_properties_arrays(vol.astype(np.uint32))
    assert np.array_equal(ids, full[0])
    assert np.array_equal(sz, full[3])
    assert np.array_equal(bb, full[2])
