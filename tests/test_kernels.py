"""Kernel semantics tests, modeled on the reference's unit suites
(tests/test_segmentation_analysis.py, tests/test_mapobjects_dense.py)."""

import numpy as np
import pytest

from syconn_tpu.ops.contacts import (
    cs_pair_unpack,
    detect_cs,
    detect_cs_64bit,
    detect_seg_boundaries,
    extract_cs_syntype,
    relabel_vol,
    relabel_vol_nonexist2zero,
    _detect_cs_np,
    _detect_seg_boundaries_np,
)
from syconn_tpu.ops.props import (
    find_object_properties,
    map_subcell_extract_props,
    merge_prop_arrays,
    object_properties_arrays,
    pair_counts,
)

STENCIL = np.array([13, 13, 7], dtype=np.int32)
CUBE_SIZE = 5


def test_find_object_properties_small():
    sample = np.array(
        [[[0, 1], [1, 1]], [[5, 2], [2, 1]]], np.uint64
    )
    rep_dc, bb_dc, cnt_dc = find_object_properties(sample)
    assert 0 not in rep_dc and 0 not in bb_dc and 0 not in cnt_dc
    el, cnt = np.unique(sample, return_counts=True)
    cnt = cnt[el != 0]
    el = el[el != 0]
    for i, e in enumerate(el):
        assert cnt_dc[int(e)] == cnt[i]
        r = rep_dc[int(e)]
        assert sample[r[0], r[1], r[2]] == e
        mask = sample == e
        lo = np.transpose(np.where(mask)).min(axis=0)
        hi = np.transpose(np.where(mask)).max(axis=0) + 1
        assert np.all(bb_dc[int(e)][0] == lo)
        assert np.all(bb_dc[int(e)][1] == hi)


def test_object_properties_random(rng):
    vol = rng.integers(0, 8, size=(20, 24, 16)).astype(np.uint64)
    ids, rep, bbs, sizes = object_properties_arrays(vol)
    el, cnt = np.unique(vol, return_counts=True)
    cnt = cnt[el != 0]
    el = el[el != 0]
    assert np.array_equal(ids, el)
    assert np.array_equal(sizes, cnt)
    for k, e in enumerate(el):
        mask = vol == e
        lo = np.transpose(np.where(mask)).min(axis=0)
        hi = np.transpose(np.where(mask)).max(axis=0) + 1
        assert np.all(bbs[k, 0] == lo)
        assert np.all(bbs[k, 1] == hi)
        assert vol[tuple(rep[k])] == e


def test_rep_coord_is_first_scan_order():
    vol = np.zeros((4, 4, 4), np.uint32)
    vol[2, 3, 1] = 7
    vol[3, 0, 0] = 7
    rep_dc, _, _ = find_object_properties(vol)
    assert np.array_equal(rep_dc[7], [2, 3, 1])


def test_pair_counts(rng):
    a = rng.integers(0, 5, size=(10, 10, 10)).astype(np.uint64)
    b = rng.integers(0, 5, size=(10, 10, 10)).astype(np.uint64)
    a_ids, b_ids, cnts = pair_counts(a, b)
    # brute force
    expect = {}
    for av, bv in zip(a.ravel(), b.ravel()):
        if av and bv:
            expect[(int(av), int(bv))] = expect.get((int(av), int(bv)), 0) + 1
    got = {(int(x), int(y)): int(c) for x, y, c in zip(a_ids, b_ids, cnts)}
    assert got == expect


def test_map_subcell_extract_props(rng):
    cell = rng.integers(0, 5, size=(12, 12, 12)).astype(np.uint64)
    sub = rng.integers(0, 4, size=(2, 12, 12, 12)).astype(np.uint64)
    cell_props, sc_props, mappings = map_subcell_extract_props(cell, sub)
    # cell props must equal standalone extraction
    ref = find_object_properties(cell)
    assert cell_props[2] == ref[2]
    for ii in range(2):
        refp = find_object_properties(sub[ii])
        assert sc_props[2][ii] == refp[2]
        # mapping counts: brute force
        for sc_id, inner in mappings[ii].items():
            for c_id, cnt in inner.items():
                assert cnt == int(((sub[ii] == sc_id) & (cell == c_id)).sum())


# ---------------------------------------------------------------- detect_cs
def _gen_two_cube_scene(distance, stencil, cube_size):
    """Two labeled cubes at a given separation; returns the volume and the
    expected (low, high) partner IDs on the valid-conv output grid."""
    offset = stencil // 2
    a = int(np.amax(offset + 1))
    edge = int(np.amax(stencil + distance + cube_size))
    vol = np.zeros((edge, edge, edge), dtype=np.uint32)
    c = cube_size
    d = np.asarray(distance)
    vol[a : a + c, a : a + c, a : a + c] = 4
    vol[a + d[0] : a + d[0] + c, a + d[1] : a + d[1] + c, a + d[2] : a + d[2] + c] = 5
    out_shape = np.array(vol.shape) - stencil + 1
    mask = np.zeros(tuple(out_shape), dtype=np.uint32)
    oo = np.maximum(0, d - offset)
    o = offset
    mask[a - o[0] + oo[0] : a + c - o[0], a - o[1] + oo[1] : a + c - o[1], a - o[2] + oo[2] : a + c - o[2]] = 1
    mask[
        a + d[0] - o[0] : a + d[0] + c - o[0] - oo[0],
        a + d[1] - o[1] : a + d[1] + c - o[1] - oo[1],
        a + d[2] - o[2] : a + d[2] + c - o[2] - oo[2],
    ] = 1
    mask[a - o[0] + 1 : a + c - o[0] - 1, a - o[1] + 1 : a + c - o[1] - 1, a - o[2] + 1 : a + c - o[2] - 1] = 0
    mask[
        a + d[0] - o[0] + 1 : a + d[0] + c - o[0] - 1,
        a + d[1] - o[1] + 1 : a + d[1] + c - o[1] - 1,
        a + d[2] - o[2] + 1 : a + d[2] + c - o[2] - 1,
    ] = 0
    return vol, 4 * mask, 5 * mask


@pytest.mark.parametrize("dist", [(0, 6, 0), (6, 0, 0), (0, 0, 6)])
def test_detect_cs_two_cubes(dist):
    vol, exp_lo, exp_hi = _gen_two_cube_scene(np.array(dist), STENCIL, CUBE_SIZE)
    packed = detect_cs(vol, stencil=STENCIL)
    lo, hi = cs_pair_unpack(packed)
    assert np.array_equal(hi.astype(np.uint32), exp_hi.astype(np.uint32))
    assert np.array_equal(lo.astype(np.uint32), exp_lo.astype(np.uint32))


@pytest.mark.parametrize("dist", [(0, 6, 0), (6, 0, 0), (0, 0, 6)])
def test_detect_cs_64bit_two_cubes(dist):
    vol, exp_lo, exp_hi = _gen_two_cube_scene(np.array(dist), STENCIL, CUBE_SIZE)
    cs = detect_cs_64bit(vol.astype(np.uint64), stencil=STENCIL)
    assert np.array_equal(cs[..., 0].astype(np.uint32), exp_lo.astype(np.uint32))
    assert np.array_equal(cs[..., 1].astype(np.uint32), exp_hi.astype(np.uint32))


def test_detect_cs_native_matches_numpy(rng):
    """Cross-validate the native kernel against the numpy fallback."""
    stencil = np.array([5, 5, 3], np.int32)
    vol = rng.integers(0, 4, size=(16, 14, 12)).astype(np.uint32)
    bdry = detect_seg_boundaries(vol).astype(np.uint8)
    ref = _detect_cs_np(vol, bdry, stencil, packed=True)
    got = detect_cs(vol, stencil=stencil)
    assert np.array_equal(ref, got)


def test_boundary_gen():
    bdry = detect_seg_boundaries(np.arange(1000).reshape((10, 10, 10)).astype(np.uint64))
    flat = bdry.flatten()
    assert flat[0] == 0  # background not flagged
    assert np.all(flat[1:])
    assert not detect_seg_boundaries(np.zeros((10, 10, 10), np.uint64)).any()


def test_boundary_native_matches_numpy(rng):
    vol = rng.integers(0, 3, size=(20, 20, 20)).astype(np.uint32)
    assert np.array_equal(
        detect_seg_boundaries(vol), _detect_seg_boundaries_np(vol)
    )


def test_extract_cs_syntype(rng):
    cs_seg = rng.integers(0, 3, size=(10, 10, 10)).astype(np.uint64)
    syn = (rng.random((10, 10, 10)) < 0.5).astype(np.uint8)
    asym = (rng.random((10, 10, 10)) < 0.3).astype(np.uint8)
    sym = (rng.random((10, 10, 10)) < 0.3).astype(np.uint8)
    offset = np.array([100, 200, 300])
    cs_props, syn_props, cs_asym, cs_sym, voxels_syn = extract_cs_syntype(
        cs_seg, syn, asym, sym, offset
    )
    for key in [1, 2]:
        mask = cs_seg == key
        assert cs_props[2][key] == int(mask.sum())
        fg = mask & (syn != 0)
        if fg.sum():
            assert syn_props[2][key] == int(fg.sum())
            assert cs_asym.get(key, 0) == int((fg & (asym == 1)).sum())
            assert cs_sym.get(key, 0) == int((fg & (sym == 1)).sum())
            coords = np.argwhere(fg) + offset
            assert np.array_equal(
                np.sort(voxels_syn[key], axis=0), np.sort(coords, axis=0)
            )


def test_relabel(rng):
    vol = rng.integers(0, 10, size=(8, 8, 8)).astype(np.uint64)
    orig = vol.copy()
    m = {1: 100, 2: 200}
    out = relabel_vol(vol.copy(), m)
    expect = orig.copy()
    expect[orig == 1] = 100
    expect[orig == 2] = 200
    assert np.array_equal(out, expect)
    out2 = relabel_vol_nonexist2zero(vol.copy(), m)
    expect2 = np.zeros_like(orig)
    expect2[orig == 1] = 100
    expect2[orig == 2] = 200
    assert np.array_equal(out2, expect2)


def test_merge_prop_arrays(rng):
    vol = rng.integers(0, 6, size=(16, 16, 16)).astype(np.uint64)
    # split into two chunks along x, merge, compare against full extraction
    a, b = vol[:8], vol[8:]
    pa = object_properties_arrays(a)
    pb = object_properties_arrays(b)
    ids, rep, bb, sz = merge_prop_arrays([pa, pb], offsets=[(0, 0, 0), (8, 0, 0)])
    full = object_properties_arrays(vol)
    assert np.array_equal(ids, full[0])
    assert np.array_equal(sz, full[3])
    assert np.array_equal(bb, full[2])
    for k in range(len(ids)):
        assert vol[tuple(rep[k])] == ids[k]
