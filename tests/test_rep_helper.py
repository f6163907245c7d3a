from collections import defaultdict

import numpy as np

from syconn_tpu.reps.rep_helper import (
    colorcode_vertices,
    get_unique_subfold_ixs,
    ix_from_subfold_new,
    subfold_from_ix_new,
    surface_samples,
)

N_FOLDER_LIST = [10**i for i in range(1, 4)]


def test_subfold_unique_assignment():
    obj_ids = np.arange(int(1e5))
    for n_folders in N_FOLDER_LIST:
        dest = defaultdict(list)
        for oid in obj_ids:
            dest[subfold_from_ix_new(oid, n_folders)].append(oid)
        stored = np.concatenate([np.array(v) for v in dest.values()])
        assert len(np.unique(stored)) == len(stored) == len(obj_ids)


def test_subfold_inverse(working_dir):
    for n_folders in N_FOLDER_LIST:
        for rep_id in get_unique_subfold_ixs(n_folders):
            sf = subfold_from_ix_new(int(rep_id), n_folders)
            assert int(rep_id) == ix_from_subfold_new(sf, n_folders)


def test_consecutive_block_same_shard():
    # consecutive IDs within a 1000-block map to the same shard
    assert subfold_from_ix_new(1000, 100) == subfold_from_ix_new(1999, 100)
    assert subfold_from_ix_new(1000, 100) != subfold_from_ix_new(2000, 100)


def test_colorcode_vertices(rng):
    a = 5
    rep_values = np.arange(a * a * a)
    rep_coords = np.mgrid[0:a, 0:a, 0:a].reshape(3, -1).T
    vertices = 5 * rng.random((50, 3))
    colors = np.c_[rep_coords, np.ones(a * a * a)]
    from scipy import spatial

    _, ixs = spatial.cKDTree(rep_coords).query(vertices)
    out = colorcode_vertices(vertices, rep_coords, rep_values, colors=colors, return_color=False)
    assert np.array_equal(out, ixs)
    out_c = colorcode_vertices(vertices, rep_coords, rep_values, colors=colors, return_color=True)
    assert np.array_equal(out_c, colors[ixs])


def test_surface_samples(rng):
    coords = rng.random((5000, 3)).astype(np.float32) * 10000
    samples = surface_samples(coords, bin_sizes=(2000, 2000, 2000), max_nb_samples=100)
    assert samples.shape[1] == 3
    assert 1 <= len(samples) <= 100


def test_chunkify_weighted():
    from syconn_tpu.handler.basics import chunkify_weighted

    sample = np.array([0, 1, 2, 3, 4, 5, 6, 7], np.uint64)
    weights = np.array([3, 1, 2, 7, 5, 8, 0, 8], np.uint64)
    n = 3
    out = chunkify_weighted(sample, n, weights)
    priority = np.argsort(weights)[::-1]
    for i in range(n):
        assert np.array_equal(
            np.array(out[i], np.uint64), sample[priority[i::n]]
        )
