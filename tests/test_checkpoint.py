"""World checkpoint save/load tests."""

import numpy as np

from voxelengine_tpu.io.checkpoint import generate_or_load, load_world, save_world


def test_roundtrip(tmp_path, small_world):
    _, _, bm = small_world
    p = str(tmp_path / "w.npz")
    save_world(p, bm)
    bm2 = load_world(p)
    assert bm2.grid_dims == bm.grid_dims
    assert bm2.factor == bm.factor
    assert bm2.coarse_layout == bm.coarse_layout
    assert bm2.dense_slots == bm.dense_slots
    assert np.array_equal(np.asarray(bm2.meta), np.asarray(bm.meta))
    assert np.array_equal(np.asarray(bm2.brick_idx), np.asarray(bm.brick_idx))
    assert np.array_equal(np.asarray(bm2.bricks), np.asarray(bm.bricks))


def test_generate_or_load_caches(tmp_path, small_world):
    _, _, bm = small_world
    calls = []

    def gen():
        calls.append(1)
        return bm

    a = generate_or_load(str(tmp_path), "k", gen)
    b = generate_or_load(str(tmp_path), "k", gen)
    assert len(calls) == 1
    assert np.array_equal(np.asarray(a.meta), np.asarray(b.meta))
