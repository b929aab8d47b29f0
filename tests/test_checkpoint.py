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


def test_orbax_roundtrip(tmp_path, small_world):
    """orbax backend round-trips a world identically to the npz path."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    from voxelengine_tpu.io.checkpoint import load_world_orbax, save_world_orbax

    _, _, bm = small_world
    save_world_orbax(str(tmp_path / "ckpt"), bm)
    bm2 = load_world_orbax(str(tmp_path / "ckpt"))
    assert np.array_equal(np.asarray(bm.meta), np.asarray(bm2.meta))
    assert np.array_equal(np.asarray(bm.bricks), np.asarray(bm2.bricks))
    assert np.array_equal(np.asarray(bm.brick_idx), np.asarray(bm2.brick_idx))
    assert bm2.grid_dims == bm.grid_dims and bm2.factor == bm.factor
    assert bm2.coarse_layout is bm.coarse_layout
    assert bm2.brick_layout is bm.brick_layout and bm2.dense_slots == bm.dense_slots


def test_line_table_cache_roundtrip(tmp_path, small_world):
    """line_table_or_build: second call loads byte-identical side tables
    from disk without rebuilding (cold-start item: the bench paid 12.5 s
    per process rebuilding the table in round 2)."""
    from voxelengine_tpu.core.bitgrid import BitGrid
    from voxelengine_tpu.core.brickmap import build_brickmap
    from voxelengine_tpu.core.layout import Layout
    from voxelengine_tpu.io.checkpoint import line_table_or_build

    dense, _, _ = small_world
    bm = build_brickmap(BitGrid.from_dense(dense), 8, coarse_layout=Layout.LINEAR)
    lt1 = line_table_or_build(str(tmp_path), "w", bm)
    assert (tmp_path / "w.lt.npz").exists()
    lt2 = line_table_or_build(str(tmp_path), "w", bm)
    assert np.array_equal(np.asarray(lt1.region_lines), np.asarray(lt2.region_lines))
    assert np.array_equal(np.asarray(lt1.macro), np.asarray(lt2.macro))
    assert np.array_equal(np.asarray(lt1.macro2), np.asarray(lt2.macro2))
    assert lt2.num_regions == lt1.num_regions
    assert lt2.region_dims == lt1.region_dims


def test_generate_or_load_recovers_from_corrupt_cache(tmp_path, small_world):
    """A truncated .npz (kill mid-save) or a deleted .bricks.npy sidecar
    must trigger a rebuild, not a permanent load error."""
    import os

    from voxelengine_tpu.io.checkpoint import generate_or_load

    _, _, bm = small_world
    calls = []

    def gen():
        calls.append(1)
        return bm

    d = str(tmp_path)
    bm1 = generate_or_load(d, "w", gen)
    assert len(calls) == 1
    # corrupt the npz: existence alone must no longer be trusted
    with open(os.path.join(d, "w.npz"), "wb") as f:
        f.write(b"not a zip")
    bm2 = generate_or_load(d, "w", gen)
    assert len(calls) == 2
    assert np.array_equal(np.asarray(bm2.meta), np.asarray(bm1.meta))
    # delete the sidecar but keep the (now valid) npz
    os.remove(os.path.join(d, "w.npz.bricks.npy"))
    bm3 = generate_or_load(d, "w", gen)
    assert len(calls) == 3
    assert np.array_equal(np.asarray(bm3.bricks), np.asarray(bm1.bricks))


def test_memo_json(tmp_path):
    """memo_json computes once, persists across calls, survives numpy
    scalars, and recomputes on a corrupt memo file."""
    import os

    from voxelengine_tpu.io.checkpoint import memo_json

    d = str(tmp_path)
    calls = []

    def probe():
        calls.append(1)
        return np.bool_(False)  # np scalar: must come back JSON-clean

    a = memo_json(d, "probe_k1", probe)
    b = memo_json(d, "probe_k1", probe)
    assert len(calls) == 1
    assert a is False or a == False  # noqa: E712 — json round-trip value
    assert b == a
    # a different key computes independently
    c = memo_json(d, "probe_k2", lambda: True)
    assert c is True
    # corrupt memo: recompute instead of crashing
    with open(os.path.join(d, "probe_k1.memo.json"), "w") as f:
        f.write("{broken")
    e = memo_json(d, "probe_k1", probe)
    assert len(calls) == 2 and e == a
