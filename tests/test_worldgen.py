"""Worldgen tests (C14: VoxelWorldBuilder)."""

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.worldgen.terrain import generate_world, solid_at, terrain_density


def test_solid_rule_matches_density():
    x = jnp.asarray([0, 100, 200])
    y = jnp.asarray([0, 50, 400])
    z = jnp.asarray([0, 100, 300])
    t = np.asarray(terrain_density(x, y, z, octaves=8))
    s = np.asarray(solid_at(x, y, z, octaves=8))
    assert np.array_equal(s, ~(np.array([0, 50, 400]) > t))


def test_generate_world_deterministic_and_slab_invariant():
    a = generate_world((32, 32, 32), octaves=4, slab_z=8)
    b = generate_world((32, 32, 32), octaves=4, slab_z=32)
    assert np.array_equal(np.asarray(a.words), np.asarray(b.words))
    # terrain has solid ground at y=0 wherever t >= 0 (t clamped at 0:
    # y=0 <= t always) -> the entire y=0 layer is solid
    dense = np.asarray(a.to_dense())  # [z, y, x]
    assert dense[:, 0, :].all()


def test_generate_world_octave_count_matters():
    a = generate_world((16, 16, 16), octaves=2)
    b = generate_world((16, 16, 16), octaves=8)
    assert not np.array_equal(np.asarray(a.words), np.asarray(b.words))


def test_generate_world_streamed_packing_matches_single_shot():
    """generate_world packs z-slabs to words incrementally; the word stream
    must be byte-identical to a single-shot BitGrid.from_dense for every
    layout (slab-aligned tiled packing regression)."""
    import jax.numpy as jnp
    from voxelengine_tpu.core.bitgrid import BitGrid
    from voxelengine_tpu.core.layout import Layout
    from voxelengine_tpu.worldgen.terrain import generate_world, solid_at

    dims = (32, 16, 32)
    x = jnp.arange(dims[0])[None, None, :]
    y = jnp.arange(dims[1])[None, :, None]
    z = jnp.arange(dims[2])[:, None, None]
    dense = solid_at(x, y, z, octaves=4)
    for layout in (Layout.LINEAR, Layout.TILED_LINEAR, Layout.TILED_MORTON):
        got = generate_world(dims, octaves=4, layout=layout, slab_z=8)
        want = BitGrid.from_dense(dense, layout)
        assert (np.asarray(got.words) == np.asarray(want.words)).all(), layout
        # and an odd slab size falls back to the dense path, same result
        got2 = generate_world(dims, octaves=4, layout=layout, slab_z=16)
        assert (np.asarray(got2.words) == np.asarray(want.words)).all(), layout
