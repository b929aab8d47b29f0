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
