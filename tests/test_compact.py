"""Device-side brickmap compaction tests."""

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.core.bitgrid import BitGrid
from voxelengine_tpu.core.brickmap import build_brickmap, compact_brickmap
from voxelengine_tpu.ops.trace import trace_brickmap


def test_compact_preserves_geometry(small_world):
    dense, _, bm = small_world
    bmc = compact_brickmap(bm)
    assert not bmc.dense_slots
    # at most one extra row (the shared all-full brick at slot 0)
    assert bmc.bricks.shape[0] <= bm.bricks.shape[0] + 1
    assert (np.asarray(bmc.to_dense()) == dense).all()


def test_compact_dedupes_full(rng):
    dense = np.zeros((16, 16, 16), bool)
    dense[0:8, 0:8, 0:8] = True
    dense[8:16, 8:16, 8:16] = True
    dense[9, 2, 2] = True
    bm = build_brickmap(BitGrid.from_dense(dense), 8)  # dense slots: 8 bricks
    bmc = compact_brickmap(bm)
    assert bmc.bricks.shape[0] == 2  # shared full brick + one sparse brick
    assert (np.asarray(bmc.to_dense()) == dense).all()


def test_compact_trace_equivalence(small_world, ray_batch):
    _, _, bm = small_world
    origins, rays = ray_batch
    a = trace_brickmap(bm, jnp.asarray(origins), jnp.asarray(rays))
    b = trace_brickmap(compact_brickmap(bm), jnp.asarray(origins), jnp.asarray(rays))
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hits = np.asarray(a.hit)
    assert np.allclose(np.asarray(a.position)[hits], np.asarray(b.position)[hits], atol=1e-5)
