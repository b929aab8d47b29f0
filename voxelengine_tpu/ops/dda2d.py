"""2D DDA traversal — the ``DDATestCpp`` prototype's capability
(``DDATestCpp.cpp:26-260``) as a thin planar embedding of the 3D engine.

The reference maintains a separate 2D implementation of the same algorithm
(its CPU prototype/visual debugger).  Here 2D is the 3D machine restricted
to the z = 0 plane: a [1 or factor]-deep grid with ``dz = 0`` rays never
steps in z, so the 3D traversal *is* the 2D traversal — one code path, no
drift between prototypes (``tMax_z = inf`` exactly like the 2D math).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.config import MAX_STEPS
from voxelengine_tpu.core.bitgrid import BitGrid
from voxelengine_tpu.core.brickmap import BrickMap, build_brickmap
from voxelengine_tpu.core.layout import Layout
from voxelengine_tpu.ops.trace import TraceOut, trace_brickmap, trace_grid


def grid2d_from_dense(dense2d) -> BitGrid:
    """Pack a [H(y), W(x)] bool array as a depth-1 3D grid."""
    return BitGrid.from_dense(np.asarray(dense2d)[None, :, :], layout=Layout.LINEAR)


def brickmap2d_from_dense(dense2d, factor: int) -> BrickMap:
    """Two-level 2D brickmap: depth = ``factor`` so z holds one chunk layer
    (the analog of ``createBuffersFromVoxels(factor)``,
    ``DDATestCpp.cpp:324-325``)."""
    d = np.asarray(dense2d)
    vol = np.zeros((factor,) + d.shape, bool)
    vol[0] = d
    # LINEAR like grid2d_from_dense: the tiled layouts need depth % 8 == 0,
    # which a factor-deep plane (factor can be any value <= 32) is not
    return build_brickmap(BitGrid.from_dense(vol, layout=Layout.LINEAR),
                          factor, dense_slots=False, dedupe_uniform=False)


def _lift(p2):
    p2 = jnp.asarray(p2, jnp.float32)
    z = jnp.full(p2.shape[:-1] + (1,), 0.5, jnp.float32)
    zd = jnp.zeros(p2.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([p2, z], -1), zd


def trace_grid_2d(grid: BitGrid, origins2, rays2, max_steps: int = MAX_STEPS) -> TraceOut:
    """Single-level 2D DDA (``DDATestCpp.cpp:26-134``).  ``origins2``/
    ``rays2`` are [N, 2]; results carry z components that are identically
    0.5 / 0."""
    o3, _ = _lift(origins2)
    r2 = jnp.asarray(rays2, jnp.float32)
    r3 = jnp.concatenate([r2, jnp.zeros(r2.shape[:-1] + (1,), jnp.float32)], -1)
    return trace_grid(grid, o3, r3, max_steps)


def trace_brickmap_2d(bm: BrickMap, origins2, rays2, max_steps: int = MAX_STEPS) -> TraceOut:
    """Two-level 2D trace (``DDATestCpp.cpp:136-260``)."""
    o3, _ = _lift(origins2)
    r2 = jnp.asarray(rays2, jnp.float32)
    r3 = jnp.concatenate([r2, jnp.zeros(r2.shape[:-1] + (1,), jnp.float32)], -1)
    return trace_brickmap(bm, o3, r3, max_steps)


def radial_rays(center, count: int) -> Tuple[np.ndarray, np.ndarray]:
    """The prototype's radial ray fan (``DDATestCpp.cpp:443-452``):
    ``count`` rays from ``center`` spanning 2*pi."""
    ang = np.arange(count, dtype=np.float64) * (2.0 * np.pi / count)
    rays = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    origins = np.tile(np.asarray(center, np.float32)[None], (count, 1))
    return origins, rays
