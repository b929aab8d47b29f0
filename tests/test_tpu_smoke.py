"""TPU smoke lane: the Pallas kernels COMPILED on real hardware.

Interpret-mode parity (the rest of the suite) does not prove Mosaic can
compile a kernel on v5e — this lane does, asserting hardware-compiled
results equal the XLA paths on small scenes.  Skipped entirely under the
default CPU-forced harness; run with:

    VOX_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU smoke lane (set VOX_TPU_TESTS=1 and run on hardware)",
)

import jax.numpy as jnp  # noqa: E402

from voxelengine_tpu.core.bitgrid import BitGrid  # noqa: E402
from voxelengine_tpu.core.brickmap import build_brickmap  # noqa: E402
from voxelengine_tpu.core.layout import Layout  # noqa: E402


def _scene(rng, n=64):
    dense = rng.random((n, n, n)) < 0.02
    dense[:, 0:4, :] = rng.random((n, 4, n)) < 0.5
    return dense


def _rays(rng, k, n):
    origins = (rng.random((k, 3)) * n * 2 - n / 2).astype(np.float32)
    targets = (rng.random((k, 3)) * n).astype(np.float32)
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(d.astype(np.float32))


def test_trace_grid_mxu_compiled(rng):
    from voxelengine_tpu.ops.pallas_trace import trace_grid_mxu
    from voxelengine_tpu.ops.trace import trace_grid

    dense = _scene(rng)
    grid = BitGrid.from_dense(dense)
    o, d = _rays(rng, 512, 64)
    ref = trace_grid(grid, o, d, 256)
    out = trace_grid_mxu(grid, o, d, 256, tile=512, interpret=False)
    assert (np.asarray(ref.hit) == np.asarray(out.hit)).all()
    assert np.array_equal(np.asarray(ref.steps), np.asarray(out.steps))


def test_trace_grid_vpu_compiled(rng):
    """The pair-gather dense kernel (round-4 default dense path) compiles
    on real Mosaic and matches the XLA traversal."""
    from voxelengine_tpu.ops.pallas_trace import trace_grid_vpu
    from voxelengine_tpu.ops.trace import trace_grid

    dense = _scene(rng)
    grid = BitGrid.from_dense(dense)
    o, d = _rays(rng, 1500, 64)
    ref = trace_grid(grid, o, d, 256)
    out = trace_grid_vpu(grid, o, d, 256, interpret=False)
    assert (np.asarray(ref.hit) == np.asarray(out.hit)).all()
    assert np.array_equal(np.asarray(ref.steps), np.asarray(out.steps))


def test_trace_brickmap_mxu_compiled(rng):
    from voxelengine_tpu.ops.pallas_trace2 import trace_brickmap_mxu
    from voxelengine_tpu.ops.trace import trace_brickmap

    bm = build_brickmap(BitGrid.from_dense(_scene(rng)), 8)
    o, d = _rays(rng, 512, 64)
    ref = trace_brickmap(bm, o, d, 256)
    out = trace_brickmap_mxu(bm, o, d, 256, tile=512, interpret=False)
    assert (np.asarray(ref.hit) == np.asarray(out.hit)).all()
    assert np.array_equal(np.asarray(ref.steps), np.asarray(out.steps))


def test_trace_brickmap_hbm_compiled(rng):
    from voxelengine_tpu.ops.pallas_bigtrace import (
        make_line_table,
        trace_brickmap_hbm,
    )
    from voxelengine_tpu.ops.trace import trace_brickmap

    bm = build_brickmap(
        BitGrid.from_dense(_scene(rng)), 8, coarse_layout=Layout.LINEAR
    )
    lt = make_line_table(bm)
    o, d = _rays(rng, 2048, 64)
    ref = trace_brickmap(bm, o, d, 256)
    out = trace_brickmap_hbm(bm, lt, o, d, 256, tile=1024, interpret=False)
    assert (np.asarray(ref.hit) == np.asarray(out.hit)).all()
    assert np.array_equal(np.asarray(ref.steps), np.asarray(out.steps))


def test_trace_brickmap_hbm_compiled_morton_bricks(rng):
    """The TILED_MORTON brick_bit branch (VolumeRaytracer.cuh:41-106)
    lowers on real Mosaic — _morton3d_8 is pure i32 shift/mask vreg
    arithmetic, but only a hardware compile proves it."""
    from voxelengine_tpu.ops.pallas_bigtrace import (
        make_line_table,
        trace_brickmap_hbm,
    )
    from voxelengine_tpu.ops.trace import trace_brickmap

    bm = build_brickmap(
        BitGrid.from_dense(_scene(rng)), 8,
        coarse_layout=Layout.LINEAR, brick_layout=Layout.TILED_MORTON,
    )
    lt = make_line_table(bm)
    o, d = _rays(rng, 1024, 64)
    ref = trace_brickmap(bm, o, d, 256)
    out = trace_brickmap_hbm(bm, lt, o, d, 256, tile=1024, interpret=False)
    assert (np.asarray(ref.hit) == np.asarray(out.hit)).all()
    assert np.array_equal(np.asarray(ref.steps), np.asarray(out.steps))


def test_trace_brickmap_mxu_compiled_morton(rng):
    """Morton coarse+brick addressing in the MXU kernel on hardware."""
    from voxelengine_tpu.ops.pallas_trace2 import trace_brickmap_mxu
    from voxelengine_tpu.ops.trace import trace_brickmap

    bm = build_brickmap(
        BitGrid.from_dense(_scene(rng)), 8,
        coarse_layout=Layout.TILED_MORTON, brick_layout=Layout.TILED_MORTON,
    )
    o, d = _rays(rng, 512, 64)
    ref = trace_brickmap(bm, o, d, 256)
    out = trace_brickmap_mxu(bm, o, d, 256, tile=512, interpret=False)
    assert (np.asarray(ref.hit) == np.asarray(out.hit)).all()
    assert np.array_equal(np.asarray(ref.steps), np.asarray(out.steps))
