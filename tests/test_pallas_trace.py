"""Pallas fused-kernel traversal tests (interpret mode on CPU; the real
Mosaic compile is exercised on TPU by bench/apps)."""

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.core.bitgrid import BitGrid
from voxelengine_tpu.core.layout import Layout
from voxelengine_tpu.ops.pallas_trace import (
    trace_grid_mxu,
    trace_grid_vpu,
    words_to_limb_rows,
    words_to_rows_i32,
)
from voxelengine_tpu.ops.trace import trace_grid


def _scene(rng):
    dense = rng.random((64, 64, 64)) < 0.01
    dense[:, :6, :] = rng.random((64, 6, 64)) < 0.6
    return dense


def _rays(rng, n=1500):
    origins = (rng.random((n, 3)) * 120 - 30).astype(np.float32)
    targets = (rng.random((n, 3)) * 64).astype(np.float32)
    rays = targets - origins
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    return origins, rays.astype(np.float32)


def test_limb_tables_roundtrip(rng):
    w = rng.integers(0, 2**32, 300, dtype=np.uint32)
    limbs = np.asarray(words_to_limb_rows(jnp.asarray(w)))
    assert limbs.shape == (4, 3, 128)
    rebuilt = sum(
        limbs[i].astype(np.uint32).reshape(-1) << (8 * i) for i in range(4)
    )[:300]
    assert np.array_equal(rebuilt, w)


def test_mxu_kernel_matches_trace_grid(rng):
    dense = _scene(rng)
    origins, rays = _rays(rng)
    for lay in (Layout.TILED_LINEAR, Layout.LINEAR):
        g = BitGrid.from_dense(dense, layout=lay)
        a = trace_grid(g, jnp.asarray(origins), jnp.asarray(rays))
        b = trace_grid_mxu(g, jnp.asarray(origins), jnp.asarray(rays), interpret=True)
        assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
        assert np.array_equal(np.asarray(a.steps), np.asarray(b.steps))
        hits = np.asarray(a.hit)
        assert np.allclose(
            np.asarray(a.position)[hits], np.asarray(b.position)[hits], atol=1e-4
        )
        assert np.array_equal(np.asarray(a.normal)[hits], np.asarray(b.normal)[hits])


def test_mxu_kernel_tile_padding(rng):
    """N not divisible by the tile still returns exact per-ray results."""
    dense = _scene(rng)
    origins, rays = _rays(rng, n=700)  # < tile
    g = BitGrid.from_dense(dense)
    a = trace_grid(g, jnp.asarray(origins), jnp.asarray(rays))
    b = trace_grid_mxu(
        g, jnp.asarray(origins), jnp.asarray(rays), tile=512, interpret=True
    )
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))


def test_rows_i32_roundtrip(rng):
    w = rng.integers(0, 2**32, 300, dtype=np.uint32)
    t = np.asarray(words_to_rows_i32(jnp.asarray(w)))
    assert t.shape == (8, 128)  # padded to a [8,128] vreg block
    assert np.array_equal(t.reshape(-1)[:300].astype(np.uint32), w)


def test_vpu_kernel_matches_trace_grid(rng):
    """The pair-gather fetch variant is event-exact vs the XLA traversal
    (same `_axis_pick3` tie-break, edge padding, budget)."""
    dense = rng.random((32, 32, 32)) < 0.015
    dense[:, :4, :] = rng.random((32, 4, 32)) < 0.6
    n = 640
    origins = (rng.random((n, 3)) * 60 - 15).astype(np.float32)
    targets = (rng.random((n, 3)) * 32).astype(np.float32)
    rays = targets - origins
    rays = (rays / np.linalg.norm(rays, axis=1, keepdims=True)).astype(np.float32)
    for lay in (Layout.TILED_LINEAR, Layout.LINEAR):
        g = BitGrid.from_dense(dense, layout=lay)
        a = trace_grid(g, jnp.asarray(origins), jnp.asarray(rays), 256)
        b = trace_grid_vpu(
            g, jnp.asarray(origins), jnp.asarray(rays), 256,
            tile=1024, interpret=True,
        )
        assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
        assert np.array_equal(np.asarray(a.steps), np.asarray(b.steps))
        hits = np.asarray(a.hit)
        assert np.allclose(
            np.asarray(a.position)[hits], np.asarray(b.position)[hits], atol=1e-4
        )
        assert np.array_equal(np.asarray(a.normal)[hits], np.asarray(b.normal)[hits])


def test_render_frame_dense_matches_brickmap(rng):
    import jax.numpy as jnp
    from voxelengine_tpu.config import Environment, RenderConfig
    from voxelengine_tpu.core.brickmap import build_brickmap
    from voxelengine_tpu.render.frame import (
        make_framebuffer,
        render_frame,
        render_frame_dense,
    )
    from voxelengine_tpu.worldgen.terrain import generate_world

    grid = generate_world((64, 64, 64), octaves=4)
    bm = build_brickmap(grid, 8)
    cfg = RenderConfig(width=64, height=48, checkerboard=False)
    env = Environment.default()
    o = jnp.asarray([32.0, 40.0, -20.0])
    e = jnp.asarray([-0.35, 3.14159, 0.0])
    a = render_frame(bm, make_framebuffer(cfg), o, e, env, jnp.int32(0), cfg)
    b = render_frame_dense(
        grid, make_framebuffer(cfg), o, e, env, jnp.int32(0), cfg, interpret=True
    )
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-5
