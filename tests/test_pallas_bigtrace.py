"""Parity tests for the HBM-scale line-table Pallas traversal.

The kernel must reproduce :func:`voxelengine_tpu.ops.trace.trace_brickmap`
exactly (hits, positions, normals, steps) — interpret mode here (CPU);
compiled-on-TPU parity is covered by the TPU smoke lane (bench harness).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxelengine_tpu.core.bitgrid import BitGrid
from voxelengine_tpu.core.brickmap import build_brickmap, build_brickmap_terrain
from voxelengine_tpu.core.layout import Layout
from voxelengine_tpu.ops.pallas_bigtrace import make_line_table, trace_brickmap_hbm
from voxelengine_tpu.ops.trace import trace_brickmap


def _world(rng, dims=(64, 64, 64), factor=8, fill=0.02):
    dense = rng.random((dims[2], dims[1], dims[0])) < fill
    dense[:, 0:4, :] = rng.random((dims[2], 4, dims[0])) < 0.5
    grid = BitGrid.from_dense(dense)
    return build_brickmap(grid, factor, coarse_layout=Layout.LINEAR)


def _rays(rng, n, world, spread=2.0):
    wx, wy, wz = world
    origins = (rng.random((n, 3)) * np.asarray([wx, wy, wz]) * spread
               - np.asarray([wx, wy, wz]) * (spread - 1) / 2).astype(np.float32)
    targets = (rng.random((n, 3)) * np.asarray([wx, wy, wz])).astype(np.float32)
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return origins, d.astype(np.float32)


def _assert_match(out, ref, atol=0.0):
    hit_r, hit_o = np.asarray(ref.hit), np.asarray(out.hit)
    assert (hit_r == hit_o).all(), f"hit mismatch: {np.flatnonzero(hit_r != hit_o)[:8]}"
    assert np.array_equal(np.asarray(ref.steps), np.asarray(out.steps)), (
        "steps mismatch"
    )
    m = hit_r
    assert np.allclose(
        np.asarray(ref.position)[m], np.asarray(out.position)[m], atol=atol
    ), "position mismatch"
    assert np.array_equal(
        np.asarray(ref.normal)[m], np.asarray(out.normal)[m]
    ), "normal mismatch"


@pytest.mark.parametrize(
    "use_macro,shortlist", [(False, 2), (True, 0), (True, 1), (True, 2), (True, -1)]
)
def test_bigtrace_matches_xla_random_world(rng, use_macro, shortlist):
    bm = _world(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 256, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 256)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 256, shortlist=shortlist,
        tile=256, num_slots=4, use_macro=use_macro, interpret=True,
    )
    if use_macro:
        # macro skips charge exact L1 distance -> steps still match
        _assert_match(out, ref)
    else:
        _assert_match(out, ref)


@pytest.mark.parametrize(
    "coarse", [Layout.LINEAR, Layout.TILED_MORTON, Layout.TILED_LINEAR]
)
def test_bigtrace_any_coarse_layout(rng, coarse):
    """C3 property: the line table + flagship kernel reproduce the XLA
    traversal for every coarse chunk-order (the table build gathers
    non-LINEAR orders into region records; VolumeRaytracer.cuh:17-18)."""
    dense = rng.random((64, 64, 64)) < 0.02
    dense[:, 0:3, :] = rng.random((64, 3, 64)) < 0.5
    grid = BitGrid.from_dense(dense)
    bm = build_brickmap(grid, 8, coarse_layout=coarse)
    assert bm.coarse_layout is coarse  # 8^3 chunk grid keeps any layout
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 192, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 200)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 200, tile=128, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


@pytest.mark.parametrize(
    "brick", [Layout.LINEAR, Layout.TILED_MORTON, Layout.TILED_LINEAR]
)
def test_bigtrace_any_brick_layout(rng, brick):
    """C3 property, brick side: the kernel's in-brick bit addressing
    reproduces the XLA traversal for every brick packing order — including
    TILED_MORTON (VolumeRaytracer.cuh:41-106), which used to fall through
    to the TILED_LINEAR formula silently."""
    dense = rng.random((64, 64, 64)) < 0.02
    dense[:, 0:3, :] = rng.random((64, 3, 64)) < 0.5
    grid = BitGrid.from_dense(dense)
    bm = build_brickmap(
        grid, 8, coarse_layout=Layout.LINEAR, brick_layout=brick
    )
    assert bm.brick_layout is brick
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 192, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 200)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 200, tile=128, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


def test_bigtrace_terrain_compact(rng):
    from voxelengine_tpu.core.brickmap import build_brickmap_terrain_compact

    bm = build_brickmap_terrain_compact((128, 64, 128), 32, octaves=3)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 256, bm.world_dims, spread=1.5)
    ref = trace_brickmap(bm, origins, rays, 512)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 512,
        tile=256, num_slots=6, use_macro=True, interpret=True,
    )
    _assert_match(out, ref)


def test_bigtrace_budget_truncation(rng):
    """Rays dying of step budget report steps == max_steps and no hit,
    exactly like the XLA path (macro skips clamp the same way)."""
    bm = _world(rng, fill=0.0)  # only the floor
    lt = make_line_table(bm)
    # grazing rays along the world, above the floor: long walks, no hits
    n = 128
    origins = np.tile(np.asarray([[1.0, 30.0, 1.0]], np.float32), (n, 1))
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rays = np.stack(
        [np.cos(ang), np.full(n, -0.01), np.sin(ang)], axis=1
    ).astype(np.float32)
    ref = trace_brickmap(bm, origins, rays, 24)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 24, tile=128, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


def test_bigtrace_cap_truncation_is_flagged(rng):
    """Adversarial DMA starvation must never produce a silent fake miss.

    120 rays, each in its own region wanting a distinct region line, with
    ``dma_per_round=1``: the min-want vote serves ~one line per outer
    round, and the iteration cap (~84 rounds at ``max_steps=32``) binds
    before every ray is served.  Rays still active when the cap exits
    must report ``steps == max_steps`` (the budget-dead terminal the
    staged rescue's survivor test catches), not a low-steps miss; served
    rays must match the XLA reference exactly."""
    nreg = 120
    dense = np.zeros((nreg * 32, 32, 32), bool)  # (z, y, x) voxels
    dense[0, 0, 0] = True  # one brick so the builder has a non-empty table
    grid = BitGrid.from_dense(dense)
    bm = build_brickmap(grid, 4, coarse_layout=Layout.LINEAR)
    lt = make_line_table(bm)
    assert lt.num_regions == nreg
    max_steps = 32
    # one ray per region, pointing +y from chunk-row 2: ~7 coarse events
    # to exit the grid, all needing (only) that region's meta line
    origins = np.stack(
        [
            np.full(nreg, 16.0, np.float32),
            np.full(nreg, 9.0, np.float32),
            np.arange(nreg, dtype=np.float32) * 32.0 + 16.0,
        ],
        axis=1,
    )
    rays = np.tile(np.asarray([[0.0, 1.0, 0.0]], np.float32), (nreg, 1))
    ref = trace_brickmap(bm, origins, rays, max_steps)
    assert not np.asarray(ref.hit).any()
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, max_steps,
        tile=128, num_slots=4, dma_per_round=1, inner_steps=8,
        use_macro=False, interpret=True,
    )
    hit_o = np.asarray(out.hit)
    steps_o = np.asarray(out.steps)
    steps_r = np.asarray(ref.steps)
    assert not hit_o.any()
    trunc = steps_o != steps_r
    # the scenario genuinely starves (structurally: <=84 serviceable lines
    # for 120 distinct wants) ...
    assert trunc.any(), "starvation scenario no longer binds the cap"
    # ... and every starved ray is flagged with the full budget
    assert (steps_o[trunc] == max_steps).all(), (
        "cap truncation produced a silent low-steps miss"
    )
    assert (steps_o[~trunc] == steps_r[~trunc]).all()


def test_bigtrace_tiny_cache_thrash(rng):
    """Correct under heavy eviction (2 slots, divergent rays)."""
    bm = _world(rng, fill=0.05)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 128, bm.world_dims, spread=3.0)
    ref = trace_brickmap(bm, origins, rays, 128)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 128,
        tile=128, num_slots=2, dma_per_round=1, interpret=True,
    )
    _assert_match(out, ref)


def test_bigtrace_multi_tile_grid(rng):
    """Grid over several ray tiles with the persistent cache reused."""
    bm = _world(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 700, bm.world_dims)  # pads to 768, 3 tiles
    ref = trace_brickmap(bm, origins, rays, 200)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 200, tile=256, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


def test_render_frame_with_line_table(rng):
    """render_frame(lt=...) produces the exact frame of the XLA path
    (full budget, no staging), including checkerboard + tile_order."""
    import dataclasses

    import jax.numpy as jnp

    from voxelengine_tpu.config import Environment, RenderConfig
    from voxelengine_tpu.render.frame import make_framebuffer, render_frame

    bm = _world(rng, dims=(64, 64, 64), factor=8, fill=0.01)
    lt = make_line_table(bm)
    cfg = RenderConfig(
        width=64, height=64, checkerboard=True, staged_trace=False,
        trace_tile=256, trace_slots=4, tile_order=True, max_steps=256,
    )
    env = Environment.default()
    origin = jnp.asarray([32.0, 48.0, 32.0], jnp.float32)
    euler = jnp.asarray([-0.5, 0.8, 0.0], jnp.float32)

    fb_ref = render_frame(
        bm, make_framebuffer(cfg), origin, euler, env, jnp.int32(1),
        dataclasses.replace(cfg, tile_order=False),
    )
    fb_lt = render_frame(
        bm, make_framebuffer(cfg), origin, euler, env, jnp.int32(1), cfg, lt=lt
    )
    assert np.array_equal(np.asarray(fb_ref), np.asarray(fb_lt))


def test_apply_edits_hbm_incremental(rng):
    """Incremental line-table edits == rebuilding the table from the edited
    brickmap, and the kernel traces the edited world correctly."""
    import jax

    from voxelengine_tpu.core.brickmap import apply_edits
    from voxelengine_tpu.ops.pallas_bigtrace import apply_edits_hbm

    bm = _world(rng, dims=(64, 64, 64), factor=8, fill=0.01)
    lt = make_line_table(bm)

    k = 40
    xs = rng.integers(0, 64, k)
    ys = rng.integers(0, 64, k)
    zs = rng.integers(0, 64, k)
    vals = rng.random(k) < 0.7
    import jax.numpy as jnp

    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731 (donation-safe)
    bm_ref = apply_edits(copy(bm), xs, ys, zs, vals)
    lt_ref = make_line_table(bm_ref)

    bm2, lt2 = apply_edits_hbm(copy(bm), copy(lt), xs, ys, zs, vals)
    assert np.array_equal(np.asarray(bm_ref.meta), np.asarray(bm2.meta))
    assert np.array_equal(np.asarray(bm_ref.bricks), np.asarray(bm2.bricks))
    assert np.array_equal(
        np.asarray(lt_ref.region_lines), np.asarray(lt2.region_lines)
    )
    assert np.array_equal(np.asarray(lt_ref.macro), np.asarray(lt2.macro))
    assert np.array_equal(np.asarray(lt_ref.macro2), np.asarray(lt2.macro2))

    origins, rays = _rays(rng, 256, bm2.world_dims)
    ref = trace_brickmap(bm2, origins, rays, 256)
    out = trace_brickmap_hbm(
        bm2, lt2, origins, rays, 256, tile=256, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


def test_bigtrace_staged_matches_plain(rng):
    """Straggler-compacted wrapper == single full-budget launch exactly."""
    from voxelengine_tpu.ops.pallas_bigtrace import trace_brickmap_hbm_staged

    bm = _world(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 512, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 256)
    out = trace_brickmap_hbm_staged(
        bm, lt, origins, rays, 256,
        stage_steps=24, tail_frac=4, tile=256, num_slots=4,
    )
    _assert_match(out, ref, atol=1e-5)


def test_bigtrace_staged_overflow_rescued(rng):
    """A tail buffer far below the survivor count triggers the cond rescue:
    results still equal the plain full-budget trace exactly."""
    from voxelengine_tpu.ops.pallas_bigtrace import trace_brickmap_hbm_staged

    bm = _world(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 2048, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 256)
    out = trace_brickmap_hbm_staged(
        bm, lt, origins, rays, 256,
        stage_steps=4, tail_frac=2048, tile=256, num_slots=4,
    )
    _assert_match(out, ref, atol=1e-5)


def _world_l2(rng):
    """256x64x256/f4 world (8x2x8 regions, 2x1x2 super-regions) with empty
    super-regions, so the L2 macro skip actually fires."""
    dense = np.zeros((256, 64, 256), bool)  # (z, y, x)
    dense[:128, :3, :128] = rng.random((128, 3, 128)) < 0.3  # quarter floor
    dense[200:216, :40, 200:216] = True  # isolated tower
    return build_brickmap(
        BitGrid.from_dense(dense), 4, coarse_layout=Layout.LINEAR
    )


def test_bigtrace_l2_macro_matches_xla(rng):
    """Two-level macro skip (super-region spans) stays exact vs the plain
    XLA trace, including the charged step counts."""
    bm = _world_l2(rng)
    lt = make_line_table(bm)
    # L2 was built from occupancy (not the all-occupied fallback) and has
    # at least one empty super-region to skip across
    m2 = np.asarray(lt.macro2)
    assert (m2 != -1).all() and (m2[0] & 0b1111) != 0b1111
    origins, rays = _rays(rng, 384, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 512)
    out = trace_brickmap_hbm(
        bm, lt, origins, rays, 512, tile=384, num_slots=4, interpret=True
    )
    _assert_match(out, ref, atol=1e-5)


def test_bigtrace_l3_macro_matches_xla(rng):
    """L3 macro skips (128-chunk spans over empty 16^3-region blocks)
    charge exactly the chunk distance the plain walk would: steps, hits,
    positions all equal the XLA traversal on a world whose far half is
    entirely empty (so L3 actually fires)."""
    from voxelengine_tpu.ops.pallas_bigtrace import MACRO2_WORDS

    dense = np.zeros((64, 64, 2048), bool)  # [z, y, x]
    dense[:, 0:4, 0:512] = rng.random((64, 4, 512)) < 0.5
    dense[20:30, 10:20, 100:200] = rng.random((10, 10, 100)) < 0.1
    bm = build_brickmap(
        BitGrid.from_dense(dense), 8, coarse_layout=Layout.LINEAR
    )
    lt = make_line_table(bm)
    m3 = np.asarray(lt.macro2)[MACRO2_WORDS:]
    assert (m3 != -1).any(), "L3 should be real for this grid"
    # rays start deep in the empty half, pointing back at the occupied end
    n = 128
    origins = np.stack([
        rng.uniform(1600, 2040, n),
        rng.uniform(2, 60, n),
        rng.uniform(2, 62, n),
    ], -1).astype(np.float32)
    d = np.stack([
        -np.ones(n), rng.normal(0, 0.1, n), rng.normal(0, 0.1, n)
    ], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = trace_brickmap(bm, origins, d.astype(np.float32), 1024)
    out = trace_brickmap_hbm(
        bm, lt, origins, d.astype(np.float32), 1024,
        tile=128, num_slots=4, interpret=True,
    )
    _assert_match(out, ref)


def test_macro_budget_overflow_reads_occupied(rng, monkeypatch):
    """When the super-region count exceeds the scalar word budget the
    level must be DISABLED (read all-occupied), never read as empty —
    regression for the select-chain default that let 32-chunk spans skip
    through geometry on over-budget worlds.  Forced here by shrinking the
    budget to zero so every sregion word index is out of range."""
    import voxelengine_tpu.ops.pallas_bigtrace as B

    monkeypatch.setattr(B, "MACRO2_WORDS", 0)
    # the constant is read at TRACE time: drop cached executables so both
    # this test and later ones trace against their own constant
    B.make_line_table.clear_cache()
    B.trace_brickmap_hbm.clear_cache()
    try:
        bm = _world(rng)
        lt = B.make_line_table(bm)
        assert lt.macro2.shape[0] == B.MACRO3_WORDS  # fallback path taken
        origins, rays = _rays(rng, 192, bm.world_dims)
        ref = trace_brickmap(bm, origins, rays, 256)
        out = B.trace_brickmap_hbm(
            bm, lt, origins, rays, 256, tile=128, num_slots=4, interpret=True
        )
        _assert_match(out, ref)
    finally:
        B.make_line_table.clear_cache()
        B.trace_brickmap_hbm.clear_cache()


def test_apply_edits_hbm_macro2_refresh(rng):
    """Edits that fill / clear super-regions refresh macro2 exactly like a
    full table rebuild."""
    import jax
    import jax.numpy as jnp

    from voxelengine_tpu.core.brickmap import apply_edits
    from voxelengine_tpu.ops.pallas_bigtrace import apply_edits_hbm

    bm = _world_l2(rng)
    lt = make_line_table(bm)
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731

    # set voxels inside an empty super-region AND clear the whole tower
    xs = np.concatenate([[40], np.repeat(np.arange(200, 216), 16)])
    ys = np.concatenate([[40], np.zeros(256, np.int64)])
    zs = np.concatenate([[200], np.tile(np.arange(200, 216), 16)])
    # clear the tower's only occupied y-plane voxels in one chunk column
    vals = np.concatenate([[True], np.zeros(256, bool)])
    bm_ref = apply_edits(copy(bm), xs, ys, zs, vals)
    lt_ref = make_line_table(bm_ref)
    bm2, lt2 = apply_edits_hbm(copy(bm), copy(lt), xs, ys, zs, vals)
    assert np.array_equal(np.asarray(lt_ref.macro), np.asarray(lt2.macro))
    assert np.array_equal(np.asarray(lt_ref.macro2), np.asarray(lt2.macro2))


def test_shadow_rays_through_hbm_kernel(rng):
    """Shadow-ray shading routed through the line-table kernel equals the
    XLA-traced shading exactly."""
    import dataclasses

    import jax.numpy as jnp

    from voxelengine_tpu.config import Environment, RenderConfig
    from voxelengine_tpu.render.frame import make_framebuffer, render_frame

    bm = _world(rng, dims=(64, 64, 64), factor=8, fill=0.01)
    lt = make_line_table(bm)
    cfg = RenderConfig(
        width=64, height=32, checkerboard=False, staged_trace=False,
        trace_tile=128, trace_slots=4, tile_order=True, max_steps=256,
        shadow_rays=True,
    )
    env = Environment.default()
    origin = jnp.asarray([32.0, 48.0, 32.0], jnp.float32)
    euler = jnp.asarray([-0.6, 0.8, 0.0], jnp.float32)
    fa = render_frame(bm, make_framebuffer(cfg), origin, euler, env,
                      jnp.int32(1), dataclasses.replace(cfg, tile_order=False))
    fb = render_frame(bm, make_framebuffer(cfg), origin, euler, env,
                      jnp.int32(1), cfg, lt=lt)
    assert np.array_equal(np.asarray(fa), np.asarray(fb))


def test_rr_kernel_matches_xla(rng):
    """Row-retirement kernel == plain XLA trace exactly, with many queue
    rows cycling through few in-flight slots."""
    from voxelengine_tpu.ops.pallas_bigtrace import trace_brickmap_hbm_rr

    bm = _world(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 1280, bm.world_dims)  # 10 rows
    ref = trace_brickmap(bm, origins, rays, 256)
    out = trace_brickmap_hbm_rr(
        bm, lt, origins, rays, 256,
        rows_inflight=4, num_slots=4, interpret=True,
    )
    _assert_match(out, ref, atol=1e-5)


def test_rr_kernel_l2_and_truncation(rng):
    """RR kernel with L2 macro skips and budget-truncated rays."""
    from voxelengine_tpu.ops.pallas_bigtrace import trace_brickmap_hbm_rr

    bm = _world_l2(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 384, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 96)  # some rays truncate
    out = trace_brickmap_hbm_rr(
        bm, lt, origins, rays, 96,
        rows_inflight=8, num_slots=4, interpret=True,
    )
    _assert_match(out, ref, atol=1e-5)


def _sparse_16k_world(rng):
    """16384x512x16384 @ factor 32 built directly as flat arrays (a dense
    grid at this scale is infeasible; only the sparse occupied set is
    materialized, like the compact builder's output).  Grid 512x16x512
    chunks -> 8192 regions -> 512 super-regions: L2 needs 16 scalar words,
    double the round-2 budget (MACRO2_WORDS was 8), so this is the
    regression world for the raised budgets + world-sized select chains."""
    from voxelengine_tpu.core.brickmap import BrickMap, pack_meta

    gx, gy, gz = 512, 16, 512
    f = 32
    occ = np.zeros((gz, gy, gx), bool)  # [cz, cy, cx]
    occ[248:265, 0, 248:265] = True  # floor pad around world center
    occ[254:257, 1:6, 254:257] = True  # small tower on it
    occ[40, 0, 40] = True  # far lone chunk (keeps a distant sregion real)
    meta = np.zeros(gx * gy * gz, np.int32)
    flat = occ.reshape(-1)  # linear coarse order is [cz, cy, cx]
    zero3 = jnp.zeros(3, jnp.int32)
    full3 = jnp.full(3, 31, jnp.int32)
    meta[flat] = int(pack_meta(jnp.bool_(True), zero3, full3))
    brick_idx = np.where(flat, 0, -1).astype(np.int32)
    bricks = np.full((1, f**3 // 32), 0xFFFFFFFF, np.uint32)  # shared full brick
    return BrickMap(
        meta=jnp.asarray(meta),
        brick_idx=jnp.asarray(brick_idx),
        bricks=jnp.asarray(bricks),
        grid_dims=(gx, gy, gz),
        factor=f,
        coarse_layout=Layout.LINEAR,
        brick_layout=Layout.TILED_LINEAR,
        dense_slots=False,
    )


def test_bigtrace_16k_scale_world(rng):
    """The flagship kernel stays exact on a 16k x 512 x 16k world — 2x the
    reference's demonstrated world size (README.md:29-31) — whose L2 macro
    table overflows the old 8-word budget (512 super-regions -> 16 words).
    Long horizon rays cross hundreds of empty chunks, so L2/L3 spans do
    the skipping and their charged distances must still match the plain
    XLA walk step-for-step."""
    from voxelengine_tpu.ops.pallas_bigtrace import MACRO2_WORDS, MACRO3_WORDS

    bm = _sparse_16k_world(rng)
    lt = make_line_table(bm)
    m2 = np.asarray(lt.macro2)
    assert MACRO2_WORDS * 32 >= 512 > 8 * 32  # over the round-2 budget
    assert (m2 != -1).any(), "L2 must be real (not the all-occupied fallback)"
    assert (np.asarray(lt.macro2)[MACRO2_WORDS:] != -1).any(), "L3 real too"

    n = 128
    wx, wy, wz = bm.world_dims
    kinds = rng.integers(0, 3, n)
    # near rays: above the floor pad, pointing down at it
    o_near = np.stack([
        rng.uniform(7940, 8480, n), rng.uniform(80, 400, n),
        rng.uniform(7940, 8480, n),
    ], -1)
    d_near = np.stack([
        rng.normal(0, 0.3, n), -np.ones(n), rng.normal(0, 0.3, n)
    ], -1)
    # horizon rays: from a far corner, at the tower (cross ~300 empty
    # chunks -> L2/L3 spans fire)
    o_far = np.stack([
        rng.uniform(800, 2000, n), rng.uniform(100, 480, n),
        rng.uniform(800, 2000, n),
    ], -1)
    d_far = np.asarray([8192.0, 120.0, 8192.0]) - o_far
    # sky rays: upward, exit the world without a hit
    d_sky = np.stack([
        rng.normal(0, 0.2, n), np.ones(n), rng.normal(0, 0.2, n)
    ], -1)
    origins = np.where((kinds == 0)[:, None], o_near, o_far)
    d = np.where((kinds == 0)[:, None], d_near,
                 np.where((kinds == 1)[:, None], d_far, d_sky))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    origins = origins.astype(np.float32)
    d = d.astype(np.float32)

    ref = trace_brickmap(bm, origins, d, 1024)
    assert np.asarray(ref.hit).any(), "scene must produce hits"
    out = trace_brickmap_hbm(
        bm, lt, origins, d, 1024, tile=128, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


def test_materialized_brick_lines_parity(rng):
    """Tracing through materialize_brick_lines == the in-jit view (the
    16k-enabling path: the 'zero-copy' view actually costs a full-table
    relayout per dispatch, so big worlds attach the lines once)."""
    from voxelengine_tpu.ops.pallas_bigtrace import (
        brick_lines_view,
        materialize_brick_lines,
    )

    bm = _world(rng)
    lt = make_line_table(bm)
    ltm = materialize_brick_lines(bm, lt)
    assert np.array_equal(
        np.asarray(ltm.brick_lines), np.asarray(brick_lines_view(bm))
    )
    origins, rays = _rays(rng, 256, bm.world_dims)
    ref = trace_brickmap_hbm(
        bm, lt, origins, rays, 256, tile=256, num_slots=4, interpret=True
    )
    out = trace_brickmap_hbm(
        bm, ltm, origins, rays, 256, tile=256, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


def test_apply_edits_hbm_syncs_brick_lines(rng):
    """apply_edits_hbm keeps attached brick lines identical to a fresh
    materialization of the edited brickmap (O(edits) word rewrites)."""
    from voxelengine_tpu.core.brickmap import build_brickmap
    from voxelengine_tpu.ops.pallas_bigtrace import (
        apply_edits_hbm,
        brick_lines_view,
        materialize_brick_lines,
    )

    dense = rng.random((32, 32, 32)) < 0.05
    grid = BitGrid.from_dense(dense)
    bm = build_brickmap(grid, 8, coarse_layout=Layout.LINEAR)  # dense slots
    lt = materialize_brick_lines(bm, make_line_table(bm))
    x = jnp.asarray(rng.integers(0, 32, 16), jnp.int32)
    y = jnp.asarray(rng.integers(0, 32, 16), jnp.int32)
    z = jnp.asarray(rng.integers(0, 32, 16), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2, 16).astype(bool))
    bm2, lt2 = apply_edits_hbm(bm, lt, x, y, z, val)
    assert np.array_equal(
        np.asarray(lt2.brick_lines), np.asarray(brick_lines_view(bm2))
    )


def test_bigtrace_phase_counters(rng):
    """return_phases leaves results untouched and its 8 counters account
    for every active lane-iteration (the round-3/4 perf-analysis build)."""
    bm = _world(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 512, bm.world_dims)
    ref = trace_brickmap_hbm(
        bm, lt, origins, rays, 256, tile=256, num_slots=4, interpret=True
    )
    out, ph = trace_brickmap_hbm(
        bm, lt, origins, rays, 256, tile=256, num_slots=4, interpret=True,
        return_phases=True,
    )
    _assert_match(out, ref)
    ph = {k: np.asarray(v).astype(np.int64) for k, v in ph.items()}
    # disjoint phases sum to the iterations each ray spent active (each
    # active iteration lands in exactly one bucket; step2 rides fstep);
    # rays never exceed their tile's iteration count
    active = sum(
        ph[k] for k in ("stall", "mskip", "cadv", "pend", "desc", "fstep", "asc")
    )
    assert (active <= ph["iters"]).all()
    assert (ph["step2"] <= ph["fstep"]).all()
    assert (ph["xrun"] <= ph["fstep"]).all()
    # every traced ray that did any work shows up in the accounting
    worked = np.asarray(ref.steps) > 0
    assert (active[worked] > 0).all()
    # fine hits require at least one descend; descends need a pend
    # iteration first (non-fused fetch) on every hit ray
    hits = np.asarray(ref.hit)
    assert (ph["desc"][hits] >= 1).all()
    assert (ph["pend"][hits] >= 1).all()


def test_host_brick_lines_matches_device_view(rng, tmp_path):
    """The host-numpy relayout (16k-class path: raw bricks never touch
    HBM) produces exactly the lines materialize_brick_lines builds on
    device, and a world round-tripped through load_world_host_bricks
    traces identically through the kernel."""
    from voxelengine_tpu.io.checkpoint import (
        load_world_host_bricks,
        save_world,
    )
    from voxelengine_tpu.ops.pallas_bigtrace import (
        brick_lines_view,
        host_brick_lines,
    )
    import dataclasses

    bm = _world(rng)
    path = str(tmp_path / "w.npz")
    save_world(path, bm)
    bm2, bricks_host = load_world_host_bricks(path)
    # brick words stay on the host: no device placeholder to mistrace
    assert bm2.bricks is None
    assert bm2.words_per_brick == bm.words_per_brick
    with pytest.raises(ValueError, match="host-resident"):
        brick_lines_view(bm2)
    with pytest.raises(ValueError, match="host-resident"):
        trace_brickmap(bm2, np.zeros((4, 3), np.float32),
                       np.ones((4, 3), np.float32), 8)
    np.testing.assert_array_equal(
        host_brick_lines(np.asarray(bricks_host)),
        np.asarray(brick_lines_view(bm)),
    )
    lt = dataclasses.replace(
        make_line_table(bm2),
        brick_lines=jnp.asarray(host_brick_lines(np.asarray(bricks_host))),
    )
    origins, rays = _rays(rng, 256, bm.world_dims)
    ref = trace_brickmap(bm, origins, rays, 256)
    out = trace_brickmap_hbm(
        bm2, lt, origins, rays, 256, tile=256, num_slots=4, interpret=True
    )
    _assert_match(out, ref)


def test_probe_use_macro_decisions(rng):
    """probe_use_macro returns False on scenes whose rays never leave
    occupied regions and True when macro skips fire (empty-region
    traversal); both decisions trace bit-identically either way."""
    from voxelengine_tpu.config import RenderConfig
    from voxelengine_tpu.render.frame import probe_use_macro

    cfg = RenderConfig(width=64, height=32, trace_tile=256, trace_slots=4)

    # dense random world: every region occupied -> no skips -> False
    bm = _world(rng)
    lt = make_line_table(bm)
    origins, rays = _rays(rng, 512, bm.world_dims)
    assert probe_use_macro(bm, lt, jnp.asarray(origins), jnp.asarray(rays),
                           cfg, stride=2) is False

    # floor-only world with a 2x2x2 REGION grid (128^3 / factor 8 ->
    # 16^3 chunks), rays fired down from the empty top regions: macro
    # skips fire -> True
    dense = np.zeros((128, 128, 128), bool)
    dense[:, 0:2, :] = True
    from voxelengine_tpu.core.bitgrid import BitGrid
    from voxelengine_tpu.core.brickmap import build_brickmap

    bm2 = build_brickmap(BitGrid.from_dense(dense), 8)
    lt2 = make_line_table(bm2)
    assert lt2.num_regions > 1
    n = 256
    o2 = np.tile(np.asarray([[64.0, 126.0, 64.0]], np.float32), (n, 1))
    t = (rng.random((n, 3)) * np.asarray([128, 2, 128])).astype(np.float32)
    d2 = t - o2
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    assert probe_use_macro(bm2, lt2, jnp.asarray(o2),
                           jnp.asarray(d2.astype(np.float32)), cfg,
                           stride=2) is True
