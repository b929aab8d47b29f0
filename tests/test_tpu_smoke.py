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


def test_two_level_oracle_parity_compiled(rng):
    """C7 on hardware: the flagship HBM kernel, COMPILED by Mosaic on the
    real chip, against the scalar reference-semantics oracle
    (VolumeRaytracer.cu:354-525) — not merely against the XLA twin.  Same
    budget and mismatch bound as the CPU-lane test_two_level_parity: the
    resume-based production path may legitimately differ on rays the
    oracle's repeat-cell guard kills (reference quirk, rate measured in
    PARITY.md), so hit mismatches are bounded at 1%."""
    from voxelengine_tpu.oracle import reference as R
    from voxelengine_tpu.ops.pallas_bigtrace import (
        make_line_table,
        trace_brickmap_hbm,
    )

    dense = _scene(rng)
    bm = build_brickmap(
        BitGrid.from_dense(dense), 8, coarse_layout=Layout.LINEAR
    )
    lt = make_line_table(bm)
    o, d = _rays(rng, 1024, 64)
    out = trace_brickmap_hbm(bm, lt, o, d, 2048, tile=1024, interpret=False)
    hit = np.asarray(out.hit)
    pos = np.asarray(out.position)
    nrm = np.asarray(out.normal)
    on, dn = np.asarray(o), np.asarray(d)
    coarse, cdims, brick, cbounds = R.make_brickmap_callbacks(dense, 8)
    hit_mism = 0
    for i in range(on.shape[0]):
        res = R.raytrace_brickmap(coarse, cdims, brick, cbounds, 8,
                                  on[i], dn[i])
        if bool(hit[i]) != res.hit:
            hit_mism += 1
            continue
        if res.hit:
            assert np.allclose(pos[i], res.position, atol=2e-3), i
            assert np.allclose(nrm[i], res.normal, atol=0), i
    assert hit_mism <= on.shape[0] // 100, hit_mism


def test_full_shading_golden_compiled(rng):
    """C11 on hardware: a full-shading frame (shadow rays + 4-sample AO +
    one-bounce reflections, Renderer.cu:89-177 semantics) rendered through
    the compiled Mosaic kernel path (``lt``) equals the plain-XLA render
    to fusion-level ULPs — hits are exact by the same argument the bench
    gate makes every run; shading is the identical jnp math under two
    separate jits."""
    import dataclasses

    import jax.numpy as jnp

    from voxelengine_tpu.config import Environment, RenderConfig
    from voxelengine_tpu.ops.pallas_bigtrace import make_line_table
    from voxelengine_tpu.render.frame import make_framebuffer, render_frame

    dense = _scene(rng)
    bm = build_brickmap(
        BitGrid.from_dense(dense), 8, coarse_layout=Layout.LINEAR
    )
    lt = make_line_table(bm)
    env = Environment.default()
    origin = jnp.asarray([32.0, 40.0, 56.0], jnp.float32)
    euler = jnp.asarray([-0.7, 0.2, 0.0], jnp.float32)
    cfg = RenderConfig(width=64, height=32, checkerboard=False,
                       crosshair=False, staged_trace=False,
                       shadow_rays=True, ao_samples=4, reflections=True,
                       trace_use_macro=False)
    f_pallas = np.asarray(render_frame(
        bm, make_framebuffer(cfg), origin, euler, env, jnp.int32(0), cfg,
        lt=lt))
    f_xla = np.asarray(render_frame(
        bm, make_framebuffer(cfg), origin, euler, env, jnp.int32(0), cfg))
    assert np.isfinite(f_pallas).all()
    assert (f_pallas.sum(-1) > 0).any()
    np.testing.assert_allclose(f_pallas, f_xla, atol=2e-6)


def test_edit_retrace_compiled(rng):
    """The interactive edit surface on hardware: O(edits) in-place voxel
    writes + incremental line-table refresh (`apply_edits_hbm`), then the
    edited world traced through the COMPILED Mosaic kernel and matched
    against the XLA traversal of the same edited world (the place/break +
    re-render loop of VoxelApp, main.cu:64-80 semantics)."""
    import jax
    import jax.numpy as jnp

    from voxelengine_tpu.ops.pallas_bigtrace import (
        apply_edits_hbm,
        make_line_table,
        trace_brickmap_hbm,
    )
    from voxelengine_tpu.ops.trace import trace_brickmap

    dense = _scene(rng)
    bm = build_brickmap(
        BitGrid.from_dense(dense), 8, coarse_layout=Layout.LINEAR
    )
    lt = make_line_table(bm)
    k = 40
    xs = rng.integers(0, 64, k)
    ys = rng.integers(0, 64, k)
    zs = rng.integers(0, 64, k)
    vals = rng.random(k) < 0.7
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731 (donation-safe)
    bm2, lt2 = apply_edits_hbm(copy(bm), copy(lt), xs, ys, zs, vals)
    o, d = _rays(rng, 1024, 64)
    ref = trace_brickmap(bm2, o, d, 2048)
    out = trace_brickmap_hbm(bm2, lt2, o, d, 2048, tile=1024,
                             interpret=False)
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
