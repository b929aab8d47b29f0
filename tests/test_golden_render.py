"""Golden-render regression tests.

The reference's test strategy is visual (DEBUG_VIEW diagnostics, SURVEY §4);
here the traversal's intermediate quantities (hit mask, depth, normals,
steps) on fixed seeds are pinned as numeric goldens — checksums chosen to be
robust to FMA-level float noise (quantized depth) while catching any
behavioral change.
"""

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.config import DebugView, Environment, RenderConfig
from voxelengine_tpu.core.bitgrid import BitGrid
from voxelengine_tpu.core.brickmap import build_brickmap
from voxelengine_tpu.ops.trace import trace_brickmap
from voxelengine_tpu.render.frame import make_framebuffer, primary_rays, render_frame
from voxelengine_tpu.worldgen.terrain import generate_world


def _scene():
    grid = generate_world((64, 64, 64), octaves=4)
    return build_brickmap(grid, 8)


def test_golden_trace_buffers():
    bm = _scene()
    cfg = RenderConfig(width=64, height=48, checkerboard=False, crosshair=False)
    origin = jnp.asarray([32.0, 40.0, -20.0])
    euler = jnp.asarray([-0.35, 3.14159, 0.0])  # look back toward the grid
    o, d, px, py, pyr = primary_rays(cfg, origin, euler, jnp.int32(0))
    out = trace_brickmap(bm, o, d, 2048)

    hit = np.asarray(out.hit)
    depth = np.linalg.norm(np.asarray(out.position) - np.asarray(o), axis=-1)
    steps = np.asarray(out.steps)
    nrm = np.asarray(out.normal)

    # golden values (pinned from the verified oracle-parity implementation)
    assert int(hit.sum()) == 2374
    qd = np.round(depth[hit] * 8).astype(np.int64)  # 1/8-voxel quantization
    assert int(qd.sum()) == 621292
    assert int(steps.sum()) == 7409
    counts = [int((nrm[hit][:, a] != 0).sum()) for a in range(3)]
    assert counts == [70, 419, 1885]


def test_golden_shaded_frame_stats():
    bm = _scene()
    cfg = RenderConfig(width=64, height=48, checkerboard=False)
    env = Environment.default()
    fb = render_frame(
        bm, make_framebuffer(cfg), jnp.asarray([32.0, 40.0, -20.0]),
        jnp.asarray([-0.35, 3.14159, 0.0]), env, jnp.int32(0), cfg,
    )
    f = np.asarray(fb)
    # quantized mean per channel is stable across backends
    q = np.round(f.mean(axis=(0, 1)) * 1000).astype(int)
    assert list(q) == [355, 259, 381]
