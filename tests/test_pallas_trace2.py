"""Two-level brickmap MXU kernel tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.core.bitgrid import BitGrid
from voxelengine_tpu.core.brickmap import build_brickmap
from voxelengine_tpu.core.layout import Layout
from voxelengine_tpu.ops.pallas_trace2 import trace_brickmap_mxu
from voxelengine_tpu.ops.trace import trace_brickmap


def _scene(rng, coarse_layout=Layout.TILED_LINEAR, brick_layout=Layout.TILED_LINEAR):
    dense = rng.random((64, 64, 64)) < 0.008
    dense[:, :5, :] = rng.random((64, 5, 64)) < 0.5
    return build_brickmap(
        BitGrid.from_dense(dense), 8,
        coarse_layout=coarse_layout, brick_layout=brick_layout,
    )


def _rays(rng, n=2048):
    origins = (rng.random((n, 3)) * 120 - 30).astype(np.float32)
    t = (rng.random((n, 3)) * 64).astype(np.float32)
    d = t - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(d.astype(np.float32))


def test_bm_mxu_matches_xla_trace(rng):
    # both addressing sides sweep every C3 order, incl. TILED_MORTON
    for lay in (Layout.TILED_LINEAR, Layout.LINEAR, Layout.TILED_MORTON):
        bm = _scene(rng, coarse_layout=lay, brick_layout=lay)
        o, d = _rays(rng)
        a = trace_brickmap(bm, o, d)
        b = trace_brickmap_mxu(bm, o, d, interpret=True)
        assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
        assert np.array_equal(np.asarray(a.steps), np.asarray(b.steps))
        hits = np.asarray(a.hit)
        assert np.allclose(
            np.asarray(a.position)[hits], np.asarray(b.position)[hits], atol=1e-4
        )
        assert np.array_equal(np.asarray(a.normal)[hits], np.asarray(b.normal)[hits])


def test_bm_mxu_degenerate_start(rng):
    bm = _scene(rng)
    dense = np.asarray(bm.to_dense())
    z, y, x = np.nonzero(dense)
    o = jnp.asarray([[x[0] + 0.5, y[0] + 0.5, z[0] + 0.5]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    out = trace_brickmap_mxu(bm, o, d, interpret=True)
    assert bool(out.hit[0]) and int(out.steps[0]) == 0
    assert np.allclose(np.asarray(out.position[0]), np.asarray(o[0]), atol=1e-5)
