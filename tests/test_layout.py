"""Sample-index layout tests (C3: VolumeRaytracer.cuh:25-171)."""

import numpy as np

from voxelengine_tpu.core.layout import (
    Layout,
    position_from_sample_index,
    sample_index,
)


def _grid(W, H, D):
    return np.meshgrid(np.arange(W), np.arange(H), np.arange(D), indexing="ij")


def test_roundtrip_all_layouts():
    W, H, D = 16, 8, 24
    x, y, z = _grid(W, H, D)
    for lay in Layout:
        idx = np.asarray(sample_index(x, y, z, W, H, lay))
        assert idx.min() == 0 and idx.max() == W * H * D - 1
        assert len(np.unique(idx)) == W * H * D  # bijection
        xx, yy, zz = position_from_sample_index(idx, W, H, lay)
        assert (np.asarray(xx) == x).all()
        assert (np.asarray(yy) == y).all()
        assert (np.asarray(zz) == z).all()


def test_tiled_linear_matches_reference_formula():
    """Spot-check against the exact arithmetic of GetSampleIndex
    (VolumeRaytracer.cuh:111-131)."""
    W, H = 32, 16
    for (x, y, z) in [(0, 0, 0), (7, 7, 7), (8, 0, 0), (31, 15, 9), (13, 9, 22)]:
        tW, tH = W // 8, H // 8
        ref = (
            ((x // 8) + (y // 8) * tW + (z // 8) * tW * tH) * 512
            + (x % 8)
            + (y % 8) * 8
            + (z % 8) * 64
        )
        assert int(sample_index(x, y, z, W, H, Layout.TILED_LINEAR)) == ref


def test_morton_within_tile():
    # Morton bit interleave: (x,y,z)=(1,0,0)->1, (0,1,0)->2, (0,0,1)->4
    base = int(sample_index(0, 0, 0, 8, 8, Layout.TILED_MORTON))
    assert base == 0
    assert int(sample_index(1, 0, 0, 8, 8, Layout.TILED_MORTON)) == 1
    assert int(sample_index(0, 1, 0, 8, 8, Layout.TILED_MORTON)) == 2
    assert int(sample_index(0, 0, 1, 8, 8, Layout.TILED_MORTON)) == 4
    assert int(sample_index(7, 7, 7, 8, 8, Layout.TILED_MORTON)) == 511
