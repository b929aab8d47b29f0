"""2D traversal tests (C18: DDATestCpp.cpp) via the planar embedding."""

import numpy as np

from voxelengine_tpu.ops.dda2d import (
    brickmap2d_from_dense,
    grid2d_from_dense,
    radial_rays,
    trace_brickmap_2d,
    trace_grid_2d,
)


def _world(rng, n=64):
    dense = rng.random((n, n)) < 0.05
    dense[n // 2 - 6 : n // 2 + 6, n // 2 - 6 : n // 2 + 6] = False
    # solid border so radial rays always terminate
    dense[0, :] = dense[-1, :] = True
    dense[:, 0] = dense[:, -1] = True
    return dense


def test_radial_rays_shape():
    o, r = radial_rays((5, 5), 16)
    assert o.shape == (16, 2) and r.shape == (16, 2)
    assert np.allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-5)


def test_2d_two_level_matches_single_level(rng):
    dense = _world(rng)
    g = grid2d_from_dense(dense)
    bm = brickmap2d_from_dense(dense, 8)
    o, r = radial_rays((32.0, 32.0), 256)
    a = trace_grid_2d(g, o, r)
    b = trace_brickmap_2d(bm, o, r)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hits = np.asarray(a.hit)
    assert hits.all()  # border guarantees termination
    # rays passing *exactly* through lattice corners (e.g. the 45-degree
    # diagonals of a radial fan) are degenerate: the single-level DDA and the
    # per-chunk-restarted fine DDA may legally walk different staircases
    # (the CUDA reference has the same property).  Allow a few such rays.
    diff = np.abs(np.asarray(a.position)[:, :2] - np.asarray(b.position)[:, :2]).max(axis=1)
    assert (diff[hits] > 2e-3).sum() <= 4, diff[hits].max()
    # z never stepped
    assert (np.asarray(a.position)[:, 2] == 0.5).all()


def test_2d_hits_against_bruteforce(rng):
    dense = _world(rng)
    g = grid2d_from_dense(dense)
    o, r = radial_rays((32.0, 32.0), 64)
    out = trace_grid_2d(g, o, r)
    pos = np.asarray(out.position)
    mismatches = 0
    for i in range(64):
        # brute force: march tiny steps until a solid cell
        p = o[i].astype(np.float64).copy()
        for _ in range(200000):
            cx, cy = int(p[0]), int(p[1])
            if 0 <= cx < 64 and 0 <= cy < 64 and dense[cy, cx]:
                break
            p += r[i] * 0.002
        # hit cell from the traversal position (nudge inward along ray)
        hp = pos[i][:2] + r[i] * 1e-4
        if not (int(hp[0]) == cx and int(hp[1]) == cy):
            mismatches += 1  # corner-degenerate diagonals (see above)
    assert mismatches <= 5, mismatches
