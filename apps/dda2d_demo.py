#!/usr/bin/env python
"""2D DDA prototype / visual debugger.

Equivalent of the reference's ``DDATestCpp`` app: a 2D world, a fan of
radial rays traced through the two-level 2D brickmap (1M rays/frame at the
reference's scale, ``DDATestCpp.cpp:21,443-452``), with an SDL-style
visualization — here rendered to a PPM: chunks (gray), tight bounds
(purple), rays (blue), hit normals (green), hit points (red) — and the
average step count metric printed per frame (``DDATestCpp.cpp:618-625``).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from voxelengine_tpu.core.brickmap import unpack_meta
from voxelengine_tpu.ops.dda2d import brickmap2d_from_dense, radial_rays, trace_brickmap_2d
from voxelengine_tpu.ops.noise import perlin_noise
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", type=int, default=512)
    ap.add_argument("--factor", type=int, default=8)  # DDATestCpp.cpp:324
    ap.add_argument("--rays", type=int, default=1000000)  # DDATestCpp.cpp:21
    ap.add_argument("--out", default="frames/dda2d.ppm")
    args = ap.parse_args()

    W = args.world
    # procedural 2D world (the reference loads voxel_buffer.txt; we generate)
    ys, xs = np.mgrid[0:W, 0:W]
    pos = jnp.stack([jnp.asarray(xs * 0.02), jnp.asarray(ys * 0.02), jnp.zeros_like(jnp.asarray(xs, jnp.float32))], -1)
    dense = np.asarray(perlin_noise(pos, 1.0, 7)) > 0.25
    dense[W // 2 - 20 : W // 2 + 20, W // 2 - 20 : W // 2 + 20] = False  # clear center

    bm = brickmap2d_from_dense(dense, args.factor)
    center = (W / 2.0, W / 2.0)
    origins, rays = radial_rays(center, args.rays)

    t0 = time.perf_counter()
    out = trace_brickmap_2d(bm, origins, rays)
    hits = np.asarray(out.hit)
    ms = (time.perf_counter() - t0) * 1000
    steps = np.asarray(out.steps)
    print(f"{args.rays} rays in {ms:.1f} ms ({args.rays/ms/1000:.2f} Mrays/s)")
    print(f"average steps: {steps.mean():.2f}")  # DDATestCpp.cpp:618-625

    # visualization
    img = np.zeros((W, W, 3), np.uint8)
    img[dense] = (90, 90, 90)
    occ, bmin, bmax = (np.asarray(v) for v in unpack_meta(bm.meta))
    gx, gy, _ = bm.grid_dims
    f = bm.factor
    for ci in range(occ.shape[0]):
        if not occ[ci]:
            continue
        cx, cy = ci % gx, (ci // gx) % gy
        x0, y0 = cx * f + bmin[ci][0], cy * f + bmin[ci][1]
        x1, y1 = cx * f + bmax[ci][0], cy * f + bmax[ci][1]
        img[y0 : y1 + 1, [x0, x1]] = (160, 60, 160)
        img[[y0, y1], x0 : x1 + 1] = (160, 60, 160)
    # ray segments (blue polylines origin->hit/border, DDATestCpp.cpp:563-578):
    # rasterize a subsample by parametric sampling — vectorized over all
    # drawn rays x sample points, no per-ray Python loop
    draw = np.linspace(0, args.rays - 1, min(args.rays, 256)).astype(int)
    seg_o = np.asarray(origins)[draw]
    seg_d = np.asarray(rays)[draw]
    seg_hit = np.asarray(out.hit)[draw]
    seg_end = np.asarray(out.position)[draw]
    # unhit rays draw to the world border: first positive t leaving [0,W]^2
    with np.errstate(divide="ignore", invalid="ignore"):
        tb = np.stack([
            (np.where(seg_d[:, 0] > 0, W, 0.0) - seg_o[:, 0]) / seg_d[:, 0],
            (np.where(seg_d[:, 1] > 0, W, 0.0) - seg_o[:, 1]) / seg_d[:, 1],
        ], -1)
    t_end = np.where(
        seg_hit,
        np.linalg.norm(seg_end[:, :2] - seg_o[:, :2], axis=-1),
        np.nanmin(np.where(tb > 0, tb, np.nan), axis=-1),
    )
    # axis-parallel rays can leave +/-inf in tb; clamp everything to the
    # frame diagonal so the int cast below stays defined
    t_end = np.clip(np.nan_to_num(t_end, nan=float(W), posinf=float(W),
                                  neginf=0.0), 0.0, 2.0 * W)
    smp = np.linspace(0.0, 1.0, 2 * W)[None, :, None]
    line = seg_o[:, None, :2] + seg_d[:, None, :2] * (t_end[:, None, None] * smp)
    lx = np.clip(line[..., 0].astype(int), 0, W - 1).ravel()
    ly = np.clip(line[..., 1].astype(int), 0, W - 1).ravel()
    img[ly, lx] = (70, 110, 255)
    pts = np.asarray(out.position)[hits]
    px = np.clip(pts[:, 0].astype(int), 0, W - 1)
    py = np.clip(pts[:, 1].astype(int), 0, W - 1)
    img[py, px] = (255, 60, 60)
    nrm = -np.asarray(out.normal)[hits]
    ex = np.clip((pts[:, 0] + nrm[:, 0] * 3).astype(int), 0, W - 1)
    ey = np.clip((pts[:, 1] + nrm[:, 1] * 3).astype(int), 0, W - 1)
    img[ey, ex] = (60, 220, 60)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as fobj:
        fobj.write(f"P6\n{W} {W}\n255\n".encode() + img.tobytes())
    print(f"wrote {args.out}; hit rate {hits.mean():.3f}")


if __name__ == "__main__":
    main()
