"""Ceiling estimate for kernel-state continuation (NOTES_ROUND4.md item 4).

Question: if trace_brickmap_hbm stopped at a tile-iteration budget B,
spilled per-ray DDA state, and relaunched with the unfinished rays
compacted (STABLE order -- screen adjacency preserved, the line cache's
lifeline per NOTES_ROUND3's 4.6x-slower full-sort measurement), how many
total tile-iterations would the frame take vs today's run-to-slowest-ray?

Model: per-ray iteration need n_i = s_i * T_j / max_s(j) for ray i in
tile j (attributes each tile's measured iteration count, DMA stalls
included, proportionally to its rays' step counts -- exact for the tile
max, optimistic for rays whose stalls don't scale with steps).  Pass
cost = sum_j min(T_j, B); survivors keep (n_i - B), are packed 2048/tile
in stable order, and the next pass runs at max-per-tile.  A fixed
per-pass overhead (spill + compact + relaunch) is charged in iteration
units at ~1.38 us/iter.

Usage: python experiments/sim_continuation.py [world]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from voxelengine_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from voxelengine_tpu.core.brickmap import build_brickmap_terrain_compact
from voxelengine_tpu.io.checkpoint import generate_or_load
from voxelengine_tpu.ops.pallas_bigtrace import make_line_table, trace_brickmap_hbm
from voxelengine_tpu.render.frame import primary_rays
from voxelengine_tpu.config import RenderConfig

WORLDS = {
    "mid": ((1024, 512, 1024), 8),
    "full": ((8192, 512, 8192), 32),
}

US_PER_ITER = 1.38  # measured (NOTES_ROUND4.md)
PASS_OVERHEAD_US = 3000.0  # spill readback + flatnonzero/gather + relaunch


def main():
    world = sys.argv[1] if len(sys.argv) > 1 else "full"
    dims, octaves = WORLDS[world]
    tile = 2048
    assert jax.default_backend() != "cpu", "needs the real chip"
    print(f"devices: {jax.devices()}  world {dims}", flush=True)

    key = f"terrain_{dims[0]}x{dims[1]}x{dims[2]}_f32_o{octaves}_v1"
    bm = generate_or_load(
        ".world_cache", key,
        lambda: build_brickmap_terrain_compact(dims, 32, octaves=octaves),
    )
    t0 = time.perf_counter()
    lt = make_line_table(bm)
    lt.region_lines.block_until_ready()
    print(f"line table: {time.perf_counter()-t0:.1f}s", flush=True)

    cfg = RenderConfig(width=1920, height=540, checkerboard=False, tile_order=True)
    origin = jnp.asarray([dims[0] / 2, min(380.0, dims[1] * 0.75), dims[2] / 2], jnp.float32)
    euler = jnp.asarray([-0.25, 0.75, 0.0], jnp.float32)
    o, d, _, _, _ = primary_rays(cfg, origin, euler, jnp.int32(0))
    n = o.shape[0]

    out, iters = trace_brickmap_hbm(
        bm, lt, o, d, 2048, tile=tile, num_slots=16, return_iters=True
    )
    steps = np.asarray(out.steps).astype(np.int64)
    T = np.asarray(iters)[::tile].astype(np.int64)  # per-tile iterations
    ntiles = T.size
    s = np.zeros(ntiles * tile, np.int64)
    s[: steps.size] = steps
    s = s.reshape(ntiles, tile)
    smax = np.maximum(s.max(axis=1), 1)
    # per-ray iteration need, scaled so tile max reproduces measured T
    nray = np.ceil(s * (T[:, None] / smax[:, None])).astype(np.int64)

    total_now = int(T.sum())
    perfect = int(np.ceil(nray.sum() / tile))
    print(f"tiles {ntiles}  iters now {total_now}  'perfect' {perfect}  "
          f"waste {total_now/perfect:.2f}x  "
          f"frame-est now {total_now*US_PER_ITER/1e3:.1f} ms", flush=True)

    flat = nray.reshape(-1)
    for B in (48, 64, 96, 128, 192, 256, 384):
        rem = flat.copy()
        cost = 0
        npass = 0
        detail = []
        while rem.size:
            npass += 1
            ntl = (rem.size + tile - 1) // tile
            pad = np.zeros(ntl * tile, np.int64)
            pad[: rem.size] = rem
            tl = pad.reshape(ntl, tile)
            tmax = tl.max(axis=1)
            budget = B if npass < 8 else 10**9  # final pass runs open
            cost += int(np.minimum(tmax, budget).sum())
            detail.append(f"p{npass}:{ntl}t")
            surv = pad > budget
            rem = (pad[surv] - budget)  # stable order preserved
        ms = (cost * US_PER_ITER + (npass - 1) * PASS_OVERHEAD_US) / 1e3
        print(f"  B={B:4d}: iters {cost}  ({total_now/cost:.2f}x fewer)  "
              f"passes {npass} [{' '.join(detail)}]  frame-est {ms:.1f} ms  "
              f"speedup-est {total_now*US_PER_ITER/1e3/ms:.2f}x", flush=True)


if __name__ == "__main__":
    main()
