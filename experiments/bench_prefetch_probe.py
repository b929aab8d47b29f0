"""Adjacent-line prefetch predictability probe (round-5 gated probe).

At 16k, DMA stalls are ~21% of lane-slots (vs 8.7% at 8k) — the one
unexplored lever after the round-3/4 dead-ideas tables.  Before building
a speculative adjacent-line prefetch (when fetching line L, also fetch
L+/-1 into a reserved slot), measure whether stalled misses are even
PREDICTABLE that way: the ``adjstall`` diagnostic counter
(`ops/pallas_bigtrace.py` ``return_phases``) counts stall iterations
whose wanted line id is +/-1 of a line currently resident in the VMEM
cache — the ceiling of what such a prefetch could absorb.

Modeled-win CEILING (optimistic, slot-fungible accounting like the
BASELINE.md roofline): treat every adjacent-predictable stall slot as
removed; win = total_slots / (total_slots - adjstall).  This overstates
the real win (absorbing a stall only shortens the tile if the stalled
lane is the tile's critical lane, and the prefetch itself costs a cache
slot + DMA bandwidth), so if even the ceiling is under the ~8% gate the
idea is dead with certainty.

Usage:  python experiments/bench_prefetch_probe.py [world]
        (world = full | huge, default huge; needs the world cache)
Env:    UM=1 re-enables macro spans (default off — the production
        probe's decision for these terrain scenes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _require_tpu  # noqa: E402

_require_tpu()
from voxelengine_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from voxelengine_tpu.config import RenderConfig  # noqa: E402
from voxelengine_tpu.io.checkpoint import (  # noqa: E402
    line_table_or_build,
    load_world_host_bricks,
)
from voxelengine_tpu.ops.pallas_bigtrace import (  # noqa: E402
    host_brick_lines,
    trace_brickmap_hbm,
)
from voxelengine_tpu.render.frame import primary_rays  # noqa: E402

USE_MACRO = os.environ.get("UM", "0") == "1"


def main():
    world = sys.argv[1] if len(sys.argv) > 1 else "huge"
    dims = {"full": (8192, 512, 8192), "huge": (16384, 512, 16384)}[world]
    key = f"terrain_{dims[0]}x{dims[1]}x{dims[2]}_f32_o32_v1"
    path = os.path.join(".world_cache", key + ".npz")

    t0 = time.perf_counter()
    bm, bricks_host = load_world_host_bricks(path)
    lt = line_table_or_build(".world_cache", key + "_lt1", bm)
    lt = dataclasses.replace(
        lt, brick_lines=jnp.asarray(host_brick_lines(bricks_host))
    )
    lt.brick_lines.block_until_ready()
    print(f"world+lines: {time.perf_counter()-t0:.1f}s", flush=True)

    cfg = RenderConfig(width=1920, height=1080, checkerboard=True,
                       tile_order=True)
    origin = jnp.asarray([dims[0] / 2, 380.0, dims[2] / 2], jnp.float32)
    euler = jnp.asarray([-0.25, 0.75, 0.0], jnp.float32)
    o, d, _, _, _ = primary_rays(cfg, origin, euler, jnp.int32(1))

    t0 = time.perf_counter()
    res, ph = trace_brickmap_hbm(
        bm, lt, o, d, 2048, tile=2048, num_slots=16,
        use_macro=USE_MACRO, return_phases=True,
    )
    tot = {k: int(np.asarray(v).astype(np.int64).sum()) for k, v in ph.items()}
    print(f"phases dispatch: {time.perf_counter()-t0:.1f}s  "
          f"(hits {int(np.asarray(res.hit).sum())}/{o.shape[0]})", flush=True)

    # iters is per-ray tile iterations; lane-slots = sum over rays
    slots = tot["iters"]
    stall, adj = tot["stall"], tot["adjstall"]
    print(f"lane-slots {slots/1e6:.1f}M  stall {stall/1e6:.1f}M "
          f"({stall/slots:.1%})  adjstall {adj/1e6:.1f}M "
          f"({adj/max(stall,1):.1%} of stalls)", flush=True)
    for k in ("mskip", "cadv", "pend", "desc", "fstep", "step2", "asc",
              "xrun"):
        print(f"  {k:6s} {tot[k]/1e6:8.1f}M  ({tot[k]/slots:6.2%})",
              flush=True)
    ceiling = slots / max(slots - adj, 1)
    print(f"modeled-win CEILING (slot-fungible, prefetch assumed free): "
          f"x{ceiling:.3f} ({(ceiling-1)*100:.1f}%)  — gate: 8%", flush=True)


if __name__ == "__main__":
    main()
