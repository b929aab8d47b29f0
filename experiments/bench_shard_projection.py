"""Measured projection of the N-chip sharded 1080p frame on ONE real chip.

BASELINE.md's roofline concludes the <=16 ms @1080p frame target needs
~8 v5e chips through the zero-communication sharded render
(`parallel/sharded.py:render_frame_sharded`: replicated world, each
device traces its own pixel shard; no mid-frame ICI traffic).  Only one
real chip exists in this environment, but precisely BECAUSE the design
has zero mid-frame communication, the N-chip frame time is

    frame_N  =  max_i(trace time of shard i)  +  shade/composite_N

and every term is measurable on the single chip: run each shard's
ACTUAL ray set through the flagship kernel with the bench methodology
(K traces chained inside one jitted lax.scan, per-step jittered
origins, carried steps-sum checksum — `bench_dense.py` pattern) and
take the max over shards.  What this projection cannot see: ICI cost of
the one-time world replication (off the frame path) and cross-chip HBM
contention (none — each chip owns its HBM).

Two shard layouts:
  contig  — device i owns a contiguous run of pixel-block rows
            (what `render_frame_sharded`'s row sharding does);
  cyclic  — pixel blocks dealt round-robin (block j -> device j % N):
            balances terrain-vs-sky difficulty across devices at intact
            intra-block cache adjacency.  The framebuffer lives in a
            block-cyclic device layout; reassembly to a raster image is
            host-side at present time (`parallel/sharded.py:
            render_frame_cyclic` + `cyclic_to_image` implement this).

(A third layout — column strips, which span the full sky-to-terrain
range and need no halo at all since the checkerboard remap is purely
vertical — was considered and dropped: the 1080p block grid is 60
columns, so N=8 strips carry a built-in 8:7 block-count imbalance
(1.07) with no measured upside over cyclic's 1.05, and it only works
for N dividing the column count.)

Measured 2026-08-19 (BASELINE.md "Measured N-chip frame projection"):
8-chip block-cyclic projects to 14.18 ms/frame @1080p (73.1 Mrays/s,
scaling 4.10x) vs 17.95 ms contiguous (imbalance 1.55) — under the
<=16 ms target.

Usage:  python experiments/bench_shard_projection.py [K] [M]
        (K = scan-chained traces per measurement, default 6;
         M = independent dispatches per shard, min reported, default 2)
Env:    NS="1 2 4 8"  shard counts;  UM=1 re-enables macro spans
        (default off — the bench probe's decision for this scene).
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

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voxelengine_tpu.config import RenderConfig  # noqa: E402
from voxelengine_tpu.core.brickmap import (  # noqa: E402
    build_brickmap_terrain_compact,
)
from voxelengine_tpu.io.checkpoint import (  # noqa: E402
    generate_or_load,
    line_table_or_build,
)
from voxelengine_tpu.ops.pallas_bigtrace import (  # noqa: E402
    materialize_brick_lines,
    trace_brickmap_hbm,
)
from voxelengine_tpu.render.frame import block_geometry, primary_rays  # noqa: E402

DIMS = (8192, 512, 8192)
USE_MACRO = os.environ.get("UM", "0") == "1"
# measured non-trace device cost of the FULL 1080p frame (BASELINE.md
# 8k-frame-breakdown row); shading/composite are elementwise per pixel,
# so an N-way pixel shard pays 1/N of it
SHADE_COMPOSITE_MS_FULL = 1.46


@functools.partial(jax.jit, static_argnames=("K",))
def sustained(bm, lt, o0, d0, jbase, K):
    """K chained traces of one shard; carried checksum forces every step.

    bm/lt are ARGUMENTS (closing over them embeds multi-GB HLO constants
    the tunnel's compile endpoint rejects — NOTES_ROUND4.md)."""

    def step(acc, k):
        r = trace_brickmap_hbm(
            bm, lt, o0 + jnp.float32(1e-4) * (k + jbase), d0, 2048,
            tile=2048, num_slots=16, use_macro=USE_MACRO,
        )
        return acc + jnp.sum(r.steps.astype(jnp.float32)), None

    acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(K, dtype=jnp.float32))
    return acc


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ns = [int(x) for x in os.environ.get("NS", "1 2 4 8").split()]
    print(f"devices: {jax.devices()}  K={K} M={M} use_macro={USE_MACRO}",
          flush=True)

    t0 = time.perf_counter()
    key = f"terrain_{DIMS[0]}x{DIMS[1]}x{DIMS[2]}_f32_o32_v1"
    bm = generate_or_load(".world_cache", key,
                          lambda: build_brickmap_terrain_compact(DIMS, 32))
    bm.meta.block_until_ready()
    lt = line_table_or_build(".world_cache", key + "_lt1", bm)
    lt = materialize_brick_lines(bm, lt)
    lt.brick_lines.block_until_ready()
    print(f"world+lines: {time.perf_counter()-t0:.1f}s", flush=True)

    # the bench camera/scene, rays in the frame path's tile order
    cfg = RenderConfig(width=1920, height=1080, checkerboard=True,
                       tile_order=True)
    origin = jnp.asarray([DIMS[0] / 2, 380.0, DIMS[2] / 2], jnp.float32)
    euler = jnp.asarray([-0.25, 0.75, 0.0], jnp.float32)
    o, d, _, _, _ = primary_rays(cfg, origin, euler, jnp.int32(1))
    bw, bh, nb = block_geometry(cfg)
    bs = bw * bh
    n = o.shape[0]
    assert n == nb * bs
    ob = np.asarray(o).reshape(nb, bs, 3)
    db = np.asarray(d).reshape(nb, bs, 3)
    print(f"rays: {n} in {nb} blocks of {bw}x{bh}", flush=True)

    results = {}
    for N in ns:
        assert nb % N == 0
        for mode in (("contig", "cyclic") if N > 1 else ("contig",)):
            shard_ms = []
            for i in range(N):
                sel = (slice(i * (nb // N), (i + 1) * (nb // N))
                       if mode == "contig" else slice(i, None, N))
                so = jnp.asarray(ob[sel].reshape(-1, 3))
                sd = jnp.asarray(db[sel].reshape(-1, 3))
                so.block_until_ready()
                # warmup (compile per shard SHAPE; cached across shards/modes)
                sustained(bm, lt, so, sd, jnp.float32(-1.0), K).block_until_ready()
                best = None
                for m in range(M):
                    t0 = time.perf_counter()
                    acc = float(sustained(bm, lt, so, sd,
                                          jnp.float32(m * K), K))
                    dt = (time.perf_counter() - t0) * 1000 / K
                    best = dt if best is None else min(best, dt)
                shard_ms.append(best)
                print(f"  N={N} {mode} shard {i}: {best:.2f} ms "
                      f"({so.shape[0]} rays, checksum {acc:.3e})", flush=True)
            mx, sm = max(shard_ms), sum(shard_ms)
            proj = mx + SHADE_COMPOSITE_MS_FULL / N
            results[(N, mode)] = (shard_ms, mx, sm, proj)
            print(f"N={N:2d} {mode}: max-shard {mx:.2f} ms  sum {sm:.2f} ms  "
                  f"imbalance {mx * N / sm:.2f}  projected frame "
                  f"{proj:.2f} ms -> {n / proj / 1000:.1f} Mrays/s",
                  flush=True)

    print("\nsummary (projected N-chip frame, trace max-shard + shade/N):",
          flush=True)
    for (N, mode), (_, mx, sm, proj) in sorted(results.items()):
        base = results[(1, "contig")][3]
        print(f"  N={N:2d} {mode:6s}: {proj:6.2f} ms  "
              f"{n / proj / 1000:7.1f} Mrays/s  scaling x{base / proj:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
