"""On-TPU compile + perf check for ops.pallas_bigtrace.

Usage: python experiments/bench_bigtrace.py [world] [n_rays] [octaves] [flags]
  world: tiny | small (512^3) | mid (1024x512x1024) | full (8k x 512 x 8k)
         | huge (16k x 512 x 16k; host-side brick->line relayout)
  flags: --tiled --verify --phases --iters --lockstep --sorted --rr
         --blocksort
  env:   SWEEP="tile,slots,inner,dpr ..."  SHORTLIST=K  UM=0 (macro off)
         WORLD_CACHE=1
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
from voxelengine_tpu.ops.pallas_bigtrace import make_line_table, trace_brickmap_hbm
from voxelengine_tpu.ops.trace import make_fused_table, trace_brickmap
from voxelengine_tpu.render.frame import primary_rays
from voxelengine_tpu.config import RenderConfig

WORLDS = {
    "tiny": (256, 64, 256),
    "small": (512, 512, 512),
    "mid": (1024, 512, 1024),
    "full": (8192, 512, 8192),
    # 2x the reference's demonstrated world (README.md:29-31 shows 8k):
    # exercises the raised L2/L3 macro budgets + unbounded region tables
    "huge": (16384, 512, 16384),
}


def lockstep_stats(steps, tile):
    """Per-tile max vs mean: the in-tile lockstep ceiling."""
    t = steps[: steps.size // tile * tile].reshape(-1, tile)
    print(f"  lockstep tile={tile}: mean {t.mean():.1f}  "
          f"avg-tile-max {t.max(axis=1).mean():.1f}  "
          f"waste-factor {t.max(axis=1).mean()/t.mean():.2f}", flush=True)


def main():
    world = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1920 * 1080 // 2
    octaves = int(sys.argv[3]) if len(sys.argv) > 3 else (4 if world in ("tiny", "small") else 32)
    dims = WORLDS[world]
    print(f"devices: {jax.devices()}  world {dims} octaves {octaves}", flush=True)

    import os as _os

    t0 = time.perf_counter()
    key = f"terrain_{dims[0]}x{dims[1]}x{dims[2]}_f32_o{octaves}_v1"
    bricks_host = None
    huge_world = world == "huge"
    if huge_world:
        # 16k-class: bricks + lines can't both fit on device — keep the
        # raw table host-side (see bench.py / host_brick_lines)
        from voxelengine_tpu.io.checkpoint import (
            load_world_host_bricks,
            save_world,
        )

        path = _os.path.join(".world_cache", key + ".npz")
        if not _os.path.exists(path):
            _os.makedirs(".world_cache", exist_ok=True)
            built = build_brickmap_terrain_compact(dims, 32, octaves=octaves)
            built.meta.block_until_ready()
            print(f"one-time build: {time.perf_counter()-t0:.1f}s", flush=True)
            save_world(path, built)
            del built
        bm, bricks_host = load_world_host_bricks(path)
    elif _os.environ.get("WORLD_CACHE", "0") == "1":
        from voxelengine_tpu.io.checkpoint import generate_or_load

        bm = generate_or_load(
            ".world_cache", key,
            lambda: build_brickmap_terrain_compact(dims, 32, octaves=octaves),
        )
    else:
        bm = build_brickmap_terrain_compact(dims, 32, octaves=octaves)
    bm.meta.block_until_ready()
    print(f"build: {time.perf_counter()-t0:.1f}s  bricks "
          f"{bricks_host.shape if bricks_host is not None else bm.bricks.shape}"
          f" ({(bricks_host if bricks_host is not None else bm.bricks).nbytes/1e6:.0f} MB)",
          flush=True)
    t0 = time.perf_counter()
    from voxelengine_tpu.io.checkpoint import line_table_or_build

    lt = line_table_or_build(".world_cache", key + "_lt1", bm)
    lt.region_lines.block_until_ready()
    print(f"line table: {time.perf_counter()-t0:.1f}s  side tables {lt.region_lines.nbytes/1e6:.1f} MB  regions {lt.num_regions}", flush=True)

    t0 = time.perf_counter()
    if bricks_host is not None:
        import dataclasses as _dc

        from voxelengine_tpu.ops.pallas_bigtrace import host_brick_lines

        lt = _dc.replace(
            lt, brick_lines=jnp.asarray(host_brick_lines(bricks_host))
        )
    else:
        from voxelengine_tpu.ops.pallas_bigtrace import materialize_brick_lines

        lt = materialize_brick_lines(bm, lt)
    lt.brick_lines.block_until_ready()
    print(f"brick lines: {time.perf_counter()-t0:.1f}s ({lt.brick_lines.nbytes/1e9:.2f} GB)", flush=True)

    # camera rays: half-field 1080p-equivalent, from a hill looking across
    cfg = RenderConfig(width=1920, height=1080 // 2, checkerboard=False,
                       tile_order="--tiled" in sys.argv)
    origin = jnp.asarray([dims[0] / 2, min(380.0, dims[1] * 0.75), dims[2] / 2], jnp.float32)
    euler = jnp.asarray([-0.25, 0.75, 0.0], jnp.float32)
    o, d, _, _, _ = primary_rays(cfg, origin, euler, jnp.int32(0))
    o, d = o[:n_rays], d[:n_rays]

    from voxelengine_tpu.ops.pallas_bigtrace import trace_brickmap_hbm_staged

    if "--blocksort" in sys.argv:
        # temporal block-difficulty pairing: reorder pixel blocks by a probe
        # trace's per-block max steps (what bench.py does across frames)
        from voxelengine_tpu.render.frame import (
            block_geometry,
            block_permutation_from_steps,
        )

        probe = trace_brickmap_hbm(bm, lt, o, d, 2048, tile=2048, num_slots=8)
        bw, bh, nb = block_geometry(cfg)
        perm = np.asarray(block_permutation_from_steps(probe.steps, cfg))
        o = jnp.asarray(np.asarray(o).reshape(nb, bw * bh, 3)[perm].reshape(-1, 3))
        d = jnp.asarray(np.asarray(d).reshape(nb, bw * bh, 3)[perm].reshape(-1, 3))
        print(f"blocksort: {nb} blocks of {bw}x{bh}", flush=True)

    import os
    sweep = os.environ.get("SWEEP", "1024,16,8,4")
    sl = int(os.environ.get("SHORTLIST", "2"))
    um = os.environ.get("UM", "1") == "1"  # use_macro (UM=0: macro-off basin)
    for part in sweep.split():
        vals = [int(v) for v in part.split(",")]
        tile, ns, istp, dpr = vals[:4]
        kw = dict(tile=tile, num_slots=ns, inner_steps=istp, dma_per_round=dpr,
                  shortlist=sl, use_macro=um)
        if "--rr" in sys.argv:
            from voxelengine_tpu.ops.pallas_bigtrace import trace_brickmap_hbm_rr

            fn = lambda: trace_brickmap_hbm_rr(
                bm, lt, o, d, 2048, rows_inflight=tile // 128,
                num_slots=ns, inner_steps=istp, dma_per_round=dpr,
                shortlist=sl,
            )
        elif len(vals) >= 6 and vals[4] > 0:  # tile,ns,istp,dpr,stage,frac
            fn = lambda: trace_brickmap_hbm_staged(
                bm, lt, o, d, 2048, stage_steps=vals[4], tail_frac=vals[5], **kw
            )
        else:
            fn = lambda: trace_brickmap_hbm(bm, lt, o, d, 2048, **kw)
        t0 = time.perf_counter()
        out = fn()
        out.hit.block_until_ready()
        t_first = time.perf_counter() - t0
        # byte-identical repeated dispatches short-circuit in this
        # environment (NOTES_ROUND3.md): jitter origins per rep and end
        # with a value readback
        reps = 3
        o_base = o
        jit_os = [o + jnp.float32(1e-4) * (k + 1) for k in range(reps)]
        for jo in jit_os:
            jo.block_until_ready()
        t0 = time.perf_counter()
        for k in range(reps):
            o = jit_os[k]
            out = fn()
        _ = float(jnp.sum(out.steps))
        dt = (time.perf_counter() - t0) / reps
        o = o_base
        hit = np.asarray(out.hit)
        steps = np.asarray(out.steps)
        print(f"bigtrace[{part}]: {dt*1000:.1f} ms for {n_rays} rays -> "
              f"{n_rays/dt/1e6:.2f} Mrays/s  hit-rate {hit.mean():.3f}  "
              f"steps mean {steps.mean():.1f} p99 {np.percentile(steps, 99):.0f}"
              f"  (compile {t_first:.1f}s)",
              flush=True)
        if "--lockstep" in sys.argv:
            for t in (1024, 2048, 4096):
                lockstep_stats(steps, t)
        if "--iters" in sys.argv and len(vals) < 6:
            _, iters = trace_brickmap_hbm(bm, lt, o, d, 2048, return_iters=True, **kw)
            it = np.asarray(iters)[::tile]  # one per kernel tile
            print(f"  tile iterations: mean {it.mean():.0f} p50 {np.percentile(it,50):.0f} "
                  f"p99 {np.percentile(it,99):.0f} max {it.max()}  "
                  f"sum {it.sum()} (steps-sum {steps.sum()})", flush=True)
        if "--phases" in sys.argv and len(vals) < 6:
            # where do tile iterations go?  diag build: per-ray phase
            # counters (results verified identical to the production build)
            _, ph = trace_brickmap_hbm(
                bm, lt, o, d, 2048, return_phases=True, **kw
            )
            ph = {k: np.asarray(v) for k, v in ph.items()}
            it = ph["iters"][::tile].astype(np.int64)
            rows = it.size
            tot_slots = int(it.sum()) * tile  # lane-iterations available
            active = sum(
                int(ph[k].sum())
                for k in ("stall", "mskip", "cadv", "pend", "desc",
                          "fstep", "asc")
            )
            print(f"  phase mix (lane-iterations, {rows} tiles, "
                  f"{tot_slots/1e6:.1f}M lane-slots):", flush=True)
            for k in ("stall", "mskip", "cadv", "pend", "desc", "fstep",
                      "step2", "asc", "xrun"):
                s = int(ph[k].sum())
                print(f"    {k:6s} {s/1e6:9.2f}M  {100*s/tot_slots:5.1f}% of slots",
                      flush=True)
            print(f"    active {active/1e6:9.2f}M  {100*active/tot_slots:5.1f}%"
                  f"  (idle-after-done {100*(1-active/tot_slots):.1f}%)",
                  flush=True)
            dbl = ph["step2"].sum() / max(ph["fstep"].sum(), 1)
            print(f"    double-step rate {100*dbl:.1f}% of fine steps", flush=True)
        if "--sorted" in sys.argv:
            # ideal temporal-sort: reorder rays by this trace's own step
            # counts (a real renderer would use last frame's buffer) and
            # re-measure -- isolates the lockstep-vs-coherence tradeoff
            perm = np.argsort(steps, kind="stable")
            o2 = jnp.asarray(np.asarray(o)[perm])
            d2 = jnp.asarray(np.asarray(d)[perm])
            out2 = trace_brickmap_hbm(bm, lt, o2, d2, 2048, **kw)
            out2.hit.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(reps):
                out2 = trace_brickmap_hbm(bm, lt, o2, d2, 2048, **kw)
            out2.hit.block_until_ready()
            dts = (time.perf_counter() - t0) / reps
            s2 = np.asarray(out2.steps)
            print(f"  sorted: {dts*1000:.1f} ms -> {n_rays/dts/1e6:.2f} Mrays/s", flush=True)
            for t in (1024, 2048):
                lockstep_stats(s2, t)

    if "--verify" in sys.argv:
        if bricks_host is not None:
            # swap tables: free the lines, upload the real bricks
            lt = None
            import dataclasses as _dc
            import gc
            gc.collect()
            bm = _dc.replace(bm, bricks=jnp.asarray(bricks_host))
            fused = None  # full fused table would double memory at 16k
        else:
            fused = make_fused_table(bm)
        t0 = time.perf_counter()
        ref = trace_brickmap(bm, o, d, 2048, fused=fused)
        ref.hit.block_until_ready()
        print(f"xla ref: {time.perf_counter()-t0:.1f}s", flush=True)
        dh = int((np.asarray(ref.hit) != hit).sum())
        ds = int((np.asarray(ref.steps) != steps).sum())
        m = np.asarray(ref.hit) & hit
        dp = float(np.abs(np.asarray(ref.position)[m] - np.asarray(out.position)[m]).max()) if m.any() else 0.0
        print(f"verify vs XLA: hit diffs {dh}/{n_rays}  step diffs {ds}  "
              f"pos maxdiff {dp}", flush=True)


if __name__ == "__main__":
    main()


