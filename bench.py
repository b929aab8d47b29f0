#!/usr/bin/env python
"""Benchmark harness — the driver's headline metric.

Measures primary-ray throughput (Mrays/s) and frame time rendering the
BASELINE.json config-4 scene: procedurally generated 8192 x 512 x 8192
brickmap world (factor 32, the reference's own terrain rule bit-for-bit),
1080p shaded render with checkerboarding, on one TPU chip.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
where vs_baseline is relative to the 1 Gray/s north-star target
(BASELINE.json).  Diagnostics go to stderr.

Env knobs:
  BENCH_WORLD=small   use a 1024^3 world (quick sanity runs)
  BENCH_FRAMES=N      timed frames (default 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from voxelengine_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from voxelengine_tpu.config import Environment, RenderConfig
    from voxelengine_tpu.core.brickmap import build_brickmap_terrain
    from voxelengine_tpu.ops.trace import make_fused_table
    from voxelengine_tpu.render.frame import make_framebuffer, render_frame
    from voxelengine_tpu.ops.trace import trace_brickmap
    from voxelengine_tpu.render.frame import primary_rays

    log(f"devices: {jax.devices()}")
    small = os.environ.get("BENCH_WORLD", "full") == "small"
    dims = (1024, 1024, 1024) if small else (8192, 512, 8192)
    frames = int(os.environ.get("BENCH_FRAMES", "4"))

    t0 = time.perf_counter()
    bm = build_brickmap_terrain(dims, 32)
    bm.meta.block_until_ready()
    log(f"world {dims} build: {time.perf_counter()-t0:.1f}s; "
        f"bricks {bm.bricks.shape} ({bm.bricks.nbytes/1e9:.2f} GB)")
    fused = make_fused_table(bm)

    sched = os.environ.get(
        "BENCH_SCHEDULE",
        "40,1 48,2 48,4 48,8 48,16 4104,32",  # survivor-matched halving
    )
    schedule = (
        tuple(tuple(int(v) for v in part.split(",")) for part in sched.split())
        if sched else None
    )
    cfg = RenderConfig(
        width=1920, height=1080, checkerboard=True,
        stage_iters=int(os.environ.get("BENCH_STAGE_ITERS", "128")),
        tail_frac=int(os.environ.get("BENCH_TAIL_FRAC", "8")),
        stage_schedule=schedule,
    )
    env = Environment.default()
    # camera on a terrain hill looking across the valley
    origin = jnp.asarray([dims[0] / 2, 380.0, dims[2] / 2], jnp.float32)
    euler = jnp.asarray([-0.25, 0.75, 0.0], jnp.float32)
    rays_per_frame = cfg.width * cfg.height // 2  # checkerboard half-field

    fb = make_framebuffer(cfg)
    t0 = time.perf_counter()
    fb = render_frame(bm, fb, origin, euler, env, jnp.int32(0), cfg, fused)
    fb.block_until_ready()
    log(f"first frame (compile+run): {time.perf_counter()-t0:.1f}s")

    # chained frame loop: frame k+1 consumes frame k's framebuffer, so all
    # frames must execute; a single final block avoids counting the
    # host<->device round-trip latency per frame (sustained throughput,
    # like a real render loop)
    t0 = time.perf_counter()
    for i in range(1, frames + 1):
        fb = render_frame(bm, fb, origin, euler, env, jnp.int32(i), cfg, fused)
    fb.block_until_ready()
    frame_ms = (time.perf_counter() - t0) * 1000.0 / frames
    mrays = rays_per_frame / frame_ms / 1000.0

    # diagnostics + honesty check: the staged/compacted traversal must
    # reproduce the plain full-budget traversal (stage buffers sized beyond
    # the survivor percentiles; truncation would show up here)
    from voxelengine_tpu.ops.trace import trace_brickmap_staged

    o, d, px, py, pyr = primary_rays(cfg, origin, euler, jnp.int32(1))
    out = trace_brickmap(bm, o, d, cfg.max_steps, fused=fused)
    stg = trace_brickmap_staged(
        bm, o, d, cfg.max_steps,
        stage_iters=cfg.stage_iters, tail_frac=cfg.tail_frac, fused=fused,
        schedule=cfg.stage_schedule,
    )
    diffs = int((np.asarray(out.hit) != np.asarray(stg.hit)).sum())
    steps = np.asarray(out.steps)
    log(f"frame: {frame_ms:.1f} ms  ({1000/frame_ms:.2f} FPS)  "
        f"hit-rate {np.asarray(out.hit).mean():.3f}  "
        f"staged-vs-plain hit diffs {diffs}/{steps.size}  "
        f"steps mean {steps.mean():.1f} p99 {np.percentile(steps,99):.0f}")

    metric = "primary_mrays_per_s_1080p_checkerboard_" + ("1k" if small else "8k") + "_world"
    print(json.dumps({
        "metric": metric,
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 1000.0, 6),
    }))


if __name__ == "__main__":
    main()
