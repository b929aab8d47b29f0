"""Measured breakdown of the flagship 8k frame: trace / raygen / shade+composite.

VERDICT r3 item 3: the full 8k frame runs ~58 ms while the mid-world
kernel-only number is 47.3 ms — but those are different worlds, so the
non-trace overhead has never been isolated ON the bench scene.  This
harness times three nested pipelines on the SAME world/rays/config with
the bench methodology (untimed warmup, chained distinct dispatches,
value-readback checksum, min over batches):

  S0  primary_rays only                       -> dispatch + raygen
  S1  primary_rays + trace_brickmap_hbm       -> + the trace kernel
  S2  render_frame (full fused frame)         -> + shade + composite

trace = S1 - S0, shade+composite = S2 - S1, dispatch+raygen = S0.
The reference analog of the non-trace half is the fused screenDispatch
epilogue (`/root/reference/VoxelRT/Renderer.cu:244-276`).

Usage: python experiments/bench_frame_breakdown.py [world] [frames] [batches]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _require_tpu  # noqa: E402

_require_tpu()
from voxelengine_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voxelengine_tpu.config import Environment, RenderConfig  # noqa: E402
from voxelengine_tpu.io.checkpoint import (  # noqa: E402
    generate_or_load,
    line_table_or_build,
)
from voxelengine_tpu.core.brickmap import (  # noqa: E402
    build_brickmap_terrain_compact,
)
from voxelengine_tpu.ops.pallas_bigtrace import (  # noqa: E402
    materialize_brick_lines,
    trace_brickmap_hbm,
)
from voxelengine_tpu.render.frame import (  # noqa: E402
    make_framebuffer,
    primary_rays,
    render_frame,
)

WORLDS = {"small": (1024, 1024, 1024), "full": (8192, 512, 8192)}


def timed_loop(fn, frames, batches, warm=3, label=""):
    """bench.py batch methodology: chained distinct dispatches + checksum."""
    t0 = time.perf_counter()
    fn(0)  # compile
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for i in range(1, warm + 1):  # untimed warmup batch
        acc = fn(i)
    float(acc)
    times = []
    first = warm + 1
    for _ in range(batches):
        t0 = time.perf_counter()
        for i in range(first, first + frames):
            acc = fn(i)
        float(acc)  # value readback: forces the chain
        times.append((time.perf_counter() - t0) * 1000 / frames)
        first += frames
    return min(times), times


def main():
    world = sys.argv[1] if len(sys.argv) > 1 else "full"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batches = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    dims = WORLDS[world]
    print(f"devices: {jax.devices()}  world {dims}", flush=True)

    key = f"terrain_{dims[0]}x{dims[1]}x{dims[2]}_f32_o32_v1"
    bm = generate_or_load(
        ".world_cache", key, lambda: build_brickmap_terrain_compact(dims, 32)
    )
    bm.meta.block_until_ready()
    lt = line_table_or_build(".world_cache", key + "_lt1", bm)
    lt = materialize_brick_lines(bm, lt)
    lt.brick_lines.block_until_ready()
    print("world + line table ready", flush=True)

    cfg = RenderConfig(
        width=1920, height=1080, checkerboard=True, tile_order=True,
        trace_tile=2048, trace_slots=16,
        trace_use_macro=os.environ.get("UM", "0") == "1",
    )
    env = Environment.default()
    origin = jnp.asarray([dims[0] / 2, 380.0, dims[2] / 2], jnp.float32)
    euler0 = jnp.asarray([-0.25, 0.75, 0.0], jnp.float32)
    n_rays = cfg.width * cfg.height // 2

    # S0: raygen only (checksum the dirs so the dispatch must execute)
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def raygen(euler, frame, cfg):
        o, d, px, py, pyr = primary_rays(cfg, origin, euler, frame)
        return jnp.sum(d) + jnp.sum(px)

    # S1: raygen + trace (checksum steps).  bm/lt are ARGUMENTS, not
    # closures: a closed-over device array is embedded as an HLO constant
    # and the tunnel's remote-compile endpoint rejects the 1.9 GB body
    # (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def raytrace(bm, lt, euler, frame, cfg):
        o, d, px, py, pyr = primary_rays(cfg, origin, euler, frame)
        out = trace_brickmap_hbm(
            bm, lt, o, d, cfg.max_steps, tile=cfg.trace_tile,
            num_slots=cfg.trace_slots, use_macro=cfg.trace_use_macro,
        )
        return jnp.sum(out.steps) + jnp.sum(out.position)

    def s0(i):
        return raygen(euler0 + jnp.float32(1e-5) * i, jnp.int32(i), cfg)

    def s1(i):
        return raytrace(bm, lt, euler0 + jnp.float32(1e-5) * i, jnp.int32(i), cfg)

    fb_holder = [make_framebuffer(cfg)]

    def s2(i):
        fb_holder[0] = render_frame(
            bm, fb_holder[0], origin, euler0 + jnp.float32(1e-5) * i, env,
            jnp.int32(i), cfg, None, lt,
        )
        return jnp.sum(fb_holder[0])

    ms0, t0s = timed_loop(s0, frames, batches, label="S0")
    print(f"S0 raygen-only:   {ms0:6.2f} ms  (batches {['%.1f' % t for t in t0s]})", flush=True)
    ms1, t1s = timed_loop(s1, frames, batches, label="S1")
    print(f"S1 raygen+trace:  {ms1:6.2f} ms  (batches {['%.1f' % t for t in t1s]})", flush=True)
    ms2, t2s = timed_loop(s2, frames, batches, label="S2")
    print(f"S2 full frame:    {ms2:6.2f} ms  (batches {['%.1f' % t for t in t2s]})", flush=True)
    print(f"breakdown @ {n_rays} rays:", flush=True)
    print(f"  dispatch+raygen    {ms0:6.2f} ms", flush=True)
    print(f"  trace kernel       {ms1 - ms0:6.2f} ms", flush=True)
    print(f"  shade+composite    {ms2 - ms1:6.2f} ms", flush=True)
    print(f"  frame-minus-trace  {ms2 - (ms1 - ms0):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
