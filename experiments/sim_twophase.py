"""Ceiling-first analysis of a two-phase coarse/fine kernel decomposition.

VERDICT r3 item 1: before building a phase-split frame (phase A: coarse-
walk-only kernel over the VMEM-resident chunk-occupancy grid emitting
chunk-entry records; device compact/sort by entry chunk; phase B:
fine-only walks with line locality), estimate its ceiling from measured
inputs the way `sim_continuation.py` did — build only if the model says
>=1.5x, kill with data otherwise.

Stage 1 (`collect`): on the real chip, capture
  - per-ray phase counters (cadv/fstep/desc/asc/stall/...) for the FULL
    8k bench ray set through the diag build of the flagship kernel;
  - a REAL phase-A prototype cost: `trace_grid_vpu` over the 8k world's
    256x16x256 chunk-occupancy bitgrid with the bench rays scaled by 1/f
    (the coarse walk is exactly a dense-grid DDA; the prototype includes
    its own real lockstep + fetch cost);
  - REAL per-round plumbing costs: jitted compaction (flatnonzero +
    gather) and argsort of ~1M-ray state on device.
Everything lands in an npz for stage 2.

Stage 2 (`model`): per-round cost model over the measured distributions.
  Round k serves every ray with desc >= k: phase A walks its k-th coarse
  segment (total cadv split across desc+1 segments — optimistic:
  uniform), phase B its k-th chunk's fine steps.  Tiles pack perfectly
  after compaction (optimistic); per-iteration costs come from the
  measured prototypes; per-round overhead = measured compact + sort +
  dispatch.  The model is built to OVERESTIMATE the win: every
  approximation is taken in the two-phase design's favor, so a sub-gate
  result is a sound kill.

Usage:
  python experiments/sim_twophase.py collect   (TPU)
  python experiments/sim_twophase.py model     (host-only)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

NPZ = ".world_cache/sim_twophase_r4.npz"
DIMS = (8192, 512, 8192)
F = 32


def collect():
    from bench import _require_tpu

    _require_tpu()
    from voxelengine_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from voxelengine_tpu.config import RenderConfig
    from voxelengine_tpu.core.bitgrid import BitGrid
    from voxelengine_tpu.core.brickmap import (
        META_OCC_BIT,
        build_brickmap_terrain_compact,
    )
    from voxelengine_tpu.io.checkpoint import (
        generate_or_load,
        line_table_or_build,
    )
    from voxelengine_tpu.ops.pallas_bigtrace import (
        materialize_brick_lines,
        trace_brickmap_hbm,
    )
    from voxelengine_tpu.ops.pallas_trace import trace_grid_vpu
    from voxelengine_tpu.render.frame import primary_rays

    print(f"devices: {jax.devices()}", flush=True)
    key = f"terrain_{DIMS[0]}x{DIMS[1]}x{DIMS[2]}_f32_o32_v1"
    bm = generate_or_load(
        ".world_cache", key, lambda: build_brickmap_terrain_compact(DIMS, F)
    )
    bm.meta.block_until_ready()
    lt = line_table_or_build(".world_cache", key + "_lt1", bm)
    lt = materialize_brick_lines(bm, lt)
    lt.brick_lines.block_until_ready()

    cfg = RenderConfig(width=1920, height=1080, checkerboard=True,
                       tile_order=True, trace_tile=2048, trace_slots=16,
                       trace_use_macro=False)
    origin = jnp.asarray([DIMS[0] / 2, 380.0, DIMS[2] / 2], jnp.float32)
    euler = jnp.asarray([-0.25, 0.75, 0.0], jnp.float32)
    o, d, _, _, _ = primary_rays(cfg, origin, euler, jnp.int32(1))
    n = o.shape[0]
    print(f"bench rays: {n}", flush=True)

    # --- per-ray phase counters through the diag build (full set) ---
    t0 = time.perf_counter()
    res, ph = trace_brickmap_hbm(
        bm, lt, o, d, cfg.max_steps, tile=cfg.trace_tile,
        num_slots=cfg.trace_slots, use_macro=False, return_phases=True,
    )
    ph = {k: np.asarray(v) for k, v in ph.items()}
    print(f"diag trace: {time.perf_counter()-t0:.1f}s "
          f"(incl compile)", flush=True)
    for k in ("cadv", "fstep", "desc", "asc", "stall", "pend", "step2"):
        print(f"  {k:6s} sum {ph[k].sum()/1e6:8.2f}M  mean/ray "
              f"{ph[k].mean():6.2f}  p99 {np.percentile(ph[k], 99):.0f}  "
              f"max {ph[k].max()}", flush=True)

    # --- REAL phase-A prototype: dense DDA over the chunk-occupancy grid ---
    # chunk grid is coarse_layout LINEAR int32 meta; occupancy bit -> BitGrid
    gx, gy, gz = DIMS[0] // F, DIMS[1] // F, DIMS[2] // F
    occ = ((np.asarray(bm.meta) >> META_OCC_BIT) & 1) == 1
    from voxelengine_tpu.core.layout import Layout, sample_index

    xs, ys, zs = np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz),
                             indexing="ij")
    idx = np.asarray(sample_index(xs.reshape(-1), ys.reshape(-1),
                                  zs.reshape(-1), gx, gy, bm.coarse_layout))
    occ3 = occ[idx].reshape(gx, gy, gz)
    cg = BitGrid.from_dense(jnp.asarray(occ3), Layout.LINEAR)
    oc = o / F  # coarse-space rays, same directions
    # budget: a coarse walk can cross the whole grid
    reps = 3
    ocs = [oc + jnp.float32(1e-5) * (k + 1) for k in range(reps)]
    for x in ocs:
        x.block_until_ready()
    t0 = time.perf_counter()
    pa = trace_grid_vpu(cg, oc, d, 1024)
    pa.hit.block_until_ready()
    print(f"phase-A prototype compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for k in range(reps):
        pa = trace_grid_vpu(cg, ocs[k], d, 1024)
    _ = float(jnp.sum(pa.steps))
    pa_ms = (time.perf_counter() - t0) * 1000 / reps
    pa_steps = np.asarray(pa.steps)
    print(f"phase-A prototype: {pa_ms:.2f} ms  steps mean {pa_steps.mean():.1f}"
          f"  hit-rate {float(np.asarray(pa.hit).mean()):.3f}", flush=True)

    # --- per-round plumbing costs, measured on device at bench scale ---
    @jax.jit
    def compact(state, keep):
        idx = jnp.nonzero(keep, size=keep.shape[0], fill_value=0)[0]
        return tuple(s[idx] for s in state)

    @jax.jit
    def sortkeys(keys, state):
        order = jnp.argsort(keys)
        return tuple(s[order] for s in state)

    rng = np.random.default_rng(0)
    state = tuple(jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(10))
    keep = jnp.asarray(rng.random(n) < 0.5)
    keys = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))
    compact(state, keep)[0].block_until_ready()
    sortkeys(keys, state)[0].block_until_ready()
    t0 = time.perf_counter()
    for k in range(reps):
        out = compact(tuple(s + np.float32(k) for s in state), keep)
    _ = float(jnp.sum(out[0]))
    compact_ms = (time.perf_counter() - t0) * 1000 / reps
    t0 = time.perf_counter()
    for k in range(reps):
        out = sortkeys(keys + np.int32(k), state)
    _ = float(jnp.sum(out[0]))
    sort_ms = (time.perf_counter() - t0) * 1000 / reps
    print(f"compact(1M x 10 arrays): {compact_ms:.2f} ms   "
          f"argsort+permute: {sort_ms:.2f} ms", flush=True)

    np.savez_compressed(
        NPZ,
        n=n, pa_ms=pa_ms, compact_ms=compact_ms, sort_ms=sort_ms,
        pa_steps=pa_steps.astype(np.int32),
        steps=np.asarray(res.steps).astype(np.int32),
        hit=np.asarray(res.hit),
        **{k: ph[k].astype(np.int32) for k in ph},
    )
    print(f"saved {NPZ}", flush=True)


def model():
    z = np.load(NPZ)
    n = int(z["n"])
    tile = 2048
    cadv, fstep, desc = (z[k].astype(np.int64) for k in ("cadv", "fstep", "desc"))
    stall, pend, asc = (z[k].astype(np.int64) for k in ("stall", "pend", "asc"))
    iters = z["iters"].astype(np.int64)
    pa_ms = float(z["pa_ms"]); compact_ms = float(z["compact_ms"])
    sort_ms = float(z["sort_ms"])

    tile_iters = iters[::tile]
    today_iters = int(tile_iters.sum())
    # per-iteration cost implied by the measured frame (macro-off basin):
    # BENCH_r03 57.7 ms over the same ray set
    today_ms = 57.7
    c_iter_us = today_ms * 1000.0 / today_iters
    print(f"today: {today_iters} tile-iters -> {c_iter_us:.3f} us/iter "
          f"(from {today_ms} ms measured)")

    # ---- constants (each chosen in the two-phase design's FAVOR) ----
    # phase-A per-iteration: the measured prototype ran trace_grid_vpu at
    # its auto tile (8192 rays/iteration); per-iteration = pa_ms / (sum of
    # per-8192-tile maxima), then normalized to the model's 2048-lane
    # tiles (cost scales with rays/iteration: the fetch+body is per-group)
    pa_steps = z["pa_steps"].astype(np.int64)
    pt = pa_steps[: n // 8192 * 8192].reshape(-1, 8192)
    pa_iters = int(pt.max(axis=1).sum())
    c_a_us = pa_ms * 1000.0 / max(pa_iters, 1) * (tile / 8192)
    # phase-B per-iteration: the shortlist build measured 0.82-0.87 us with
    # the fetch machinery reduced; grant the B kernel the BEST measured
    # per-iteration body on this hardware
    c_b_us = 0.82
    print(f"phase-A prototype: {pa_ms:.1f} ms / {pa_iters} iters@8192 "
          f"-> c_A = {c_a_us:.3f} us/iter@2048;  c_B = {c_b_us} us (granted)")

    # ---- per-round model ----
    # round k (1-based) serves rays with desc >= k; a ray's k-th coarse
    # segment is cadv/(desc+1) (uniform split — optimistic: real segments
    # front-load, making later rounds cheaper but EXTRA rounds no shorter),
    # fine segment fstep/desc.  Perfect tile packing after compaction
    # (optimistic: zero lockstep waste INSIDE a round).
    max_rounds = int(desc.max())
    segs_c = np.where(desc > 0, cadv / (desc + 1), cadv)
    segs_f = np.where(desc > 0, fstep / np.maximum(desc, 1), 0)
    total_ms = 0.0
    per_round = []
    for k in range(1, max_rounds + 1):
        live = desc >= k
        nlive = int(live.sum())
        if nlive == 0:
            break
        a_iters = float(segs_c[live].sum()) / tile
        b_iters = float(segs_f[live].sum()) / tile
        round_ms = (a_iters * c_a_us + b_iters * c_b_us) / 1000.0
        round_ms += compact_ms + sort_ms  # per-round plumbing, measured
        total_ms += round_ms
        if k <= 6 or nlive > 1000:
            per_round.append((k, nlive, round_ms))
    # the free-plumbing ideal: perfect packing, zero compact/sort/dispatch
    ideal_ms = (float(cadv.sum()) / tile * c_a_us
                + float(fstep.sum()) / tile * c_b_us) / 1000.0
    print(f"free-plumbing ideal (perfect packing, zero per-round cost): "
          f"{ideal_ms:.1f} ms -> {today_ms/ideal_ms:.2f}x")
    # rays that never descend still need one phase-A pass (shared round 1)
    print(f"rounds: {max_rounds}; per-round (k, live, ms):")
    for r in per_round[:12]:
        print(f"  k={r[0]:3d}  live {r[1]:8d}  {r[2]:7.2f} ms")
    print(f"TOTAL two-phase model: {total_ms:.1f} ms  "
          f"vs today {today_ms} ms -> speedup {today_ms/total_ms:.2f}x")

    # variant: cap rounds at C, finish the tail with today's kernel
    events = cadv + fstep + desc + asc + pend
    for cap in (2, 3, 4, 6):
        live = desc > cap
        tail_rays = int(live.sum())
        # tail cost: those rays through today's kernel, perfectly packed
        # into tiles at their own per-ray event counts (optimistic: today's
        # kernel never packs that well)
        tail_iters = float(events[live].sum() if tail_rays else 0) / tile
        capped = sum(r[2] for r in per_round if r[0] <= cap)
        capped += (tail_iters * c_iter_us) / 1000.0
        print(f"  cap={cap}: {capped:.1f} ms + tail({tail_rays} rays) "
              f"-> speedup {today_ms/max(capped, 1e-9):.2f}x")


if __name__ == "__main__":
    (collect if sys.argv[1:2] == ["collect"] else model)()
