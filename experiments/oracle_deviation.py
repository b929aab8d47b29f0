"""Quantify the oracle-vs-production deviation rate (round-4 VERDICT item 5).

The production traversal (ops/trace.py trace_brickmap) deliberately deviates
from the reference in exactly one semantic: where the reference's repeat-cell
guard (VolumeRaytracer.cu:402-407) KILLS a ray that re-enters the same coarse
chunk twice in a row (after its nextafter nudging fails to escape), the
production path resumes the coarse DDA and keeps tracing.  PARITY.md calls
the resulting mismatch budget "tiny"; this script measures it.

For each world it traces a large random ray corpus through both the scalar
oracle (with the new TraceResult.guard_tripped flag) and the vectorized XLA
path, and reports:
  - hit mismatches, split by whether the oracle's guard tripped on that ray;
  - position/normal deviations among agreeing hits;
  - the guard-trip base rate itself.

The claim to pin: every hit mismatch occurs on a guard-tripped ray (the
deviation is exactly the documented one, nothing else), and the combined
rate is well under the 1% budget the parity tests allow.

Usage:
  JAX_PLATFORMS=cpu python experiments/oracle_deviation.py [rays_per_world]
Writes a JSON summary line per world plus a combined line.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from voxelengine_tpu.core.bitgrid import BitGrid  # noqa: E402
from voxelengine_tpu.core.brickmap import build_brickmap  # noqa: E402
from voxelengine_tpu.oracle import reference as R  # noqa: E402
from voxelengine_tpu.ops.trace import trace_brickmap  # noqa: E402

F32 = np.float32


def make_worlds(rng):
    """Varied geometry: sparse scatter, terrain-like floor, solid slabs with
    caves, and a factor-16 world (the demo's scale class)."""
    worlds = []

    d = rng.random((32, 32, 32)) < 0.02
    d[:, 0:4, :] = rng.random((32, 4, 32)) < 0.5
    worlds.append(("rand32_f8", d, 8))

    d = np.zeros((64, 64, 64), bool)
    h = (12 + 8 * np.sin(np.arange(64) / 7.0)[:, None]
         + 6 * np.cos(np.arange(64) / 5.0)[None, :])  # [z, x] heightfield
    d[:, :, :] = np.arange(64)[None, :, None] < h[:, None, :]
    d &= rng.random((64, 64, 64)) < 0.97  # porosity -> guard-bait re-entries
    worlds.append(("terrain64_f8", d, 8))

    d = np.zeros((64, 64, 64), bool)
    d[:, 0:24, :] = True
    zz, yy, xx = np.meshgrid(*[np.arange(64)] * 3, indexing="ij")
    for _ in range(12):  # carve spherical caves through the slab
        c = rng.random(3) * 64
        r2 = (rng.random() * 10 + 4) ** 2
        d &= ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) > r2
    worlds.append(("caves64_f8", d, 8))

    d = rng.random((64, 64, 64)) < 0.01
    d[:, :6, :] = rng.random((64, 6, 64)) < 0.5
    worlds.append(("sparse64_f16", d, 16))

    return worlds


def make_rays(rng, dims, n):
    """Mixed corpus: outside-in, inside-out, grazing (near-axis-parallel at
    integer-plane heights -- the nudge/guard's provocation class)."""
    X = np.array(dims[::-1], F32)  # dense is [z,y,x] -> world extents (x,y,z)
    n_out, n_in = n // 2, n // 4
    n_graze = n - n_out - n_in

    o_out = (rng.random((n_out, 3)) * X * 2 - X * 0.5).astype(F32)
    t_out = (rng.random((n_out, 3)) * X).astype(F32)

    o_in = (rng.random((n_in, 3)) * X).astype(F32)
    t_in = (rng.random((n_in, 3)) * X).astype(F32)

    # grazing: start on/near integer planes, direction dominated by one axis
    o_gz = (rng.integers(0, X.astype(int), (n_graze, 3)).astype(F32)
            + rng.choice([0.0, 1e-6, 0.5], (n_graze, 3)).astype(F32))
    ax = rng.integers(0, 3, n_graze)
    d_gz = rng.normal(0, 0.02, (n_graze, 3)).astype(F32)
    d_gz[np.arange(n_graze), ax] = np.where(rng.random(n_graze) < 0.5, 1.0, -1.0)
    t_gz = o_gz + d_gz

    origins = np.concatenate([o_out, o_in, o_gz]).astype(F32)
    targets = np.concatenate([t_out, t_in, t_gz]).astype(F32)
    rays = targets - origins
    nz = np.linalg.norm(rays, axis=1, keepdims=True)
    nz[nz == 0] = 1.0
    rays = (rays / nz).astype(F32)
    return origins, rays


def run_world(name, dense, factor, n_rays, rng):
    grid = BitGrid.from_dense(dense)
    bm = build_brickmap(grid, factor)
    coarse, cdims, brick, cbounds = R.make_brickmap_callbacks(dense, factor)
    origins, rays = make_rays(rng, dense.shape, n_rays)

    out = trace_brickmap(bm, jnp.asarray(origins), jnp.asarray(rays))
    hit = np.asarray(out.hit)
    pos = np.asarray(out.position)
    nrm = np.asarray(out.normal)

    t0 = time.time()
    stats = dict(world=name, rays=n_rays, guard_trips=0, hit_mismatch=0,
                 hit_mismatch_on_guard=0, pos_dev=0, nrm_dev=0)
    details = []
    for i in range(n_rays):
        res = R.raytrace_brickmap(
            coarse, cdims, brick, cbounds, factor, origins[i], rays[i]
        )
        if res.guard_tripped:
            stats["guard_trips"] += 1
        if bool(hit[i]) != res.hit:
            stats["hit_mismatch"] += 1
            if res.guard_tripped:
                stats["hit_mismatch_on_guard"] += 1
            details.append(dict(
                kind="hit", i=i, guard=res.guard_tripped,
                origin=origins[i].tolist(), ray=rays[i].tolist(),
                prod_hit=bool(hit[i]), oracle_hit=res.hit,
                prod_pos=pos[i].tolist(),
                oracle_pos=None if res.position is None else
                [float(v) for v in res.position],
            ))
            continue
        if res.hit:
            pd = not np.allclose(pos[i], res.position, atol=2e-3)
            nd = not np.array_equal(nrm[i], res.normal)
            stats["pos_dev"] += pd
            stats["nrm_dev"] += nd
            if pd or nd:
                details.append(dict(
                    kind=("pos+" if pd else "") + ("nrm" if nd else "pos"),
                    i=i, guard=res.guard_tripped,
                    origin=origins[i].tolist(), ray=rays[i].tolist(),
                    prod_pos=pos[i].tolist(),
                    oracle_pos=[float(v) for v in res.position],
                    prod_nrm=nrm[i].tolist(),
                    oracle_nrm=[float(v) for v in res.normal],
                ))
        if i % 2000 == 1999:
            el = time.time() - t0
            print(f"  {name}: {i+1}/{n_rays} rays, {el:.0f}s, "
                  f"mism={stats['hit_mismatch']} guard={stats['guard_trips']}",
                  flush=True)
    stats["oracle_secs"] = round(time.time() - t0, 1)
    print(json.dumps(stats), flush=True)
    with open(f"/tmp/oracle_dev_{name}.jsonl", "w") as fh:
        for d in details:
            fh.write(json.dumps(d) + "\n")
    return stats


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    rng = np.random.default_rng(0xDEC0DE)
    totals = dict(rays=0, guard_trips=0, hit_mismatch=0,
                  hit_mismatch_on_guard=0, pos_dev=0, nrm_dev=0)
    for name, dense, factor in make_worlds(rng):
        s = run_world(name, dense, factor, n, rng)
        for k in totals:
            totals[k] += s[k]
    totals["mismatch_rate"] = totals["hit_mismatch"] / max(totals["rays"], 1)
    totals["guard_rate"] = totals["guard_trips"] / max(totals["rays"], 1)
    totals["all_mismatches_on_guard"] = (
        totals["hit_mismatch"] == totals["hit_mismatch_on_guard"]
    )
    print("TOTAL " + json.dumps(totals), flush=True)


if __name__ == "__main__":
    main()
