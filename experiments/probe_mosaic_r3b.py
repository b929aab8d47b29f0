"""Round-3 probe B: the composed shortlist-fetch primitives on v5e.

Verifies, in one kernel, everything the per-group slot-shortlist fetch
needs beyond probe A (dynamic-offset VMEM vector load, commit 23f9e28):

  1. lane-axis (axis=1) min/max reductions of an [R,128] vreg value,
  2. broadcast of the (R,1) result and a VMEM store + scalar readback,
  3. dynamic-index SMEM store and load (tags mirror),
  4. dynamic-offset VMEM line load selected by the voted scalar,
  5. per-group scalar-tag compare + pair-gather fetch.

Run on TPU: prints LOWERS + correctness, or the Mosaic error.
"""

import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, S = 4, 8  # ray rows, cache slots


def kern(want_ref, row_ref, lane_ref, lines_ref, tags_in_ref, o_ref, srv_ref,
         cache, tags_smem, cand_ref):
    cache[:] = lines_ref[:]
    for s in range(S):
        tags_smem[s] = tags_in_ref[s]

    want = want_ref[:]
    # per-ray cache slot (the once-per-round S-scan)
    cslot = jnp.full((R, 128), -1, jnp.int32)
    for s in range(S):
        cslot = jnp.where(want == tags_smem[s], s, cslot)
    valid = cslot >= 0
    v1 = jnp.where(valid, cslot, S)
    c1 = jnp.min(v1, axis=1, keepdims=True)          # (R,1) lane reduction
    c2 = jnp.max(jnp.where(valid, cslot, -1), axis=1, keepdims=True)
    cand_ref[0:R, :] = jnp.broadcast_to(c1, (R, 128))
    cand_ref[R : 2 * R, :] = jnp.broadcast_to(c2, (R, 128))

    row = row_ref[:]
    lane = lane_ref[:]
    sub = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    out = jnp.zeros((R, 128), jnp.int32)
    srv = jnp.zeros((R, 128), jnp.int32)
    for g in range(R):
        s1 = jnp.minimum(cand_ref[g, 0], S - 1)          # scalar from VMEM
        s2 = jnp.maximum(cand_ref[R + g, 0], 0)
        t1 = tags_smem[s1]                               # dynamic SMEM load
        t2 = tags_smem[s2]
        l1 = cache[pl.ds(s1 * 8, 8), :]                  # dynamic VMEM load
        l2 = cache[pl.ds(s2 * 8, 8), :]
        lane_rep = jnp.broadcast_to(lane[g, :][None, :], (8, 128))
        row_rep = jnp.broadcast_to(row[g, :][None, :], (8, 128))
        wg = want[g, :][None, :]
        acc = jnp.zeros((1, 128), jnp.int32)
        hit = jnp.zeros((1, 128), jnp.bool_)
        for tag, line in ((t1, l1), (t2, l2)):
            y = jnp.take_along_axis(line, lane_rep, axis=1)
            z = jnp.take_along_axis(y, row_rep, axis=0)
            m = wg == tag
            acc = jnp.where(m, z[0:1, :], acc)
            hit = hit | m
        out = jnp.where(sub == g, jnp.broadcast_to(acc, (R, 128)), out)
        srv = jnp.where(sub == g,
                        jnp.broadcast_to(hit.astype(jnp.int32), (R, 128)), srv)
    o_ref[:] = out
    srv_ref[:] = srv


def main():
    rng = np.random.default_rng(0)
    tags = np.array([100, 101, 102, 103, 104, 105, 106, 107], np.int32)
    lines = rng.integers(0, 1 << 20, (S * 8, 128), dtype=np.int32)
    # rays want a mix of slots; some want a non-resident line (999)
    want = rng.choice([100, 101, 102, 107, 999], (R, 128)).astype(np.int32)
    row = rng.integers(0, 8, (R, 128), dtype=np.int32)
    lane = rng.integers(0, 128, (R, 128), dtype=np.int32)
    try:
        out, srv = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.int32)] * 2,
            scratch_shapes=[
                pltpu.VMEM((S * 8, 128), jnp.int32),
                pltpu.SMEM((S,), jnp.int32),
                pltpu.VMEM((2 * R, 128), jnp.int32),
            ],
            interpret=False,
        )(want, row, lane, lines, tags)
        out, srv = np.asarray(out), np.asarray(srv)
        # model: per group, candidates = (min valid slot, max valid slot)
        ok = True
        for g in range(R):
            cs = np.full(128, -1)
            for s in range(S):
                cs[want[g] == tags[s]] = s
            val = cs[cs >= 0]
            c1 = val.min() if val.size else S - 1
            c2 = val.max() if val.size else 0
            for j in range(128):
                should = cs[j] in (c1, c2) and cs[j] >= 0
                if srv[g, j] != should:
                    ok = False
                if should:
                    exp = lines[cs[j] * 8 + row[g, j], lane[g, j]]
                    if out[g, j] != exp:
                        ok = False
        print(f"shortlist-fetch composite LOWERS; correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"does NOT lower: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
