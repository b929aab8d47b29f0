"""Round-2 probe set B: the vote-free cache-fetch building blocks.

Design under test (for ops/pallas_bigtrace.py): a unified VMEM line cache
``cache[R,128]`` (R = 8 * slots, 4 KB lines DMA'd from HBM) served by a
2-gather "replicated pair" fetch: for a group of 128 rays with per-ray
(row, lane) wants,

    y[n, j] = cache[n, lane[j]]          (ax1 row-local, lane bcast over rows)
    out[n,j] = y[row[j], j] = cache[row[j], lane[j]]   (ax0 sublane gather)

No scalar round-trips, no coherence requirement.  Needs ax0 dynamic_gather
on [R,128] with R > 8 — untested on v5e (probe set A only covered [8,128]).

  Q1  ax0 gather correctness for R in {16, 64, 128, 256}
  Q2  replicated-pair fetch correctness ([64,128] cache, 1024 rays)
  Q3  fetch throughput: rounds/s for the full 1024-ray fetch pass
  Q4  K-batched DMA: issue K copies, wait K -> amortized latency
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def report(name, fn):
    try:
        t0 = time.perf_counter()
        fn()
        print(f"PASS {name} ({time.perf_counter()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def q1_ax0_gather(R):
    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    x = jnp.arange(R * 128, dtype=I32).reshape(R, 128)
    idx = (x * 7 + 3) % R
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, 128), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    assert (np.asarray(out) == ref).all(), "wrong values"


def fetch_words(cache, rows, lanes, R):
    """cache[R,128]; rows/lanes [B] -> out [B]: cache[rows[b], lanes[b]].

    B rays in groups of 128; per group: replicate (row, lane) across R
    sublanes, ax1 then ax0 gather, extract a single row.
    """
    B = rows.shape[0]
    outs = []
    for g in range(B // 128):
        lane = jax.lax.dynamic_slice(lanes, (g * 128,), (128,))
        row = jax.lax.dynamic_slice(rows, (g * 128,), (128,))
        lane_rep = jnp.broadcast_to(lane[None, :], (R, 128))
        row_rep = jnp.broadcast_to(row[None, :], (R, 128))
        y = jnp.take_along_axis(cache, lane_rep, axis=1)  # y[n,j]=cache[n,lane[j]]
        z = jnp.take_along_axis(y, row_rep, axis=0)  # z[n,j]=cache[row[j],lane[j]]
        outs.append(z[0, :])
    return jnp.concatenate(outs)


def q2_pair_fetch():
    R = 64

    def kern(cache_ref, rows_ref, lanes_ref, o_ref):
        o_ref[:] = fetch_words(cache_ref[:], rows_ref[:], lanes_ref[:], R)

    cache = jnp.arange(R * 128, dtype=I32).reshape(R, 128)
    rows = (jnp.arange(1024, dtype=I32) * 13 + 5) % R
    lanes = (jnp.arange(1024, dtype=I32) * 29 + 11) % 128
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1024,), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cache, rows, lanes)
    ref = np.asarray(cache)[np.asarray(rows), np.asarray(lanes)]
    assert (np.asarray(out) == ref).all(), "wrong values"


def q3_fetch_throughput(R):
    M = 4096

    def kern(cache_ref, rows_ref, lanes_ref, o_ref):
        cache = cache_ref[:]

        def body(i, c):
            rows, lanes, acc = c
            vals = fetch_words(cache, rows, lanes, R)
            rows = (rows + (vals & 3) + 1) % R
            lanes = (lanes + (vals & 7) + 1) % 128
            return rows, lanes, acc + vals

        _, _, acc = jax.lax.fori_loop(
            0, M, body, (rows_ref[:], lanes_ref[:], jnp.zeros((1024,), I32))
        )
        o_ref[:] = acc

    cache = jnp.arange(R * 128, dtype=I32).reshape(R, 128)
    rows = (jnp.arange(1024, dtype=I32) * 13) % R
    lanes = (jnp.arange(1024, dtype=I32) * 29) % 128
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1024,), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda *a: f(*a))
    jf(cache, rows, lanes).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = jf(cache, rows, lanes)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(
        f"  q3 R={R}: {M} fetch passes (1024 rays) in {dt*1e6:.0f} us"
        f" -> {dt/M*1e9:.0f} ns/pass",
        flush=True,
    )


def q4_batched_dma(K):
    N = 512  # miss events

    def kern(hbm_ref, o_ref, scratch, sems):
        def body(i, acc):
            for k in range(K):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(((i * K + k) * 37) % 1024 * 8, 8), :],
                    scratch.at[pl.ds(k * 8, 8), :],
                    sems.at[k],
                ).start()
            for k in range(K):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(0, 8), :],
                    scratch.at[pl.ds(k * 8, 8), :],
                    sems.at[k],
                ).wait()
            return acc + scratch[0, 0]

        o_ref[0] = jax.lax.fori_loop(0, N // K, body, jnp.int32(0))

    hbm = jnp.ones((1024 * 8, 128), I32)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), I32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((8 * K, 128), I32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    jf = jax.jit(lambda x: f(x))
    jf(hbm).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = jf(hbm)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(
        f"  q4 K={K}: {N} 4KB DMAs in {dt*1e6:.0f} us -> {dt/N*1e9:.0f} ns/DMA",
        flush=True,
    )


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for R in (16, 64, 128, 256):
        report(f"Q1 ax0 gather [{R},128]", lambda R=R: q1_ax0_gather(R))
    report("Q2 replicated-pair fetch [64,128] x 1024 rays", q2_pair_fetch)
    for R in (64, 128, 256):
        report(f"Q3 fetch throughput R={R}", lambda R=R: q3_fetch_throughput(R))
    for K in (1, 4, 8):
        report(f"Q4 batched DMA K={K}", lambda K=K: q4_batched_dma(K))
