"""Round-2 Mosaic/Pallas capability probes for the HBM-scale traversal kernel.

The planned kernel (ops/pallas_bigtrace.py) relies on five primitives whose
v5e Mosaic support must be established on real hardware before building:

  P1  take_along_axis(x, idx, axis=1) on [8,128] i32 (row-local
      dynamic_gather) — the per-lane word select from a broadcast row.
  P2  vector -> scalar min-reduction used as a dynamic VMEM slice index
      (the "vote": pick the row most-wanted by stalled rays, read it with
      pl.ds, broadcast, gather).
  P3  scalar-indexed async DMA HBM->VMEM scratch where the scalar comes
      from a vector reduction (the region/brick cache refill).
  P4  tag vector read-modify-write via iota compare (cache tag update
      without dynamic stores).
  P5  @pl.when-gated DMA (refill only on miss) inside a while_loop.

Run:  JAX_PLATFORMS=tpu python experiments/probe_mosaic_r2.py
Each probe prints PASS/FAIL + any Mosaic error so the findings are
reproducible; results feed NOTES_ROUND2.md and the kernel design.
"""

import functools
import sys
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


# ---------------------------------------------------------------- P1
def p1_rowlocal_gather():
    def kern(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx = idx_ref[:]
        o_ref[:] = jnp.take_along_axis(x, idx, axis=1)

    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    idx = (jnp.arange(8 * 128, dtype=I32).reshape(8, 128) * 7 + 3) % 128
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    assert (np.asarray(out) == ref).all(), "wrong values"


def p1b_rowlocal_gather_big():
    # [1024,128]: per-ray private row form
    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    x = jnp.arange(1024 * 128, dtype=I32).reshape(1024, 128)
    idx = (x * 13 + 5) % 128
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1024, 128), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    assert (np.asarray(out) == ref).all(), "wrong values"


def p1c_sublane_gather():
    # axis=0 form: out[i,j] = x[idx[i,j], j]
    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    idx = (x * 5 + 1) % 8
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    assert (np.asarray(out) == ref).all(), "wrong values"


# ---------------------------------------------------------------- P2
def p2_vote_dynamic_slice():
    # min-reduce a [1024] key vector -> scalar row id -> pl.ds read of that
    # row from a [64,128] VMEM table -> broadcast -> row-local gather
    def kern(tab_ref, keys_ref, lanes_ref, o_ref):
        keys = keys_ref[:]
        want = jnp.min(keys)  # scalar vote
        row = tab_ref[pl.ds(want, 1), :]  # [1,128]
        rowb = jnp.broadcast_to(row, (8, 128))
        lanes = lanes_ref[:].reshape(8, 128)
        vals = jnp.take_along_axis(rowb, lanes, axis=1)
        o_ref[:] = vals.reshape(1024) + want * 0

    tab = jnp.arange(64 * 128, dtype=I32).reshape(64, 128)
    keys = jnp.full((1024,), 7, I32).at[3].set(5)
    lanes = (jnp.arange(1024, dtype=I32) * 11) % 128
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1024,), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, keys, lanes)
    ref = np.asarray(tab)[5, np.asarray(lanes)]
    assert (np.asarray(out) == ref).all(), "wrong values"


# ---------------------------------------------------------------- P3
def p3_scalar_indexed_dma():
    # DMA row `want` (from a vector reduce) of an HBM array into a VMEM
    # scratch slot, then serve lanes from it
    def kern(hbm_ref, keys_ref, o_ref, scratch, sem):
        want = jnp.min(keys_ref[:])
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(want * 8, 8), :], scratch.at[pl.ds(0, 8), :], sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[0, :]

    hbm = jnp.arange(256 * 8 * 128, dtype=I32).reshape(256 * 8, 128)
    keys = jnp.full((1024,), 9, I32).at[100].set(3)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128,), I32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, 128), I32),
            pltpu.SemaphoreType.DMA,
        ],
    )(hbm, keys)
    assert (np.asarray(out) == np.asarray(hbm)[3 * 8, :]).all(), "wrong values"


# ---------------------------------------------------------------- P4+P5
def p45_gated_dma_in_loop():
    # while_loop carrying tags; @pl.when-gated DMA on miss; RMW tag update
    S = 8

    def kern(hbm_ref, wants_ref, o_ref, cache, tags_ref, rr_ref, sem):
        tags_ref[:] = jnp.full((8, 128), -1, I32)
        rr_ref[0] = 0
        wants = wants_ref[:]  # [16] row ids to visit, ascending

        def body(c):
            i, acc = c
            want = wants[i]
            tags = tags_ref[:]
            hitvec = (tags == want) & (
                jax.lax.broadcasted_iota(I32, (8, 128), 1) < S
            )
            slot = jnp.min(jnp.where(hitvec, jax.lax.broadcasted_iota(I32, (8, 128), 1), 9999))
            miss = slot >= 9999

            @pl.when(miss)
            def _():
                s = rr_ref[0] % S
                dma = pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(want, 1), :], cache.at[pl.ds(s, 1), :], sem
                )
                dma.start()
                dma.wait()
                lane = jax.lax.broadcasted_iota(I32, (8, 128), 1)
                row0 = jax.lax.broadcasted_iota(I32, (8, 128), 0) == 0
                tags_ref[:] = jnp.where(row0 & (lane == s), want, tags_ref[:])
                rr_ref[0] = rr_ref[0] + 1

            tags2 = tags_ref[:]
            hit2 = tags2 == want
            slot2 = jnp.min(
                jnp.where(hit2, jax.lax.broadcasted_iota(I32, (8, 128), 1), 9999)
            )
            val = cache[pl.ds(slot2, 1), :][0, 0]
            return i + 1, acc + val

        _, acc = jax.lax.while_loop(lambda c: c[0] < 16, body, (jnp.int32(0), jnp.int32(0)))
        o_ref[0] = acc

    hbm = (jnp.arange(64, dtype=I32)[:, None] * 1000 + jnp.arange(128, dtype=I32)[None, :])
    wants = jnp.asarray([0, 1, 2, 0, 1, 2, 9, 9, 4, 4, 0, 7, 7, 7, 2, 5], I32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), I32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((S, 128), I32),
            pltpu.VMEM((8, 128), I32),
            pltpu.SMEM((2,), I32),
            pltpu.SemaphoreType.DMA,
        ],
    )(hbm, wants)
    expect = int(np.asarray(wants).sum() * 1000)
    got = int(np.asarray(out)[0])
    assert got == expect, f"{got} != {expect}"


# ---------------------------------------------------------------- P6 timing
def p6_dma_latency():
    # time N back-to-back blocking 4KB DMAs inside one kernel
    N = 512

    def kern(hbm_ref, o_ref, scratch, sem):
        def body(i, acc):
            dma = pltpu.make_async_copy(
                hbm_ref.at[pl.ds((i * 37) % 1024 * 8, 8), :],
                scratch.at[pl.ds(0, 8), :],
                sem,
            )
            dma.start()
            dma.wait()
            return acc + scratch[0, 0]

        o_ref[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))

    hbm = jnp.ones((1024 * 8, 128), I32)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), I32), pltpu.SemaphoreType.DMA],
    )
    jf = jax.jit(lambda x: f(x))
    jf(hbm).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = jf(hbm)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"  p6: {N} blocking 4KB DMAs in {dt*1e6:.0f} us -> {dt/N*1e9:.0f} ns/DMA")


# ---------------------------------------------------------------- P7 timing
def p7_vote_throughput():
    # time M vote+slice+gather rounds over a [1024] lane vector
    M = 4096

    def kern(tab_ref, keys_ref, o_ref):
        def body(i, c):
            keys, acc = c
            want = jnp.min(keys)
            row = jnp.broadcast_to(tab_ref[pl.ds(want % 64, 1), :], (8, 128))
            lanes = (keys.reshape(8, 128) + i) % 128
            vals = jnp.take_along_axis(row, lanes, axis=1).reshape(1024)
            keys = keys + (vals & 1) + 1
            return keys, acc + vals
        keys, acc = jax.lax.fori_loop(
            0, M, body, (keys_ref[:], jnp.zeros((1024,), I32))
        )
        o_ref[:] = acc + keys

    tab = jnp.arange(64 * 128, dtype=I32).reshape(64, 128)
    keys = (jnp.arange(1024, dtype=I32) * 7) % 33
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1024,), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda *a: f(*a))
    jf(tab, keys).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = jf(tab, keys)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"  p7: {M} vote+gather rounds in {dt*1e6:.0f} us -> {dt/M*1e9:.0f} ns/round")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    ok = True
    ok &= report("P1  row-local gather [8,128] ax1", p1_rowlocal_gather)
    ok &= report("P1b row-local gather [1024,128] ax1", p1b_rowlocal_gather_big)
    ok &= report("P1c sublane gather [8,128] ax0", p1c_sublane_gather)
    ok &= report("P2  vote -> dynamic slice -> gather", p2_vote_dynamic_slice)
    ok &= report("P3  scalar-indexed DMA from reduce", p3_scalar_indexed_dma)
    ok &= report("P4/5 gated DMA + tag RMW in loop", p45_gated_dma_in_loop)
    report("P6  DMA latency", p6_dma_latency)
    report("P7  vote throughput", p7_vote_throughput)
    sys.exit(0 if ok else 1)
