"""Round-2 probe set C: the actual kernel fetch/DMA primitives, final form.

  C1  grouped pair-gather fetch with S-slot unroll: for B=1024 rays in 8
      groups of 128, fetch cache[slot[b], row[b], lane[b]] from an
      [S,8,128] VMEM cache with NO scalar ops:
        per group g, per slot s:
          y = ax1(line_s, lane_rep)         # [8,128]
          z = ax0(y, row_rep)               # [8,128] replicated answer
          acc = where(slot==s, z, acc)
      correctness + ns/pass.
  C2  DMA latency with a 512 MB HBM-resident source (can't be VMEM-placed),
      blocking (K=1) and batched (K=8).
  C3  while-loop scalar-cond overhead: iterations/s of an empty-ish while
      body with a vector-reduce condition, vs fori_loop.
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


def fetch_pass(cache, slots, rows, lanes, S):
    """cache [S*8,128]; slots/rows/lanes [1024] -> vals [1024]."""
    outs = []
    for g in range(8):
        sl = slots[g * 128 : (g + 1) * 128]
        ro = rows[g * 128 : (g + 1) * 128]
        la = lanes[g * 128 : (g + 1) * 128]
        lane_rep = jnp.broadcast_to(la[None, :], (8, 128))
        row_rep = jnp.broadcast_to(ro[None, :], (8, 128))
        acc = jnp.zeros((128,), I32)
        for s in range(S):
            y = jnp.take_along_axis(cache[s * 8 : (s + 1) * 8, :], lane_rep, axis=1)
            z = jnp.take_along_axis(y, row_rep, axis=0)
            acc = jnp.where(sl == s, z[0, :], acc)
        outs.append(acc)
    return jnp.concatenate(outs)


def c1_fetch(S, time_it=True):
    M = 2048

    def kern(cache_ref, slots_ref, rows_ref, lanes_ref, o_ref):
        cache = cache_ref[:]

        def body(i, c):
            slots, rows, lanes, acc = c
            vals = fetch_pass(cache, slots, rows, lanes, S)
            slots = (slots + (vals & 1)) % S
            rows = (rows + (vals & 3) + 1) % 8
            lanes = (lanes + (vals & 7) + 1) % 128
            return slots, rows, lanes, acc + vals

        _, _, _, acc = jax.lax.fori_loop(
            0, M, body,
            (slots_ref[:], rows_ref[:], lanes_ref[:], jnp.zeros((1024,), I32)),
        )
        o_ref[:] = acc

    cache = jnp.arange(S * 8 * 128, dtype=I32).reshape(S * 8, 128)
    b = jnp.arange(1024, dtype=I32)
    slots, rows, lanes = (b * 13) % S, (b * 7) % 8, (b * 29) % 128
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1024,), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda *a: f(*a))
    out = jf(cache, slots, rows, lanes)
    out.block_until_ready()

    # correctness of a single pass (pure-numpy replay)
    def kern1(cache_ref, slots_ref, rows_ref, lanes_ref, o_ref):
        o_ref[:] = fetch_pass(cache_ref[:], slots_ref[:], rows_ref[:], lanes_ref[:], S)

    f1 = pl.pallas_call(
        kern1,
        out_shape=jax.ShapeDtypeStruct((1024,), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    got = np.asarray(f1(cache, slots, rows, lanes))
    ref = np.asarray(cache).reshape(S, 8, 128)[np.asarray(slots), np.asarray(rows), np.asarray(lanes)]
    assert (got == ref).all(), "single-pass values wrong"

    if time_it:
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(cache, slots, rows, lanes)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(
            f"  c1 S={S}: {M} fetch passes in {dt*1e6:.0f} us"
            f" -> {dt/M*1e9:.0f} ns/pass (1024 rays)",
            flush=True,
        )


def c2_dma(K):
    N = 512
    NL = 16384  # 16384 lines * 4KB = 512 MB -> must be HBM

    def kern(hbm_ref, o_ref, scratch, sems):
        def body(i, acc):
            for k in range(K):
                line = ((i * K + k) * 40503) % NL
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(line * 8, 8), :],
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

    hbm = jnp.ones((NL * 8, 128), I32)
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
        f"  c2 K={K}: {N} 4KB DMAs from 512MB HBM in {dt*1e6:.0f} us"
        f" -> {dt/N*1e9:.0f} ns/DMA",
        flush=True,
    )


def c3_while_overhead():
    M = 4096

    def kern_while(x_ref, o_ref):
        def cond(c):
            return jnp.any(c[1] < M)

        def body(c):
            i, v = c
            return i + 1, v + (v & 1) + 1

        _, v = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[:]))
        o_ref[:] = v

    def kern_fori(x_ref, o_ref):
        def body(i, v):
            return v + (v & 1) + 1

        o_ref[:] = jax.lax.fori_loop(0, M, body, x_ref[:])

    x = jnp.zeros((1024,), I32)
    for name, kern in (("while(any)", kern_while), ("fori", kern_fori)):
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024,), I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda a, f=f: f(a))
        jf(x).block_until_ready()
        reps = 50
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"  c3 {name}: ~{M} iters in {dt*1e6:.0f} us -> {dt/M*1e9:.0f} ns/iter", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for S in (8, 12, 16, 24):
        report(f"C1 fetch pass S={S}", lambda S=S: c1_fetch(S))
    for K in (1, 8):
        report(f"C2 HBM DMA K={K}", lambda K=K: c2_dma(K))
    report("C3 while overhead", c3_while_overhead)
    report("C4 scalar-op costs", c4_scalar_costs)


def c4_scalar_costs():
    M = 4096

    def kern_reduce(x_ref, o_ref):
        def body(i, v):
            m = jnp.min(v)  # vector -> scalar
            return v + m % 3 + 1

        o_ref[:] = jax.lax.fori_loop(0, M, body, x_ref[:])

    def kern_addr(tab_ref, x_ref, o_ref):
        def body(i, v):
            row = tab_ref[pl.ds((i * 13) % 64, 1), :]  # scalar-addressed read
            return v + jnp.broadcast_to(row, (8, 128)).reshape(1024)

        o_ref[:] = jax.lax.fori_loop(0, M, body, x_ref[:])

    def kern_vote(tab_ref, x_ref, o_ref):
        def body(i, v):
            m = jnp.min(v) % 64
            row = tab_ref[pl.ds(m, 1), :]  # reduce -> addressed read
            return v + jnp.broadcast_to(row, (8, 128)).reshape(1024) % 5 + 1

        o_ref[:] = jax.lax.fori_loop(0, M, body, x_ref[:])

    tab = jnp.ones((64, 128), I32)
    x = jnp.zeros((1024,), I32)
    for name, kern, args in (
        ("min-reduce only", kern_reduce, (x,)),
        ("addressed read (loop idx)", kern_addr, (tab, x)),
        ("reduce->addressed read", kern_vote, (tab, x)),
    ):
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1024,), I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda *a, f=f: f(*a))
        jf(*args).block_until_ready()
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(*args)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"  c4 {name}: {dt/M*1e9:.0f} ns/iter", flush=True)
