"""Probe E: wide-lane ax1 row-local gather.

If take_along_axis(x [8, S*128], idx [8, S*128], axis=1) lowers with
cross-vreg lane indexing, the kernel's per-slot fetch unroll (S x 4 ops per
128-ray group) collapses to one wide gather + one ax0 (3-4x cheaper fetch).
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
        fn()
        print(f"PASS {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}", flush=True)


def e1_wide_ax1(L):
    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    x = jnp.arange(8 * L, dtype=I32).reshape(8, L)
    idx = (x * 7 + 3) % L
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, L), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    assert (np.asarray(out) == ref).all(), "wrong values"


def e2_wide_fetch_timing(S):
    """Timed: one wide ax1 (lane = slot*128+lane) + ax0 vs the S-unroll."""
    M = 2048
    L = S * 128

    def kern(cache_ref, slots_ref, rows_ref, lanes_ref, o_ref):
        cache = cache_ref[:]  # [8, S*128] (row-major: row r holds S slots)

        def body(i, c):
            slots, rows, lanes, acc = c
            wide = jnp.broadcast_to(
                (slots * 128 + lanes)[0:1, :], (8, L)
            )  # replicate the 128 wanted lane ids across rows + S-fold lanes
            wide = jnp.concatenate([wide[:, 0:128]] * S, axis=1)
            y = jnp.take_along_axis(cache, wide, axis=1)[:, 0:128]
            z = jnp.take_along_axis(
                y, jnp.broadcast_to(rows[0:1, :], (8, 128)), axis=0
            )
            v = z[0:1, :]
            acc = acc + v
            slots = (slots + (v & 1)) % S
            rows = (rows + 1) % 8
            lanes = (lanes + (v & 7) + 1) % 128
            return slots, rows, lanes, acc

        _, _, _, acc = jax.lax.fori_loop(
            0, M, body,
            (slots_ref[:], rows_ref[:], lanes_ref[:], jnp.zeros((1, 128), I32)),
        )
        o_ref[:] = acc

    cache = jnp.arange(8 * L, dtype=I32).reshape(8, L)
    b = jnp.arange(128, dtype=I32)[None, :]
    slots, rows, lanes = (b * 13) % S, (b * 7) % 8, (b * 29) % 128
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda *a: f(*a))
    jf(cache, slots, rows, lanes).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = jf(cache, slots, rows, lanes)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"  e2 S={S}: {dt/M*1e9:.0f} ns per 128-ray wide fetch", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for L in (256, 512, 1024):
        report(f"E1 wide ax1 [8,{L}]", lambda L=L: e1_wide_ax1(L))
    for S in (8,):
        report(f"E2 wide fetch S={S}", lambda S=S: e2_wide_fetch_timing(S))
