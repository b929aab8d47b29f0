"""Probe set D: bisect the C1 Mosaic compile failure.

C1 (grouped pair-gather with slot unroll) fails with an internal Mosaic
error; its ingredients passed individually.  Isolate which combination
breaks: chained ax1+ax0 gathers, gathers-from-slices, the 128-lane
subslice of a [1024] vector, or the index-mutating fori.
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
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def run1(kern, out_shape, *args):
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def d1_chain():
    # ax1 then ax0 on the result
    def kern(x_ref, a_ref, b_ref, o_ref):
        y = jnp.take_along_axis(x_ref[:], a_ref[:], axis=1)
        o_ref[:] = jnp.take_along_axis(y, b_ref[:], axis=0)

    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    a = (x * 3 + 1) % 128
    b = (x * 5 + 2) % 8
    out = run1(kern, jax.ShapeDtypeStruct((8, 128), I32), x, a, b)
    ref = np.take_along_axis(
        np.take_along_axis(np.asarray(x), np.asarray(a), axis=1), np.asarray(b), axis=0
    )
    assert (np.asarray(out) == ref).all()


def d2_gather_from_slice():
    # gather whose operand is a static slice of a larger vector
    def kern(x_ref, a_ref, o_ref):
        sub = x_ref[:][8:16, :]
        o_ref[:] = jnp.take_along_axis(sub, a_ref[:], axis=1)

    x = jnp.arange(32 * 128, dtype=I32).reshape(32, 128)
    a = (jnp.arange(8 * 128, dtype=I32).reshape(8, 128) * 3 + 1) % 128
    out = run1(kern, jax.ShapeDtypeStruct((8, 128), I32), x, a)
    ref = np.take_along_axis(np.asarray(x)[8:16], np.asarray(a), axis=1)
    assert (np.asarray(out) == ref).all()


def d3_gather_bcast_index():
    # index operand is a broadcast of a [128] slice of a [1024] vector
    def kern(x_ref, v_ref, o_ref):
        la = v_ref[:][128:256]
        rep = jnp.broadcast_to(la[None, :], (8, 128))
        o_ref[:] = jnp.take_along_axis(x_ref[:], rep, axis=1)

    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    v = (jnp.arange(1024, dtype=I32) * 3 + 1) % 128
    out = run1(kern, jax.ShapeDtypeStruct((8, 128), I32), x, v)
    ref = np.take_along_axis(
        np.asarray(x), np.broadcast_to(np.asarray(v)[128:256][None, :], (8, 128)), axis=1
    )
    assert (np.asarray(out) == ref).all()


def d4_full_group_once():
    # one group, S=2 slots, no loop: the minimal C1 shape
    def kern(cache_ref, sl_ref, ro_ref, la_ref, o_ref):
        cache = cache_ref[:]
        sl, ro, la = sl_ref[:], ro_ref[:], la_ref[:]
        lane_rep = jnp.broadcast_to(la[None, :], (8, 128))
        row_rep = jnp.broadcast_to(ro[None, :], (8, 128))
        acc = jnp.zeros((128,), I32)
        for s in range(2):
            y = jnp.take_along_axis(cache[s * 8 : (s + 1) * 8, :], lane_rep, axis=1)
            z = jnp.take_along_axis(y, row_rep, axis=0)
            acc = jnp.where(sl == s, z[0, :], acc)
        o_ref[:] = acc

    cache = jnp.arange(16 * 128, dtype=I32).reshape(16, 128)
    b = jnp.arange(128, dtype=I32)
    sl, ro, la = (b * 13) % 2, (b * 7) % 8, (b * 29) % 128
    out = run1(kern, jax.ShapeDtypeStruct((128,), I32), cache, sl, ro, la)
    ref = np.asarray(cache).reshape(2, 8, 128)[np.asarray(sl), np.asarray(ro), np.asarray(la)]
    assert (np.asarray(out) == ref).all()


def d5_row_extract():
    # is z[0, :] (extracting row 0 of an [8,128]) the problem?
    def kern(x_ref, b_ref, o_ref):
        z = jnp.take_along_axis(x_ref[:], b_ref[:], axis=0)
        o_ref[:] = z[0, :]

    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    b = (x * 5 + 2) % 8
    out = run1(kern, jax.ShapeDtypeStruct((128,), I32), x, b)
    ref = np.take_along_axis(np.asarray(x), np.asarray(b), axis=0)[0]
    assert (np.asarray(out) == ref).all()


def d6_fori_mutating_idx():
    # fori loop with gather whose indices are carried and mutated
    def kern(x_ref, a_ref, o_ref):
        def body(i, c):
            a, acc = c
            y = jnp.take_along_axis(x_ref[:], a, axis=1)
            return (a + (y & 3) + 1) % 128, acc + y

        _, acc = jax.lax.fori_loop(0, 64, body, (a_ref[:], jnp.zeros((8, 128), I32)))
        o_ref[:] = acc

    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    a = (x * 3 + 1) % 128
    run1(kern, jax.ShapeDtypeStruct((8, 128), I32), x, a)


def d7_1024_reshape_group():
    # [1024] -> reshape (8,128) -> use row g as lanes (C1 uses flat slices)
    def kern(x_ref, v_ref, o_ref):
        m = v_ref[:].reshape(8, 128)
        la = m[1, :]
        rep = jnp.broadcast_to(la[None, :], (8, 128))
        o_ref[:] = jnp.take_along_axis(x_ref[:], rep, axis=1)

    x = jnp.arange(8 * 128, dtype=I32).reshape(8, 128)
    v = (jnp.arange(1024, dtype=I32) * 3 + 1) % 128
    out = run1(kern, jax.ShapeDtypeStruct((8, 128), I32), x, v)
    ref = np.take_along_axis(
        np.asarray(x),
        np.broadcast_to(np.asarray(v).reshape(8, 128)[1][None, :], (8, 128)),
        axis=1,
    )
    assert (np.asarray(out) == ref).all()


def _fetch_pass(cache, slots, rows, lanes, S, G=8):
    outs = []
    for g in range(G):
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


def d8_pass_once(S, G):
    def kern(cache_ref, slots_ref, rows_ref, lanes_ref, o_ref):
        o_ref[:] = _fetch_pass(cache_ref[:], slots_ref[:], rows_ref[:], lanes_ref[:], S, G)

    n = G * 128
    cache = jnp.arange(S * 8 * 128, dtype=I32).reshape(S * 8, 128)
    b = jnp.arange(n, dtype=I32)
    slots, rows, lanes = (b * 13) % S, (b * 7) % 8, (b * 29) % 128
    out = run1(kern, jax.ShapeDtypeStruct((n,), I32), cache, slots, rows, lanes)
    ref = np.asarray(cache).reshape(S, 8, 128)[np.asarray(slots), np.asarray(rows), np.asarray(lanes)]
    assert (np.asarray(out) == ref).all()


def d9_pass_in_fori(S, G):
    def kern(cache_ref, slots_ref, rows_ref, lanes_ref, o_ref):
        cache = cache_ref[:]

        def body(i, c):
            slots, rows, lanes, acc = c
            vals = _fetch_pass(cache, slots, rows, lanes, S, G)
            return (slots + (vals & 1)) % S, (rows + 1) % 8, (lanes + 3) % 128, acc + vals

        _, _, _, acc = jax.lax.fori_loop(
            0, 64, body,
            (slots_ref[:], rows_ref[:], lanes_ref[:], jnp.zeros((G * 128,), I32)),
        )
        o_ref[:] = acc

    n = G * 128
    cache = jnp.arange(S * 8 * 128, dtype=I32).reshape(S * 8, 128)
    b = jnp.arange(n, dtype=I32)
    slots, rows, lanes = (b * 13) % S, (b * 7) % 8, (b * 29) % 128
    run1(kern, jax.ShapeDtypeStruct((n,), I32), cache, slots, rows, lanes)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    report("D1 ax1->ax0 chain [8,128]", d1_chain)
    report("D2 gather from static slice", d2_gather_from_slice)
    report("D3 bcast [128]-slice index", d3_gather_bcast_index)
    report("D4 one group S=2 minimal C1", d4_full_group_once)
    report("D5 row-0 extract after ax0", d5_row_extract)
    report("D6 fori with mutated gather idx", d6_fori_mutating_idx)
    report("D7 reshape(8,128) row as lanes", d7_1024_reshape_group)
    for S, G in ((2, 1), (8, 1), (2, 8), (8, 8), (16, 8)):
        report(f"D8 full pass once S={S} G={G}", lambda S=S, G=G: d8_pass_once(S, G))
    for S, G in ((2, 1), (8, 8)):
        report(f"D9 pass in fori S={S} G={G}", lambda S=S, G=G: d9_pass_in_fori(S, G))
