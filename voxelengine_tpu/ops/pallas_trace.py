"""Fused Pallas dense-grid traversal kernels (single-level DDA in VMEM).

Motivation (measured on TPU v5e): XLA lowers per-lane gathers to the scalar
unit at ~30-130 M elements/s with ~2 ms fixed cost per gather op, capping
the XLA-level traversal in :mod:`voxelengine_tpu.ops.trace` at ~0.1 Mrays/s.
These kernels eliminate arbitrary gathers entirely; the whole DDA loop
(advance, hit bookkeeping, lane predication) runs in one kernel — no
per-step kernel launches, no HBM traffic, no scalar-unit gathers.  Two
fetch engines, identical results:

* :func:`trace_grid_vpu` (default since round 4) — the packed words live
  in VMEM as an i32 [rows, 128] table; each step fetches by the grouped
  chained-``take_along_axis`` pair-gather (:func:`_fetch_table`, the
  idiom proven in :mod:`voxelengine_tpu.ops.pallas_bigtrace`).  Honest
  on-device sustained at 1M rays / 64^3 (chained + jittered +
  checksummed): **35-39 Mrays/s** at the measured tile basin (8k-32k
  rays/tile; the auto default picks 32768 for batches that large).
* :func:`trace_grid_mxu` — each step fetches every ray's 128-word *row*
  with an exact one-hot bf16 matmul (four 8-bit limbs; a one-hot row has
  a single 1, so all products/sums are exact in bf16), then selects the
  word by a masked lane reduction.  Same harness: **1.7 Mrays/s** — the
  cost is NOT the matmuls but the four [B, 128] masked reductions
  (~128 vregs each) per step.  Kept as the cross-check variant and for
  grids too large for the VPU fetch's static block unroll.

Suitable for dense grids whose packed words fit VMEM (config-2 scale:
64^3 .. ~160^3); larger worlds belong in the brickmap
(:mod:`voxelengine_tpu.ops.pallas_bigtrace`).

Semantics match :func:`voxelengine_tpu.ops.trace.trace_grid` (same
tie-breaking, edge padding, world clip, step budget; reference
``VolumeRaytracer.cu:176-352``) and are asserted so in tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxelengine_tpu.config import FLT_EPS_DDA, MAX_STEPS
from voxelengine_tpu.core.bitgrid import BitGrid
from voxelengine_tpu.core.layout import Layout
from voxelengine_tpu.ops.aabb import ray_aabb
from voxelengine_tpu.ops.trace import TraceOut, _axis_pick3, _edge_pad, _normalize

F32 = jnp.float32
I32 = jnp.int32
BIG = 3.4e38  # inf stand-in (python float so kernels capture no tracers)


def words_to_limb_rows(words: jax.Array) -> jax.Array:
    """uint32[W] -> bf16[4, W/128, 128]: 8-bit limb row tables (per scene).

    W is padded to a multiple of 128.
    """
    w = words.astype(jnp.uint32)
    padn = (-w.shape[0]) % 128
    if padn:
        w = jnp.concatenate([w, jnp.zeros((padn,), jnp.uint32)])
    rows = w.reshape(-1, 128)
    return jnp.stack(
        [((rows >> s) & 0xFF).astype(jnp.bfloat16) for s in (0, 8, 16, 24)], axis=0
    )


def _fetch_words(limbs, r_idx, c_idx, num_rows: int):
    """words[b] = table[r_idx[b] * 128 + c_idx[b]] for b in [B].

    ``limbs``: bf16[4, R, 128].  One-hot row fetch on the MXU + masked lane
    reduction for the in-row select.  Exact for uint32 (8-bit limbs).
    """
    b = r_idx.shape[0]
    oh = (
        r_idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (b, num_rows), 1)
    ).astype(jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 1)
    sel = lane == c_idx[:, None]
    out = jnp.zeros((b,), jnp.int32)
    for li, sh in enumerate((0, 8, 16, 24)):
        rows = jnp.dot(oh, limbs[li], preferred_element_type=jnp.float32)  # [B,128]
        v = jnp.sum(jnp.where(sel, rows, 0.0), axis=1)
        # int32 reconstruction (Mosaic has no f32->u32 cast); bit tests on
        # int32 are unaffected by the sign bit
        out = out | (v.astype(jnp.int32) << sh)
    return out


def _grid_kernel(
    limbs_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    act_ref, padx_ref, pady_ref, padz_ref,
    hit_ref, px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref, steps_ref,
    *,
    dims,
    layout: Layout,
    max_steps: int,
    num_rows: int,
):
    X, Y, Z = dims
    limbs = limbs_ref[:]
    sx, sy, sz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    padx, pady, padz = padx_ref[:], pady_ref[:], padz_ref[:]

    stx = jnp.where(dx > 0.0, 1, -1)
    sty = jnp.where(dy > 0.0, 1, -1)
    stz = jnp.where(dz > 0.0, 1, -1)
    tdx = jnp.where(dx != 0.0, jnp.abs(1.0 / dx), BIG)
    tdy = jnp.where(dy != 0.0, jnp.abs(1.0 / dy), BIG)
    tdz = jnp.where(dz != 0.0, jnp.abs(1.0 / dz), BIG)
    cx = sx.astype(I32)
    cy = sy.astype(I32)
    cz = sz.astype(I32)
    tx0 = jnp.where(dx != 0.0, ((cx + (stx > 0)).astype(F32) - sx) / dx, BIG)
    ty0 = jnp.where(dy != 0.0, ((cy + (sty > 0)).astype(F32) - sy) / dy, BIG)
    tz0 = jnp.where(dz != 0.0, ((cz + (stz > 0)).astype(F32) - sz) / dz, BIG)

    if layout is Layout.LINEAR:
        def bit_of(x, y, z):
            return x + y * X + z * (X * Y)
    else:  # TILED_LINEAR
        tX, tY = X // 8, Y // 8
        def bit_of(x, y, z):
            tile = (x >> 3) + (y >> 3) * tX + (z >> 3) * (tX * tY)
            return tile * 512 + (x & 7) + ((y & 7) << 3) + ((z & 7) << 6)

    def body(carry):
        # NB: bool (i1) vectors can't be while-loop carries in Mosaic; the
        # active/hit masks travel as int32 0/1
        (active_i, hit_i, steps, cx, cy, cz, tx, ty, tz, px, py, pz, nx, ny, nz) = carry
        active = active_i != 0
        in_range = (
            (cx >= 0) & (cx < X + padx)
            & (cy >= 0) & (cy < Y + pady)
            & (cz >= 0) & (cz < Z + padz)
        )
        clx = jnp.clip(cx, 0, X - 1)
        cly = jnp.clip(cy, 0, Y - 1)
        clz = jnp.clip(cz, 0, Z - 1)
        bit = bit_of(clx, cly, clz)
        w = jnp.where(active, bit >> 5, 0)
        word = _fetch_words(limbs, w >> 7, w & 127, num_rows)
        occ = (((word >> (bit & 31)) & 1) == 1) & in_range

        this_hit = active & occ
        this_miss = active & ~in_range
        adv = active & ~this_hit & ~this_miss

        ax, ay, az = _axis_pick3(tx, ty, tz)
        tcross = jnp.where(ax, tx, jnp.where(ay, ty, tz))
        ix = jnp.where(ax, (cx + (stx > 0)).astype(F32), sx + tcross * dx)
        iy = jnp.where(ay, (cy + (sty > 0)).astype(F32), sy + tcross * dy)
        iz = jnp.where(az, (cz + (stz > 0)).astype(F32), sz + tcross * dz)

        cx = jnp.where(adv & ax, cx + stx, cx)
        cy = jnp.where(adv & ay, cy + sty, cy)
        cz = jnp.where(adv & az, cz + stz, cz)
        tx = jnp.where(adv & ax, tx + tdx, tx)
        ty = jnp.where(adv & ay, ty + tdy, ty)
        tz = jnp.where(adv & az, tz + tdz, tz)
        px = jnp.where(adv, ix, px)
        py = jnp.where(adv, iy, py)
        pz = jnp.where(adv, iz, pz)
        nx = jnp.where(adv, jnp.where(ax, stx.astype(F32), 0.0), nx)
        ny = jnp.where(adv, jnp.where(ay, sty.astype(F32), 0.0), ny)
        nz = jnp.where(adv, jnp.where(az, stz.astype(F32), 0.0), nz)
        steps = steps + jnp.where(adv, 1, 0)
        active = adv & (steps < max_steps)
        hit_i2 = hit_i | this_hit.astype(I32)
        return (active.astype(I32), hit_i2, steps, cx, cy, cz, tx, ty, tz, px, py, pz, nx, ny, nz)

    b = sx.shape[0]
    zero = jnp.zeros((b,), F32)
    init = (
        act_ref[:],
        jnp.zeros((b,), I32),
        jnp.zeros((b,), I32),
        cx, cy, cz, tx0, ty0, tz0,
        sx, sy, sz,
        zero, zero, zero,
    )
    out = jax.lax.while_loop(lambda c: jnp.any(c[0] != 0), body, init)
    (_, hit, steps, cx, cy, cz, tx, ty, tz, px, py, pz, nx, ny, nz) = out
    hit_ref[:] = hit
    px_ref[:] = px
    py_ref[:] = py
    pz_ref[:] = pz
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    steps_ref[:] = steps


@functools.partial(jax.jit, static_argnames=("max_steps", "tile", "interpret"))
def trace_grid_mxu(
    grid: BitGrid,
    origins,
    rays,
    max_steps: int = MAX_STEPS,
    tile: int = 1024,
    interpret: bool = False,
) -> TraceOut:
    """Single-level dense-grid trace fused on the MXU/VPU (see module doc).

    Matches :func:`voxelengine_tpu.ops.trace.trace_grid` semantics; grids
    must fit VMEM (packed words + bf16 limb tables; ~0.3 MB at 64^3).
    """
    X, Y, Z = grid.dims
    gdims = jnp.asarray([X, Y, Z], I32)
    layout = grid.layout
    if layout is Layout.TILED_MORTON:
        grid = BitGrid.from_dense(grid.to_dense(), Layout.LINEAR)
        layout = Layout.LINEAR
    limbs = words_to_limb_rows(grid.words)
    num_rows = limbs.shape[1]

    origins = jnp.asarray(origins, F32)
    d = _normalize(jnp.asarray(rays, F32))
    n = origins.shape[0]

    start = origins
    inside = jnp.all((start >= 0.0) & (start < gdims.astype(F32)), axis=-1)
    eps = jnp.float32(FLT_EPS_DDA)
    whit, _, wpt, wnrm = ray_aabb(start, d, jnp.full((3,), eps), gdims.astype(F32) - eps)
    start = jnp.where(inside[:, None], start, jnp.where(whit[:, None], wpt, start))
    start_normal = jnp.where(inside[:, None], 0.0, wnrm)
    active0 = (inside | whit).astype(I32)
    pad = _edge_pad(start.astype(I32), gdims, d)

    padn = (-n) % tile

    def pad1(a, fill=0):
        if padn == 0:
            return a
        return jnp.concatenate([a, jnp.full((padn,), fill, a.dtype)])

    ins = [
        pad1(start[:, 0]), pad1(start[:, 1]), pad1(start[:, 2]),
        pad1(d[:, 0], 1.0), pad1(d[:, 1], 1.0), pad1(d[:, 2], 1.0),
        pad1(active0), pad1(pad[:, 0]), pad1(pad[:, 1]), pad1(pad[:, 2]),
    ]
    ntiles = (n + padn) // tile

    ray_spec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 10,
        out_specs=[ray_spec] * 8,
    )
    kern = functools.partial(
        _grid_kernel,
        dims=(X, Y, Z),
        layout=layout,
        max_steps=max_steps,
        num_rows=num_rows,
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n + padn,), I32)]
        + [jax.ShapeDtypeStruct((n + padn,), F32)] * 6
        + [jax.ShapeDtypeStruct((n + padn,), I32)],
        interpret=interpret,
    )(limbs, *ins)

    hit = outs[0][:n] != 0
    pos = jnp.stack([o[:n] for o in outs[1:4]], axis=-1)
    nrm = jnp.stack([o[:n] for o in outs[4:7]], axis=-1)
    steps = outs[7][:n]
    zero_step = hit & (steps == 0)
    pos = jnp.where(zero_step[:, None], start, pos)
    nrm = jnp.where(zero_step[:, None], start_normal, nrm)
    return TraceOut(hit=hit, position=pos, normal=nrm, steps=steps)


def words_to_rows_i32(words: jax.Array) -> jax.Array:
    """uint32[W] -> int32[R, 128] row table, R padded to a multiple of 8.

    The VPU fetch slices the table in [8, 128] vreg blocks, so the row
    count must be vreg-aligned.  Bit tests on int32 are unaffected by the
    sign bit (same reconstruction argument as :func:`_fetch_words`).
    """
    w = words.astype(jnp.uint32)
    padn = (-w.shape[0]) % 1024
    if padn:
        w = jnp.concatenate([w, jnp.zeros((padn,), jnp.uint32)])
    return w.astype(jnp.int32).reshape(-1, 128)


def _fetch_table(table, row, lane, nblocks: int):
    """vals[i, j] = table[row[i, j], lane[i, j]] from a VMEM-resident
    [8*nblocks, 128] i32 table.

    The grouped replicated pair-gather idiom of
    :func:`voxelengine_tpu.ops.pallas_bigtrace._fetch_pass`, with the line-
    cache slot select replaced by a static unroll over the table's [8, 128]
    vreg blocks: per 128-ray group the (row & 7, lane) indices are broadcast
    across sublanes, each block does an ``ax1`` x ``ax0`` ``take_along_axis``
    pair-gather, and a masked select picks the ray's block (``row >> 3``).
    ~2 wide vreg-ops per (group, block): ~17 ops/block for a 1024-ray tile —
    vs the ~2000-op [B, 128] masked reductions of the MXU one-hot fetch
    (:func:`_fetch_words`), which is why this path measures ~10x faster on
    dense grids whose tables stay small (see :func:`trace_grid_vpu`).
    """
    R = row.shape[0]
    blk = row >> 3
    sub8 = row & 7
    subi = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    out = jnp.zeros((R, 128), I32)
    for g in range(R):
        lane_rep = jnp.broadcast_to(lane[g, :][None, :], (8, 128))
        row_rep = jnp.broadcast_to(sub8[g, :][None, :], (8, 128))
        b = blk[g, :][None, :]
        acc = jnp.zeros((1, 128), I32)
        for c in range(nblocks):
            y = jnp.take_along_axis(table[c * 8:(c + 1) * 8, :], lane_rep, axis=1)
            z = jnp.take_along_axis(y, row_rep, axis=0)
            acc = jnp.where(b == c, z[0:1, :], acc)
        out = jnp.where(subi == g, jnp.broadcast_to(acc, (R, 128)), out)
    return out


def _grid_kernel_vpu(
    table_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    act_ref, padx_ref, pady_ref, padz_ref,
    hit_ref, px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref, steps_ref,
    *,
    dims,
    layout: Layout,
    max_steps: int,
    nblocks: int,
):
    """Dense-grid DDA with the VPU pair-gather fetch; state is [R, 128]
    (native vreg form) instead of the MXU kernel's 1D arrays.  DDA semantics
    are identical to :func:`_grid_kernel` (shared `_axis_pick3` tie-break,
    edge padding, step budget)."""
    X, Y, Z = dims
    table = table_ref[:]
    sx, sy, sz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    padx, pady, padz = padx_ref[:], pady_ref[:], padz_ref[:]

    stx = jnp.where(dx > 0.0, 1, -1)
    sty = jnp.where(dy > 0.0, 1, -1)
    stz = jnp.where(dz > 0.0, 1, -1)
    tdx = jnp.where(dx != 0.0, jnp.abs(1.0 / dx), BIG)
    tdy = jnp.where(dy != 0.0, jnp.abs(1.0 / dy), BIG)
    tdz = jnp.where(dz != 0.0, jnp.abs(1.0 / dz), BIG)
    cx = sx.astype(I32)
    cy = sy.astype(I32)
    cz = sz.astype(I32)
    tx0 = jnp.where(dx != 0.0, ((cx + (stx > 0)).astype(F32) - sx) / dx, BIG)
    ty0 = jnp.where(dy != 0.0, ((cy + (sty > 0)).astype(F32) - sy) / dy, BIG)
    tz0 = jnp.where(dz != 0.0, ((cz + (stz > 0)).astype(F32) - sz) / dz, BIG)

    if layout is Layout.LINEAR:
        def bit_of(x, y, z):
            return x + y * X + z * (X * Y)
    else:  # TILED_LINEAR
        tX, tY = X // 8, Y // 8
        def bit_of(x, y, z):
            tile = (x >> 3) + (y >> 3) * tX + (z >> 3) * (tX * tY)
            return tile * 512 + (x & 7) + ((y & 7) << 3) + ((z & 7) << 6)

    def body(carry):
        (active_i, hit_i, steps, cx, cy, cz, tx, ty, tz, px, py, pz, nx, ny, nz) = carry
        active = active_i != 0
        in_range = (
            (cx >= 0) & (cx < X + padx)
            & (cy >= 0) & (cy < Y + pady)
            & (cz >= 0) & (cz < Z + padz)
        )
        clx = jnp.clip(cx, 0, X - 1)
        cly = jnp.clip(cy, 0, Y - 1)
        clz = jnp.clip(cz, 0, Z - 1)
        bit = bit_of(clx, cly, clz)
        w = jnp.where(active, bit >> 5, 0)
        word = _fetch_table(table, w >> 7, w & 127, nblocks)
        occ = (((word >> (bit & 31)) & 1) == 1) & in_range

        this_hit = active & occ
        this_miss = active & ~in_range
        adv = active & ~this_hit & ~this_miss

        ax, ay, az = _axis_pick3(tx, ty, tz)
        tcross = jnp.where(ax, tx, jnp.where(ay, ty, tz))
        ix = jnp.where(ax, (cx + (stx > 0)).astype(F32), sx + tcross * dx)
        iy = jnp.where(ay, (cy + (sty > 0)).astype(F32), sy + tcross * dy)
        iz = jnp.where(az, (cz + (stz > 0)).astype(F32), sz + tcross * dz)

        cx = jnp.where(adv & ax, cx + stx, cx)
        cy = jnp.where(adv & ay, cy + sty, cy)
        cz = jnp.where(adv & az, cz + stz, cz)
        tx = jnp.where(adv & ax, tx + tdx, tx)
        ty = jnp.where(adv & ay, ty + tdy, ty)
        tz = jnp.where(adv & az, tz + tdz, tz)
        px = jnp.where(adv, ix, px)
        py = jnp.where(adv, iy, py)
        pz = jnp.where(adv, iz, pz)
        nx = jnp.where(adv, jnp.where(ax, stx.astype(F32), 0.0), nx)
        ny = jnp.where(adv, jnp.where(ay, sty.astype(F32), 0.0), ny)
        nz = jnp.where(adv, jnp.where(az, stz.astype(F32), 0.0), nz)
        steps = steps + jnp.where(adv, 1, 0)
        active = adv & (steps < max_steps)
        hit_i2 = hit_i | this_hit.astype(I32)
        return (active.astype(I32), hit_i2, steps, cx, cy, cz, tx, ty, tz, px, py, pz, nx, ny, nz)

    shp = sx.shape
    zero = jnp.zeros(shp, F32)
    init = (
        act_ref[:],
        jnp.zeros(shp, I32),
        jnp.zeros(shp, I32),
        cx, cy, cz, tx0, ty0, tz0,
        sx, sy, sz,
        zero, zero, zero,
    )
    out = jax.lax.while_loop(lambda c: jnp.any(c[0] != 0), body, init)
    (_, hit, steps, cx, cy, cz, tx, ty, tz, px, py, pz, nx, ny, nz) = out
    hit_ref[:] = hit
    px_ref[:] = px
    py_ref[:] = py
    pz_ref[:] = pz
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    steps_ref[:] = steps


@functools.partial(jax.jit, static_argnames=("max_steps", "tile", "interpret"))
def trace_grid_vpu(
    grid: BitGrid,
    origins,
    rays,
    max_steps: int = MAX_STEPS,
    tile: Optional[int] = None,
    interpret: bool = False,
) -> TraceOut:
    """Single-level dense-grid trace with the VPU pair-gather fetch.

    Same semantics as :func:`trace_grid_mxu` / `ops.trace.trace_grid`
    (reference ``VolumeRaytracer.cu:176-352``), different fetch engine:
    the packed words sit in VMEM as an i32 [rows, 128] table and each DDA
    step fetches by chained ``take_along_axis`` (see :func:`_fetch_table`)
    instead of one-hot MXU matmuls.  Honest on-device sustained measurement
    (1M-ray batches, chained + jittered + checksummed): the MXU fetch costs
    ~2-3 us per 1024-ray tile iteration — dominated by four [B, 128] masked
    reductions, not the matmuls — while this fetch is ~17 wide vreg-ops per
    table block.  The fetch unrolls over the table's [8, 128] blocks, so
    cost scales with grid size: wins below ~128 table rows (~160^3 cells);
    above that the grid belongs in a brickmap anyway
    (:func:`voxelengine_tpu.ops.pallas_bigtrace.trace_brickmap_hbm`).
    """
    if tile is None:
        # measured tile sweep (1M rays, 64^3, v5e): 1024 -> 13.9 Mrays/s,
        # 2048 -> 25.0, 4096 -> 30.8, 8192 -> 35.3, 16384 -> 37.9,
        # 32768 -> 39.4 (identical checksums): per-tile fixed overhead
        # dominates below ~8k rays/tile and the basin keeps rising to 32k
        # (per-ray state at 32k is ~2 MB VMEM — nowhere near the budget;
        # the lockstep cost of a wider max is measured smaller than the
        # per-tile overhead it removes on short dense-grid walks).
        # Small batches keep the tile at the batch size (padding waste).
        n0 = jnp.shape(jnp.asarray(origins))[0]
        tile = min(32768, max(1024, -(-n0 // 1024) * 1024))
    assert tile % 1024 == 0, (
        "tile must be a multiple of 1024: ray blocks are [tile/128, 128] "
        "and Mosaic requires the sublane dim divisible by 8"
    )
    X, Y, Z = grid.dims
    gdims = jnp.asarray([X, Y, Z], I32)
    layout = grid.layout
    if layout is Layout.TILED_MORTON:
        grid = BitGrid.from_dense(grid.to_dense(), Layout.LINEAR)
        layout = Layout.LINEAR
    table = words_to_rows_i32(grid.words)
    nblocks = table.shape[0] // 8

    origins = jnp.asarray(origins, F32)
    d = _normalize(jnp.asarray(rays, F32))
    n = origins.shape[0]

    start = origins
    inside = jnp.all((start >= 0.0) & (start < gdims.astype(F32)), axis=-1)
    eps = jnp.float32(FLT_EPS_DDA)
    whit, _, wpt, wnrm = ray_aabb(start, d, jnp.full((3,), eps), gdims.astype(F32) - eps)
    start = jnp.where(inside[:, None], start, jnp.where(whit[:, None], wpt, start))
    start_normal = jnp.where(inside[:, None], 0.0, wnrm)
    active0 = (inside | whit).astype(I32)
    pad = _edge_pad(start.astype(I32), gdims, d)

    padn = (-n) % tile

    def pad2(a, fill=0):
        if padn:
            a = jnp.concatenate([a, jnp.full((padn,), fill, a.dtype)])
        return a.reshape(-1, 128)

    ins = [
        pad2(start[:, 0]), pad2(start[:, 1]), pad2(start[:, 2]),
        pad2(d[:, 0], 1.0), pad2(d[:, 1], 1.0), pad2(d[:, 2], 1.0),
        pad2(active0), pad2(pad[:, 0]), pad2(pad[:, 1]), pad2(pad[:, 2]),
    ]
    ntiles = (n + padn) // tile
    R = tile // 128

    ray_spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 10,
        out_specs=[ray_spec] * 8,
    )
    kern = functools.partial(
        _grid_kernel_vpu,
        dims=(X, Y, Z),
        layout=layout,
        max_steps=max_steps,
        nblocks=nblocks,
    )
    nrows = (n + padn) // 128
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nrows, 128), I32)]
        + [jax.ShapeDtypeStruct((nrows, 128), F32)] * 6
        + [jax.ShapeDtypeStruct((nrows, 128), I32)],
        interpret=interpret,
    )(table, *ins)

    outs = [o.reshape(-1)[:n] for o in outs]
    hit = outs[0] != 0
    pos = jnp.stack(outs[1:4], axis=-1)
    nrm = jnp.stack(outs[4:7], axis=-1)
    steps = outs[7]
    zero_step = hit & (steps == 0)
    pos = jnp.where(zero_step[:, None], start, pos)
    nrm = jnp.where(zero_step[:, None], start_normal, nrm)
    return TraceOut(hit=hit, position=pos, normal=nrm, steps=steps)
