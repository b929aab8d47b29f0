"""Fused Pallas traversal kernels.

Motivation (measured on TPU v5e): XLA lowers per-lane gathers to the scalar
unit at ~30-130 M elements/s with ~2 ms fixed cost per gather op, capping
the XLA-level traversal in :mod:`voxelengine_tpu.ops.trace` at ~0.1 Mrays/s.
These kernels eliminate arbitrary gathers entirely:

* the packed occupancy words live in VMEM as rows of 128 words; each DDA
  step fetches every ray's current *row* with an exact one-hot bf16 matmul
  on the MXU (four 8-bit limbs — a one-hot row has a single 1, so all
  products/sums are exact in bf16) at full 128-lane utilization;
* the word within the row is selected by a masked lane reduction (VPU);
* the whole DDA loop (advance, hit bookkeeping, lane predication) runs in
  one kernel with ray state as 1D register arrays — no per-step kernel
  launches, no HBM traffic, no scalar-unit gathers.

Per-iteration fetch cost is ``8 * B * R * 128`` flops for B rays over a
word table of R rows: ~67 MFLOP/step for a 64^3 grid (R = 64) at B = 1024 —
microseconds on the MXU.  Suitable for dense grids whose packed words fit
VMEM (config-2 scale: 64^3 .. ~160^3).

Semantics match :func:`voxelengine_tpu.ops.trace.trace_grid` (same
tie-breaking, edge padding, world clip, step budget; reference
``VolumeRaytracer.cu:176-352``) and are asserted so in tests.
"""

from __future__ import annotations

import functools

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
