"""HBM-scale two-level brickmap traversal as one fused Pallas kernel.

The flagship-path kernel for worlds far beyond VMEM (the reference's
demonstrated 8192 x 512 x 8192 terrain, ``/root/reference/README.md:29-31``):
the TPU-native replacement for the reference's per-pixel megakernel
(``VolumeRaytracer.cu:354-525`` + ``Renderer.cu:179-276``).  The XLA
traversal in :mod:`voxelengine_tpu.ops.trace` is gather-bound (~0.5 Mrays/s
at 1080p: XLA lowers per-lane gathers to the scalar core); this kernel keeps
every per-step lookup on the VPU.

Design (constraints established by ``experiments/probe_mosaic_r2*.py``):

* **Line tables in HBM.**  The world is reshaped into 4 KB *lines* of
  ``[8, 128]`` i32 words: one line per 8x8x8-chunk *region* (512 packed
  meta words + 512 brick-slot words) followed by the packed brick words
  (one line per ``factor=32`` brick).  One flat array, one line id space.
* **A VMEM line cache** (``S`` slots, scratch, persistent across the ray-
  tile grid) refilled by scalar-indexed async DMA on miss (~0.06-4 us per
  4 KB line; misses are voted: min wanted line id among stalled rays).
* **Gather-only fetch.**  Per step each ray needs one word
  ``cache[slot, row, lane]``.  Mosaic's ``dynamic_gather`` reaches one
  vreg: for each 128-ray group the (row, lane) indices are replicated
  across sublanes, then ``ax1`` x ``ax0`` ``take_along_axis`` fetch
  ``line[row[j], lane[j]]`` per lane j — unrolled over the S cache slots
  with a masked select.  No scalar-core work on the hot path.
* **Macro skip.**  A 1-bit-per-region occupancy table (static VMEM vreg)
  lets rays in empty regions advance region-by-region: the coarse DDA is
  re-seeded at the region exit and the step budget is charged the exact
  L1 chunk distance, so hits match the plain chunk-by-chunk walk.
* **Deferred descend.**  Entering an occupied chunk needs the brick-slot
  word (same line, +4 rows): the descend is split over two iterations
  (meta fetch -> slot fetch) carrying the meta word in a register, so every
  iteration performs exactly one fetch per ray.

Semantics (tie-breaking, edge padding, tight-AABB pruning, resume-on-ascend,
degenerate start hits) match :func:`voxelengine_tpu.ops.trace.trace_brickmap`
and are asserted in tests; the reference algorithm is
``VolumeRaytracer.cu:176-525``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxelengine_tpu.config import FLT_EPS_DDA, MAX_STEPS
from voxelengine_tpu.core.brickmap import BrickMap
from voxelengine_tpu.core.layout import Layout, _morton3d_8
from voxelengine_tpu.ops.aabb import ray_aabb
from voxelengine_tpu.ops.trace import TraceOut, _axis_pick3, _edge_pad, _normalize

F32 = jnp.float32
I32 = jnp.int32
BIG = 3.4e38
NOLINE = 0x7FFFFFFF  # "no line wanted" sentinel (python int: kernels must not capture tracers)
# Macro scalar budgets (SMEM words).  The kernel's select chains are sized
# STATICALLY to the world's actual super-region count, so raising the
# budget costs nothing for small worlds and keeps L2/L3 alive on
# 16k-32k-class worlds (anisotropic grouping: nsr = ceil(rx/4)*ry*ceil(rz/4)).
MACRO2_WORDS = 32  # L2 capacity: 1024 super-regions
MACRO3_WORDS = 4  # L3 capacity: 128 16x1x16-region blocks (128-chunk spans)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LineTable:
    """HBM line-table form of a brickmap (see module doc).

    Holds only the *small* side tables — region lines (packed meta +
    brick-slot words, ~8 MB for the 8k world) and the two macro levels.
    The brick lines are a zero-copy bitcast view of ``bm.bricks`` built
    inside :func:`trace_brickmap_hbm`'s jit, so the table adds no O(world)
    memory (round 1 kept a second full copy of the brick words alive).
    """

    region_lines: jax.Array  # i32[NR * 8, 128]
    macro: jax.Array  # i32[8*ceil(NR/32768), 128] packed region-occupancy bits
    # OPTIONAL materialized brick lines (see materialize_brick_lines):
    # the in-jit "zero-copy" view is NOT free on big worlds — XLA cannot
    # alias the [N, wpb] -> [N*8, 128] reshape (the (8,128) tilings
    # interleave differently), so every trace dispatch materializes ~2x
    # the brick table as HLO temps (21.4 GB at 16k: an OOM; ~3.6 GB of
    # per-frame copy traffic at 8k).  When set, the kernel reads this
    # array directly and the per-dispatch relayout disappears.
    # L2 macro: occupancy of 4x1x4-region slab groups ("super-regions",
    # 32x8x32 chunks — flat, because terrain worlds are shallow), packed
    # into <= MACRO2_WORDS words so the kernel can fetch it with a
    # broadcast-select chain instead of a gather
    # words [0:MACRO2_WORDS] = L2, [MACRO2_WORDS:] = L3 (16^3-region
    # blocks = 128-chunk spans); all-ones words disable a level exactly
    macro2: jax.Array  # i32[MACRO2_WORDS + MACRO3_WORDS] (SMEM scalars)
    num_regions: int = dataclasses.field(metadata=dict(static=True))
    region_dims: Tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    brick_lines: Optional[jax.Array] = None  # i32[NBL * 8, 128] (see above)


def brick_lines_view(bm: BrickMap) -> jax.Array:
    """``bm.bricks`` as i32 brick lines ``[NBL * 8, 128]``.

    NOT free under jit despite being bitcast + reshape: XLA assigns both
    shapes (8,128)-tiled layouts whose physical orders differ (8
    consecutive bricks interleave within a [N, wpb] tile), so each
    dispatch that traces through this view pays a full-table relayout
    copy.  Use :func:`materialize_brick_lines` to pay it once per world.
    """
    if bm.bricks is None:
        raise ValueError(
            "bm.bricks is host-resident (load_world_host_bricks placeholder): "
            "build the lines with host_brick_lines(...) and attach them via "
            "LineTable.brick_lines instead of tracing through the view"
        )
    bw = jax.lax.bitcast_convert_type(bm.bricks.reshape(-1), jnp.int32)
    padw = (-bw.shape[0]) % 1024
    if padw:
        bw = jnp.concatenate([bw, jnp.zeros((padw,), I32)])
    return bw.reshape(-1, 128)


def materialize_brick_lines(bm: BrickMap, lt: LineTable) -> LineTable:
    """Return ``lt`` with the brick-line form of ``bm.bricks`` materialized
    on device (one table-sized copy, paid once instead of per dispatch —
    mandatory at 16k scale where the per-dispatch temps alone exceed HBM).
    ``apply_edits_hbm`` keeps the materialized lines in sync (O(edits))."""
    return dataclasses.replace(lt, brick_lines=jax.jit(brick_lines_view)(bm))


def host_brick_lines(bricks: np.ndarray) -> np.ndarray:
    """Host-numpy twin of :func:`brick_lines_view`: relayout raw brick
    words (``uint32[N, wpb]``, e.g. an ``np.memmap`` of a world cache's
    ``.bricks.npy`` sidecar) into i32 brick lines ``[NBL * 8, 128]``.

    The 16k-class path: a 16384x512x16384 world's brick table (7.6 GB)
    and its line form cannot BOTH be resident on a 16 GB chip, so the
    device-side :func:`materialize_brick_lines` OOMs.  The kernel only
    ever reads the LINE form — so relayout on the host (zero-copy when
    ``N*wpb`` is 1024-aligned, which factor-32 bricks always are) and
    upload the lines alone; the raw table never touches HBM."""
    bw = bricks.reshape(-1).view(np.int32)
    padw = (-bw.shape[0]) % 1024
    if padw:
        bw = np.concatenate([bw, np.zeros((padw,), np.int32)])
    return bw.reshape(-1, 128)


@jax.jit
def make_line_table(bm: BrickMap) -> LineTable:
    """Build the HBM region-line table + macro occupancy for a brickmap.

    Any coarse layout (C3): non-LINEAR orders (Morton / tiled) are
    gathered into region-record order once at build time — the kernel
    addresses regions by coordinates, so traversal is layout-independent.
    Grid dims are padded up to multiples of 8 with empty chunks; the macro
    occupancy grows in 32768-region vreg blocks (no fixed region cap).
    Jitted: one fused dispatch instead of ~30 eager ops (each paying the
    host<->device tunnel round trip — measured 12 s eager, <1 s jitted;
    cache via :func:`voxelengine_tpu.io.checkpoint.line_table_or_build`).
    """
    from voxelengine_tpu.core.layout import sample_index

    gx, gy, gz = bm.grid_dims
    rx, ry, rz = -(-gx // 8), -(-gy // 8), -(-gz // 8)
    nr = rx * ry * rz
    px, py, pz = rx * 8, ry * 8, rz * 8

    if bm.coarse_layout is Layout.LINEAR:
        lin_meta = bm.meta
        lin_slots = bm.brick_idx
    else:
        zz, yy, xx = jnp.meshgrid(
            jnp.arange(gz), jnp.arange(gy), jnp.arange(gx), indexing="ij"
        )
        src = sample_index(xx, yy, zz, gx, gy, bm.coarse_layout).reshape(-1)
        lin_meta = bm.meta[src]
        lin_slots = bm.brick_idx[src]

    def to_regions(flat, fill):
        a = flat.reshape(gz, gy, gx)
        a = jnp.pad(
            a, ((0, pz - gz), (0, py - gy), (0, px - gx)), constant_values=fill
        )
        # [rz,8, ry,8, rx,8] -> regions (rz,ry,rx) x local (lz,ly,lx)
        a = a.reshape(rz, 8, ry, 8, rx, 8).transpose(0, 2, 4, 1, 3, 5)
        return a.reshape(nr, 512)

    meta_r = to_regions(lin_meta, 0)
    slots_r = to_regions(lin_slots, -1)
    region_lines = (
        jnp.concatenate([meta_r, slots_r], axis=1).reshape(-1, 128)
    )  # [nr*8, 128]

    occ_r = jnp.any((meta_r >> 30) & 1 == 1, axis=1)
    nv = -(-nr // 32768)  # macro vregs (32768 region bits each)
    occ_pad = jnp.concatenate(
        [occ_r, jnp.zeros((nv * 32768 - nr,), jnp.bool_)]
    ).reshape(nv * 1024, 32)
    shifts = jnp.arange(32, dtype=jnp.int32)
    macro_words = jnp.sum(
        jnp.where(occ_pad, jnp.int32(1) << shifts[None, :], 0), axis=1
    ).astype(I32)
    macro = macro_words.reshape(nv * 8, 128)

    # L2: super-region occupancy with ANISOTROPIC 4x1x4-region grouping
    # (32x8x32 chunks, one region-layer thick): terrain worlds are shallow
    # (the 8k scene is 16 chunks tall), so cubic 32-chunk blocks always
    # contain ground and never fire — flat slabs go empty above the
    # surface, exactly where long horizon rays fly.  Only built when it
    # fits the broadcast-select budget; all-occupied otherwise (the
    # kernel then never L2-skips, which is always correct).
    srx, sry, srz = -(-rx // 4), ry, -(-rz // 4)
    nsr = srx * sry * srz
    if nsr <= MACRO2_WORDS * 32:
        occ_grid = occ_r.reshape(rz, ry, rx)
        occ_grid = jnp.pad(
            occ_grid,
            ((0, srz * 4 - rz), (0, 0), (0, srx * 4 - rx)),
        )
        occ_sr = jnp.any(
            occ_grid.reshape(srz, 4, ry, srx, 4).transpose(0, 2, 3, 1, 4)
            .reshape(nsr, 16),
            axis=1,
        )
        occ_sr_pad = jnp.concatenate(
            [occ_sr, jnp.zeros((MACRO2_WORDS * 32 - nsr,), jnp.bool_)]
        ).reshape(MACRO2_WORDS, 32)
        macro2 = jnp.sum(
            jnp.where(occ_sr_pad, jnp.int32(1) << shifts[None, :], 0), axis=1
        ).astype(I32)
        # L3: 16x1x16-region blocks (128x8x128-chunk slab spans), derived
        # from the L2 occupancy (a block = 4x1x4 super-regions); built only
        # when L2 is real AND it fits the scalar budget
        s3x, s3y, s3z = -(-rx // 16), ry, -(-rz // 16)
        ns3 = s3x * s3y * s3z
        if ns3 <= MACRO3_WORDS * 32:
            sg = occ_sr.reshape(srz, sry, srx)
            sg = jnp.pad(
                sg,
                ((0, s3z * 4 - srz), (0, 0), (0, s3x * 4 - srx)),
            )
            occ3 = jnp.any(
                sg.reshape(s3z, 4, sry, s3x, 4).transpose(0, 2, 3, 1, 4)
                .reshape(ns3, 16),
                axis=1,
            )
            occ3 = jnp.concatenate(
                [occ3, jnp.zeros((MACRO3_WORDS * 32 - ns3,), jnp.bool_)]
            ).reshape(MACRO3_WORDS, 32)
            macro3 = jnp.sum(
                jnp.where(occ3, jnp.int32(1) << shifts[None, :], 0), axis=1
            ).astype(I32)
        else:
            macro3 = jnp.full((MACRO3_WORDS,), -1, I32)
        macro2 = jnp.concatenate([macro2, macro3])
    else:
        macro2 = jnp.full((MACRO2_WORDS + MACRO3_WORDS,), -1, I32)  # all occ

    return LineTable(
        region_lines=region_lines,
        macro=macro,
        macro2=macro2,
        num_regions=nr,
        region_dims=(rx, ry, rz),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def apply_edits_hbm(bm: BrickMap, lt: LineTable, x, y, z, value):
    """In-place voxel edits on a brickmap *and* its HBM line table.

    O(edits): K meta-word writes into ``lt.region_lines`` (brick words
    flow through the zero-copy view of ``bm.bricks``) and an
    incremental macro-occupancy refresh of the touched regions (one 512-word
    gather per edit), instead of rebuilding the multi-GB table.  Requires
    ``dense_slots`` (like :func:`voxelengine_tpu.core.brickmap.apply_edits`,
    whose semantics this extends).  Returns ``(bm, lt)``.
    """
    from voxelengine_tpu.core.brickmap import _apply_edits_impl, _edit_coords

    assert bm.dense_slots, "edits require dense_slots brickmaps"
    x = jnp.atleast_1d(jnp.asarray(x))
    y = jnp.atleast_1d(jnp.asarray(y))
    z = jnp.atleast_1d(jnp.asarray(z))
    bm2 = _apply_edits_impl(bm, x, y, z, value)
    ci, word_col, _ = _edit_coords(bm2, x, y, z)
    f = bm2.factor
    gx, gy, gz = bm2.grid_dims
    rx, ry, rz = lt.region_dims
    wpb = bm2.words_per_brick
    nr = lt.num_regions

    cx, cy, cz = x // f, y // f, z // f
    region = (cx >> 3) + rx * ((cy >> 3) + ry * (cz >> 3))
    local = (cx & 7) + ((cy & 7) << 3) + ((cz & 7) << 6)

    # meta word (region record rows 0..3); brick words need no table write
    # — the kernel reads them through the zero-copy view of bm2.bricks
    lines = lt.region_lines.at[
        region * 8 + (local >> 7), local & 127
    ].set(bm2.meta[ci])

    # macro occupancy of the touched regions: OR over their 512 chunk metas
    # (chunk ids of region r: base + dx + gx*dy + gx*gy*dz over the 8^3 cube,
    # clipped chunks can't exist for dense in-range edits)
    dx = jnp.arange(8)[None, :, None, None]
    dy = jnp.arange(8)[None, None, :, None]
    dz = jnp.arange(8)[None, None, None, :]
    base_x = (cx >> 3)[:, None, None, None] * 8 + dx
    base_y = (cy >> 3)[:, None, None, None] * 8 + dy
    base_z = (cz >> 3)[:, None, None, None] * 8 + dz
    from voxelengine_tpu.core.layout import sample_index

    inb = (base_x < gx) & (base_y < gy) & (base_z < gz)
    cid = sample_index(
        jnp.minimum(base_x, gx - 1),
        jnp.minimum(base_y, gy - 1),
        jnp.minimum(base_z, gz - 1),
        gx, gy, bm2.coarse_layout,
    )
    occ_any = jnp.any(
        (((bm2.meta[cid.reshape(ci.shape[0], -1)] >> 30) & 1) == 1)
        & inb.reshape(ci.shape[0], -1),
        axis=1,
    )

    # sequential RMW on the packed macro words (edits may share a word)
    macro_flat = lt.macro.reshape(-1)

    def body(i, m):
        w = region[i] >> 5
        b = (region[i] & 31).astype(jnp.uint32)
        cur = jax.lax.bitcast_convert_type(m[w], jnp.uint32)
        bit = (jnp.uint32(1) << b).astype(jnp.uint32)
        nxt = jnp.where(occ_any[i], cur | bit, cur & ~bit)
        return m.at[w].set(jax.lax.bitcast_convert_type(nxt, jnp.int32))

    macro_flat = jax.lax.fori_loop(0, ci.shape[0], body, macro_flat)

    # L2 refresh: recompute each touched super-region's bit from the
    # updated L1 macro words (skipped when L2 is the all-occupied fallback)
    macro2 = lt.macro2
    srx, sry, srz = -(-rx // 4), ry, -(-rz // 4)
    if srx * sry * srz <= MACRO2_WORDS * 32:
        srgx, srgy, srgz = cx >> 5, cy >> 3, cz >> 5
        sreg = srgx + srx * (srgy + sry * srgz)
        d4x = jnp.arange(4)[:, None, None]
        d4y = jnp.zeros((1, 1, 1), jnp.int32)  # y group is one region
        d4z = jnp.arange(4)[None, None, :]

        def body2(i, m2):
            rgx_c = srgx[i] * 4 + d4x
            rgy_c = srgy[i] + d4y
            rgz_c = srgz[i] * 4 + d4z
            valid = (rgx_c < rx) & (rgy_c < ry) & (rgz_c < rz)
            rid = (
                jnp.minimum(rgx_c, rx - 1)
                + rx * (jnp.minimum(rgy_c, ry - 1) + ry * jnp.minimum(rgz_c, rz - 1))
            )
            bits = (macro_flat[rid >> 5] >> (rid & 31)) & 1
            occ = jnp.any((bits == 1) & valid)
            w = sreg[i] >> 5
            b = (sreg[i] & 31).astype(jnp.uint32)
            cur = jax.lax.bitcast_convert_type(m2[w], jnp.uint32)
            bit = (jnp.uint32(1) << b).astype(jnp.uint32)
            nxt = jnp.where(occ, cur | bit, cur & ~bit)
            return m2.at[w].set(jax.lax.bitcast_convert_type(nxt, jnp.int32))

        macro2 = jax.lax.fori_loop(0, ci.shape[0], body2, macro2)

        # L3 refresh: recompute each touched 16^3-region block's bit from
        # the just-updated L2 words (a block = 4^3 super-regions); like the
        # build, L3 is only real when L2 is real
        s3x, s3y, s3z = -(-rx // 16), ry, -(-rz // 16)
        if s3x * s3y * s3z <= MACRO3_WORDS * 32:
            sg3x, sg3y, sg3z = cx >> 7, cy >> 3, cz >> 7
            sr3 = sg3x + s3x * (sg3y + s3y * sg3z)

            def body3(i, m2):
                sxc = sg3x[i] * 4 + d4x
                syc = sg3y[i] + d4y
                szc = sg3z[i] * 4 + d4z
                valid = (sxc < srx) & (syc < sry) & (szc < srz)
                sid = (
                    jnp.minimum(sxc, srx - 1)
                    + srx * (jnp.minimum(syc, sry - 1)
                             + sry * jnp.minimum(szc, srz - 1))
                )
                bits = (m2[sid >> 5] >> (sid & 31)) & 1
                occ = jnp.any((bits == 1) & valid)
                w = MACRO2_WORDS + (sr3[i] >> 5)
                b = (sr3[i] & 31).astype(jnp.uint32)
                cur = jax.lax.bitcast_convert_type(m2[w], jnp.uint32)
                bit = (jnp.uint32(1) << b).astype(jnp.uint32)
                nxt = jnp.where(occ, cur | bit, cur & ~bit)
                return m2.at[w].set(jax.lax.bitcast_convert_type(nxt, jnp.int32))

            macro2 = jax.lax.fori_loop(0, ci.shape[0], body3, macro2)

    # materialized brick lines (if attached) stay in sync: rewrite the K
    # edited words at their line coordinates (donated -> in-place)
    bl = lt.brick_lines
    if bl is not None:
        slot = bm2.brick_idx[ci]
        flat = slot * wpb + word_col
        bl = bl.at[flat >> 7, flat & 127].set(
            jax.lax.bitcast_convert_type(bm2.bricks[slot, word_col], I32)
        )
    lt2 = dataclasses.replace(
        lt, macro=macro_flat.reshape(lt.macro.shape),
        region_lines=lines, macro2=macro2, brick_lines=bl,
    )
    return bm2, lt2


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "stage_steps", "tail_frac",
        "tile", "num_slots", "inner_steps", "dma_per_round", "use_macro",
        "shortlist", "double_step",
    ),
)
def trace_brickmap_hbm_staged(
    bm: BrickMap,
    lt: LineTable,
    origins,
    rays,
    max_steps: int = MAX_STEPS,
    stage_steps: int = 128,
    tail_frac: int = 8,
    tile: int = 1024,
    num_slots: int = 16,
    inner_steps: int = 8,
    dma_per_round: int = 4,
    use_macro: bool = True,
    shortlist: int = 0,
    double_step: bool = True,
) -> TraceOut:
    """Straggler-compacted HBM trace: the Pallas analog of
    :func:`voxelengine_tpu.ops.trace.trace_brickmap_staged`.

    A kernel tile runs until its *slowest* ray finishes, and primary-ray
    path lengths are heavy-tailed (horizon tiles run 5-20x the mean), so a
    single launch pays many x the mean in lockstep waste.  This wrapper
    runs the kernel at a small step budget (``stage_steps``, sized near
    the scene's p90-p95), then compacts the budget-truncated rays at
    128-ray ROW granularity — any row containing a survivor is gathered
    into a dense ``n/tail_frac`` buffer and retraced from scratch at the
    full budget.  Row granularity keeps compaction off the TPU's slow
    paths: selecting rows is an ``n/128``-element mask + ``flatnonzero``
    (no 1M-ray ``argsort``, measured ~40 ms) and the gather/scatter move
    contiguous 512 B rows.  The whole retraced row is merged back: rays
    that already finished retrace to bit-identical results, so no lane
    mask is needed.  Exact: a retrace from t=0 follows the identical DDA
    path, and if surviving rows ever exceed the buffer a ``lax.cond``-
    guarded full-width full-budget rescue pass (cost only when triggered)
    finishes the rest — results always equal :func:`trace_brickmap_hbm`
    at ``max_steps``.
    """
    kw = dict(
        tile=tile, num_slots=num_slots, inner_steps=inner_steps,
        dma_per_round=dma_per_round, use_macro=use_macro, shortlist=shortlist,
        double_step=double_step,
    )
    origins = jnp.asarray(origins, F32)
    rays = jnp.asarray(rays, F32)
    n = origins.shape[0]
    out1 = trace_brickmap_hbm(bm, lt, origins, rays, stage_steps, **kw)
    # budget-truncated rays: not hit and charged the full stage budget
    surv = ~out1.hit & (out1.steps >= stage_steps)

    padn = (-n) % 128
    nrows = (n + padn) // 128

    def rows(a, fill=0):
        if padn:
            pad_width = ((0, padn),) + ((0, 0),) * (a.ndim - 1)
            a = jnp.pad(a, pad_width, constant_values=fill)
        return a.reshape((nrows, 128) + a.shape[1:])

    surv_rows = jnp.any(rows(surv), axis=1)  # [nrows]
    rows_per_tile = max(tile // 128, 1)
    buf_rows = min(
        nrows,
        max(rows_per_tile,
            -(-nrows // tail_frac // rows_per_tile) * rows_per_tile),
    )
    # indices of surviving rows, padded with row 0 (duplicate scatter
    # targets write identical full-budget row-0 results: harmless)
    row_idx = jnp.flatnonzero(surv_rows, size=buf_rows, fill_value=0)
    out2 = trace_brickmap_hbm(
        bm, lt,
        rows(origins)[row_idx].reshape(-1, 3),
        rows(rays, fill=1.0)[row_idx].reshape(-1, 3),  # no zero-dir pad rays
        max_steps, **kw,
    )

    def merge(full, tail):
        tr = tail.reshape((buf_rows, 128) + full.shape[1:])
        return rows(full).at[row_idx].set(tr).reshape(
            (nrows * 128,) + full.shape[1:]
        )[:n]

    outs = TraceOut(
        hit=merge(out1.hit, out2.hit),
        position=merge(out1.position, out2.position),
        normal=merge(out1.normal, out2.normal),
        steps=merge(out1.steps, out2.steps),
    )
    # overflow rescue (same guarantee as trace_brickmap_staged): if the
    # row buffer was too small, finish everything at full width
    dropped = jnp.sum(surv_rows) > buf_rows
    return jax.lax.cond(
        dropped,
        lambda: trace_brickmap_hbm(bm, lt, origins, rays, max_steps, **kw),
        lambda: outs,
    )


def _fetch_pass(cache, cslot, row, lane, S: int):
    """vals[i,j] = cache[cslot[i,j]*8 + row[i,j], lane[i,j]] (cslot<0 -> 0).

    cache: [S*8, 128] i32 (VMEM value); cslot/row/lane: [R, 128] i32 ray
    state (R = rays/128).  Grouped replicated pair-gather (see module doc):
    per sublane-row g the (row, lane) indices are broadcast across sublanes,
    ax1 x ax0 take_along_axis fetch from each cache slot, and a masked
    select picks the ray's slot.  Rays with cslot < 0 receive unspecified
    values — callers must mask on residency.  All ops stay in native
    [8,128] vreg form (1D slicing/concat across sublanes does not lower on
    v5e Mosaic — probe D8).  NOTE: guarding each slot's pass with
    ``pl.when(any lane wants it)`` was measured 2.3x SLOWER on v5e (the
    per-slot vector->scalar reductions + branches stall the VPU pipeline)
    — keep this branch-free.  NOTE (round 3, measured NEUTRAL — don't
    redo): hoisting the ax0 sublane take past the slot select (one take on
    the selected [8,128] block instead of S per group — legal because the
    sublane gather never moves data across lanes; verified bit-identical,
    29/29 parity tests) measured 57.5 vs 56.9 ms on the 8k bench frame:
    the S-1 saved sublane gathers are fully offset by widening the S
    selects from [1,128] to [8,128] — Mosaic executes narrow [1,128] ops
    at ~1/8 vreg cost, so the per-slot row-gather is NOT where the fetch
    cost lives; the irreducible ax1 LANE gathers are.
    """
    R = cslot.shape[0]
    sub = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    out = jnp.zeros((R, 128), I32)
    for g in range(R):
        lane_rep = jnp.broadcast_to(lane[g, :][None, :], (8, 128))
        row_rep = jnp.broadcast_to(row[g, :][None, :], (8, 128))
        sl = cslot[g, :][None, :]
        acc = jnp.zeros((1, 128), I32)
        for c in range(S):
            y = jnp.take_along_axis(cache[c * 8 : (c + 1) * 8, :], lane_rep, axis=1)
            z = jnp.take_along_axis(y, row_rep, axis=0)
            acc = jnp.where(sl == c, z[0:1, :], acc)
        out = jnp.where(sub == g, jnp.broadcast_to(acc, (R, 128)), out)
    return out


def _fetch_static_row0(row0_b, lane):
    """vals[i,j] = row0_b[0, lane[i,j]] from a sublane-broadcast [8,128]
    single row (one ax1 take per group; row index statically 0)."""
    R = lane.shape[0]
    sub = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    out = jnp.zeros((R, 128), I32)
    for g in range(R):
        lane_rep = jnp.broadcast_to(lane[g, :][None, :], (8, 128))
        y = jnp.take_along_axis(row0_b, lane_rep, axis=1)
        out = jnp.where(sub == g, jnp.broadcast_to(y[0:1, :], (R, 128)), out)
    return out


def _fetch_static(line, row, lane):
    """vals[i,j] = line[row[i,j], lane[i,j]] from one static [8,128] line."""
    R = row.shape[0]
    sub = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    out = jnp.zeros((R, 128), I32)
    for g in range(R):
        lane_rep = jnp.broadcast_to(lane[g, :][None, :], (8, 128))
        row_rep = jnp.broadcast_to(row[g, :][None, :], (8, 128))
        y = jnp.take_along_axis(line, lane_rep, axis=1)
        z = jnp.take_along_axis(y, row_rep, axis=0)
        out = jnp.where(sub == g, jnp.broadcast_to(z[0:1, :], (R, 128)), out)
    return out


def _make_fetch_full(cache_ref, tags_smem, *, S):
    """Round-2 fetch: per-ray cache-slot resolve (S-way tag scan) + the
    S-way unrolled pair-gather of :func:`_fetch_pass`, every iteration.
    Kept as the ``shortlist=0`` reference scheduler."""
    cache = cache_ref[:]
    tag_vals = tuple(tags_smem[s] for s in range(S))

    def fetch(row, lane, want_new):
        R = row.shape[0]
        cslot = jnp.full((R, 128), -1, I32)
        for s in range(S):
            cslot = jnp.where(want_new == tag_vals[s], s, cslot)
        word = _fetch_pass(cache, cslot, row, lane, S)
        return word, None, cslot >= 0  # no paired word: S-way cost x2

    return fetch


def _stage_shortlist(cache_ref, tags_smem, cand_ref, act, want, rot, *, S, K):
    """Per-group slot-shortlist fetch (the round-3 fetch-cost unlock,
    NOTES_ROUND3.md item 1; enabling primitive probe-verified in
    ``experiments/probe_mosaic_r3a.py`` / ``r3b``).

    Once per outer DMA round: resolve each ray's wanted line to a cache
    slot (one S-way tag scan), vote per 128-ray group the min (and for
    ``K>=2`` the max) wanted slot via lane-axis reductions, stage the
    voted slots as scalars through a VMEM scratch, and *hoist the
    candidate line loads out of the hot loop* — each group keeps K
    register-resident ``[8,128]`` lines (dynamic-offset VMEM loads) plus
    one shared *rotating* slot (``rot`` cycles 0..S-1 per round), which
    guarantees every resident slot is served at least once every S rounds
    (hard progress bound; staleness can stall rays, never strand them).

    The returned per-iteration fetch is then K+1 scalar-tag compares +
    pair-gathers per group — independent of S, so the cache can grow
    (S=32+) without touching the hot-loop cost.  Rays whose want is not
    on the shortlist stall exactly like DMA misses (the kernel's stall
    path is semantics-preserving), so results are unchanged.
    """
    R = want.shape[0]
    cslot = jnp.full((R, 128), -1, I32)
    for s in range(S):
        cslot = jnp.where(want == tags_smem[s], s, cslot)
    valid = (cslot >= 0) & (act != 0)
    # K distinct candidates per group by iterated masked min (ascending);
    # exhausted groups vote the sentinel S (clamped + tag-gated below)
    vals = jnp.where(valid, cslot, S)
    for k in range(K):
        ck = jnp.min(vals, axis=1, keepdims=True)  # (R, 1)
        cand_ref[k * R : (k + 1) * R, :] = jnp.broadcast_to(ck, (R, 128))
        if k + 1 < K:
            vals = jnp.where(vals <= ck, S, vals)
    t_rot = tags_smem[rot]
    l_rot = cache_ref[pl.ds(rot * 8, 8), :]
    pergroup = []
    for g in range(R):
        cands = []
        for k in range(K):
            sk = jnp.minimum(cand_ref[k * R + g, 0], S - 1)
            cands.append((tags_smem[sk], cache_ref[pl.ds(sk * 8, 8), :]))
        cands.append((t_rot, l_rot))
        pergroup.append(cands)

    def fetch(row, lane, want_new):
        # bool vectors don't survive Mosaic select at these shapes
        # (i8->i1 trunci): carry served as i32 0/1.
        # Returns a SECOND word per ray from the same line at row+4 (the
        # brick-slot word paired with a chunk's meta word) by reusing each
        # candidate's lane-gather — this is what makes the fused
        # single-iteration descend affordable (sl mode only).
        sub = jax.lax.broadcasted_iota(I32, (R, 128), 0)
        out = jnp.zeros((R, 128), I32)
        out2 = jnp.zeros((R, 128), I32)
        served = jnp.zeros((R, 128), I32)
        for g in range(R):
            lane_rep = jnp.broadcast_to(lane[g, :][None, :], (8, 128))
            row_rep = jnp.broadcast_to(row[g, :][None, :], (8, 128))
            row2_rep = (row_rep + 4) & 7  # garbage-but-safe on fine lanes
            wg = want_new[g, :][None, :]
            acc = jnp.zeros((1, 128), I32)
            acc2 = jnp.zeros((1, 128), I32)
            srv = jnp.zeros((1, 128), I32)
            for tag, line in pergroup[g]:
                y = jnp.take_along_axis(line, lane_rep, axis=1)
                z = jnp.take_along_axis(y, row_rep, axis=0)
                z2 = jnp.take_along_axis(y, row2_rep, axis=0)
                m = wg == tag
                acc = jnp.where(m, z[0:1, :], acc)
                acc2 = jnp.where(m, z2[0:1, :], acc2)
                srv = jnp.where(m, 1, srv)
            out = jnp.where(sub == g, jnp.broadcast_to(acc, (R, 128)), out)
            out2 = jnp.where(sub == g, jnp.broadcast_to(acc2, (R, 128)), out2)
            served = jnp.where(
                sub == g, jnp.broadcast_to(srv, (R, 128)), served
            )
        return out, out2, served != 0

    return fetch


def _make_fetch_pervote(cache_ref, tags_smem, cand_ref, rot, *, S):
    """Per-ITERATION vote fetch (round-4 candidate, ``shortlist=-1``):
    inside the hot loop, resolve wants to slots, vote each group's min
    wanted slot, stage it through a scratch store -> scalar read, and
    serve ONE dynamically-loaded line per group plus the per-round
    rotating slot.  Zero vote staleness (the per-round shortlist's
    transition-stall problem) at the price of a store->scalar-read
    round trip per iteration; the rotating candidate still bounds
    starvation of non-min slots at S rounds.

    MEASURED DEAD END (round 3, v5e, mid world): 106.3 ms vs the S-way
    fetch's 47.3 — Mosaic fully serializes the vector store -> scalar
    read -> dynamic load chain inside the loop (~1.6 us/iteration of
    pipeline drain); the latency does NOT hide behind vector work.
    Kept as the measured record; do not re-attempt without a new
    scalar-staging primitive."""
    t_rot = tags_smem[rot]
    l_rot = cache_ref[pl.ds(rot * 8, 8), :]
    tag_vals = tuple(tags_smem[s] for s in range(S))

    def fetch(row, lane, want_new):
        R = row.shape[0]
        cslot = jnp.full((R, 128), -1, I32)
        for s in range(S):
            cslot = jnp.where(want_new == tag_vals[s], s, cslot)
        c1 = jnp.min(jnp.where(cslot >= 0, cslot, S), axis=1, keepdims=True)
        cand_ref[0:R, :] = jnp.broadcast_to(c1, (R, 128))
        sub = jax.lax.broadcasted_iota(I32, (R, 128), 0)
        out = jnp.zeros((R, 128), I32)
        out2 = jnp.zeros((R, 128), I32)
        served = jnp.zeros((R, 128), I32)
        for g in range(R):
            s1 = jnp.minimum(cand_ref[g, 0], S - 1)
            cands = (
                (tags_smem[s1], cache_ref[pl.ds(s1 * 8, 8), :]),
                (t_rot, l_rot),
            )
            lane_rep = jnp.broadcast_to(lane[g, :][None, :], (8, 128))
            row_rep = jnp.broadcast_to(row[g, :][None, :], (8, 128))
            row2_rep = (row_rep + 4) & 7
            wg = want_new[g, :][None, :]
            acc = jnp.zeros((1, 128), I32)
            acc2 = jnp.zeros((1, 128), I32)
            srv = jnp.zeros((1, 128), I32)
            for tag, line in cands:
                y = jnp.take_along_axis(line, lane_rep, axis=1)
                z = jnp.take_along_axis(y, row_rep, axis=0)
                z2 = jnp.take_along_axis(y, row2_rep, axis=0)
                m = wg == tag
                acc = jnp.where(m, z[0:1, :], acc)
                acc2 = jnp.where(m, z2[0:1, :], acc2)
                srv = jnp.where(m, 1, srv)
            out = jnp.where(sub == g, jnp.broadcast_to(acc, (R, 128)), out)
            out2 = jnp.where(sub == g, jnp.broadcast_to(acc2, (R, 128)), out2)
            served = jnp.where(
                sub == g, jnp.broadcast_to(srv, (R, 128)), served
            )
        return out, out2, served != 0

    return fetch


def _trace_inner(
    env, fetch, carry, tags=None, *,
    grid_dims, region_dims, num_regions, factor, wpb,
    max_steps, use_macro, brick_layout, double_step,
    diag: bool = False,
):
    """One DDA event for every ray in the working set — the shared hot
    loop body of the tile kernel and the row-retirement kernel.  ``env``
    carries the per-ray constants (start, direction, derived DDA terms,
    edge pads) plus the macro tables; everything else is loop state.

    ``diag=True`` appends 10 per-ray phase counters to the carry (stall /
    macro-skip / coarse-advance / pend / descend / fine-step / double-step
    / ascend / collapsible-x-run / adjacent-stall iterations) — the
    measurement build behind the round-3/4 where-do-iterations-go analysis
    and the round-5 prefetch-predictability probe; never on the production
    path.  ``tags`` (required when diag) is the tuple of the line cache's
    current slot tags, read once per DMA round: ``adjstall`` counts stall
    iterations whose wanted line id is +/-1 of a RESIDENT line — the
    stalls a speculative adjacent-line prefetch could have absorbed."""
    (sx, sy, sz, dx, dy, dz,
     stx, sty, stz, tdx, tdy, tdz, ivx, ivy, ivz,
     padx, pady, padz, macro, macro_row0, macro2_words) = env
    GX, GY, GZ = grid_dims
    RX, RY, RZ = region_dims
    SRX, SRY = -(-RX // 4), RY  # anisotropic 4x1x4-region L2 grouping
    SR3X, SR3Y = -(-RX // 16), RY  # 16x1x16-region L3 grouping
    f = factor
    NR = num_regions
    R = sx.shape[0]
    if brick_layout is Layout.LINEAR:
        def brick_bit(x, y, z):
            return x + y * f + z * (f * f)
    elif brick_layout is Layout.TILED_MORTON:  # (f % 8 == 0)
        tF = f // 8
        def brick_bit(x, y, z):
            tile = (x >> 3) + (y >> 3) * tF + (z >> 3) * (tF * tF)
            return tile * 512 + _morton3d_8(x & 7, y & 7, z & 7)
    else:  # TILED_LINEAR (f % 8 == 0)
        tF = f // 8
        def brick_bit(x, y, z):
            tile = (x >> 3) + (y >> 3) * tF + (z >> 3) * (tF * tF)
            return tile * 512 + (x & 7) + ((y & 7) << 3) + ((z & 7) << 6)
    zero = jnp.zeros((R, 128), F32)
    zeroi = jnp.zeros((R, 128), I32)

    if diag:
        phase_counts = carry[-10:]
        carry = carry[:-10]
    (act, fine, pend, hit, imm, hit_imm, steps,
     ccx, ccy, ccz, ctx, cty, ctz, centry,
     fcx, fcy, fcz, ftx, fty, ftz,
     fsx, fsy, fsz, fpx, fpy, fpz,
     fpadx, fpady, fpadz, fsteps,
     cnx, cny, cnz, fnx, fny, fnz,
     pox, poy, poz, nox, noy, noz,
     pmeta, bslot, want, hwid, hword) = carry
    active = act != 0
    in_fine = fine != 0
    pending = pend != 0
    coarse_phase = active & ~in_fine & ~pending
    pend_phase = active & pending
    fine_phase = active & in_fine

    # ---- region/local decomposition of the coarse cell ----
    in_range_c = (
        (ccx >= 0) & (ccx < GX + padx)
        & (ccy >= 0) & (ccy < GY + pady)
        & (ccz >= 0) & (ccz < GZ + padz)
    )
    clx = jnp.clip(ccx, 0, GX - 1)
    cly = jnp.clip(ccy, 0, GY - 1)
    clz = jnp.clip(ccz, 0, GZ - 1)
    rgx, rgy, rgz = clx >> 3, cly >> 3, clz >> 3
    region = rgx + RX * (rgy + RY * rgz)
    local = (clx & 7) + ((cly & 7) << 3) + ((clz & 7) << 6)

    # ---- macro occupancy (static vreg, no cache involved) ----
    if use_macro:
        mw = region >> 5
        mbit = region & 31
        if NR <= 4096:
            # <= 128 macro words: the word row is always 0, so one
            # lane gather per group suffices (no cross-sublane take)
            mword = _fetch_static_row0(macro_row0, mw & 127)
        elif NR <= 32768:
            mword = _fetch_static(macro, mw >> 7, mw & 127)
        else:
            # > 32768 regions: broadcast-select over the macro's 32768-bit
            # vreg blocks (per-vreg ax0 gathers cap at 8 sublanes)
            nv = -(-NR // 32768)
            mword = jnp.zeros((R, 128), I32)
            for v in range(nv):
                part = _fetch_static(
                    macro[v * 8 : (v + 1) * 8], (mw >> 7) & 7, mw & 127
                )
                mword = jnp.where((mw >> 10) == v, part, mword)
        region_occ = ((mword >> mbit) & 1) == 1
        # L2: super-region occupancy via a broadcast-select chain over
        # <= MACRO2_WORDS scalar words (no gather)
        sregion = (rgx >> 2) + SRX * (rgy + SRY * (rgz >> 2))
        mw2 = sregion >> 5
        # select chain sized to THIS world's super-region count; init
        # ALL-OCCUPIED (-1) so any word beyond the chain (over-budget
        # worlds) disables the level instead of reading as empty
        nsr = SRX * SRY * (-(-RZ // 4))
        nw2 = min(MACRO2_WORDS, -(-nsr // 32))
        sword = jnp.full((R, 128), -1, I32)
        for k in range(nw2):
            sword = jnp.where(mw2 == k, macro2_words[k], sword)
        sregion_occ = ((sword >> (sregion & 31)) & 1) == 1
        # L3: 16x1x16-region blocks (128-chunk spans) in the tail scalars
        sregion3 = (rgx >> 4) + SR3X * (rgy + SR3Y * (rgz >> 4))
        mw3 = sregion3 >> 5
        ns3 = SR3X * SR3Y * (-(-RZ // 16))
        nw3 = min(MACRO3_WORDS, -(-ns3 // 32))
        sword3 = jnp.full((R, 128), -1, I32)  # same all-occupied default
        for k in range(nw3):
            sword3 = jnp.where(mw3 == k, macro2_words[MACRO2_WORDS + k], sword3)
        sregion3_occ = ((sword3 >> (sregion3 & 31)) & 1) == 1
    else:
        region_occ = jnp.ones((R, 128), jnp.bool_)
        sregion_occ = jnp.ones((R, 128), jnp.bool_)
        sregion3_occ = jnp.ones((R, 128), jnp.bool_)
    macro_skip = coarse_phase & in_range_c & ~region_occ
    skip2 = macro_skip & ~sregion_occ  # wider L2 span (32 chunks)
    skip3 = skip2 & ~sregion3_occ  # widest L3 span (128 chunks)

    # ---- per-ray wanted line + cache residency ----
    meta_lane = local & 127
    meta_row = local >> 7  # 0..3; slot words at +4
    bit = brick_bit(
        jnp.clip(fcx, 0, f - 1),
        jnp.clip(fcy, 0, f - 1),
        jnp.clip(fcz, 0, f - 1),
    )  # also the fine occupancy bit below
    w_glob = jnp.where(fine_phase, bslot * wpb + (bit >> 5), 0)
    # word-carry: a fetched brick word covers a whole voxel row (32 x-cells
    # LINEAR / 8x4x1 TILED), and the world is static during a trace, so a
    # ray holding the word it needs is served from the register — no cache
    # fetch, no DMA pressure, no shortlist pressure.  hwid is the held
    # word's global brick-word id (-1 = none); never goes stale.
    have = fine_phase & (hwid == w_glob)
    want_new = jnp.where(
        fine_phase & ~have,
        NR + (w_glob >> 10),
        jnp.where(
            (coarse_phase & in_range_c & region_occ) | pend_phase,
            region,
            NOLINE,
        ),
    )
    row = jnp.where(
        fine_phase,
        (w_glob >> 7) & 7,
        jnp.where(pend_phase, meta_row + 4, meta_row),
    )
    lane = jnp.where(fine_phase, w_glob & 127, meta_lane)

    # want_new == NOLINE never matches a tag (tags are -1 or real line
    # ids), so `served` is automatically false on no-fetch lanes.
    # word2 (when the fetch provides it) is the brick-slot word paired
    # with a coarse ray's meta word: descend then completes in ONE
    # iteration instead of the meta->pend two-step.
    word, word2, served = fetch(row, lane, want_new)
    fused = word2 is not None
    word = jnp.where(have, hword, word)
    served = served | have

    in_range_f = (
        (fcx >= 0) & (fcx < f + fpadx)
        & (fcy >= 0) & (fcy < f + fpady)
        & (fcz >= 0) & (fcz < f + fpadz)
    )
    # rays that need a line they don't have stall this step
    runnable = active & (
        macro_skip
        | served
        | (coarse_phase & ~in_range_c)  # world-miss needs no fetch
        | (fine_phase & ~in_range_f)  # fine out-of-range ascends fetchless
    )

    # ================= coarse: meta test =================
    meta = jnp.where(pend_phase, pmeta, word)
    occ_c = ((meta >> 30) & 1) == 1
    bmnx = (meta & 31).astype(F32)
    bmny = ((meta >> 5) & 31).astype(F32)
    bmnz = ((meta >> 10) & 31).astype(F32)
    bmxx = ((meta >> 15) & 31).astype(F32)
    bmxy = ((meta >> 20) & 31).astype(F32)
    bmxz = ((meta >> 25) & 31).astype(F32)

    box_lox = clx.astype(F32) + bmnx / f
    box_loy = cly.astype(F32) + bmny / f
    box_loz = clz.astype(F32) + bmnz / f
    box_hix = clx.astype(F32) + (bmxx + 1.0) / f
    box_hiy = cly.astype(F32) + (bmxy + 1.0) / f
    box_hiz = clz.astype(F32) + (bmxz + 1.0) / f
    t1x = jnp.minimum((box_lox - sx) * ivx, (box_hix - sx) * ivx)
    t2x = jnp.maximum((box_lox - sx) * ivx, (box_hix - sx) * ivx)
    t1y = jnp.minimum((box_loy - sy) * ivy, (box_hiy - sy) * ivy)
    t2y = jnp.maximum((box_loy - sy) * ivy, (box_hiy - sy) * ivy)
    t1z = jnp.minimum((box_loz - sz) * ivz, (box_hiz - sz) * ivz)
    t2z = jnp.maximum((box_loz - sz) * ivz, (box_hiz - sz) * ivz)
    btmin = jnp.maximum(jnp.maximum(t1x, t1y), t1z)
    btmax = jnp.minimum(jnp.minimum(t2x, t2y), t2z)
    bhit = btmax >= jnp.maximum(btmin, 0.0)
    is_x = btmin == t1x
    is_y = (~is_x) & (btmin == t1y)
    bnx = jnp.where(is_x, jnp.where(ivx < 0, -1.0, 1.0), 0.0)
    bny = jnp.where(is_y, jnp.where(ivy < 0, -1.0, 1.0), 0.0)
    bnz = jnp.where(is_x | is_y, 0.0, jnp.where(ivz < 0, -1.0, 1.0))

    occupied = in_range_c & occ_c & bhit
    if fused:
        # slot word arrived with the meta word: descend right now
        to_pend = jnp.zeros((R, 128), jnp.bool_)
        descend = runnable & coarse_phase & occupied
    else:
        # coarse ray on an occupied+hit chunk defers to a pend step (it
        # needs the slot word next iteration); pend ray completes it
        to_pend = runnable & coarse_phase & occupied
        descend = runnable & pend_phase
    coarse_miss = runnable & coarse_phase & ~in_range_c
    coarse_adv = runnable & coarse_phase & in_range_c & ~occupied & ~macro_skip

    imm_new = (steps == 0) & (btmin <= 0.0)
    use_box = btmin > 0.0
    ex = jnp.where(use_box, sx + btmin * dx, sx + dx * centry)
    ey = jnp.where(use_box, sy + btmin * dy, sy + dy * centry)
    ez = jnp.where(use_box, sz + btmin * dz, sz + dz * centry)
    fsx_new = (ex - clx.astype(F32)) * f
    fsy_new = (ey - cly.astype(F32)) * f
    fsz_new = (ez - clz.astype(F32)) * f
    fcx_new = fsx_new.astype(I32)
    fcy_new = fsy_new.astype(I32)
    fcz_new = fsz_new.astype(I32)
    ftx_new = jnp.where(dx != 0.0, ((fcx_new + (stx > 0)).astype(F32) - fsx_new) / dx, BIG)
    fty_new = jnp.where(dy != 0.0, ((fcy_new + (sty > 0)).astype(F32) - fsy_new) / dy, BIG)
    ftz_new = jnp.where(dz != 0.0, ((fcz_new + (stz > 0)).astype(F32) - fsz_new) / dz, BIG)
    on_edge_f = (fcx_new == f) | (fcy_new == f) | (fcz_new == f)
    fpadx_new = jnp.where(on_edge_f & (dx < 0.0), 1, 0)
    fpady_new = jnp.where(on_edge_f & (dy < 0.0), 1, 0)
    fpadz_new = jnp.where(on_edge_f & (dz < 0.0), 1, 0)

    # ================= fine level =================
    occ_f = (((word >> (bit & 31)) & 1) == 1)

    fine_hit = runnable & fine_phase & in_range_f & occ_f
    fine_try = runnable & fine_phase & in_range_f & ~occ_f

    fax, fay, faz = _axis_pick3(ftx, fty, ftz)
    ftc = jnp.where(fax, ftx, jnp.where(fay, fty, ftz))
    fix = jnp.where(fax, (fcx + (stx > 0)).astype(F32), fsx + ftc * dx)
    fiy = jnp.where(fay, (fcy + (sty > 0)).astype(F32), fsy + ftc * dy)
    fiz = jnp.where(faz, (fcz + (stz > 0)).astype(F32), fsz + ftc * dz)
    oob_f = (
        (fix < 0.0) | (fix > f) | (fiy < 0.0) | (fiy > f)
        | (fiz < 0.0) | (fiz > f)
    )
    fine_step = fine_try & ~oob_f
    ascend = (runnable & fine_phase & ~in_range_f) | (fine_try & oob_f)

    if double_step:
        # fine double-step: when the cell entered by this step is (a) in
        # range, (b) covered by the SAME brick word already in hand, and
        # (c) empty, and the following crossing stays inside the brick,
        # retire two DDA events this iteration.  Exactly reproduces two
        # consecutive single-step iterations: the skipped cell is tested
        # empty here (so no hit is skipped), entry position/normal/step
        # charges use the same formulas the second iteration would.
        f1cx = jnp.where(fax, fcx + stx, fcx)
        f1cy = jnp.where(fay, fcy + sty, fcy)
        f1cz = jnp.where(faz, fcz + stz, fcz)
        f1tx = jnp.where(fax, ftx + tdx, ftx)
        f1ty = jnp.where(fay, fty + tdy, fty)
        f1tz = jnp.where(faz, ftz + tdz, ftz)
        in_range1 = (
            (f1cx >= 0) & (f1cx < f + fpadx)
            & (f1cy >= 0) & (f1cy < f + fpady)
            & (f1cz >= 0) & (f1cz < f + fpadz)
        )
        bit1 = brick_bit(
            jnp.clip(f1cx, 0, f - 1),
            jnp.clip(f1cy, 0, f - 1),
            jnp.clip(f1cz, 0, f - 1),
        )
        same_word = (bit1 >> 5) == (bit >> 5)
        occ1 = ((word >> (bit1 & 31)) & 1) == 1
        gax, gay, gaz = _axis_pick3(f1tx, f1ty, f1tz)
        gtc = jnp.where(gax, f1tx, jnp.where(gay, f1ty, f1tz))
        gix = jnp.where(gax, (f1cx + (stx > 0)).astype(F32), fsx + gtc * dx)
        giy = jnp.where(gay, (f1cy + (sty > 0)).astype(F32), fsy + gtc * dy)
        giz = jnp.where(gaz, (f1cz + (stz > 0)).astype(F32), fsz + gtc * dz)
        oob2 = (
            (gix < 0.0) | (gix > f) | (giy < 0.0) | (giy > f)
            | (giz < 0.0) | (giz > f)
        )
        step2 = fine_step & in_range1 & same_word & ~occ1 & ~oob2
    else:
        step2 = jnp.zeros((R, 128), jnp.bool_)

    # ================= coarse advance (normal + macro skip) ==========
    do_cadv = coarse_adv | ascend

    # macro skip: step the region (or, when the whole super-region is
    # empty, the 4x smaller super-region grid) DDA, re-seed the coarse
    # DDA at the exit, charge the exact L1 chunk distance to the budget.
    # macro_skip and do_cadv are disjoint per ray, so ONE merged axis
    # pick serves both: feed it the skip-span t's on skip lanes and the
    # coarse cell t's elsewhere (round-3 body cut)
    if use_macro:
        # skip-span corner / size in chunk units (8 or 32), computed
        # from the CLAMPED cell and clamped to the grid: the exit face
        # of a span that sticks out of the grid must be the grid face,
        # or the charged distance would overshoot where the plain walk
        # exits (e.g. a 32-chunk L2 span on a 16-chunk-tall grid)
        # slab spans: x/z widen with the level, y stays one region (8)
        lox = jnp.where(skip3, (clx >> 7) << 7,
                        jnp.where(skip2, (clx >> 5) << 5, rgx << 3))
        loy = rgy << 3
        loz = jnp.where(skip3, (clz >> 7) << 7,
                        jnp.where(skip2, (clz >> 5) << 5, rgz << 3))
        span = jnp.where(skip3, 128, jnp.where(skip2, 32, 8))
        hix = jnp.minimum(lox + span, GX)
        hiy = jnp.minimum(loy + 8, GY)
        hiz = jnp.minimum(loz + span, GZ)
        nbx = jnp.where(stx > 0, hix, lox).astype(F32)
        nby = jnp.where(sty > 0, hiy, loy).astype(F32)
        nbz = jnp.where(stz > 0, hiz, loz).astype(F32)
        rtx = jnp.where(dx != 0.0, (nbx - sx) / dx, BIG)
        rty = jnp.where(dy != 0.0, (nby - sy) / dy, BIG)
        rtz = jnp.where(dz != 0.0, (nbz - sz) / dz, BIG)
        mtx = jnp.where(macro_skip, rtx, ctx)
        mty = jnp.where(macro_skip, rty, cty)
        mtz = jnp.where(macro_skip, rtz, ctz)
    else:
        mtx, mty, mtz = ctx, cty, ctz
    cax, cay, caz = _axis_pick3(mtx, mty, mtz)
    tc = jnp.where(cax, mtx, jnp.where(cay, mty, mtz))
    if use_macro:
        mx = sx + tc * dx
        my = sy + tc * dy
        mz = sz + tc * dz
        # stepped axis: exactly the first cell across the span face;
        # others: floor, clamped into the current span (FP guard)
        skx = jnp.where(
            cax,
            jnp.where(stx > 0, hix, lox - 1),
            jnp.clip(mx.astype(I32) - (mx < 0.0), lox, hix - 1),
        )
        sky = jnp.where(
            cay,
            jnp.where(sty > 0, hiy, loy - 1),
            jnp.clip(my.astype(I32) - (my < 0.0), loy, hiy - 1),
        )
        skz = jnp.where(
            caz,
            jnp.where(stz > 0, hiz, loz - 1),
            jnp.clip(mz.astype(I32) - (mz < 0.0), loz, hiz - 1),
        )
        skip_l1 = (
            jnp.abs(skx - ccx) + jnp.abs(sky - ccy) + jnp.abs(skz - ccz)
        )
    else:
        skx = sky = skz = zeroi
        skip_l1 = zeroi

    new_ccx = jnp.where(macro_skip, skx, jnp.where(do_cadv & cax, ccx + stx, ccx))
    new_ccy = jnp.where(macro_skip, sky, jnp.where(do_cadv & cay, ccy + sty, ccy))
    new_ccz = jnp.where(macro_skip, skz, jnp.where(do_cadv & caz, ccz + stz, ccz))
    new_ctx = jnp.where(
        macro_skip,
        jnp.where(dx != 0.0, ((new_ccx + (stx > 0)).astype(F32) - sx) / dx, BIG),
        jnp.where(do_cadv & cax, ctx + tdx, ctx),
    )
    new_cty = jnp.where(
        macro_skip,
        jnp.where(dy != 0.0, ((new_ccy + (sty > 0)).astype(F32) - sy) / dy, BIG),
        jnp.where(do_cadv & cay, cty + tdy, cty),
    )
    new_ctz = jnp.where(
        macro_skip,
        jnp.where(dz != 0.0, ((new_ccz + (stz > 0)).astype(F32) - sz) / dz, BIG),
        jnp.where(do_cadv & caz, ctz + tdz, ctz),
    )
    new_centry = jnp.where(macro_skip | do_cadv, tc, centry)

    new_fine = (in_fine | descend) & ~ascend & ~fine_hit
    def pick3(dsc, stp, new, adv, old):
        return jnp.where(dsc, new, jnp.where(stp, adv, old))
    if double_step:
        adv_cx = jnp.where(step2 & gax, f1cx + stx, f1cx)
        adv_cy = jnp.where(step2 & gay, f1cy + sty, f1cy)
        adv_cz = jnp.where(step2 & gaz, f1cz + stz, f1cz)
        adv_tx = jnp.where(step2 & gax, f1tx + tdx, f1tx)
        adv_ty = jnp.where(step2 & gay, f1ty + tdy, f1ty)
        adv_tz = jnp.where(step2 & gaz, f1tz + tdz, f1tz)
        adv_px = jnp.where(step2, gix, fix)
        adv_py = jnp.where(step2, giy, fiy)
        adv_pz = jnp.where(step2, giz, fiz)
        # boolean select via bitwise logic: where() on bool vectors does
        # not lower on v5e Mosaic (i8->i1 trunci)
        nax = (step2 & gax) | (~step2 & fax)
        nay = (step2 & gay) | (~step2 & fay)
        naz = (step2 & gaz) | (~step2 & faz)
    else:
        adv_cx = jnp.where(fax, fcx + stx, fcx)
        adv_cy = jnp.where(fay, fcy + sty, fcy)
        adv_cz = jnp.where(faz, fcz + stz, fcz)
        adv_tx = jnp.where(fax, ftx + tdx, ftx)
        adv_ty = jnp.where(fay, fty + tdy, fty)
        adv_tz = jnp.where(faz, ftz + tdz, ftz)
        adv_px, adv_py, adv_pz = fix, fiy, fiz
        nax, nay, naz = fax, fay, faz
    nfcx = pick3(descend, fine_step, fcx_new, adv_cx, fcx)
    nfcy = pick3(descend, fine_step, fcy_new, adv_cy, fcy)
    nfcz = pick3(descend, fine_step, fcz_new, adv_cz, fcz)
    nftx = pick3(descend, fine_step, ftx_new, adv_tx, ftx)
    nfty = pick3(descend, fine_step, fty_new, adv_ty, fty)
    nftz = pick3(descend, fine_step, ftz_new, adv_tz, ftz)
    nfsx = jnp.where(descend, fsx_new, fsx)
    nfsy = jnp.where(descend, fsy_new, fsy)
    nfsz = jnp.where(descend, fsz_new, fsz)
    nfpx = pick3(descend, fine_step, fsx_new, adv_px, fpx)
    nfpy = pick3(descend, fine_step, fsy_new, adv_py, fpy)
    nfpz = pick3(descend, fine_step, fsz_new, adv_pz, fpz)
    nfpadx = jnp.where(descend, fpadx_new, fpadx)
    nfpady = jnp.where(descend, fpady_new, fpady)
    nfpadz = jnp.where(descend, fpadz_new, fpadz)
    nfsteps = jnp.where(
        descend, 0,
        fsteps + jnp.where(fine_step, 1, 0) + jnp.where(step2, 1, 0),
    )
    ncnx = jnp.where(descend, bnx, cnx)
    ncny = jnp.where(descend, bny, cny)
    ncnz = jnp.where(descend, bnz, cnz)
    nfnx = jnp.where(fine_step, jnp.where(nax, stx.astype(F32), 0.0), fnx)
    nfny = jnp.where(fine_step, jnp.where(nay, sty.astype(F32), 0.0), fny)
    nfnz = jnp.where(fine_step, jnp.where(naz, stz.astype(F32), 0.0), fnz)

    nsteps = jnp.minimum(
        steps
        + jnp.where(do_cadv | fine_step, 1, 0)
        + jnp.where(step2, 1, 0)
        + jnp.where(macro_skip, skip_l1, 0),
        max_steps,
    )

    # hit bookkeeping uses PRE-update fine state (fine_hit lanes take
    # neither descend nor step branches above)
    hpx = fpx + (ccx * f).astype(F32)
    hpy = fpy + (ccy * f).astype(F32)
    hpz = fpz + (ccz * f).astype(F32)
    first_cell = fsteps == 0
    hnx = jnp.where(first_cell, cnx, fnx)
    hny = jnp.where(first_cell, cny, fny)
    hnz = jnp.where(first_cell, cnz, fnz)
    npox = jnp.where(fine_hit, hpx, pox)
    npoy = jnp.where(fine_hit, hpy, poy)
    npoz = jnp.where(fine_hit, hpz, poz)
    nnox = jnp.where(fine_hit, hnx, nox)
    nnoy = jnp.where(fine_hit, hny, noy)
    nnoz = jnp.where(fine_hit, hnz, noz)
    nhit = hit | fine_hit.astype(I32)
    nimm = jnp.where(descend, imm_new.astype(I32), imm)
    nhit_imm = hit_imm | (fine_hit & (fsteps == 0) & (imm != 0)).astype(I32)

    dead = nsteps >= max_steps
    nact = (active & ~fine_hit & ~coarse_miss & ~dead).astype(I32)
    if fused:
        npend = zeroi
        npmeta = pmeta
        nbslot = jnp.where(descend, jnp.maximum(word2, 0), bslot)
    else:
        npend = (to_pend | (pending & ~runnable & active)).astype(I32)
        # pend rays carry the meta word; slot word becomes the brick slot
        npmeta = jnp.where(to_pend, word, pmeta)
        nbslot = jnp.where(descend, jnp.maximum(word, 0), bslot)
    # refresh the held brick word on any served fine lane (hword is the
    # true word for hwid, so rewriting identical data on `have` lanes is
    # a no-op)
    upd_h = fine_phase & served
    nhwid = jnp.where(upd_h, w_glob, hwid)
    nhword = jnp.where(upd_h, word, hword)

    # next-iteration want (for the outer DMA round): recompute cheaply
    # from the POST state — stalled rays keep their want
    nwant = jnp.where(
        nact != 0,
        jnp.where(want_new != NOLINE, want_new, want),
        NOLINE,
    )
    nwant = jnp.where(runnable & (nact != 0), want_new, nwant)

    out = (nact, new_fine.astype(I32), npend, nhit, nimm, nhit_imm, nsteps,
           new_ccx, new_ccy, new_ccz, new_ctx, new_cty, new_ctz, new_centry,
           nfcx, nfcy, nfcz, nftx, nfty, nftz,
           nfsx, nfsy, nfsz, nfpx, nfpy, nfpz,
           nfpadx, nfpady, nfpadz, nfsteps,
           ncnx, ncny, ncnz, nfnx, nfny, nfnz,
           npox, npoy, npoz, nnox, nnoy, nnoz,
           npmeta, nbslot, nwant, nhwid, nhword)
    if diag:
        # phase attribution for this iteration (disjoint except step2,
        # which rides a fine_step lane): where do tile iterations go?
        (c_stall, c_mskip, c_cadv, c_pend, c_desc, c_fstep, c_step2,
         c_asc, c_xrun, c_adjs) = phase_counts
        stall = active & ~runnable
        # xrun: fine steps along x whose whole 32-cell word row is empty —
        # the lane-iterations an exact x-slab skip (absolute-t semantics)
        # could collapse to one event per (y,z) row; its measured ceiling
        xrun = fine_step & fax & (word == 0)
        # adjstall: stall iterations whose wanted line is +/-1 of a line
        # RESIDENT in the cache right now — the stalls a speculative
        # adjacent-line prefetch (fetch L -> also fetch L+/-1) could have
        # absorbed.  Measured ceiling of that idea, nothing more.
        adj = jnp.zeros((R, 128), jnp.bool_)
        if tags is not None:
            for tv in tags:
                adj = adj | (want_new == tv + 1) | (want_new == tv - 1)
        adjstall = stall & adj
        out = out + (
            c_stall + stall.astype(I32),
            c_mskip + macro_skip.astype(I32),
            c_cadv + coarse_adv.astype(I32),
            c_pend + to_pend.astype(I32),
            c_desc + descend.astype(I32),
            c_fstep + fine_step.astype(I32),
            c_step2 + step2.astype(I32),
            c_asc + ascend.astype(I32),
            c_xrun + xrun.astype(I32),
            c_adjs + adjstall.astype(I32),
        )
    return out

def _run_dma_round(
    cache_ref, tags_smem, rr_ref, started_ref, sems_ref,
    regions_hbm, bricks_hbm, act, want, *, S, NR, dma_per_round,
):
    """One line-cache DMA round (shared by the tile and RR kernels): start
    up to ``dma_per_round`` missing-line copies concurrently (misses are
    voted: min wanted non-resident line id), then wait once so latency
    overlaps across the misses.  Tags live in SMEM (scalar per slot)."""
    active = act != 0
    stalled_want = jnp.where(active & (want != NOLINE), want, NOLINE)
    res = jnp.zeros(stalled_want.shape, jnp.bool_)
    for s in range(S):
        res = res | (stalled_want == tags_smem[s])
    stalled_want = jnp.where(res, NOLINE, stalled_want)
    rr0 = rr_ref[0]
    for _k in range(dma_per_round):
        miss = jnp.min(stalled_want)

        # unified line id space, two source tables: region records (< NR,
        # from the small side table) and brick lines (>= NR, read through
        # the zero-copy view of the brickmap itself)
        @pl.when((miss != NOLINE) & (miss < NR))
        def _():
            slot = (rr0 + _k) % S
            pltpu.make_async_copy(
                regions_hbm.at[pl.ds(miss * 8, 8), :],
                cache_ref.at[pl.ds(slot * 8, 8), :],
                sems_ref.at[_k],
            ).start()

        @pl.when((miss != NOLINE) & (miss >= NR))
        def _():
            slot = (rr0 + _k) % S
            pltpu.make_async_copy(
                bricks_hbm.at[pl.ds((miss - NR) * 8, 8), :],
                cache_ref.at[pl.ds(slot * 8, 8), :],
                sems_ref.at[_k],
            ).start()

        @pl.when(miss != NOLINE)
        def _():
            slot = (rr0 + _k) % S
            tags_smem[slot] = miss
            started_ref[_k] = 1

        stalled_want = jnp.where(stalled_want == miss, NOLINE, stalled_want)
    for _k in range(dma_per_round):
        @pl.when(started_ref[_k] == 1)
        def _():
            slot = (rr0 + _k) % S
            pltpu.make_async_copy(
                regions_hbm.at[pl.ds(0, 8), :],
                cache_ref.at[pl.ds(slot * 8, 8), :],
                sems_ref.at[_k],
            ).wait()
            rr_ref[0] = rr_ref[0] + 1
            started_ref[_k] = 0


def _bigtrace_kernel(
    macro_ref,
    macro2_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    act_ref, padx_ref, pady_ref, padz_ref,
    regions_hbm,
    bricks_hbm,
    hit_ref, px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref, steps_ref,
    iters_ref,
    *rest,
    grid_dims,
    region_dims,
    num_regions: int,
    factor: int,
    wpb: int,
    max_steps: int,
    num_slots: int,
    inner_steps: int,
    dma_per_round: int,
    use_macro: bool,
    brick_layout: Layout,
    shortlist: int,
    double_step: bool,
    diag: bool = False,
):
    # rest = [10 phase-count out refs if diag] + 6 scratch refs
    (cache_ref, tags_smem, rr_ref, started_ref, sems_ref, cand_ref) = rest[-6:]
    phase_refs = rest[:-6]
    S = num_slots
    R = ox_ref.shape[0]  # sublane rows; rays = R * 128
    NR = num_regions

    # cache bookkeeping persists across the ray-tile grid; init once
    @pl.when(pl.program_id(0) == 0)
    def _():
        for s in range(S):
            tags_smem[s] = -1
        rr_ref[0] = 0
        for _k in range(dma_per_round):
            started_ref[_k] = 0

    macro = macro_ref[:]
    macro_row0 = jnp.broadcast_to(macro[0:1, :], (8, 128))
    sx, sy, sz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    padx, pady, padz = padx_ref[:], pady_ref[:], padz_ref[:]

    stx = jnp.where(dx > 0.0, 1, -1)
    sty = jnp.where(dy > 0.0, 1, -1)
    stz = jnp.where(dz > 0.0, 1, -1)
    tdx = jnp.where(dx != 0.0, jnp.abs(1.0 / dx), BIG)
    tdy = jnp.where(dy != 0.0, jnp.abs(1.0 / dy), BIG)
    tdz = jnp.where(dz != 0.0, jnp.abs(1.0 / dz), BIG)
    ccx0 = sx.astype(I32)
    ccy0 = sy.astype(I32)
    ccz0 = sz.astype(I32)
    ctx0 = jnp.where(dx != 0.0, ((ccx0 + (stx > 0)).astype(F32) - sx) / dx, BIG)
    cty0 = jnp.where(dy != 0.0, ((ccy0 + (sty > 0)).astype(F32) - sy) / dy, BIG)
    ctz0 = jnp.where(dz != 0.0, ((ccz0 + (stz > 0)).astype(F32) - sz) / dz, BIG)
    # ray-invariant AABB slab reciprocals (hoisted out of the hot loop)
    eps32 = 1.1920929e-07
    ivx = 1.0 / jnp.where(dx == 0.0, eps32, dx)
    ivy = 1.0 / jnp.where(dy == 0.0, eps32, dy)
    ivz = 1.0 / jnp.where(dz == 0.0, eps32, dz)

    zero = jnp.zeros((R, 128), F32)
    zeroi = jnp.zeros((R, 128), I32)

    macro2_words = tuple(
        macro2_ref[k] for k in range(MACRO2_WORDS + MACRO3_WORDS)
    )
    env = (sx, sy, sz, dx, dy, dz,
           stx, sty, stz, tdx, tdy, tdz, ivx, ivy, ivz,
           padx, pady, padz, macro, macro_row0, macro2_words)
    inner = functools.partial(
        _trace_inner,
        grid_dims=grid_dims, region_dims=region_dims, num_regions=num_regions,
        factor=factor, wpb=wpb, max_steps=max_steps,
        use_macro=use_macro, brick_layout=brick_layout,
        double_step=double_step, diag=diag,
    )

    def outer_body(carry):
        it = carry[0]
        st = carry[1:]
        act, want = st[0], st[44]

        _run_dma_round(
            cache_ref, tags_smem, rr_ref, started_ref, sems_ref,
            regions_hbm, bricks_hbm, act, want,
            S=S, NR=NR, dma_per_round=dma_per_round,
        )

        # ---- inner steps (fetch staging hoisted out of the hot loop) ----
        if shortlist < 0:
            rot = jax.lax.rem(it, jnp.int32(S))
            fetch = _make_fetch_pervote(
                cache_ref, tags_smem, cand_ref, rot, S=S
            )
        elif shortlist:
            rot = jax.lax.rem(it, jnp.int32(S))
            fetch = _stage_shortlist(
                cache_ref, tags_smem, cand_ref, act, want, rot,
                S=S, K=shortlist,
            )
        else:
            fetch = _make_fetch_full(cache_ref, tags_smem, S=S)
        tag_vals = (
            tuple(tags_smem[s] for s in range(S)) if diag else None
        )
        st = jax.lax.fori_loop(
            0, inner_steps, lambda i, c: inner(env, fetch, c, tag_vals), st,
            unroll=False,
        )
        return (it + 1,) + st

    init = (jnp.int32(0),
            act_ref[:], zeroi, zeroi, zeroi, zeroi, zeroi, zeroi,
            ccx0, ccy0, ccz0, ctx0, cty0, ctz0, zero,
            zeroi, zeroi, zeroi, zero, zero, zero,
            zero, zero, zero, zero, zero, zero,
            zeroi, zeroi, zeroi, zeroi,
            zero, zero, zero, zero, zero, zero,
            zero, zero, zero, zero, zero, zero,
            zeroi, zeroi, jnp.full((R, 128), NOLINE, I32),
            jnp.full((R, 128), -1, I32), zeroi)
    if diag:
        init = init + (zeroi,) * 10

    # iteration cap: the non-fused path's worst charged cycle is
    # to_pend(+0) -> descend(+0) -> ascend(+1) = 3 iterations per budget
    # step (the XLA loop has no pend phase, so ITS 2*max_steps bound is
    # tight — ops/trace.py:413), hence 3*max_steps here, + stall slack.
    # Shortlist modes can in the worst case wait the full S-round rotation
    # per event burst, so their cap scales with num_slots — the while_loop
    # exits early on completion, so a large cap costs nothing at runtime.
    # If adversarial DMA starvation still exhausts the cap, the exit path
    # below marks the survivors (steps=max_steps), never silently mislabels
    # them as ordinary misses.
    iter_limit = ((3 * max_steps + 64) // inner_steps + 64) * (
        (num_slots + 2) if shortlist else 1
    )

    def outer_cond(c):
        return (c[0] < iter_limit) & jnp.any(c[1] != 0)

    out = jax.lax.while_loop(outer_cond, outer_body, init)
    st = out[1:]
    (act, fine, pend, hit, imm, hit_imm, steps) = st[0:7]
    (pox, poy, poz, nox, noy, noz) = st[36:42]

    hit_ref[:] = hit | (hit_imm << 1)
    px_ref[:] = pox
    py_ref[:] = poy
    pz_ref[:] = poz
    nx_ref[:] = nox
    ny_ref[:] = noy
    nz_ref[:] = noz
    # cap-exit truncation is NON-SILENT: a ray still active when the
    # iteration cap binds reports the full step budget (the "gave up"
    # terminal XLA uses for budget-dead rays), so the staged rescue's
    # survivor test catches it and exactness gates see a flagged ray, not
    # a fake low-steps miss
    steps_ref[:] = jnp.where(act != 0, jnp.int32(max_steps), steps)
    # lockstep/stall diagnostic: iterations this tile actually ran
    iters_ref[:] = jnp.full((R, 128), out[0] * inner_steps, I32)
    if diag:
        for k in range(10):
            phase_refs[k][:] = st[47 + k]


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "tile", "num_slots", "inner_steps", "dma_per_round",
        "use_macro", "interpret", "return_iters", "shortlist", "double_step",
        "return_phases",
    ),
)
def trace_brickmap_hbm(
    bm: BrickMap,
    lt: LineTable,
    origins,
    rays,
    max_steps: int = MAX_STEPS,
    tile: int = 1024,
    num_slots: int = 16,
    inner_steps: int = 8,
    dma_per_round: int = 4,
    use_macro: bool = True,
    interpret: bool | None = None,
    return_iters: bool = False,
    shortlist: int = 0,
    double_step: bool = True,
    return_phases: bool = False,
) -> TraceOut:
    """Two-level brickmap trace through the HBM line table (see module doc).

    Semantics match :func:`voxelengine_tpu.ops.trace.trace_brickmap` (hits,
    positions, normals; step counts additionally charge macro-skipped
    distance exactly, so they match too).  ``return_iters=True`` appends a
    per-ray diagnostic: the iteration count its kernel tile actually ran
    (lockstep + DMA-stall total; the per-tile analog of the reference's
    steps/256 heatmap, ``Renderer.cu:270-275``).

    ``shortlist`` selects the fetch scheduler: 0 = round-2 S-way unrolled
    fetch; K>0 = per-group slot shortlist with K voted candidates + a
    rotating slot (see :func:`_stage_shortlist`) — identical results,
    fetch cost independent of ``num_slots``.

    ``return_phases=True`` additionally returns a dict of 10 per-ray
    iteration-phase counters (``stall``/``mskip``/``cadv``/``pend``/
    ``desc``/``fstep``/``step2``/``asc``/``xrun``/``adjstall`` — the
    last counts stalls whose wanted line is +/-1 of a resident line,
    the measured ceiling of a speculative adjacent-line prefetch) —
    the measurement build that answers *where do tile iterations go*
    (slightly slower; results are unchanged).
    """
    if interpret is None:
        # CPU (tests, oracles) runs the interpreter; TPU compiles Mosaic
        interpret = jax.default_backend() == "cpu"
    assert interpret or tile % 1024 == 0, (
        "compiled Mosaic blocks need >= 8 sublanes: tile must be a"
        " multiple of 1024"
    )
    # slot = (rr + k) % num_slots for k < dma_per_round: more in-flight
    # DMAs than cache slots would target one slot twice concurrently and
    # silently corrupt fetched lines
    dma_per_round = min(dma_per_round, num_slots)
    gx, gy, gz = bm.grid_dims
    f = bm.factor
    gdims = jnp.asarray([gx, gy, gz], I32)

    origins = jnp.asarray(origins, F32)
    d = _normalize(jnp.asarray(rays, F32))
    n = origins.shape[0]

    start_c = origins / F32(f)
    inside = jnp.all((start_c >= 0.0) & (start_c < gdims.astype(F32)), axis=-1)
    eps = jnp.float32(FLT_EPS_DDA)
    whit, _, wpt, wnrm = ray_aabb(
        start_c, d, jnp.full((3,), eps), gdims.astype(F32) - eps
    )
    start_c = jnp.where(inside[:, None], start_c, jnp.where(whit[:, None], wpt, start_c))
    start_normal = jnp.where(inside[:, None], 0.0, wnrm)
    active0 = (inside | whit).astype(I32)
    pad = _edge_pad(start_c.astype(I32), gdims, d)

    assert tile % 128 == 0
    rows_per_tile = tile // 128
    padn = (-n) % tile

    def pad1(a, fill=0):
        if padn:
            a = jnp.concatenate([a, jnp.full((padn,), fill, a.dtype)])
        return a.reshape(-1, 128)  # [total_rows, 128]: native vreg tiling

    ins = [
        pad1(start_c[:, 0]), pad1(start_c[:, 1]), pad1(start_c[:, 2]),
        pad1(d[:, 0], 1.0), pad1(d[:, 1], 1.0), pad1(d[:, 2], 1.0),
        pad1(active0), pad1(pad[:, 0]), pad1(pad[:, 1]), pad1(pad[:, 2]),
    ]
    ntiles = (n + padn) // tile

    ray_spec = pl.BlockSpec(
        (rows_per_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [ray_spec] * 10
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
    )
    kern = functools.partial(
        _bigtrace_kernel,
        grid_dims=(gx, gy, gz),
        region_dims=lt.region_dims,
        num_regions=lt.num_regions,
        factor=f,
        wpb=bm.words_per_brick,
        max_steps=max_steps,
        num_slots=num_slots,
        inner_steps=inner_steps,
        dma_per_round=dma_per_round,
        use_macro=use_macro,
        brick_layout=bm.brick_layout,
        shortlist=shortlist,
        double_step=double_step,
        diag=return_phases,
    )
    n_extra = 10 if return_phases else 0
    outs = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=[ray_spec] * (9 + n_extra),
        out_shape=[jax.ShapeDtypeStruct(((n + padn) // 128, 128), I32)]
        + [jax.ShapeDtypeStruct(((n + padn) // 128, 128), F32)] * 6
        + [jax.ShapeDtypeStruct(((n + padn) // 128, 128), I32)] * (2 + n_extra),
        scratch_shapes=[
            pltpu.VMEM((num_slots * 8, 128), I32),  # line cache
            pltpu.SMEM((num_slots,), I32),  # line tags (scalar per slot)
            pltpu.SMEM((2,), I32),  # round-robin counter
            pltpu.SMEM((max(dma_per_round, 1),), I32),  # in-flight flags
            pltpu.SemaphoreType.DMA((max(dma_per_round, 1),)),
            pltpu.VMEM((max(shortlist, 1) * rows_per_tile, 128), I32),  # votes
        ],
        interpret=interpret,
    )(lt.macro, lt.macro2, *ins, lt.region_lines,
      lt.brick_lines if lt.brick_lines is not None else brick_lines_view(bm))

    flags = outs[0].reshape(-1)[:n]
    hit = (flags & 1) == 1
    hit_imm = (flags & 2) == 2
    pos = jnp.stack([o.reshape(-1)[:n] for o in outs[1:4]], axis=-1)
    nrm = jnp.stack([o.reshape(-1)[:n] for o in outs[4:7]], axis=-1)
    steps = outs[7].reshape(-1)[:n]
    pos = jnp.where(hit_imm[:, None], start_c * F32(f), pos)
    nrm = jnp.where(hit_imm[:, None], start_normal, nrm)
    res = TraceOut(hit=hit, position=pos, normal=nrm, steps=steps)
    if return_phases:
        names = ("stall", "mskip", "cadv", "pend", "desc", "fstep",
                 "step2", "asc", "xrun", "adjstall")
        phases = {
            k: outs[9 + i].reshape(-1)[:n] for i, k in enumerate(names)
        }
        phases["iters"] = outs[8].reshape(-1)[:n]
        if return_iters:
            return res, outs[8].reshape(-1)[:n], phases
        return res, phases
    if return_iters:
        return res, outs[8].reshape(-1)[:n]
    return res


# --------------------------------------------------------------------------
# Row-granular ray retirement (experimental round-2 prototype; see
# NOTES_ROUND3.md): instead of a grid of fixed ray tiles that each run to
# their slowest ray, ONE kernel invocation keeps R 128-ray rows in flight
# and, whenever a row finishes, DMA-writes its results and refills it from
# an HBM queue of pending rows.  Removes the tile-lockstep tail while
# preserving the block-order spatial coherence the line cache rides.
# --------------------------------------------------------------------------


def _rr_kernel(
    macro_ref, macro2_ref,
    rays_hbm, regions_hbm, bricks_hbm,
    out_hbm,
    cache_ref, tags_smem, rr_ref, started_ref, sems_ref,
    ray_stage, out_stage, rowid_ref, stage_sems, cand_ref,
    *,
    grid_dims, region_dims, num_regions: int, factor: int, wpb: int,
    max_steps: int, num_slots: int, inner_steps: int, dma_per_round: int,
    use_macro: bool, brick_layout: Layout, n_rows: int, R: int,
    shortlist: int, double_step: bool,
):
    S = num_slots
    NR = num_regions

    for s in range(S):
        tags_smem[s] = -1
    rr_ref[0] = 0
    for _k in range(dma_per_round):
        started_ref[_k] = 0
    for g in range(R):
        rowid_ref[g] = -1

    macro = macro_ref[:]
    macro_row0 = jnp.broadcast_to(macro[0:1, :], (8, 128))
    macro2_words = tuple(
        macro2_ref[k] for k in range(MACRO2_WORDS + MACRO3_WORDS)
    )
    inner = functools.partial(
        _trace_inner,
        grid_dims=grid_dims, region_dims=region_dims, num_regions=num_regions,
        factor=factor, wpb=wpb, max_steps=max_steps,
        use_macro=use_macro, brick_layout=brick_layout,
        double_step=double_step,
    )

    zero = jnp.zeros((R, 128), F32)
    zeroi = jnp.zeros((R, 128), I32)
    sub = jax.lax.broadcasted_iota(I32, (R, 128), 0)
    nol = jnp.full((R, 128), NOLINE, I32)

    def bitf(v):
        return jax.lax.bitcast_convert_type(v, F32)

    def biti(v):
        return jax.lax.bitcast_convert_type(v, I32)

    def retire_row(g, st):
        """DMA row g's results to its queue slot (call under pl.when)."""
        def rowsum_i(v):
            return jnp.sum(jnp.where(sub == g, v, 0), axis=0, keepdims=True)

        def rowsum_f(v):
            return biti(jnp.sum(jnp.where(sub == g, v, 0.0), axis=0, keepdims=True))

        (act, fine, pend, hit, imm, hit_imm, steps) = st[0:7]
        (pox, poy, poz, nox, noy, noz) = st[36:42]
        out_stage[0:1, :] = rowsum_i(hit | (hit_imm << 1))
        out_stage[1:2, :] = rowsum_f(pox)
        out_stage[2:3, :] = rowsum_f(poy)
        out_stage[3:4, :] = rowsum_f(poz)
        out_stage[4:5, :] = rowsum_f(nox)
        out_stage[5:6, :] = rowsum_f(noy)
        out_stage[6:7, :] = rowsum_f(noz)
        out_stage[7:8, :] = rowsum_i(steps)
        rid = rowid_ref[g]
        cp = pltpu.make_async_copy(
            out_stage, out_hbm.at[pl.ds(rid * 8, 8), :], stage_sems.at[1]
        )
        cp.start()
        cp.wait()

    def outer_body(carry):
        it, qpos = carry[0], carry[1]
        env_dyn = carry[2:12]  # sx, sy, sz, dx, dy, dz, act0?, padx, pady, padz
        st = carry[12:]
        (sx, sy, sz, dx, dy, dz, padxf, padyf, padzf, _unused) = env_dyn
        act = st[0]

        # ---- retirement + refill round ----
        fill = jnp.zeros((R, 128), jnp.bool_)
        nsx, nsy, nsz, ndx, ndy, ndz = sx, sy, sz, dx, dy, dz
        npadx, npady, npadz = padxf, padyf, padzf
        nact_fill = zeroi
        for g in range(R):
            row_busy = jnp.max(jnp.where(sub == g, act, 0))
            done = row_busy == 0

            @pl.when(done & (rowid_ref[g] >= 0))
            def _(g=g):
                retire_row(g, st)
                rowid_ref[g] = -1

            can_fill = done & (rowid_ref[g] < 0) & (qpos < n_rows)

            @pl.when(can_fill)
            def _(g=g, qpos=qpos):
                cp = pltpu.make_async_copy(
                    rays_hbm.at[pl.ds(qpos * 16, 16), :], ray_stage,
                    stage_sems.at[0],
                )
                cp.start()
                cp.wait()
                rowid_ref[g] = qpos

            stg = ray_stage[:]
            m = can_fill & (sub == g)

            def brow(k, f32=False):
                r = stg[k : k + 1, :]
                if f32:
                    r = bitf(r)
                return jnp.broadcast_to(r, (R, 128))

            nsx = jnp.where(m, brow(0, True), nsx)
            nsy = jnp.where(m, brow(1, True), nsy)
            nsz = jnp.where(m, brow(2, True), nsz)
            ndx = jnp.where(m, brow(3, True), ndx)
            ndy = jnp.where(m, brow(4, True), ndy)
            ndz = jnp.where(m, brow(5, True), ndz)
            nact_fill = jnp.where(m, brow(6), nact_fill)
            npadx = jnp.where(m, brow(7), npadx)
            npady = jnp.where(m, brow(8), npady)
            npadz = jnp.where(m, brow(9), npadz)
            fill = fill | m
            qpos = jnp.where(can_fill, qpos + 1, qpos)

        sx, sy, sz, dx, dy, dz = nsx, nsy, nsz, ndx, ndy, ndz
        padxf, padyf, padzf = npadx, npady, npadz

        # derived per-ray constants (deterministic recompute: unchanged
        # rows reproduce their previous values exactly)
        stx = jnp.where(dx > 0.0, 1, -1)
        sty = jnp.where(dy > 0.0, 1, -1)
        stz = jnp.where(dz > 0.0, 1, -1)
        tdx = jnp.where(dx != 0.0, jnp.abs(1.0 / dx), BIG)
        tdy = jnp.where(dy != 0.0, jnp.abs(1.0 / dy), BIG)
        tdz = jnp.where(dz != 0.0, jnp.abs(1.0 / dz), BIG)
        eps32 = 1.1920929e-07
        ivx = 1.0 / jnp.where(dx == 0.0, eps32, dx)
        ivy = 1.0 / jnp.where(dy == 0.0, eps32, dy)
        ivz = 1.0 / jnp.where(dz == 0.0, eps32, dz)

        # seed refilled rows' DDA state (everything else zeroed)
        ccx0 = sx.astype(I32)
        ccy0 = sy.astype(I32)
        ccz0 = sz.astype(I32)
        ctx0 = jnp.where(dx != 0.0, ((ccx0 + (stx > 0)).astype(F32) - sx) / dx, BIG)
        cty0 = jnp.where(dy != 0.0, ((ccy0 + (sty > 0)).astype(F32) - sy) / dy, BIG)
        ctz0 = jnp.where(dz != 0.0, ((ccz0 + (stz > 0)).astype(F32) - sz) / dz, BIG)

        def zf(v):  # zero f32 on filled lanes
            return jnp.where(fill, 0.0, v)

        def zi(v):  # zero i32 on filled lanes
            return jnp.where(fill, 0, v)

        st = list(st)
        st[0] = jnp.where(fill, nact_fill, st[0])  # act
        for k in (1, 2, 3, 4, 5, 6):  # fine, pend, hit, imm, hit_imm, steps
            st[k] = zi(st[k])
        st[7] = jnp.where(fill, ccx0, st[7])
        st[8] = jnp.where(fill, ccy0, st[8])
        st[9] = jnp.where(fill, ccz0, st[9])
        st[10] = jnp.where(fill, ctx0, st[10])
        st[11] = jnp.where(fill, cty0, st[11])
        st[12] = jnp.where(fill, ctz0, st[12])
        st[13] = zf(st[13])  # centry
        for k in (14, 15, 16):  # fcell
            st[k] = zi(st[k])
        for k in range(17, 26):  # ftx..fpz
            st[k] = zf(st[k])
        for k in (26, 27, 28, 29):  # fpads, fsteps
            st[k] = zi(st[k])
        for k in range(30, 42):  # cn, fn, po, no
            st[k] = zf(st[k])
        st[42] = zi(st[42])  # pmeta
        st[43] = zi(st[43])  # bslot
        st[44] = jnp.where(fill, nol, st[44])  # want
        st[45] = jnp.where(fill, -1, st[45])  # held word id
        st[46] = zi(st[46])  # held word
        st = tuple(st)

        env = (sx, sy, sz, dx, dy, dz,
               stx, sty, stz, tdx, tdy, tdz, ivx, ivy, ivz,
               padxf, padyf, padzf, macro, macro_row0, macro2_words)

        # ---- line-cache DMA round (shared with the tile kernel) ----
        act2, want = st[0], st[44]
        _run_dma_round(
            cache_ref, tags_smem, rr_ref, started_ref, sems_ref,
            regions_hbm, bricks_hbm, act2, want,
            S=S, NR=NR, dma_per_round=dma_per_round,
        )

        # ---- inner steps ----
        if shortlist < 0:
            rot = jax.lax.rem(it, jnp.int32(S))
            fetch = _make_fetch_pervote(
                cache_ref, tags_smem, cand_ref, rot, S=S
            )
        elif shortlist:
            rot = jax.lax.rem(it, jnp.int32(S))
            fetch = _stage_shortlist(
                cache_ref, tags_smem, cand_ref, act2, want, rot,
                S=S, K=shortlist,
            )
        else:
            fetch = _make_fetch_full(cache_ref, tags_smem, S=S)
        st = jax.lax.fori_loop(
            0, inner_steps, lambda i, c: inner(env, fetch, c), st,
            unroll=False,
        )
        return (it + 1, qpos) + (sx, sy, sz, dx, dy, dz, padxf, padyf, padzf,
                                 zeroi) + st

    env0 = (zero, zero, zero, zero, zero, zero, zeroi, zeroi, zeroi, zeroi)
    state0 = (zeroi,) * 7 + (zeroi,) * 3 + (zero,) * 3 + (zero,) + \
        (zeroi,) * 3 + (zero,) * 9 + (zeroi,) * 4 + (zero,) * 12 + \
        (zeroi, zeroi, jnp.full((R, 128), NOLINE, I32),
         jnp.full((R, 128), -1, I32), zeroi)
    init = (jnp.int32(0), jnp.int32(0)) + env0 + state0

    # 3*max_steps: the non-fused pend->descend->ascend cycle charges one
    # step per three iterations (see trace_brickmap_hbm's cap comment)
    iter_limit = (
        (n_rows + R) * (3 * max_steps + 64) // R // max(inner_steps, 1) + 64
    ) * ((num_slots + 2) if shortlist else 1)

    def cond(c):
        return (c[0] < iter_limit) & (jnp.any(c[12] != 0) | (c[1] < n_rows))

    out = jax.lax.while_loop(cond, outer_body, init)
    st = out[12:]
    # cap-exit truncation is non-silent (see trace_brickmap_hbm): lanes
    # still active when the cap binds report the full step budget
    st = st[0:6] + (jnp.where(st[0] != 0, jnp.int32(max_steps), st[6]),) + st[7:]

    # final sweep: rows that finished on the last iteration
    for g in range(R):
        @pl.when(rowid_ref[g] >= 0)
        def _(g=g):
            retire_row(g, st)
            rowid_ref[g] = -1


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "rows_inflight", "num_slots", "inner_steps",
        "dma_per_round", "use_macro", "interpret", "shortlist", "double_step",
    ),
)
def trace_brickmap_hbm_rr(
    bm: BrickMap,
    lt: LineTable,
    origins,
    rays,
    max_steps: int = MAX_STEPS,
    rows_inflight: int = 16,
    num_slots: int = 16,
    inner_steps: int = 8,
    dma_per_round: int = 4,
    use_macro: bool = True,
    interpret: bool | None = None,
    shortlist: int = 0,
    double_step: bool = True,
) -> TraceOut:
    """Row-retirement variant of :func:`trace_brickmap_hbm` (see the
    kernel comment): identical semantics, different scheduling — finished
    128-ray rows retire individually and are replaced from the queue, so
    no ray waits on a whole tile's slowest straggler."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dma_per_round = min(dma_per_round, num_slots)  # see trace_brickmap_hbm
    gx, gy, gz = bm.grid_dims
    f = bm.factor
    gdims = jnp.asarray([gx, gy, gz], I32)

    origins = jnp.asarray(origins, F32)
    d = _normalize(jnp.asarray(rays, F32))
    n = origins.shape[0]

    start_c = origins / F32(f)
    inside = jnp.all((start_c >= 0.0) & (start_c < gdims.astype(F32)), axis=-1)
    eps = jnp.float32(FLT_EPS_DDA)
    whit, _, wpt, wnrm = ray_aabb(
        start_c, d, jnp.full((3,), eps), gdims.astype(F32) - eps
    )
    start_c = jnp.where(inside[:, None], start_c, jnp.where(whit[:, None], wpt, start_c))
    start_normal = jnp.where(inside[:, None], 0.0, wnrm)
    active0 = (inside | whit).astype(I32)
    pad = _edge_pad(start_c.astype(I32), gdims, d)

    padn = (-n) % 128
    def pad1(a, fill=0):
        if padn:
            a = jnp.concatenate([a, jnp.full((padn,), fill, a.dtype)])
        return a.reshape(-1, 128)

    biti = lambda v: jax.lax.bitcast_convert_type(v, I32)  # noqa: E731
    fields = [
        biti(pad1(start_c[:, 0])), biti(pad1(start_c[:, 1])),
        biti(pad1(start_c[:, 2])),
        biti(pad1(d[:, 0], 1.0)), biti(pad1(d[:, 1], 1.0)),
        biti(pad1(d[:, 2], 1.0)),
        pad1(active0), pad1(pad[:, 0]), pad1(pad[:, 1]), pad1(pad[:, 2]),
    ]
    n_rows = fields[0].shape[0]
    zero_rows = jnp.zeros((n_rows, 128), I32)
    packed = jnp.stack(fields + [zero_rows] * 6, axis=1)  # [n_rows, 16, 128]
    rays_flat = packed.reshape(n_rows * 16, 128)

    R = rows_inflight
    kern = functools.partial(
        _rr_kernel,
        grid_dims=(gx, gy, gz),
        region_dims=lt.region_dims,
        num_regions=lt.num_regions,
        factor=f,
        wpb=bm.words_per_brick,
        max_steps=max_steps,
        num_slots=num_slots,
        inner_steps=inner_steps,
        dma_per_round=dma_per_round,
        use_macro=use_macro,
        brick_layout=bm.brick_layout,
        n_rows=n_rows,
        R=R,
        shortlist=shortlist,
        double_step=double_step,
    )
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows * 8, 128), I32),
        scratch_shapes=[
            pltpu.VMEM((num_slots * 8, 128), I32),  # line cache
            pltpu.SMEM((num_slots,), I32),  # line tags (scalar per slot)
            pltpu.SMEM((2,), I32),  # cache round-robin
            pltpu.SMEM((max(dma_per_round, 1),), I32),  # in-flight flags
            pltpu.SemaphoreType.DMA((max(dma_per_round, 1),)),
            pltpu.VMEM((16, 128), I32),  # ray refill stage
            pltpu.VMEM((8, 128), I32),  # output stage
            pltpu.SMEM((R,), I32),  # rowid per slot
            pltpu.SemaphoreType.DMA((2,)),  # refill / writeback
            pltpu.VMEM((max(shortlist, 1) * R, 128), I32),  # shortlist votes
        ],
        interpret=interpret,
    )(lt.macro, lt.macro2, rays_flat, lt.region_lines,
      lt.brick_lines if lt.brick_lines is not None else brick_lines_view(bm))

    o = out.reshape(n_rows, 8, 128)
    bitf = lambda v: jax.lax.bitcast_convert_type(v, F32)  # noqa: E731
    flags = o[:, 0].reshape(-1)[:n]
    hit = (flags & 1) == 1
    hit_imm = (flags & 2) == 2
    pos = jnp.stack([bitf(o[:, k]).reshape(-1)[:n] for k in (1, 2, 3)], axis=-1)
    nrm = jnp.stack([bitf(o[:, k]).reshape(-1)[:n] for k in (4, 5, 6)], axis=-1)
    steps = o[:, 7].reshape(-1)[:n]
    pos = jnp.where(hit_imm[:, None], start_c * F32(f), pos)
    nrm = jnp.where(hit_imm[:, None], start_normal, nrm)
    return TraceOut(hit=hit, position=pos, normal=nrm, steps=steps)
