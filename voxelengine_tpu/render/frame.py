"""Frame rendering: primary rays -> traversal -> shading -> framebuffer.

Equivalent of the reference's ``screenDispatch`` kernel + ``RenderScreen``
host wrapper (``Renderer.cu:179-328``), restructured for TPU: the kernel's
per-thread work becomes one fused, jitted pipeline over a flat pixel batch
(camera -> trace -> shade), and the per-frame scatter into a persistent
framebuffer implements the checkerboard/interlace trick
(``Renderer.cu:186-194,311-313``) as an index remap + masked scatter.

Faithfully reproduced details:
* checkerboard row remap ``y = 2*y' + (x even) + (frame even)`` with
  out-of-range rows dropped;
* DEBUG_VIEW quadrants: normals / hit-pos mod 128 / untouched / distance,
  plus the bottom-left step-count heatmap overlay (``Renderer.cu:215-243,
  270-275``) and its exact write masks (the bottom-left quadrant row at
  ``y == H/2`` keeps stale framebuffer content, like the reference);
* sky = raw ray direction channel-clamped at store (``Renderer.cu:254-258``);
* the crosshair write uses the pre-remap row index, so — exactly like the
  reference — it never fires while checkerboarding (``Renderer.cu:260-268``);
* normals are negated before display/shading (``Renderer.cu:212``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from voxelengine_tpu.config import (
    FLT_EPS_DDA,
    DebugView,
    Environment,
    Projection,
    RenderConfig,
)
from voxelengine_tpu.core.brickmap import BrickMap
from voxelengine_tpu.ops.noise import random_float
from voxelengine_tpu.ops.pallas_bigtrace import (
    LineTable,
    trace_brickmap_hbm,
    trace_brickmap_hbm_staged,
)
from voxelengine_tpu.ops.trace import TraceOut, trace_brickmap, trace_brickmap_staged
from voxelengine_tpu.render import camera as cam
from voxelengine_tpu.render.shading import calculate_color, reflect, tonemap

F32 = jnp.float32


def make_framebuffer(cfg: RenderConfig) -> jax.Array:
    """Persistent RGB float framebuffer (the SDL streaming texture analog,
    ``SDLRenderer.cpp:19-31``)."""
    return jnp.zeros((cfg.height, cfg.width, 3), F32)


def _block_side(n):
    # largest divisor of n that is <= 32 (1080p checkerboard: 540 -> 30)
    for b in range(32, 0, -1):
        if n % b == 0:
            return b
    return 1


def block_geometry(cfg: RenderConfig):
    """(block_w, block_h, num_blocks) of the tile-order pixel blocking."""
    rows = cfg.height // 2 if cfg.checkerboard else cfg.height
    bw, bh = _block_side(cfg.width), _block_side(rows)
    return bw, bh, (cfg.width // bw) * (rows // bh)


def block_permutation_from_steps(steps, cfg: RenderConfig, prev_perm=None):
    """Difficulty-sort permutation of pixel blocks from a previous frame's
    per-ray step counts (taken in tile_order).

    Kernel ray tiles run until their slowest ray finishes; grouping blocks
    of similar path length means a tile of easy blocks is never chained to
    a horizon straggler block (lockstep waste drops toward the block-level
    bound).  Purely a performance reordering — results are scatter-exact
    regardless of ray order.  Temporal: frame N's steps sort frame N+1;
    if frame N itself rendered under a permutation, pass it as
    ``prev_perm`` so stream-slot costs map back to original block ids
    (stream block j of a permuted frame is original block prev_perm[j]).
    """
    bw, bh, nb = block_geometry(cfg)
    cost = steps.reshape(nb, bw * bh).max(axis=1)
    order = jnp.argsort(-cost)
    return order if prev_perm is None else jnp.asarray(prev_perm)[order]


def _unblock(a, cfg: RenderConfig, block_perm=None):
    """Invert the tile_order ray layout back to a [rows, W, ...] image.

    Pure reshape/transpose (+ a block-granular take when ``block_perm``
    reordered the stream) — never a scatter, which lowers to the scalar
    core on TPU (measured 44.7 ms/frame at 1080p for the naive
    ``fb.at[py, px].set``; this path is ~10x cheaper).
    """
    W = cfg.width
    rows = cfg.height // 2 if cfg.checkerboard else cfg.height
    rest = a.shape[1:]
    bw, bh = _block_side(W), _block_side(rows)
    if cfg.tile_order and bw * bh > 1:
        if block_perm is not None:
            a = jnp.take(
                a.reshape(-1, bh * bw, *rest), jnp.argsort(block_perm), axis=0
            )
        a = a.reshape(rows // bh, W // bw, bh, bw, *rest)
        a = a.transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
    return a.reshape(rows, W, *rest)


def composite_frame(
    framebuffer, color, write, cfg: RenderConfig, frame_number, block_perm=None
):
    """Write a frame's shaded pixel stream into the persistent framebuffer.

    Implements the checkerboard row interleave ``y = 2*y' + (x even) +
    (frame even)`` (``Renderer.cu:186-196``) — including the dropped
    overflow row — entirely with static layout ops and masked selects.
    """
    H, W = cfg.height, cfg.width
    h = _unblock(color, cfg, block_perm)  # [rows, W, 3]
    w = _unblock(write, cfg, block_perm)  # [rows, W] bool
    if not cfg.checkerboard:
        return jnp.where(w[..., None], h, framebuffer)
    if H % 2:  # odd-height checkerboard: rare; keep the scatter form
        py_r = jnp.arange(H // 2)[:, None]
        px = jnp.arange(W)[None, :]
        py = py_r * 2 + jnp.where(px % 2 == 0, 1, 0) + jnp.where(
            frame_number % 2 == 0, 1, 0
        )
        py_w = jnp.where(w & (py < H), py, H)
        return framebuffer.at[py_w, jnp.broadcast_to(px, py.shape)].set(
            h, mode="drop"
        )
    # checkerboard: rows' target y = 2*y' + off, off = (x even)+(frame even)
    # the off == 2 case shifts even columns down one row pair; the global
    # top's missing source is an all-zero/never-write row
    h_prev = jnp.concatenate([jnp.zeros_like(h[:1]), h[:-1]], axis=0)
    w_prev = jnp.concatenate([jnp.zeros_like(w[:1]), w[:-1]], axis=0)
    return checkerboard_pair_select(
        framebuffer, h, w, h_prev, w_prev, frame_number
    )


def checkerboard_pair_select(framebuffer, h, w, h_prev, w_prev, frame_number):
    """Scatter-free checkerboard composite of a pre-remap row image into
    the framebuffer's row pairs (``y = 2*y' + (x even) + (frame even)``,
    ``Renderer.cu:186-196``, including the dropped overflow row).

    ``h_prev``/``w_prev`` supply each row's PREDECESSOR pre-remap row
    (the even-frame ``+2`` source): the single-device path shifts ``h``
    down one row; the row-sharded path substitutes its cross-device halo
    row — one implementation serves both (they are asserted equal by
    ``test_sharded_render_hbm_kernel_matches_single``).
    """
    rows, W = w.shape
    ce = (jnp.arange(W) % 2 == 0)[None, :]  # column parity
    q = frame_number % 2 == 0
    src0 = jnp.where(q, h_prev, h)  # even target rows
    m0 = jnp.where(q, ce & w_prev, (~ce) & w)
    m1 = w & jnp.where(q, ~ce, ce)  # odd target rows take h
    pairs = framebuffer.reshape(rows, 2, W, 3)
    p0 = jnp.where(m0[..., None], src0, pairs[:, 0])
    p1 = jnp.where(m1[..., None], h, pairs[:, 1])
    return jnp.stack([p0, p1], axis=1).reshape(2 * rows, W, 3)


def primary_rays(cfg: RenderConfig, origin, euler, frame_number, block_perm=None,
                 ortho_size=None):
    """Build the frame's primary rays.

    Returns (origins [N,3], dirs [N,3], px [N], py [N]) where (px, py) are
    final framebuffer coordinates (checkerboard-remapped; py may equal H for
    dropped rows, ``Renderer.cu:186-196``).  ``block_perm`` (optional, only
    with ``tile_order``): emit the pixel blocks in this order (see
    :func:`block_permutation_from_steps`).  ``ortho_size`` (optional [2]
    array) overrides ``cfg.ortho_size`` as a TRACED value so interactive
    zoom (``SetOrthoWindowSize``, ``main.cu:94-107``) never recompiles.
    """
    W, H = cfg.width, cfg.height
    rows = H // 2 if cfg.checkerboard else H
    xg, yg = jnp.meshgrid(jnp.arange(W), jnp.arange(rows), indexing="xy")
    bw, bh = _block_side(W), _block_side(rows)
    if cfg.tile_order and bw * bh > 1:
        # order rays as ~32x32 pixel blocks: the coherent-tile layout the
        # Pallas traversal wants (neighbouring rays share cache lines);
        # px/py travel with the rays, so the final scatter needs no inverse
        def blocked(a):
            a = (
                a.reshape(rows // bh, bh, W // bw, bw)
                .transpose(0, 2, 1, 3)
                .reshape(-1)
            )
            if block_perm is not None:
                a = a.reshape(-1, bh * bw)[block_perm].reshape(-1)
            return a
        px = blocked(xg)
        py_r = blocked(yg)
    else:
        px = xg.reshape(-1)
        py_r = yg.reshape(-1)
    if cfg.checkerboard:
        py = py_r * 2 + jnp.where(px % 2 == 0, 1, 0) + jnp.where(frame_number % 2 == 0, 1, 0)
    else:
        py = py_r

    u = px.astype(F32) / F32(W)
    v = py.astype(F32) / F32(H)
    fwd, up, right = cam.get_directions(euler)
    origin = jnp.asarray(origin, F32)
    if cfg.projection is Projection.PERSPECTIVE:
        dirs = cam.ray_direction(fwd, up, right, W, H, u, v, cfg.fov_degrees)
        origins = jnp.broadcast_to(origin, dirs.shape)
    else:
        dirs = jnp.broadcast_to(fwd, (px.shape[0], 3))
        osz = cfg.ortho_size if ortho_size is None else ortho_size
        origins = cam.ray_origin_ortho(fwd, up, right, W, H, u, v, origin, osz)
    return origins, dirs, px, py, py_r


def probe_use_macro(bm, lt, origins, dirs, cfg: RenderConfig, stride=4):
    """Probe-informed macro selection (round-3 measurement): trace a
    stride-sampled subset of a frame's rays with the diagnostic phase
    counters and return ``False`` when zero macro-skip iterations fire.

    Terrain-bound camera rays never leave occupied regions (measured
    0.0% of lane-iterations on the 8k bench scene), and the macro span
    machinery costs ~4-10% of every iteration — tracing without it is
    then bit-identical (same fetches, same advances).  A missed isolated
    skip lane can only cost that few-%% choice, never correctness; the
    decision is a perf hint, not a semantics switch."""
    import numpy as np

    _, ph = trace_brickmap_hbm(
        bm, lt, origins[::stride], dirs[::stride], cfg.max_steps,
        tile=cfg.trace_tile, num_slots=cfg.trace_slots,
        shortlist=cfg.trace_shortlist, return_phases=True,
    )
    return int(np.asarray(ph["mskip"]).sum()) != 0


def _secondary_trace(bm, lt, cfg: RenderConfig, origins, dirs, max_steps, fused=None):
    """Secondary-ray trace (shadows, AO): uses the HBM line-table kernel
    when one is available (the XLA path is gather-bound on big worlds)."""
    if lt is not None:
        return trace_brickmap_hbm(
            bm, lt, origins, dirs, max_steps,
            tile=cfg.trace_tile, num_slots=cfg.trace_slots,
            shortlist=cfg.trace_shortlist, use_macro=cfg.trace_use_macro,
        )
    return trace_brickmap(bm, origins, dirs, max_steps, fused=fused)


def _ambient_occlusion(
    bm: BrickMap, position, normal, px, py, frame_number, cfg: RenderConfig,
    lt=None, fused=None, secondary=None,
):
    """Hemisphere-sampled AO (working version of the reference's disabled
    scaffolding, ``Renderer.cu:120-165``): short 8-step occlusion rays with
    distance falloff, seeded per pixel/frame via the noise hash.
    ``secondary``: optional ``(origins, dirs, max_steps) -> TraceOut``
    override for the occlusion traces (distributed-world renders)."""
    W = cfg.width
    seed = (py * W + px).astype(jnp.int32)
    occ = jnp.zeros(position.shape[0], F32)
    for i in range(cfg.ao_samples):
        # distinct multipliers for the sample and frame terms: a shared
        # 1000 would alias frame n sample i with frame n+1 sample i-1,
        # re-tracing ao_samples-1 identical directions every frame
        si = seed + jnp.int32(i * 1000) + (frame_number + 1) * 7919
        sd = jnp.stack(
            [
                random_float(si.astype(jnp.uint32)) * 2.0 - 1.0,
                random_float((si * 10).astype(jnp.uint32)) * 2.0 - 1.0,
                random_float((si * 100).astype(jnp.uint32)) * 2.0 - 1.0,
            ],
            axis=-1,
        )
        sd = sd / jnp.linalg.norm(sd, axis=-1, keepdims=True)
        below = jnp.sum(sd * normal, axis=-1) < 0.0
        sd = jnp.where(below[:, None], reflect(sd, normal), sd)
        res = (
            secondary(position + normal * 0.01, sd, 8)
            if secondary is not None
            else _secondary_trace(bm, lt, cfg, position + normal * 0.01, sd, 8, fused)
        )
        dist = jnp.linalg.norm(res.position - position, axis=-1)
        falloff = 1.0 - jnp.minimum(1.0 / jnp.maximum(dist * 10.0, 1e-6), 1.0)
        occ = occ + jnp.where(res.hit, falloff, 1.0)
    return occ / F32(cfg.ao_samples)


def shade_pixels(
    bm: BrickMap,
    origins,
    dirs,
    px,
    py,
    py_r,
    origin,
    env: Environment,
    frame_number,
    cfg: RenderConfig,
    fused=None,
    lt: Optional[LineTable] = None,
):
    """Trace + shade a flat pixel batch; returns ``(color [N,3], write [N])``.

    The per-pixel body of ``screenDispatch`` (``Renderer.cu:179-276``),
    shared by the single-device and sharded render paths.  With ``lt`` the
    traversal runs in the fused HBM-line-table Pallas kernel (the flagship
    path for big worlds; never truncates — every ray runs to its hit or the
    full step budget); otherwise the XLA state machine (staged or plain).
    """
    W, H = cfg.width, cfg.height
    if lt is not None:
        if cfg.trace_stage_steps:
            out = trace_brickmap_hbm_staged(
                bm, lt, origins, dirs, cfg.max_steps,
                stage_steps=cfg.trace_stage_steps,
                tail_frac=cfg.trace_tail_frac,
                tile=cfg.trace_tile, num_slots=cfg.trace_slots,
                shortlist=cfg.trace_shortlist,
                use_macro=cfg.trace_use_macro,
            )
        else:
            out = trace_brickmap_hbm(
                bm, lt, origins, dirs, cfg.max_steps,
                tile=cfg.trace_tile, num_slots=cfg.trace_slots,
                shortlist=cfg.trace_shortlist,
                use_macro=cfg.trace_use_macro,
            )
    elif cfg.staged_trace:
        out: TraceOut = trace_brickmap_staged(
            bm, origins, dirs, cfg.max_steps,
            stage_iters=cfg.stage_iters, tail_frac=cfg.tail_frac, fused=fused,
            schedule=cfg.stage_schedule,
        )
    else:
        out = trace_brickmap(bm, origins, dirs, cfg.max_steps, fused=fused)
    return shade_traced(
        bm, out, origins, dirs, px, py, py_r, origin, env, frame_number, cfg, lt,
        fused=fused,
    )


def shade_traced(
    bm,
    out: TraceOut,
    origins,
    dirs,
    px,
    py,
    py_r,
    origin,
    env: Environment,
    frame_number,
    cfg: RenderConfig,
    lt: Optional[LineTable] = None,
    fused=None,
    secondary=None,
):
    """Shading/compositing stage of ``screenDispatch`` given trace results;
    ``bm``/``lt``/``fused`` are only needed for the optional shadow/AO
    secondary traces (``fused`` keeps the XLA fallback single-gather).
    ``secondary``: optional ``(origins, dirs, max_steps) -> TraceOut``
    trace override — distributed-world renders route shadow/AO rays through
    their own sharded tracer instead of a local brickmap."""
    W, H = cfg.width, cfg.height
    normal = -out.normal  # Renderer.cu:212
    steps = out.steps

    cam_pos = jnp.asarray(origin, F32)
    shadow_hit = None
    if cfg.shadow_rays and (bm is not None or secondary is not None):
        L = env.light_direction
        sdirs = jnp.broadcast_to(L, normal.shape)
        sres = (
            secondary(out.position + L * 0.01, sdirs, cfg.max_steps)
            if secondary is not None
            else _secondary_trace(
                bm, lt, cfg, out.position + L * 0.01, sdirs, cfg.max_steps,
                fused,
            )
        )
        shadow_hit = sres.hit & out.hit
        steps = steps + jnp.where(out.hit, sres.steps, 0)

    dist = jnp.linalg.norm(out.position - origins, axis=-1)

    if cfg.debug_view is DebugView.SHADED:
        color = calculate_color(cam_pos, normal, out.position, env, shadow_hit)
        if cfg.reflections and (bm is not None or secondary is not None):
            # one-bounce mirror reflection (extension beyond the reference;
            # see RenderConfig.reflections): trace the reflected ray through
            # the same path as the primaries, shade its hit with the same
            # model (reflected sky = raw ray direction, like the primary
            # miss rule Renderer.cu:254-258), lerp by reflectivity.  Miss
            # pixels trace from the inf sentinel like the AO/shadow rays
            # and are discarded by the sky overwrite below.
            rdir = reflect(dirs, normal)
            ro = out.position + normal * 0.01
            rres = (
                secondary(ro, rdir, cfg.max_steps)
                if secondary is not None
                else _secondary_trace(bm, lt, cfg, ro, rdir, cfg.max_steps,
                                      fused)
            )
            rcol = calculate_color(ro, -rres.normal, rres.position, env, None)
            rcol = jnp.where(rres.hit[:, None], rcol, rdir)
            color = color + (rcol - color) * F32(cfg.reflectivity)
        if cfg.ao_samples > 0 and (bm is not None or secondary is not None):
            l_dot = jnp.maximum(jnp.sum(normal * env.light_direction, axis=-1), 0.0)
            ao = _ambient_occlusion(
                bm, out.position, normal, px, py, frame_number, cfg, lt, fused,
                secondary,
            )
            color = jnp.where((l_dot == 0.0)[:, None], color * ao[:, None], color)
        color = tonemap(color)
        write = jnp.ones_like(out.hit)
    elif cfg.debug_view is DebugView.DEBUG:
        hp = out.position / F32(cfg.debug_pos_mod)
        hp = jnp.mod(hp, F32(1.0) + F32(FLT_EPS_DDA))
        left = px < (W >> 1)
        top = py < (H >> 1)
        color = jnp.where(
            top[:, None],
            jnp.where(left[:, None], normal, hp),
            jnp.stack([dist * 0.01, jnp.zeros_like(dist), jnp.zeros_like(dist)], -1),
        )
        # bottom-left quadrant: no write on hit (Renderer.cu:233-235)
        write = ~(left & ~top)
    elif cfg.debug_view is DebugView.NORMALS:
        color = normal
        write = jnp.ones_like(out.hit)
    elif cfg.debug_view is DebugView.DEPTH:
        color = jnp.stack([dist * 0.01, jnp.zeros_like(dist), jnp.zeros_like(dist)], -1)
        write = jnp.ones_like(out.hit)
    else:  # STEPS
        color = jnp.stack(
            [steps.astype(F32) / 256.0, jnp.zeros_like(dist), jnp.zeros_like(dist)], -1
        )
        write = jnp.ones_like(out.hit)

    # miss -> sky = raw ray direction (Renderer.cu:254-258)
    color = jnp.where(out.hit[:, None], color, dirs)
    write = write | ~out.hit

    # crosshair: uses the PRE-remap row, so it only fires without
    # checkerboarding — reference behavior (Renderer.cu:260-268)
    if cfg.crosshair:
        cross = (px == (W >> 1)) & (py_r == (H >> 1))
        color = jnp.where(cross[:, None], 10.0, color)
        write = write | cross

    if cfg.debug_view is DebugView.DEBUG:
        # bottom-left step heatmap overlay (Renderer.cu:270-275)
        bl = (px < (W >> 1)) & (py > (H >> 1))
        color = jnp.where(
            bl[:, None],
            jnp.stack([steps.astype(F32) / 256.0, jnp.zeros_like(dist), jnp.zeros_like(dist)], -1),
            color,
        )
        write = write | bl

    color = jnp.clip(color, 0.0, 1.0)  # setPixelColor clamp (Renderer.cu:79-81)
    return color, write


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def render_frame(
    bm: BrickMap,
    framebuffer: jax.Array,
    origin,
    euler,
    env: Environment,
    frame_number,
    cfg: RenderConfig,
    fused=None,
    lt: Optional[LineTable] = None,
    block_perm=None,
    ortho_size=None,
) -> jax.Array:
    """Render one frame into the persistent framebuffer (RGB f32 in [0,1]).

    The full fused path of ``RenderScreen`` -> ``screenDispatch``
    (``Renderer.cu:305-328,179-276``).  ``frame_number`` is a traced scalar
    so checkerboard parity doesn't recompile.  ``lt`` selects the Pallas
    HBM-line-table traversal (see :func:`shade_pixels`); ``block_perm``
    optionally reorders the pixel blocks for tile-difficulty pairing
    (:func:`block_permutation_from_steps`) — output is scatter-exact
    regardless.  ``ortho_size`` (optional [2] array) zooms the ortho
    window as a traced value — no recompile per scroll tick.
    """
    origins, dirs, px, py, py_r = primary_rays(
        cfg, origin, euler, frame_number, block_perm, ortho_size
    )
    color, write = shade_pixels(
        bm, origins, dirs, px, py, py_r, origin, env, frame_number, cfg, fused, lt
    )
    return composite_frame(framebuffer, color, write, cfg, frame_number, block_perm)


def to_bgra8(fb: jax.Array) -> jax.Array:
    """RGB f32 [0,1] -> packed BGRA8888 bytes (``Renderer.cuh:29-31``,
    ``SDLRenderer.h:8-11`` byte order) for the display sink."""
    u8 = (jnp.clip(fb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    a = jnp.full(fb.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([u8[..., 2:3], u8[..., 1:2], u8[..., 0:1], a], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret"), donate_argnums=(1,)
)
def render_frame_dense(
    grid,
    framebuffer: jax.Array,
    origin,
    euler,
    env: Environment,
    frame_number,
    cfg: RenderConfig,
    interpret: bool = False,
    ortho_size=None,
) -> jax.Array:
    """``render_frame`` over a dense :class:`BitGrid` world using the fused
    VPU traversal kernel (:func:`voxelengine_tpu.ops.pallas_trace.trace_grid_vpu`)
    — realtime rates for worlds whose packed bits fit VMEM (<= ~160^3).
    (Round 4: the pair-gather fetch measured 10.2x the MXU one-hot variant
    at 1M rays on-device, identical results.)  Shadow/AO secondary rays
    are not supported on this path."""
    from voxelengine_tpu.ops.pallas_trace import trace_grid_vpu

    origins, dirs, px, py, py_r = primary_rays(
        cfg, origin, euler, frame_number, ortho_size=ortho_size
    )
    out = trace_grid_vpu(grid, origins, dirs, cfg.max_steps, interpret=interpret)
    color, write = shade_traced(
        None, out, origins, dirs, px, py, py_r, origin, env, frame_number, cfg
    )
    return composite_frame(framebuffer, color, write, cfg, frame_number)
