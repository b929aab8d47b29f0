"""Multi-device scale-out via ``shard_map`` over a ``jax.sharding.Mesh``.

The reference engine is strictly single-GPU (no NCCL/MPI anywhere — see
SURVEY.md P1-P6); its "communication backend" is cudaMemcpy + kernel
launches.  The TPU-native scale-out story is embarrassingly parallel
pixel-space sharding: each device traces its own contiguous block of
framebuffer rows against a *replicated* brickmap, so the frame path never
touches the interconnect; only diagnostics (step histograms) use an
``psum`` over ICI.

Row blocks are aligned to the checkerboard structure: device *i* owns
pre-remap rows ``[i*rows/n, (i+1)*rows/n)`` which scatter exactly into its
framebuffer rows ``[i*H/n, (i+1)*H/n)`` — checkerboarding stays local.

A ray-batch variant (``raytrace_sharded``) shards the flat ray axis for the
batch query API.  Both paths also run unmodified on a 1-device mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxelengine_tpu.config import Environment, RenderConfig
from voxelengine_tpu.core.brickmap import BrickMap
from voxelengine_tpu.ops.trace import TraceOut, trace_brickmap
from voxelengine_tpu.render import camera as cam
from voxelengine_tpu.render.frame import shade_pixels
from voxelengine_tpu.config import Projection

F32 = jnp.float32


def make_mesh(devices=None, axis: str = "rows") -> Mesh:
    """A 1D device mesh over the pixel-row axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate_world(mesh: Mesh, bm: BrickMap) -> BrickMap:
    """Replicate the brickmap arrays across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(bm, rep)


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1,)
)
def render_frame_sharded(
    bm: BrickMap,
    framebuffer: jax.Array,
    origin,
    euler,
    env: Environment,
    frame_number,
    cfg: RenderConfig,
    mesh: Mesh,
    lt=None,
    ortho_size=None,
) -> jax.Array:
    """Row-sharded frame render: ``render_frame`` semantics, N devices.

    The framebuffer should be sharded ``P('rows')``; the world replicated
    (see :func:`replicate_world`).  Returns the sharded framebuffer.

    Each device renders its own contiguous block of pre-remap rows with
    the SAME machinery as the single-device path — tile-order ray
    blocking, the flagship HBM line-table Pallas kernel when ``lt`` is
    given, and the scatter-free pair-select composite (the round-2
    44.7 -> 4.0 ms/frame win, :func:`...render.frame.composite_frame`).
    The checkerboard remap ``y = 2y' + (x even) + (frame even)`` commutes
    with row blocks; the only seam is the even-frame ``+2`` crossing,
    covered by one halo ray row per device (zero communication).
    """
    from voxelengine_tpu.render.frame import _block_side

    W, H = cfg.width, cfg.height
    n = mesh.devices.size
    cb = cfg.checkerboard
    rows_total = H // 2 if cb else H
    assert H % n == 0 and rows_total % n == 0, "height must divide the mesh"
    assert not (cb and H % 2), "checkerboard sharding needs even height"
    rows_local = rows_total // n
    bw, bh = _block_side(W), _block_side(rows_local)
    blocked = cfg.tile_order and bw * bh > 1

    # ortho window as a TRACED value (matches render.frame.primary_rays:
    # interactive zoom must not recompile the sharded path either)
    osz = jnp.asarray(
        cfg.ortho_size if ortho_size is None else ortho_size, F32
    )

    def rays_for_rows(origin, euler, frame_number, px, py_r, osz):
        py = (
            py_r * 2
            + jnp.where(px % 2 == 0, 1, 0)
            + jnp.where(frame_number % 2 == 0, 1, 0)
        ) if cb else py_r
        u = px.astype(F32) / F32(W)
        v = py.astype(F32) / F32(H)
        fwd, up, right = cam.get_directions(euler)
        o = jnp.asarray(origin, F32)
        if cfg.projection is Projection.PERSPECTIVE:
            dirs = cam.ray_direction(fwd, up, right, W, H, u, v, cfg.fov_degrees)
            origins = jnp.broadcast_to(o, dirs.shape)
        else:
            dirs = jnp.broadcast_to(fwd, (px.shape[0], 3))
            origins = cam.ray_origin_ortho(
                fwd, up, right, W, H, u, v, o, osz
            )
        return origins, dirs, py

    def unblock_local(a):
        rest = a.shape[1:]
        if blocked:
            a = a.reshape(rows_local // bh, W // bw, bh, bw, *rest)
            a = a.transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
        return a.reshape(rows_local, W, *rest)

    def tile(bm, lt, fb_block, origin, euler, env, frame_number, osz):
        dev = jax.lax.axis_index("rows")
        row0 = dev * rows_local
        xg, yg = jnp.meshgrid(jnp.arange(W), jnp.arange(rows_local), indexing="xy")
        if blocked:
            def blk(a):
                return (
                    a.reshape(rows_local // bh, bh, W // bw, bw)
                    .transpose(0, 2, 1, 3).reshape(-1)
                )
            px, py_rl = blk(xg), blk(yg)
        else:
            px, py_rl = xg.reshape(-1), yg.reshape(-1)
        py_r = py_rl + row0
        if cb:
            # halo strip: the device's first fb row pair receives the even-
            # frame +2 writes of the PREVIOUS device's last pre-remap row;
            # recompute that row locally (1/rows_local extra rays, no comm)
            px = jnp.concatenate([px, jnp.arange(W)])
            py_r = jnp.concatenate([py_r, jnp.full((W,), row0 - 1)])
        origins, dirs, py = rays_for_rows(
            origin, euler, frame_number, px, py_r, osz
        )
        color, write = shade_pixels(
            bm, origins, dirs, px, py, py_r, origin, env, frame_number, cfg,
            None, lt,
        )
        if not cb:
            h = unblock_local(color)
            w = unblock_local(write)
            return jnp.where(w[..., None], h, fb_block)
        n_main = rows_local * W
        h_main = unblock_local(color[:n_main])
        w_main = unblock_local(write[:n_main])
        halo_ok = py_r[n_main:] >= 0  # device 0 has no global row -1
        # shared pair-select composite (render.frame): the halo row stands
        # in for the cross-device predecessor row
        from voxelengine_tpu.render.frame import checkerboard_pair_select

        h_prev = jnp.concatenate([color[n_main:][None], h_main[:-1]], axis=0)
        w_prev = jnp.concatenate(
            [(write[n_main:] & halo_ok)[None], w_main[:-1]], axis=0
        )
        return checkerboard_pair_select(
            fb_block, h_main, w_main, h_prev, w_prev, frame_number
        )

    fb = jax.shard_map(
        tile,
        mesh=mesh,
        in_specs=(P(), P(), P("rows"), P(), P(), P(), P(), P()),
        out_specs=P("rows"),
        check_vma=False,
    )(bm, lt, framebuffer, jnp.asarray(origin, F32), jnp.asarray(euler, F32),
      env, jnp.asarray(frame_number, jnp.int32), osz)
    return fb


@functools.partial(
    jax.jit, static_argnames=("max_steps", "mesh", "tile", "num_slots")
)
def raytrace_sharded(
    bm: BrickMap,
    origins,
    rays,
    mesh: Mesh,
    max_steps: int = 2048,
    lt=None,
    tile: int = 2048,
    num_slots: int = 16,
) -> Tuple[TraceOut, jax.Array]:
    """Batch ray query sharded over the flat ray axis.  Also returns the
    mesh-wide mean DDA step count (a ``psum`` diagnostic, the sharded analog
    of the 2D prototype's average-steps metric, ``DDATestCpp.cpp:618-625``).

    ``lt``: replicated HBM line table — each device traces its ray shard
    through the flagship Pallas kernel instead of the XLA state machine
    (same flagship-vs-XLA choice as the render entries)."""

    def shard(bm, lt_s, o, r):
        if lt_s is not None:
            from voxelengine_tpu.ops.pallas_bigtrace import trace_brickmap_hbm

            out = trace_brickmap_hbm(
                bm, lt_s, o, r, max_steps, tile=tile, num_slots=num_slots
            )
        else:
            out = trace_brickmap(bm, o, r, max_steps)
        # f32 accumulator: an i32 sum wraps at frame-scale batches
        # (2M rays x ~1000+ steps exceeds 2^31)
        tot = jax.lax.psum(jnp.sum(out.steps.astype(F32)), "rows")
        cnt = jax.lax.psum(out.steps.shape[0], "rows")
        return out, tot / cnt

    return jax.shard_map(
        shard,
        mesh=mesh,
        in_specs=(P(), P(), P("rows"), P("rows")),
        out_specs=(P("rows"), P()),
        check_vma=False,
    )(bm, lt, jnp.asarray(origins, F32), jnp.asarray(rays, F32))
