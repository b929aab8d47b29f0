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
) -> jax.Array:
    """Row-sharded frame render: ``render_frame`` semantics, N devices.

    The framebuffer should be sharded ``P('rows')``; the world replicated
    (see :func:`replicate_world`).  Returns the sharded framebuffer.
    """
    W, H = cfg.width, cfg.height
    n = mesh.devices.size
    rows_total = H // 2 if cfg.checkerboard else H
    assert H % n == 0 and rows_total % n == 0, "height must divide the mesh"
    rows_local = rows_total // n

    def tile(bm, fb_block, origin, euler, env, frame_number):
        dev = jax.lax.axis_index("rows")
        row0 = dev * rows_local
        # one-row halo: the checkerboard remap y = 2y' + (x even) + (frame
        # even) can target y = 2y' + 2, i.e. the row pair BELOW y' — which
        # belongs to the next device when y' is a block's last row.  Each
        # device therefore also computes its upper neighbour's last
        # pre-remap row (zero communication, 1/rows_local extra compute)
        # and masks rays with no in-frame source (y' < 0).
        halo = 1 if cfg.checkerboard else 0
        xg, yg = jnp.meshgrid(
            jnp.arange(W), jnp.arange(rows_local + halo) - halo, indexing="xy"
        )
        px = xg.reshape(-1)
        py_r = yg.reshape(-1) + row0  # global pre-remap row (may be -1)
        if cfg.checkerboard:
            py = (
                py_r * 2
                + jnp.where(px % 2 == 0, 1, 0)
                + jnp.where(frame_number % 2 == 0, 1, 0)
            )
        else:
            py = py_r
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
                fwd, up, right, W, H, u, v, o, cfg.ortho_size
            )
        color, write = shade_pixels(
            bm, origins, dirs, px, py, py_r, origin, env, frame_number, cfg
        )
        # local scatter: this device owns fb rows [dev*H/n, (dev+1)*H/n)
        y_local = py - dev * (H // n)
        hloc = fb_block.shape[0]
        ok = write & (py_r >= 0) & (y_local >= 0) & (y_local < hloc)
        y_w = jnp.where(ok, y_local, hloc)
        return fb_block.at[y_w, px].set(color, mode="drop")

    fb = jax.shard_map(
        tile,
        mesh=mesh,
        in_specs=(P(), P("rows"), P(), P(), P(), P()),
        out_specs=P("rows"),
        check_vma=False,
    )(bm, framebuffer, jnp.asarray(origin, F32), jnp.asarray(euler, F32), env,
      jnp.asarray(frame_number, jnp.int32))
    return fb


@functools.partial(jax.jit, static_argnames=("max_steps", "mesh"))
def raytrace_sharded(
    bm: BrickMap, origins, rays, mesh: Mesh, max_steps: int = 2048
) -> Tuple[TraceOut, jax.Array]:
    """Batch ray query sharded over the flat ray axis.  Also returns the
    mesh-wide mean DDA step count (a ``psum`` diagnostic, the sharded analog
    of the 2D prototype's average-steps metric, ``DDATestCpp.cpp:618-625``)."""

    def shard(bm, o, r):
        out = trace_brickmap(bm, o, r, max_steps)
        tot = jax.lax.psum(jnp.sum(out.steps), "rows")
        cnt = jax.lax.psum(out.steps.shape[0], "rows")
        return out, tot / cnt

    return jax.shard_map(
        shard,
        mesh=mesh,
        in_specs=(P(), P("rows"), P("rows")),
        out_specs=(P("rows"), P()),
        check_vma=False,
    )(bm, jnp.asarray(origins, F32), jnp.asarray(rays, F32))
