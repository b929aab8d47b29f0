"""Distributed-memory world sharding: z-slab partitioned brickmaps.

Beyond the reference's single-GPU design (and beyond the replicated-world
pixel sharding in :mod:`voxelengine_tpu.parallel.sharded`): the brickmap is
partitioned into coarse-z slabs, one per device, so worlds larger than a
single chip's HBM can be traced.  Rays *migrate* between devices:

1. every device holds the full (replicated) ray state plus an ``owner``
   assignment (the slab containing each ray's current coarse cell);
2. each round, a device advances only its own rays against its local slab
   (the traversal pauses rays at slab boundaries with state intact —
   ``ops.trace._run_loop(slab=...)``);
3. paused rays are reassigned to the neighboring slab and the updated
   state is merged across devices with a ``psum`` (each ray is owned by at
   most one device, so masked contributions sum losslessly).

A ray enters each convex slab at most once, so ``n_devices`` rounds suffice.
Collectives ride the mesh (ICI on real hardware); the world never does.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from voxelengine_tpu.config import MAX_STEPS
from voxelengine_tpu.core.brickmap import BrickMap
from voxelengine_tpu.ops.trace import (
    TraceOut,
    _finalize,
    _init_state,
    _run_loop,
)

F32 = jnp.float32
I32 = jnp.int32


def shard_world_z(bm: BrickMap, n: int):
    """Split a dense-slot brickmap into ``n`` coarse-z slabs.

    Returns ``(meta_stack [n, cpslab], bricks_stack [n, bpslab, wpb],
    slab_gz)``.  Requires LINEAR coarse layout (z-slabs are contiguous chunk
    ranges) and ``grid_dims[2] % n == 0``.
    """
    from voxelengine_tpu.core.layout import Layout

    assert bm.dense_slots, "z-sharding requires dense-slot brickmaps"
    assert bm.coarse_layout is Layout.LINEAR, "z-sharding requires LINEAR coarse layout"
    gx, gy, gz = bm.grid_dims
    assert gz % n == 0, f"gz={gz} must divide across {n} devices"
    slab_gz = gz // n
    per = gx * gy * slab_gz
    meta_stack = bm.meta.reshape(n, per)
    bricks_stack = bm.bricks.reshape(n, per, bm.words_per_brick)
    return meta_stack, bricks_stack, slab_gz


def _slab_bm(spec, meta, bricks, slab_gz: int) -> BrickMap:
    gx, gy, gz, factor, coarse_layout, brick_layout = spec
    return BrickMap(
        meta=meta,
        brick_idx=jnp.arange(gx * gy * slab_gz, dtype=I32),
        bricks=bricks,
        grid_dims=(gx, gy, slab_gz),
        factor=factor,
        coarse_layout=coarse_layout,
        brick_layout=brick_layout,
        dense_slots=True,
    )


@functools.partial(jax.jit, static_argnames=("spec", "max_steps", "mesh"))
def _trace_zsharded(
    spec,
    meta_stack,
    bricks_stack,
    origins,
    rays,
    mesh: Mesh,
    max_steps: int,
) -> TraceOut:
    n_dev = mesh.devices.size
    gx, gy, gz = spec[0], spec[1], spec[2]
    slab_gz = gz // n_dev

    def shard(meta, bricks, origins, rays):
        my = jax.lax.axis_index("shards")
        bm_local = _slab_bm(spec, meta[0], bricks[0], slab_gz)
        st = _init_state(bm_local, origins, rays, full_gz=gz)
        owner = jnp.clip(st.ccell[:, 2] // slab_gz, 0, n_dev - 1)

        for _ in range(n_dev):
            mine = st.active & (owner == my)
            st_in = st._replace(active=mine)
            z0 = my * slab_gz
            st_out = _run_loop(
                bm_local, st_in, max_steps, 2 * max_steps + 8,
                slab=(z0, gz),
            )
            # paused rays (state intact, still in-grid, outside my slab)
            paused = (
                mine
                & ~st_out.active
                & ~st_out.hit
                & (st_out.steps < max_steps)
                & (st_out.ccell[:, 2] >= 0)
                & (st_out.ccell[:, 2] < gz)
                & ~st_out.in_fine
            )
            new_owner_mine = jnp.clip(st_out.ccell[:, 2] // slab_gz, 0, n_dev - 1)

            # merge: each ray is updated by at most one device, so a psum
            # of masked contributions reconstructs the global state; rays
            # owned by nobody keep their previous (replicated) state
            owned = jax.lax.psum(mine.astype(I32), "shards") > 0

            def merge(old, new):
                if new.ndim >= 1 and new.shape[0] == mine.shape[0]:
                    m = mine.reshape((-1,) + (1,) * (new.ndim - 1))
                    ow = owned.reshape((-1,) + (1,) * (new.ndim - 1))
                else:
                    return old
                if new.dtype == jnp.bool_:
                    contrib = jnp.where(m, new, False)
                    summed = jax.lax.psum(contrib.astype(I32), "shards") > 0
                else:
                    contrib = jnp.where(m, new, jnp.zeros_like(new))
                    summed = jax.lax.psum(contrib, "shards")
                return jnp.where(ow, summed.astype(new.dtype), old)

            st = jax.tree.map(merge, st, st_out)
            st = st._replace(it=jnp.int32(0))

            # ownership handoff for paused rays
            paused_any = jax.lax.psum(jnp.where(mine & paused, 1, 0), "shards") > 0
            new_owner_sum = jax.lax.psum(
                jnp.where(mine & paused, new_owner_mine, 0), "shards"
            )
            owner = jnp.where(paused_any, new_owner_sum, owner)
            # reactivate paused rays for their new owner
            reactivate = paused_any
            st = st._replace(active=st.active | reactivate)

        return _finalize(st, spec[3])

    return jax.shard_map(
        shard,
        mesh=mesh,
        in_specs=(P("shards"), P("shards"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(meta_stack, bricks_stack, jnp.asarray(origins, F32), jnp.asarray(rays, F32))


def trace_brickmap_zsharded(
    bm: BrickMap, origins, rays, mesh: Mesh, max_steps: int = MAX_STEPS
) -> TraceOut:
    """Trace rays through a z-slab-sharded world (see module doc).

    ``mesh`` must have a single axis named ``"shards"``.
    """
    n = mesh.devices.size
    meta_stack, bricks_stack, slab_gz = shard_world_z(bm, n)
    spec = bm.grid_dims + (bm.factor, bm.coarse_layout, bm.brick_layout)
    return _trace_zsharded(
        spec, meta_stack, bricks_stack, origins, rays, mesh, max_steps
    )
