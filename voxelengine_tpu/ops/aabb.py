"""Ray/AABB slab intersection.

Vectorized equivalent of the reference's ``RayIntersectsAABB``
(``VolumeRaytracer.cu:124-174``): slab method with division-by-zero guarded
by substituting FLT_EPSILON, entry point at ``start + t_min * dir``, and an
axis-aligned entry normal picked by which slab produced ``t_min`` with the
sign of the inverse direction.  Ties resolve x, then y, then z — the same
priority as the reference's if/else-if chain (``VolumeRaytracer.cu:157-170``).

All inputs broadcast; positions are ``[..., 3]`` float32.
"""

from __future__ import annotations

import jax.numpy as jnp

FLT_EPS = float(jnp.finfo(jnp.float32).eps)


def ray_aabb(start, direction, bmin, bmax):
    """Slab test.  Returns ``(hit, t_min, point, normal)``.

    * ``hit``: bool — interval non-empty and box not fully behind the start
      (``t_max >= max(t_min, 0)``, ``VolumeRaytracer.cu:148``).
    * ``t_min``: largest entering time (can be negative when ``start`` is
      inside the box — the reference then reports the *behind* entry point,
      which we preserve).
    * ``point``: ``start + t_min * direction``.
    * ``normal``: axis-aligned entry normal, sign from ``1/direction``.
    """
    start = jnp.asarray(start, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    inv = 1.0 / jnp.where(direction == 0.0, jnp.float32(FLT_EPS), direction)

    t_lo = (bmin - start) * inv
    t_hi = (bmax - start) * inv
    t1 = jnp.minimum(t_lo, t_hi)  # per-axis entering time
    t2 = jnp.maximum(t_lo, t_hi)  # per-axis exiting time
    t_min = jnp.max(t1, axis=-1)
    t_max = jnp.min(t2, axis=-1)
    hit = t_max >= jnp.maximum(t_min, 0.0)

    point = start + t_min[..., None] * direction

    # entry normal: first axis whose t1 equals t_min (x > y > z priority)
    is_x = t_min == t1[..., 0]
    is_y = (~is_x) & (t_min == t1[..., 1])
    sign = jnp.where(inv < 0.0, -1.0, 1.0)
    normal = jnp.stack(
        [
            jnp.where(is_x, sign[..., 0], 0.0),
            jnp.where(is_y, sign[..., 1], 0.0),
            jnp.where(is_x | is_y, 0.0, sign[..., 2]),
        ],
        axis=-1,
    )
    return hit, t_min, point, normal


def aabb_contains(pos, bmin, bmax):
    """Inclusive containment test (``VolumeRaytracer.cu:119-122``)."""
    return jnp.all((pos >= bmin) & (pos <= bmax), axis=-1)
