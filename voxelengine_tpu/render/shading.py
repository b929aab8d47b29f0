"""Hit shading.

Equivalent of ``calculateColor`` + ``Tonemap`` (``Renderer.cu:89-177``):
Lambert diffuse against the directional light, hemispheric ambient keyed on
the world up axis, Phong-style specular (exponent 32), and a Reinhard
``c / (c + 1)`` tonemap.  The reference's shadow-ray and Monte-Carlo AO
scaffolding is present-but-disabled there (``Renderer.cu:100-102,123``);
here both are *implemented* and gated by :class:`RenderConfig` flags that
default off for parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from voxelengine_tpu.config import Environment


def reflect(i, n):
    """``i - 2 * n * dot(n, i)`` (helper_math.h:1427 semantics)."""
    return i - 2.0 * n * jnp.sum(n * i, axis=-1, keepdims=True)


def lerp(a, b, t):
    return a + t * (b - a)


def calculate_color(cam_pos, normal, position, env: Environment, shadow_hit=None):
    """Shade a batch of hit points (``Renderer.cu:90-118``).

    ``normal``/``position`` are [N, 3]; ``shadow_hit`` is an optional bool[N]
    (the reference computes it but hardwires ``hit=false``,
    ``Renderer.cu:102``).
    """
    L = env.light_direction
    if shadow_hit is None:
        shadow_hit = jnp.zeros(position.shape[:-1], bool)
    lit = jnp.where(shadow_hit, 0.0, 1.0)

    l_dot = jnp.maximum(jnp.sum(normal * L, axis=-1), 0.0) * lit
    diffuse = l_dot[..., None] * env.light_color
    hemi = jnp.sum(normal * jnp.asarray([0.0, 1.0, 0.0]), axis=-1) * 0.5 + 0.5
    ambient = env.ambient_color * lerp(jnp.float32(0.25), jnp.float32(1.0), hemi)[..., None]
    color = diffuse + ambient

    view = position - cam_pos
    # guard the zero-length case (camera exactly at the hit point, e.g.
    # buried inside a solid voxel) — the reference NaNs here (normalize(0))
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12)
    refl = reflect(jnp.broadcast_to(L, normal.shape), normal)
    spec = jnp.maximum(jnp.sum(view * refl, axis=-1), 0.0) ** 32
    color = color + jnp.where(shadow_hit, 0.0, spec)[..., None] * env.light_color
    return color


def tonemap(color):
    """Reinhard tonemap + clamp (``Renderer.cu:170-177``)."""
    c = color / (color + 1.0)
    return jnp.clip(c, 0.0, 1.0)
