"""Render pipeline tests (C9-C12: Renderer.cu)."""

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.config import DebugView, Environment, Projection, RenderConfig
from voxelengine_tpu.render import camera as cam
from voxelengine_tpu.render.frame import make_framebuffer, render_frame, to_bgra8
from voxelengine_tpu.render.shading import calculate_color, reflect, tonemap

F32 = np.float32


def test_get_directions_reference_values():
    """Euler (0,0): fwd=(0,0,1) negated -> (0,0,-1); right=(1,0,0);
    up=cross(fwd,right) negated (Renderer.cu:32-41)."""
    fwd, up, right = cam.get_directions(jnp.asarray([0.0, 0.0, 0.0]))
    assert np.allclose(np.asarray(fwd), [0, 0, -1], atol=1e-6)
    assert np.allclose(np.asarray(right), [1, 0, 0], atol=1e-6)
    assert np.allclose(np.asarray(up), [0, -1, 0], atol=1e-6)  # cross((0,0,1),(1,0,0))=(0,1,0), negated


def test_ray_direction_center_is_forward():
    fwd, up, right = cam.get_directions(jnp.asarray([0.2, 0.7, 0.0]))
    d = cam.ray_direction(fwd, up, right, 640, 360, jnp.asarray(0.5), jnp.asarray(0.5), 90.0)
    assert np.allclose(np.asarray(d), np.asarray(fwd), atol=1e-6)
    # corner rays diverge by the fov scale
    d2 = cam.ray_direction(fwd, up, right, 640, 360, jnp.asarray(0.0), jnp.asarray(0.0), 90.0)
    assert not np.allclose(np.asarray(d2), np.asarray(fwd), atol=1e-2)
    assert np.isclose(float(jnp.linalg.norm(d2)), 1.0, atol=1e-6)


def test_ortho_rays_parallel():
    fwd, up, right = cam.get_directions(jnp.asarray([0.0, 0.0, 0.0]))
    o = cam.ray_origin_ortho(fwd, up, right, 64, 64, jnp.asarray([0.0, 1.0]), jnp.asarray([0.5, 0.5]), jnp.asarray([0.0, 0.0, 0.0]), (10.0, 10.0))
    assert np.asarray(o).shape == (2, 3)
    assert not np.allclose(np.asarray(o)[0], np.asarray(o)[1])


def test_shading_components():
    env = Environment.default()
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    p = jnp.asarray([[0.0, 5.0, 0.0]])
    c = np.asarray(calculate_color(jnp.asarray([0.0, 10.0, 0.0]), n, p, env))
    # diffuse = dot(n,L)*2 ; ambient = 0.5 * lerp(0.25,1,1) = 0.5 ; spec >= 0
    ldot = 1.0 / np.sqrt(3)
    assert (c[0] >= ldot * 2 + 0.5 - 1e-5).all()
    # shadowed: diffuse and spec vanish
    c2 = np.asarray(
        calculate_color(jnp.asarray([0.0, 10.0, 0.0]), n, p, env, jnp.asarray([True]))
    )
    assert np.allclose(c2[0], 0.5, atol=1e-6)


def test_tonemap_range():
    c = jnp.asarray([[0.0, 1.0, 100.0]])
    t = np.asarray(tonemap(c))
    assert np.allclose(t, [[0.0, 0.5, 100 / 101]], atol=1e-6)


def test_reflect():
    i = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    assert np.allclose(np.asarray(reflect(i, n)), [[1.0, 1.0, 0.0]])


def _mini_scene(small_world):
    _, _, bm = small_world
    env = Environment.default()
    origin = jnp.asarray([16.0, 20.0, 16.0])
    euler = jnp.asarray([0.9, 0.3, 0.0])  # look down at the floor
    return bm, env, origin, euler


def test_render_frame_checkerboard_interleave(small_world):
    bm, env, origin, euler = _mini_scene(small_world)
    cfg = RenderConfig(width=64, height=32, checkerboard=True, crosshair=False)
    fb = make_framebuffer(cfg)
    marker = fb + (-1.0)  # sentinel to detect writes
    f0 = render_frame(bm, marker, origin, euler, env, jnp.int32(1), cfg)
    w0 = np.asarray(f0) != -1.0
    # exactly half the interior pixels written, in checkerboard pattern
    frac = w0[..., 0].mean()
    assert 0.45 < frac <= 0.52
    # complementary frame fills (almost) everything
    f1 = render_frame(bm, f0, origin, euler, env, jnp.int32(2), cfg)
    w1 = np.asarray(f1) != -1.0
    assert w1[..., 0].mean() > 0.95
    # written pattern alternates with column parity
    col0 = w0[:, 0, 0]
    col1 = w0[:, 1, 0]
    assert (col0[:-1] != col1[:-1]).any()


def test_render_full_frame_no_checkerboard(small_world):
    bm, env, origin, euler = _mini_scene(small_world)
    cfg = RenderConfig(width=64, height=32, checkerboard=False)
    fb = render_frame(bm, make_framebuffer(cfg) - 1.0, origin, euler, env, jnp.int32(0), cfg)
    fbn = np.asarray(fb)
    assert (fbn != -1.0).all()  # every pixel written
    assert fbn.min() >= 0.0 and fbn.max() <= 1.0
    # crosshair is white
    assert np.allclose(fbn[16, 32], 1.0)


def test_debug_view_quadrants():
    # solid-floor world + downward camera: every ray hits, so the
    # bottom-left no-write rule is observable
    import numpy as _np
    from voxelengine_tpu.core.bitgrid import BitGrid
    from voxelengine_tpu.core.brickmap import build_brickmap

    dense = _np.zeros((32, 32, 32), bool)
    dense[:, 0:8, :] = True  # solid y-floor
    bm = build_brickmap(BitGrid.from_dense(dense), 8)
    env = Environment.default()
    # square aspect so even corner rays descend steeply enough to hit
    cfg = RenderConfig(
        width=32, height=32, checkerboard=False, debug_view=DebugView.DEBUG, crosshair=False
    )
    origin = jnp.asarray([16.0, 16.0, 16.0])
    euler = jnp.asarray([-1.55, 0.0, 0.0])  # negative pitch looks down (Renderer.cu:33,39)
    fb = render_frame(bm, make_framebuffer(cfg) - 1.0, origin, euler, env, jnp.int32(0), cfg)
    fbn = np.asarray(fb)
    # bottom-left quadrant row y==H/2 is never written (Renderer.cu:233-235 + 272)
    assert (fbn[16, :16] == -1.0).all()
    # bottom-left below that row is the steps heatmap: green/blue zero
    assert (fbn[17:, :16, 1:] == 0).all()
    # bottom-right is the distance channel: green/blue zero
    assert (fbn[17:, 16:, 1:] == 0).all()


def test_projection_modes_compile(small_world):
    bm, env, origin, euler = _mini_scene(small_world)
    for proj in (Projection.PERSPECTIVE, Projection.ORTHOGRAPHIC):
        cfg = RenderConfig(width=32, height=16, checkerboard=False, projection=proj)
        fb = render_frame(bm, make_framebuffer(cfg), origin, euler, env, jnp.int32(0), cfg)
        assert np.isfinite(np.asarray(fb)).all()


def test_shadow_and_ao_options_run(small_world):
    bm, env, origin, euler = _mini_scene(small_world)
    cfg = RenderConfig(width=32, height=16, checkerboard=False, shadow_rays=True, ao_samples=2)
    fb = render_frame(bm, make_framebuffer(cfg), origin, euler, env, jnp.int32(0), cfg)
    assert np.isfinite(np.asarray(fb)).all()


def test_to_bgra8(small_world):
    fb = jnp.asarray([[[1.0, 0.5, 0.0]]])
    b = np.asarray(to_bgra8(fb))
    assert b.shape == (1, 1, 4)
    assert tuple(b[0, 0]) == (0, 127, 255, 255)  # B,G,R,A
