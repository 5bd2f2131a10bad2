"""Render kernels: metaball surface + point sprites (SURVEY.md section 4.5)."""

import jax.numpy as jnp
import numpy as np

from tpufluid import SimSettings, TickParams, init_state, make_step
from tpufluid.ops import render
from tpufluid.ops.render import Camera


def make_scene():
    s = SimSettings(particle_count=256, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(8.0, 8.0), cell_capacity=64)
    step = make_step(s)
    state = step(init_state(s), TickParams.default())
    return s, state


def test_metaball_frame_properties():
    s, state = make_scene()
    cam = Camera(view_size=(8.0, 8.0))
    frame = np.asarray(render.render_metaball(state, s, 64, 64, cam, chunks=4))
    assert frame.shape == (64, 64, 4)
    assert np.all(np.isfinite(frame))
    assert np.all((frame >= 0.0) & (frame <= 1.0))
    # the 1.6x1.6 particle block sits at the center: center pixel lit,
    # corners dark
    assert frame[32, 32, 2] > 0.3          # blue channel (slow fluid)
    assert np.all(frame[2, 2, :3] < 1e-3)  # background
    assert np.all(frame[..., 3] == 1.0)


def test_metaball_density_math_one_particle():
    # single particle at origin: density at pixel = exp(-r^2/(h^2/2))
    s = SimSettings(particle_count=1, size=(8.0, 8.0), smoothing_radius=0.5,
                    cell_capacity=4)
    state = make_step(s)(init_state(s), TickParams.default())
    cam = Camera(view_size=(2.0, 2.0))
    frame = np.asarray(render.render_metaball(state, s, 16, 16, cam, chunks=1))
    # interior = smoothstep(0.5, 1.5, exp(...)) <= smoothstep at 1 particle:
    # max density is 1.0 at the particle -> interior = 0.5 there
    center = frame[7:9, 7:9]
    assert center.max() > 0.0


def test_sprite_frame_properties():
    s, state = make_scene()
    cam = Camera(view_size=(8.0, 8.0))
    frame = np.asarray(
        render.render_particles(state, s, 64, 64, cam, scale=0.12, chunks=4)
    )
    assert frame.shape == (64, 64, 4)
    assert np.all(np.isfinite(frame))
    lit = (frame[..., :3].sum(-1) > 0).mean()
    # 256 dots of diameter 0.12 in an 8x8 view at 64x64: some but not all lit
    assert 0.005 < lit < 0.9
    assert np.all(frame[2, 2, :3] == 0.0)


def test_camera_orientation_row0_is_plus_y():
    s = SimSettings(particle_count=1, size=(8.0, 8.0), smoothing_radius=0.5,
                    cell_capacity=4)
    state = make_step(s)(init_state(s), TickParams.default())
    # move the particle up (+y): it should light rows ABOVE the center
    state.position = jnp.asarray([[0.0, 2.0]], jnp.float32)
    state.predicted = state.position
    from tpufluid.ops import grid as gridops
    state.cell = gridops.cell_id(state.predicted, s).astype(jnp.uint32)
    cam = Camera(view_size=(8.0, 8.0))
    frame = np.asarray(render.render_metaball(state, s, 32, 32, cam, chunks=1))
    bright_rows = np.where(frame[..., :3].sum(-1).sum(-1) > 0.01)[0]
    assert bright_rows.size > 0
    assert bright_rows.mean() < 16  # upper half of the image


def test_to_rgba8_roundtrip():
    f = jnp.asarray([[[0.0, 0.5, 1.0, 1.0]]], jnp.float32)
    u8 = np.asarray(render.to_rgba8(f))
    np.testing.assert_array_equal(u8[0, 0], [0, 128, 255, 255])


def test_render_determinism():
    s, state = make_scene()
    cam = Camera(view_size=(8.0, 8.0))
    a = np.asarray(render.render_metaball(state, s, 48, 48, cam, chunks=4))
    b = np.asarray(render.render_metaball(state, s, 48, 48, cam, chunks=4))
    np.testing.assert_array_equal(a, b)
