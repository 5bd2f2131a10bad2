"""Force-field subsystem: SDF mask, JFA distance field, push-out integration
(SURVEY.md sections 2.5, 2.11, 2.17)."""

import jax.numpy as jnp
import numpy as np

from tpufluid import SimSettings, TickParams, make_step
from tpufluid.state import ParticleState
from tpufluid.ops import forcefield as ff


def small_settings(tex=64):
    return SimSettings(
        particle_count=16, size=(8.0, 8.0), smoothing_radius=0.5,
        texture_size=(tex, tex), cell_capacity=32,
    )


def test_point_in_circle_and_rect():
    objs = ff.Objects.from_list([
        ("circle", (1.0, 1.0), 0.5),
        ("rect", (-2.0, 0.0), (2.0, 1.0), 0.0),
    ])
    pts = jnp.asarray([
        [1.0, 1.0],     # circle center
        [1.4, 1.0],     # inside circle
        [1.6, 1.0],     # outside circle
        [-2.0, 0.0],    # rect center
        [-1.1, 0.4],    # inside rect
        [-0.9, 0.0],    # outside rect (x beyond half-extent 1.0)
        [-2.0, 0.6],    # outside rect (y beyond half-extent 0.5)
    ], jnp.float32)
    got = np.asarray(ff.point_in_objects(pts, objs))
    np.testing.assert_array_equal(got, [1, 1, 0, 1, 1, 0, 0])


def test_rotated_rect():
    # 2x0.2 bar rotated 90 degrees -> occupies x in [-0.1,0.1], y in [-1,1]
    objs = ff.Objects.from_list([("rect", (0.0, 0.0), (2.0, 0.2), np.pi / 2)])
    pts = jnp.asarray([[0.0, 0.9], [0.9, 0.0], [0.05, -0.95]], jnp.float32)
    got = np.asarray(ff.point_in_objects(pts, objs))
    np.testing.assert_array_equal(got, [1, 0, 1])


def test_mask_orientation():
    s = small_settings()
    objs = ff.Objects.from_list([("circle", (2.0, 2.0), 1.0)])
    outside = np.asarray(ff.rasterize_outside_mask(objs, s))
    assert outside.shape == (64, 64)
    # world (2,2) -> uv (0.75, 0.75) -> texel (48, 48)
    assert not outside[48, 48]
    assert outside[16, 16]  # world (-2,-2): far from the circle
    # ~ pi r^2 / (8*8) of pixels inside
    frac_inside = 1.0 - outside.mean()
    assert abs(frac_inside - np.pi / 64.0) < 0.01


def _brute_force_field(outside):
    """Exact nearest-outside-pixel field (what JFA approximates)."""
    h, w = outside.shape
    ys, xs = np.mgrid[0:h, 0:w]
    seeds = np.stack([xs[outside], ys[outside]], axis=-1)  # [S, 2]
    pix = np.stack([xs.ravel(), ys.ravel()], axis=-1)      # [P, 2]
    d2 = ((pix[:, None, :] - seeds[None, :, :]) ** 2).sum(-1)
    nearest = seeds[np.argmin(d2, axis=1)]
    return (nearest - pix).reshape(h, w, 2).astype(np.float32), np.sqrt(
        d2.min(axis=1).reshape(h, w)
    )


def test_jfa_matches_brute_force_distances():
    s = small_settings(tex=48)
    objs = ff.Objects.from_list([
        ("circle", (0.0, 0.0), 1.5),
        ("rect", (2.5, -2.5), (2.0, 1.0), 0.3),
    ])
    outside = np.asarray(ff.rasterize_outside_mask(objs, s))
    field = np.asarray(ff.jump_flood_field(jnp.asarray(outside)))
    _, exact_d = _brute_force_field(outside)
    got_d = np.linalg.norm(field, axis=-1)
    # JFA distance equals the exact distance (ties may pick another seed at
    # the same distance; allow 1px slack for rare JFA corner cases)
    assert np.max(np.abs(got_d - exact_d)) <= 1.0 + 1e-4
    assert (np.abs(got_d - exact_d) > 1e-4).mean() < 0.01
    # zero exactly on outside pixels
    assert np.all(field[outside] == 0.0)
    # inside pixels all point somewhere
    assert np.all(np.linalg.norm(field[~outside], axis=-1) > 0.0)


def test_jfa_border_seeding_when_no_outside():
    # everything inside an object -> border pixels seed (src/main.rs:425-438)
    outside = jnp.zeros((16, 16), bool)
    field = np.asarray(ff.jump_flood_field(outside))
    # center pixel points to the nearest border, 7px away
    d = np.linalg.norm(field, axis=-1)
    assert abs(d[8, 8] - 7.0) < 1e-5
    assert d[0, 5] == 0.0 or np.all(field[0, 5] == 0.0)


def test_pushout_moves_particle_out_of_obstacle():
    s = small_settings(tex=128)
    objs = ff.Objects.from_list([("circle", (0.0, 0.0), 1.0)])
    field = ff.obstacle_force_field(objs, s)
    step = make_step(s, has_force_field=True)
    # park a particle inside the obstacle
    pos = jnp.asarray([[0.4, 0.0]] + [[3.0, 3.0]] * 15, jnp.float32)
    state = ParticleState(
        position=pos, predicted=pos, velocity=jnp.zeros((16, 2)),
        density=jnp.ones(16), cell=jnp.zeros(16, jnp.uint32),
        tick=jnp.zeros((), jnp.uint32),
    )
    params = TickParams.default(pressure_constant=0.0, viscosity_coefficient=0.0)
    out = step(state, params, field)
    p = np.asarray(out.position)
    # the particle that started inside should be pushed outward (radially +x)
    moved = p[np.argmin(np.abs(p[:, 1]))]  # the y~0 particle
    assert moved[0] > 0.4
    # reference applies force * (bounds*2/texture): world push ~ 2x true
    # distance; particle ends outside the unit circle
    assert np.linalg.norm(moved) >= 1.0 - 0.1


def test_force_field_zero_outside_obstacles():
    s = small_settings(tex=128)
    objs = ff.Objects.from_list([("circle", (0.0, 0.0), 1.0)])
    field = np.asarray(ff.obstacle_force_field(objs, s))
    # a pixel well away from the obstacle: zero force
    assert np.all(field[10, 10] == 0.0)
