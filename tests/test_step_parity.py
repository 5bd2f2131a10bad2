"""Step correctness: grid vs all-pairs vs independent NumPy oracle,
plus determinism and physical sanity (SURVEY.md section 4, points 1-3, 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufluid import SimSettings, TickParams, init_state, make_step
from tpufluid.state import ParticleState

from oracle_numpy import oracle_step


def small_settings(n=512, cap=64):
    # A dense dam-break-like scene scaled down: same spacing/h ratio as the
    # reference defaults (spacing 0.1, h 0.2, src/main.rs:48-54).
    return SimSettings(
        particle_count=n,
        particle_spacing=0.1,
        smoothing_radius=0.2,
        size=(8.0, 8.0),
        cell_capacity=cap,
    )


def params_dict(p: TickParams):
    return dict(
        delta=float(p.delta), gravity=np.asarray(p.gravity),
        mass=float(p.mass), pressure_constant=float(p.pressure_constant),
        rest_density=float(p.rest_density),
        damping_factor=float(p.damping_factor),
        viscosity_coefficient=float(p.viscosity_coefficient),
        mouse_force_radius=float(p.mouse_force_radius),
        mouse_force_power=float(p.mouse_force_power),
        mouse_pos=np.asarray(p.mouse_pos), mouse_state=int(p.mouse_state),
    )


def run_steps(step, state, params, n):
    for _ in range(n):
        state = step(state, params)
    return state


def test_grid_matches_naive_per_step():
    """Grid-windowed and all-pairs neighbor reductions compute the same
    physics. SPH is chaotic (divergence grows ~2.3x/step from f32
    reduction-order roundoff), so parity is asserted per step from synced
    inputs, while the trajectory itself is advanced by the naive oracle."""
    s = small_settings()
    params = TickParams.default(gravity=(0.0, -9.8))
    grid_step = make_step(s, neighbor_mode="grid")
    naive_step = make_step(s, neighbor_mode="naive")
    state = init_state(s)
    for i in range(15):
        gs = grid_step(state, params)
        ns = naive_step(state, params)
        np.testing.assert_allclose(
            np.asarray(gs.position), np.asarray(ns.position),
            rtol=1e-5, atol=1e-6, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(gs.velocity), np.asarray(ns.velocity),
            rtol=1e-4, atol=5e-5, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(gs.density), np.asarray(ns.density),
            rtol=1e-5, err_msg=f"step {i}",
        )
        np.testing.assert_array_equal(np.asarray(gs.cell), np.asarray(ns.cell))
        state = ns


def test_jax_matches_numpy_oracle():
    s = small_settings(n=400)
    params = TickParams.default(gravity=(0.3, -9.8))
    pd = params_dict(params)
    sd = dict(size=s.size, smoothing_radius=s.smoothing_radius,
              texture_size=s.texture_size)
    step = make_step(s, neighbor_mode="grid")
    state = init_state(s)
    for i in range(10):
        # per-step parity from synced inputs (see chaos note above)
        ref = oracle_step(
            np.asarray(state.position), np.asarray(state.velocity), sd, pd, i
        )
        state = step(state, params)
        np.testing.assert_allclose(
            np.asarray(state.position), ref["position"], rtol=1e-5, atol=2e-6,
            err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(state.velocity), ref["velocity"], rtol=1e-4, atol=5e-5,
            err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(state.density), ref["density"], rtol=2e-5,
            err_msg=f"step {i}",
        )
        np.testing.assert_array_equal(
            np.asarray(state.cell).astype(np.int64), ref["cell"],
            err_msg=f"step {i}",
        )
        # advance both from the oracle's state to keep inputs synced
        state = ParticleState(
            position=jnp.asarray(ref["position"]),
            predicted=jnp.asarray(ref["predicted"]),
            velocity=jnp.asarray(ref["velocity"]),
            density=jnp.asarray(ref["density"]),
            cell=jnp.asarray(ref["cell"].astype(np.uint32)),
            tick=state.tick,
        )


def test_determinism_bitwise():
    s = small_settings()
    params = TickParams.default(gravity=(0.0, -9.8))
    step = make_step(s)
    a = run_steps(step, init_state(s), params, 15)
    b = run_steps(step, init_state(s), params, 15)
    np.testing.assert_array_equal(np.asarray(a.position), np.asarray(b.position))
    np.testing.assert_array_equal(np.asarray(a.velocity), np.asarray(b.velocity))
    np.testing.assert_array_equal(np.asarray(a.density), np.asarray(b.density))


def test_physical_sanity_long_run():
    s = small_settings()
    params = TickParams.default(gravity=(0.0, -9.8))
    step = make_step(s)
    state = run_steps(step, init_state(s), params, 120)
    pos = np.asarray(state.position)
    vel = np.asarray(state.velocity)
    dens = np.asarray(state.density)
    half = np.asarray(s.size) * 0.5
    assert np.all(np.abs(pos) <= half + 1e-5)
    assert np.all(np.isfinite(pos)) and np.all(np.isfinite(vel))
    assert np.all(dens >= 0.1)
    assert np.all(np.linalg.norm(vel, axis=1) <= 500.0 + 1e-3)
    # fluid under gravity should have fallen toward the floor
    assert np.mean(pos[:, 1]) < 0.0


def test_mouse_impulse_direction():
    s = small_settings(n=64)
    step = make_step(s)
    state = init_state(s)
    # attract (+1): velocities should point toward the mouse
    params = TickParams.default(
        mouse_state=1, mouse_pos=(2.0, 2.0), mouse_force_radius=100.0,
        pressure_constant=0.0, viscosity_coefficient=0.0,
    )
    out = step(state, params)
    to_mouse = np.asarray([2.0, 2.0]) - np.asarray(out.predicted)
    dots = np.sum(np.asarray(out.velocity) * to_mouse, axis=1)
    assert np.all(dots > 0.0)
    # repel (-1)
    params = TickParams.default(
        mouse_state=-1, mouse_pos=(2.0, 2.0), mouse_force_radius=100.0,
        pressure_constant=0.0, viscosity_coefficient=0.0,
    )
    out = step(state, params)
    dots = np.sum(np.asarray(out.velocity) * to_mouse, axis=1)
    assert np.all(dots < 0.0)


def test_boundary_bounce_damping():
    s = small_settings(n=4, cap=8)
    step = make_step(s)
    pos = jnp.asarray([[3.9, 0.0], [-3.9, 0.0], [0.0, 3.9], [0.0, -3.9]],
                      jnp.float32)
    vel = jnp.asarray([[100.0, 0.0], [-100.0, 0.0], [0.0, 100.0], [0.0, -100.0]],
                      jnp.float32)
    state = ParticleState(
        position=pos, predicted=pos, velocity=vel,
        density=jnp.ones(4), cell=jnp.zeros(4, jnp.uint32),
        tick=jnp.zeros((), jnp.uint32),
    )
    params = TickParams.default(
        pressure_constant=0.0, viscosity_coefficient=0.0, damping_factor=0.25
    )
    out = step(state, params)
    p = np.asarray(out.position)
    v = np.asarray(out.velocity)
    # walls clamp position to +/-4 and flip the axis velocity * -damping;
    # every particle that hit a wall must satisfy the bounce relation.
    hit = np.abs(p) >= 4.0 - 1e-6
    assert hit.any()
    for i in range(4):
        for ax in range(2):
            if hit[i, ax]:
                assert abs(p[i, ax]) == pytest.approx(4.0, abs=1e-6)
                # velocity reversed and damped: |v| = 100 * 0.25
                assert v[i, ax] == pytest.approx(-np.sign(p[i, ax]) * 25.0, rel=1e-5)


def test_speed_clamp_and_nan_reset():
    s = small_settings(n=2, cap=8)
    step = make_step(s)
    pos = jnp.asarray([[0.0, 0.0], [1.0, 1.0]], jnp.float32)
    vel = jnp.asarray([[1e6, 0.0], [0.0, 0.0]], jnp.float32)
    state = ParticleState(
        position=pos, predicted=pos, velocity=vel,
        density=jnp.ones(2), cell=jnp.zeros(2, jnp.uint32),
        tick=jnp.zeros((), jnp.uint32),
    )
    params = TickParams.default(pressure_constant=0.0, viscosity_coefficient=0.0)
    out = step(state, params)
    speeds = np.linalg.norm(np.asarray(out.velocity), axis=1)
    assert np.all(speeds <= 500.0 + 1e-2)
    # NaN reset: press the mouse exactly on a particle -> 0/0 -> reset to 0
    params = TickParams.default(
        mouse_state=1, mouse_pos=(1.0, 1.0), mouse_force_radius=5.0,
        pressure_constant=0.0, viscosity_coefficient=0.0,
    )
    out = step(state, params)
    assert np.all(np.isfinite(np.asarray(out.velocity)))


def test_surface_tension_path_runs():
    s = small_settings(n=128)
    step = make_step(s, surface_tension=True)
    state = run_steps(step, init_state(s), TickParams.default(), 3)
    assert np.all(np.isfinite(np.asarray(state.position)))


def test_spawn_lattice_matches_reference_layout():
    s = small_settings(n=100)
    state = init_state(s)
    pos = np.asarray(state.position)
    # 100 particles -> 10x10 lattice at spacing 0.1. Reference formula
    # (src/simulation.rs:147-163): per_row = 10, per_col = 99/10+1 = 10.9,
    # so x is centered but y is offset: y0 = (0 - 10.9/2 + 0.5)*0.1 = -0.495.
    assert pos.shape == (100, 2)
    np.testing.assert_allclose(pos[0], [-0.45, -0.495], atol=1e-6)
    np.testing.assert_allclose(pos[99], [0.45, 0.405], atol=1e-6)
    np.testing.assert_allclose(pos.mean(axis=0), [0.0, -0.045], atol=1e-6)
