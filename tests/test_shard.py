"""Multi-device slab sharding on a virtual 8-device CPU mesh
(SURVEY.md section 4, point 4; BASELINE config 5 mechanics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufluid import SimSettings, TickParams, init_state, make_step
from tpufluid.parallel import (
    build_shard_spec, gather_state, init_sharded, make_sharded_step,
)


def shard_settings(n=512):
    return SimSettings(
        particle_count=n, particle_spacing=0.1, smoothing_radius=0.2,
        size=(16.0, 8.0), cell_capacity=32,
    )


def sorted_points(pos):
    pos = np.asarray(pos)
    order = np.lexsort((pos[:, 1], pos[:, 0]))
    return pos[order]


@pytest.fixture(scope="module")
def eight_devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


def test_spec_construction(eight_devices):
    s = shard_settings()
    spec = build_shard_spec(s, 8)
    assert len(spec.col_bounds) == 9
    assert spec.col_bounds[0] == 1
    assert spec.col_bounds[-1] == s.grid_w - 1
    widths = np.diff(spec.col_bounds)
    assert widths.min() >= 3
    assert spec.capacity * 8 >= s.particle_count


def test_init_preserves_all_particles(eight_devices):
    s = shard_settings()
    spec = build_shard_spec(s, 8)
    st = init_sharded(spec)
    assert int(np.asarray(st.valid).sum()) == s.particle_count
    single = init_state(s)
    np.testing.assert_allclose(
        sorted_points(gather_state(st).position),
        sorted_points(single.position), atol=0,
    )


def test_sharded_dense_matches_single_chip_dense(eight_devices):
    """The slab-local dense grids must reproduce single-chip dense physics
    (same summation order => near-bitwise)."""
    s = shard_settings()
    spec = build_shard_spec(s, 8)
    params = TickParams.default(gravity=(0.0, -9.8))
    sh_state = init_sharded(spec)
    sh_step = make_sharded_step(spec, neighbor_mode="dense")
    single_state = init_state(s)
    single_step = make_step(s, neighbor_mode="dense")
    for i in range(4):
        sh_state, stats = sh_step(sh_state, params)
        single_state = single_step(single_state, params)
    assert int(np.asarray(stats["n_valid"]).sum()) == s.particle_count
    np.testing.assert_allclose(
        sorted_points(gather_state(sh_state).position),
        sorted_points(single_state.position), atol=1e-6,
    )


def test_sharded_matches_single_chip(eight_devices):
    s = shard_settings()
    spec = build_shard_spec(s, 8)
    params = TickParams.default(gravity=(0.0, -9.8))

    sh_state = init_sharded(spec)
    sh_step = make_sharded_step(spec)
    single_state = init_state(s)
    single_step = make_step(s)

    for i in range(5):
        sh_state, stats = sh_step(sh_state, params)
        single_state = single_step(single_state, params)
        assert int(np.asarray(stats["halo_dropped"]).sum()) == 0, f"step {i}"
        assert int(np.asarray(stats["migration_dropped"]).sum()) == 0
        assert int(np.asarray(stats["n_valid"]).sum()) == s.particle_count
        np.testing.assert_allclose(
            sorted_points(gather_state(sh_state).position),
            sorted_points(single_state.position),
            atol=5e-4, err_msg=f"step {i}",
        )


def test_migration_across_slabs(eight_devices):
    # strong sideways gravity pushes the block across slab boundaries
    s = shard_settings()
    # sideways pile-up concentrates all mass in the rightmost slab: give
    # every device capacity for the whole set
    spec = build_shard_spec(s, 8, capacity_factor=3.0)
    params = TickParams.default(gravity=(30.0, 0.0))
    sh_state = init_sharded(spec)
    sh_step = make_sharded_step(spec)
    occupancy_before = (
        np.asarray(sh_state.valid).reshape(8, -1).sum(axis=1))
    for _ in range(40):
        sh_state, stats = sh_step(sh_state, params)
    assert int(np.asarray(stats["n_valid"]).sum()) == s.particle_count
    occupancy_after = (
        np.asarray(sh_state.valid).reshape(8, -1).sum(axis=1))
    # mass moved right: the rightmost slabs gained particles
    assert occupancy_after[-2:].sum() > occupancy_before[-2:].sum()
    pos = np.asarray(gather_state(sh_state).position)
    assert np.all(np.isfinite(pos))
    assert pos[:, 0].mean() > 0.5  # drifted right


def test_sharded_determinism(eight_devices):
    s = shard_settings(n=256)
    spec = build_shard_spec(s, 8)
    params = TickParams.default(gravity=(3.0, -9.8))
    step = make_sharded_step(spec)

    def run():
        st = init_sharded(spec)
        for _ in range(10):
            st, _ = step(st, params)
        return st

    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a.position), np.asarray(b.position))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_two_device_mesh(eight_devices):
    # smallest multi-chip case
    s = shard_settings(n=128)
    spec = build_shard_spec(s, 2)
    params = TickParams.default()
    step = make_sharded_step(spec)
    st = init_sharded(spec)
    for _ in range(3):
        st, stats = step(st, params)
    assert int(np.asarray(stats["n_valid"]).sum()) == 128
