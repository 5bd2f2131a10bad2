"""Unit tests: cell hashing, sort binning, neighbor windows."""

import jax.numpy as jnp
import numpy as np

from tpufluid import SimSettings
from tpufluid.ops import grid


SETTINGS = SimSettings(
    particle_count=256, size=(8.0, 6.0), smoothing_radius=0.5, cell_capacity=8
)


def test_grid_dims_match_reference_formula():
    # ceil(size/h) + 2 (src/simulation.rs:140-141)
    assert SETTINGS.grid_w == 18
    assert SETTINGS.grid_h == 14
    s2 = SimSettings(size=(53.0, 53.0), smoothing_radius=0.2)
    assert s2.grid_w == 267 and s2.grid_h == 267


def test_cell_xy_hand_cases():
    # cell = floor((p + bounds/2)/h) + 1 (funcs.wgsl:212-214)
    pts = jnp.asarray(
        [[-4.0, -3.0],   # min corner -> floor(0/h)+1 = (1, 1)
         [0.0, 0.0],     # center -> (4/0.5+1, 3/0.5+1) = (9, 7)
         [-3.76, -2.76], # within first cell
         [3.99, 2.99]],  # near max corner
        jnp.float32,
    )
    xy = np.asarray(grid.cell_xy(pts, SETTINGS))
    np.testing.assert_array_equal(xy[0], [1, 1])
    np.testing.assert_array_equal(xy[1], [9, 7])
    np.testing.assert_array_equal(xy[2], [1, 1])
    np.testing.assert_array_equal(xy[3], [16, 12])


def test_binning_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3.9, 3.9, size=(256, 2)).astype(np.float32)
    pts[:, 1] *= 0.75
    cells = grid.cell_id(jnp.asarray(pts), SETTINGS)
    b = grid.bin_particles(cells, SETTINGS)
    cells_np = np.asarray(cells)
    order = np.argsort(cells_np, kind="stable")
    np.testing.assert_array_equal(np.asarray(b.perm), order)
    np.testing.assert_array_equal(np.asarray(b.sorted_cells), cells_np[order])
    # segment table: cell c occupies [start[c], start[c+1])
    start = np.asarray(b.cell_start)
    for c in np.unique(cells_np):
        run = np.asarray(b.sorted_cells)[start[c]:start[c + 1]]
        assert np.all(run == c)
        assert start[c + 1] - start[c] == np.sum(cells_np == c)
    assert start[-1] == 256


def test_neighbor_windows_exactly_cover_3x3_cells():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-3.9, 3.9, size=(200, 2)).astype(np.float32)
    pts[:, 1] *= 0.7
    cells = grid.cell_id(jnp.asarray(pts), SETTINGS)
    b = grid.bin_particles(cells, SETTINGS)
    win = grid.neighbor_windows(b.sorted_cells, b.cell_start, SETTINGS)

    cells_np = np.asarray(b.sorted_cells)
    idx = np.asarray(win.idx)
    valid = np.asarray(win.valid)
    w = SETTINGS.grid_w
    for i in range(200):
        cx, cy = cells_np[i] % w, cells_np[i] // w
        expected = set()
        for j in range(200):
            nx, ny = cells_np[j] % w, cells_np[j] // w
            if abs(nx - cx) <= 1 and abs(ny - cy) <= 1:
                expected.add(j)
        got = set(idx[i][valid[i]].tolist())
        assert got == expected, f"particle {i}"


def test_window_order_is_ascending_sorted_index():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-3.9, 3.9, size=(150, 2)).astype(np.float32)
    pts[:, 1] *= 0.7
    cells = grid.cell_id(jnp.asarray(pts), SETTINGS)
    b = grid.bin_particles(cells, SETTINGS)
    win = grid.neighbor_windows(b.sorted_cells, b.cell_start, SETTINGS)
    idx = np.asarray(win.idx)
    valid = np.asarray(win.valid)
    for i in range(150):
        seq = idx[i][valid[i]]
        assert np.all(np.diff(seq) > 0)  # strictly ascending, no duplicates


def test_capacity_overflow_drops_deterministically():
    # 20 particles in one cell with capacity 8: window keeps the first
    # 3*capacity=24 of each row run; a single cell run > 24 would drop.
    s = SimSettings(particle_count=30, size=(8.0, 6.0), smoothing_radius=0.5,
                    cell_capacity=2)
    pts = np.zeros((30, 2), np.float32)  # all in the center cell
    cells = grid.cell_id(jnp.asarray(pts), s)
    b = grid.bin_particles(cells, s)
    win = grid.neighbor_windows(b.sorted_cells, b.cell_start, s)
    valid = np.asarray(win.valid)
    # row run = 3 cells * capacity 2 = 6 slots per row; only center row hit
    assert valid.sum(axis=(1, 2)).max() == 6
    assert int(grid.max_cell_occupancy(b.cell_start)) == 30


def test_point_windows_for_offgrid_queries():
    # pixel-style queries: points not tied to particles
    rng = np.random.default_rng(3)
    pts = rng.uniform(-3.9, 3.9, size=(100, 2)).astype(np.float32)
    pts[:, 1] *= 0.7
    cells = grid.cell_id(jnp.asarray(pts), SETTINGS)
    b = grid.bin_particles(cells, SETTINGS)
    q = jnp.asarray([[0.1, 0.2], [-3.0, 2.0]], jnp.float32)
    qc = grid.cell_id(q, SETTINGS)
    win = grid.point_windows(qc, b.cell_start, SETTINGS, radius_cells=2)
    cells_np = np.asarray(b.sorted_cells)
    w = SETTINGS.grid_w
    qcn = np.asarray(qc)
    for k in range(2):
        cx, cy = qcn[k] % w, qcn[k] // w
        expected = {
            j for j in range(100)
            if abs(cells_np[j] % w - cx) <= 2 and abs(cells_np[j] // w - cy) <= 2
        }
        got = set(np.asarray(win.idx)[k][np.asarray(win.valid)[k]].tolist())
        assert got == expected
