"""Native components (chamfer oracle, PNG) + checkpoint/app-shell tests."""

import os

import numpy as np
import pytest

from tpufluid.native import distfield, pngio


def test_native_chamfer_matches_brute_force():
    rng = np.random.default_rng(0)
    mask = np.full((40, 40), 255, np.uint8)
    mask[8:20, 5:30] = 0
    mask[25:35, 25:38] = 0
    field = distfield.chamfer_push_field(mask)

    outside = mask > 128
    ys, xs = np.mgrid[0:40, 0:40]
    seeds = np.stack([xs[outside], ys[outside]], -1)
    pix = np.stack([xs.ravel(), ys.ravel()], -1)
    d2 = ((pix[:, None, :] - seeds[None, :, :]) ** 2).sum(-1)
    exact = np.sqrt(d2.min(1)).reshape(40, 40)
    got = np.linalg.norm(field, axis=-1)
    # chamfer 8-neighbor propagation is exact on convex-ish source sets;
    # allow a tiny slack for its known worst cases
    assert np.max(np.abs(got - exact)) <= 1.0 + 1e-5
    assert np.all(field[outside] == 0.0)


def test_native_chamfer_border_fallback():
    mask = np.zeros((16, 16), np.uint8)  # nothing outside
    field = distfield.chamfer_push_field(mask)
    d = np.linalg.norm(field, axis=-1)
    assert abs(d[8, 8] - 7.0) < 1e-5
    assert d[0, 0] == 0.0


def test_native_chamfer_agrees_with_jfa():
    import jax.numpy as jnp
    from tpufluid.ops.forcefield import jump_flood_field

    mask = np.full((48, 48), 255, np.uint8)
    mask[10:30, 12:36] = 0
    chamfer = distfield.chamfer_push_field(mask)
    jfa = np.asarray(jump_flood_field(jnp.asarray(mask > 128)))
    dc = np.linalg.norm(chamfer, axis=-1)
    dj = np.linalg.norm(jfa, axis=-1)
    assert np.max(np.abs(dc - dj)) <= 1.5


def test_png_roundtrip(tmp_path):
    if not pngio.available():
        pytest.skip("native png not built")
    rgba = np.random.default_rng(1).integers(
        0, 256, (32, 48, 4), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    pngio.write_rgba(path, rgba)
    from PIL import Image
    back = np.asarray(Image.open(path).convert("RGBA"))
    np.testing.assert_array_equal(back, rgba)


def test_checkpoint_roundtrip(tmp_path):
    from tpufluid import SimSettings, TickParams, init_state, make_step
    from tpufluid.utils import io as ioutils

    s = SimSettings(particle_count=128, size=(8.0, 8.0), cell_capacity=32)
    step = make_step(s)
    state = step(init_state(s), TickParams.default(gravity=(0.0, -9.8)))
    path = str(tmp_path / "ckpt.npz")
    ioutils.save_checkpoint(path, state)
    loaded = ioutils.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(state.position),
                                  np.asarray(loaded.position))
    np.testing.assert_array_equal(np.asarray(state.cell),
                                  np.asarray(loaded.cell))
    assert int(loaded.tick) == 1
    # resumed trajectory identical to uninterrupted one
    a = step(state, TickParams.default(gravity=(0.0, -9.8)))
    b = step(loaded, TickParams.default(gravity=(0.0, -9.8)))
    np.testing.assert_array_equal(np.asarray(a.position), np.asarray(b.position))


def test_app_state_machine(tmp_path):
    from tpufluid.app import FluidApp, SimState
    from tpufluid import SimSettings

    app = FluidApp(SimSettings(particle_count=64, size=(8.0, 8.0),
                               cell_capacity=32))
    assert app.sim_state is SimState.STOPPED
    assert app.advance(1.0) == 0          # stopped: no ticks
    app.toggle_running()
    assert app.sim_state is SimState.RUNNING
    ticks = app.advance(5 / 120.0 + 1e-4)
    assert ticks >= 1                      # fixed timestep accumulator
    app.toggle_running()
    assert app.sim_state is SimState.STOPPED
    app.request_step()
    assert app.advance(0.0) == 1           # single step then stop
    assert app.sim_state is SimState.STOPPED
    tick_before = int(app.state.tick)
    app.restart()
    assert int(app.state.tick) == 0 and tick_before > 0

    app.set_mouse(pos=(1.0, 2.0), state=-1)
    assert int(app.params.mouse_state) == -1

    ck = str(tmp_path / "app.npz")
    app.save(ck)
    app.load(ck)


def test_app_render_sequence(tmp_path):
    from tpufluid.app import FluidApp
    from tpufluid import SimSettings

    app = FluidApp(SimSettings(particle_count=64, size=(8.0, 8.0),
                               cell_capacity=32))
    paths = app.render_sequence(str(tmp_path), frames=2, width=32, height=24)
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)
    assert int(app.state.tick) == 2 * FluidApp.TICKS_PER_RENDER_FRAME


def test_cli_info_and_run():
    from tpufluid.cli import main
    assert main(["info"]) == 0
    assert main(["run", "--particles", "64", "--size", "8", "8",
                 "--cell-capacity", "32", "--steps", "5",
                 "--gravity", "0", "-9.8"]) == 0


def test_video_frames_to_force_field(tmp_path):
    """Video-driven force field (reference component 2.15, completed):
    gray frames -> outside mask -> chamfer field usable by the step."""
    import jax.numpy as jnp
    from tpufluid.utils import io as ioutils
    from tpufluid import SimSettings, TickParams, make_step, init_state

    frames = np.full((3, 64, 64), 255, np.uint8)
    frames[:, 20:40, 20:40] = 0  # dark square = obstacle
    path = str(tmp_path / "frames.npy")
    np.save(path, frames)
    loaded = ioutils.load_gray_frames(path, max_frames=2)
    assert loaded.shape == (2, 64, 64)
    field = distfield.chamfer_push_field(loaded[0])
    s = SimSettings(particle_count=16, size=(8.0, 8.0),
                    texture_size=(64, 64), cell_capacity=32)
    step = make_step(s, has_force_field=True)
    out = step(init_state(s), TickParams.default(), jnp.asarray(field))
    assert np.all(np.isfinite(np.asarray(out.position)))


def test_save_mp4_gate():
    """mp4 export encodes via ffmpeg when present, raises a clear error
    otherwise (the render CLI's PNG path is the fallback)."""
    import numpy as np
    import pytest as _pytest
    from tpufluid.utils import io as ioutils

    frames = [np.zeros((16, 16, 4), np.uint8) for _ in range(3)]
    if ioutils.ffmpeg_available():
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            out = ioutils.save_mp4(os.path.join(d, "t.mp4"), frames, fps=10)
            assert os.path.getsize(out) > 0
    else:
        with _pytest.raises(RuntimeError, match="ffmpeg"):
            ioutils.save_mp4("/tmp/t.mp4", frames)


@pytest.mark.slow
def test_app_run_bursts_match_tick_loop():
    """FluidApp.run advances in lax.scan bursts; semantics must match
    tick() looped (modulo the documented scan-fusion last-ulp wiggle)
    and the audit bookkeeping must count burst ticks. Slow lane: the
    scan-of-resident-kernels compile costs ~90 s interpreted on CPU
    (the fast lane covers run()'s loop logic via the dense engine and
    the resident bookkeeping via max_burst=1 below)."""
    from tpufluid import SimSettings, TickParams
    from tpufluid.app import FluidApp

    s = SimSettings(particle_count=144, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(6.0, 6.0), cell_capacity=8)
    p = TickParams.default(gravity=(0.0, -3.0))
    a = FluidApp(s, params=p, neighbor_mode="resident",
                 capacity_policy="fixed")
    b = FluidApp(s, params=p, neighbor_mode="resident",
                 capacity_policy="fixed")
    for _ in range(6):
        a.tick()
    b.run(6, max_burst=4)  # bursts 4+1+1 from the size menu
    np.testing.assert_allclose(np.asarray(a.state.position),
                               np.asarray(b.state.position), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.state.velocity),
                               np.asarray(b.state.velocity), atol=1e-4)
    assert int(b.state.tick) == 6
    assert b._ticks_since_audit == 6
    assert b.metrics()["lost_particles"] == 0


def test_app_run_resident_bookkeeping():
    """run(max_burst=1) shares tick()'s memoized step (no new compile)
    and must keep the audit counters and parity with tick() exactly."""
    from tpufluid import SimSettings, TickParams
    from tpufluid.app import FluidApp

    s = SimSettings(particle_count=144, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(6.0, 6.0), cell_capacity=8)
    p = TickParams.default(gravity=(0.0, -3.0))
    a = FluidApp(s, params=p, neighbor_mode="resident",
                 capacity_policy="fixed")
    b = FluidApp(s, params=p, neighbor_mode="resident",
                 capacity_policy="fixed")
    for _ in range(4):
        a.tick()
    b.run(4, max_burst=1)
    np.testing.assert_array_equal(np.asarray(a.state.position),
                                  np.asarray(b.state.position))
    assert int(b.state.tick) == 4
    assert b._ticks_since_audit == 4


def test_app_run_bursts_dense_engine():
    """The [N]-engine path of FluidApp.run (memoized make_multi_step)."""
    from tpufluid import SimSettings, TickParams
    from tpufluid.app import FluidApp

    s = SimSettings(particle_count=64, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(6.0, 6.0), cell_capacity=16)
    p = TickParams.default(gravity=(0.0, -2.0))
    a = FluidApp(s, params=p, neighbor_mode="dense")
    b = FluidApp(s, params=p, neighbor_mode="dense")
    for _ in range(5):
        a.tick()
    b.run(5, max_burst=4)
    np.testing.assert_allclose(np.asarray(a.state.position),
                               np.asarray(b.state.position), atol=1e-6)
    assert int(b.state.tick) == 5
