"""Video-driven force field through the app shell (reference component
2.15, completed: the reference decoded frames but left the force-field
upload commented out, src/main.rs:120-126)."""

import numpy as np

from tpufluid import SimSettings
from tpufluid.app import FluidApp


def test_video_field_pushes_particles_out():
    s = SimSettings(particle_count=256, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(8.0, 8.0),
                    texture_size=(64, 64), cell_capacity=32)
    app = FluidApp(s)
    frames = np.full((2, 64, 64), 255, np.uint8)
    frames[:, 24:40, 24:40] = 0  # central dark block = obstacle
    app.set_video_field(frames)
    for _ in range(10):
        app.tick()
    pos = np.asarray(app.state.position)
    assert np.all(np.isfinite(pos))
    # obstacle square is world [-1, 1]^2: no particles inside (with margin)
    inside = (np.abs(pos[:, 0]) < 0.8) & (np.abs(pos[:, 1]) < 0.8)
    assert inside.sum() == 0

    app.advance_video_frame()  # cycles without error
    app.tick()


def test_video_field_size_mismatch_rejected():
    s = SimSettings(particle_count=16, size=(8.0, 8.0),
                    texture_size=(64, 64), cell_capacity=32)
    app = FluidApp(s)
    import pytest
    with pytest.raises(ValueError):
        app.set_video_field(np.zeros((1, 32, 32), np.uint8))
