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


def test_video_frame_to_field_alignment():
    """Rendered frame i must consume video frame i, starting at 0 — the
    reference decodes exactly one packet per rendered frame from the very
    first frame (src/main.rs:154-197). Regression test for the off-by-one
    where iter_frames advanced BEFORE the first frame (frame 0 then used
    _video_fields[1])."""
    s = SimSettings(particle_count=64, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(8.0, 8.0),
                    texture_size=(64, 64), cell_capacity=32)
    app = FluidApp(s)
    # 4 distinct frames: obstacle block in a different quadrant each frame
    frames = np.full((4, 64, 64), 255, np.uint8)
    frames[0, 0:16, 0:16] = 0
    frames[1, 0:16, 48:64] = 0
    frames[2, 48:64, 0:16] = 0
    frames[3, 48:64, 48:64] = 0
    app.set_video_field(frames)

    fields = [np.asarray(f) for f in app._video_fields]
    seen = []
    for i, _ in enumerate(app.iter_frames(5, width=64, height=64)):
        cur = np.asarray(app._forcefield)
        matches = [j for j, f in enumerate(fields) if np.array_equal(cur, f)]
        assert len(matches) == 1
        seen.append(matches[0])
    # frame i rendered under field i (mod 4): advance happens after render
    assert seen == [0, 1, 2, 3, 0]


def test_video_field_size_mismatch_rejected():
    s = SimSettings(particle_count=16, size=(8.0, 8.0),
                    texture_size=(64, 64), cell_capacity=32)
    app = FluidApp(s)
    import pytest
    with pytest.raises(ValueError):
        app.set_video_field(np.zeros((1, 32, 32), np.uint8))
