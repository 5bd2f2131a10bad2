"""Golden-IMAGE render tests (SURVEY.md section 4 point 5: framebuffers
vs stored golden PNGs with tolerance).

The trajectory goldens (test_golden.py) pin the physics; these pin the
VISUAL identity of the renderers — the fluid_shader colormap + edge
highlight (/root/reference/fluid_shader.wgsl:28-103), the clamp-blue
fork, and the point-sprite speed colormap
(/root/reference/particle_shader.wgsl:50-64) — which the property/parity
render tests cannot see (a wrong colormap passes them).

Tolerance: lossless PNGs, but f32 reduction order may shift shading by
an LSB across jax versions, so we allow a small mean abs diff and a
small fraction of >8/255 pixel deviations rather than exact equality.

Regenerate intentionally: REGEN_GOLDEN=1 python -m pytest tests/test_render_golden.py
"""

import os

import numpy as np
import pytest

from tpufluid import SimSettings, TickParams, init_state, make_step
from tpufluid.ops import render as renderops
from tpufluid.ops import render_binned, render_grid
from tpufluid.utils import io as ioutils

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
W, H = 240, 135


def _state():
    s = SimSettings(particle_count=512, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(8.0, 8.0), cell_capacity=32)
    params = TickParams.default(gravity=(0.0, -9.8))
    step = make_step(s, neighbor_mode="grid")
    state = init_state(s)
    for _ in range(30):
        state = step(state, params)
    return state, s


def _camera(s):
    return renderops.Camera(view_size=(s.size[0], s.size[0] * H / W))


def _check_golden(name, frame):
    rgba8 = np.asarray(renderops.to_rgba8(frame))
    path = os.path.join(GOLDEN_DIR, f"render_{name}.png")
    if not os.path.exists(path) or os.environ.get("REGEN_GOLDEN"):
        ioutils.write_png(path, rgba8)
        pytest.skip(f"golden image {name} (re)generated — commit it")
    gold = ioutils.read_png(path)
    assert gold.shape == rgba8.shape
    diff = np.abs(rgba8.astype(np.int32) - gold.astype(np.int32))
    mean_abs = float(diff.mean())
    frac_big = float((diff.max(axis=-1) > 8).mean())
    assert mean_abs < 1.0, f"{name}: mean abs diff {mean_abs}"
    assert frac_big < 0.01, f"{name}: {frac_big:.2%} pixels off by >8"


@pytest.fixture(scope="module")
def state_settings():
    return _state()


def test_golden_metaball(state_settings):
    state, s = state_settings
    _check_golden("metaball", render_binned.render_metaball_binned(
        state, s, W, H, _camera(s)))


def test_golden_metaball_clamp_blue(state_settings):
    """The clamp fires above metaball density 50
    (shaders/fluid_shader.wgsl:101-103); the settled 512 scene peaks ~2,
    so squeeze the state deterministically (x0.12 about the center:
    ~70x density) to make the clamp visibly trigger in the golden."""
    import dataclasses

    import jax.numpy as jnp

    from tpufluid.ops import grid as gridops

    state, s = state_settings
    squeezed = dataclasses.replace(
        state,
        position=state.position * 0.12,
        predicted=state.predicted * 0.12,
    )
    squeezed = dataclasses.replace(
        squeezed,
        cell=gridops.cell_id(squeezed.predicted, s).astype(jnp.uint32))
    frame = render_binned.render_metaball_binned(
        squeezed, s, W, H, _camera(s), density_clamp_blue=True)
    rgba8 = np.asarray(renderops.to_rgba8(frame))
    pure_blue = ((rgba8[..., 0] == 0) & (rgba8[..., 1] == 0)
                 & (rgba8[..., 2] == 255))
    assert pure_blue.sum() > 20, "clamp-blue never triggered"
    _check_golden("metaball_clamp_blue", frame)


def test_golden_particles(state_settings):
    state, s = state_settings
    _check_golden("particles", render_binned.render_particles_binned(
        state, s, W, H, _camera(s)))


def test_golden_grid_renderer(state_settings):
    state, s = state_settings
    _check_golden("grid", render_grid.render_metaball_state(
        state, s, W, H, _camera(s)))
