"""Fluid-surface rendering straight off the resident slot grid.

TPU-native replacement for the reference's fragment-shader surface pass
(fluid_shader.wgsl:28-103 + renderer.rs:159-234, RENDER_DIMS 960x540 at
renderer.rs:15): the Gaussian density / velocity fields are evaluated on
a world-aligned coarse lattice by one Pallas kernel reading the resident
grid directly (ops.pallas.render — no ``to_particles`` sort, no
re-binning), then resampled to the camera viewport with two MXU matmuls
(separable bilinear — zero per-pixel gathers) and shaded with the
fluid_shader colormap (ops.render_binned.shade_metaball).

Exactness: identical colormap; the density field itself is bilinear-
interpolated from a lattice of ``supersample`` samples per cell per axis
(the Gaussian's sigma is supersample/sqrt(2) lattice units, so 2 resolves
it). For pixel-exact fields use ops.render / ops.render_binned.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..params import SimSettings
from ..state import ParticleState
from .render import Camera
from .render_binned import shade_metaball
from .pallas.render import coarse_metaball_fields


def _axis_weights(n_pix, pix_world, coarse_n, coarse_world_off, step):
    """[coarse_n, n_pix] bilinear interpolation matrix for one axis.

    pix_world: f32[n_pix] world coordinate per output pixel;
    coarse sample i sits at world ``(i + 0.5) * step - coarse_world_off``.
    Out-of-lattice pixels get all-zero weights (density-0 background).
    """
    u = (pix_world + coarse_world_off) / step - 0.5
    i0 = jnp.floor(u)
    w = (u - i0)[None, :]
    i0 = i0.astype(jnp.int32)[None, :]
    rows = jnp.arange(coarse_n, dtype=jnp.int32)[:, None]
    mat = (jnp.where(rows == i0, 1.0 - w, 0.0)
           + jnp.where(rows == i0 + 1, w, 0.0))
    inb = (u >= 0.0) & (u <= coarse_n - 1.0)
    return mat * inb[None, :]


def resample_fields(fields, settings, width, height, camera: Camera,
                    supersample: int):
    """Bilinear-resample [Hc, Wc] world-lattice fields to the [H, W]
    camera viewport via two matmuls (MXU; no gathers)."""
    hc, wc = fields[0].shape
    h = settings.smoothing_radius
    step = h / supersample
    half = jnp.asarray(settings.size, jnp.float32) * 0.5
    cx, cy = camera.center
    vw, vh = camera.view_size
    # ops.render.Camera convention: row 0 is +y (top of the view)
    px = cx + ((jnp.arange(width, dtype=jnp.float32) + 0.5) / width
               - 0.5) * vw
    py = cy + (0.5 - (jnp.arange(height, dtype=jnp.float32) + 0.5)
               / height) * vh
    wx = _axis_weights(width, px, wc, half[0] + h, step)
    wy = _axis_weights(height, py, hc, half[1] + h, step)
    return tuple((wy.T @ f) @ wx for f in fields)


def render_metaball_grid(
    gs, settings: SimSettings,
    width: int = 960, height: int = 540, camera: Camera = Camera(),
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    density_clamp_blue: bool = False, supersample: int = 2,
):
    """rgba f32[H, W, 4] fluid surface from a resident GridState.

    Positions are the grid's CURRENT positions (the per-pixel renderers
    use ``state.predicted`` like the reference's fragment shader; the
    difference is v*dt, sub-pixel at the default dt).
    """
    speed = jnp.sqrt(gs.vel_x * gs.vel_x + gs.vel_y * gs.vel_y)
    dens_c, velf_c = coarse_metaball_fields(
        gs.pos_x, gs.pos_y, speed, gs.occ_row, settings, supersample)
    dens, velf = resample_fields(
        (dens_c, velf_c), settings, width, height, camera, supersample)
    return shade_metaball(dens, velf, background, density_clamp_blue)


def render_metaball_state(
    state: ParticleState, settings: SimSettings,
    width: int = 960, height: int = 540, camera: Camera = Camera(),
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    density_clamp_blue: bool = False, supersample: int = 2,
):
    """Same pipeline for an [N]-engine ParticleState: one grid binning
    (scatter) replaces the per-frame sort + re-bin of the binned path."""
    from . import resident
    gs = resident.from_particles(state, settings)
    return render_metaball_grid(gs, settings, width, height, camera,
                                background, density_clamp_blue,
                                supersample)
