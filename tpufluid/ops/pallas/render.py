"""Pallas metaball-field kernel straight off the resident slot grid.

The reference shades the fluid surface per PIXEL by walking the 5x5-cell
neighbor grid in a fragment shader (fluid_shader.wgsl:28-103,
renderer.rs:159-234). A per-pixel neighbor walk is the wrong shape for the
VPU (SURVEY.md section 7 hard part e): at 1080p it is ~2M independent
gather loops. This kernel instead evaluates the Gaussian density and
velocity fields on a WORLD-ALIGNED coarse lattice (``supersample`` samples
per grid cell per axis) directly from the resident grid [Gy, K, Gxp]:

* the slot grid already IS the spatial binning — no re-binning, no
  ``to_particles`` sort (round-2 VERDICT weak item 4);
* candidates reach every lattice sample through lane rolls of
  cell-expanded rows (dx in -3..3 covers the 2.5h influence radius the
  reference uses, fluid_shader.wgsl:39-40), one [K, Wc] roll per
  (row, dx) block — zero gathers;
* empty rows/slots are skipped via the same per-row occupancy scalars as
  the simulation kernels; sentinel slots that do slip through contribute
  exp(-1e18/tau) == 0 exactly.

The caller (ops.render_grid) resamples the coarse field to the camera
viewport with two MXU matmuls (separable bilinear — no per-pixel
gathers) and applies the fluid_shader colormap. The field itself is
camera-independent, so one kernel pass serves any viewport.

The Gaussian has sigma = h/sqrt(2) (= supersample/sqrt(2) lattice units),
so the lattice resolves it at supersample >= 2; the resampling is the
only approximation vs the exact per-pixel renderers (ops.render,
ops.render_binned), measured sub-1e-2 in density units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sph import _interpret, _scalar_spec
from .fused import _sub_blocks

# cells of horizontal reach: influence radius 2.5h fits in +-3 cells
DX_REACH = 3


def _coarse_kernel(consts, occ_ref, *refs):
    (inv_tau, h_s, off_x, off_y, k, wc, gy, sup, n_rows) = consts
    dens_ref, velf_ref = refs[-2:]
    rowrefs = [refs[j * 3:(j + 1) * 3] for j in range(n_rows)]
    p = pl.program_id(0)

    # Mosaic iota must be integer; cast after (tpu.iota is int-only)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (8, wc), 1).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(
        jnp.int32, (8, wc), 0).astype(jnp.float32)
    # world coords of the 8 coarse rows x Wc coarse columns this program
    # shades: cell c spans [(c-1)h - half, c*h - half) (ops.grid.cell_xy)
    wx = (lane + 0.5) * h_s - off_x
    wy = ((jnp.float32(8.0) * p.astype(jnp.float32)) + sub + 0.5) * h_s \
        - off_y

    dens_ref[...] = jnp.zeros((8, wc), jnp.float32)
    velf_ref[...] = jnp.zeros((8, wc), jnp.float32)

    r_first = (8 * p) // sup - DX_REACH
    for j in range(n_rows):
        rj = r_first + j
        occ_rj = occ_ref[jnp.clip(rj, 0, gy - 1)]
        valid = (rj >= 0) & (rj < gy) & (occ_rj > 0)

        @pl.when(valid)
        def _(j=j, occ_rj=occ_rj):
            px_r, py_r, sp_r = (ref[0] for ref in rowrefs[j])
            for lo, hi in _sub_blocks(k):
                @pl.when(occ_rj > lo)
                def _(lo=lo, hi=hi):
                    for dx in range(-DX_REACH, DX_REACH + 1):
                        if _interpret():
                            rl = lambda a: jnp.roll(a, -dx * sup, axis=1)
                        else:
                            rl = lambda a: pltpu.roll(
                                a, (-dx * sup) % wc, axis=1)
                        nx = rl(px_r[lo:hi])
                        ny = rl(py_r[lo:hi])
                        ns = rl(sp_r[lo:hi])
                        d = jnp.zeros((8, wc), jnp.float32)
                        v = jnp.zeros((8, wc), jnp.float32)
                        for kp in range(hi - lo):
                            ddx = nx[kp:kp + 1, :] - wx
                            ddy = ny[kp:kp + 1, :] - wy
                            r2 = ddx * ddx + ddy * ddy
                            # sentinel slots: r2 ~ 1e18 -> exp == 0
                            c = jnp.exp(r2 * inv_tau)
                            d = d + c
                            v = v + c * ns[kp:kp + 1, :]
                        dens_ref[...] = dens_ref[...] + d
                        velf_ref[...] = velf_ref[...] + v


def coarse_metaball_fields(pos_x, pos_y, speed, occ_row, settings,
                           supersample: int = 2):
    """(density, velocity_factor) f32[Hc, Wc] on the coarse world lattice.

    pos_x/pos_y/speed: resident slot grids [Gy, K, Gxp] (sentinel
    empties); occ_row: i32[Gy]. Hc = supersample * Gy,
    Wc = supersample * Gxp. The x wrap of the lane rolls lands on the
    empty sentinel/pad columns, so no margin handling is needed.
    """
    gy, k, gxp = pos_x.shape
    sup = int(supersample)
    if 8 % sup != 0 or (sup * gy) % 8 != 0:
        raise ValueError(f"supersample {sup} must divide 8 and give "
                         f"8-aligned coarse rows (gy={gy})")
    wc = sup * gxp
    hc = sup * gy
    h = float(settings.smoothing_radius)
    half = (float(settings.size[0]) * 0.5, float(settings.size[1]) * 0.5)
    n_rows = 7 // sup + 1 + 2 * DX_REACH
    consts = (
        -1.0 / (float(settings.sqr_radius) * 0.5),  # -inv_tau (folded)
        h / sup,
        half[0] + h,  # off_x: lane 0 sits in the sentinel cell (-half - h)
        half[1] + h,
        k, wc, gy, sup, n_rows,
    )

    # cell-expanded candidate rows: E[l] = C[l // sup], so a lane roll by
    # sup*dx reads cell (l//sup + dx) — exact for sup | shift
    ex = lambda a: jnp.repeat(a, sup, axis=2)
    fields = (ex(pos_x), ex(pos_y), ex(speed))

    specs = []
    for j in range(n_rows):
        def imap(p, j=j):
            return (jnp.clip((8 * p) // sup - DX_REACH + j, 0, gy - 1),
                    0, 0)
        for _ in range(3):
            specs.append(pl.BlockSpec((1, k, wc), imap,
                                      memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((8, wc), lambda p: (p, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_coarse_kernel, consts)
    interleaved = []
    for j in range(n_rows):
        interleaved.extend(fields)
    return pl.pallas_call(
        kernel,
        grid=(hc // 8,),
        in_specs=[_scalar_spec()] + specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((hc, wc), jnp.float32),
            jax.ShapeDtypeStruct((hc, wc), jnp.float32),
        ),
        interpret=_interpret(),
        name="metaball_coarse_field",
    )(jnp.asarray(occ_row, jnp.int32).reshape(-1), *interleaved)
