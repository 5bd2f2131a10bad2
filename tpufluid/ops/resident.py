"""Grid-resident engine: particles live in the cell grid between steps.

The [N]-array engine re-sorts, re-scatters and re-gathers the whole
particle set every step; at 1M particles that data movement is >80% of the
step (xprof). Here the state IS the dense slot grid [Gy, K, Gx]
(ops.dense layout), and each step:

  1. re-bins slots into their new cells with the Pallas rebin kernel
     (ops.pallas.rebin) — local moves only, no sort/scatter/gather;
  2. handles the rare far movers (> 1 cell/step) through an XLA fallback
     under ``lax.cond`` (costs nothing when there are none);
  3. runs the fused Pallas density/force stencils (ops.pallas.sph);
  4. integrates elementwise on the grid (same tpufluid.step._integrate).

Semantics match the [N] engines: re-binning keys are the clamped predicted
positions, neighbor sets are identical; within-cell packing order is
(source row, dx, slot) instead of stable-sort order, so results agree to
f32 reduction order (like dense vs grid mode).

Capacity rules: arrivals beyond cell_capacity and far movers beyond
``far_capacity`` are dropped and COUNTED in ``GridState.lost`` — never
silent. Keep cell_capacity at ~2x rest occupancy.

Obstacle force fields are not yet supported in resident mode (per-slot
texture gathers would reintroduce the cost this engine removes) — use
neighbor_mode='dense' for obstacle scenes.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..params import EPSILON, SimSettings, TickParams
from ..state import ParticleState, init_state
from . import grid as gridops
from .dense import DenseGrid, build_grid_cols
from .pallas import rebin as prebin
from .pallas import sph as psph


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridState:
    """pos/vel/valid slot grids [Gy, K, Gxp] (valid: 0/1 f32), tick,
    cumulative lost-particle counter."""

    pos_x: jax.Array
    pos_y: jax.Array
    vel_x: jax.Array
    vel_y: jax.Array
    valid: jax.Array
    tick: jax.Array
    lost: jax.Array


def _gxp(settings: SimSettings) -> int:
    return -(-settings.grid_w // 128) * 128


def from_particles(state: ParticleState, settings: SimSettings) -> GridState:
    """Bin a ParticleState into the resident grid (boundary conversion)."""
    cells = gridops.cell_id(state.predicted, settings)
    binning = gridops.bin_particles(cells, settings)
    src = jnp.concatenate([state.position, state.velocity], axis=1)
    g4 = src[binning.perm]
    grid = build_grid_cols(
        g4[:, 0], g4[:, 1], g4[:, 2], g4[:, 3], binning.sorted_cells,
        settings)
    return GridState(
        pos_x=grid.px, pos_y=grid.py, vel_x=grid.vx, vel_y=grid.vy,
        valid=grid.valid.astype(jnp.float32),
        tick=state.tick, lost=grid.n_dropped,
    )


def init_grid_state(settings: SimSettings) -> GridState:
    return from_particles(init_state(settings), settings)


def to_particles(gs: GridState, settings: SimSettings) -> Tuple[ParticleState, jax.Array]:
    """(ParticleState, live_count). Slots beyond the live count are zeroed;
    arrays are sized to settings.particle_count."""
    n = settings.particle_count
    size = gs.pos_x.size
    gxp = gs.pos_x.shape[-1]
    k = gs.pos_x.shape[1]
    slot = jnp.arange(size, dtype=jnp.int32)
    cy = slot // (k * gxp)
    cx = slot % gxp
    cell = cy * settings.grid_w + cx
    valid = gs.valid.reshape(-1) > 0.0
    key = jnp.where(valid, cell, jnp.int32(settings.num_cells + 1))
    _, perm = lax.sort_key_val(key, slot, is_stable=True)
    sel = perm[:n]
    live = jnp.sum(valid.astype(jnp.int32))
    ok = jnp.arange(n) < live
    fields = jnp.stack(
        [gs.pos_x.reshape(-1), gs.pos_y.reshape(-1),
         gs.vel_x.reshape(-1), gs.vel_y.reshape(-1)], axis=1)[sel]
    fields = jnp.where(ok[:, None], fields, 0.0)
    cells_out = jnp.where(ok, key[perm[:n]], 0).astype(jnp.uint32)
    pos = fields[:, 0:2]
    return ParticleState(
        position=pos, predicted=pos, velocity=fields[:, 2:4],
        density=jnp.zeros((n,), jnp.float32), cell=cells_out, tick=gs.tick,
    ), live


def make_grid_step(settings: SimSettings, far_capacity: int | None = None):
    """Jitted resident step: GridState x TickParams -> GridState.

    CAPACITY SIZING MATTERS under gravity: the EOS p = k*rho makes a fluid
    column of height H compress ~exp(g*H/k) at the floor; cell_capacity
    must cover rest_occupancy * that factor or mass is shed (counted in
    GridState.lost — a 10k-step soak at 1M with g=2, H~100, k=50 lost 99%
    at capacity 8; the same scene at g=0 loses nothing). See ROADMAP.md for
    the occupancy-packing plan that removes the capacity^2 cost of simply
    raising K.
    """
    from ..step import _integrate

    norms = settings.kernel_norms()
    gxp = _gxp(settings)
    k = settings.cell_capacity
    gy = settings.grid_h
    grid_w = settings.grid_w
    if far_capacity is None:
        # impact phases can fling thousands of >1-cell movers in one step
        far_capacity = max(4096, (gy * k * gxp) // 128)

    def far_fallback(args):
        px, py, vx, vy, vf, far_flat, pos4 = args
        # pack up to far_capacity far movers and re-insert them
        size = px.size
        key = jnp.where(far_flat, 0, 1).astype(jnp.int32)
        _, perm = lax.sort_key_val(
            key, jnp.arange(size, dtype=jnp.int32), is_stable=True)
        sel = perm[:far_capacity]
        n_far = jnp.sum(far_flat.astype(jnp.int32))
        ok = jnp.arange(far_capacity, dtype=jnp.int32) < n_far
        rows = pos4[sel]  # (pos_x, pos_y, vel_x, vel_y, ncx, ncy)
        ncx = rows[:, 4].astype(jnp.int32)
        ncy = rows[:, 5].astype(jnp.int32)
        # order by target cell for in-cell ranking
        tcell = jnp.where(ok, ncy * grid_w + ncx, jnp.int32(2**30))
        tcell_s, perm2 = lax.sort_key_val(
            tcell, jnp.arange(far_capacity, dtype=jnp.int32),
            is_stable=True)
        rows = rows[perm2]
        ok = ok[perm2]
        from .dense import ranks
        rank = ranks(tcell_s)
        occ = jnp.sum(vf, axis=1).astype(jnp.int32)  # [Gy, Gxp]
        occ_f = occ.reshape(-1)
        cyx = tcell_s // grid_w, tcell_s % grid_w
        base = occ_f[jnp.clip(cyx[0], 0, gy - 1) * gxp
                     + jnp.clip(cyx[1], 0, gxp - 1)]
        slot = base + rank
        fits = ok & (slot < k)
        flat = jnp.where(
            fits, (cyx[0] * k + slot) * gxp + cyx[1], px.size)
        px = px.reshape(-1).at[flat].set(rows[:, 0], mode="drop").reshape(px.shape)
        py = py.reshape(-1).at[flat].set(rows[:, 1], mode="drop").reshape(py.shape)
        vx = vx.reshape(-1).at[flat].set(rows[:, 2], mode="drop").reshape(vx.shape)
        vy = vy.reshape(-1).at[flat].set(rows[:, 3], mode="drop").reshape(vy.shape)
        vf = vf.reshape(-1).at[flat].set(1.0, mode="drop").reshape(vf.shape)
        dropped = n_far - jnp.sum(fits.astype(jnp.int32))
        return px, py, vx, vy, vf, dropped

    def step(gs: GridState, params: TickParams) -> GridState:
        frame = gs.tick + jnp.uint32(1)

        # 1. re-bin by next predicted cell (Pallas; local moves)
        px, py, vx, vy, vf, lost_g = prebin.rebin(
            gs.pos_x, gs.pos_y, gs.vel_x, gs.vel_y, gs.valid,
            params.delta, settings, gxp)
        n_lost_local = jnp.round(jnp.sum(lost_g)).astype(jnp.int32)

        # 2. far movers (rare): recompute their targets and re-insert
        dt = params.delta
        half = jnp.asarray(settings.size, jnp.float32) * 0.5
        prx = jnp.clip(gs.pos_x + gs.vel_x * dt, -half[0], half[0])
        pry = jnp.clip(gs.pos_y + gs.vel_y * dt, -half[1], half[1])
        h_inv = jnp.float32(1.0 / settings.smoothing_radius)
        # interior clamp mirrors ops.grid.cell_xy / pallas.rebin._cells_of
        ncx = jnp.clip(
            jnp.floor((prx + half[0]) * h_inv).astype(jnp.int32) + 1,
            1, grid_w - 2)
        ncy = jnp.clip(
            jnp.floor((pry + half[1]) * h_inv).astype(jnp.int32) + 1,
            1, gy - 2)
        scx = jax.lax.broadcasted_iota(jnp.int32, gs.pos_x.shape, 2)
        scy = jax.lax.broadcasted_iota(jnp.int32, gs.pos_x.shape, 0)
        far = (gs.valid > 0.0) & (
            (jnp.abs(ncy - scy) > 1) | (jnp.abs(ncx - scx) > 1))
        far_flat = far.reshape(-1)
        n_far = jnp.sum(far_flat.astype(jnp.int32))
        pos6 = jnp.stack(
            [gs.pos_x.reshape(-1), gs.pos_y.reshape(-1),
             gs.vel_x.reshape(-1), gs.vel_y.reshape(-1),
             ncx.reshape(-1).astype(jnp.float32),
             ncy.reshape(-1).astype(jnp.float32)], axis=1)

        px, py, vx, vy, vf, far_dropped = lax.cond(
            n_far > 0,
            far_fallback,
            lambda args: (args[0], args[1], args[2], args[3], args[4],
                          jnp.int32(0)),
            (px, py, vx, vy, vf, far_flat, pos6),
        )
        # rebin counted far movers as lost; they were re-inserted above
        lost_step = n_lost_local - (n_far - far_dropped)

        # 3. physics on the rebinned grid (prediction recomputed — same
        # formula the rebin keys used)
        prx = jnp.clip(px + vx * dt, -half[0], half[0])
        pry = jnp.clip(py + vy * dt, -half[1], half[1])
        grid = DenseGrid(flat=None, px=prx, py=pry, vx=vx, vy=vy,
                         valid=vf, n_dropped=None)
        dens = psph.density(grid, params.mass, settings.smoothing_radius)
        dens = jnp.maximum(jnp.maximum(dens, EPSILON), 0.1)
        fx, fy, gxf, gyf = psph.forces(
            grid, dens, params, settings.smoothing_radius,
            settings.sqr_radius, norms.spiky_derivative, norms.viscosity,
            frame)

        # 4. integrate elementwise on the grid
        pos = jnp.stack([px, py], axis=-1)
        vel = jnp.stack([vx, vy], axis=-1)
        pred = jnp.stack([prx, pry], axis=-1)
        accel = jnp.stack([fx + gxf, fy + gyf], axis=-1)
        new_pos, new_vel = _integrate(
            pos, vel, pred, dens, accel, params, settings, None)
        mask = vf > 0.0
        return GridState(
            pos_x=jnp.where(mask, new_pos[..., 0], 0.0),
            pos_y=jnp.where(mask, new_pos[..., 1], 0.0),
            vel_x=jnp.where(mask, new_vel[..., 0], 0.0),
            vel_y=jnp.where(mask, new_vel[..., 1], 0.0),
            valid=vf,
            tick=frame,
            lost=gs.lost + lost_step,
        )

    return jax.jit(step)


def make_grid_multi_step(settings: SimSettings, n_steps: int, **kw):
    step = make_grid_step(settings, **kw)

    @jax.jit
    def run(gs, params):
        def body(s, _):
            return step(s, params), None
        out, _ = lax.scan(body, gs, None, length=n_steps)
        return out
    return run
