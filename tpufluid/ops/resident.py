"""Grid-resident engine: particles live in the cell grid between steps.

The [N]-array engine re-sorts, re-scatters and re-gathers the whole
particle set every step; at 1M particles that data movement is >80% of the
step (xprof). Here the state IS the dense slot grid [Gy, K, Gxp]
(K = cell_capacity, minor dim = grid x), and each step is three fused
occupancy-aware Pallas kernels (ops.pallas.fused):

  1. rebin: slots move to their new cells (local moves only, no
     sort/scatter/gather), emitting per-row occupancy/far/overflow scalars;
  2. far movers (> 1 cell/step, rare) re-insert through an XLA fallback
     under ``lax.cond`` (costs nothing when there are none);
  3. density -> (pressure, 1/rho);
  4. forces fused with the FULL integration (gravity, mouse impulse, NaN
     reset, speed clamp, obstacle force field, boundary bounce/wrap) —
     compute.wgsl:59-299 + 95-155 in two kernels, no elementwise passes.

Empty slots hold position = fused.SENTINEL (no valid mask — exclusion
falls out of the range test); ``occ_row`` carries per-row packed occupancy
so kernel work tracks real occupancy instead of capacity^2 (ROADMAP
round-1 lever, measured 1.78x at occupancy 4 / K 8).

Semantics match the [N] engines: re-binning keys are the clamped predicted
positions, neighbor sets are identical; candidate iteration order is
(slot, row, dx) and within-cell packing order is (source row, dx, slot),
so results agree to f32 reduction order (tests/test_resident.py).

Capacity rules: arrivals beyond cell_capacity and far movers beyond
``far_capacity`` are dropped and COUNTED in ``GridState.lost`` — never
silent. Keep cell_capacity at ~2x rest occupancy (params.SimSettings).

Obstacle force fields are supported at CELL granularity: one push-out
vector per grid cell (sampled at the cell center), vs the reference's
per-particle texel fetch (compute.wgsl:127-132). At defaults a cell spans
~2 texels, so the approximation error is sub-cell; use
neighbor_mode='dense' when per-texel sampling matters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..params import SimSettings, TickParams
from ..state import ParticleState, init_state
from . import grid as gridops
from .dense import build_grid_cols
from .pallas import fused
from .pallas.fused import SENTINEL, SENTINEL_HALF


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridState:
    """pos/vel slot grids [Gy, K, Gxp] (empty slots at pos=SENTINEL),
    per-row packed occupancy i32[Gy], tick, cumulative lost counter."""

    pos_x: jax.Array
    pos_y: jax.Array
    vel_x: jax.Array
    vel_y: jax.Array
    occ_row: jax.Array
    tick: jax.Array
    lost: jax.Array


def _gxp(settings: SimSettings) -> int:
    return -(-settings.grid_w // 128) * 128


# rows per Pallas program in the fused kernels: the flat ~2us per-program
# overhead dominates at small N and is ~25% of the 1M step; grids are
# padded with empty rows to a multiple of this
ROWS_PER_PROGRAM = 4


def pad_capacity(settings: SimSettings) -> SimSettings:
    """Round cell_capacity > 8 up to a multiple of 8 (the dynamic
    sub-block loops in ops.pallas.fused slice the slot axis in 8-slot
    tiles). Extra capacity never loses mass; the user contract is a
    minimum."""
    k = settings.cell_capacity
    if k <= 8 or k % 8 == 0:
        return settings
    return dataclasses.replace(settings, cell_capacity=-(-k // 8) * 8)


def _split_physics() -> bool:
    """Physics kernel layout: the two-kernel density + forces path
    (default) vs the single fused physics kernel (bitwise identical
    outputs either way; TPUFLUID_FUSED_PHYSICS=1 /
    TPUFLUID_SPLIT_PHYSICS=1 force one or the other).

    Round-4 A/B on v5e (scripts/ab_r4.py, settled states, matched
    bursts) measured the fused kernel a LOSS at every scale — 64k
    0.847 vs 0.805 ms, 256k 1.123 vs ~0.98, 1M standalone physics
    2.041/1.931 (rblk 4/8) vs 1.845 — because it must recompute
    density for its (rblk+2)-row halo, which outweighs the saved
    pres/invr HBM round-trip and prologue. Kept for A/B and as the
    substrate for future layouts where the halo redundancy shrinks
    (ROADMAP item 11)."""
    import os
    if os.environ.get("TPUFLUID_SPLIT_PHYSICS", ""):
        return True
    if os.environ.get("TPUFLUID_FUSED_PHYSICS", ""):
        return False
    return True


def rows_per_program(settings: SimSettings) -> int:
    """Largest rows-per-program whose physics-kernel VMEM footprint fits
    the ~16 MB budget (row padding stays at 4, a multiple of every
    choice). Footprint model, validated against the compiler's scoped-
    vmem accounting: double-buffered 4-field (rblk+4)-row inputs +
    double-buffered 4-field rblk-row outputs + scratch (2 pred rows x
    (rblk+4), 2 density rows x (rblk+2), ~10 single-row accumulators),
    all [K, Gxp] f32 tiles."""
    k = pad_capacity(settings).cell_capacity
    gxp = _gxp(settings)
    for rblk in (ROWS_PER_PROGRAM, 2, 1):
        est = 4 * k * gxp * (8 * (rblk + 4) + 8 * rblk
                             + 2 * (rblk + 4) + 2 * (rblk + 2) + 15)
        if est <= 15 * 2**20:
            return rblk
    return 1


def _rows(settings: SimSettings) -> int:
    """Grid rows padded to a ROWS_PER_PROGRAM multiple (pad rows are
    permanently empty — cell rows never exceed grid_h - 2)."""
    return -(-settings.grid_h // ROWS_PER_PROGRAM) * ROWS_PER_PROGRAM


def valid_mask(gs: GridState) -> jax.Array:
    """bool[Gy, K, Gxp]: which slots hold a live particle."""
    return gs.pos_x < SENTINEL_HALF


def occ_row_of(pos_x: jax.Array) -> jax.Array:
    """Per-row max packed occupancy, recomputed from a sentinel grid."""
    occ_cell = jnp.sum((pos_x < SENTINEL_HALF).astype(jnp.int32), axis=1)
    return jnp.max(occ_cell, axis=1)


def from_particles(state: ParticleState, settings: SimSettings) -> GridState:
    """Bin a ParticleState into the resident grid (boundary conversion)."""
    settings = pad_capacity(settings)
    cells = gridops.cell_id(state.predicted, settings)
    binning = gridops.bin_particles(cells, settings)
    src = jnp.concatenate([state.position, state.velocity], axis=1)
    g4 = src[binning.perm]
    grid = build_grid_cols(
        g4[:, 0], g4[:, 1], g4[:, 2], g4[:, 3], binning.sorted_cells,
        settings, dims=(_rows(settings), settings.grid_w))
    px = jnp.where(grid.valid, grid.px, SENTINEL)
    py = jnp.where(grid.valid, grid.py, SENTINEL)
    return GridState(
        pos_x=px, pos_y=py, vel_x=grid.vx, vel_y=grid.vy,
        occ_row=occ_row_of(px),
        tick=state.tick, lost=grid.n_dropped,
    )


def init_grid_state(settings: SimSettings) -> GridState:
    return from_particles(init_state(settings), settings)


def grow_capacity(gs: GridState, new_k: int) -> GridState:
    """Widen the slot axis to ``new_k`` (appending sentinel slots).

    Arrivals pack into slots 0..count-1, so appending empties preserves
    every packing invariant; occupancy and the physics trajectory are
    unchanged (kernel cost tracks occupancy, not capacity). This is the
    cheap half of FluidApp's regrow-and-replay answer to the reference's
    unbounded per-cell loops (compute.wgsl:182-229): headroom costs only
    memory, never compute."""
    gy, k, gxp = gs.pos_x.shape
    if new_k % 8 != 0:
        raise ValueError(f"new_k {new_k} must be a multiple of 8")
    if new_k <= k:
        return gs
    pad_s = jnp.full((gy, new_k - k, gxp), SENTINEL, jnp.float32)
    pad_z = jnp.zeros((gy, new_k - k, gxp), jnp.float32)
    cat = lambda a, p: jnp.concatenate([a, p], axis=1)
    return dataclasses.replace(
        gs, pos_x=cat(gs.pos_x, pad_s), pos_y=cat(gs.pos_y, pad_s),
        vel_x=cat(gs.vel_x, pad_z), vel_y=cat(gs.vel_y, pad_z))


def shrink_capacity(gs: GridState, new_k: int) -> GridState:
    """Narrow the slot axis to ``new_k`` (dropping trailing slot tiles).

    Exact only when every row's occupancy is <= ``new_k``: arrivals pack
    into slots 0..count-1, so the trailing tiles hold only sentinels and
    slicing them off loses nothing (the caller — FluidApp's shrink-back
    hysteresis — checks max occupancy first). The inverse of
    ``grow_capacity``: slot tiles are free for COMPUTE (occupancy-sliced
    kernels) but not for DMA — the rebin kernel writes all ``K`` output
    slots, measured 1.06 vs 0.849 ms/step at K=16 vs 8 on the reference
    default scene (100k, 53x53) — so sustained headroom is worth
    reclaiming after a transient-compression regrow."""
    gy, k, gxp = gs.pos_x.shape
    if new_k % 8 != 0:
        raise ValueError(f"new_k {new_k} must be a multiple of 8")
    if new_k >= k:
        return gs
    sl = lambda a: a[:, :new_k, :]
    return dataclasses.replace(
        gs, pos_x=sl(gs.pos_x), pos_y=sl(gs.pos_y),
        vel_x=sl(gs.vel_x), vel_y=sl(gs.vel_y))


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
    valid = valid_mask(gs).reshape(-1)
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


def forcefield_cells(forcefield: jax.Array, settings: SimSettings,
                     gxp: Optional[int] = None, row_start=0,
                     n_rows: Optional[int] = None):
    """Sample the [H, W, 2] pixel push-out field at grid-cell centers.

    Returns (ffx, ffy) f32[Gy, Gxp] PIXEL-space vectors (the kernel scales
    the position push to world units and normalizes in pixel space, like
    compute.wgsl:127-140). The sentinel ring and pad columns are zeroed.

    ``row_start``/``n_rows``: global-row window for sharded slabs (may be
    traced).
    """
    gy, gw = settings.grid_h, settings.grid_w
    n_rows = n_rows if n_rows is not None else gy
    gxp = gxp if gxp is not None else _gxp(settings)
    h = settings.smoothing_radius
    half = jnp.asarray(settings.size, jnp.float32) * 0.5
    tex_w, tex_h = settings.texture_size
    # world coords of cell centers; cell index c covers
    # [(c-1)*h - half, c*h - half) (ops.grid.cell_xy inverse)
    rows = row_start + jnp.arange(n_rows, dtype=jnp.int32)
    wx = (jnp.arange(gxp, dtype=jnp.float32) - 0.5) * h - half[0]
    wy = (rows.astype(jnp.float32) - 0.5) * h - half[1]
    # texel per sample_force_field (step.py): uv = p/size + 0.5
    tx = jnp.clip(((wx / (2.0 * half[0]) + 0.5) * tex_w).astype(jnp.int32),
                  0, tex_w - 1)
    ty = jnp.clip(((wy / (2.0 * half[1]) + 0.5) * tex_h).astype(jnp.int32),
                  0, tex_h - 1)
    f = forcefield[ty[:, None], tx[None, :]]  # [n_rows, Gxp, 2]
    in_x = (jnp.arange(gxp) >= 1) & (jnp.arange(gxp) <= gw - 2)
    in_y = (rows >= 1) & (rows <= gy - 2)
    mask = (in_y[:, None] & in_x[None, :]).astype(jnp.float32)
    return f[..., 0] * mask, f[..., 1] * mask


def make_grid_step(settings: SimSettings, far_capacity: int | None = None,
                   x_boundary: str = "bounce",
                   has_force_field: bool = False,
                   surface_tension: bool = False,
                   adaptive_subsampling: bool = False,
                   n_worlds: int = 1):
    """Jitted resident step: ``step(gs, params[, forcefield]) -> GridState``.

    Memoized on all (hashable) arguments: FluidApp's capacity
    regrow/shrink hysteresis rebuilds steps as it moves between
    capacities, and without the cache every move back to an
    already-compiled capacity re-traced and re-compiled the kernels
    (jax.jit caches per function INSTANCE; each call here used to mint a
    fresh closure).

    CAPACITY SIZING MATTERS under gravity: the EOS p = k*rho makes a fluid
    column of height H compress ~exp(g*H/k) at the floor; cell_capacity
    must cover rest_occupancy * that factor or mass is shed (counted in
    GridState.lost). See SimSettings.cell_capacity guidance.
    """
    if x_boundary not in ("bounce", "wrap"):
        raise ValueError(f"unknown x_boundary {x_boundary!r}")
    key = (settings, far_capacity, x_boundary, has_force_field,
           surface_tension, adaptive_subsampling, n_worlds)
    hit = _STEP_CACHE.get(key)
    if hit is not None:
        return hit
    settings = pad_capacity(settings)
    gxp = _gxp(settings)
    k = settings.cell_capacity
    gy = settings.grid_h
    gy_p = _rows(settings)  # state rows per world (ROWS_PER_PROGRAM pad)
    grid_w = settings.grid_w
    gy_total = gy_p * n_worlds
    rblk = rows_per_program(settings)
    h_inv = 1.0 / settings.smoothing_radius
    if far_capacity is None:
        # impact phases can fling thousands of >1-cell movers in one step
        far_capacity = max(4096, (gy_total * k * gxp) // 128)
    # batched world stacks: each world's grid rows already end in the
    # empty sentinel ring, so worlds stack directly along the row axis
    # with zero cross-talk; only the cell-row comparison frame (row_shift)
    # and the per-world scalar lookup (wid) change.
    if n_worlds > 1:
        wid = jnp.repeat(jnp.arange(n_worlds, dtype=jnp.int32), gy_p)
        row_shift = -(wid * gy_p)
    else:
        wid = None
        row_shift = None
    # Capacity-sliced REBIN dispatch: slots beyond the running max
    # occupancy are all sentinel, so the rebin source scan runs on a
    # [*, kv, Gxp] slice with kv = the occupancy rounded up to a slot
    # tile, and packs at most kv+8 output slots (one tile of headroom;
    # occupancy growing faster triggers a full-capacity redo below —
    # costs nothing when clean). The PHYSICS kernels need no slicing:
    # sub-row slot folding (ops.pallas.fused._sub_blocks) bounds their
    # work per row at 8-slot granularity internally, which also keeps
    # the compiled-variant count flat in K.
    kvs = ([k] if (k <= 8 or k % 8 != 0)
           else list(range(8, k + 1, 8)))

    def _kv_index(occ_row):
        occ_max = jnp.max(occ_row)
        return jnp.clip((occ_max + 7) // 8 - 1, 0, len(kvs) - 1)

    def step(gs: GridState, params: TickParams,
             forcefield: Optional[jax.Array] = None) -> GridState:
        frame = gs.tick + jnp.uint32(1)
        dt = params.delta
        if n_worlds > 1 and dt.ndim != 0:
            raise ValueError(
                "batched resident mode shares one delta across worlds "
                "(pass a scalar); gravity/viscosity/etc. may be [B]")

        # 1. re-bin by next predicted cell (Pallas; local moves); the
        # source-slot scan is capacity-sliced, the output shape is full
        # K with packing capped at kv+8 (redo below covers faster growth)
        if len(kvs) == 1:
            px, py, vx, vy, occ_row, far_n, over_n = fused.rebin(
                gs.pos_x, gs.pos_y, gs.vel_x, gs.vel_y, gs.occ_row, dt,
                settings, row_shift=row_shift, rows_per_program=rblk)
        else:
            def rebin_branch(kv):
                def f(ops):
                    gpx, gpy, gvx, gvy, gocc = ops
                    return fused.rebin(
                        gpx[:, :kv], gpy[:, :kv], gvx[:, :kv],
                        gvy[:, :kv], gocc, dt, settings,
                        row_shift=row_shift, rows_per_program=rblk,
                        out_capacity=k,
                        active_capacity=min(kv + 8, k))
                return f

            outs = lax.switch(
                _kv_index(gs.occ_row),
                [rebin_branch(kv) for kv in kvs],
                (gs.pos_x, gs.pos_y, gs.vel_x, gs.vel_y, gs.occ_row))

            # occupancy jumped past the kv+8 headroom in one step (rare:
            # violent compression): redo at full capacity so arrivals the
            # optimistic pass would have shed are kept. over_n > 0 out of
            # the redo is TRUE capacity loss (counted in GridState.lost).
            def redo_full(_):
                return fused.rebin(
                    gs.pos_x, gs.pos_y, gs.vel_x, gs.vel_y, gs.occ_row,
                    dt, settings, row_shift=row_shift,
                    rows_per_program=rblk)

            px, py, vx, vy, occ_row, far_n, over_n = lax.cond(
                jnp.sum(outs[6]) > 0, redo_full, lambda _: outs, None)
        n_far = jnp.sum(far_n)
        n_over = jnp.sum(over_n)

        # 2. far movers (rare): recompute their targets and re-insert.
        # All the heavy mask math lives INSIDE the cond branch.
        def do_far(ops):
            px, py, vx, vy, occ_row = ops
            half = jnp.asarray(settings.size, jnp.float32) * 0.5
            prx = jnp.clip(gs.pos_x + gs.vel_x * dt, -half[0], half[0])
            pry = jnp.clip(gs.pos_y + gs.vel_y * dt, -half[1], half[1])
            # interior clamp mirrors ops.grid.cell_xy / fused rebin
            ncx = jnp.clip(
                jnp.floor((prx + half[0]) * h_inv).astype(jnp.int32) + 1,
                1, grid_w - 2)
            ncy = jnp.clip(
                jnp.floor((pry + half[1]) * h_inv).astype(jnp.int32) + 1,
                1, gy - 2)
            scx = jax.lax.broadcasted_iota(jnp.int32, gs.pos_x.shape, 2)
            scy = jax.lax.broadcasted_iota(jnp.int32, gs.pos_x.shape, 0)
            if n_worlds > 1:
                # world-local cell row -> absolute stacked row
                ncy = ncy + (scy // gy_p) * gy_p
            far = (gs.pos_x < SENTINEL_HALF) & (
                (jnp.abs(ncy - scy) > 1) | (jnp.abs(ncx - scx) > 1))
            far_flat = far.reshape(-1)
            size = px.size
            sort_key = jnp.where(far_flat, 0, 1).astype(jnp.int32)
            _, perm = lax.sort_key_val(
                sort_key, jnp.arange(size, dtype=jnp.int32), is_stable=True)
            sel = perm[:far_capacity]
            ok = jnp.arange(far_capacity, dtype=jnp.int32) < n_far
            rows = jnp.stack(
                [gs.pos_x.reshape(-1), gs.pos_y.reshape(-1),
                 gs.vel_x.reshape(-1), gs.vel_y.reshape(-1),
                 ncx.reshape(-1).astype(jnp.float32),
                 ncy.reshape(-1).astype(jnp.float32)], axis=1)[sel]
            tcx = rows[:, 4].astype(jnp.int32)
            tcy = rows[:, 5].astype(jnp.int32)
            # order by target cell for in-cell ranking
            tcell = jnp.where(ok, tcy * grid_w + tcx, jnp.int32(2**30))
            tcell_s, perm2 = lax.sort_key_val(
                tcell, jnp.arange(far_capacity, dtype=jnp.int32),
                is_stable=True)
            rows = rows[perm2]
            ok = ok[perm2]
            from .dense import ranks
            rank = ranks(tcell_s)
            occ_cell = jnp.sum(
                (px < SENTINEL_HALF).astype(jnp.int32), axis=1)  # [Gy, Gxp]
            cy2 = jnp.clip(tcell_s // grid_w, 0, gy_total - 1)
            cx2 = jnp.clip(tcell_s % grid_w, 0, gxp - 1)
            base = occ_cell.reshape(-1)[cy2 * gxp + cx2]
            slot = base + rank
            fits = ok & (slot < k)
            flat = jnp.where(fits, (cy2 * k + slot) * gxp + cx2, size)
            px = px.reshape(-1).at[flat].set(
                rows[:, 0], mode="drop").reshape(px.shape)
            py = py.reshape(-1).at[flat].set(
                rows[:, 1], mode="drop").reshape(py.shape)
            vx_ = vx.reshape(-1).at[flat].set(
                rows[:, 2], mode="drop").reshape(vx.shape)
            vy_ = vy.reshape(-1).at[flat].set(
                rows[:, 3], mode="drop").reshape(vy.shape)
            dropped = n_far - jnp.sum(fits.astype(jnp.int32))
            return px, py, vx_, vy_, occ_row_of(px), dropped

        px, py, vx, vy, occ_row, far_dropped = lax.cond(
            n_far > 0,
            do_far,
            lambda ops: (*ops, jnp.int32(0)),
            (px, py, vx, vy, occ_row),
        )

        # 3. physics: density -> (pressure, 1/rho) -> forces + integration,
        # two fused occupancy-aware Pallas kernels (capacity-sliced)
        ff_cells = None
        if has_force_field:
            if forcefield is None:
                raise ValueError("step built with has_force_field=True "
                                 "needs a forcefield argument")
            if n_worlds > 1:
                # per-world [W, H, Wtex, 2] (or one shared [H, Wtex, 2])
                # field; each world's cell samples stack along the row
                # axis like the state rows do
                ff = forcefield
                if ff.ndim == 3:
                    ff = jnp.broadcast_to(ff, (n_worlds,) + ff.shape)
                parts = [forcefield_cells(ff[w], settings, gxp,
                                          n_rows=gy_p)
                         for w in range(n_worlds)]
                ff_cells = (jnp.concatenate([p[0] for p in parts]),
                            jnp.concatenate([p[1] for p in parts]))
            else:
                ff_cells = forcefield_cells(forcefield, settings, gxp,
                                            n_rows=gy_p)

        # full-K calls: sub-row folding inside the kernels bounds the
        # work by per-row occupancy at 8-slot granularity. Default is
        # the two-kernel density + forces path (the fused physics
        # kernel measured slower at every scale — _split_physics);
        # TPUFLUID_FUSED_PHYSICS=1 switches to the single kernel.
        if _split_physics():
            pres, invr = fused.density(
                px, py, vx, vy, occ_row, params.mass, dt,
                params.pressure_constant, params.rest_density, settings,
                wid=wid, rows_per_program=rblk)
            npx, npy, nvx, nvy = fused.forces_integrate(
                px, py, vx, vy, pres, invr, occ_row, params, settings,
                frame, ff_cells=ff_cells, x_boundary=x_boundary,
                surface_tension=surface_tension,
                adaptive_subsampling=adaptive_subsampling, wid=wid,
                rows_per_program=rblk)
        else:
            npx, npy, nvx, nvy = fused.physics(
                px, py, vx, vy, occ_row, params, settings,
                frame, ff_cells=ff_cells, x_boundary=x_boundary,
                surface_tension=surface_tension,
                adaptive_subsampling=adaptive_subsampling, wid=wid,
                rows_per_program=rblk)

        return GridState(
            pos_x=npx, pos_y=npy, vel_x=nvx, vel_y=nvy,
            occ_row=occ_row,  # packing unchanged by integration
            tick=frame,
            lost=gs.lost + n_over + far_dropped,
        )

    if has_force_field:
        fn = jax.jit(step)
    else:
        fn = jax.jit(lambda gs, params: step(gs, params, None))
    _STEP_CACHE[key] = fn
    return fn


_STEP_CACHE: dict = {}
_MULTI_STEP_CACHE: dict = {}


def make_grid_multi_step(settings: SimSettings, n_steps: int, **kw):
    """``run(gs, params[, forcefield])``: ``n_steps`` resident steps under
    one ``lax.scan`` (one device dispatch). Memoized like
    ``make_grid_step``."""
    key = (settings, n_steps, tuple(sorted(kw.items())))
    hit = _MULTI_STEP_CACHE.get(key)
    if hit is not None:
        return hit
    has_ff = kw.get("has_force_field", False)
    step = make_grid_step(settings, **kw)

    if has_ff:
        @jax.jit
        def run(gs, params, forcefield):
            def body(s, _):
                return step(s, params, forcefield), None
            out, _ = lax.scan(body, gs, None, length=n_steps)
            return out
    else:
        @jax.jit
        def run(gs, params):
            def body(s, _):
                return step(s, params), None
            out, _ = lax.scan(body, gs, None, length=n_steps)
            return out
    _MULTI_STEP_CACHE[key] = run
    return run


# ------------------------------------------------------------- batching
# BASELINE config 4: B independent worlds with differing per-tick params,
# stepped by ONE set of fused kernels. Worlds stack along the grid-row
# axis (each world's sentinel ring separates it from its neighbors), so
# kernel cost scales with total rows — no vmap, no per-world dispatch.

def init_batched_grid_state(settings: SimSettings,
                            n_worlds: int) -> GridState:
    """The reference spawn lattice replicated into a B-world row stack."""
    gs = init_grid_state(settings)
    return GridState(
        pos_x=jnp.tile(gs.pos_x, (n_worlds, 1, 1)),
        pos_y=jnp.tile(gs.pos_y, (n_worlds, 1, 1)),
        vel_x=jnp.tile(gs.vel_x, (n_worlds, 1, 1)),
        vel_y=jnp.tile(gs.vel_y, (n_worlds, 1, 1)),
        occ_row=jnp.tile(gs.occ_row, (n_worlds,)),
        tick=gs.tick, lost=gs.lost,
    )


def batched_params(param_list) -> TickParams:
    """Stack B TickParams into one with a leading [B] dim on every field
    EXCEPT delta, which must be shared (scalar) across worlds."""
    import numpy as _np
    d0 = _np.asarray(param_list[0].delta)
    for p in param_list[1:]:
        if not _np.array_equal(_np.asarray(p.delta), d0):
            raise ValueError("batched worlds must share delta")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *param_list)
    stacked.delta = param_list[0].delta
    return stacked


def batched_world_stats(gs: GridState, settings: SimSettings,
                        n_worlds: int) -> dict:
    """Per-world occupancy/row metrics for a batched row stack.

    The fused kernels' cost scales with occupied rows x occ3 (candidate
    slots scanned), so per-world variance here IS the batched-vs-single
    throughput gap (BASELINE config 4): the stacked kernels pay every
    world's row count at that world's occupancy, and a world whose fluid
    spreads over more rows or compresses to higher occ3 costs more than
    the single-scene equivalent. Returns plain Python lists (one entry
    per world): particle count, occupied rows, per-row max occupancy
    (mean over occupied rows / max), and mean occ3 over occupied rows —
    the candidate-scan bound the kernels actually pay."""
    gy = _rows(settings)
    occ_cell = jnp.sum((gs.pos_x < SENTINEL_HALF).astype(jnp.int32),
                       axis=1)  # [Gy_total, Gxp]
    occ_cell = occ_cell.reshape(n_worlds, gy, -1)
    n_parts = jnp.sum(occ_cell, axis=(1, 2))
    rowmax = jnp.max(occ_cell, axis=2)  # [W, Gy]
    occupied = rowmax > 0
    n_rows = jnp.sum(occupied.astype(jnp.int32), axis=1)
    lo = jnp.concatenate([rowmax[:, :1] * 0, rowmax[:, :-1]], axis=1)
    hi = jnp.concatenate([rowmax[:, 1:], rowmax[:, :1] * 0], axis=1)
    occ3 = jnp.maximum(jnp.maximum(lo, rowmax), hi)
    denom = jnp.maximum(n_rows, 1).astype(jnp.float32)
    mean_rowmax = (jnp.sum(jnp.where(occupied, rowmax, 0), axis=1)
                   / denom)
    mean_occ3 = (jnp.sum(jnp.where(occupied, occ3, 0), axis=1)
                 / denom)
    return dict(
        particles=[int(x) for x in n_parts],
        occupied_rows=[int(x) for x in n_rows],
        rowmax_mean=[float(x) for x in mean_rowmax],
        rowmax_max=[int(x) for x in jnp.max(rowmax, axis=1)],
        occ3_mean=[float(x) for x in mean_occ3],
    )


def world_state(gs: GridState, settings: SimSettings, w: int) -> GridState:
    """Slice world ``w`` out of a batched row stack."""
    gy = _rows(settings)
    sl = slice(w * gy, (w + 1) * gy)
    return GridState(
        pos_x=gs.pos_x[sl], pos_y=gs.pos_y[sl],
        vel_x=gs.vel_x[sl], vel_y=gs.vel_y[sl],
        occ_row=gs.occ_row[sl], tick=gs.tick, lost=gs.lost,
    )
