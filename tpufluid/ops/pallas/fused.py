"""Occupancy-aware fused Pallas kernels for the grid-resident engine (v3).

These are the performance-critical native TPU kernels of the framework —
the equivalents of the reference's WGSL compute pipeline
(/root/reference/compute.wgsl:8-299) restructured around what the round-1
profile showed: at cell_capacity K the round-1 kernels paid K^2 candidate
work regardless of real occupancy (~35% waste at K=8 / occupancy 4, and a
4k scene in a mostly-empty world paid for the whole grid).

Design (all measured on v5e, see BASELINE.md):

* **Occupancy-bounded candidate loops.** The slot dimension is packed by
  the rebin kernel (arrivals fill slots 0..count-1), so per-row scalars
  (``occ3[y]`` = max occupancy of rows y-1..y+1 bounding candidates,
  ``occ_row[y]`` bounding targets) drive DYNAMIC ``lax.fori_loop``s over
  8-slot sub-blocks with ``pl.ds`` slot slices: cost tracks occupancy at
  one-sublane-tile granularity for ANY cell_capacity, from ONE compiled
  kernel whose code size is flat in K. (Round-2's static K-unrolls hit an
  instruction-streaming floor — a K=32 kernel cost a flat ~0.4 ms
  regardless of occupancy; round 2's per-candidate ``pl.when`` guards
  also serialized scalar branches against vector issue, so within a
  sub-block the 8 candidates now run UNGUARDED in registers — sentinel
  slots self-exclude via the range test — with one scratch RMW per
  sub-block pair.)
* **Whole-row skip.** Empty rows (``occ_row[y] == 0``) write defaults and
  skip everything — sparse worlds (the 4k dam-break) stop paying for the
  full grid.
* **Sentinel positions instead of a valid mask.** Empty slots hold
  ``pos = SENTINEL`` (1e9): candidate exclusion falls out of the existing
  ``r^2 <= h^2`` range test, dropping the valid field and its per-candidate
  load/roll/compare entirely.
* **Fusion.** Prediction (compute.wgsl:8-30) is recomputed in-register from
  (pos, vel) inside each kernel (cheaper than materializing it); the
  density kernel emits pressure ``k*(rho - rho0)`` (funcs.wgsl:152-154) and
  ``1/rho`` directly; the forces kernel performs the full integration
  (compute.wgsl:95-155: gravity, mouse impulse, NaN reset, speed clamp,
  Euler update, obstacle force field, boundary bounce/wrap) and returns the
  new state — no elementwise XLA passes remain between kernels.
* **Center-only tie break.** Coincident pairs (dst == 0) imply bitwise
  identical predicted positions, hence the *same cell*: the random
  direction draw (compute.wgsl:211-215) only needs to exist in the center
  block of the 3x3 stencil, cutting ~12 ops from 8/9 of all candidates.
  (The one theoretical exception — r^2 underflow of a straddling
  sub-1e-19 pair — contributes zero force here instead of a random push.)

Iteration order is (slot, row, dx), vs (row, dx, slot) in round 1 and in
the [N] engines — within-tolerance f32 reduction-order differences vs the
dense engine, checked by tests/test_resident.py.

Per-tick tunables arrive as SMEM scalars (live-tunable, zero recompiles);
shape-determining statics are baked in at trace time. On non-TPU backends
the kernels run in interpreter mode (tests).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sph import (
    _interpret,
    _roll_x,
    _row_specs,
    _out_spec,
    _scalar_spec,
    _bitcast_u32,
    _u01,
    _xorshift32,
)

PI = math.pi
# Empty grid slots hold this position; anything beyond SENTINEL_HALF is
# "not a particle". Real positions are bounded by the world half-extent.
SENTINEL = 1.0e9
SENTINEL_HALF = 5.0e8

MAX_SPEED = 500.0  # compute.wgsl:118-122


def _sub_blocks(k):
    """Static (lo, hi) 8-slot sub-block slices of the slot axis.

    The physics kernels guard every slot-dim operation per sub-block
    against the row occupancy scalars, so their cost tracks occupancy at
    8-slot (one sublane-tile) granularity for ANY cell_capacity — the
    round-3 folding lever (ROADMAP).
    """
    return [(lo, min(lo + 8, k)) for lo in range(0, k, 8)]


def _sub_h(k):
    """Slot sub-block height: one sublane tile (8), or K itself below
    that. K > 8 must be a multiple of 8 (ops.resident pads capacity) so
    every dynamic ``pl.ds`` sub-block slice is in bounds."""
    if k > 8 and k % 8 != 0:
        raise ValueError(
            f"cell_capacity {k} > 8 must be a multiple of 8 for the "
            "fused resident kernels (ops.resident pads automatically)")
    return min(8, k)


def _sub_off(b, sub):
    """Sub-block slot offset: static Python int in the K == sub
    specialization (see _sub_loop), tile-aligned traced value otherwise
    (``pl.multiple_of`` lets Mosaic assume sublane alignment)."""
    if isinstance(b, int):
        return b * sub
    return pl.multiple_of(b * sub, sub)


def _sub_loop(n, body, static_once):
    """Run ``body(b, 0)`` for b in [0, n) — as a dynamic ``fori_loop``,
    or ONCE with a static b=0 when ``static_once``.

    The K == sub case (cell_capacity <= 8: the dense-fluid configs) has
    exactly one sub-block, so every ``pl.ds(off, sub)`` slice is the full
    slot axis at a STATIC offset; emitting the body once lets Mosaic use
    plain vector loads/stores instead of dynamic-sublane addressing
    (measured: the dynamic forms regressed the forces kernel ~40% at 1M)."""
    if static_once:
        body(0, 0)
    else:
        lax.fori_loop(0, n, body, 0)


def occ3_of(occ_row):
    """occ3[y] = max(occ_row[y-1], occ_row[y], occ_row[y+1]) with
    out-of-range rows empty."""
    occ = occ_row.reshape(-1)
    lo = jnp.concatenate([occ[:1] * 0, occ[:-1]])
    hi = jnp.concatenate([occ[1:], occ[:1] * 0])
    return jnp.maximum(jnp.maximum(lo, occ), hi)


def _roll_k_down(a, s, k):
    """a[j] -> a[j - s] along the slot axis (0), zero-filled at the top."""
    if _interpret():
        r = jnp.roll(a, s, axis=0)
    else:
        r = pltpu.roll(a, s, axis=0)
    kio = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    return jnp.where(kio >= s, r, jnp.zeros_like(a))


def _pred_rows(px, py, vx, vy, dt, half_x, half_y):
    """Clamped predicted positions (compute.wgsl:8-30), sentinel-preserving."""
    live = px < SENTINEL_HALF
    prx = jnp.clip(px + vx * dt, -half_x, half_x)
    pry = jnp.clip(py + vy * dt, -half_y, half_y)
    prx = jnp.where(live, prx, SENTINEL)
    pry = jnp.where(live, pry, SENTINEL)
    return prx, pry


# ----------------------------------------------------------------- rebin

def _rebin_kernel(consts, rowsel_ref, sc_ref, off_ref, occ_ref, *refs):
    """One program per RBLK target rows: pack each row's arrivals from its
    3x3 source neighborhood in deterministic (source row, dx, slot) order.

    Per-program overhead (prologue + uncovered DMA latency) measured a
    flat ~2 us regardless of row width — processing RBLK center rows per
    program amortizes it (the dominant cost at small N, and ~25% at 1M).

    ``off_ref``: per-row cell shift — sharded slabs subtract their global
    row offset; batched world stacks subtract -(world * Gy).
    """
    (h_inv, bx2, by2, half_x, half_y, cx_max, cy_max, k, gx, rblk,
     rows_tot, k_out, act) = consts
    # k: source slot count actually scanned (capacity-sliced inputs hold
    # only the occupied slot tiles); k_out: output SHAPE capacity; act:
    # slots actually packed (<= k_out) — the select loop runs on [act]
    # tiles, arrivals beyond act are counted in oover (the caller redoes
    # the step at full capacity when that happens, see ops.resident)
    opx, opy, ovx, ovy, oocc, ofar, oover = refs[-7:]
    rowrefs = [refs[j * 4:(j + 1) * 4] for j in range(rblk + 2)]
    dt = sc_ref[0]
    yb = pl.program_id(0)

    x_iota = jax.lax.broadcasted_iota(jnp.int32, (1, gx), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (act, gx), 0)
    kin_iota = jax.lax.broadcasted_iota(jnp.int32, (k, gx), 0)
    # log-depth prefix masks hoisted out of the block cumsums (a single
    # serial count chain across all blocks was measured latency-bound;
    # per-block log cumsums run concurrently)
    shift_keep = {}
    s = 1
    while s < k:
        shift_keep[s] = kin_iota >= s
        s *= 2

    def excl_cumsum_k(mi):
        c = mi
        s = 1
        while s < k:
            if _interpret():
                sh = jnp.roll(c, s, axis=0)
            else:
                sh = pltpu.roll(c, s, axis=0)
            c = c + jnp.where(shift_keep[s], sh, 0)
            s *= 2
        return c - mi

    for i in range(rblk):
        y = yb * rblk + i
        off = off_ref[y]
        occ3s = jnp.maximum(
            jnp.maximum(occ_ref[jnp.maximum(y - 1, 0)], occ_ref[y]),
            occ_ref[jnp.minimum(y + 1, rows_tot - 1)])

        # defaults: empty row
        opx[i] = jnp.full((k_out, gx), SENTINEL, jnp.float32)
        opy[i] = jnp.full((k_out, gx), SENTINEL, jnp.float32)
        ovx[i] = jnp.zeros((k_out, gx), jnp.float32)
        ovy[i] = jnp.zeros((k_out, gx), jnp.float32)
        # scalar outputs are whole-array SMEM refs; sequential programs
        # each write their own rows
        oocc[y] = jnp.int32(0)
        ofar[y] = jnp.int32(0)
        oover[y] = jnp.int32(0)

        @pl.when(occ3s > 0)
        def _(i=i, y=y, off=off):
            # Per-block destination slots: each of the 9 (row, dx) blocks
            # computes its arrivals' ranks INDEPENDENTLY (9 parallel
            # chains), serialized only through the cheap [1, Gx]
            # block-prefix adds. The arrival mask is folded into dest
            # (non-arrivals get slot K, which the onehot compare never
            # matches) — both measured cheaper than one count chain.
            prior = jnp.zeros((1, gx), jnp.int32)
            out = [
                jnp.full((act, gx), SENTINEL, jnp.float32),
                jnp.full((act, gx), SENTINEL, jnp.float32),
                jnp.zeros((act, gx), jnp.float32),
                jnp.zeros((act, gx), jnp.float32),
            ]
            n_far = jnp.int32(0)

            for r in range(3):
                src_y = y + (r - 1)
                px_r, py_r, vx_r, vy_r = (
                    ref[0] for ref in rowrefs[i + r])
                live = px_r < SENTINEL_HALF
                prx = jnp.clip(px_r + vx_r * dt, -half_x, half_x)
                pry = jnp.clip(py_r + vy_r * dt, -half_y, half_y)
                # interior clamp mirrors ops.grid.cell_xy (sentinel ring
                # must stay empty even when size/h divides exactly in f32)
                ncx = jnp.clip(
                    jnp.floor((prx + bx2) * h_inv).astype(jnp.int32) + 1,
                    1, cx_max)
                ncy = jnp.clip(
                    jnp.floor((pry + by2) * h_inv).astype(jnp.int32) + 1,
                    1, cy_max) - off  # local frame
                # edge blocks clamp in the index map, duplicating an
                # interior row; suppress the duplicates
                row_live = jnp.logical_and(src_y >= 0, src_y < rows_tot)
                if r != 1:
                    row_live = jnp.logical_and(row_live, src_y != y)

                if r == 1:
                    # far movers OF THIS SOURCE ROW: target beyond the
                    # 3x3 neighborhood; re-inserted by the XLA fallback
                    scx = jax.lax.broadcasted_iota(jnp.int32, (k, gx), 1)
                    far = live & (
                        (jnp.abs(ncy - y) > 1) | (jnp.abs(ncx - scx) > 1))
                    n_far = jnp.sum(far.astype(jnp.int32))

                # row+liveness mask once per source row; the dx part is a
                # source-frame compare against a shifted iota, and only
                # the finished mask is rolled into the target frame
                base = (ncy == y) & live & row_live
                for dx in (-1, 0, 1):
                    # roll as i32: Mosaic's dynamic_rotate has no i1 form
                    mi = _roll_x(
                        (base & (ncx == (x_iota - dx))).astype(jnp.int32),
                        dx)
                    m_t = mi > 0  # [K, Gx]
                    pxs = _roll_x(px_r, dx)
                    pys = _roll_x(py_r, dx)
                    vxs = _roll_x(vx_r, dx)
                    vys = _roll_x(vy_r, dx)
                    dest = jnp.where(m_t, excl_cumsum_k(mi) + prior,
                                     act)
                    prior = prior + jnp.sum(mi, axis=0, keepdims=True)
                    for kk in range(k):
                        onehot = k_iota == dest[kk:kk + 1, :]
                        cand = (pxs[kk:kk + 1, :], pys[kk:kk + 1, :],
                                vxs[kk:kk + 1, :], vys[kk:kk + 1, :])
                        for f in range(4):
                            out[f] = jnp.where(onehot, cand[f], out[f])

            count = prior
            # tail slots [act:k_out] keep the sentinel default fill
            opx[i, :act] = out[0]
            opy[i, :act] = out[1]
            ovx[i, :act] = out[2]
            ovy[i, :act] = out[3]
            oocc[y] = jnp.max(jnp.minimum(count, act))
            ofar[y] = n_far
            oover[y] = jnp.sum(jnp.maximum(count - act, 0))


def _small_out_spec():
    # whole-array SMEM ref shared by all programs (grid iterations are
    # sequential on a TPU core); each program writes its own element
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _mrow_specs(rblk, rows_tot, k, gx, n_fields, collapse, halo=1):
    """Per field, rblk+2*halo single-row blocks covering world rows
    yb*rblk - halo .. yb*rblk + rblk + halo - 1 (clamped; edge duplicates
    suppressed by the kernels' row_live masks or land on the empty
    sentinel ring).

    Empty-program collapse: the leading scalar-prefetch operand
    ``rowsel`` (i32[num_programs, rblk+2], see ``_row_sel``) steers every
    input block of a workless program onto the fixed top row instead —
    runs of empty programs then present the SAME block index back-to-back
    and the Pallas pipeline skips their input DMA entirely (the flat
    ~2 us per-program overhead measured in ROADMAP is mostly uncovered
    DMA latency; sparse scenes stop paying it for the empty grid). The
    kernel bodies never read inputs when the row neighborhood is empty
    (their per-row ``pl.when`` guards), so the trash fetch is sound;
    outputs and defaults are still written normally. The whole selection
    is precomputed OUTSIDE the kernel so each index map is ONE SMEM
    table load — an in-map load+clip+where chain measured ~1.2 us of
    scalar work per program (a net loss on dense scenes).

    ``collapse=False`` keeps the plain static index arithmetic: the SMEM
    table loads cost ~0.22 us per program-kernel (measured +0.085 ms/step
    at 1M across the three kernels) while an empty program saves ~2 us —
    dense scenes whose grid is mostly occupied lose. ``_collapse_default``
    gates it statically per scene."""
    specs = []
    for j in range(rblk + 2 * halo):
        def imap(y, rowsel, j=j):
            if not collapse:
                return (jnp.clip(y * rblk + j - halo, 0, rows_tot - 1),
                        0, 0)
            return (rowsel[y, j], 0, 0)
        for _ in range(n_fields):
            specs.append(pl.BlockSpec((1, k, gx), imap,
                                      memory_space=pltpu.VMEM))
    return specs


def _collapse_default(settings):
    """Static per-scene gate for empty-program collapse (see _mrow_specs).

    The SMEM-table tax (~0.22 us/program-kernel, +0.085 ms measured at
    1M across the three kernels) is paid by EVERY program; the ~2 us
    DMA-skip saving only by fully-empty ones — and the saving shrinks
    with grid width (smaller row DMAs). Measured on v5e (step ms,
    off -> on): 4k dam-break (N/interior = 0.64) 0.207 -> 0.153 WIN;
    64k (0.93) 0.721 -> 0.785 LOSS despite ~half its row bands being
    empty; 256k/1M (>= 3.7) lose by the tax alone. The trace-time proxy
    is therefore conservative: enable only for genuinely tiny/sparse
    scenes, N < 0.75 * interior cells (between the two measured points).
    Env overrides for A/B: TPUFLUID_COLLAPSE=1 forces on,
    TPUFLUID_NO_COLLAPSE=1 forces off."""
    if os.environ.get("TPUFLUID_NO_COLLAPSE", ""):
        return False
    if os.environ.get("TPUFLUID_COLLAPSE", ""):
        return True
    interior = (settings.grid_w - 2) * (settings.grid_h - 2)
    return settings.particle_count < 0.75 * interior


def _row_sel(occ_like, rblk, rows_tot, halo=1):
    """i32[Gy/rblk, rblk+2*halo] input-row selection table (see
    _mrow_specs): row ``rowsel[p, j]`` is what program p's j-th input
    block fetches — the clamped neighborhood row when any row of the
    program's block may do work, the fixed top row otherwise. Callers
    pass occ3 (rebin: arrivals possible) or occ_row (physics: targets
    present)."""
    occ = jnp.asarray(occ_like, jnp.int32).reshape(-1, rblk)
    live = jnp.max(occ, axis=1) > 0  # [P]
    p = jnp.arange(occ.shape[0], dtype=jnp.int32)
    j = jnp.arange(rblk + 2 * halo, dtype=jnp.int32)
    rows = jnp.clip(p[:, None] * rblk + j[None, :] - halo, 0, rows_tot - 1)
    return jnp.where(live[:, None], rows, rows_tot - 1)


def _mout_spec(rblk, k, gx):
    return pl.BlockSpec((rblk, k, gx), lambda y, rowsel: (y, 0, 0),
                        memory_space=pltpu.VMEM)


def rebin(pos_x, pos_y, vel_x, vel_y, occ_row, dt, settings,
          row_offset=0, row_shift=None, rows_per_program=1,
          out_capacity=None, active_capacity=None):
    """Re-pack grid slots by next-step predicted cell (sentinel encoding).

    All grids [Gy, K, Gxp] f32 with empty slots at position SENTINEL;
    ``occ_row`` i32[Gy] is the packed per-row max occupancy of the INPUT
    grid (bounds the whole-row skip). Returns
    (pos_x', pos_y', vel_x', vel_y', occ_row', far_n[Gy], over_n[Gy]):
    far movers are EXCLUDED from the output and counted per source row in
    ``far_n``; arrivals beyond capacity are dropped and counted in
    ``over_n`` (never silent — see ops.resident for the fallback/ledger).

    ``row_offset``: global row of local row 0 (sharded slabs,
    tpufluid.parallel). ``row_shift``: i32[Gy] per-row override — row y's
    world-frame cell row is compared as ``cell_row - row_shift[y] == y``
    (batched world stacks, ops.resident.make_batched_grid_step).
    ``active_capacity``: pack at most this many slots (output shape stays
    k_out; the tail holds sentinels) — the select loop then runs on
    active/8 sublane tiles; arrivals beyond it count in ``over_n`` and the
    caller redoes the step at full capacity (ops.resident).
    """
    gy, k, gx = pos_x.shape
    rblk = rows_per_program
    k_out = out_capacity if out_capacity is not None else k
    act = min(active_capacity, k_out) if active_capacity is not None else k_out
    assert gy % rblk == 0, (gy, rblk)
    h = float(settings.smoothing_radius)
    consts = (
        1.0 / h,
        float(settings.size[0]) * 0.5,
        float(settings.size[1]) * 0.5,
        float(settings.size[0]) * 0.5,
        float(settings.size[1]) * 0.5,
        settings.grid_w - 2,
        settings.grid_h - 2,
        k, gx, rblk, gy, k_out, act,
    )
    kernel = functools.partial(_rebin_kernel, consts)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)
    if row_shift is None:
        off_arr = jnp.full((gy,), row_offset, jnp.int32)
    else:
        off_arr = jnp.asarray(row_shift, jnp.int32).reshape(-1)
    fields = (pos_x, pos_y, vel_x, vel_y)
    f32 = jnp.float32
    occ_arr = jnp.asarray(occ_row, jnp.int32).reshape(-1)
    collapse = _collapse_default(settings)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gy // rblk,),
            in_specs=[_scalar_spec()] * 3
            + _mrow_specs(rblk, gy, k, gx, 4, collapse),
            out_specs=(
                _mout_spec(rblk, k_out, gx), _mout_spec(rblk, k_out, gx),
                _mout_spec(rblk, k_out, gx), _mout_spec(rblk, k_out, gx),
                _small_out_spec(), _small_out_spec(), _small_out_spec(),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((gy, k_out, gx), f32),
            jax.ShapeDtypeStruct((gy, k_out, gx), f32),
            jax.ShapeDtypeStruct((gy, k_out, gx), f32),
            jax.ShapeDtypeStruct((gy, k_out, gx), f32),
            jax.ShapeDtypeStruct((gy,), jnp.int32),
            jax.ShapeDtypeStruct((gy,), jnp.int32),
            jax.ShapeDtypeStruct((gy,), jnp.int32),
        ),
        interpret=_interpret(),
        name="sph_rebin_fused",
    )(_row_sel(occ3_of(occ_arr), rblk, gy), dt_arr, off_arr, occ_arr,
      *(list(fields) * (rblk + 2)))
    return outs


# --------------------------------------------------------------- density

def _density_kernel(consts, rowsel_ref, sc_ref, wid_ref, occc_ref, occ3_ref,
                    *refs):
    """pres = k*(rho - rho0) and 1/rho per slot (funcs.wgsl:157-203 +
    152-154); RBLK center rows per program (amortizes the flat
    per-program overhead).

    Sub-row slot folding: candidate scan AND target accumulation run per
    8-slot sub-block, each guarded by the row occupancy scalars (occ3
    bounds candidates, occ_c bounds targets), so cost tracks per-row
    occupancy at one-sublane-tile granularity for any cell_capacity."""
    (h2, norm, k, gx, rblk, rows_tot) = consts
    # sc: [W, 6] = per-world [mass, dt, k_pressure, rest_density, half_x,
    # half_y]; wid_ref: i32[Gy] world of each row (all 0 unbatched)
    pres_ref, invr_ref = refs[-5:-3]
    tpx_ref, tpy_ref, acc_ref = refs[-3:]  # scratch [K, Gx] each
    rowrefs = [refs[j * 4:(j + 1) * 4] for j in range(rblk + 2)]
    yb = pl.program_id(0)
    sub = _sub_h(k)
    for i in range(rblk):
        y = yb * rblk + i
        occ_c = occc_ref[y]
        occ3 = occ3_ref[y]
        w = wid_ref[y]
        mass = sc_ref[w, 0]
        dt = sc_ref[w, 1]
        kp_c = sc_ref[w, 2]
        rho0 = sc_ref[w, 3]
        half_x = sc_ref[w, 4]
        half_y = sc_ref[w, 5]

        # defaults: floor density everywhere (empty rows are only read as
        # excluded-by-range candidates; finite values stay NaN-free)
        pres_ref[i] = (jnp.full((k, gx), 1.0, jnp.float32)
                       * (kp_c * (0.1 - rho0)))
        invr_ref[i] = jnp.full((k, gx), 10.0, jnp.float32)

        @pl.when(occ_c > 0)
        def _(i=i, occ_c=occ_c, occ3=occ3, mass=mass, dt=dt, kp_c=kp_c,
              rho0=rho0, half_x=half_x, half_y=half_y):
            rows = rowrefs[i:i + 3]
            # DYNAMIC sub-block loops (lax.fori_loop + pl.ds): candidate
            # scan runs ceil(occ3/8) sub-blocks, target work ceil(occ_c/8)
            # — cost tracks per-row occupancy at one-sublane-tile
            # granularity for ANY cell_capacity with FLAT code size
            # (static unrolls over K/8 sub-block pairs measured a flat
            # ~0.4 ms/kernel floor at K=32 regardless of occupancy —
            # instruction streaming, not compute). Within a sub-block the
            # 8 candidates run unguarded in registers (sentinels
            # self-exclude via the range test).
            static1 = k == sub  # one sub-block: emit bodies statically
            n3 = (occ3 + (sub - 1)) // sub
            nt = (occ_c + (sub - 1)) // sub

            # pre-pass: center-row predictions (the targets AND the r=1
            # candidates) + zeroed accumulators, per live sub-block
            def pre_body(b, carry):
                o = _sub_off(b, sub)
                prx, pry = _pred_rows(
                    rows[1][0][0, pl.ds(o, sub)],
                    rows[1][1][0, pl.ds(o, sub)],
                    rows[1][2][0, pl.ds(o, sub)],
                    rows[1][3][0, pl.ds(o, sub)],
                    dt, half_x, half_y)
                tpx_ref[pl.ds(o, sub)] = prx
                tpy_ref[pl.ds(o, sub)] = pry

                if static1:  # b == 0 < nt (occ_c > 0 here)
                    acc_ref[pl.ds(o, sub)] = jnp.zeros((sub, gx),
                                                       jnp.float32)
                else:
                    @pl.when(b < nt)
                    def _():
                        acc_ref[pl.ds(o, sub)] = jnp.zeros((sub, gx),
                                                           jnp.float32)
                return carry

            _sub_loop(n3, pre_body, static1)

            def cand_body(b, carry):
                o = _sub_off(b, sub)
                preds = []
                for r in range(3):
                    if r == 1:
                        preds.append((tpx_ref[pl.ds(o, sub)],
                                      tpy_ref[pl.ds(o, sub)]))
                    else:
                        preds.append(_pred_rows(
                            rows[r][0][0, pl.ds(o, sub)],
                            rows[r][1][0, pl.ds(o, sub)],
                            rows[r][2][0, pl.ds(o, sub)],
                            rows[r][3][0, pl.ds(o, sub)],
                            dt, half_x, half_y))
                # one [8, Gx] roll per (row, dx) block and field
                rolled = {}
                for r in range(3):
                    for dx in (-1, 0, 1):
                        rolled[(r, dx)] = (_roll_x(preds[r][0], dx),
                                           _roll_x(preds[r][1], dx))

                def tgt_body(t, c2):
                    to = _sub_off(t, sub)
                    px0 = tpx_ref[pl.ds(to, sub)]
                    py0 = tpy_ref[pl.ds(to, sub)]
                    # per-candidate occupancy guard + one acc RMW per
                    # candidate: at mean occupancy ~4 of 8 padded slots
                    # the guard skips ~half the pair work (cf.
                    # _forces_cand_block — same trade, ~10 RMW issues vs
                    # ~315 saved per skipped candidate)
                    for kp in range(sub):
                        kpg = o + kp

                        def one_cand(kp=kp):
                            acc = jnp.zeros((sub, gx), jnp.float32)
                            for r in range(3):
                                for dx in (-1, 0, 1):
                                    rl = rolled[(r, dx)]
                                    nx = rl[0][kp:kp + 1, :]
                                    ny = rl[1][kp:kp + 1, :]
                                    ddx = nx - px0
                                    ddy = ny - py0
                                    r2 = ddx * ddx + ddy * ddy
                                    # max(diff,0)^3 ==
                                    # where(r2>h2, 0, diff^3)
                                    # exactly, one op cheaper
                                    diff = jnp.maximum(h2 - r2, 0.0)
                                    acc = acc + diff * diff * diff
                            acc_ref[pl.ds(to, sub)] = (
                                acc_ref[pl.ds(to, sub)] + acc)

                        pl.when(kpg < occ3)(one_cand)
                    return c2

                _sub_loop(nt, tgt_body, static1)
                return carry

            _sub_loop(n3, cand_body, static1)

            # rho = m * norm * sum(w) — the reference sums m*W per pair
            # (funcs.wgsl:195); with default mass 1.0 bitwise equal,
            # otherwise within 1 ulp/pair (resident parity is tolerance).
            def post_body(t, carry):
                to = _sub_off(t, sub)
                rho = mass * (jnp.float32(norm) * acc_ref[pl.ds(to, sub)])
                rho = jnp.maximum(
                    jnp.maximum(rho, 1.19209290e-07), 0.1)
                pres_ref[i, pl.ds(to, sub)] = kp_c * (rho - rho0)
                invr_ref[i, pl.ds(to, sub)] = 1.0 / rho
                return carry

            _sub_loop(nt, post_body, static1)


def density(pos_x, pos_y, vel_x, vel_y, occ_row, mass, dt, pressure_constant,
            rest_density, settings, wid=None, rows_per_program=1):
    """(pres, inv_rho)[Gy, K, Gx] from sentinel-encoded (pos, vel) grids.

    ``wid``: i32[Gy] world id per row for batched world stacks — scalar
    args then carry a leading [W] dim (broadcast from scalars otherwise).
    """
    gy, k, gx = pos_x.shape
    rblk = rows_per_program
    assert gy % rblk == 0, (gy, rblk)
    h_f = float(settings.smoothing_radius)
    consts = (h_f * h_f, 4.0 / (PI * h_f**8), k, gx, rblk, gy)
    kernel = functools.partial(_density_kernel, consts)
    cols = [
        jnp.asarray(mass, jnp.float32),
        jnp.asarray(dt, jnp.float32),
        jnp.asarray(pressure_constant, jnp.float32),
        jnp.asarray(rest_density, jnp.float32),
        jnp.float32(settings.size[0] * 0.5),
        jnp.float32(settings.size[1] * 0.5),
    ]
    n_worlds = max((c.ndim and c.shape[0]) or 1 for c in cols) if wid is not None else 1
    sc = jnp.stack([jnp.broadcast_to(c, (n_worlds,)) for c in cols], axis=1)
    if wid is None:
        wid = jnp.zeros((gy,), jnp.int32)
    occ_row = jnp.asarray(occ_row, jnp.int32).reshape(-1)
    occ3 = occ3_of(occ_row)
    fields = (pos_x, pos_y, vel_x, vel_y)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gy // rblk,),
            in_specs=[_scalar_spec()] * 4
            + _mrow_specs(rblk, gy, k, gx, 4, _collapse_default(settings)),
            out_specs=(_mout_spec(rblk, k, gx), _mout_spec(rblk, k, gx)),
            scratch_shapes=[pltpu.VMEM((k, gx), f32)] * 3,  # tpx, tpy, acc
        ),
        out_shape=(
            jax.ShapeDtypeStruct((gy, k, gx), f32),
            jax.ShapeDtypeStruct((gy, k, gx), f32),
        ),
        interpret=_interpret(),
        name="sph_density_fused",
    )(_row_sel(occ_row, rblk, gy), sc, jnp.asarray(wid, jnp.int32),
      occ_row, occ3, *(list(fields) * (rblk + 2)))


# ----------------------------------------------- forces + integration

def _forces_kernel(consts, flags, rowsel_ref, sc_ref, frame_ref, wid_ref,
                   occc_ref, occ3_ref, *refs):
    """Pressure + viscosity forces (compute.wgsl:160-299) fused with the
    full integration (compute.wgsl:95-155). Outputs the NEW (pos, vel)
    grids (sentinel-preserving). Sub-row slot folding as in
    _density_kernel: candidate scan bounded by occ3, target work bounded
    by occ_c, both at 8-slot sub-block granularity.

    Variant flags (static): surface tension (compute.wgsl:303-498, self
    included) and adaptive subsampling (shaders/compute.wgsl:170-174,195,
    pressure candidates strided 1/5/13 as self density crosses 150/200 —
    the self density is recovered as 1/invr, so threshold crossings agree
    with the [N] engines to f32 reciprocal rounding)."""
    (h, h2, sqr_radius, spiky_norm, visc_norm, k, gx, rblk,
     rows_tot) = consts
    (wrap_x, has_ff, surface_tension, adaptive) = flags
    # refs layout (front-based): 6*(rblk+2) field refs, [ff refs], 4
    # output refs, 9 scratch refs, [5 surface-tension scratch refs]
    rowrefs = [refs[j * 6:(j + 1) * 6] for j in range(rblk + 2)]
    idx = 6 * (rblk + 2)
    if has_ff:
        ffx_ref, ffy_ref = refs[idx:idx + 2]
        idx += 2
    npx_ref, npy_ref, nvx_ref, nvy_ref = refs[idx:idx + 4]
    sfx_ref, sfy_ref, sgx_ref, sgy_ref, scc_ref = refs[idx + 4:idx + 9]
    tpx_ref, tpy_ref, d0x_ref, d0y_ref = refs[idx + 9:idx + 13]
    if surface_tension:
        (cgx_ref, cgy_ref, clap_ref,
         stx_ref, sty_ref) = refs[idx + 13:idx + 18]
    yb = pl.program_id(0)
    frame = frame_ref[0]

    h3 = h * h2
    _c_neg_inv_2h3 = -1.0 / (2.0 * h3)
    _c_inv_h2 = 1.0 / h2
    _c_half_h = h / 2.0

    for i in range(rblk):
        _forces_one_row(
            i, yb * rblk + i, rowrefs[i:i + 3], consts, flags, sc_ref,
            frame, wid_ref, occc_ref, occ3_ref,
            ffx_ref if has_ff else None, ffy_ref if has_ff else None,
            npx_ref, npy_ref, nvx_ref, nvy_ref,
            sfx_ref, sfy_ref, sgx_ref, sgy_ref, scc_ref,
            tpx_ref, tpy_ref, d0x_ref, d0y_ref,
            cgx_ref if surface_tension else None,
            cgy_ref if surface_tension else None,
            clap_ref if surface_tension else None,
            stx_ref if surface_tension else None,
            sty_ref if surface_tension else None,
            h3, _c_neg_inv_2h3, _c_inv_h2, _c_half_h)


def _forces_one_row(i, y, rows, consts, flags, sc_ref, frame, wid_ref,
                    occc_ref, occ3_ref, ffx_ref, ffy_ref,
                    npx_ref, npy_ref, nvx_ref, nvy_ref,
                    sfx_ref, sfy_ref, sgx_ref, sgy_ref, scc_ref,
                    tpx_ref, tpy_ref, d0x_ref, d0y_ref,
                    cgx_ref, cgy_ref, clap_ref, stx_ref, sty_ref,
                    h3, _c_neg_inv_2h3, _c_inv_h2, _c_half_h):
    """Forces + integration for ONE center row (see _forces_kernel)."""
    (h, h2, sqr_radius, spiky_norm, visc_norm, k, gx, rblk,
     rows_tot) = consts
    (wrap_x, has_ff, surface_tension, adaptive) = flags
    occ_c = occc_ref[y]
    occ3 = occ3_ref[y]
    w = wid_ref[y]  # world of this row (0 unbatched)
    # sc: [W, 17] per-world [dt, mu, grav_x, grav_y, damping, mouse_x,
    # mouse_y, mouse_radius, mouse_power, mouse_state, half_x, half_y,
    # ff_sx, ff_sy, mass, st_threshold, st_coefficient]
    dt = sc_ref[w, 0]
    mu = sc_ref[w, 1]
    grav_x = sc_ref[w, 2]
    grav_y = sc_ref[w, 3]
    damping = sc_ref[w, 4]
    mouse_x = sc_ref[w, 5]
    mouse_y = sc_ref[w, 6]
    mouse_radius = sc_ref[w, 7]
    mouse_power = sc_ref[w, 8]
    mouse_state = sc_ref[w, 9]
    half_x = sc_ref[w, 10]
    half_y = sc_ref[w, 11]
    ff_sx = sc_ref[w, 12]  # pixel -> world scale, (bounds*2)/texture_size
    ff_sy = sc_ref[w, 13]

    npx_ref[i] = jnp.full((k, gx), SENTINEL, jnp.float32)
    npy_ref[i] = jnp.full((k, gx), SENTINEL, jnp.float32)
    nvx_ref[i] = jnp.zeros((k, gx), jnp.float32)
    nvy_ref[i] = jnp.zeros((k, gx), jnp.float32)
    sub = _sub_h(k)

    @pl.when(occ_c > 0)
    def _():
        if surface_tension:
            st_grad_norm = -24.0 / (PI * h**8)
            st_lap_norm = 8.0 / (PI * h**8)

        # DYNAMIC sub-block loops, as in _density_kernel: candidate scan
        # ceil(occ3/8) sub-blocks, target work ceil(occ_c/8), flat code
        # size in K (static unrolls measured instruction-streaming-bound
        # at K=32).
        static1 = k == sub  # one sub-block: emit bodies statically
        n3 = (occ3 + (sub - 1)) // sub
        nt = (occ_c + (sub - 1)) // sub

        # ---- pre-pass per sub-block: center predictions (candidates r=1
        # and the targets), and per-TARGET scratch — tie-break base
        # direction, zeroed accumulators. The tie table derives its 4
        # (pair-order salt, draw ordinal) variants from ONE xorshift chain
        # by rotation/reflection — a documented tie-contract deviation
        # (cf. ops.pallas.sph / compute.wgsl:161,211-215: the table only
        # breaks exact coincidences; it needs determinism and distinct
        # directions, not a specific stream).
        def pre_body(b, carry):
            o = _sub_off(b, sub)
            prx, pry = _pred_rows(
                rows[1][0][0, pl.ds(o, sub)],
                rows[1][1][0, pl.ds(o, sub)],
                rows[1][2][0, pl.ds(o, sub)],
                rows[1][3][0, pl.ds(o, sub)],
                dt, half_x, half_y)
            tpx_ref[pl.ds(o, sub)] = prx
            tpy_ref[pl.ds(o, sub)] = pry

            def tgt_init(prx=prx, pry=pry):
                bx = _bitcast_u32(prx)
                by = _bitcast_u32(pry)
                seed_self = ((bx * jnp.uint32(0x9E3779B1))
                             ^ (by * jnp.uint32(0x85EBCA6B)))
                seed_self = seed_self + frame * jnp.uint32(69)
                s1 = _xorshift32(seed_self)
                s2 = _xorshift32(s1)
                rx = _u01(s1)
                ry = _u01(s2)
                inv = jax.lax.rsqrt(
                    jnp.maximum(rx * rx + ry * ry, 1e-30))
                d0x_ref[pl.ds(o, sub)] = rx * inv
                d0y_ref[pl.ds(o, sub)] = ry * inv
                z = jnp.zeros((sub, gx), jnp.float32)
                sfx_ref[pl.ds(o, sub)] = z
                sfy_ref[pl.ds(o, sub)] = z
                sgx_ref[pl.ds(o, sub)] = z
                sgy_ref[pl.ds(o, sub)] = z
                scc_ref[pl.ds(o, sub)] = jnp.zeros((sub, gx), jnp.uint32)
                if surface_tension:
                    # seed per compute.wgsl:406 from the PREDICTED x
                    # (the [N] engines' contract; WGSL u32(f32)
                    # saturates negatives to 0)
                    st_i = jnp.maximum(prx, 0.0).astype(jnp.int32)
                    st_seed = (_bitcast_u32(st_i) * jnp.uint32(324)
                               + frame * jnp.uint32(5632))
                    st1 = _xorshift32(st_seed)
                    st2 = _xorshift32(st1)
                    strx = _u01(st1)
                    stry = _u01(st2)
                    strn = jnp.sqrt(strx * strx + stry * stry)
                    strn = jnp.where(strn == 0.0, 1.0, strn)
                    stx_ref[pl.ds(o, sub)] = strx / strn
                    sty_ref[pl.ds(o, sub)] = stry / strn
                    cgx_ref[pl.ds(o, sub)] = z
                    cgy_ref[pl.ds(o, sub)] = z
                    clap_ref[pl.ds(o, sub)] = z

            if static1:  # b == 0 < nt (occ_c > 0 here)
                tgt_init()
            else:
                pl.when(b < nt)(tgt_init)
            return carry

        _sub_loop(n3, pre_body, static1)

        # ---- candidate loop: per candidate sub-block, roll the six
        # neighbor fields once ([8, Gx] per (row, dx) block), then per
        # target sub-block accumulate all 8 candidates in registers
        # (one scratch RMW per pair; sentinels self-exclude)
        def cand_body(b, carry):
            o = _sub_off(b, sub)
            preds = []
            for r in range(3):
                if r == 1:
                    preds.append((tpx_ref[pl.ds(o, sub)],
                                  tpy_ref[pl.ds(o, sub)]))
                else:
                    preds.append(_pred_rows(
                        rows[r][0][0, pl.ds(o, sub)],
                        rows[r][1][0, pl.ds(o, sub)],
                        rows[r][2][0, pl.ds(o, sub)],
                        rows[r][3][0, pl.ds(o, sub)],
                        dt, half_x, half_y))
            rolled = {}
            for r in range(3):
                flds = (preds[r][0], preds[r][1],
                        rows[r][2][0, pl.ds(o, sub)],
                        rows[r][3][0, pl.ds(o, sub)],
                        rows[r][4][0, pl.ds(o, sub)],
                        rows[r][5][0, pl.ds(o, sub)])
                for dx in (-1, 0, 1):
                    rolled[(r, dx)] = tuple(
                        _roll_x(f, dx) for f in flds)

            def tgt_body(t, c2):
                to = _sub_off(t, sub)
                tsl = pl.ds(to, sub)
                center = (tpx_ref[tsl], tpy_ref[tsl],
                          rows[1][2][0, tsl], rows[1][3][0, tsl],
                          rows[1][4][0, tsl], rows[1][5][0, tsl])
                _forces_cand_block(
                    center, rolled, o, to, sub, occ3,
                    consts, flags, sc_ref, w,
                    d0x_ref, d0y_ref,
                    sfx_ref, sfy_ref, sgx_ref, sgy_ref,
                    scc_ref, cgx_ref, cgy_ref, clap_ref,
                    stx_ref, sty_ref,
                    st_grad_norm if surface_tension else 0,
                    st_lap_norm if surface_tension else 0,
                    _c_neg_inv_2h3, _c_inv_h2, _c_half_h)
                return c2

            _sub_loop(nt, tgt_body, static1)
            return carry

        _sub_loop(n3, cand_body, static1)

        # ---- integration (compute.wgsl:95-155), fused, per live
        # target sub-block ----
        def int_body(t, carry):
            to = _sub_off(t, sub)
            tsl = pl.ds(to, sub)
            center = (rows[1][0][0, tsl], rows[1][1][0, tsl],
                      rows[1][2][0, tsl], rows[1][3][0, tsl],
                      rows[1][5][0, tsl], tpx_ref[tsl], tpy_ref[tsl])
            _forces_integrate_sub(
                i, to, sub, center, consts, flags, sc_ref, w, frame,
                ffx_ref, ffy_ref, npx_ref, npy_ref, nvx_ref, nvy_ref,
                sfx_ref, sfy_ref, sgx_ref, sgy_ref,
                cgx_ref, cgy_ref, clap_ref)
            return carry

        _sub_loop(nt, int_body, static1)


def _forces_integrate_sub(i, to, sub, center, consts, flags, sc_ref, w,
                          frame, ffx_ref, ffy_ref,
                          npx_ref, npy_ref, nvx_ref, nvy_ref,
                          sfx_ref, sfy_ref, sgx_ref, sgy_ref,
                          cgx_ref, cgy_ref, clap_ref):
    """Fused integration for one target sub-block (see _forces_one_row).

    ``center`` = (pos_x0, pos_y0, vx0, vy0, invr0, px0, py0) pre-sliced
    [sub, gx] target-row arrays (raw position/velocity, 1/rho, predicted
    position)."""
    (h, h2, sqr_radius, spiky_norm, visc_norm, k, gx, rblk,
     rows_tot) = consts
    (wrap_x, has_ff, surface_tension, adaptive) = flags
    dt = sc_ref[w, 0]
    mu = sc_ref[w, 1]
    grav_x = sc_ref[w, 2]
    grav_y = sc_ref[w, 3]
    damping = sc_ref[w, 4]
    mouse_x = sc_ref[w, 5]
    mouse_y = sc_ref[w, 6]
    mouse_radius = sc_ref[w, 7]
    mouse_power = sc_ref[w, 8]
    mouse_state = sc_ref[w, 9]
    half_x = sc_ref[w, 10]
    half_y = sc_ref[w, 11]
    ff_sx = sc_ref[w, 12]
    ff_sy = sc_ref[w, 13]
    tlo = pl.ds(to, sub)
    pos_x0, pos_y0, vx0, vy0, invr0, px0, py0 = center
    visc_mu = jnp.float32(visc_norm) * mu
    accel_x = sfx_ref[tlo] + sgx_ref[tlo] * visc_mu
    accel_y = sfy_ref[tlo] + sgy_ref[tlo] * visc_mu
    if surface_tension:
        # pairs.surface_tension composition
        # (compute.wgsl:303-315)
        cgx = cgx_ref[tlo]
        cgy = cgy_ref[tlo]
        clap = clap_ref[tlo]
        n_len = jnp.sqrt(cgx * cgx + cgy * cgy)
        safe_len = jnp.where(n_len == 0.0, 1.0, n_len)
        k_st = (-clap) / (n_len + 1e-6)
        apply_st = n_len > sc_ref[w, 15]
        coef = sc_ref[w, 16]
        accel_x = accel_x + jnp.where(
            apply_st, -coef * k_st * (cgx / safe_len), 0.0)
        accel_y = accel_y + jnp.where(
            apply_st, -coef * k_st * (cgy / safe_len), 0.0)
    vx = vx0 + accel_x * invr0 * dt + grav_x * dt
    vy = vy0 + accel_y * invr0 * dt + grav_y * dt

    # mouse impulse (compute.wgsl:99-108)
    diffx = mouse_x - px0
    diffy = mouse_y - py0
    dist = jnp.sqrt(diffx * diffx + diffy * diffy)
    msafe = jnp.where(dist == 0.0, 1.0, dist)
    iscale = (mouse_power * mouse_state
              * (dist / mouse_radius) / (msafe * msafe))
    # dist==0 under an active press is 0/0=NaN in the
    # reference; the NaN reset below then zeroes the
    # velocity. Reproduce explicitly.
    iscale = jnp.where(
        dist == 0.0, jnp.float32(jnp.nan), iscale)
    apply_m = (mouse_state != 0.0) & (dist <= mouse_radius)
    vx = jnp.where(apply_m, vx + diffx * iscale, vx)
    vy = jnp.where(apply_m, vy + diffy * iscale, vy)

    # NaN reset (compute.wgsl:113-116)
    nan_any = (vx != vx) | (vy != vy)
    vx = jnp.where(nan_any, 0.0, vx)
    vy = jnp.where(nan_any, 0.0, vy)

    # speed clamp (compute.wgsl:118-122)
    sp = jnp.sqrt(vx * vx + vy * vy)
    fast = sp > MAX_SPEED
    scl = MAX_SPEED / jnp.where(fast, sp, 1.0)
    vx = jnp.where(fast, vx * scl, vx)
    vy = jnp.where(fast, vy * scl, vy)

    px = pos_x0 + vx * dt
    py = pos_y0 + vy * dt

    if has_ff:
        # obstacle force field at CELL granularity (the
        # reference samples per-particle texels,
        # compute.wgsl:127-140; here one push-out vector per
        # grid cell — documented approximation, see
        # ops.resident). Field values are PIXEL-space
        # vectors; the normal is normalized in pixel space
        # like the reference, the position push is scaled to
        # world units per axis.
        ffx = ffx_ref[i]  # [1, Gx] pixel-space push-out
        ffy = ffy_ref[i]
        hit = (ffx != 0.0) | (ffy != 0.0)
        fn = jnp.sqrt(ffx * ffx + ffy * ffy)
        fsafe = jnp.where(fn == 0.0, 1.0, fn)
        nhx = ffx / fsafe
        nhy = ffy / fsafe
        px = jnp.where(hit, px + ffx * ff_sx, px)
        py = jnp.where(hit, py + ffy * ff_sy, py)
        vn = vx * nhx + vy * nhy
        vx = jnp.where(hit, vx - (1.0 - damping) * vn * nhx,
                       vx)
        vy = jnp.where(hit, vy - (1.0 - damping) * vn * nhy,
                       vy)

    # boundary clamp + bounce / x-wrap (compute.wgsl:143-153,
    # shaders/compute.wgsl:145-146)
    outx = jnp.abs(px) > half_x
    outy = jnp.abs(py) > half_y
    if wrap_x:
        px = jnp.where(outx, -half_x * jnp.sign(px), px)
    else:
        px = jnp.where(outx, half_x * jnp.sign(px), px)
        vx = jnp.where(outx, vx * -damping, vx)
    py = jnp.where(outy, half_y * jnp.sign(py), py)
    vy = jnp.where(outy, vy * -damping, vy)

    live = pos_x0 < SENTINEL_HALF
    npx_ref[i, tlo] = jnp.where(live, px, SENTINEL)
    npy_ref[i, tlo] = jnp.where(live, py, SENTINEL)
    nvx_ref[i, tlo] = jnp.where(live, vx, 0.0)
    nvy_ref[i, tlo] = jnp.where(live, vy, 0.0)


def _forces_cand_block(center, rolled, o, to, sub, occ3, consts, flags,
                       sc_ref, w, d0x_ref, d0y_ref,
                       sfx_ref, sfy_ref, sgx_ref, sgy_ref, scc_ref,
                       cgx_ref, cgy_ref, clap_ref, stx_ref, sty_ref,
                       st_grad_norm, st_lap_norm,
                       _c_neg_inv_2h3, _c_inv_h2, _c_half_h):
    """Candidate sub-block [o:o+sub]'s 9-block contribution to one target
    sub-block [to:to+sub] (tile-aligned offsets; static 0 in the K == sub
    specialization). ``center`` = (px0, py0, vx0, vy0, p_self, invr_self)
    pre-sliced [sub, gx] target-row arrays (callers differ: the split
    forces kernel slices input refs, the fused physics kernel slices its
    density scratch). Each candidate slot is GUARDED by ``kpg < occ3``
    and accumulates its 9 blocks in registers with one scratch RMW per
    candidate — at mean occupancy ~4 of 8 padded slots this skips ~half
    the pair work (unguarded register accumulation across the whole
    sub-block was measured 1.9 -> 2.5 ms on the 1M forces kernel; the RMW
    costs ~50 vector issues vs ~1300 saved per skipped candidate)."""
    (h, h2, sqr_radius, spiky_norm, visc_norm, k, gx, rblk,
     rows_tot) = consts
    (wrap_x, has_ff, surface_tension, adaptive) = flags
    tslice = pl.ds(to, sub)
    px0, py0, vx0, vy0, p_self, invr_self = center
    k_self = (jax.lax.broadcasted_iota(jnp.int32, (sub, gx), 0) + to)
    rho_self = 1.0 / invr_self if adaptive else None
    d0x_t = d0x_ref[tslice]
    d0y_t = d0y_ref[tslice]
    if surface_tension:
        st_dx = stx_ref[tslice]
        st_dy = sty_ref[tslice]
    for kp in range(sub):
        kpg = o + kp  # global candidate slot (static in the K==sub path)

        def one_cand(kp=kp, kpg=kpg):
            zero = jnp.zeros((sub, gx), jnp.float32)
            (fx, fy, gx_, gy_, scc_run, st_acc) = _forces_one_cand(
                kp, kpg, rolled, consts, flags, sc_ref, w,
                px0, py0, vx0, vy0, p_self, k_self, rho_self,
                d0x_t, d0y_t, tslice, scc_ref[tslice],
                (zero, zero, zero, st_dx, st_dy) if surface_tension
                else None,
                zero, zero, zero, zero, st_grad_norm, st_lap_norm,
                _c_neg_inv_2h3, _c_inv_h2, _c_half_h)
            sfx_ref[tslice] = sfx_ref[tslice] + fx
            sfy_ref[tslice] = sfy_ref[tslice] + fy
            sgx_ref[tslice] = sgx_ref[tslice] + gx_
            sgy_ref[tslice] = sgy_ref[tslice] + gy_
            scc_ref[tslice] = scc_run
            if surface_tension:
                cg_x, cg_y, cl_ = st_acc
                cgx_ref[tslice] = cgx_ref[tslice] + cg_x
                cgy_ref[tslice] = cgy_ref[tslice] + cg_y
                clap_ref[tslice] = clap_ref[tslice] + cl_

        pl.when(kpg < occ3)(one_cand)


def _adaptive_factor(kpg, rho_self):
    """{0, 1} f32 adaptive-subsampling stride factor
    (shaders/compute.wgsl:170-174,195): pressure candidates strided
    1/5/13 as the target's self density crosses 150/200. ``kpg`` is a
    static int in the K == sub specialization (gates fold to constants),
    else traced (scalar-core ops)."""
    if isinstance(kpg, int):
        c5 = jnp.float32(1.0 if kpg % 5 == 0 else 0.0)
        c13 = jnp.float32(1.0 if kpg % 13 == 0 else 0.0)
    else:
        c5 = ((kpg % 5) == 0).astype(jnp.float32)
        c13 = ((kpg % 13) == 0).astype(jnp.float32)
    return jnp.where(rho_self >= 200.0, c13,
                     jnp.where(rho_self >= 150.0, c5, 1.0))


def _forces_one_cand(kp, kpg, rolled, consts, flags, sc_ref, w,
                     px0, py0, vx0, vy0, p_self, k_self, rho_self,
                     d0x, d0y, tslice, scc_run, st_state,
                     fx, fy, gx_, gy_, st_grad_norm, st_lap_norm,
                     _c_neg_inv_2h3, _c_inv_h2, _c_half_h):
    """One candidate slot's 9 (row, dx) blocks against the target
    sub-block, pure register dataflow (see _forces_cand_block)."""
    (h, h2, sqr_radius, spiky_norm, visc_norm, k, gx, rblk,
     rows_tot) = consts
    (wrap_x, has_ff, surface_tension, adaptive) = flags
    if surface_tension:
        cg_x, cg_y, cl_, st_dx, st_dy = st_state
    for r in range(3):
        for dx in (-1, 0, 1):
            rl = rolled[(r, dx)]
            nx = rl[0][kp:kp + 1, :]
            ny = rl[1][kp:kp + 1, :]
            nvx = rl[2][kp:kp + 1, :]
            nvy = rl[3][kp:kp + 1, :]
            p_nb = rl[4][kp:kp + 1, :]
            inv_rho = rl[5][kp:kp + 1, :]
            is_center = (r == 1 and dx == 0)

            ddx = nx - px0
            ddy = ny - py0
            r2 = ddx * ddx + ddy * ddy
            # one rsqrt replaces sqrt + divide (multi-pass VPU
            # ops); dst = r2 * rsqrt(r2) == sqrt(r2) to 1 ulp.
            # max() (not a where) floors r2: at r2 == 0, inv
            # is ~3e17 but dst = 0 * inv = 0 and dir = 0 — the
            # coincident path overwrites dir and kv anyway.
            inv_dst = jax.lax.rsqrt(jnp.maximum(r2, 1e-35))
            dst = r2 * inv_dst

            if not is_center:
                # LEAN path (8 of 9 blocks): range gates become
                # kernel-value clamps — min(dst-h, 0) IS the spiky
                # term and is exactly 0 out of range; the viscosity
                # kernel f(x) = -x^3/2 + x^2 + 1/(2x) - 1 (x = dst/h)
                # has a double root at x = 1, f > 0 inside and f <= 0
                # outside, so max(kv, 0) IS the range gate. Sentinel
                # candidates give dst ~ 1e9 -> both clamp to 0. The
                # unit direction is never materialized: inv_dst is
                # folded into the pair weight (1-ulp reassociation vs
                # (dd*inv_dst)*wp, within the engines' f32
                # reduction-order tolerance). Coincident pairs cannot
                # occur off-center (bitwise-equal predicted positions
                # share a cell); the sub-1e-19 straddling-underflow
                # case contributes ddx*(wp*inv_dst) ~ 0 exactly as
                # the dir-based form did.
                kern_p = jnp.minimum(dst - h, 0.0) * (0.5 * spiky_norm)
                wp = kern_p * (p_self + p_nb) * inv_rho
                if adaptive:
                    wp = wp * _adaptive_factor(kpg, rho_self)
                s = wp * inv_dst
                fx = fx + ddx * s
                fy = fy + ddy * s

                if surface_tension:
                    ok_st = r2 <= sqr_radius
                    dirx = ddx * inv_dst
                    diry = ddy * inv_dst
                    rlen2 = dirx * dirx + diry * diry
                    rlen = jnp.sqrt(rlen2)
                    gdiff = h2 - rlen2
                    gsc = jnp.where(
                        (rlen >= h) | (rlen == 0.0), 0.0,
                        jnp.float32(st_grad_norm) * gdiff * gdiff)
                    m_rho = sc_ref[w, 14] * inv_rho
                    cg_x = cg_x + jnp.where(
                        ok_st, m_rho * gsc * dirx, 0.0)
                    cg_y = cg_y + jnp.where(
                        ok_st, m_rho * gsc * diry, 0.0)
                    lap = jnp.where(
                        dst > h, 0.0,
                        jnp.float32(st_lap_norm) * (h2 - r2)
                        * (3.0 * h2 - 4.0 * r2))
                    cl_ = cl_ + jnp.where(ok_st, m_rho * lap, 0.0)

                kv = jnp.maximum(
                    r2 * dst * _c_neg_inv_2h3 + r2 * _c_inv_h2
                    + inv_dst * _c_half_h - 1.0, 0.0)
                wv = kv * inv_rho
                gx_ = gx_ + (nvx - vx0) * wv
                gy_ = gy_ + (nvy - vy0) * wv
                continue

            in_range = r2 <= sqr_radius
            if is_center:
                in_range = in_range & (k_self != kpg)

            dirx = ddx * inv_dst
            diry = ddy * inv_dst

            if is_center:
                # coincident-pair random direction
                # (compute.wgsl:211-215) — same-cell only:
                # dst==0 implies bitwise-equal positions,
                # hence the same cell. scc_run carries the
                # running draw count across candidates in
                # registers (RMW'd to scratch once per
                # sub-block pair by the caller).
                coincident = in_range & (dst == 0.0)
                has_prior = scc_run >= jnp.uint32(1)
                salted = kpg < k_self
                # variants: (0,0)=(d0x,d0y) (0,1)=(-d0y,d0x)
                #           (1,0)=(-d0x,-d0y) (1,1)=(d0y,-d0x)
                tx = jnp.where(
                    salted,
                    jnp.where(has_prior, d0y, -d0x),
                    jnp.where(has_prior, -d0y, d0x))
                ty = jnp.where(
                    salted,
                    jnp.where(has_prior, -d0x, -d0y),
                    jnp.where(has_prior, d0x, d0y))
                dirx = jnp.where(coincident, tx, dirx)
                diry = jnp.where(coincident, ty, diry)
                scc_run = scc_run + coincident.astype(jnp.uint32)

            # shared pressure's 0.5 is folded into the spiky
            # constant; the dst <= h gate is folded into
            # in_range (r2 <= h^2) — they differ only in the
            # 1-ulp rounding sliver of dst = sqrt-ish(r2)
            shared_p = p_self + p_nb
            kern_p = (dst - h) * (0.5 * spiky_norm)
            in_range_p = in_range
            if adaptive:
                in_range_p = in_range & (
                    _adaptive_factor(kpg, rho_self) > 0.0)
            wp = jnp.where(
                in_range_p, kern_p * shared_p * inv_rho, 0.0)
            fx = fx + dirx * wp
            fy = fy + diry * wp

            if surface_tension:
                # self-pair INCLUDED (pairs.color_field_*)
                ok_st = r2 <= sqr_radius
                co_st = ok_st & (dst == 0.0)
                sdx = jnp.where(co_st, st_dx, dirx)
                sdy = jnp.where(co_st, st_dy, diry)
                rlen2 = sdx * sdx + sdy * sdy
                rlen = jnp.sqrt(rlen2)
                gdiff = h2 - rlen2
                gsc = jnp.where(
                    (rlen >= h) | (rlen == 0.0), 0.0,
                    jnp.float32(st_grad_norm) * gdiff * gdiff)
                m_rho = sc_ref[w, 14] * inv_rho
                cg_x = cg_x + jnp.where(
                    ok_st, m_rho * gsc * sdx, 0.0)
                cg_y = cg_y + jnp.where(
                    ok_st, m_rho * gsc * sdy, 0.0)
                lap = jnp.where(
                    dst > h, 0.0,
                    jnp.float32(st_lap_norm) * (h2 - r2)
                    * (3.0 * h2 - 4.0 * r2))
                cl_ = cl_ + jnp.where(ok_st, m_rho * lap, 0.0)

            # viscosity kernel (funcs.wgsl:112-123),
            # division-free form (ops.pallas.sph); the
            # dst <= h gate is folded into in_range like kern_p
            kv = (r2 * dst * _c_neg_inv_2h3 + r2 * _c_inv_h2
                  + inv_dst * _c_half_h - 1.0)
            if is_center:
                kv = jnp.where(dst == 0.0, 1.0, kv)
            wv = jnp.where(in_range, kv * inv_rho, 0.0)
            gx_ = gx_ + (nvx - vx0) * wv
            gy_ = gy_ + (nvy - vy0) * wv
    return (fx, fy, gx_, gy_, scc_run,
            (cg_x, cg_y, cl_) if surface_tension else None)


# ------------------------------- fused density + forces (physics kernel)

def _physics_kernel(consts, flags, rowsel_ref, sc_ref, frame_ref, wid_ref,
                    occc_ref, occ3_ref, *refs):
    """ONE kernel for the whole physics half of the step: density ->
    (pressure, 1/rho) in VMEM scratch, then pressure+viscosity forces
    fused with the full integration (compute.wgsl:59-299 + 95-155).

    vs the split density()/forces_integrate() kernels this reads the 4
    (pos, vel) fields ONCE per program (with a 2-row halo: forces of row
    y needs density of rows y±1, which needs predictions of rows y±2),
    computes every row's predictions ONCE into scratch (the split
    kernels re-derived them 2-3x), never materializes pres/invr to HBM,
    and pays ONE per-program prologue instead of two. Cost: density pair
    work for the ±1 halo rows is recomputed by adjacent programs —
    (rblk+2)/rblk of standalone.

    The pair math is shared with the split kernels (_forces_cand_block /
    _forces_integrate_sub) and per-phase iteration orders are identical,
    so outputs are BITWISE equal to split density() + forces_integrate()
    (tests/test_resident.py::test_physics_matches_split_kernels).

    Phases per program (rblk center rows, world rows yb*rblk + [0, rblk)):
      P: predictions for rblk+4 rows     -> prx/pry scratch
      D: density for rblk+2 rows         -> pres/invr scratch
      F: forces + integration for the rblk center rows -> outputs
    """
    (h, h2, sqr_radius, spiky_norm, visc_norm, dens_norm, k, gx, rblk,
     rows_tot) = consts
    consts9 = (h, h2, sqr_radius, spiky_norm, visc_norm, k, gx, rblk,
               rows_tot)
    (wrap_x, has_ff, surface_tension, adaptive) = flags
    nrows = rblk + 4
    rowrefs = [refs[j * 4:(j + 1) * 4] for j in range(nrows)]
    idx = 4 * nrows
    if has_ff:
        ffx_ref, ffy_ref = refs[idx:idx + 2]
        idx += 2
    npx_ref, npy_ref, nvx_ref, nvy_ref = refs[idx:idx + 4]
    s = idx + 4
    prx_ref, pry_ref = refs[s:s + 2]        # [rblk+4, K, Gx]
    pres_ref, invr_ref = refs[s + 2:s + 4]  # [rblk+2, K, Gx]
    acc_ref = refs[s + 4]                   # [K, Gx]
    (sfx_ref, sfy_ref, sgx_ref, sgy_ref, scc_ref,
     d0x_ref, d0y_ref) = refs[s + 5:s + 12]
    if surface_tension:
        (cgx_ref, cgy_ref, clap_ref,
         stx_ref, sty_ref) = refs[s + 12:s + 17]
    yb = pl.program_id(0)
    frame = frame_ref[0]
    sub = _sub_h(k)
    static1 = k == sub

    h3 = h * h2
    _c_neg_inv_2h3 = -1.0 / (2.0 * h3)
    _c_inv_h2 = 1.0 / h2
    _c_half_h = h / 2.0

    # program-live: any center-row targets. Mirrors the collapse table
    # (_row_sel over occ_row): when false this program's input blocks may
    # be steered to the trash row, so phases P/D must not read them (all
    # their results would be unconsumed — the F phase writes defaults).
    live = occc_ref[yb * rblk]
    for i in range(1, rblk):
        live = jnp.maximum(live, occc_ref[yb * rblk + i])

    # ---- phase P: predictions for all rblk+4 input rows -> scratch.
    # Slots beyond a row's own occupancy hold sentinel positions, and
    # _pred_rows maps sentinels to SENTINEL — so the default fill equals
    # what the split kernels compute for those slots.
    for j in range(nrows):
        yc = jnp.clip(yb * rblk + j - 2, 0, rows_tot - 1)
        occ = occc_ref[yc]
        prx_ref[j] = jnp.full((k, gx), SENTINEL, jnp.float32)
        pry_ref[j] = jnp.full((k, gx), SENTINEL, jnp.float32)

        @pl.when((occ > 0) & (live > 0))
        def _(j=j, yc=yc, occ=occ):
            w = wid_ref[yc]
            dt = sc_ref[w, 0]
            half_x = sc_ref[w, 10]
            half_y = sc_ref[w, 11]
            nb = (occ + (sub - 1)) // sub

            def body(b, carry):
                o = _sub_off(b, sub)
                prx, pry = _pred_rows(
                    rowrefs[j][0][0, pl.ds(o, sub)],
                    rowrefs[j][1][0, pl.ds(o, sub)],
                    rowrefs[j][2][0, pl.ds(o, sub)],
                    rowrefs[j][3][0, pl.ds(o, sub)],
                    dt, half_x, half_y)
                prx_ref[j, pl.ds(o, sub)] = prx
                pry_ref[j, pl.ds(o, sub)] = pry
                return carry

            _sub_loop(nb, body, static1)

    # ---- phase D: density -> (pressure, 1/rho) scratch for the rblk+2
    # rows the F phase reads as candidates. Same iteration order as
    # _density_kernel: (candidate sub-block, target sub-block, slot).
    for j2 in range(rblk + 2):
        yc = jnp.clip(yb * rblk + j2 - 1, 0, rows_tot - 1)
        occ_c = occc_ref[yc]
        occ3 = occ3_ref[yc]
        w = wid_ref[yc]
        kp_c = sc_ref[w, 17]
        rho0 = sc_ref[w, 18]

        # defaults: floor density everywhere (read only as
        # excluded-by-range candidates; finite values stay NaN-free)
        pres_ref[j2] = (jnp.full((k, gx), 1.0, jnp.float32)
                        * (kp_c * (0.1 - rho0)))
        invr_ref[j2] = jnp.full((k, gx), 10.0, jnp.float32)

        @pl.when((occ_c > 0) & (live > 0))
        def _(j2=j2, occ_c=occ_c, occ3=occ3, w=w, kp_c=kp_c, rho0=rho0):
            mass = sc_ref[w, 14]
            n3 = (occ3 + (sub - 1)) // sub
            nt = (occ_c + (sub - 1)) // sub

            def zero_body(t, carry):
                to = _sub_off(t, sub)
                acc_ref[pl.ds(to, sub)] = jnp.zeros((sub, gx), jnp.float32)
                return carry

            _sub_loop(nt, zero_body, static1)

            def cand_body(b, carry):
                o = _sub_off(b, sub)
                osl = pl.ds(o, sub)
                preds = [(prx_ref[j2 + r, osl], pry_ref[j2 + r, osl])
                         for r in range(3)]
                rolled = {}
                for r in range(3):
                    for dx in (-1, 0, 1):
                        rolled[(r, dx)] = (_roll_x(preds[r][0], dx),
                                           _roll_x(preds[r][1], dx))

                def tgt_body(t, c2):
                    to = _sub_off(t, sub)
                    px0 = prx_ref[j2 + 1, pl.ds(to, sub)]
                    py0 = pry_ref[j2 + 1, pl.ds(to, sub)]
                    for kp in range(sub):
                        kpg = o + kp

                        def one_cand(kp=kp):
                            acc = jnp.zeros((sub, gx), jnp.float32)
                            for r in range(3):
                                for dx in (-1, 0, 1):
                                    rl = rolled[(r, dx)]
                                    nx = rl[0][kp:kp + 1, :]
                                    ny = rl[1][kp:kp + 1, :]
                                    ddx = nx - px0
                                    ddy = ny - py0
                                    r2 = ddx * ddx + ddy * ddy
                                    diff = jnp.maximum(h2 - r2, 0.0)
                                    acc = acc + diff * diff * diff
                            acc_ref[pl.ds(to, sub)] = (
                                acc_ref[pl.ds(to, sub)] + acc)

                        pl.when(kpg < occ3)(one_cand)
                    return c2

                _sub_loop(nt, tgt_body, static1)
                return carry

            _sub_loop(n3, cand_body, static1)

            def post_body(t, carry):
                to = _sub_off(t, sub)
                rho = mass * (jnp.float32(dens_norm)
                              * acc_ref[pl.ds(to, sub)])
                rho = jnp.maximum(
                    jnp.maximum(rho, 1.19209290e-07), 0.1)
                pres_ref[j2, pl.ds(to, sub)] = kp_c * (rho - rho0)
                invr_ref[j2, pl.ds(to, sub)] = 1.0 / rho
                return carry

            _sub_loop(nt, post_body, static1)

    # ---- phase F: forces + integration for the rblk center rows.
    # Row index maps: world row y+r-1 -> input/pred index i+r+1,
    # density index i+r (center: input/pred i+2, density i+1).
    for i in range(rblk):
        y = yb * rblk + i
        occ_c = occc_ref[y]
        occ3 = occ3_ref[y]
        w = wid_ref[y]

        npx_ref[i] = jnp.full((k, gx), SENTINEL, jnp.float32)
        npy_ref[i] = jnp.full((k, gx), SENTINEL, jnp.float32)
        nvx_ref[i] = jnp.zeros((k, gx), jnp.float32)
        nvy_ref[i] = jnp.zeros((k, gx), jnp.float32)

        @pl.when(occ_c > 0)
        def _(i=i, occ_c=occ_c, occ3=occ3, w=w):
            if surface_tension:
                st_grad_norm = -24.0 / (PI * h**8)
                st_lap_norm = 8.0 / (PI * h**8)
            n3 = (occ3 + (sub - 1)) // sub
            nt = (occ_c + (sub - 1)) // sub

            # pre-pass per TARGET sub-block: tie-break base direction +
            # zeroed accumulators (predictions already live in scratch;
            # the split kernel derived d0 from the same pred values)
            def pre_body(b, carry):
                o = _sub_off(b, sub)

                def tgt_init():
                    prx = prx_ref[i + 2, pl.ds(o, sub)]
                    pry = pry_ref[i + 2, pl.ds(o, sub)]
                    bx = _bitcast_u32(prx)
                    by = _bitcast_u32(pry)
                    seed_self = ((bx * jnp.uint32(0x9E3779B1))
                                 ^ (by * jnp.uint32(0x85EBCA6B)))
                    seed_self = seed_self + frame * jnp.uint32(69)
                    s1 = _xorshift32(seed_self)
                    s2 = _xorshift32(s1)
                    rx = _u01(s1)
                    ry = _u01(s2)
                    inv = jax.lax.rsqrt(
                        jnp.maximum(rx * rx + ry * ry, 1e-30))
                    d0x_ref[pl.ds(o, sub)] = rx * inv
                    d0y_ref[pl.ds(o, sub)] = ry * inv
                    z = jnp.zeros((sub, gx), jnp.float32)
                    sfx_ref[pl.ds(o, sub)] = z
                    sfy_ref[pl.ds(o, sub)] = z
                    sgx_ref[pl.ds(o, sub)] = z
                    sgy_ref[pl.ds(o, sub)] = z
                    scc_ref[pl.ds(o, sub)] = jnp.zeros((sub, gx),
                                                       jnp.uint32)
                    if surface_tension:
                        st_i = jnp.maximum(prx, 0.0).astype(jnp.int32)
                        st_seed = (_bitcast_u32(st_i) * jnp.uint32(324)
                                   + frame * jnp.uint32(5632))
                        st1 = _xorshift32(st_seed)
                        st2 = _xorshift32(st1)
                        strx = _u01(st1)
                        stry = _u01(st2)
                        strn = jnp.sqrt(strx * strx + stry * stry)
                        strn = jnp.where(strn == 0.0, 1.0, strn)
                        stx_ref[pl.ds(o, sub)] = strx / strn
                        sty_ref[pl.ds(o, sub)] = stry / strn
                        cgx_ref[pl.ds(o, sub)] = z
                        cgy_ref[pl.ds(o, sub)] = z
                        clap_ref[pl.ds(o, sub)] = z

                if static1:
                    tgt_init()
                else:
                    pl.when(b < nt)(tgt_init)
                return carry

            _sub_loop(nt, pre_body, static1)

            def cand_body(b, carry):
                o = _sub_off(b, sub)
                osl = pl.ds(o, sub)
                rolled = {}
                for r in range(3):
                    flds = (prx_ref[i + r + 1, osl],
                            pry_ref[i + r + 1, osl],
                            rowrefs[i + r + 1][2][0, osl],
                            rowrefs[i + r + 1][3][0, osl],
                            pres_ref[i + r, osl],
                            invr_ref[i + r, osl])
                    for dx in (-1, 0, 1):
                        rolled[(r, dx)] = tuple(
                            _roll_x(f, dx) for f in flds)

                def tgt_body(t, c2):
                    to = _sub_off(t, sub)
                    tsl = pl.ds(to, sub)
                    center = (prx_ref[i + 2, tsl], pry_ref[i + 2, tsl],
                              rowrefs[i + 2][2][0, tsl],
                              rowrefs[i + 2][3][0, tsl],
                              pres_ref[i + 1, tsl], invr_ref[i + 1, tsl])
                    _forces_cand_block(
                        center, rolled, o, to, sub, occ3,
                        consts9, flags, sc_ref, w,
                        d0x_ref, d0y_ref,
                        sfx_ref, sfy_ref, sgx_ref, sgy_ref,
                        scc_ref,
                        cgx_ref if surface_tension else None,
                        cgy_ref if surface_tension else None,
                        clap_ref if surface_tension else None,
                        stx_ref if surface_tension else None,
                        sty_ref if surface_tension else None,
                        st_grad_norm if surface_tension else 0,
                        st_lap_norm if surface_tension else 0,
                        _c_neg_inv_2h3, _c_inv_h2, _c_half_h)
                    return c2

                _sub_loop(nt, tgt_body, static1)
                return carry

            _sub_loop(n3, cand_body, static1)

            def int_body(t, carry):
                to = _sub_off(t, sub)
                tsl = pl.ds(to, sub)
                center = (rowrefs[i + 2][0][0, tsl],
                          rowrefs[i + 2][1][0, tsl],
                          rowrefs[i + 2][2][0, tsl],
                          rowrefs[i + 2][3][0, tsl],
                          invr_ref[i + 1, tsl],
                          prx_ref[i + 2, tsl], pry_ref[i + 2, tsl])
                _forces_integrate_sub(
                    i, to, sub, center, consts9, flags, sc_ref, w, frame,
                    ffx_ref if has_ff else None,
                    ffy_ref if has_ff else None,
                    npx_ref, npy_ref, nvx_ref, nvy_ref,
                    sfx_ref, sfy_ref, sgx_ref, sgy_ref,
                    cgx_ref if surface_tension else None,
                    cgy_ref if surface_tension else None,
                    clap_ref if surface_tension else None)
                return carry

            _sub_loop(nt, int_body, static1)


def physics(pos_x, pos_y, vel_x, vel_y, occ_row, params, settings, frame,
            ff_cells=None, x_boundary="bounce",
            surface_tension: bool = False,
            adaptive_subsampling: bool = False, wid=None,
            rows_per_program=1):
    """Density + 3x3-stencil forces + full integration as ONE kernel.

    Same contract as density() followed by forces_integrate() — returns
    (pos_x', pos_y', vel_x', vel_y') BITWISE equal to the split pair —
    but reads (pos, vel) once, keeps pres/invr in VMEM scratch, and pays
    one per-program prologue instead of two (see _physics_kernel).
    """
    gy, k, gx = pos_x.shape
    rblk = rows_per_program
    assert gy % rblk == 0, (gy, rblk)
    norms = settings.kernel_norms()
    h_f = float(settings.smoothing_radius)
    consts = (h_f, h_f * h_f, float(settings.sqr_radius),
              float(norms.spiky_derivative), float(norms.viscosity),
              4.0 / (PI * h_f**8), k, gx, rblk, gy)
    flags = (x_boundary == "wrap", ff_cells is not None,
             surface_tension, adaptive_subsampling)
    kernel = functools.partial(_physics_kernel, consts, flags)
    f32c = jnp.float32
    mouse_pos = jnp.asarray(params.mouse_pos, jnp.float32)
    gravity = jnp.asarray(params.gravity, jnp.float32)
    cols = [
        params.delta.astype(f32c),
        params.viscosity_coefficient.astype(f32c),
        gravity[..., 0],
        gravity[..., 1],
        params.damping_factor.astype(f32c),
        mouse_pos[..., 0],
        mouse_pos[..., 1],
        params.mouse_force_radius.astype(f32c),
        params.mouse_force_power.astype(f32c),
        params.mouse_state.astype(f32c),
        jnp.float32(settings.size[0] * 0.5),
        jnp.float32(settings.size[1] * 0.5),
        jnp.float32(2.0 * settings.size[0] / settings.texture_size[0]),
        jnp.float32(2.0 * settings.size[1] / settings.texture_size[1]),
        params.mass.astype(f32c),
        params.surface_tension_threshold.astype(f32c),
        params.surface_tension_coefficient.astype(f32c),
        params.pressure_constant.astype(f32c),
        params.rest_density.astype(f32c),
    ]
    n_worlds = (max((c.ndim and c.shape[0]) or 1 for c in cols)
                if wid is not None else 1)
    sc = jnp.stack(
        [jnp.broadcast_to(c, (n_worlds,)) for c in cols], axis=1)
    if wid is None:
        wid = jnp.zeros((gy,), jnp.int32)
    fr = jnp.asarray(frame, jnp.uint32).reshape(1)
    occ_row = jnp.asarray(occ_row, jnp.int32).reshape(-1)
    occ3 = occ3_of(occ_row)
    fields = (pos_x, pos_y, vel_x, vel_y)
    in_specs = ([_scalar_spec()] * 5
                + _mrow_specs(rblk, gy, k, gx, 4,
                              _collapse_default(settings), halo=2))
    args = [sc, fr, jnp.asarray(wid, jnp.int32), occ_row, occ3,
            *(list(fields) * (rblk + 4))]
    if ff_cells is not None:
        ffx, ffy = ff_cells
        args += [ffx.reshape(gy, 1, gx), ffy.reshape(gy, 1, gx)]
        ff_spec = pl.BlockSpec((rblk, 1, gx), lambda y, rowsel: (y, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [ff_spec, ff_spec]
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gy // rblk,),
            in_specs=in_specs,
            out_specs=tuple(_mout_spec(rblk, k, gx) for _ in range(4)),
            scratch_shapes=(
                [pltpu.VMEM((rblk + 4, k, gx), f32)] * 2   # prx, pry
                + [pltpu.VMEM((rblk + 2, k, gx), f32)] * 2  # pres, invr
                + [pltpu.VMEM((k, gx), f32)]                # acc
                + [pltpu.VMEM((k, gx), f32)] * 4      # sfx, sfy, sgx, sgy
                + [pltpu.VMEM((k, gx), jnp.uint32)]   # scc
                + [pltpu.VMEM((k, gx), f32)] * 2      # d0x, d0y
                + ([pltpu.VMEM((k, gx), f32)] * 5     # cgx/cgy/clap/stx/sty
                   if surface_tension else [])
            ),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((gy, k, gx), f32) for _ in range(4)),
        interpret=_interpret(),
        name="sph_physics_fused",
    )(_row_sel(occ_row, rblk, gy, halo=2), *args)


def forces_integrate(pos_x, pos_y, vel_x, vel_y, pres, invr, occ_row,
                     params, settings, frame, ff_cells=None,
                     x_boundary="bounce", surface_tension: bool = False,
                     adaptive_subsampling: bool = False, wid=None,
                     rows_per_program=1):
    """One fused kernel: 3x3-stencil pressure+viscosity forces and the full
    integration. Returns (pos_x', pos_y', vel_x', vel_y').

    ``ff_cells``: optional (ffx, ffy) [Gy, Gxp] world-unit push-out vectors
    sampled at cell centers (see ops.resident.forcefield_cells).
    Variant flags (static) per ops.dense.force_pass.
    ``wid``: i32[Gy] world id per row for batched world stacks — params
    fields then carry a leading [W] batch dim.
    """
    gy, k, gx = pos_x.shape
    rblk = rows_per_program
    assert gy % rblk == 0, (gy, rblk)
    norms = settings.kernel_norms()
    h_f = float(settings.smoothing_radius)
    consts = (h_f, h_f * h_f, float(settings.sqr_radius),
              float(norms.spiky_derivative), float(norms.viscosity), k, gx,
              rblk, gy)
    flags = (x_boundary == "wrap", ff_cells is not None,
             surface_tension, adaptive_subsampling)
    kernel = functools.partial(_forces_kernel, consts, flags)
    f32c = jnp.float32
    mouse_pos = jnp.asarray(params.mouse_pos, jnp.float32)
    gravity = jnp.asarray(params.gravity, jnp.float32)
    cols = [
        params.delta.astype(f32c),
        params.viscosity_coefficient.astype(f32c),
        gravity[..., 0],
        gravity[..., 1],
        params.damping_factor.astype(f32c),
        mouse_pos[..., 0],
        mouse_pos[..., 1],
        params.mouse_force_radius.astype(f32c),
        params.mouse_force_power.astype(f32c),
        params.mouse_state.astype(f32c),
        jnp.float32(settings.size[0] * 0.5),
        jnp.float32(settings.size[1] * 0.5),
        jnp.float32(2.0 * settings.size[0] / settings.texture_size[0]),
        jnp.float32(2.0 * settings.size[1] / settings.texture_size[1]),
        params.mass.astype(f32c),
        params.surface_tension_threshold.astype(f32c),
        params.surface_tension_coefficient.astype(f32c),
    ]
    n_worlds = (max((c.ndim and c.shape[0]) or 1 for c in cols)
                if wid is not None else 1)
    sc = jnp.stack(
        [jnp.broadcast_to(c, (n_worlds,)) for c in cols], axis=1)
    if wid is None:
        wid = jnp.zeros((gy,), jnp.int32)
    fr = jnp.asarray(frame, jnp.uint32).reshape(1)
    occ_row = jnp.asarray(occ_row, jnp.int32).reshape(-1)
    occ3 = occ3_of(occ_row)
    fields = (pos_x, pos_y, vel_x, vel_y, pres, invr)
    in_specs = ([_scalar_spec()] * 5
                + _mrow_specs(rblk, gy, k, gx, 6, _collapse_default(settings)))
    args = [sc, fr, jnp.asarray(wid, jnp.int32), occ_row, occ3,
            *(list(fields) * (rblk + 2))]
    if ff_cells is not None:
        ffx, ffy = ff_cells
        args += [ffx.reshape(gy, 1, gx), ffy.reshape(gy, 1, gx)]
        ff_spec = pl.BlockSpec((rblk, 1, gx), lambda y, rowsel: (y, 0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [ff_spec, ff_spec]
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gy // rblk,),
            in_specs=in_specs,
            out_specs=tuple(_mout_spec(rblk, k, gx) for _ in range(4)),
            scratch_shapes=(
                [pltpu.VMEM((k, gx), f32)] * 4      # sfx, sfy, sgx, sgy
                + [pltpu.VMEM((k, gx), jnp.uint32)]  # scc
                + [pltpu.VMEM((k, gx), f32)] * 4    # tpx, tpy, d0x, d0y
                + ([pltpu.VMEM((k, gx), f32)] * 5   # cgx/cgy/clap/stx/sty
                   if surface_tension else [])
            ),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((gy, k, gx), f32) for _ in range(4)),
        interpret=_interpret(),
        name="sph_forces_integrate_fused",
    )(_row_sel(occ_row, rblk, gy), *args)
