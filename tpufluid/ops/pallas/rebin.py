"""Pallas re-binning kernel: moves particles between cell-grid slots.

The heart of the grid-resident engine (ops.resident): instead of a per-step
sort + scatter + gather cycle ([N]-array engine, profiled at >80% of step
time at 1M particles), particles LIVE in the dense [Gy, K, Gx] slot grid
and each step are re-packed into their new cells by this kernel.

One program per target grid row y. Source candidates are the 3x3
neighborhood (particles move at most one cell per step under the reference
dynamics — dt * speed <= h; farther movers are handled by the XLA fallback
in ops.resident, never lost silently). For each target cell the kernel
packs arrivals in deterministic (source row, dx, slot) order using a
running count and one-hot slot selection — no scatter anywhere.

Cell math matches funcs.wgsl:206-218 on the CLAMPED predicted position
(compute.wgsl:8-30), i.e. re-binning keys equal the reference's
create_spatial_lookup result for the upcoming step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .sph import _interpret, _roll_x, _row_specs, _out_spec, _scalar_spec


def _cells_of(px, py, vx, vy, dt, h_inv, bx2, by2, half_x, half_y,
              cx_max, cy_max):
    """Clamped prediction + integer cell coords, elementwise [K, Gx].

    Cell coords are clamped to the interior [1, grid_dim-2] — mirrors
    ops.grid.cell_xy (sentinel ring must stay empty even when size/h
    divides exactly in f32)."""
    prx = px + vx * dt
    pry = py + vy * dt
    prx = jnp.clip(prx, -half_x, half_x)
    pry = jnp.clip(pry, -half_y, half_y)
    ncx = jnp.floor((prx + bx2) * h_inv).astype(jnp.int32) + 1
    ncy = jnp.floor((pry + by2) * h_inv).astype(jnp.int32) + 1
    ncx = jnp.clip(ncx, 1, cx_max)
    ncy = jnp.clip(ncy, 1, cy_max)
    return ncx, ncy


def _rebin_kernel(consts, dt_ref, *refs):
    (h_inv, bx2, by2, half_x, half_y, cx_max, cy_max) = consts
    # refs: 3 rows x (pos_x, pos_y, vel_x, vel_y, valid_f); outputs:
    # (pos_x', pos_y', vel_x', vel_y', valid_f', lost_f')
    opx, opy, ovx, ovy, oval, olost = refs[-6:]
    rows = [refs[r * 5:(r + 1) * 5] for r in range(3)]
    k = rows[0][0].shape[1]
    gx = rows[0][0].shape[2]
    dt = dt_ref[0]
    y = pl.program_id(0)
    gy = pl.num_programs(0)

    x_iota = jax.lax.broadcasted_iota(jnp.int32, (1, gx), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (k, gx), 0)

    count = jnp.zeros((1, gx), jnp.int32)
    out = [jnp.zeros((k, gx), jnp.float32) for _ in range(5)]
    # how many valid slots of THIS row fail to land in the 3x3 neighborhood
    # (accounted by the far-mover fallback outside)
    lost = jnp.zeros((1, gx), jnp.float32)

    for r in range(3):
        src_y = y + (r - 1)
        px_r, py_r, vx_r, vy_r, v_r = (ref[0] for ref in rows[r])
        ncx, ncy = _cells_of(px_r, py_r, vx_r, vy_r, dt, h_inv, bx2, by2,
                             half_x, half_y, cx_max, cy_max)
        # rows 0/2 at the clamped borders duplicate row 1; suppress them
        # (traced scalar bool broadcasting over the masks)
        row_live = jnp.logical_and(src_y >= 0, src_y < gy)
        if r != 1:
            row_live = jnp.logical_and(row_live, src_y != y)

        if r == 1:
            # far-mover bookkeeping for this (source) row: valid slots whose
            # target is beyond the 3x3 neighborhood of their source cell
            scx = jax.lax.broadcasted_iota(jnp.int32, (k, gx), 1)
            far = (v_r > 0.0) & (
                (jnp.abs(ncy - y) > 1) | (jnp.abs(ncx - scx) > 1))
            lost = lost + jnp.sum(far.astype(jnp.float32), axis=0,
                                  keepdims=True)

        for dx in (-1, 0, 1):
            # candidate at target x comes from source column x+dx; its ncx
            # must equal the target x. Shift everything by dx (rolls only
            # on numeric dtypes — bools are rebuilt from rolled ints).
            ncx_s = _roll_x(ncx, dx)
            ncy_s = _roll_x(ncy, dx)
            v_s = _roll_x(v_r, dx)
            pxs = _roll_x(px_r, dx)
            pys = _roll_x(py_r, dx)
            vxs = _roll_x(vx_r, dx)
            vys = _roll_x(vy_r, dx)
            m_all = ((ncy_s == y) & (v_s > 0.0) & (ncx_s == x_iota)
                     & row_live)  # [K, Gx]
            for kk in range(k):
                m = m_all[kk:kk + 1, :]  # [1, Gx] bool
                onehot = (k_iota == count) & m  # [K, Gx]
                cand = (pxs[kk:kk + 1, :], pys[kk:kk + 1, :],
                        vxs[kk:kk + 1, :], vys[kk:kk + 1, :])
                for f in range(4):
                    out[f] = out[f] + jnp.where(onehot, cand[f], 0.0)
                out[4] = out[4] + jnp.where(onehot, 1.0, 0.0)
                count = count + m.astype(jnp.int32)

    # arrivals beyond capacity K are dropped: count them as lost too
    over = jnp.maximum(count - k, 0).astype(jnp.float32)
    lost = lost + over
    opx[0] = out[0]
    opy[0] = out[1]
    ovx[0] = out[2]
    ovy[0] = out[3]
    oval[0] = out[4]
    olost[0] = jnp.broadcast_to(lost, (k, gx)) * (1.0 / k)


def rebin(pos_x, pos_y, vel_x, vel_y, valid_f, dt, settings, gx_pad):
    """Re-pack grid slots by next-step predicted cell.

    All arrays [Gy, K, gx_pad] f32 (valid as 0/1 float). Returns
    (pos_x', pos_y', vel_x', vel_y', valid_f', lost_per_rowslot) — far
    movers and capacity overflow are EXCLUDED from the output and counted
    in ``lost`` (see ops.resident for the exact fallback).
    """
    gy, k, gx = pos_x.shape
    h = float(settings.smoothing_radius)
    consts = (
        1.0 / h,
        float(settings.size[0]) * 0.5,
        float(settings.size[1]) * 0.5,
        float(settings.size[0]) * 0.5,
        float(settings.size[1]) * 0.5,
        settings.grid_w - 2,
        settings.grid_h - 2,
    )
    kernel = functools.partial(_rebin_kernel, consts)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1)
    fields = (pos_x, pos_y, vel_x, vel_y, valid_f)
    outs = pl.pallas_call(
        kernel,
        grid=(gy,),
        in_specs=[_scalar_spec()] + _row_specs(gy, k, gx, 5),
        out_specs=tuple(_out_spec(k, gx) for _ in range(6)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((gy, k, gx), jnp.float32) for _ in range(6)
        ),
        interpret=_interpret(),
        name="sph_rebin",
    )(dt_arr, *fields, *fields, *fields)
    return outs
