"""Fused Pallas TPU kernels for the SPH stencil passes.

These are the performance-critical native kernels of the framework — the
TPU equivalents of the reference's WGSL compute shaders
(compute.wgsl:59-299). They consume the dense row-layout cell grid of
tpufluid.ops.dense ([Gy, K, Gx], minor dim = grid x) and compute, per grid
row, the full 3x3-cell interaction with the row above/below/itself:

  * density:  rho = sum m * poly6(r^2)                 (funcs.wgsl:157-203)
  * forces:   symmetrized pressure + viscosity          (compute.wgsl:160-299)

Kernel strategy: one program per grid ROW. The three contributing rows
arrive as overlapping blocks (the same array is passed three times with a
clamped index map — the clamp is safe because rows 0 / Gy-1 are the empty
sentinel ring). The dx = -1/0/+1 shifts are lane rolls (wrap lands on empty
sentinel columns), so the whole interaction is branch-free [K, Gx] VPU math
with zero gathers. Static kernel constants (h, norms) are baked in at trace
time from SimSettings; per-tick tunables (mass, k, rho0, mu, frame) arrive
as SMEM scalars so they stay live-tunable without recompiles.

On non-TPU backends the kernels run in interpreter mode (tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PI = math.pi


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_x(a, dx):
    """nb[..., x] = a[..., x+dx] with wraparound (sentinel columns empty)."""
    if dx == 0:
        return a
    if _interpret():
        return jnp.roll(a, -dx, axis=a.ndim - 1)
    # pltpu.roll requires a non-negative shift
    return pltpu.roll(a, (-dx) % a.shape[-1], axis=a.ndim - 1)


def _scalar_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _row_specs(gy, k, gx, n_fields):
    """Per field, three overlapping row blocks: rows y-1, y, y+1 (clamped)."""
    specs = []
    for dy in (-1, 0, 1):
        def imap(y, dy=dy):
            return (jnp.clip(y + dy, 0, gy - 1), 0, 0)
        for _ in range(n_fields):
            specs.append(pl.BlockSpec((1, k, gx), imap,
                                      memory_space=pltpu.VMEM))
    return specs


def _out_spec(k, gx):
    return pl.BlockSpec((1, k, gx), lambda y: (y, 0, 0),
                        memory_space=pltpu.VMEM)


# --------------------------------------------------------------- density

def _density_kernel(h2, norm, sc_ref, *refs):
    # sc_ref: f32[1] = mass (SMEM)
    # refs: 3 rows x (px, py, valid_f) then out
    out_ref = refs[-1]
    mass = sc_ref[0]
    px0 = refs[3][0]
    py0 = refs[4][0]
    k = px0.shape[0]
    acc = jnp.zeros_like(px0)
    # rolls hoisted per (row, dx) block: per-slot strip rolls cost full
    # masked tiles on the VPU (see ops.pallas.fused)
    for row in range(3):
        nx_r = refs[row * 3 + 0][0]
        ny_r = refs[row * 3 + 1][0]
        nv_r = refs[row * 3 + 2][0]
        for dx in (-1, 0, 1):
            nx = _roll_x(nx_r, dx)
            ny = _roll_x(ny_r, dx)
            nv = _roll_x(nv_r, dx)
            for kp in range(k):
                ddx = nx[kp:kp + 1, :] - px0
                ddy = ny[kp:kp + 1, :] - py0
                r2 = ddx * ddx + ddy * ddy
                # max(diff,0)^3 == where(r2>h2, 0, diff^3) exactly
                diff = jnp.maximum(h2 - r2, 0.0)
                w = norm * (diff * diff * diff)
                acc = acc + jnp.where(nv[kp:kp + 1, :] > 0.0, mass * w, 0.0)
    out_ref[0] = acc


def density(grid, mass, h):
    """rho[Gy, K, Gx] from a ops.dense.DenseGrid. ``h`` static (float),
    ``mass`` traced."""
    gy, k, gx = grid.px.shape
    h_f = float(h)
    h2 = h_f * h_f
    norm = 4.0 / (PI * h_f**8)
    vf = grid.valid.astype(jnp.float32)
    # bind statics as Python floats: Pallas folds them into the kernel
    kernel = functools.partial(_density_kernel, h2, norm)
    sc = jnp.asarray(mass, jnp.float32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid=(gy,),
        in_specs=[_scalar_spec()] + _row_specs(gy, k, gx, 3),
        out_specs=_out_spec(k, gx),
        out_shape=jax.ShapeDtypeStruct((gy, k, gx), jnp.float32),
        interpret=_interpret(),
        name="sph_density",
    )(sc, grid.px, grid.py, vf, grid.px, grid.py, vf, grid.px, grid.py, vf)


# ---------------------------------------------------------------- forces

def _xorshift32(x):
    x = x ^ (x << jnp.uint32(13))
    x = x ^ (x >> jnp.uint32(17))
    x = x ^ (x << jnp.uint32(5))
    return x


def _bitcast_u32(x):
    if _interpret():
        return jax.lax.bitcast_convert_type(x, jnp.uint32)
    return pltpu.bitcast(x, jnp.uint32)


def _u01(x):
    """uint32 -> [0,1) float. Mosaic lacks a direct u32->f32 cast; go via
    a signed bitcast plus wraparound fixup."""
    if _interpret():
        return x.astype(jnp.float32) / jnp.float32(4294967296.0)
    xi = pltpu.bitcast(x, jnp.int32).astype(jnp.float32)
    xf = jnp.where(xi < 0.0, xi + jnp.float32(4294967296.0), xi)
    return xf / jnp.float32(4294967296.0)


def _forces_kernel(h, h2, sqr_radius, spiky_norm, visc_norm, flags,
                   sc_ref, frame_ref, *refs):
    # sc_ref: f32[6] = (pressure_constant, rest_density, mu, mass,
    #                   st_threshold, st_coefficient); frame: u32[1]
    # refs: 3 rows x (px, py, vx, vy, valid_f, dens), then fx, fy, gx, gy
    surface_tension, adaptive = flags
    fx_ref, fy_ref, gx_ref, gy_ref = refs[-4:]
    rows = [refs[r * 6:(r + 1) * 6] for r in range(3)]
    px0, py0, vx0, vy0, v0, d0 = (r[0] for r in rows[1])
    k = px0.shape[0]
    k_pressure = sc_ref[0]
    rest_density = sc_ref[1]
    mu = sc_ref[2]
    frame = frame_ref[0]
    h3 = h * h2
    _c_neg_inv_2h3 = -1.0 / (2.0 * h3)
    _c_inv_h2 = 1.0 / h2
    _c_half_h = h / 2.0

    p_self = k_pressure * (d0 - rest_density)
    # position-hash tie-break seed (contract in ops.prng.position_seed)
    bx = _bitcast_u32(px0)
    by = _bitcast_u32(py0)
    seed_self = (bx * jnp.uint32(0x9E3779B1)) ^ (by * jnp.uint32(0x85EBCA6B))
    seed_self = seed_self + frame * jnp.uint32(69)
    k_self = jax.lax.broadcasted_iota(jnp.int32, px0.shape, 0)

    # Tie-break direction table, computed ONCE per program: the in-loop
    # PRNG chain measured 25% of the whole step (2.2 ms at 1M). Draw
    # ordinals are clamped at 1 (see ops.pairs for the shared contract), so
    # four variants cover every (pair-order salt, ordinal) combination.
    tie_dirs = {}
    for s_salt in (0, 1):
        for c_ord in (0, 1):
            eff = (seed_self
                   + jnp.uint32(c_ord) * jnp.uint32(2654435761)
                   + jnp.uint32(s_salt) * jnp.uint32(0x27220A95))
            s1 = _xorshift32(eff)
            s2 = _xorshift32(s1)
            rx = _u01(s1)
            ry = _u01(s2)
            rn = jnp.sqrt(rx * rx + ry * ry)
            rn = jnp.where(rn == 0.0, 1.0, rn)
            tie_dirs[(s_salt, c_ord)] = (rx / rn, ry / rn)

    fx = jnp.zeros_like(px0)
    fy = jnp.zeros_like(px0)
    gx_ = jnp.zeros_like(px0)
    gy_ = jnp.zeros_like(px0)
    coinc_count = jnp.zeros(px0.shape, jnp.uint32)

    v0_live = v0 > 0.0  # hoisted: invariant across the candidate loops

    if surface_tension:
        # color-field accumulators (compute.wgsl:303-498); seed per
        # compute.wgsl:406 (WGSL u32(f32) saturates negatives to 0)
        st_grad_norm = -24.0 / (PI * h**8)
        st_lap_norm = 8.0 / (PI * h**8)
        st_i = jnp.maximum(px0, 0.0).astype(jnp.int32)
        st_seed = (_bitcast_u32(st_i) * jnp.uint32(324)
                   + frame * jnp.uint32(5632))
        s1 = _xorshift32(st_seed)
        s2 = _xorshift32(s1)
        strx = _u01(s1)
        stry = _u01(s2)
        strn = jnp.sqrt(strx * strx + stry * stry)
        strn = jnp.where(strn == 0.0, 1.0, strn)
        st_dx = strx / strn
        st_dy = stry / strn
        cgx = jnp.zeros_like(px0)
        cgy = jnp.zeros_like(px0)
        clap = jnp.zeros_like(px0)

    for row in range(3):
        px_r, py_r, vx_r, vy_r, v_r, d_r = (r[0] for r in rows[row])
        for dx in (-1, 0, 1):
            nx = _roll_x(px_r, dx)
            ny = _roll_x(py_r, dx)
            nvx = _roll_x(vx_r, dx)
            nvy = _roll_x(vy_r, dx)
            nv = _roll_x(v_r, dx)
            nd = _roll_x(d_r, dx)
            is_center = (row == 1 and dx == 0)
            before = (row == 0) or (row == 1 and dx == -1)
            for kp in range(k):
                ddx = nx[kp:kp + 1, :] - px0
                ddy = ny[kp:kp + 1, :] - py0
                r2 = ddx * ddx + ddy * ddy
                dst = jnp.sqrt(r2)
                ok = (nv[kp:kp + 1, :] > 0.0) & v0_live
                if is_center:
                    ok = ok & (k_self != kp)
                in_range = ok & (r2 <= sqr_radius)

                safe = jnp.where(dst == 0.0, 1.0, dst)
                inv_dst = 1.0 / safe
                dirx = ddx * inv_dst
                diry = ddy * inv_dst

                # coincident-pair random direction (compute.wgsl:211-215)
                # via the precomputed table. (An any()-guarded lax.cond
                # here measured SLOWER — Mosaic per-iteration branches
                # cost more than the ops they skip.)
                coincident = in_range & (dst == 0.0)
                has_prior = coinc_count >= jnp.uint32(1)
                if is_center:
                    salted = kp < k_self
                    tx = jnp.where(
                        salted,
                        jnp.where(has_prior, tie_dirs[(1, 1)][0],
                                  tie_dirs[(1, 0)][0]),
                        jnp.where(has_prior, tie_dirs[(0, 1)][0],
                                  tie_dirs[(0, 0)][0]))
                    ty = jnp.where(
                        salted,
                        jnp.where(has_prior, tie_dirs[(1, 1)][1],
                                  tie_dirs[(1, 0)][1]),
                        jnp.where(has_prior, tie_dirs[(0, 1)][1],
                                  tie_dirs[(0, 0)][1]))
                else:
                    s_salt = 1 if before else 0
                    tx = jnp.where(has_prior, tie_dirs[(s_salt, 1)][0],
                                   tie_dirs[(s_salt, 0)][0])
                    ty = jnp.where(has_prior, tie_dirs[(s_salt, 1)][1],
                                   tie_dirs[(s_salt, 0)][1])
                dirx = jnp.where(coincident, tx, dirx)
                diry = jnp.where(coincident, ty, diry)
                coinc_count = coinc_count + coincident.astype(jnp.uint32)

                ndk = nd[kp:kp + 1, :]
                p_nb = k_pressure * (ndk - rest_density)
                shared_p = (p_self + p_nb) * 0.5
                kern_p = jnp.where(dst <= h, -(h - dst) * spiky_norm, 0.0)
                inv_rho = 1.0 / jnp.where(ndk == 0.0, 1.0, ndk)
                in_range_p = in_range
                if adaptive:
                    # stride the cell run by 1/5/13 as the SELF density
                    # crosses 150/200 (shaders/compute.wgsl:170-174,195);
                    # the slot index IS the rank in the cell, and kp is
                    # static, so the stride test folds to constants
                    c5 = jnp.float32(1.0 if kp % 5 == 0 else 0.0)
                    c13 = jnp.float32(1.0 if kp % 13 == 0 else 0.0)
                    sub = jnp.where(d0 >= 200.0, c13,
                                    jnp.where(d0 >= 150.0, c5, 1.0))
                    in_range_p = in_range & (sub > 0.0)
                wp = jnp.where(in_range_p, kern_p * shared_p * inv_rho, 0.0)
                fx = fx + dirx * wp
                fy = fy + diry * wp

                # viscosity kernel (funcs.wgsl:112-123), division-free via
                # the shared reciprocal (r2 == safe^2 except at dst==0,
                # where the value is overwritten anyway)
                kv = visc_norm * (
                    r2 * safe * _c_neg_inv_2h3 + r2 * _c_inv_h2
                    + inv_dst * _c_half_h - 1.0)
                kv = jnp.where(dst == 0.0, visc_norm, kv)
                kv = jnp.where(dst <= h, kv, 0.0)
                wv = jnp.where(in_range, kv * inv_rho, 0.0)
                gx_ = gx_ + (nvx[kp:kp + 1, :] - vx0) * wv
                gy_ = gy_ + (nvy[kp:kp + 1, :] - vy0) * wv

                if surface_tension:
                    # self-pair INCLUDED (pairs.color_field_* contract)
                    ok_st = ((nv[kp:kp + 1, :] > 0.0) & v0_live
                             & (r2 <= sqr_radius))
                    co_st = ok_st & (dst == 0.0)
                    sdx = jnp.where(co_st, st_dx, dirx)
                    sdy = jnp.where(co_st, st_dy, diry)
                    rlen2 = sdx * sdx + sdy * sdy
                    rlen = jnp.sqrt(rlen2)
                    gdiff = h2 - rlen2
                    gsc = jnp.where(
                        (rlen >= h) | (rlen == 0.0), 0.0,
                        jnp.float32(st_grad_norm) * gdiff * gdiff)
                    m_rho = sc_ref[3] * inv_rho
                    cgx = cgx + jnp.where(ok_st, m_rho * gsc * sdx, 0.0)
                    cgy = cgy + jnp.where(ok_st, m_rho * gsc * sdy, 0.0)
                    lap = jnp.where(
                        dst > h, 0.0,
                        jnp.float32(st_lap_norm) * (h2 - r2)
                        * (3.0 * h2 - 4.0 * r2))
                    clap = clap + jnp.where(ok_st, m_rho * lap, 0.0)

    if surface_tension:
        # pairs.surface_tension composition (compute.wgsl:303-315)
        n_len = jnp.sqrt(cgx * cgx + cgy * cgy)
        safe_len = jnp.where(n_len == 0.0, 1.0, n_len)
        k_st = (-clap) / (n_len + 1e-6)
        apply_st = n_len > sc_ref[4]
        coef = sc_ref[5]
        fx = fx + jnp.where(apply_st, -coef * k_st * (cgx / safe_len), 0.0)
        fy = fy + jnp.where(apply_st, -coef * k_st * (cgy / safe_len), 0.0)

    fx_ref[0] = fx
    fy_ref[0] = fy
    gx_ref[0] = gx_ * mu
    gy_ref[0] = gy_ * mu


def forces(grid, dens_g, params, h, sqr_radius, spiky_norm, visc_norm, frame,
           surface_tension: bool = False, adaptive_subsampling: bool = False):
    """(fx, fy, gx, gy)[Gy, K, Gx] pressure / viscosity forces.

    ``h``/``sqr_radius``/norms static floats; params fields + frame traced.
    Variant flags (static) per ops.dense.force_pass; surface tension is
    folded into (fx, fy).
    """
    gy, k, gx = grid.px.shape
    vf = grid.valid.astype(jnp.float32)
    kernel = functools.partial(
        _forces_kernel, float(h), float(h) ** 2,
        float(sqr_radius), float(spiky_norm), float(visc_norm),
        (surface_tension, adaptive_subsampling))
    sc = jnp.stack([
        params.pressure_constant.astype(jnp.float32),
        params.rest_density.astype(jnp.float32),
        params.viscosity_coefficient.astype(jnp.float32),
        params.mass.astype(jnp.float32),
        params.surface_tension_threshold.astype(jnp.float32),
        params.surface_tension_coefficient.astype(jnp.float32),
    ])
    fr = jnp.asarray(frame, jnp.uint32).reshape(1)
    fields = (grid.px, grid.py, grid.vx, grid.vy, vf, dens_g)
    return pl.pallas_call(
        kernel,
        grid=(gy,),
        in_specs=[_scalar_spec(), _scalar_spec()] + _row_specs(gy, k, gx, 6),
        out_specs=tuple(_out_spec(k, gx) for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((gy, k, gx), jnp.float32) for _ in range(4)
        ),
        interpret=_interpret(),
        name="sph_forces",
    )(sc, fr, *fields, *fields, *fields)
