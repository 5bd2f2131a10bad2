"""Independent NumPy oracle for the SPH step.

Written directly from the reference WGSL semantics (compute.wgsl /
funcs.wgsl), sharing NO code with tpufluid — it exists to catch bugs common
to the framework's shared pair math. All-pairs (O(N^2)), f32 throughout.
Coincident-particle PRNG tie-breaks are not modeled (oracle scenes avoid
exact overlaps); that path is unit-tested separately.
"""

import math

import numpy as np

F = np.float32
PI = F(math.pi)
EPSILON = F(1.19209290e-07)


def poly6(h, r2):
    h2 = F(h) * F(h)
    norm = F(4.0) / (PI * F(h) ** F(8))
    diff = h2 - r2
    return np.where(r2 > h2, F(0), norm * diff * diff * diff).astype(F)


def spiky_deriv(h, r):
    norm = F(12.0) / (PI * F(h) ** F(4))
    return np.where(r <= F(h), -(F(h) - r) * norm, F(0)).astype(F)


def viscosity_w(h, r):
    norm = F(15.0) / (F(2.0) * PI * F(h) ** F(3))
    h = F(h)
    rs = np.where(r == 0, F(1), r)
    val = norm * (-(rs**3) / (2 * h**3) + rs**2 / h**2 + h / (2 * rs) - F(1))
    val = np.where(r == 0, norm, val)
    return np.where(r <= h, val, F(0)).astype(F)


def cell_ids(pred, size, h, grid_w):
    xy = np.floor((pred + np.asarray(size, F) * F(0.5)) / F(h)).astype(np.int64) + 1
    return xy[:, 1] * grid_w + xy[:, 0]


def oracle_step(pos, vel, settings, params, tick, forcefield=None):
    """One step. settings: dict(size, smoothing_radius, texture_size);
    params: dict of TickParams fields. Returns dict of sorted-order arrays."""
    pos = pos.astype(F).copy()
    vel = vel.astype(F).copy()
    size = np.asarray(settings["size"], F)
    h = F(settings["smoothing_radius"])
    sqr_radius = h * h
    dt = F(params["delta"])
    half = size * F(0.5)

    # predict + clamp
    pred = pos + vel * dt
    over = np.abs(pred) > half
    pred = np.where(over, half * np.sign(pred), pred).astype(F)

    # sort by cell (stable)
    grid_w = int(math.ceil(settings["size"][0] / settings["smoothing_radius"])) + 2
    cells = cell_ids(pred, size, h, grid_w)
    order = np.argsort(cells, kind="stable")
    pos, vel, pred, cells = pos[order], vel[order], pred[order], cells[order]
    n = len(pos)

    # all-pairs geometry
    off = pred[None, :, :] - pred[:, None, :]  # off[i,j] = pred_j - pred_i
    r2 = np.sum(off * off, axis=-1).astype(F)
    dst = np.sqrt(r2).astype(F)
    notself = ~np.eye(n, dtype=bool)
    in_range = (r2 <= sqr_radius) & notself

    # density (self included, no cutoff)
    mass = F(params["mass"])
    dens = np.sum(mass * poly6(h, r2), axis=1).astype(F)
    dens = np.maximum(dens, EPSILON)
    dens = np.maximum(dens, F(0.1))

    # pressure force
    k = F(params["pressure_constant"])
    rho0 = F(params["rest_density"])
    p = k * (dens - rho0)
    safe_dst = np.where(dst == 0, F(1), dst)
    direction = off / safe_dst[:, :, None]
    shared_p = (p[:, None] + p[None, :]) * F(0.5)
    kern = spiky_deriv(h, dst)
    contrib = direction * (kern * shared_p / dens[None, :])[:, :, None]
    f_pressure = np.sum(
        np.where(in_range[:, :, None], contrib, F(0)), axis=1
    ).astype(F)

    # viscosity force
    mu = F(params["viscosity_coefficient"])
    dv = vel[None, :, :] - vel[:, None, :]
    kern_v = viscosity_w(h, dst)
    contrib_v = dv * (kern_v / dens[None, :])[:, :, None]
    f_visc = (
        np.sum(np.where(in_range[:, :, None], contrib_v, F(0)), axis=1) * mu
    ).astype(F)

    accel = f_pressure + f_visc

    # integrate
    vel = vel + (accel / dens[:, None]) * dt
    vel = vel + np.asarray(params["gravity"], F) * dt

    mstate = int(params["mouse_state"])
    if mstate != 0:
        diff = np.asarray(params["mouse_pos"], F) - pred
        d = np.linalg.norm(diff, axis=1).astype(F)
        radius = F(params["mouse_force_radius"])
        with np.errstate(divide="ignore", invalid="ignore"):
            imp = (
                diff / (d * d)[:, None]
                * (F(params["mouse_force_power"]) * F(mstate) * (d / radius))[:, None]
            )
        sel = d <= radius
        vel = np.where(sel[:, None], vel + imp, vel).astype(F)

    nan_any = np.any(np.isnan(vel), axis=1, keepdims=True)
    vel = np.where(nan_any, F(0), vel)

    speed = np.linalg.norm(vel, axis=1, keepdims=True).astype(F)
    vel = np.where(speed > F(500.0), vel / speed * F(500.0), vel).astype(F)

    pos = pos + vel * dt

    if forcefield is not None:
        tex = np.asarray(settings["texture_size"], F)
        uv = pred / size + F(0.5)
        texel = (uv * tex).astype(np.int64)
        tx = np.clip(texel[:, 0], 0, int(tex[0]) - 1)
        ty = np.clip(texel[:, 1], 0, int(tex[1]) - 1)
        force = forcefield[ty, tx].astype(F)
        hit = (force[:, 0] != 0) | (force[:, 1] != 0)
        norm = np.linalg.norm(force, axis=1, keepdims=True)
        nhat = force / np.where(norm == 0, F(1), norm)
        p2w = (size * F(2.0)) / tex
        vn = np.sum(vel * nhat, axis=1, keepdims=True)
        damping = F(params["damping_factor"])
        pos = np.where(hit[:, None], pos + force * p2w, pos).astype(F)
        vel = np.where(hit[:, None], vel - (F(1) - damping) * vn * nhat, vel).astype(F)

    out = np.abs(pos) > half
    pos = np.where(out, half * np.sign(pos), pos).astype(F)
    vel = np.where(out, vel * -F(params["damping_factor"]), vel).astype(F)

    return dict(position=pos, velocity=vel, predicted=pred, density=dens,
                cell=cells)
