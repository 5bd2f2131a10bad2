"""Pair-level SPH physics, shape-generic over the neighbor axis.

Each reduction takes self fields of shape [...] and neighbor fields of shape
[..., K] (K = any candidate axis: a fixed grid window or all N particles for
the all-pairs oracle) plus a validity mask, and reduces over K.

Invariant: every masked-out or out-of-range candidate contributes exactly
+0.0 (division-safe operands everywhere), so the grid-windowed and all-pairs
reductions produce bitwise-identical f32 sums when iterated in the same
order. tests/test_step_parity.py relies on this.

Physics matches compute.wgsl:
  density          calculate_density_at_point   funcs.wgsl:157-203
  pressure force   calculate_pressure_force     compute.wgsl:160-235
  viscosity force  calculate_viscosity_force    compute.wgsl:238-299
  surface tension  calculate_surface_tension    compute.wgsl:303-498
                   (disabled by default — its call site is commented out in
                   the reference, compute.wgsl:92)
"""

from __future__ import annotations

import jax.numpy as jnp

from . import kernels
from .prng import rand_unit_vector


def _pair_geometry(point, nb_pos, valid, sqr_radius):
    """offset, r2, dst, in-range mask. point [...,2], nb_pos [...,K,2]."""
    offset = nb_pos - point[..., None, :]
    r2 = jnp.sum(offset * offset, axis=-1)
    in_range = valid & (r2 <= sqr_radius)
    dst = jnp.sqrt(r2)
    return offset, r2, dst, in_range


def density(point, nb_pos, valid, mass, h):
    """Sum of m * poly6(h, r^2) over candidates (self included, no cutoff:
    poly6 itself vanishes beyond h — funcs.wgsl:157-203)."""
    offset = nb_pos - point[..., None, :]
    r2 = jnp.sum(offset * offset, axis=-1)
    w = kernels.poly6(h, r2)
    return jnp.sum(jnp.where(valid, mass * w, 0.0), axis=-1)


def pressure_force(
    self_idx, point, self_density, nb_idx, nb_pos, nb_density, valid,
    pressure_constant, rest_density, h, sqr_radius, spiky_norm, rand_seed,
):
    """Symmetrized pressure force (compute.wgsl:160-235).

    dir * spiky'(h, r) * (p_i + p_j)/2 / rho_j, with a random unit direction
    for exactly-coincident pairs. ``rand_seed``: uint32 [...] per-particle
    chain seed (sorted_index*12 + frame*69, compute.wgsl:161).
    """
    offset, r2, dst, in_range = _pair_geometry(point, nb_pos, valid, sqr_radius)
    not_self = nb_idx != self_idx[..., None]
    active = in_range & not_self

    safe_dst = jnp.where(dst == 0.0, 1.0, dst)
    dir_to_nb = offset / safe_dst[..., None]

    # Coincident pairs (the spawn lattice genuinely contains duplicates —
    # src/simulation.rs:151-154 mixes `i % int(per_row)` with the float
    # per_row, so every ~per_row-th particle lands on an earlier one):
    # random unit dir. Deviations from the WGSL (documented): the seed is a
    # position hash rather than the post-sort array index (shard-invariant;
    # see prng.position_seed), each pair member salts by the pair ORDER
    # (i<j vs i>j) so both duplicates separate rather than co-move, and
    # multiple coincidences salt by draw ordinal CLAMPED AT 1 instead of
    # threading one mutable chain through the loop (the clamp lets the
    # Pallas kernels precompute a 4-entry direction table; a 3rd+ particle
    # stacked at the exact same position reuses ordinal 1's direction).
    coincident = active & (dst == 0.0)
    flat = coincident.reshape(coincident.shape[:point.ndim - 1] + (-1,))
    order = (jnp.cumsum(flat.astype(jnp.uint32), axis=-1) - flat.astype(jnp.uint32))
    order = jnp.minimum(order.reshape(coincident.shape), jnp.uint32(1))
    seed = rand_seed[..., None].astype(jnp.uint32)
    eff_seed = seed + order * jnp.uint32(2654435761)
    eff_seed = eff_seed + jnp.where(
        nb_idx < self_idx[..., None], jnp.uint32(0x27220A95), jnp.uint32(0)
    )
    rand_dir = rand_unit_vector(eff_seed)
    dir_to_nb = jnp.where(coincident[..., None], rand_dir, dir_to_nb)

    p_self = kernels.pressure_eos(self_density, pressure_constant, rest_density)
    p_nb = kernels.pressure_eos(nb_density, pressure_constant, rest_density)
    shared_pressure = (p_self[..., None] + p_nb) * 0.5
    kern = kernels.spiky_derivative(h, dst, spiky_norm)
    safe_rho = jnp.where(nb_density == 0.0, 1.0, nb_density)
    contrib = dir_to_nb * (kern * shared_pressure / safe_rho)[..., None]
    return jnp.sum(jnp.where(active[..., None], contrib, 0.0), axis=-2)


def viscosity_force(
    self_idx, point, self_velocity, nb_idx, nb_pos, nb_velocity, nb_density,
    valid, viscosity_coefficient, h, sqr_radius, visc_norm,
):
    """(v_j - v_i)/rho_j * W_visc, summed, * mu (compute.wgsl:238-299)."""
    _, r2, dst, in_range = _pair_geometry(point, nb_pos, valid, sqr_radius)
    active = in_range & (nb_idx != self_idx[..., None])
    kern = kernels.viscosity(h, dst, visc_norm)
    safe_rho = jnp.where(nb_density == 0.0, 1.0, nb_density)
    dv = nb_velocity - self_velocity[..., None, :]
    contrib = dv * (kern / safe_rho)[..., None]
    total = jnp.sum(jnp.where(active[..., None], contrib, 0.0), axis=-2)
    return total * viscosity_coefficient


def color_field_gradient(
    point, nb_pos, nb_density, valid, mass, h, sqr_radius, rand_seed,
):
    """Sum m/rho_j * poly6_grad(h, dir-hat) (compute.wgsl:405-498).

    Note the reference passes the *normalized* direction to the gradient
    kernel (a quirk we replicate: the kernel then sees |r| = 1).
    """
    offset, r2, dst, in_range = _pair_geometry(point, nb_pos, valid, sqr_radius)
    safe_dst = jnp.where(dst == 0.0, 1.0, dst)
    dir_to_nb = offset / safe_dst[..., None]
    coincident = in_range & (dst == 0.0)
    seed = rand_seed[..., None].astype(jnp.uint32)
    rand_dir = rand_unit_vector(seed)
    dir_to_nb = jnp.where(coincident[..., None], rand_dir, dir_to_nb)
    kern = kernels.poly6_gradient(h, dir_to_nb)
    safe_rho = jnp.where(nb_density == 0.0, 1.0, nb_density)
    contrib = kern * (mass / safe_rho)[..., None]
    return jnp.sum(jnp.where(in_range[..., None], contrib, 0.0), axis=-2)


def color_field_laplacian(point, nb_pos, nb_density, valid, mass, h, sqr_radius):
    """Sum m/rho_j * poly6_laplacian(h, r) (compute.wgsl:319-401)."""
    _, r2, dst, in_range = _pair_geometry(point, nb_pos, valid, sqr_radius)
    kern = kernels.poly6_laplacian(h, dst)
    safe_rho = jnp.where(nb_density == 0.0, 1.0, nb_density)
    contrib = mass / safe_rho * kern
    return jnp.sum(jnp.where(in_range, contrib, 0.0), axis=-1)


def surface_tension(
    point, nb_pos, nb_density, valid, mass, h, sqr_radius,
    threshold, coefficient, rand_seed,
):
    """Color-field surface tension (compute.wgsl:303-315), optional path."""
    n = color_field_gradient(
        point, nb_pos, nb_density, valid, mass, h, sqr_radius, rand_seed
    )
    n_len = jnp.linalg.norm(n, axis=-1)
    lap = color_field_laplacian(point, nb_pos, nb_density, valid, mass, h, sqr_radius)
    safe_len = jnp.where(n_len == 0.0, 1.0, n_len)
    k = (-lap) / (n_len + 1e-6)
    f = -coefficient * k[..., None] * (n / safe_len[..., None])
    return jnp.where((n_len > threshold)[..., None], f, 0.0)
