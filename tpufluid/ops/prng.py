"""Xorshift32 PRNG, vectorized.

Replicates the reference's symmetry-breaking tie-break PRNG
(``funcs.wgsl:129-149``): when two particles coincide exactly, the pressure
force direction is a random unit vector drawn from an xorshift32 chain
seeded with ``particle_index * 12 + frame_time * 69``
(``compute.wgsl:161,211-215``).
"""

from __future__ import annotations

import jax.numpy as jnp


def xorshift32(x):
    """One xorshift32 step on uint32 arrays."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x << jnp.uint32(13))
    x = x ^ (x >> jnp.uint32(17))
    x = x ^ (x << jnp.uint32(5))
    return x


def u32_to_uniform01(x):
    """u32 -> float in [0, 1) by dividing by 2^32 (funcs.wgsl:139-142)."""
    return x.astype(jnp.float32) / jnp.float32(4294967296.0)


def position_seed(points):
    """Shard-invariant PRNG seed from position bits.

    The reference seeds its tie-break chain with the post-sort array index
    (compute.wgsl:161) — an accident of buffer layout that would make
    results depend on how particles are distributed across devices. We hash
    the position bits instead, so the same physical configuration draws the
    same tie-breaks on 1 chip or 8. points: f32[..., 2] -> uint32[...].
    """
    import jax
    bits = jax.lax.bitcast_convert_type(points, jnp.uint32)
    return (bits[..., 0] * jnp.uint32(0x9E3779B1)) ^ (
        bits[..., 1] * jnp.uint32(0x85EBCA6B)
    )


def rand_unit_vector(seed):
    """First two draws of the chain -> normalized 2D direction.

    Matches the reference's ``normalize(vec2(rand, rand))`` for the first
    coincident neighbor of a particle (compute.wgsl:212).
    ``seed``: uint32 array of shape [...]; returns [... , 2].
    """
    s1 = xorshift32(seed)
    s2 = xorshift32(s1)
    v = jnp.stack([u32_to_uniform01(s1), u32_to_uniform01(s2)], axis=-1)
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe = jnp.where(norm == 0.0, 1.0, norm)
    return v / safe
