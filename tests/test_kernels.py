"""Unit tests: SPH kernels, EOS, PRNG (SURVEY.md section 4, point 2)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpufluid.ops import kernels, prng
from tpufluid.params import PI, KernelNorms


H = 0.2


def test_poly6_at_zero():
    # W(0) = 4/(pi h^8) * h^6 = 4/(pi h^2)
    expected = 4.0 / (math.pi * H**2)
    got = kernels.poly6(jnp.float32(H), jnp.float32(0.0))
    assert np.isclose(float(got), expected, rtol=1e-5)


def test_poly6_cutoff_and_positivity():
    r2 = jnp.linspace(0.0, 2 * H * H, 64, dtype=jnp.float32)
    w = kernels.poly6(jnp.float32(H), r2)
    assert np.all(np.asarray(w[r2 > H * H]) == 0.0)
    assert np.all(np.asarray(w[r2 <= H * H]) >= 0.0)
    # monotone decreasing in r2
    inside = np.asarray(w[r2 <= H * H])
    assert np.all(np.diff(inside) <= 0.0)


def test_poly6_integrates_to_one_2d():
    # The 2D poly6 with volume norm 4/(pi h^8) integrates to 1 over the disk.
    n = 2001
    xs = np.linspace(-H, H, n, dtype=np.float64)
    dx = xs[1] - xs[0]
    X, Y = np.meshgrid(xs, xs)
    r2 = (X**2 + Y**2).astype(np.float32)
    w = np.asarray(kernels.poly6(jnp.float32(H), jnp.asarray(r2)))
    integral = w.sum() * dx * dx
    assert np.isclose(integral, 1.0, rtol=1e-3)


def test_spiky_derivative_values():
    norm = 12.0 / (math.pi * H**4)
    r = jnp.float32(0.05)
    got = kernels.spiky_derivative(jnp.float32(H), r, jnp.float32(norm))
    assert np.isclose(float(got), -(H - 0.05) * norm, rtol=1e-6)
    assert float(kernels.spiky_derivative(jnp.float32(H), jnp.float32(0.3), jnp.float32(norm))) == 0.0


def test_viscosity_kernel_special_cases():
    norm = 15.0 / (2 * math.pi * H**3)
    # r = 0 returns the constant exactly
    got0 = kernels.viscosity(jnp.float32(H), jnp.float32(0.0), jnp.float32(norm))
    assert float(got0) == np.float32(norm)
    # r = h evaluates the polynomial: -1/2 + 1 + 1/2 - 1 = 0
    goth = kernels.viscosity(jnp.float32(H), jnp.float32(H), jnp.float32(norm))
    assert abs(float(goth)) < 1e-4 * norm
    # beyond h: zero
    assert float(kernels.viscosity(jnp.float32(H), jnp.float32(1.5 * H), jnp.float32(norm))) == 0.0
    # interior value hand-check at r = h/2: -1/16 + 1/4 + 1 - 1 = 3/16
    gothalf = kernels.viscosity(jnp.float32(H), jnp.float32(H / 2), jnp.float32(norm))
    assert np.isclose(float(gothalf), norm * (3.0 / 16.0), rtol=1e-5)


def test_poly6_gradient_zero_cases():
    g = kernels.poly6_gradient(jnp.float32(H), jnp.zeros((2,), jnp.float32))
    assert np.all(np.asarray(g) == 0.0)
    g2 = kernels.poly6_gradient(jnp.float32(H), jnp.asarray([1.5 * H, 0.0], jnp.float32))
    assert np.all(np.asarray(g2) == 0.0)
    # points opposite to r (toward lower density... sign: constant negative)
    g3 = np.asarray(
        kernels.poly6_gradient(jnp.float32(H), jnp.asarray([0.1, 0.0], jnp.float32))
    )
    assert g3[0] < 0.0 and g3[1] == 0.0


def test_eos():
    p = kernels.pressure_eos(jnp.float32(3.0), jnp.float32(50.0), jnp.float32(1.0))
    assert float(p) == 100.0


def test_kernel_norms_match_reference_formulas():
    n = KernelNorms.from_radius(H)
    assert np.isclose(n.poly6_volume, 4.0 / (PI * H**8))
    assert np.isclose(n.poly6_gradient, 24.0 / (PI * H**8))
    assert np.isclose(n.poly6_laplacian, 8.0 / (PI * H**8))
    assert np.isclose(n.spiky_derivative, 12.0 / (PI * H**4))
    assert np.isclose(n.viscosity, 15.0 / (2.0 * PI * H**3))


def _xorshift32_py(x):
    x &= 0xFFFFFFFF
    x ^= (x << 13) & 0xFFFFFFFF
    x ^= x >> 17
    x ^= (x << 5) & 0xFFFFFFFF
    return x & 0xFFFFFFFF


def test_xorshift32_matches_scalar_reference():
    seeds = np.array([1, 2, 12345, 0xDEADBEEF, 4294967295], dtype=np.uint32)
    got = np.asarray(prng.xorshift32(jnp.asarray(seeds)))
    expected = np.array([_xorshift32_py(int(s)) for s in seeds], dtype=np.uint32)
    np.testing.assert_array_equal(got, expected)


def test_uniform01_range_and_value():
    xs = prng.xorshift32(jnp.arange(1, 1000, dtype=jnp.uint32))
    u = np.asarray(prng.u32_to_uniform01(xs))
    assert np.all((u >= 0.0) & (u < 1.0))
    assert float(prng.u32_to_uniform01(jnp.uint32(2147483648))) == 0.5


def test_rand_unit_vector_is_unit():
    v = np.asarray(prng.rand_unit_vector(jnp.arange(1, 64, dtype=jnp.uint32)))
    norms = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
