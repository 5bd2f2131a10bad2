"""Unit-pin the roofline issue counter (round-4 VERDICT weak #7): the
"97% of ceiling" claim in BASELINE.md rests on scripts/roofline_r4.py's
jaxpr walk, so count a hand-countable Pallas kernel and assert the
numbers."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "roofline_r4",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "roofline_r4.py"))
roofline = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(roofline)


def _kernel_counts(fn, x, mean_occ3=8.0):
    """Trace fn(x), find its single pallas_call, count the body."""
    jx = jax.make_jaxpr(fn)(x)

    found = []

    def find(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                found.append(eqn.params["jaxpr"])
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else (v,)
                for item in vs:
                    j = getattr(item, "jaxpr", None)
                    if j is not None and hasattr(j, "eqns"):
                        find(j)
                    elif hasattr(item, "eqns"):
                        find(item)

    find(jx.jaxpr)
    assert len(found) == 1
    counts = {"ew": 0.0, "move": 0.0, "scalar": 0.0, "other": {},
              "dyn_trip": max(1.0, mean_occ3 / 8.0),
              "cand_frac": min(1.0, mean_occ3 / 8.0)}
    body = found[0]
    roofline.count_kernel_issues(getattr(body, "jaxpr", body), 1.0, counts)
    return counts


def test_vregs_shapes():
    class A:
        def __init__(self, shape):
            self.shape = shape

    assert roofline._vregs(A(())) == 0          # scalar core
    assert roofline._vregs(A((8, 128))) == 1    # one vreg
    assert roofline._vregs(A((16, 128))) == 2   # two sublane tiles
    assert roofline._vregs(A((8, 256))) == 2    # two lane tiles
    assert roofline._vregs(A((128,))) == 1      # 1-D row
    assert roofline._vregs(A((8, 8, 128))) == 8  # 64 rows


def test_elementwise_chain_counts_exactly():
    """A pure [8, 128] elementwise chain of K ops must count ew == K
    (one vreg each), zero moves."""
    from jax.experimental import pallas as pl

    K = 7

    def kern(x_ref, o_ref):
        v = x_ref[...]
        for _ in range(K - 1):
            v = v * 1.5
        o_ref[...] = v + 1.0  # K-th elementwise op

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    c = _kernel_counts(run, jnp.ones((8, 128), jnp.float32))
    assert c["ew"] == pytest.approx(K)
    assert c["move"] == 2.0  # the ref load (get) + store (swap), 1 vreg each
    assert c["other"] == {}


def test_fori_loop_scales_by_trip_count():
    """Ops inside a static fori_loop (lowered to scan) scale by its
    length: 5 trips x 2 elementwise ops on [8, 256] (2 vregs) = 20."""
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        def body(_, v):
            return (v * 2.0) + 1.0

        o_ref[...] = jax.lax.fori_loop(0, 5, body, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        )(x)

    c = _kernel_counts(run, jnp.ones((8, 256), jnp.float32))
    # scan body: mul + add, each 2 vregs, 5 trips -> ew == 20
    # (the loop carry/index bookkeeping lands in scalar/move, not ew)
    assert c["ew"] == pytest.approx(20.0)


def test_depth1_cond_counts_full_depth2_scales_by_cand_frac():
    """pl.when lowers to cond: depth-1 guards count at 1.0 (whole-row
    guard), nested guards at cand_frac (candidate-slot guard)."""
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)

        @pl.when(x_ref[0, 0] > 0.0)
        def _():
            v = x_ref[...] * 2.0  # depth 1: counts 1 vreg

            @pl.when(x_ref[0, 1] > 0.0)
            def _():
                o_ref[...] = v + x_ref[...] * 3.0  # depth 2: 2 ew ops

            o_ref[...] = v

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    full = _kernel_counts(run, jnp.ones((8, 128), jnp.float32),
                          mean_occ3=8.0)
    half = _kernel_counts(run, jnp.ones((8, 128), jnp.float32),
                          mean_occ3=4.0)
    # depth-1 contributes 1 ew either way; depth-2 contributes 2*frac
    assert full["ew"] - half["ew"] == pytest.approx(2 * (1.0 - 0.5))
