"""Quantitative roofline for the 1M resident step (round-4 VERDICT #1).

Replaces prose "floor" claims with arithmetic, three measurements deep:

1. **Machine ceilings, measured on THIS chip** (not datasheet numbers):
   - VPU: a synthetic Pallas kernel issuing a long chain of independent
     [8, 128] f32 multiply-adds from VMEM, timed over a lax.scan burst
     -> sustained vector issues/second. (v5e datasheet-equivalent:
     8x128 lanes x ~4 ALU ports x ~0.94 GHz ~= 3.8e9 issues/s.)
   - HBM: a Pallas grid copy kernel over a 1M-scene-sized buffer ->
     sustained bytes/second.

2. **The step's demand, counted from the kernels** (not estimated):
   walk the jaxpr of one resident step, find every pallas_call, and for
   each inner-kernel equation count vector issues: an elementwise op on
   an [s, g]-shaped f32 aval costs ceil(s/8)*ceil(g/128) issues (one per
   vreg); transcendentals (rsqrt) count 1 (v5e pipelines them — measured
   round 3: replacing rsqrt with a mul was SLOWER). Equations inside
   fori_loops scale by the loop trip count; occupancy-bounded dynamic
   trips use the MEASURED mean occupancy of the settled 1M scene
   (reported alongside). DMA bytes = sum of pallas_call operand +
   result sizes.

3. **The verdict**: demand / ceiling per resource = the floor;
   floor vs measured wall time = efficiency. The binding resource and
   the % of its ceiling the step sustains are printed.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/roofline_r4.py
       [--scene 1m] [--settle 200]
"""

import argparse
import functools
import json
import math
import time

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------- ceilings

def measure_vpu_peak(iters=4):
    """Sustained f32 vector issues/s: DEP-FREE fma chains on 8 vregs.

    8 independent accumulator chains of alternating mul/add keep every
    ALU port fed without a serial dependency wall; 512 unrolled ops per
    fori iteration, 2048 iterations, [8, 128] operands resident in VMEM.
    """
    from jax.experimental import pallas as pl

    UNROLL = 512
    LOOPS = 2048
    NCHAIN = 8

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = [x * (1.0 + 1e-6 * c) for c in range(NCHAIN)]

        def body(_, accs):
            accs = list(accs)
            for i in range(UNROLL // NCHAIN):
                for c in range(NCHAIN):
                    if (i + c) % 2 == 0:
                        accs[c] = accs[c] * x
                    else:
                        accs[c] = accs[c] + x
            return tuple(accs)

        acc = lax.fori_loop(0, LOOPS, body, tuple(acc))
        out = acc[0]
        for c in range(1, NCHAIN):
            out = out + acc[c]
        o_ref[...] = out

    x = jnp.full((8, 128), 1.0000001, jnp.float32)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))

    @jax.jit
    def burst(x):
        def body(c, _):
            return call(c * 0.0 + 1.0000001), 0
        y, _ = lax.scan(body, x, None, length=8)
        return y

    y = burst(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = burst(y)
    float(jnp.max(y))
    dt = (time.perf_counter() - t0) / iters
    # NCHAIN-way sum epilogue + scan glue are noise next to 8x512x2048
    issues = 8 * (UNROLL * LOOPS + NCHAIN)
    return issues / dt


def measure_hbm_peak(iters=8, mb=192):
    """Sustained HBM read+write bytes/s via a big on-device f32 copy-add
    (reads + writes each element once; XLA fuses to a stream)."""
    n = mb * 1024 * 1024 // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def burst(x):
        def body(c, _):
            return c + 1.0, 0
        y, _ = lax.scan(body, x, None, length=4)
        return y

    y = burst(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = burst(y)
    float(jnp.max(y[:1]))
    dt = (time.perf_counter() - t0) / iters
    return 4 * 2 * (n * 4) / dt  # 4 scan steps x (read + write)


# ------------------------------------------------------------- op counting

# elementwise primitives that occupy one VPU issue per vreg
_EW = {
    "add", "sub", "mul", "div", "max", "min", "neg", "abs", "sign",
    "floor", "ceil", "round", "select_n", "and", "or", "xor", "not",
    "lt", "le", "gt", "ge", "eq", "ne", "convert_element_type",
    "integer_pow", "shift_right_logical", "shift_left", "rem",
    "exp", "log", "rsqrt", "sqrt", "tanh", "logistic",
    "bitcast_convert_type", "bitcast", "is_finite", "square", "sin",
    "cos", "reduce_sum", "reduce_max", "reduce_min", "reduce_and",
    "reduce_or", "clamp", "pow", "atan2", "erf_inv", "nextafter",
}
# structural / free-ish (lowered to lane permutes or address math);
# counted separately at one issue per vreg so the split is visible
_MOVE = {"broadcast_in_dim", "reshape", "slice", "dynamic_slice",
         "dynamic_update_slice", "concatenate", "iota", "rev",
         "transpose", "pad", "gather", "scatter", "scatter-add"}
_PALLAS_MOVE = {"roll", "get", "swap", "masked_load", "masked_swap"}


def _vregs(aval):
    shape = getattr(aval, "shape", ())
    if not shape:
        return 0  # scalar-core op
    if len(shape) == 1:
        return math.ceil(shape[0] / 128)
    rows = 1
    for d in shape[:-1]:
        rows *= d
    return math.ceil(rows / 8) * math.ceil(shape[-1] / 128) * max(
        1, math.ceil(rows / max(rows, 1)))


def count_kernel_issues(jaxpr, trip=1.0, counts=None, cond_depth=0):
    """Walk a (pallas kernel body) jaxpr; return issue counts scaled by
    enclosing loop trip counts.

    ``pl.when`` guards lower to ``cond``. The kernels use two guard
    levels: an outer whole-row guard (occ > 0 — true on every occupied
    row, frac ~1 on settled scenes) and inner per-candidate-slot guards
    (slot < occ3 — true for occ3 of the 8 padded slots). Depth-1 conds
    therefore count at 1.0 and deeper conds at counts["cand_frac"]
    (mean occ3 / 8, measured from the settled grid). Dynamic while
    trips (occupancy sub-block loops; only reached at K > 8) scale by
    counts["dyn_trip"]."""
    if counts is None:
        counts = {"ew": 0.0, "move": 0.0, "scalar": 0.0, "other": {}}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        sub = None
        n_trip = trip
        if name == "while":
            sub = eqn.params["body_jaxpr"].jaxpr
            n_trip = trip * counts.get("dyn_trip", 1.0)
        elif name == "scan":
            sub = eqn.params["jaxpr"].jaxpr
            n_trip = trip * eqn.params.get("length", 1)
        elif name == "cond":
            frac = 1.0 if cond_depth == 0 else counts.get("cand_frac", 1.0)
            for b in eqn.params["branches"][1:]:  # taken branch(es)
                count_kernel_issues(b.jaxpr, trip * frac, counts,
                                    cond_depth + 1)
            continue
        elif name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                      "custom_vjp_call", "remat", "custom_primitive_call"):
            p = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            sub = getattr(p, "jaxpr", p)
        if sub is not None:
            count_kernel_issues(sub, n_trip, counts, cond_depth)
            continue
        outv = eqn.outvars[0] if eqn.outvars else None
        aval = getattr(outv, "aval", None)
        v = _vregs(aval) if aval is not None else 0
        if v == 0:
            counts["scalar"] += trip
            continue
        if name in _EW:
            counts["ew"] += trip * v
        elif name in _MOVE or name in _PALLAS_MOVE:
            counts["move"] += trip * v
        else:
            counts["other"][name] = counts["other"].get(name, 0) + trip * v
    return counts


def analyze_step(settings, params, mean_occ3):
    """Count per-step issues + DMA bytes across the step's pallas_calls.

    ``mean_occ3``: mean over occupied rows of the 3-row-window packed
    occupancy max — the bound the kernels' candidate guards actually
    use (fused.py: kpg < occ3), so cand_frac = mean_occ3 / 8."""
    from tpufluid.ops import resident

    step = resident.make_grid_step(settings)
    gs = resident.init_grid_state(settings)
    jx = jax.make_jaxpr(step)(gs, params)

    per_kernel = []

    def find_pallas(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                body = eqn.params["jaxpr"]
                grid_mapping = eqn.params.get("grid_mapping")
                grid = getattr(grid_mapping, "grid", ())
                n_prog = 1
                for g in grid:
                    try:
                        n_prog *= int(g)
                    except TypeError:
                        pass  # DynamicGridDim
                dma = 0
                for var in list(eqn.invars) + list(eqn.outvars):
                    aval = getattr(var, "aval", None)
                    if aval is not None and hasattr(aval, "shape"):
                        sz = 1
                        for d in aval.shape:
                            sz *= d
                        dma += sz * jnp.dtype(aval.dtype).itemsize
                counts = {"ew": 0.0, "move": 0.0, "scalar": 0.0,
                          "other": {},
                          "dyn_trip": max(1.0, mean_occ3 / 8.0),
                          "cand_frac": min(1.0, mean_occ3 / 8.0)}
                count_kernel_issues(getattr(body, "jaxpr", body),
                                    1.0, counts)
                per_kernel.append(dict(
                    programs=n_prog, dma_bytes=int(dma),
                    ew_per_prog=counts["ew"], move_per_prog=counts["move"],
                    scalar_per_prog=counts["scalar"],
                    other=counts["other"]))
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else (v,)
                for item in vs:
                    j = getattr(item, "jaxpr", None)
                    if j is not None and hasattr(j, "eqns"):
                        find_pallas(j)
                    elif hasattr(item, "eqns"):
                        find_pallas(item)

    find_pallas(jx.jaxpr)
    return per_kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="1m")
    ap.add_argument("--settle", type=int, default=200)
    ap.add_argument("--burst", type=int, default=60)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from tpufluid import models
    from tpufluid.ops import resident

    scene = {"1m": models.scene_1m, "64k": models.scene_64k,
             "256k": models.scene_256k, "4k": models.dam_break_4k}[
        args.scene]()
    s = resident.pad_capacity(scene.settings)

    print("measuring VPU peak...", flush=True)
    vpu = measure_vpu_peak()
    print(f"  {vpu/1e9:.2f}e9 vector issues/s", flush=True)
    print("measuring HBM peak...", flush=True)
    hbm = measure_hbm_peak()
    print(f"  {hbm/1e9:.0f} GB/s (read+write)", flush=True)

    # settled state -> measured occupancy + wall time
    gs = resident.init_grid_state(s)
    if args.settle:
        settle = resident.make_grid_multi_step(s, args.settle)
        gs = settle(gs, scene.params)
    import numpy as np
    occ = np.asarray(gs.occ_row)
    occ_rows = int((occ > 0).sum())
    # mean occupancy over OCCUPIED cells: count live slots via pos
    live = int((jnp.asarray(gs.pos_x) < 1e9).sum())
    cells_occ = int(
        ((jnp.asarray(gs.pos_x) < 1e9).any(axis=1)).sum())
    mean_occ = live / max(cells_occ, 1)
    # candidate-scan bound per row: 3-row window max of the packed
    # per-row occupancy (what the kernels' kpg < occ3 guards see)
    occ_pad = np.pad(occ, 1)
    occ3 = np.maximum(np.maximum(occ_pad[:-2], occ_pad[1:-1]), occ_pad[2:])
    mean_occ3 = float(occ3[occ > 0].mean()) if occ_rows else 0.0

    run = resident.make_grid_multi_step(s, args.burst)
    g2 = run(gs, scene.params)
    float(jnp.max(g2.pos_x))
    t0 = time.perf_counter()
    out = gs
    for _ in range(args.iters):
        out = run(out, scene.params)
    float(jnp.max(out.pos_x))
    ms = (time.perf_counter() - t0) / args.iters / args.burst * 1e3

    kernels = analyze_step(s, scene.params, mean_occ3)
    tot_ew = sum(k["ew_per_prog"] * k["programs"] for k in kernels)
    tot_move = sum(k["move_per_prog"] * k["programs"] for k in kernels)
    tot_dma = sum(k["dma_bytes"] for k in kernels)
    t_vpu_ms = (tot_ew + tot_move) / vpu * 1e3
    t_hbm_ms = tot_dma / (hbm / 2) * 1e3  # one-way traffic vs rw-stream

    n = s.particle_count
    result = dict(
        scene=scene.name, backend=jax.default_backend(),
        measured_ms_per_step=round(ms, 4),
        particle_steps_per_sec=round(n / (ms * 1e-3), 0),
        mean_occupancy=round(mean_occ, 3),
        mean_occ3=round(mean_occ3, 3), occupied_rows=occ_rows,
        vpu_peak_issues_per_s=round(vpu, 0),
        hbm_peak_rw_Bps=round(hbm, 0),
        counted_vector_issues_per_step=round(tot_ew + tot_move, 0),
        counted_ew_issues=round(tot_ew, 0),
        counted_move_issues=round(tot_move, 0),
        dma_bytes_per_step=tot_dma,
        vpu_floor_ms=round(t_vpu_ms, 4),
        hbm_floor_ms=round(t_hbm_ms, 4),
        binding_resource="vpu" if t_vpu_ms > t_hbm_ms else "hbm",
        vpu_efficiency=round(t_vpu_ms / ms, 4),
        per_kernel=kernels,
    )
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
