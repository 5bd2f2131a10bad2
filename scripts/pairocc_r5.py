"""Measure supercell (vertical row-pair) occupancy on settled scenes.

ROADMAP item 8 (K=4 row-pairing with chained-slot spill) proposes packing
two y-adjacent grid rows into one 8-sublane tile. With arrival-order
shared packing, "spill to a neighbor's free sublane within the pair-tile"
is automatic: the PAIR has 8 shared slots, so the design survives exactly
when the per-(pair, column) occupancy SUM stays <= 8. At rest occupancy 4
the bulk mean is 8 — zero slack — so viability is an empirical question
about the fluctuation statistics of a settled (near-incompressible) SPH
fluid. This script answers it:

  per scene (64k / 256k / 1M), after settling, over T measured steps:
    - per-step MAX single-cell occupancy  (the known 5-6 transient)
    - per-step MAX pair-sum occupancy, both pairing alignments
    - fraction of steps whose max pair-sum <= 8 (K=8-pair viable rate)
    - histogram of pair sums over occupied pairs (tail mass at 9+)
    - mean occ3-pair (max over 3 pair-rows x all columns) — the scan
      bound a K=16 paired kernel would pay, vs the current occ3

CAVEAT: occupancy here is read from the resident slot grid, so it
SATURATES at cell_capacity (K=8 on the bench scenes) — a cell reading 8
may want more. The zero-loss soak bounds the true max at <= 8 for the
1M scene; scripts/pairocc_cpu_r5.py measures uncapped occupancy from
raw positions and is the oracle for tail shapes near K.

Round-5 result (real settled 1M scene, TPU): P(pair > 8) = 0.151/0.154
per occupied pair per step (alignments A/B), per-step max pair 12-13,
frac_steps_le8 = 0.0, occ3_pair_mean 11.1 vs occ3_row_mean 6.34 -> see
ROADMAP item 8 (closed).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/pairocc_r5.py
       [--scenes 64k,256k,1m] [--settle 1200] [--measure 200]
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpufluid.models import scenes as sc
from tpufluid.ops import resident
from tpufluid.ops.pallas.fused import SENTINEL_HALF

NBINS = 20  # pair sums clipped into [0, 19]


def pair_stats_fn(settings):
    step = resident.make_grid_step(settings)

    def one(gs, params):
        gs = step(gs, params)
        occ = jnp.sum((gs.pos_x < SENTINEL_HALF).astype(jnp.int32), axis=1)
        gy = occ.shape[0]
        max_cell = jnp.max(occ)
        outs = [max_cell]
        hists = []
        occ3p_means = []
        for off in (0, 1):
            m = (gy - off) // 2
            pair = occ[off:off + 2 * m:2] + occ[off + 1:off + 2 * m:2]
            outs.append(jnp.max(pair))
            # occupied-pair histogram
            c = jnp.clip(pair, 0, NBINS - 1)
            hist = jnp.sum(
                jax.nn.one_hot(c.reshape(-1), NBINS, dtype=jnp.int32),
                axis=0)
            hists.append(hist)
            # occ3-pair: per pair-row max over x, then 3-row window max,
            # mean over occupied pair-rows — the K=16 kernel's scan bound
            rowmax = jnp.max(pair, axis=1)
            lo = jnp.concatenate([rowmax[:1] * 0, rowmax[:-1]])
            hi = jnp.concatenate([rowmax[1:], rowmax[:1] * 0])
            occ3p = jnp.maximum(jnp.maximum(lo, rowmax), hi)
            occd = rowmax > 0
            occ3p_means.append(
                jnp.sum(jnp.where(occd, occ3p, 0).astype(jnp.float32))
                / jnp.maximum(jnp.sum(occd.astype(jnp.float32)), 1.0))
        # current engine's bound for comparison: occ3 over single rows
        rowmax1 = jnp.max(occ, axis=1)
        lo = jnp.concatenate([rowmax1[:1] * 0, rowmax1[:-1]])
        hi = jnp.concatenate([rowmax1[1:], rowmax1[:1] * 0])
        occ3 = jnp.maximum(jnp.maximum(lo, rowmax1), hi)
        occd = rowmax1 > 0
        occ3_mean = (jnp.sum(jnp.where(occd, occ3, 0).astype(jnp.float32))
                     / jnp.maximum(jnp.sum(occd.astype(jnp.float32)), 1.0))
        return gs, (outs[0], outs[1], outs[2], hists[0], hists[1],
                    occ3p_means[0], occ3p_means[1], occ3_mean)

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def measure(gs, params, n):
        def body(gs, _):
            return one(gs, params)

        return jax.lax.scan(body, gs, None, length=n)

    return measure


def run_scene(name, scene, settle, measure_steps, out):
    settings = scene.settings
    gs = resident.init_grid_state(settings)
    burst = 200
    run = resident.make_grid_multi_step(settings, burst)
    for _ in range(settle // burst):
        gs = run(gs, scene.params)
    jax.block_until_ready(gs.pos_x)
    measure = pair_stats_fn(settings)
    gs, (mc, mpa, mpb, ha, hb, o3a, o3b, o3) = measure(
        gs, scene.params, measure_steps)
    jax.block_until_ready(mc)
    mc, mpa, mpb = np.asarray(mc), np.asarray(mpa), np.asarray(mpb)
    ha = np.asarray(ha).sum(axis=0)
    hb = np.asarray(hb).sum(axis=0)

    def tail(h):
        occ_pairs = h[1:].sum()
        return {
            "p_gt8": float(h[9:].sum() / max(occ_pairs, 1)),
            "p_gt9": float(h[10:].sum() / max(occ_pairs, 1)),
            "hist": [int(x) for x in h],
        }

    rec = dict(
        scene=name, settle=settle, steps=measure_steps,
        max_cell_occ=dict(mean=float(mc.mean()), max=int(mc.max()),
                          min=int(mc.min())),
        max_pair_A=dict(mean=float(mpa.mean()), max=int(mpa.max()),
                        min=int(mpa.min()),
                        frac_steps_le8=float((mpa <= 8).mean())),
        max_pair_B=dict(mean=float(mpb.mean()), max=int(mpb.max()),
                        min=int(mpb.min()),
                        frac_steps_le8=float((mpb <= 8).mean())),
        pair_hist_A=tail(ha), pair_hist_B=tail(hb),
        occ3_pair_mean_A=float(np.asarray(o3a).mean()),
        occ3_pair_mean_B=float(np.asarray(o3b).mean()),
        occ3_row_mean=float(np.asarray(o3).mean()),
    )
    print(json.dumps(rec), file=out, flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="64k,256k,1m")
    ap.add_argument("--settle", type=int, default=1200)
    ap.add_argument("--measure", type=int, default=200)
    args = ap.parse_args()
    builders = {"64k": sc.scene_64k, "256k": sc.scene_256k,
                "1m": sc.scene_1m, "4k": sc.dam_break_4k}
    for name in args.scenes.split(","):
        run_scene(name, builders[name](), args.settle, args.measure,
                  sys.stdout)


if __name__ == "__main__":
    main()
