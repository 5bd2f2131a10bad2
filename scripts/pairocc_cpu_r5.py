"""CPU oracle for the ROADMAP item-8 (row-pairing) occupancy statistics.

scripts/pairocc_r5.py measures pair occupancy on the real TPU scenes;
this is the backend-independent oracle used when the axon tunnel is
unavailable: settle a scene with the [N] grid engine on CPU and measure
cell/pair occupancy statistics from the binned predicted positions (the
same keys the resident rebin uses).

The 'occ4' scene mirrors models.scene_1m's recipe at 16k (spawn lattice
at the reference rest packing, box sized to the lattice -> settled
occupancy 4, the regime of the 1M/256k/64k-retiled benchmark scenes).

Round-5 result (16k occ4, settle 1100, measure 200 steps):
  - single cell: max 7, P(occ > 6) = 6e-4    (K=8 cells are safe)
  - pair sums (both alignments): P(pair > 8) = 0.17-0.18 PER OCCUPIED
    PAIR PER STEP; per-step max pair 11.8-12.0; frac of steps with all
    pairs <= 8: 0.0
  - occ3_pair_mean 10.6 vs 2 x occ3_row_mean 12.0 (12% scan saving)
-> K=8 shared pair packing ("chained-slot spill") sheds mass at a ~17%
   per-pair rate: dead. K=16 pairs force nt=2 target sub-blocks (row-max
   pair ~12) and a doubled rebin select loop for a 12% candidate-scan
   saving: strictly negative. See ROADMAP item 8 (closed).

Usage: python scripts/pairocc_cpu_r5.py [n] [side] [settle] [measure] [occ4]
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import json
import math
import sys
import time

import jax
import numpy as np

from tpufluid import SimSettings, TickParams, init_state, make_multi_step, make_step
from tpufluid.ops import grid as gridops


def build_settings(n, side, occ4):
    if occ4:
        # scene_1m's recipe scaled down: spawn lattice at rest packing
        # (spacing = h/2), box sized to the lattice -> settled occ 4
        cols = int(round(math.sqrt(n)))
        rows = -(-n // cols)
        return SimSettings(
            particle_count=n, particle_spacing=0.1, smoothing_radius=0.2,
            size=(cols * 0.1 + 0.115, rows * 0.1 + 0.13),
            cell_capacity=8, spawn_columns=cols)
    return SimSettings(particle_count=n, particle_spacing=0.1,
                       smoothing_radius=0.2, size=(side, side),
                       cell_capacity=8)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    side = float(sys.argv[2]) if len(sys.argv) > 2 else 26.0
    settle = int(sys.argv[3]) if len(sys.argv) > 3 else 1100
    measure = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    occ4 = len(sys.argv) > 5 and sys.argv[5] == "occ4"

    s = build_settings(n, side, occ4)
    params = TickParams.default()
    t0 = time.time()
    run = make_multi_step(s, 100, neighbor_mode="grid")
    st = init_state(s)
    for _ in range(settle // 100):
        st = run(st, params)
    jax.block_until_ready(st.position)
    print(f"settled {settle} steps in {time.time() - t0:.1f}s",
          file=sys.stderr)

    step = make_step(s, neighbor_mode="grid")
    gw, gh = s.grid_w, s.grid_h
    NB = 40
    hist_cell = np.zeros(NB, np.int64)
    hists = {0: np.zeros(NB, np.int64), 1: np.zeros(NB, np.int64)}
    maxcell, maxpair = [], {0: [], 1: []}
    occ3_rows, occ3p = [], {0: [], 1: []}
    for _ in range(measure):
        st = step(st, params)
        cells = np.asarray(gridops.cell_id(st.predicted, s))
        occ = np.bincount(cells, minlength=gw * gh).reshape(gh, gw)
        hist_cell += np.bincount(np.clip(occ[occ > 0], 0, NB - 1),
                                 minlength=NB)
        maxcell.append(occ.max())
        rm1 = occ.max(axis=1)
        o3 = np.maximum(np.maximum(np.roll(rm1, 1), rm1), np.roll(rm1, -1))
        occ3_rows.append(o3[rm1 > 0].mean())
        for off in (0, 1):
            m = (gh - off) // 2
            pair = occ[off:off + 2 * m:2] + occ[off + 1:off + 2 * m:2]
            opair = pair[pair > 0]
            hists[off] += np.bincount(np.clip(opair, 0, NB - 1),
                                      minlength=NB)
            maxpair[off].append(pair.max())
            rmp = pair.max(axis=1)
            o3p = np.maximum(np.maximum(np.roll(rmp, 1), rmp),
                             np.roll(rmp, -1))
            occ3p[off].append(o3p[rmp > 0].mean())

    def tail(h):
        tot = max(h[1:].sum(), 1)
        return {"p_gt8": float(h[9:].sum() / tot),
                "p_gt9": float(h[10:].sum() / tot),
                "p_gt10": float(h[11:].sum() / tot),
                "hist_nonzero": {int(i): int(c)
                                 for i, c in enumerate(h) if c}}

    out = dict(
        n=n, settings=dict(size=list(s.size), grid=(gh, gw),
                           spawn_columns=s.spawn_columns),
        settle=settle, measure=measure,
        cell=dict(max=int(np.max(maxcell)),
                  mean_step_max=float(np.mean(maxcell)),
                  tail={f"p_gt{j}": float(hist_cell[j + 1:].sum()
                                          / max(hist_cell[1:].sum(), 1))
                        for j in (4, 5, 6, 8)}),
        occ3_row_mean=float(np.mean(occ3_rows)),
    )
    for off in (0, 1):
        out[f"pair_{off}"] = dict(
            max=int(np.max(maxpair[off])),
            mean_step_max=float(np.mean(maxpair[off])),
            frac_steps_le8=float(np.mean(np.asarray(maxpair[off]) <= 8)),
            occ3p_mean=float(np.mean(occ3p[off])),
            tail=tail(hists[off]))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
