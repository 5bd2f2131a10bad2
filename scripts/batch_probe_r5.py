"""Instrument the batched-worlds config (BASELINE config 4b) per step.

Round-5 evidence behind the BASELINE ladder footnotes:
  - the far-mover fallback NEVER fires in this config (far_n = 0 at
    every probed step, so its lax.cond costs nothing);
  - the 13-15 counted drops at K=8 all land in the gravity-compression
    transient (lost-counter increments at steps 28-41 from spawn, when
    the heavier worlds' columns first reach the floor) and stop in
    steady state;
  - per-world occupancy (occ3 ~6.0-6.26, 66 occupied rows each)
    explains only ~5% of the batched-vs-single gap.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/batch_probe_r5.py [--steps 60] [--k 8]
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpufluid import SimSettings
    from tpufluid.params import TickParams
    from tpufluid.ops import resident as res
    from tpufluid.ops.pallas import fused

    B = 8
    s = SimSettings(particle_count=131072, particle_spacing=0.1,
                    smoothing_radius=0.2, size=(101.95, 13.1),
                    cell_capacity=args.k, spawn_columns=1008)
    plist = [TickParams.default(gravity=(0.0, -g),
                                viscosity_coefficient=v)
             for g, v in zip(np.linspace(0.0, 2.0, B),
                             np.linspace(5.0, 40.0, B))]
    bp = res.batched_params(plist)
    gs = res.init_batched_grid_state(s, B)
    step = res.make_grid_step(s, n_worlds=B)
    settings = res.pad_capacity(s)
    gy_p = res._rows(settings)
    wid = jnp.repeat(jnp.arange(B, dtype=jnp.int32), gy_p)
    row_shift = -(wid * gy_p)

    @jax.jit
    def probe(gs, params):
        out = fused.rebin(
            gs.pos_x, gs.pos_y, gs.vel_x, gs.vel_y, gs.occ_row,
            params.delta, settings, row_shift=row_shift,
            rows_per_program=res.rows_per_program(settings))
        return jnp.sum(out[5]), jnp.sum(out[6])

    far_steps, over_steps, lost_events = [], [], []
    prev = int(gs.lost)
    for t in range(args.steps):
        f, o = probe(gs, bp)
        if int(f):
            far_steps.append((t, int(f)))
        if int(o):
            over_steps.append((t, int(o)))
        gs = step(gs, bp)
        lost = int(gs.lost)
        if lost != prev:
            lost_events.append((t, lost))
            prev = lost
    print(json.dumps(dict(
        k=args.k, steps=args.steps,
        far_nonzero_steps=far_steps,
        over_nonzero_steps=over_steps,
        lost_events=lost_events, final_lost=prev,
        world_stats=res.batched_world_stats(gs, s, B))))


if __name__ == "__main__":
    main()
