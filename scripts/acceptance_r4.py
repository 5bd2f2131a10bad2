"""Unbounded-capacity acceptance run (BASELINE.md's promised record).

The scene that round 2's strict-capacity policy REFUSED: the reference's
exact default settings (100k particles, spacing 0.1, h=0.2, 53x53 box —
/root/reference/src/main.rs:48-54) with g=(0, -9.8) so the spawn block
free-falls and piles up (peak measured occupancy ~6 vs rest 4). Run it
long (default 2048 steps >= 8 audit windows) on the real backend under
``capacity_policy="grow"`` and record: particles lost (must be 0),
regrow count, final cell capacity, and sustained particle-steps/s
through the FluidApp burst path (audits included — this is the
user-facing rate, not a kernel microbenchmark).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/acceptance_r4.py
       [--steps 2048] [--burst 256]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--burst", type=int, default=256)
    args = ap.parse_args()

    import jax
    from tpufluid.app import FluidApp
    from tpufluid.params import SimSettings, TickParams

    s = SimSettings()  # the reference defaults verbatim
    app = FluidApp(s, params=TickParams.default(gravity=(0.0, -9.8)),
                   neighbor_mode="resident", capacity_policy="grow")
    k0 = app.settings.cell_capacity

    # warm the compile caches (and take the spawn-impact regrow, if any,
    # outside the timed window is NOT done: the whole run is timed —
    # regrow replays and audits are part of the product's cost story)
    t0 = time.perf_counter()
    app.run(args.steps, max_burst=args.burst)
    m = app.metrics()
    wall = time.perf_counter() - t0

    n = s.particle_count
    out = dict(
        scene="reference-default-100k g=(0,-9.8)",
        steps=args.steps,
        backend=jax.default_backend(),
        lost_particles=m["lost_particles"],
        n_regrows=m["n_regrows"],
        cell_capacity_start=k0,
        cell_capacity_final=m["cell_capacity"],
        wall_s=round(wall, 2),
        particle_steps_per_sec=round(n * args.steps / wall, 1),
        ms_per_step=round(wall / args.steps * 1e3, 4),
        tick=m["tick"],
    )
    deep = app.metrics(deep=True)
    out["nan_positions"] = deep["nan_positions"]
    out["nan_velocities"] = deep["nan_velocities"]
    out["max_cell_occupancy"] = deep["max_cell_occupancy"]
    out["max_speed"] = round(float(deep["max_speed"]), 2)
    print(json.dumps(out), flush=True)
    assert out["lost_particles"] == 0, out
    assert out["tick"] == args.steps, out


if __name__ == "__main__":
    main()
