"""Round-4 full-step A/B: fused vs split physics kernel x rows-per-program.

One configuration per invocation (the step caches key on settings, not on
the TPUFLUID_FUSED_PHYSICS env or ROWS_PER_PROGRAM, so mixing configs in
one process would reuse stale compilations).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_r4.py
       --scene 64k [--fused]
       [--rblk 8] [--burst N] [--iters N] [--settle N]
"""

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="64k")
    ap.add_argument("--split", action="store_true",
                    help="two-kernel density+forces path (the default "
                         "since the round-4 A/B; kept for compat)")
    ap.add_argument("--fused", action="store_true",
                    help="single fused physics kernel")
    ap.add_argument("--rblk", type=int, default=0,
                    help="override ROWS_PER_PROGRAM (0 = default)")
    ap.add_argument("--burst", type=int, default=0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--settle", type=int, default=200)
    args = ap.parse_args()

    if args.fused:
        os.environ["TPUFLUID_FUSED_PHYSICS"] = "1"

    import jax
    import jax.numpy as jnp
    from tpufluid import models
    from tpufluid.ops import resident

    if args.rblk:
        resident.ROWS_PER_PROGRAM = args.rblk

    scene = {"1m": models.scene_1m, "64k": models.scene_64k,
             "256k": models.scene_256k, "4k": models.dam_break_4k,
             "default": models.default_scene}[args.scene]()
    burst = args.burst or {"4k": 200, "64k": 80, "256k": 50,
                           "1m": 30, "default": 60}[args.scene]
    settings = scene.settings
    n = settings.particle_count

    gs = resident.init_grid_state(settings)
    if args.settle:
        settle = resident.make_grid_multi_step(settings, args.settle)
        gs = settle(gs, scene.params)
    run = resident.make_grid_multi_step(settings, burst)
    gs2 = run(gs, scene.params)  # compile
    float(jnp.max(gs2.pos_x))
    t0 = time.perf_counter()
    out = gs
    for _ in range(args.iters):
        out = run(out, scene.params)
    float(jnp.max(out.pos_x))
    ms = (time.perf_counter() - t0) / args.iters / burst * 1e3
    print(json.dumps(dict(
        scene=scene.name,
        physics="split" if resident._split_physics() else "fused",
        rblk=resident.rows_per_program(settings), burst=burst,
        ms_per_step=round(ms, 4), particle_steps_per_sec=n / (ms * 1e-3),
        lost=int(out.lost), backend=jax.default_backend())), flush=True)


if __name__ == "__main__":
    main()
