"""Round-4 kernel-split profiler (1M scene, real TPU).

Times nested prefixes of the resident step via lax.scan bursts:
  rebin            (incl. far-mover cond, as the real step runs it)
  rebin+density
  full step        (rebin + density + forces_integrate)
Differences give per-kernel costs under their true pipeline overlap.

Usage: PYTHONPATH=. python scripts/prof_r4.py [--scene 1m|64k|256k|4k]
       [--burst N] [--iters N]
"""

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax

from tpufluid import models
from tpufluid.ops import resident
from tpufluid.ops.pallas import fused


def _sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.max(leaf))


def build_stage_run(settings, stage, burst):
    """A scan of ``burst`` iterations of the step prefix ``stage``."""
    settings = resident.pad_capacity(settings)
    rblk = resident.rows_per_program(settings)

    def partial_step(gs, params):
        dt = params.delta
        px, py, vx, vy, occ_row, far_n, over_n = fused.rebin(
            gs.pos_x, gs.pos_y, gs.vel_x, gs.vel_y, gs.occ_row, dt,
            settings, rows_per_program=rblk)
        if stage == "rebin":
            return resident.GridState(
                pos_x=px, pos_y=py, vel_x=vx, vel_y=vy, occ_row=occ_row,
                tick=gs.tick + 1, lost=gs.lost)
        pres, invr = fused.density(
            px, py, vx, vy, occ_row, params.mass, dt,
            params.pressure_constant, params.rest_density, settings,
            rows_per_program=rblk)
        if stage == "rebin+density":
            # fold pres into vel so nothing is dead-code-eliminated
            return resident.GridState(
                pos_x=px, pos_y=py, vel_x=vx + 0.0 * pres,
                vel_y=vy + 0.0 * invr, occ_row=occ_row,
                tick=gs.tick + 1, lost=gs.lost)
        frame = (gs.tick + 1).astype(jnp.uint32)
        npx, npy, nvx, nvy = fused.forces_integrate(
            px, py, vx, vy, pres, invr, occ_row, params, settings, frame,
            rows_per_program=rblk)
        return resident.GridState(
            pos_x=npx, pos_y=npy, vel_x=nvx, vel_y=nvy, occ_row=occ_row,
            tick=gs.tick + 1, lost=gs.lost)

    @jax.jit
    def run(gs, params):
        def body(s, _):
            return partial_step(s, params), None
        out, _ = lax.scan(body, gs, None, length=burst)
        return out

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="1m")
    ap.add_argument("--burst", type=int, default=60)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--settle", type=int, default=200)
    ap.add_argument("--stages", default="rebin,rebin+density,full")
    args = ap.parse_args()

    scene = {"1m": models.scene_1m, "64k": models.scene_64k,
             "256k": models.scene_256k, "4k": models.dam_break_4k}[
        args.scene]()
    settings = scene.settings
    params = scene.params
    print(f"scene={scene.name} backend={jax.default_backend()}")

    gs = resident.init_grid_state(settings)
    if args.settle:
        settle = resident.make_grid_multi_step(settings, args.settle)
        gs = settle(gs, params)
    _sync(gs)

    prev = 0.0
    for stage in args.stages.split(","):
        run = build_stage_run(settings, stage, args.burst)
        out = run(gs, params)  # compile
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(gs, params)
        _sync(out)
        ms = (time.perf_counter() - t0) / args.iters / args.burst * 1e3
        print(f"{stage:16s} {ms:8.3f} ms/step  (delta {ms - prev:+.3f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
