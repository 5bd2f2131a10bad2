"""Benchmark harness (BASELINE.json configs).

Prints ONE JSON line for the driver:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: particle-steps/sec at 1M particles on one chip.
vs_baseline is measured against the BASELINE.json north-star target of
5e8 particle-steps/s (the reference publishes no numbers of its own; its
implied real-time throughput is ~1.2e7 particle-steps/s — 100k particles
at 120 Hz, src/main.rs:50 + src/renderer.rs:375).

Run directly (`python bench.py`) for the headline line, or
`python bench.py --all` / `python -m tpufluid bench` for the full ladder.
"""

import argparse
import json
import sys
import time

BASELINE_TARGET = 5.0e8  # particle-steps/s north star (BASELINE.json)


def _sync(tree):
    """Force completion with a scalar device->host fetch.

    jax.block_until_ready can return early over the axon stdio tunnel
    (measured: a 22-TFLOP matmul scan "completed" in 0.4 ms); fetching one
    element of the result is a true sync.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def _warm_fetch():
    """The tunnel's first device->host fetch can take tens of seconds;
    do a throwaway one before timing anything."""
    import jax.numpy as jnp
    _sync(jnp.ones(8))
    _sync(jnp.ones(8))


def _timeit(fn, state, params, *extra, warmup=3, iters=20):
    _warm_fetch()
    for _ in range(warmup):
        state = fn(state, params, *extra)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state, params, *extra)
    _sync(state)
    dt = time.perf_counter() - t0
    return dt / iters, state


def bench_step(scene, warmup=3, iters=20, burst=10, neighbor_mode="resident",
               **step_kw):
    """Times an on-device lax.scan burst of ``burst`` steps (single host
    dispatch), so remote-tunnel dispatch latency doesn't pollute the
    per-step number. neighbor_mode 'resident' uses the grid-resident
    engine (ops.resident)."""
    n = scene.settings.particle_count
    if neighbor_mode == "resident":
        from tpufluid.ops import resident

        run = resident.make_grid_multi_step(scene.settings, burst)
        state = resident.init_grid_state(scene.settings)
    else:
        from tpufluid import make_multi_step

        run = make_multi_step(scene.settings, burst,
                              neighbor_mode=neighbor_mode, **step_kw)
        state = scene.init()
    sec, _ = _timeit(run, state, scene.params, warmup=warmup, iters=iters)
    sec /= burst
    return dict(
        config=scene.name,
        particles=n,
        mode=neighbor_mode,
        ms_per_step=sec * 1e3,
        particle_steps_per_sec=n / sec,
    )


def bench_render(scene, width=1920, height=1080, warmup=2, iters=5):
    import functools
    import jax
    from tpufluid.ops import render, render_binned

    step = scene.make_step(neighbor_mode="dense")
    state = scene.init()
    for _ in range(3):
        state = step(state, scene.params)
    cam = render.Camera(view_size=(
        scene.settings.size[0],
        scene.settings.size[0] * height / width,
    ))
    rfn = jax.jit(functools.partial(
        render_binned.render_metaball_binned, settings=scene.settings,
        width=width, height=height, camera=cam,
    ))
    frame = rfn(state)
    _sync(frame)
    t0 = time.perf_counter()
    for _ in range(iters):
        frame = rfn(state)
    _sync(frame)
    return (time.perf_counter() - t0) / iters * 1e3  # ms/frame


def run_configs(which=None, out=sys.stdout, mode="resident"):
    """The BASELINE.json ladder. which: config number 1-5 or None for all
    feasible on this host."""
    import jax
    from tpufluid import models

    results = {}

    def wants(i):
        return which is None or which == i

    def record(key, value):
        results[key] = value
        print(json.dumps({key: value}, default=float), file=out, flush=True)

    if wants(1):
        record("config1_4k", bench_step(models.dam_break_4k(),
                                        neighbor_mode=mode))
    if wants(2):
        record("config2_64k", bench_step(models.scene_64k(),
                                         neighbor_mode=mode))
    if wants(3):
        r = bench_step(models.scene_256k(), neighbor_mode=mode)
        r["render_ms_per_frame_1080p"] = bench_render(models.scene_256k())
        record("config3_256k", r)
    if wants(4):
        r = bench_step(models.scene_1m(), neighbor_mode=mode)
        # vmap batch: 8 independent 128k scenes (1M particles total) with
        # differing gravity/viscosity
        import numpy as np
        from tpufluid import SimSettings
        from tpufluid.models import Scene
        from tpufluid.params import TickParams
        scene = Scene(
            name="sph-128k-batch",
            settings=SimSettings(
                particle_count=131072, particle_spacing=0.1,
                smoothing_radius=0.2, size=(38.0, 38.0), cell_capacity=8),
            params=TickParams.default(),
        )
        gravities = [(0.0, -g) for g in np.linspace(0.0, 2.0, 8)]
        viscosities = list(np.linspace(5.0, 40.0, 8))
        # vmap composes with the XLA dense path (Pallas SMEM scalars don't
        # batch); resident has its own state type
        bstate, bparams, bstep = models.batch_scenes(
            scene, gravities, viscosities,
            neighbor_mode="dense" if mode in ("resident", "pallas") else mode)
        sec, _ = _timeit(bstep, bstate, bparams, warmup=2, iters=5)
        r["vmap8x128k_ms_per_step"] = sec * 1e3
        r["vmap8x128k_particle_steps_per_sec"] = (
            8 * scene.settings.particle_count / sec)
        record("config4_1m", r)
    if wants(5):
        if jax.device_count() >= 2:
            record("config5_sharded", bench_sharded())
        else:
            record("config5_sharded", dict(
                skipped=f"needs multi-device, have {jax.device_count()}"))

    return results


def bench_sharded():
    import jax
    import numpy as np
    from tpufluid import SimSettings, TickParams
    from tpufluid.parallel import (
        build_shard_spec, init_sharded, make_sharded_step)

    d = jax.device_count()
    n = 4_194_304 if d >= 8 else 524_288 * d
    settings = SimSettings(
        particle_count=n, particle_spacing=0.1, smoothing_radius=0.2,
        size=(424.0, 424.0), cell_capacity=16,
    )
    spec = build_shard_spec(settings, d)
    step = make_sharded_step(spec, neighbor_mode="dense")
    state = init_sharded(spec)
    params = TickParams.default()

    def fn(st, p):
        new, _ = step(st, p)
        return new

    sec, _ = _timeit(fn, state, params, warmup=2, iters=10)
    return dict(
        config=f"sharded-{d}dev", particles=n, ms_per_step=sec * 1e3,
        particle_steps_per_sec=n / sec, devices=d,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="full ladder to stderr")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--neighbor-mode", default="resident",
                    choices=("grid", "dense", "pallas", "resident"))
    args = ap.parse_args()

    if args.all:
        run_configs(None, out=sys.stderr)

    from tpufluid import models
    r = bench_step(models.scene_1m(), warmup=1, iters=args.iters,
                   burst=10, neighbor_mode=args.neighbor_mode)
    value = r["particle_steps_per_sec"]
    print(json.dumps(dict(
        metric="particle_steps_per_sec_1M",
        value=value,
        unit="particle-steps/s",
        vs_baseline=value / BASELINE_TARGET,
    )))


if __name__ == "__main__":
    main()
