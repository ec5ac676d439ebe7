#!/usr/bin/env python
"""Ablation profile of the migrating engine vs the plain windowed path.

VERDICT r4 weak #1: config 5 measured 309k steps/s per chip vs 22.97M on the
plain path (75x).  This script times, on the same mesh/particle shapes:

  A. plain run_advection at N (the throughput ceiling)
  B. plain run_advection at cap = capacity_factor*N (the fair pool-size ceiling)
  C. migrating engine, full
  D. migrating engine, exchange block disabled (MOPS_MIG_NO_EXCHANGE=1)
  E. migrating engine, pure-XLA step (use_pallas=False)

Usage: python scripts/profile_migrate.py [--cells 20000] [--particles 200000]
       [--layers 20] [--steps 20] [--shards 1] [--migrate-every 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mops_tpu as mt
from mops_tpu.settings import FailMode


def timed(fn, reps=1):
    out = fn()                      # compile + run
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=20000)
    ap.add_argument("--particles", type=int, default=200000)
    ap.add_argument("--layers", type=int, default=20)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--migrate-every", type=int, default=1)
    ap.add_argument("--capacity", type=float, default=2.0)
    ap.add_argument("--only", type=str, default="ABCDE")
    args = ap.parse_args()

    from mops_tpu.parallel.migrate import run_advection_migrating

    mesh64 = mt.synth.build_voronoi_mesh(args.cells, jitter=0.05,
                                         n_layers=args.layers)
    raw = mt.synth.solid_body_fields(mesh64, n_layers=args.layers,
                                     w_scale=1e-5)
    mesh = mesh64.astype(np.float32)
    sol = mt.preprocess(mesh, {k: np.asarray(v, np.float32)
                               for k, v in raw.items()})
    rng = np.random.default_rng(0)
    v = rng.normal(size=(args.particles, 3))
    seeds = (v / np.linalg.norm(v, axis=1, keepdims=True)
             * mt.EARTH_RADIUS).astype(np.float32)
    cells = mt.CellSearch(mesh).query(seeds)
    cfg = mt.TrajectorySettings(delta_t=3600,
                                simulation_duration=3600 * args.steps,
                                record_t=3600 * max(1, args.steps // 4),
                                depth=50.0, fail_mode=FailMode.ZERO)
    n_steps = cfg.n_steps
    print(f"# device={jax.devices()[0]} cells={args.cells} "
          f"L={args.layers} N={args.particles} steps={n_steps}",
          file=sys.stderr)

    def report(name, dt, n_eff):
        print(json.dumps({
            "case": name, "elapsed_s": round(dt, 4),
            "ms_per_step": round(dt / n_steps * 1e3, 3),
            "steps_per_s": round(n_eff * n_steps / dt, 1)}))

    if "A" in args.only:
        _, dt = timed(lambda: mt.run_advection(
            mesh, sol, seeds, cells, cfg, exact_clamp=False,
            dtype=jnp.float32).final_position)
        report("A-plain-N", dt, args.particles)
        print(f"#   resolved: {mt.advect.LAST_RESOLVED}", file=sys.stderr)

    cap_n = int(args.particles * args.capacity)
    if "B" in args.only:
        seeds_b = np.concatenate([seeds] * int(np.ceil(args.capacity)))[:cap_n]
        cells_b = np.concatenate([cells] * int(np.ceil(args.capacity)))[:cap_n]
        _, dt = timed(lambda: mt.run_advection(
            mesh, sol, seeds_b, cells_b, cfg, exact_clamp=False,
            dtype=jnp.float32).final_position)
        report("B-plain-cap", dt, cap_n)

    if "C" in args.only:
        _, dt = timed(lambda: run_advection_migrating(
            mesh, sol, seeds, cells, cfg, capacity_factor=args.capacity,
            migrate_every=args.migrate_every))
        report("C-migrating", dt, args.particles)

    if "D" in args.only:
        os.environ["MOPS_MIG_NO_EXCHANGE"] = "1"
        try:
            _, dt = timed(lambda: run_advection_migrating(
                mesh, sol, seeds, cells, cfg, capacity_factor=args.capacity,
                migrate_every=args.migrate_every))
            report("D-mig-no-exchange", dt, args.particles)
        finally:
            del os.environ["MOPS_MIG_NO_EXCHANGE"]

    if "E" in args.only:
        _, dt = timed(lambda: run_advection_migrating(
            mesh, sol, seeds, cells, cfg, capacity_factor=args.capacity,
            migrate_every=args.migrate_every, use_pallas=False))
        report("E-mig-pure-xla", dt, args.particles)


if __name__ == "__main__":
    main()
