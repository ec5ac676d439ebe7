#!/usr/bin/env python
"""mops_tpu headline benchmark: particle-RK4-steps/s/chip.

Runs the full streamline RK4 advection loop (relocation + Wachspress
interpolation + vertical layer search + RK4 sphere update, i.e. the reference
StreamLine kernel pipeline) on a synthetic eddy-scale MPAS-like mesh, fp32
fast mode, and reports ONE JSON line:

    {"metric": "particle_rk4_steps_per_s", "value": N, "unit": "steps/s",
     "vs_baseline": R}

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
measured against the recorded first-round value in BENCH_BASELINE.json when
present, else 1.0.
"""

import json
import os
import sys
import time

import numpy as np

# fp32 fast mode: do NOT enable x64.
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mops_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import mops_tpu as mt
from mops_tpu.settings import FailMode


def build_case(n_cells, n_layers, n_particles, seed=0,
               w_scale=1e-5, bathymetry_amp=0.0, shelf_lon=None,
               omega_decay=0.5):
    mesh = mt.synth.build_voronoi_mesh(n_cells, jitter=0.05, seed=seed,
                                       n_layers=n_layers)
    raw = mt.synth.solid_body_fields(mesh, n_layers=n_layers,
                                     w_scale=w_scale,
                                     omega_decay=omega_decay,
                                     bathymetry_amp=bathymetry_amp,
                                     shelf_lon=shelf_lon)
    mesh32 = mesh.astype(np.float32)
    sol = mt.preprocess(mesh32, {k: np.asarray(v, dtype=np.float32)
                                 for k, v in raw.items()})

    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n_particles, 3))
    seeds = (v / np.linalg.norm(v, axis=1, keepdims=True)
             * mt.EARTH_RADIUS).astype(np.float32)
    cells = mt.CellSearch(mesh).query(seeds)
    return mesh32, sol, seeds, cells


def main():
    n_cells = int(os.environ.get("BENCH_CELLS", 20000))
    n_layers = int(os.environ.get("BENCH_LAYERS", 60))
    n_particles = int(os.environ.get("BENCH_PARTICLES", 65536))
    n_steps = int(os.environ.get("BENCH_STEPS", 200))
    # BENCH_REGIME=crossing: realistic vertVelocityTop magnitude (1e-3 m/s,
    # sign varying over the sphere) + O(1) bathymetry gradients, so particles
    # cross layers and the window-miss fallback is actually exercised
    # (VERDICT r4 missing #3); the default solid-body regime never misses.
    crossing = os.environ.get("BENCH_REGIME") == "crossing"

    mesh, sol, seeds, cells = build_case(
        n_cells, n_layers, n_particles,
        w_scale=1e-3 if crossing else 1e-5,
        bathymetry_amp=0.5 if crossing else 0.0,
        shelf_lon=0.3 if crossing else None,
        # no with-depth velocity decay in the crossing regime: deep
        # particles must actually sweep across the shelf edges
        omega_decay=1.0 if crossing else 0.5)
    # crossing regime: particle depths spread into the deep column so shelf
    # crossings actually put particles below the local bottom
    depth_kw = dict(particle_depths=mt.seeding.linear_depth_profile(
        n_particles, 10, 2500)) if crossing else dict(depth=100.0)
    delta_t = int(os.environ.get("BENCH_DT", 120))
    cfg = mt.TrajectorySettings(
        delta_t=delta_t, simulation_duration=delta_t * n_steps,
        record_t=delta_t * n_steps, fail_mode=FailMode.ZERO, **depth_kw)

    # Hardware correctness gate BEFORE timing: the fast path must agree with
    # the reference-exact pure-XLA step ON THIS DEVICE.  (Round 5 found the
    # compiled windowed kernel silently advecting zero-velocity particles on
    # real TPU -- bitcast int payloads flushed as f32 subnormals -- while
    # every CPU-interpret test stayed green.  Never trust a steps/s number
    # without this.)
    vg_cfg = mt.TrajectorySettings(
        delta_t=delta_t, simulation_duration=delta_t * 20,
        record_t=delta_t * 20, fail_mode=FailMode.ZERO, **depth_kw)
    fast = mt.run_advection(mesh, sol, seeds, cells, vg_cfg,
                            exact_clamp=False, dtype=jnp.float32)
    exact = mt.run_advection(mesh, sol, seeds, cells, vg_cfg,
                             exact_clamp=False, dtype=jnp.float32,
                             use_pallas=False)
    fp, ep = np.asarray(fast.final_position), np.asarray(exact.final_position)
    err = np.linalg.norm(fp - ep, axis=1)
    disp = float(np.median(np.linalg.norm(ep - np.asarray(seeds), axis=1)))
    dispf = float(np.median(np.linalg.norm(fp - np.asarray(seeds), axis=1)))
    # robust criterion: a handful of lanes legitimately diverge when an f32
    # rounding difference flips a near-tie relocation argmin (chaotic but
    # valid); a BROKEN path moves nothing (or everything wrong).  Require
    # 99.5% of lanes within tolerance (tie-flip rate grows with mesh size) AND matching median displacement.
    tol = max(100.0, 1e-4 * max(disp, 1.0))
    frac_ok = float((err <= tol).mean())
    verified = frac_ok >= 0.995 and \
        abs(dispf - disp) <= 0.05 * max(disp, 1.0)
    if not verified:
        print(f"# CORRECTNESS GATE FAILED: {100 * (1 - frac_ok):.2f}% lanes "
              f"off (> {tol:.1f} m); median displacement fast {dispf:.1f} vs "
              f"exact {disp:.1f} m", file=sys.stderr)

    def run():
        raw = mt.run_advection(mesh, sol, seeds, cells, cfg,
                               exact_clamp=False, dtype=jnp.float32)
        raw.final_position.block_until_ready()
        return raw

    run()                       # compile + warm
    t0 = time.perf_counter()
    raw = run()
    elapsed = time.perf_counter() - t0

    steps_per_s = n_particles * n_steps / elapsed
    misses = 0 if raw.window_misses is None \
        else int(np.asarray(raw.window_misses).sum())
    miss_rate = misses / (n_particles * n_steps)

    vs = 1.0
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs = steps_per_s / float(base["value"])

    print(json.dumps({
        "metric": "particle_rk4_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3),
        "verified": verified,
    }))

    # roofline accounting: practical HBM peak via a big-copy probe, vs the
    # step's minimum gather traffic x3 (gather read + materialize + kernel
    # read) -- so perf progress is measurable against the hardware bound.
    # The mode flags and gather bytes come from what run_advection ACTUALLY
    # resolved (advect.LAST_RESOLVED), not a re-derivation that could drift.
    from mops_tpu.advect import LAST_RESOLVED
    windowed = bool(LAST_RESOLVED.get("window"))
    packed = bool(LAST_RESOLVED.get("pack"))
    gather_bytes = int(LAST_RESOLVED.get("gather_bytes", 0))
    big = jnp.zeros((256, 1 << 20), jnp.float32)
    cp = jax.jit(lambda x: x + 1.0)
    o = cp(big).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        o = cp(o)
    o.block_until_ready()
    peak = 2 * big.nbytes / ((time.perf_counter() - t0) / 5) / 1e9
    traffic = 3 * gather_bytes * steps_per_s / 1e9
    print(f"# device={jax.devices()[0].platform} cells={n_cells} "
          f"layers={n_layers} particles={n_particles} steps={n_steps} "
          f"elapsed={elapsed:.3f}s "
          f"regime={'crossing' if crossing else 'solid-body'} "
          f"window_misses={misses} miss_rate={miss_rate:.2e}/particle-step",
          file=sys.stderr)
    print(f"# roofline: windowed={windowed} packed={packed} "
          f"gather={gather_bytes}B/step "
          f"traffic~{traffic:.0f}GB/s copy-peak~{peak:.0f}GB/s "
          f"({100 * traffic / peak:.0f}% of practical HBM peak)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
