#!/usr/bin/env python
"""Ablation microbenchmark: time the pieces of one advection step on device.

Times each building block of the streamline step (gathers, Wachspress, layer
search, velocity interp, relocation, record scatter) in isolation to find
where the per-step time goes.  Run with the default env (axon TPU) or
JAX_PROFILE_CPU=1 for host CPU.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PROFILE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import mops_tpu as mt
from mops_tpu import advect
from mops_tpu.interp import wachspress_weights

N_CELLS = int(os.environ.get("P_CELLS", 20000))
N_LAYERS = int(os.environ.get("P_LAYERS", 60))
N_PART = int(os.environ.get("P_PARTICLES", 65536))
STEPS = int(os.environ.get("P_STEPS", 50))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:<38} {dt * 1e3 / STEPS:9.3f} ms/step   ({dt:.3f}s / {STEPS} steps)")
    return out


def main():
    mesh = mt.synth.build_voronoi_mesh(N_CELLS, jitter=0.05, n_layers=N_LAYERS)
    raw = mt.synth.solid_body_fields(mesh, n_layers=N_LAYERS, w_scale=1e-5)
    mesh = mesh.astype(np.float32)
    sol = mt.preprocess(mesh, {k: np.asarray(v, np.float32)
                               for k, v in raw.items()})
    # device arrays so closures over mesh/sol trace cleanly
    mesh = jax.tree.map(jnp.asarray, mesh)
    sol = jax.tree.map(jnp.asarray, sol)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(N_PART, 3))
    seeds = (v / np.linalg.norm(v, axis=1, keepdims=True)
             * mt.EARTH_RADIUS).astype(np.float32)
    cells = jnp.asarray(mt.CellSearch(mesh).query(seeds))
    pos = jnp.asarray(seeds)
    depth_neg = jnp.full(N_PART, -100.0, dtype=jnp.float32)

    print(f"device={jax.devices()[0].platform} cells={N_CELLS} "
          f"layers={N_LAYERS} particles={N_PART}")

    def loop(body):
        @jax.jit
        def run(pos, cells):
            def f(carry, _):
                return body(carry), None
            (p, c), _ = jax.lax.scan(f, (pos, cells), None, length=STEPS)
            return p, c
        return run

    # 0. full streamline step (reference config)
    cfg = mt.TrajectorySettings(delta_t=120, simulation_duration=120 * STEPS,
                                record_t=120 * STEPS, depth=100.0,
                                fail_mode=mt.FailMode.ZERO)

    def full(pos, cells):
        return advect.run_advection(mesh, sol, pos, cells, cfg,
                                    exact_clamp=False,
                                    dtype=jnp.float32).final_position
    timeit("FULL rk4 step (run_advection)", full, pos, cells)

    # 1. relocation only
    def reloc_body(carry):
        p, c = carry
        c = advect._relocate(mesh, p, c)
        return (p * 1.000000001, c)
    timeit("relocate", loop(reloc_body), pos, cells)

    # 2. vertex gather + in-mesh + wachspress
    def wach_body(carry):
        p, c = carry
        vids, nv, lane_valid, vids_ok, vpos = advect._gather_cell_vertices(mesh, c)
        inm = advect._in_mesh(p, vpos, nv, lane_valid)
        w = wachspress_weights(p, vpos, nv)
        return (p + jnp.where(inm, w.sum(1), 0.0)[:, None] * 0.0, c)
    timeit("gather verts + inmesh + wachspress", loop(wach_body), pos, cells)

    # 3. ztop column gather + profile + clamp + binary search
    def zs_body(carry):
        p, c = carry
        vids, nv, lane_valid, vids_ok, vpos = advect._gather_cell_vertices(mesh, c)
        w = wachspress_weights(p, vpos, nv)
        cols = sol.vertex_ztop[vids]
        z = jnp.einsum("nk,nkl->nl", w, cols)
        z = advect._clamp_profile(z, False)
        layer = advect._layer_search_binary(z, depth_neg)
        return (p + (layer * 0).astype(p.dtype)[:, None], c)
    timeit("ztop cols + profile + search", loop(zs_body), pos, cells)

    # 4. ztop gather ONLY
    def zg_body(carry):
        p, c = carry
        vids = jnp.clip(mesh.vertices_on_cell[c], 0)
        cols = sol.vertex_ztop[vids]
        return (p + cols.sum(axis=(1, 2), keepdims=False)[:, None] * 0.0, c)
    timeit("ztop column gather only", loop(zg_body), pos, cells)

    # 5. velocity gathers (2 layers x 4 stages = 8)
    def vg_body(carry):
        p, c = carry
        vids, nv, lane_valid, vids_ok, vpos = advect._gather_cell_vertices(mesh, c)
        w = wachspress_weights(p, vpos, nv)
        layer = jnp.ones(p.shape[0], dtype=jnp.int32)
        acc = 0.0
        for _ in range(4):
            acc = acc + advect._weighted_vertex_value(
                sol.vertex_velocity, vids, layer, w)
            acc = acc + advect._weighted_vertex_value(
                sol.vertex_velocity, vids, layer - 1, w)
        return (p + acc * 0.0, c)
    timeit("8x velocity gathers + weight", loop(vg_body), pos, cells)

    # 6. one full CalcVelocityAt stage
    def stage_body(carry):
        p, c = carry
        vids, nv, lane_valid, vids_ok, vpos = advect._gather_cell_vertices(mesh, c)
        h, wv, ok = advect._eval_stage_streamline(
            sol.vertex_ztop[vids], sol.vertex_velocity[vids],
            sol.vertex_vert_velocity[vids],
            p, depth_neg, nv, lane_valid, vids_ok, vpos, False)
        return (p + h * 0.0, c)
    timeit("1x full eval stage", loop(stage_body), pos, cells)

    # 7. record scatter
    buf = jnp.zeros((N_PART, 8, 3), dtype=jnp.float32)

    @jax.jit
    def scatter_run(pos, buf):
        def f(carry, i):
            p, b = carry
            b = b.at[:, i % 8].set(p)
            return (p * 1.000000001, b), None
        (p, b), _ = jax.lax.scan(f, (pos, buf), jnp.arange(STEPS))
        return p, b
    timeit("record scatter", scatter_run, pos, buf)


if __name__ == "__main__":
    main()
