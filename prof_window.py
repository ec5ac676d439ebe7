"""Stage profiler for the layer-WINDOWED fused advection step.

Times each piece of the windowed hot path (advect._scan_core win_tab branch)
on the current backend:
  copy       -- big contiguous HBM copy (practical peak bandwidth proxy)
  stat       -- merged static row gather wstat_tab[cell] (x2 per step)
  wingather  -- (1, W, KC) windowed slice gather
  wingat+T   -- windowed gather + moveaxis to the (W, KC, N) kernel layout
  kernel     -- fused_window_streamline_step on pre-staged inputs
  step       -- gathers + transposes + kernel, one fused jit
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mops_tpu_jax_cache")

import mops_tpu as mt
from mops_tpu.pallas.window_kernel import (build_window_tables, default_window,
                                           fused_window_streamline_step,
                                           window_gather, window_starts)

import os
N_CELLS = int(os.environ.get('PW_CELLS', 20000))
L = int(os.environ.get('PW_L', 60))
N = 65536
BLOCK = 512

mesh = mt.synth.build_voronoi_mesh(N_CELLS, jitter=0.05, seed=0,
                                   n_layers=L).astype(np.float32)
raw = mt.synth.solid_body_fields(mesh, n_layers=L, w_scale=1e-5)
sol = mt.preprocess(mesh, {k: np.asarray(v, np.float32) for k, v in raw.items()})
meshj = jax.device_put(mesh)
solj = jax.device_put(sol)
rng = np.random.default_rng(0)
v = rng.normal(size=(N, 3))
seeds = (v / np.linalg.norm(v, axis=1, keepdims=True)
         * mt.EARTH_RADIUS).astype(np.float32)
cells = jnp.asarray(mt.CellSearch(mesh).query(seeds))
pos = jnp.asarray(seeds)
depth_neg = jnp.full((1, N), -100.0, jnp.float32)

W = default_window(L)
win_tab, kstatic_tab, C = jax.block_until_ready(jax.jit(
    lambda: build_window_tables(
        meshj.vertices_on_cell, meshj.vertex_xyz, solj.vertex_ztop,
        solj.vertex_velocity, solj.vertex_vert_velocity))())
K = meshj.vertices_on_cell.shape[1]
C = 5                      # returned C is a traced jit output
KC = K * C
nvT = jax.block_until_ready(
    jax.jit(lambda c: meshj.n_edges_on_cell[c][None].astype(jnp.int32))(cells))
layer0 = jnp.full((N,), 3, jnp.int32)
srt = jax.block_until_ready(jax.jit(
    lambda l: window_starts(l, L, W))(layer0))
print(f"staged: K={K} W={W} C={C} winrow={W*KC*4}B statrow={kstatic_tab.shape[1]*4}B",
      flush=True)


def bench(name, f, *a, nbytes=0, reps=20):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / reps * 1e3
    gbs = nbytes / (ms * 1e-3) / 1e9 if nbytes else 0.0
    print(f"{name:12s} {ms:7.3f} ms  {N/ms*1e3/1e6:7.2f}M part/s  "
          f"{gbs:7.1f} GB/s(min-traffic)", flush=True)
    return ms


big = jnp.zeros((256, 1 << 20), jnp.float32)     # 1 GiB
copy = jax.jit(lambda x: x + 1.0)
o = jax.block_until_ready(copy(big))
t0 = time.perf_counter()
for _ in range(10):
    o = copy(o)
jax.block_until_ready(o)
ms = (time.perf_counter() - t0) / 10 * 1e3
peak = 2 * big.nbytes / (ms * 1e-3) / 1e9
print(f"{'copy':12s} {ms:7.3f} ms  practical HBM roofline ~{peak:.0f} GB/s",
      flush=True)

sg = jax.jit(lambda c: kstatic_tab[c])
bench("stat", sg, cells, nbytes=N * kstatic_tab.shape[1] * 4)
wg = jax.jit(lambda c, s: jax.lax.stop_gradient(
    window_gather(win_tab, c, s, W, KC)))
bench("wingather", wg, cells, srt, nbytes=N * W * KC * 4)
wgt = wg  # window_gather already includes the moveaxis
win_t = jax.block_until_ready(wg(cells, srt))
kst_t = jax.block_until_ready(jax.jit(lambda c: kstatic_tab[c].T)(cells))
kern = jax.jit(lambda *a: fused_window_streamline_step(
    *a, L, 120.0, block=BLOCK))
bench("kernel", kern, pos.T, depth_neg, nvT, srt[None], kst_t, win_t,
      nbytes=N * (W * KC + kstatic_tab.shape[1]) * 4)
step = jax.jit(lambda p, d, nv, c, s: fused_window_streamline_step(
    p, d, nv, s[None], kstatic_tab[c].T, window_gather(win_tab, c, s, W, KC),
    L, 120.0, block=BLOCK))
bench("step", step, pos.T, depth_neg, nvT, cells, srt,
      nbytes=N * (W * KC + kstatic_tab.shape[1]) * 4)
