"""Kernel/gather roofline profiler for the fused advection step.

Breaks the hot path (advect._scan_core Pallas branch) into stages and times
each on the current backend so the bottleneck is measured, not guessed:
  copy      -- big contiguous HBM copy (practical peak bandwidth proxy)
  gather    -- packed_tab[vids] row gather alone
  gather+T  -- row gather + moveaxis into the kernel (K, F, N) layout
  kernel    -- fused_streamline_step on pre-staged inputs
  step      -- one full driver-equivalent step (gather + transpose + kernel)
Prints achieved GB/s per stage against the copy roofline.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mops_tpu_jax_cache")

import mops_tpu as mt
from mops_tpu import advect
from mops_tpu.pallas.stage_kernel import fused_streamline_step, pack_vertex_table

N_CELLS, L, N = 20000, 60, 65536
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
print("setup done", flush=True)

packed = jax.jit(pack_vertex_table)(
    meshj.vertex_xyz, solj.vertex_ztop, solj.vertex_velocity,
    solj.vertex_vert_velocity)
packed = jax.block_until_ready(packed)
K = meshj.vertices_on_cell.shape[1]
F = packed.shape[1]
vids = jax.block_until_ready(
    jax.jit(lambda c: jnp.clip(meshj.vertices_on_cell[c], 0))(cells))
nvT = jax.block_until_ready(
    jax.jit(lambda c: meshj.n_edges_on_cell[c][None].astype(jnp.int32))(cells))
print(f"staged: K={K} F={F} row={F*4}B gathered={K*F*4}B/particle", flush=True)


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

g = jax.jit(lambda i: packed[i])
bench("gather", g, vids, nbytes=N * K * F * 4)
gt = jax.jit(lambda i: jnp.moveaxis(packed[i], 0, -1))
bench("gather+T", gt, vids, nbytes=N * K * F * 4)
cols_t = jax.block_until_ready(gt(vids))
kern = jax.jit(lambda *a: fused_streamline_step(*a, L, 120.0, block=BLOCK))
bench("kernel", kern, pos.T, depth_neg, nvT, cols_t, nbytes=N * K * F * 4)
step = jax.jit(lambda p, d, nv, i: fused_streamline_step(
    p, d, nv, jnp.moveaxis(packed[i], 0, -1), L, 120.0, block=BLOCK))
bench("step", step, pos.T, depth_neg, nvT, vids, nbytes=N * K * F * 4)
