import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/mops_tpu_jax_cache")
import mops_tpu as mt
from mops_tpu import advect
from mops_tpu.pallas.stage_kernel import fused_streamline_step
n_cells, L, N, = 20000, 60, 65536
mesh = mt.synth.build_voronoi_mesh(n_cells, jitter=0.05, seed=0, n_layers=L).astype(np.float32)
raw = mt.synth.solid_body_fields(mesh, n_layers=L, w_scale=1e-5)
sol = mt.preprocess(mesh, {k: np.asarray(v, np.float32) for k, v in raw.items()})
meshj = jax.device_put(mesh); solj = jax.device_put(sol)
rng = np.random.default_rng(0)
v = rng.normal(size=(N,3)); seeds=(v/np.linalg.norm(v,axis=1,keepdims=True)*mt.EARTH_RADIUS).astype(np.float32)
cells = jnp.asarray(mt.CellSearch(mesh).query(seeds))
pos = jnp.asarray(seeds); depth_neg = jnp.full((1,N), -100.0, jnp.float32)
print("setup done", flush=True)

@jax.jit
def stage(cells):
    vids, nv, lane_valid, vids_ok, vpos = advect._gather_cell_vertices(meshj, cells)
    return (jnp.moveaxis(solj.vertex_ztop[vids], 0, -1),
            jnp.moveaxis(solj.vertex_velocity[vids], 0, -1),
            jnp.moveaxis(solj.vertex_vert_velocity[vids], 0, -1),
            jnp.moveaxis(vpos, 0, -1), nv[None].astype(jnp.int32))
zt, vt, wt, vp, nvT = jax.block_until_ready(stage(cells))
posT = pos.T
print("staged", flush=True)

def bench(f, *a, reps=10):
    t0=time.perf_counter(); o = f(*a); jax.block_until_ready(o)
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(reps): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/reps*1e3
f = jax.jit(lambda *a: fused_streamline_step(*a, 120.0, block=256))
ms = bench(f, posT, depth_neg, nvT, vp, zt, vt, wt)
print(f"kernel-only block=256: {ms:6.2f} ms ({N/ms*1e3/1e6:.1f}M steps/s)", flush=True)
