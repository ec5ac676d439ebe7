import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/mops_tpu_jax_cache")
nC, KF, N, B, W = 20000, 3072, 65536, 512, 64
def kern(cid_ref, tab_ref, out_ref, rows, sems):
    i = pl.program_id(0)
    def dma(j):
        c = cid_ref[i * B + j]
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(c * KF, KF)],
            rows.at[pl.ds(j * KF, KF)], sems.at[j % W])
    def body(j, _):
        @pl.when(j >= W)
        def _():
            dma(j - W).wait()
        dma(j).start()
        return 0
    jax.lax.fori_loop(0, B, body, 0)
    def drain(j, _):
        dma(j).wait()
        return 0
    jax.lax.fori_loop(B - W, B, drain, 0)
    out_ref[...] = rows[pl.ds(0, 1024)].reshape(8, 128)
tab = jnp.asarray(np.random.default_rng(0).normal(size=(nC * KF,)), jnp.float32)
cid = jnp.asarray(np.random.default_rng(1).integers(0, nC, size=(N,)), jnp.int32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(N // B,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((8, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((B * KF,), jnp.float32),
                    pltpu.SemaphoreType.DMA((W,))])
f = jax.jit(lambda cid, tab: pl.pallas_call(
    kern, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((8 * (N // B), 128), jnp.float32))(cid, tab))
o = f(cid, tab); jax.block_until_ready(o)
print("compiled", flush=True)
c0 = int(np.asarray(cid)[0])
np.testing.assert_allclose(np.asarray(o)[:8].reshape(-1)[:KF][:1024],
                           np.asarray(tab)[c0*KF:c0*KF+1024])
print("correct", flush=True)
t0=time.perf_counter()
for _ in range(10): o = f(cid, tab)
jax.block_until_ready(o)
dt=(time.perf_counter()-t0)/10
print(f"DMA gather {N} rows x {KF*4}B: {dt*1e3:.2f} ms ({N*KF*4/dt/1e9:.0f} GB/s)")
