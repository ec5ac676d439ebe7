#!/usr/bin/env python
"""A/B: packed-row gather materialized (N, R) + transpose-to-(R, N) vs a
single gather that writes the (R, N) kernel layout directly
(offset_dims=(0,), batch dim last).

The windowed/packed step needs rows in lanes-minor layout (W*KC, N) for the
Pallas kernel; today that is gather -> moveaxis (two HBM passes over the
gathered bytes).  A transposed gather fuses the layout change into the
gather's write pass -- if XLA lowers it well, one pass disappears.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mops_tpu_jax_cache")


def bench(fn, *args, iters=20):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    nC, NS, R = 20000, 53, 768
    N = 65536
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(nC, NS, R)).astype(np.float32))
    cell = jnp.asarray(rng.integers(0, nC, N).astype(np.int32))
    srt = jnp.asarray(rng.integers(0, NS, N).astype(np.int32))
    si = jnp.stack([cell, srt], axis=1)

    dn_row = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0, 1), start_index_map=(0, 1))
    dn_col = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0, 1), start_index_map=(0, 1))

    @jax.jit
    def row_then_t(tab, si):
        out = jax.lax.gather(tab, si, dn_row, (1, 1, R),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out.T + 1.0          # force the transposed layout to be used

    @jax.jit
    def direct_col(tab, si):
        out = jax.lax.gather(tab, si, dn_col, (1, 1, R),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out + 1.0

    t1 = bench(row_then_t, tab, si)
    t2 = bench(direct_col, tab, si)
    byts = N * R * 4
    print(f"rows(N,R)+T : {t1*1e3:8.2f} ms  {byts/t1/1e9:7.1f} GB/s useful")
    print(f"direct (R,N): {t2*1e3:8.2f} ms  {byts/t2/1e9:7.1f} GB/s useful")

    # windowed shape too: (nC, L, KC) -> (W, KC, N)
    L, KC, W = 80, 40, 16
    tabw = jnp.asarray(rng.normal(size=(nC, L, KC)).astype(np.float32))
    srtw = jnp.asarray(rng.integers(0, L - W, N).astype(np.int32))
    siw = jnp.stack([cell, srtw], axis=1)
    dnw_row = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1))
    dnw_col = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 1), collapsed_slice_dims=(0,), start_index_map=(0, 1))

    @jax.jit
    def win_row_t(tab, si):
        out = jax.lax.gather(tab, si, dnw_row, (1, W, KC),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return jnp.moveaxis(out, 0, -1) + 1.0

    @jax.jit
    def win_col(tab, si):
        out = jax.lax.gather(tab, si, dnw_col, (1, W, KC),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out + 1.0

    t3 = bench(win_row_t, tabw, siw)
    t4 = bench(win_col, tabw, siw)
    bw = N * W * KC * 4
    print(f"win rows+T  : {t3*1e3:8.2f} ms  {bw/t3/1e9:7.1f} GB/s useful")
    print(f"win direct  : {t4*1e3:8.2f} ms  {bw/t4/1e9:7.1f} GB/s useful")


if __name__ == "__main__":
    main()
