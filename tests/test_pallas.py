"""Pallas fused-step kernel: interpret-mode validation vs the XLA path.

Runs through the Pallas interpreter on CPU (bit-level same program
semantics); on TPU the same call compiles natively and is exercised by
bench.py and test_advect.py::test_pallas_driver_matches_xla.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mops_tpu as mt
from mops_tpu import advect
from mops_tpu.pallas import fused_streamline_step, pack_vertex_table


@pytest.fixture(scope="module")
def case(mesh, sol):
    rng = np.random.default_rng(5)
    n = 256
    v = rng.normal(size=(n, 3))
    seeds = (v / np.linalg.norm(v, axis=1, keepdims=True) * mt.EARTH_RADIUS)
    cells = jnp.asarray(mt.CellSearch(mesh).query(seeds))
    pos = jnp.asarray(seeds)
    depth_neg = jnp.full(n, -500.0)
    return mesh, sol, pos, cells, depth_neg


def _packed_lane_layout(mesh, sol, cells):
    vids, nv, lane_valid, vids_ok, vpos = advect._gather_cell_vertices(
        mesh, cells)
    tab = pack_vertex_table(jnp.asarray(mesh.vertex_xyz), sol.vertex_ztop,
                            sol.vertex_velocity, sol.vertex_vert_velocity)
    cols = jnp.moveaxis(tab[vids], 0, -1)              # (K, F, N)
    return nv, vids, lane_valid, vids_ok, vpos, cols


def _xla_stage(mesh, sol, vids, nv, lane_valid, vids_ok, vpos, depth_neg):
    ztop_cols = sol.vertex_ztop[vids]
    vel_cols = sol.vertex_velocity[vids]
    wvel_cols = sol.vertex_vert_velocity[vids]

    def eval_at(p):
        return advect._eval_stage_streamline(
            ztop_cols, vel_cols, wvel_cols, p, depth_neg, nv, lane_valid,
            vids_ok, vpos, False)
    return eval_at


def test_fused_step_matches_xla_rk4(case):
    mesh, sol, pos, cells, depth_neg = case
    dt = 600.0
    L = sol.vertex_ztop.shape[1]
    nv, vids, lane_valid, vids_ok, vpos, cols = _packed_lane_layout(
        mesh, sol, cells)

    new_pos_t, hvel_t, wvel_out, ok_t = fused_streamline_step(
        jnp.moveaxis(pos, 0, -1), depth_neg[None], nv[None].astype(jnp.int32),
        cols, L, dt, block=256, interpret=True)

    # XLA reference for the same step (ZERO-mode RK4, exact clamp off)
    eval_at = _xla_stage(mesh, sol, vids, nv, lane_valid, vids_ok, vpos,
                         depth_neg)
    k1, w1, ok1 = eval_at(pos)
    p2 = advect._advect_on_sphere(pos, k1, dt * 0.5)
    k2, w2, ok2 = eval_at(p2)
    p3 = advect._advect_on_sphere(pos, k2, dt * 0.5)
    k3, w3, ok3 = eval_at(p3)
    p4 = advect._advect_on_sphere(pos, k3, dt)
    k4, w4, ok4 = eval_at(p4)
    hvel = (k1 + 2 * k2 + 2 * k3 + k4) / 6.0
    wvel = (w1 + 2 * w2 + 2 * w3 + w4) / 6.0
    ok = ok1 & ok2 & ok3 & ok4
    r = jnp.linalg.norm(pos, axis=-1)
    x_trial = pos + hvel * dt
    xl = jnp.linalg.norm(x_trial, axis=-1)
    new_pos = jnp.where((xl > 1e-12)[:, None],
                        x_trial / xl[:, None] * r[:, None], pos)

    np.testing.assert_allclose(np.asarray(new_pos_t).T, np.asarray(new_pos),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hvel_t).T, np.asarray(hvel),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(wvel_out)[0], np.asarray(wvel),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(ok_t)[0].astype(bool),
                                  np.asarray(ok))


def test_fused_step_euler(case):
    mesh, sol, pos, cells, depth_neg = case
    dt = 600.0
    L = sol.vertex_ztop.shape[1]
    nv, vids, lane_valid, vids_ok, vpos, cols = _packed_lane_layout(
        mesh, sol, cells)
    new_pos_t, hvel_t, _, ok_t = fused_streamline_step(
        jnp.moveaxis(pos, 0, -1), depth_neg[None], nv[None].astype(jnp.int32),
        cols, L, dt, block=256, interpret=True, euler=True)
    eval_at = _xla_stage(mesh, sol, vids, nv, lane_valid, vids_ok, vpos,
                         depth_neg)
    hvel, wv, ok = eval_at(pos)
    np.testing.assert_allclose(np.asarray(hvel_t).T, np.asarray(hvel),
                               atol=1e-10)
    np.testing.assert_array_equal(np.asarray(ok_t)[0].astype(bool),
                                  np.asarray(ok))


def test_windowed_streamline_bitexact_vs_full(mesh, raw_fields, seeds, cells):
    """The layer-windowed fast path must be BIT-EXACT vs the full-table
    kernel whenever no window miss occurs (same float ops, same order)."""
    import jax
    import jax.numpy as jnp
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32)
        if np.asarray(a).dtype == np.float64 else a, mesh)
    sol32 = mt.preprocess(mesh32, {k: np.asarray(v, np.float32)
                                   for k, v in raw_fields.items()})
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 10,
                                record_t=1200, depth=150.0,
                                fail_mode=mt.FailMode.ZERO)
    seeds32 = seeds.astype(np.float32)
    full = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                            dtype=jnp.float32, use_pallas=True,
                            use_window=False)
    win = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                           dtype=jnp.float32, use_pallas=True,
                           use_window=True)
    # same ops in the same order; XLA may still fuse fma differently
    # between the two programs -> allow ulp-level drift only
    np.testing.assert_allclose(np.asarray(win.points),
                               np.asarray(full.points), rtol=0, atol=2.0)
    np.testing.assert_allclose(np.asarray(win.final_position),
                               np.asarray(full.final_position),
                               rtol=0, atol=2.0)


def test_windowed_pathline_attrs_bitexact_vs_full(mesh, raw_fields, seeds,
                                                  cells):
    import jax
    import jax.numpy as jnp
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32)
        if np.asarray(a).dtype == np.float64 else a, mesh)
    sol32 = mt.preprocess(mesh32, {k: np.asarray(v, np.float32)
                                   for k, v in raw_fields.items()})
    raw2 = {k: (np.asarray(v, np.float32)
                * (1.2 if k.startswith("velocity") else 1.0))
            for k, v in raw_fields.items()}
    back32 = mt.preprocess(mesh32, raw2)
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 10,
                                record_t=1200, depth=150.0,
                                fail_mode=mt.FailMode.ZERO)
    seeds32 = seeds.astype(np.float32)
    full = mt.run_advection(mesh32, sol32, seeds32, cells, cfg, back=back32,
                            dtype=jnp.float32, use_pallas=True,
                            use_window=False)
    win = mt.run_advection(mesh32, sol32, seeds32, cells, cfg, back=back32,
                           dtype=jnp.float32, use_pallas=True,
                           use_window=True)
    np.testing.assert_allclose(np.asarray(win.points),
                               np.asarray(full.points), rtol=0, atol=2.0)
    assert win.attrs is not None
    np.testing.assert_allclose(np.asarray(win.attrs),
                               np.asarray(full.attrs), rtol=0, atol=1e-4)


def test_packed_row_mode_bitexact_vs_full(mesh, raw_fields, seeds, cells,
                                           monkeypatch):
    """The packed big-row mode (MOPS_WINDOW_PACK=1: one materialized
    (cell, start) row gather per step, relocation candidates carried from the
    previous row) must reproduce the full-table kernel results."""
    import os
    import jax
    import jax.numpy as jnp
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32)
        if np.asarray(a).dtype == np.float64 else a, mesh)
    sol32 = mt.preprocess(mesh32, {k: np.asarray(v, np.float32)
                                   for k, v in raw_fields.items()})
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 10,
                                record_t=1200, depth=150.0,
                                fail_mode=mt.FailMode.ZERO)
    seeds32 = seeds.astype(np.float32)
    full = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                            dtype=jnp.float32, use_pallas=True,
                            use_window=False)
    monkeypatch.setenv("MOPS_WINDOW_PACK", "1")
    packed = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                              dtype=jnp.float32, use_pallas=True,
                              use_window=True)
    np.testing.assert_allclose(np.asarray(packed.points),
                               np.asarray(full.points), rtol=0, atol=2.0)
    np.testing.assert_allclose(np.asarray(packed.final_position),
                               np.asarray(full.final_position),
                               rtol=0, atol=2.0)


def test_packed_row_pathline_attrs_vs_full(mesh, raw_fields, seeds, cells,
                                            monkeypatch):
    """Packed mode, pathline with attributes: two snapshot windows share one
    row; attrs and positions must match the full-table kernel."""
    import os
    import jax
    import jax.numpy as jnp
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32)
        if np.asarray(a).dtype == np.float64 else a, mesh)
    sol32 = mt.preprocess(mesh32, {k: np.asarray(v, np.float32)
                                   for k, v in raw_fields.items()})
    raw2 = {k: (np.asarray(v, np.float32)
                * (1.2 if k.startswith("velocity") else 1.0))
            for k, v in raw_fields.items()}
    back32 = mt.preprocess(mesh32, raw2)
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 8,
                                record_t=1200, depth=150.0,
                                fail_mode=mt.FailMode.ZERO)
    seeds32 = seeds.astype(np.float32)
    full = mt.run_advection(mesh32, sol32, seeds32, cells, cfg, back=back32,
                            dtype=jnp.float32, use_pallas=True,
                            use_window=False)
    monkeypatch.setenv("MOPS_WINDOW_PACK", "1")
    packed = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                              back=back32, dtype=jnp.float32,
                              use_pallas=True, use_window=True)
    np.testing.assert_allclose(np.asarray(packed.points),
                               np.asarray(full.points), rtol=0, atol=2.0)
    assert packed.attrs is not None
    np.testing.assert_allclose(np.asarray(packed.attrs),
                               np.asarray(full.attrs), rtol=0, atol=1e-4)


def test_pack_budget_resolver(monkeypatch):
    """resolve_use_pack: auto path respects the byte budget; env overrides."""
    import os
    from mops_tpu.pallas.window_kernel import (pack_row_floats,
                                               resolve_use_pack)
    assert pack_row_floats(1, 8, 8, 5) % 128 == 0
    # small mesh fits the default budget
    assert resolve_use_pack(True, 20000, 60, 8, 1, 8, 5)
    # multi-million-cell mesh blows the budget -> auto-off
    assert not resolve_use_pack(True, 3_000_000, 80, 8, 2, 8, 7)
    # windowed off -> always off
    assert not resolve_use_pack(False, 100, 60, 8, 1, 8, 5)
    monkeypatch.setenv("MOPS_WINDOW_PACK", "0")
    assert not resolve_use_pack(True, 100, 60, 8, 1, 8, 5)


def test_windowed_miss_fallback(mesh, raw_fields, seeds, cells,
                                monkeypatch):
    """With W below the safe margin the guard band triggers and the driver
    must fall back to the full kernel -- results still match."""
    import jax
    import jax.numpy as jnp
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32)
        if np.asarray(a).dtype == np.float64 else a, mesh)
    sol32 = mt.preprocess(mesh32, {k: np.asarray(v, np.float32)
                                   for k, v in raw_fields.items()})
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 6,
                                record_t=1200, depth=150.0,
                                fail_mode=mt.FailMode.ZERO)
    seeds32 = seeds.astype(np.float32)
    full = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                            dtype=jnp.float32, use_pallas=True,
                            use_window=False)
    monkeypatch.setenv("MOPS_WINDOW_W", "4")   # tiny window -> misses likely
    win = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                           dtype=jnp.float32, use_pallas=True,
                           use_window=True)
    np.testing.assert_allclose(np.asarray(win.points),
                               np.asarray(full.points), rtol=0, atol=2.0)


def test_reference_scale_shapes_L80_interpret(monkeypatch):
    """Reference-scale vertical extent (80 layers, maxEdges >= 7, land-masked
    region) through the windowed kernel in interpret mode -- proves the
    shapes the VMEM budget guard sizes for.  MOPS_WINDOW_FALLBACK=0 skips
    tracing the (separately tested) full-table fallback, whose L=80 unrolled
    interpret compile takes tens of minutes on CPU; the XLA reference
    comparison still catches any windowed-path wrongness."""
    import os
    import jax
    import jax.numpy as jnp
    from mops_tpu.pallas.stage_kernel import vmem_block_limit
    L = 80
    mesh = mt.synth.build_voronoi_mesh(300, n_layers=L, jitter=0.05, seed=3,
                                       land_box=(10.0, 40.0, -60.0, -20.0))
    raw = mt.synth.solid_body_fields(mesh, n_layers=L, w_scale=1e-4)
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32)
        if np.asarray(a).dtype == np.float64 else a, mesh)
    sol32 = mt.preprocess(mesh32, {k: np.asarray(v, np.float32)
                                   for k, v in raw.items()})
    K = int(np.asarray(mesh32.vertices_on_cell).shape[1])
    assert K >= 7
    # VMEM guard must shrink the pathline-with-attrs block at L=80
    assert vmem_block_limit(K, L, 2, 2) <= vmem_block_limit(K, 10, 1, 0)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(8, 3))
    seeds = (v / np.linalg.norm(v, axis=1, keepdims=True)
             * mt.EARTH_RADIUS).astype(np.float32)
    cells = mt.CellSearch(mesh32).query(seeds)
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 4,
                                record_t=1200, depth=300.0,
                                fail_mode=mt.FailMode.ZERO)
    ref = mt.run_advection(mesh32, sol32, seeds, cells, cfg,
                           dtype=jnp.float32, use_pallas=False)
    monkeypatch.setenv("MOPS_WINDOW_FALLBACK", "0")
    monkeypatch.setenv("MOPS_WINDOW_W", "16")
    win = mt.run_advection(mesh32, sol32, seeds, cells, cfg,
                           dtype=jnp.float32, use_pallas=True,
                           use_window=True)
    np.testing.assert_allclose(np.asarray(win.points),
                               np.asarray(ref.points), rtol=0, atol=5.0)


def test_chunked_window_table_build_matches(mesh, sol, monkeypatch):
    """The chunked build_window_tables path (MOPS_WINTAB_CHUNK below nC,
    clamped last chunk) must produce bit-identical tables to the
    all-at-once path."""
    import jax.numpy as jnp
    from mops_tpu.pallas.window_kernel import build_window_tables
    args = (mesh.vertices_on_cell, mesh.vertex_xyz,
            sol.vertex_ztop.astype(jnp.float32),
            sol.vertex_velocity.astype(jnp.float32),
            sol.vertex_vert_velocity.astype(jnp.float32))
    ref_tab, ref_kst, ref_c = build_window_tables(*args)
    monkeypatch.setenv("MOPS_WINTAB_CHUNK", "96")   # mesh has 500 cells
    tab, kst, c = build_window_tables(*args)
    assert c == ref_c
    np.testing.assert_array_equal(np.asarray(tab), np.asarray(ref_tab))
    np.testing.assert_array_equal(np.asarray(kst), np.asarray(ref_kst))


def test_packed_stride_quantized_matches_full(mesh, raw_fields, seeds, cells,
                                              monkeypatch):
    """Stride-quantized pack mode (window starts every S layers, W widened
    by pack_stride_plan) must reproduce the full-table kernel results --
    the table layout that scales to multi-100k-cell meshes."""
    import jax
    import jax.numpy as jnp
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32)
        if np.asarray(a).dtype == np.float64 else a, mesh)
    sol32 = mt.preprocess(mesh32, {k: np.asarray(v, np.float32)
                                   for k, v in raw_fields.items()})
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 10,
                                record_t=1200, depth=150.0,
                                fail_mode=mt.FailMode.ZERO)
    seeds32 = seeds.astype(np.float32)
    full = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                            dtype=jnp.float32, use_pallas=True,
                            use_window=False)
    monkeypatch.setenv("MOPS_WINDOW_PACK", "1")
    monkeypatch.setenv("MOPS_PACK_STRIDE", "3")
    packed = mt.run_advection(mesh32, sol32, seeds32, cells, cfg,
                              dtype=jnp.float32, use_pallas=True,
                              use_window=True)
    np.testing.assert_allclose(np.asarray(packed.points),
                               np.asarray(full.points), rtol=0, atol=2.0)
    np.testing.assert_allclose(np.asarray(packed.final_position),
                               np.asarray(full.final_position),
                               rtol=0, atol=2.0)


def test_pack_stride_plan_coverage():
    """Every layer's exact start must be covered by a quantized row."""
    from mops_tpu.pallas.window_kernel import (pack_stride_plan,
                                               window_margin)
    for L in (6, 20, 60, 80):
        W = 8 if L >= 8 else 4
        for S in (1, 2, 3, 8, 16, 24):
            w_eff, nsq = pack_stride_plan(S, L, W)
            starts = [min(i * S, L - w_eff) for i in range(nsq)]
            m = window_margin(W)
            for layer in range(L):
                s_star = min(max(layer - m, 0), L - w_eff)
                q = min(s_star // S, nsq - 1)
                start = starts[q]
                assert start <= s_star
                # widened window must cover what the W-window at s_star would
                assert start + w_eff >= min(s_star + W, L)


def test_pack_table_int_tail_value_encoded(mesh, sol):
    """The pack-row int tail must be VALUE-encoded f32 (enc_i32), never a
    bitcast: XLA:TPU flushes f32-subnormal bit patterns (ids < 2^23) and
    canonicalizes the -1 pad's NaN payload, which silently zeroed the
    connectivity on real TPU through round 4 while every CPU test passed
    (round-5 critical fix).  This pins the decoded tail to the mesh tables
    and the encoded values to NORMAL-range floats."""
    from mops_tpu.advect import build_reloc_xyz
    from mops_tpu.pallas.window_kernel import (build_pack_table_fields,
                                               dec_i32, enc_i32,
                                               pack_stride_plan)
    L = int(sol.vertex_ztop.shape[1])
    W_eff, NSQ = pack_stride_plan(1, L, 4)
    reloc = build_reloc_xyz(mesh)
    tab, _ = build_pack_table_fields(
        [(sol.vertex_ztop, sol.vertex_velocity, sol.vertex_vert_velocity,
          None)],
        mesh.vertices_on_cell, mesh.vertex_xyz, reloc,
        mesh.cells_on_cell, mesh.n_edges_on_cell, W_eff, L, stride=1)
    K = int(np.asarray(mesh.vertices_on_cell).shape[1])
    KC = K * 5
    o3 = W_eff * KC + 5 * K + 3 * (K + 1)
    tail = np.asarray(tab)[:, 0, o3:o3 + 2 * K + 1]
    ints = np.asarray(dec_i32(jnp.asarray(tail)))
    np.testing.assert_array_equal(ints[:, :K],
                                  np.asarray(mesh.vertices_on_cell))
    np.testing.assert_array_equal(ints[:, K:2 * K],
                                  np.asarray(mesh.cells_on_cell))
    np.testing.assert_array_equal(ints[:, 2 * K],
                                  np.asarray(mesh.n_edges_on_cell))
    # encoded values must be normal-range floats (or exact zero): a bitcast
    # would put small ids in the subnormal range and -1 at a NaN payload
    finite = tail[tail != 0.0]
    assert np.isfinite(finite).all()
    assert (np.abs(finite) >= np.finfo(np.float32).tiny).all()
    # round-trip sanity incl. the -1 sentinel
    v = jnp.asarray([-1, 0, 1, 5, 4094, (1 << 24) - 1], jnp.int32)
    np.testing.assert_array_equal(np.asarray(dec_i32(enc_i32(v))),
                                  np.asarray(v))
