"""Domain-decomposition + particle-migration tests (8 virtual CPU devices).

Gold standard: the migrating run must reproduce the single-device ZERO-mode
engine's recorded positions exactly (same float ops on the same local values;
only the table indexing differs)."""

import jax
import numpy as np
import pytest

import mops_tpu as mt
from mops_tpu.parallel.decompose import decompose, partition_cells
from mops_tpu.parallel.migrate import (reassemble, run_advection_migrating,
                                       SHARD_AXIS)


@pytest.fixture(scope="module")
def fixture32(mesh, sol):
    import jax.numpy as jnp
    mesh32 = jax.tree.map(
        lambda a: a.astype(np.float32) if np.asarray(a).dtype == np.float64 else a,
        mesh)
    sol32 = sol.astype(jnp.float32)
    return mesh32, sol32


def test_partition_covers_all_cells(mesh):
    owner = partition_cells(mesh, 8)
    assert owner.shape == (mesh.n_cells,)
    assert set(np.unique(owner)) == set(range(8))
    counts = np.bincount(owner)
    assert counts.max() - counts.min() <= 1


def test_decompose_local_tables_consistent(mesh, sol):
    dec = decompose(mesh, sol, 4, halo_rings=1)
    for p in range(4):
        nl = int(dec.n_local_cells[p])
        l2g = dec.cell_l2g[p, :nl]
        # local cell coordinates match the global mesh
        np.testing.assert_allclose(dec.cell_xyz[p, :nl],
                                   np.asarray(mesh.cell_xyz)[l2g], rtol=1e-6)
        # g2l inverts l2g
        assert (dec.cell_g2l[p][l2g] == np.arange(nl)).all()
        # every owned cell's neighbors are resident (halo ring 1)
        own = dec.owner[p, :nl] == p
        coc_local = dec.cells_on_cell[p, :nl][own]
        coc_global = np.asarray(mesh.cells_on_cell)[l2g[own]]
        resident = coc_local >= 0
        # neighbors that exist globally must be resident locally
        assert (resident | (coc_global < 0)).all()


def test_migrating_matches_single_device(mesh, sol, seeds, cells):
    import jax.numpy as jnp
    cfg = mt.TrajectorySettings(delta_t=600, simulation_duration=600 * 20,
                                record_t=1200, depth=200.0,
                                fail_mode=mt.FailMode.ZERO)
    seeds32 = seeds.astype(np.float32)

    single = mt.run_advection(mesh, sol, seeds32, cells, cfg,
                              exact_clamp=False, dtype=jnp.float32)

    result = run_advection_migrating(mesh, sol, seeds32, cells, cfg)
    assert int(np.asarray(result.dropped).sum()) == 0
    points, final_pos, final_depth = reassemble(result, len(seeds), seeds32)

    np.testing.assert_allclose(points, np.asarray(single.points), atol=2e-1)
    np.testing.assert_allclose(final_pos, np.asarray(single.final_position),
                               atol=2e-1)
    np.testing.assert_allclose(final_depth, np.asarray(single.final_depth),
                               atol=1e-3)


def test_migration_actually_happens(mesh, sol, cells):
    """Seeds near a partition boundary must cross shards without losses."""
    import jax.numpy as jnp
    # seed a band of fast-moving particles along the equator (zonal flow
    # carries them eastward across the longitude-sector boundaries)
    lons = np.deg2rad(np.linspace(-179, 179, 64))
    lats = np.zeros_like(lons)
    seeds = np.asarray(mt.geo.latlon_rad_to_xyz(lats, lons)).astype(np.float32)
    start_cells = mt.CellSearch(mesh).query(seeds)
    cfg = mt.TrajectorySettings(delta_t=3600, simulation_duration=3600 * 30,
                                record_t=3600 * 5, depth=100.0,
                                fail_mode=mt.FailMode.ZERO)
    result = run_advection_migrating(mesh, sol, seeds, start_cells, cfg)
    fids = np.asarray(result.final_ids)
    assert int(np.asarray(result.dropped).sum()) == 0
    # every particle still accounted for exactly once
    ids = fids[fids >= 0]
    assert sorted(ids.tolist()) == list(range(64))
    # and the id -> shard distribution changed vs the start
    owner0 = np.zeros(64, dtype=int)
    ownerN = np.zeros(64, dtype=int)
    start_owner = {}
    from mops_tpu.parallel.decompose import partition_cells
    owner_g = partition_cells(mesh, 8)
    for i, c in enumerate(start_cells):
        owner0[i] = owner_g[c]
    for p in range(fids.shape[0]):
        for i in fids[p][fids[p] >= 0]:
            ownerN[i] = p
    assert (owner0 != ownerN).any(), "no particle changed shard"
