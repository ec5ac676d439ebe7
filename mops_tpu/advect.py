"""Streamline / pathline advection: vmapped particles, lax.scan over steps.

TPU-native re-design of the reference trajectory kernels
(reference src/GPU/SYCL/MPASOVisualizerSYCL.cpp:669-1194 StreamLine,
:1221-1917 PathLine; scalar semantics per the CPU backend
src/CPU/TBB/Kernel/MPASOVisualizerKernels.cpp:668-1496, which is the golden
baseline).  Every per-particle branch (containment test, layer search, zero
-velocity early exits, neighbor-walk cell relocation) becomes masked/select
arithmetic so one XLA program advances the whole particle batch per step.

Step pipeline (one lax.scan iteration):
  relocate -> gather cell vertex data once (shared by all RK stages)
  -> per-stage: Wachspress weights, ztop profile + monotonic clamp,
     layer search, vertical lerp of velocity / vertical-velocity / attrs
  -> RK4 or Euler position update on the sphere -> depth/radius update
  -> strided record into the (N, R, 3) output buffers.

Exact-parity quirks preserved (see SURVEY.md section 7.0): cell relocation once
per outer step with the cell id frozen across RK stages; ztop monotonic clamp
z[k] -> z[k-1] - 1e-9; streamline binary layer search vs pathline linear scan;
zero-velocity guards at 1e-12; RK4 endpoint renormalized to the pre-step
radius; depth (positive down) decremented while radius is incremented by w*dt;
particle depth carried as float32 like the reference's effective_depths.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import geo
from .config import EPS_LAYER, EPS_ZERO, ZTOP_CLAMP
from .interp import wachspress_weights
from .mesh import MPASMesh
from .settings import CalcDirection, CalcMethod, FailMode, TrajectorySettings
from .solution import SolutionFields


# ---------------------------------------------------------------------------
# geometry helpers (full-batch)
# ---------------------------------------------------------------------------

def _gather_cell_vertices(mesh: MPASMesh, cell: jax.Array,
                          with_pos: bool = True):
    """vids, nv, lane_valid, vids_ok, vpos for each particle's current cell.
    ``with_pos=False`` skips the vertex-coordinate gather (the Pallas path
    reads positions from the packed column table instead)."""
    vids_raw = mesh.vertices_on_cell[cell]               # (N, K)
    nv = mesh.n_edges_on_cell[cell]                      # (N,)
    K = vids_raw.shape[1]
    lane = jnp.arange(K)[None, :]
    lane_valid = lane < nv[:, None]
    vids_ok = jnp.all(jnp.where(lane_valid, vids_raw >= 0, True), axis=1)
    vids = jnp.clip(vids_raw, 0)
    vpos = mesh.vertex_xyz[vids] if with_pos else None   # (N, K, 3)
    return vids, nv, lane_valid, vids_ok, vpos


def _in_mesh(pos: jax.Array, vpos: jax.Array, nv: jax.Array,
             lane_valid: jax.Array) -> jax.Array:
    """Spherical point-in-polygon (reference SYCLKernel::IsInMesh,
    src/GPU/SYCL/Kernel/SYCLKernel.cpp:41-76): inside iff
    cross(A_k, B_k) . p >= 0 for every edge; non-finite p -> outside.
    Edge partner B via a static roll + one-lane fixup (gather-free)."""
    K = vpos.shape[1]
    lane = jnp.arange(K)[None, :]
    rolled = jnp.roll(vpos, -1, axis=1)
    b = jnp.where((lane == nv[:, None] - 1)[..., None], vpos[:, :1, :], rolled)
    direction = jnp.sum(jnp.cross(vpos, b) * pos[:, None, :], axis=-1)
    inside = jnp.all(jnp.where(lane_valid, direction >= 0.0, True), axis=1)
    finite = jnp.all(jnp.isfinite(pos), axis=-1)
    return finite & inside


def build_reloc_xyz(mesh: MPASMesh) -> jax.Array:
    """(nC, K+1, 3) candidate positions for the relocation argmin: lanes
    0..K-1 = cellsOnCell neighbor centers (+inf where the neighbor is absent
    or out of range, so its distance is +inf), lane K = the cell's own
    center.  Precomputing the neighbor coordinates turns the per-step
    two-level gather cell_xyz[cells_on_cell[cell]] into ONE row gather."""
    coc = mesh.cells_on_cell
    cx = mesh.cell_xyz
    valid = (coc >= 0) & (coc < mesh.n_cells)
    nb = jnp.where(valid[..., None], cx[jnp.clip(coc, 0, mesh.n_cells - 1)],
                   jnp.inf)
    return jnp.concatenate([nb, cx[:, None, :]], axis=1)


def _relocate_rows(row: jax.Array, coc: jax.Array, nv: jax.Array,
                   pos: jax.Array, cell: jax.Array) -> jax.Array:
    """Argmin-over-{neighbors, self} from pre-gathered candidate rows
    (row (N, K+1, 3), coc (N, K), nv (N,)).  The candidate order (neighbors
    at lanes < nv, self at lane nv, rest invalid) and therefore the
    first-minimum tie-breaking is identical to GetCellNeighborsIdx
    (reference SYCLKernel.cpp:79-98)."""
    K = row.shape[1] - 1
    lane = jnp.arange(K + 1)[None, :]
    d2 = jnp.sum((row - pos[:, None, :]) ** 2, axis=-1)  # (N, K+1)
    d2 = jnp.where(lane == nv[:, None], d2[:, K:],
                   jnp.where(lane >= nv[:, None], jnp.inf, d2))
    best = jnp.argmin(d2, axis=1)
    pick = jnp.sum(jnp.where(lane[:, :K] == best[:, None], coc, 0), axis=1,
                   dtype=coc.dtype)
    return jnp.where(best == nv, cell, pick)


def _relocate_packed(mesh: MPASMesh, reloc_xyz: jax.Array,
                     pos: jax.Array, cell: jax.Array) -> jax.Array:
    """_relocate_rows driven by per-cell gathers from the mesh tables."""
    return _relocate_rows(reloc_xyz[cell], mesh.cells_on_cell[cell],
                          mesh.n_edges_on_cell[cell], pos, cell)


def _relocate(mesh: MPASMesh, pos: jax.Array, cell: jax.Array) -> jax.Array:
    """Argmin-distance over {cellsOnCell(cell), cell} -- the reference's
    neighbor-walk relocation (TBB kernel :902-921), with self appended at lane
    nv exactly like GetCellNeighborsIdx (SYCLKernel.cpp:79-98) so first-minimum
    tie-breaking matches."""
    nv = mesh.n_edges_on_cell[cell]                      # (N,)
    coc = mesh.cells_on_cell[cell]                       # (N, K)
    lane = jnp.arange(coc.shape[1] + 1)[None, :]
    coc_ext = jnp.concatenate(
        [coc, jnp.full((coc.shape[0], 1), -1, dtype=coc.dtype)], axis=1)
    cand = jnp.where(lane == nv[:, None], cell[:, None], coc_ext)
    valid = (cand >= 0) & (cand < mesh.n_cells) & (lane <= nv[:, None])
    d2 = jnp.sum((mesh.cell_xyz[jnp.clip(cand, 0)] - pos[:, None, :]) ** 2,
                 axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)
    return jnp.sum(jnp.where(lane == best[:, None], cand, 0), axis=1,
                   dtype=cand.dtype)


def _advect_on_sphere(pos: jax.Array, vel: jax.Array, dt):
    """RK mid-stage move (TBB advect_on_sphere, kernel :729-738): Rodrigues
    rotation by theta = |v| dt / |p|, identity if |p| or |v| < 1e-12."""
    rr = jnp.linalg.norm(pos, axis=-1)
    speed = jnp.linalg.norm(vel, axis=-1)
    degenerate = (rr < EPS_ZERO) | (speed < EPS_ZERO)
    axis = jnp.cross(pos, vel)
    theta = speed * dt / jnp.where(rr == 0.0, 1.0, rr)
    safe_axis = jnp.where(degenerate[..., None],
                          jnp.array([1.0, 0.0, 0.0], dtype=pos.dtype), axis)
    rotated = geo.rotate_around_axis(pos, safe_axis, theta)
    return jnp.where(degenerate[..., None], pos, rotated)


# ---------------------------------------------------------------------------
# vertical column machinery
# ---------------------------------------------------------------------------

def _clamp_profile(z: jax.Array, exact: bool) -> jax.Array:
    """Monotonic ztop clamp z[k] = (z[k] > z'[k-1]) ? z'[k-1]-1e-9 : z[k]
    (reference kernel :861-867).  ``exact=False`` uses a parallel cummin form
    that differs from the sequential recurrence only by < 1e-9 m."""
    if exact:
        def f(prev, zk):
            out = jnp.where(zk > prev, prev - ZTOP_CLAMP, zk)
            return out, out
        z0 = z[:, 0]
        _, rest = jax.lax.scan(f, z0, jnp.moveaxis(z[:, 1:], 1, 0))
        return jnp.concatenate([z0[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)
    idx = jnp.arange(z.shape[1], dtype=z.dtype) * ZTOP_CLAMP
    return jax.lax.cummin(z + idx[None, :], axis=1) - idx[None, :]


def _layer_search_binary(z: jax.Array, depth: jax.Array) -> jax.Array:
    """Streamline layer resolution (reference kernel :903-944): above surface
    -> 1, below bottom -> L-1, else the exact binary search (emulated with a
    fixed unrolled trip count and masks)."""
    L = z.shape[1]
    lane = jnp.arange(L)
    above = depth > z[:, 0] + EPS_LAYER
    below = depth < z[:, -1] - EPS_LAYER
    lo = jnp.ones(depth.shape, dtype=jnp.int32)
    hi = jnp.full_like(lo, L - 1)
    ans = jnp.ones_like(lo)
    found = jnp.zeros(depth.shape, dtype=bool)

    def pick(idx):
        # one-hot row select from the (N, L) profile: TPU-friendly reduction
        # instead of a per-particle tiny-row gather
        return jnp.sum(jnp.where(lane[None, :] == idx[:, None], z, 0.0), axis=1)

    for _ in range(int(np.ceil(np.log2(max(2, L)))) + 2):
        active = (~found) & (lo <= hi)
        mid = (lo + hi) >> 1
        top_i = pick(mid - 1)
        bot_i = pick(mid)
        hit = (depth <= top_i + EPS_LAYER) & (depth >= bot_i - EPS_LAYER)
        ans = jnp.where(active & hit, mid, ans)
        found = found | (active & hit)
        go_up = depth > top_i + EPS_LAYER
        hi = jnp.where(active & ~hit & go_up, mid - 1, hi)
        lo = jnp.where(active & ~hit & ~go_up, mid + 1, lo)
    ans = jnp.clip(ans, 1, L - 1)
    return jnp.where(above, 1, jnp.where(below, L - 1, ans))


def _layer_search_linear(z: jax.Array, depth: jax.Array):
    """Pathline layer resolution (reference TBB kernel :1182-1222): above
    surface -> 0, below bottom -> L-1, else first k in [1, L-1] whose interval
    contains depth; none -> fail.

    Divergence from the reference (documented): layer 0 makes the reference
    read ztop[-1] (out of bounds, UB); here it is clamped to layer 1."""
    above = depth > z[:, 0] + EPS_LAYER
    below = depth < z[:, -1] - EPS_LAYER
    cond = (depth[:, None] <= z[:, :-1] + EPS_LAYER) & \
           (depth[:, None] >= z[:, 1:] - EPS_LAYER)          # k = 1..L-1
    found = jnp.any(cond, axis=1)
    first = jnp.argmax(cond, axis=1).astype(jnp.int32) + 1
    L = z.shape[1]
    layer = jnp.where(above, 1, jnp.where(below, L - 1, first))
    ok = above | below | found
    return layer, ok


def _vertical_lerp_t(z: jax.Array, layer: jax.Array, depth: jax.Array):
    """t = (clamp(depth) - z_dn) / (z_up - z_dn); fail if |denom| < 1e-12
    (reference kernel :958-985).  One-hot row selects (see _pick_two_layers)."""
    lane = jnp.arange(z.shape[1])
    z_dn = jnp.sum(jnp.where(lane[None, :] == layer[:, None], z, 0.0), axis=1)
    z_up = jnp.sum(jnp.where(lane[None, :] == (layer - 1)[:, None], z, 0.0),
                   axis=1)
    x = jnp.clip(depth, z_dn, z_up)
    denom = z_up - z_dn
    ok = jnp.abs(denom) >= EPS_ZERO
    t = (x - z_dn) / jnp.where(ok, denom, 1.0)
    return t, ok


def _weighted_vertex_value(table: jax.Array, vids: jax.Array,
                           layer: jax.Array, weights: jax.Array) -> jax.Array:
    """sum_k w_k * table[vid_k, layer] for (nV, L[,3]) tables
    (reference SYCLKernel::CalcVelocity / CalcAttribute)."""
    gathered = table[vids, layer[:, None]]               # (N, K[,3])
    if gathered.ndim == 3:
        return jnp.einsum("nk,nkd->nd", weights, gathered)
    return jnp.einsum("nk,nk->n", weights, gathered)


def _pick_two_layers(cols: jax.Array, w: jax.Array,
                     layer_up: jax.Array, layer_dn: jax.Array):
    """(up, dn) with up = sum_k w_k * cols[n, k, layer_up[n]] (same math as
    _weighted_vertex_value) computed as a one-hot contraction over L.

    TPU gathers are row-count bound: per-(particle, vertex, layer) element
    gathers lower to millions of tiny-row fetches, while a contraction against
    a one-hot layer vector streams the already-gathered (N, K, L[,3]) columns
    at full bandwidth.  The one-hot has a single nonzero, so the result is the
    exact selected value (0 * finite == 0)."""
    L = cols.shape[2]
    lane = jnp.arange(L)
    m_up = lane[None, :] == layer_up[:, None]      # (N, L) bool
    m_dn = lane[None, :] == layer_dn[:, None]

    # masked select + reduction over L (VPU streaming; XLA fuses the where
    # into the sum, so `cols` is read once per pick with no big temps) --
    # deliberately NOT an einsum: a (2 x L) x (L x K*3) batched dot lowers to
    # a degenerate MXU matmul that is pathologically slow at this shape.
    if cols.ndim == 4:
        v_up = jnp.sum(jnp.where(m_up[:, None, :, None], cols, 0.0), axis=2)
        v_dn = jnp.sum(jnp.where(m_dn[:, None, :, None], cols, 0.0), axis=2)
        return (jnp.einsum("nk,nkd->nd", w, v_up),
                jnp.einsum("nk,nkd->nd", w, v_dn))
    v_up = jnp.sum(jnp.where(m_up[:, None, :], cols, 0.0), axis=2)
    v_dn = jnp.sum(jnp.where(m_dn[:, None, :], cols, 0.0), axis=2)
    return (jnp.einsum("nk,nk->n", w, v_up),
            jnp.einsum("nk,nk->n", w, v_dn))


# ---------------------------------------------------------------------------
# stage evaluation
# ---------------------------------------------------------------------------

def _eval_stage_streamline(ztop_cols, vel_cols, wvel_cols,
                           pos, depth_neg, nv, lane_valid, vids_ok,
                           vpos, exact_clamp: bool):
    """One CalcVelocityAt evaluation (streamline).  Returns (hvel, wvel, ok);
    failed lanes carry zeros, mirroring the reference RET0.

    The ``*_cols`` args are the per-cell vertex-column gathers
    ((N,K,L) ztop, (N,K,L,3) velocity, (N,K,L+1) vertical velocity), hoisted
    out of the RK stages: all four stages share the particle's (frozen) cell,
    so the reference's per-stage reloads collapse to one row gather per step,
    and layer selection is a one-hot contraction (see _pick_two_layers)."""
    in_mesh = _in_mesh(pos, vpos, nv, lane_valid)
    w = wachspress_weights(pos, vpos, nv)

    z = jnp.einsum("nk,nkl->nl", w, ztop_cols)
    z = _clamp_profile(z, exact_clamp)
    layer = _layer_search_binary(z, depth_neg)
    t, ok_denom = _vertical_lerp_t(z, layer, depth_neg)

    v_up, v_dn = _pick_two_layers(vel_cols, w, layer - 1, layer)
    ok_mag = (jnp.linalg.norm(v_dn, axis=-1) >= EPS_ZERO) & \
             (jnp.linalg.norm(v_up, axis=-1) >= EPS_ZERO)
    hvel = t[:, None] * v_up + (1.0 - t[:, None]) * v_dn
    ok_final = jnp.linalg.norm(hvel, axis=-1) >= EPS_ZERO

    lp1 = wvel_cols.shape[2]
    dn_if = jnp.minimum(layer, lp1 - 1)
    up_if = jnp.minimum(jnp.maximum(layer - 1, 0), lp1 - 1)
    w_up, w_dn = _pick_two_layers(wvel_cols, w, up_if, dn_if)
    wvel = t * w_up + (1.0 - t) * w_dn

    ok = in_mesh & vids_ok & ok_denom & ok_mag & ok_final
    return (jnp.where(ok[:, None], hvel, 0.0),
            jnp.where(ok, wvel, 0.0), ok)


def _eval_stage_pathline(cols_f, cols_b,
                         pos, depth_neg, alpha, nv, lane_valid, vids_ok,
                         vpos, exact_clamp: bool):
    """One CalcVelocityAt(pos, cell, alpha) evaluation (pathline): independent
    layer search + vertical lerp in both snapshots, blended by alpha
    (reference TBB kernel :1124-1327).  Returns (hvel, wvel, attr, ok).

    ``cols_f``/``cols_b`` are per-solution dicts of hoisted per-cell column
    gathers {ztop (N,K,L), vel (N,K,L,3), wvel (N,K,L+1), attrs (N,K,L,A)?}
    shared by all RK stages; layer selection is a one-hot contraction."""
    in_mesh = _in_mesh(pos, vpos, nv, lane_valid)
    w = wachspress_weights(pos, vpos, nv)

    def column(cols):
        z = jnp.einsum("nk,nkl->nl", w, cols["ztop"])
        z = _clamp_profile(z, exact_clamp)
        layer, ok_layer = _layer_search_linear(z, depth_neg)
        t, ok_denom = _vertical_lerp_t(z, layer, depth_neg)
        return layer, t, ok_layer & ok_denom

    layer_f, t_f, ok_f = column(cols_f)
    layer_b, t_b, ok_b = column(cols_b)

    def hvel_of(cols, layer, t):
        v_up, v_dn = _pick_two_layers(cols["vel"], w, layer - 1, layer)
        return t[:, None] * v_up + (1.0 - t[:, None]) * v_dn

    def wvel_of(cols, layer, t):
        lp1 = cols["wvel"].shape[2]
        dn_if = jnp.minimum(layer, lp1 - 1)
        up_if = jnp.minimum(jnp.maximum(layer - 1, 0), lp1 - 1)
        w_up, w_dn = _pick_two_layers(cols["wvel"], w, up_if, dn_if)
        return t * w_up + (1.0 - t) * w_dn

    a = alpha
    hvel = a[:, None] * hvel_of(cols_b, layer_b, t_b) \
        + (1.0 - a[:, None]) * hvel_of(cols_f, layer_f, t_f)
    wvel = a * wvel_of(cols_b, layer_b, t_b) \
        + (1.0 - a) * wvel_of(cols_f, layer_f, t_f)

    attr = jnp.zeros((pos.shape[0], 3), dtype=pos.dtype)
    if cols_f.get("attrs") is not None:
        n_attr = min(cols_f["attrs"].shape[-1], cols_b["attrs"].shape[-1], 2)
        for ai in range(n_attr):
            def attr_of(cols, layer, t):
                a_up, a_dn = _pick_two_layers(cols["attrs"][..., ai], w,
                                              layer - 1, layer)
                return t * a_up + (1.0 - t) * a_dn
            val = a * attr_of(cols_b, layer_b, t_b) \
                + (1.0 - a) * attr_of(cols_f, layer_f, t_f)
            attr = attr.at[:, ai].set(val)

    ok = in_mesh & vids_ok & ok_f & ok_b
    return (jnp.where(ok[:, None], hvel, 0.0),
            jnp.where(ok, wvel, 0.0),
            jnp.where(ok[:, None], attr, 0.0), ok)


# ---------------------------------------------------------------------------
# integration driver
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RawTrajectories:
    """Device-side advection output, pre-finalization.

    points/velocities/attrs are the reference's flat record buffers reshaped to
    (N, R, 3) (slot 0 pre-seeded with the start position, see
    src/Common/TrajectoryCommon.h:15-27 + TBB kernel :901).
    """

    points: jax.Array              # (N, R, 3)
    velocities: jax.Array          # (N, R, 3)
    attrs: Optional[jax.Array]     # (N, R, 3) or None
    final_position: jax.Array      # (N, 3)  reference stable_points after run
    final_depth: jax.Array         # (N,)
    final_cell: jax.Array          # (N,)
    alive: jax.Array               # (N,)
    window_misses: Optional[jax.Array] = None   # (N,) int32 cumulative
    # layer-window misses per particle (windowed fast path only; the batch
    # falls back to the exact step whenever any lane misses, so sum() counts
    # fallback-triggering particle-steps)


# Resolved configuration of the most recent run_advection call (pallas /
# window / pack flags, kernel block, per-step gather bytes).  Tooling such as
# bench.py reads this instead of re-deriving the mode decision.
LAST_RESOLVED: dict = {}


def _cols_t(tab: jax.Array, vids: jax.Array) -> jax.Array:
    """Packed column table rows in kernel layout: tab (nV, F) gathered at
    vids (N, K) -> (K, F, N).  K transposed row gathers (batch dim last)
    replace the (N, K, F) gather + moveaxis, killing the full-size transpose
    pass (see window_kernel.rows_t)."""
    from .pallas.window_kernel import rows_t
    return jnp.stack([rows_t(tab, vids[:, k]) for k in range(vids.shape[1])])


def stacked_vertex_attrs(sol: SolutionFields) -> Optional[jax.Array]:
    """Vertex attributes stacked (nV, L, A) in lexicographic name order,
    mirroring the reference's std::map iteration order
    (src/GPU/SYCL/MPASOVisualizerSYCL.cpp:231-235)."""
    if len(sol.vertex_attrs) == 0:
        return None
    names = sorted(sol.vertex_attrs)
    return jnp.stack([sol.vertex_attrs[k] for k in names], axis=-1)


def record_schedule(settings: TrajectorySettings, pathline: bool):
    """Per-step (record_flag, record_slot) numpy arrays.

    Streamline records when run_time %% recordT == 0 with run_time = (i+1)*|dt|
    (reference TBB kernel :994); pathline when (i+1) %% (recordT/deltaT) == 0
    (TBB kernel :1470-1471).  Slots beyond R are dropped like the reference's
    bound check."""
    n_steps = settings.n_steps
    n_rec = settings.n_records
    i = np.arange(n_steps)
    if pathline:
        interval = int(settings.record_t) // int(settings.delta_t)
        flags = np.zeros(n_steps, dtype=bool) if interval <= 0 \
            else ((i + 1) % interval == 0)
    else:
        run_time = (i + 1) * abs(int(settings.delta_t))
        flags = (run_time % int(settings.record_t)) == 0
    slots = np.where(flags, np.cumsum(flags) - 1, 0).astype(np.int32)
    flags = flags & (slots < n_rec)
    return flags, slots


def _scan_core(mesh: MPASMesh, front: SolutionFields,
               back: Optional[SolutionFields],
               attr_front, attr_back,
               seeds, depths, cells,
               is_first_xs, flags_xs, slots_xs, alphas_xs, signed_dt,
               *, method: CalcMethod, fail_mode: FailMode, pathline: bool,
               duration: int, n_records: int, exact_clamp: bool,
               use_pallas: bool = False, pallas_interpret: bool = False,
               pallas_block: int = 256, use_window: bool = False,
               use_pack: int = 0, win_stride: int = 1,
               repair_cap: int = 1024):
    """Traceable advection core: builds the record buffers locally and runs
    the step scan.  Used directly under jit (single device) and inside
    shard_map (particle axis sharded; everything here is then shard-local, so
    the in-scan scatters need no cross-device resolution)."""
    real = seeds.dtype
    n = seeds.shape[0]
    dt = signed_dt.astype(real)
    freeze = fail_mode == FailMode.FREEZE
    # miss-repair capacity: lanes beyond this fall back to the whole-batch
    # exact step (0 disables the repair branch entirely)
    repair_cap = min(int(repair_cap), n)

    alive0 = (cells >= 0) & (cells < mesh.n_cells)

    # Hoisted per-run tables (built once before the scan, inside jit):
    # packed relocation candidates, and -- for the Pallas path -- the fused
    # per-vertex column table plus per-cell misc rows so the step does ONE
    # row gather per logical access (TPU gathers are row-descriptor-bound;
    # five narrow per-cell gathers cost ~5x one wide row gather).
    reloc_xyz = build_reloc_xyz(mesh)
    packed_tab = packed_tab_b = reloc_pack = vert_misc = None
    win_tab = win_tab_b = kstatic_tab = None
    pack_tab = None
    NS = KC = 0
    W = 0
    n_attrs = 0
    if use_pallas:
        from .pallas.stage_kernel import pack_vertex_table
        if pathline and attr_front is not None and attr_back is not None:
            n_attrs = min(attr_front.shape[-1], attr_back.shape[-1], 2)
        af = attr_front[..., :n_attrs] if n_attrs else None
        ab = attr_back[..., :n_attrs] if n_attrs else None
        if not use_window:
            # full-table kernel is the primary path; windowed mode falls
            # back to the pure-XLA step instead, so it never pays this
            # (nV, F) HBM copy (at 500k cells / L=80 the packed copy plus
            # win_tab together exceed one chip's HBM)
            packed_tab = pack_vertex_table(
                mesh.vertex_xyz, front.vertex_ztop, front.vertex_velocity,
                front.vertex_vert_velocity, af)
            if pathline:
                packed_tab_b = pack_vertex_table(
                    mesh.vertex_xyz, back.vertex_ztop, back.vertex_velocity,
                    back.vertex_vert_velocity, ab)
        if use_window:
            from .pallas.window_kernel import (build_pack_table_fields,
                                               build_window_tables,
                                               default_window)
            W = default_window(front.vertex_ztop.shape[1])
            C = 5 + (af.shape[-1] if af is not None else 0)
            KC = int(jnp.asarray(mesh.vertices_on_cell).shape[1]) * C
            kmax = mesh.cells_on_cell.shape[1]
            if use_pack:
                # packed-row fast path: one roofline-speed row gather per
                # step; relocation candidates ride in the carried row tail.
                # use_pack is the window-start STRIDE (pack_stride_plan):
                # stride > 1 widens W so the table fits large meshes.  The
                # table is built straight from the vertex field tables --
                # the intermediate window table never exists (it could not
                # coexist with the pack table in HBM at reference scale).
                from .pallas.window_kernel import pack_stride_plan
                W_base = W
                W, NSQ = pack_stride_plan(
                    int(use_pack), int(front.vertex_ztop.shape[1]), W)
                sets = [(front.vertex_ztop, front.vertex_velocity,
                         front.vertex_vert_velocity, af)]
                if pathline:
                    sets.append((back.vertex_ztop, back.vertex_velocity,
                                 back.vertex_vert_velocity, ab))
                pack_tab, NS = build_pack_table_fields(
                    sets, mesh.vertices_on_cell, mesh.vertex_xyz, reloc_xyz,
                    mesh.cells_on_cell, mesh.n_edges_on_cell, W,
                    int(front.vertex_ztop.shape[1]), stride=int(use_pack))
                win_tab = pack_tab     # branch flag: windowed machinery on
            else:
                # strided 3D window-only table (statics live in wstat): row
                # index (cell, q) keeps the window gather a contiguous
                # 128-lane row read at any mesh size -- the flat 2D table's
                # dynamic minor-dim start lowers elementwise (~0.6 GB/s
                # measured), and a (nC, L, KC) table is lane-padded 3.2x
                from .pallas.window_kernel import pack_stride_plan
                W_base = W
                W, NSQ = pack_stride_plan(
                    int(win_stride), int(front.vertex_ztop.shape[1]), W)
                sets = [(front.vertex_ztop, front.vertex_velocity,
                         front.vertex_vert_velocity, af)]
                if pathline:
                    sets.append((back.vertex_ztop, back.vertex_velocity,
                                 back.vertex_vert_velocity, ab))
                win_tab, NS = build_pack_table_fields(
                    sets, mesh.vertices_on_cell, mesh.vertex_xyz, reloc_xyz,
                    mesh.cells_on_cell, mesh.n_edges_on_cell, W,
                    int(front.vertex_ztop.shape[1]),
                    stride=int(win_stride), with_statics=False)
                voc_c = jnp.clip(mesh.vertices_on_cell, 0)
                kstatic_tab = jnp.concatenate(
                    [jnp.asarray(mesh.vertex_xyz)[voc_c].reshape(
                        mesh.n_cells, -1),
                     front.vertex_ztop[:, 0][voc_c],
                     front.vertex_ztop[:, -1][voc_c]], axis=1)
                # merged static row (f32 windowed mode only): relocation
                # candidates + kernel statics + value-encoded connectivity
                # in ONE table, so the step does 2 static gathers (old cell
                # for relocation, new cell for evaluation) + 1 window gather
                # instead of 4 narrow gathers + 1 window gather.
                from .pallas.window_kernel import enc_i32 as f32i
                wstat_tab = jnp.concatenate(
                    [reloc_xyz.astype(jnp.float32).reshape(mesh.n_cells, -1),
                     kstatic_tab.astype(jnp.float32),
                     f32i(mesh.vertices_on_cell), f32i(mesh.cells_on_cell),
                     f32i(mesh.n_edges_on_cell[:, None])], axis=1)
        else:
            # reloc_pack rows: candidate xyz 3(K+1) in the RUN dtype (a
            # float32 table under a float64 run could pick a different cell
            # at near-tie distances); vert_misc rows: [vids K | coc K | nv 1]
            # int32 sidecar.
            kmax = mesh.cells_on_cell.shape[1]
            reloc_pack = reloc_xyz.astype(real).reshape(mesh.n_cells, -1)
            vert_misc = jnp.concatenate(
                [mesh.vertices_on_cell.astype(jnp.int32),
                 mesh.cells_on_cell.astype(jnp.int32),
                 mesh.n_edges_on_cell.astype(jnp.int32)[:, None]], axis=1)
    n_layers = front.vertex_ztop.shape[1]
    # Buffers derive from the (possibly shard_map-varying) particle inputs so
    # their vma type matches the scan updates; the select folds to zeros.
    zeros_varying = jnp.where(
        jnp.zeros((n, n_records, 3), dtype=bool), seeds[:, None, :],
        jnp.zeros((), dtype=real))
    # first_loop pre-seeds slot 0 with the start position (TBB kernel :901)
    pts = zeros_varying.at[:, 0].set(jnp.where(alive0[:, None], seeds, 0.0))
    vels = zeros_varying
    attrs_buf = zeros_varying if pathline else None

    def step(carry, x):
        pos, depth, cell, alive, layer_c, reloc_c = carry[:6]
        pts, vels, attrs_buf, miss_ct = carry[6:]
        is_first, rec_flag, rec_slot, alpha0 = x
        reloc_c_new = reloc_c
        srt = win_pre = win_pre_b = None

        depth_neg = (-depth).astype(real)

        do_reloc = (~is_first) & alive
        if pack_tab is not None:
            # Packed-row mode: relocation candidates come from the PREVIOUS
            # step's gathered row (carried), then ONE wide row gather at
            # (cell, window-start) yields windows + statics + next reloc row.
            from .pallas.window_kernel import (pack_row_gather,
                                               quantized_starts)
            kmax = mesh.cells_on_cell.shape[1]
            cand_c, coc_c, nvr_c = reloc_c
            new_cell = _relocate_rows(
                cand_c.T.reshape(-1, kmax + 1, 3).astype(real), coc_c, nvr_c,
                pos, cell)
            cell = jnp.where(do_reloc, new_cell, cell)
            q, srt = quantized_starts(layer_c, n_layers, W_base,
                                      int(use_pack), W, NS)
            # prow arrives TRANSPOSED (R, N): the gather writes the kernel's
            # lanes-minor layout directly, so the big window slabs and the
            # kstat rows need NO transpose; only the small tails (relocation
            # candidates 3(K+1), connectivity 2K+1) are flipped back.
            prow = pack_row_gather(pack_tab, cell, q)
            WKC = W * KC
            n_win = 2 if pathline else 1
            off = n_win * WKC
            kst_t = prow[off:off + 5 * kmax]              # (5K, N)
            o2 = off + 5 * kmax
            cand_new = prow[o2:o2 + 3 * (kmax + 1)]       # (3(K+1), N)
            o3 = o2 + 3 * (kmax + 1)
            from .pallas.window_kernel import dec_i32
            ints = dec_i32(prow[o3:o3 + 2 * kmax + 1])
            vids_raw = ints[:kmax].T                      # (N, K)
            coc_new = ints[kmax:2 * kmax].T
            nv = ints[2 * kmax]
            reloc_c_new = (cand_new, coc_new, nv)
            win_pre = prow[:WKC].reshape(W, KC, -1)
            if pathline:
                win_pre_b = prow[WKC:2 * WKC].reshape(W, KC, -1)
            lane = jnp.arange(kmax)[None, :]
            lane_valid = lane < nv[:, None]
            vids_ok = jnp.all(jnp.where(lane_valid, vids_raw >= 0, True),
                              axis=1)
            vids = jnp.clip(vids_raw, 0)
            vpos = None
        elif not use_pallas:
            new_cell = _relocate_packed(mesh, reloc_xyz, pos, cell)
            cell = jnp.where(do_reloc, new_cell, cell)
            vids, nv, lane_valid, vids_ok, vpos = _gather_cell_vertices(
                mesh, cell)
        elif win_tab is not None:
            # Windowed mode: relocation candidates are CARRIED from the
            # previous step's gathered static row (like packed-row mode), so
            # the step does ONE static row gather (post-reloc) + one window
            # gather instead of two statics + window.  Row layout:
            # [cand 3(K+1) | vpos 3K | zsurf K | zbot K | vids K | coc K |
            #  nv 1] with the int tail bitcast into the f32 row.
            kmax = mesh.cells_on_cell.shape[1]
            off_k = 3 * (kmax + 1)
            off_i = off_k + 5 * kmax
            cand_c, coc_c, nvr_c = reloc_c
            new_cell = _relocate_rows(
                cand_c.T.reshape(-1, kmax + 1, 3).astype(real),
                coc_c, nvr_c, pos, cell)
            cell = jnp.where(do_reloc, new_cell, cell)
            from .pallas.window_kernel import rows_t
            row_new = rows_t(wstat_tab, cell)             # (S, N) post-reloc
            from .pallas.window_kernel import dec_i32
            ints = dec_i32(row_new[off_i:])
            vids_raw, nv = ints[:kmax].T, ints[2 * kmax]
            kst_t = row_new[off_k:off_i]                  # (5K, N) f32
            reloc_c_new = (row_new[:off_k], ints[kmax:2 * kmax].T, nv)
            lane = jnp.arange(kmax)[None, :]
            lane_valid = lane < nv[:, None]
            vids_ok = jnp.all(jnp.where(lane_valid, vids_raw >= 0, True),
                              axis=1)
            vids = jnp.clip(vids_raw, 0)
            vpos = None
        else:
            # Pallas path: two wide row gathers replace five narrow ones.
            kmax = mesh.cells_on_cell.shape[1]
            rrow = reloc_pack[cell]                       # (N, 3K+3) run dtype
            cand_xyz = rrow.reshape(-1, kmax + 1, 3)
            irow = vert_misc[cell]                        # (N, 2K+1) int32
            new_cell = _relocate_rows(cand_xyz, irow[:, kmax:2 * kmax],
                                      irow[:, 2 * kmax], pos, cell)
            cell = jnp.where(do_reloc, new_cell, cell)
            vrow = vert_misc[cell]                        # refreshed post-reloc
            vids_raw, nv = vrow[:, :kmax], vrow[:, 2 * kmax]
            lane = jnp.arange(kmax)[None, :]
            lane_valid = lane < nv[:, None]
            vids_ok = jnp.all(jnp.where(lane_valid, vids_raw >= 0, True),
                              axis=1)
            vids = jnp.clip(vids_raw, 0)
            vpos = None
        r = jnp.linalg.norm(pos, axis=-1)
        # Per-cell vertex-column gathers, shared across all RK stages (the
        # cell id is frozen): wide-row gathers are the TPU-fast access shape.
        def gather_cols(sol, attrs, vids_s):
            from .pallas.window_kernel import rows_t

            def g2(tab):
                # K explicit descriptor row gathers on the 2D view
                # (offset_dims=(0,), the form every kernel path uses):
                # advanced-indexing the 3D (nV, L, 3) table made XLA
                # relayout-copy the WHOLE operand -- 4.8-7.6 GB temps at 2M
                # cells x L=80, an OOM by themselves; this form reads the
                # argument layout directly and only the gathered (n, K, S)
                # result is ever transposed
                flat = tab.reshape(tab.shape[0], -1)          # (nV, S)
                k_rows = jnp.stack(
                    [rows_t(flat, vids_s[:, k])
                     for k in range(vids_s.shape[1])])        # (K, S, n)
                return jnp.transpose(k_rows, (2, 0, 1)).reshape(
                    vids_s.shape + tab.shape[1:])

            cols = {"ztop": g2(sol.vertex_ztop),              # (n, K, L)
                    "vel": g2(sol.vertex_velocity),            # (n, K, L, 3)
                    "wvel": g2(sol.vertex_vert_velocity)}      # (n, K, L+1)
            if attrs is not None:
                cols["attrs"] = g2(attrs)                      # (n, K, L, A)
            return cols

        a1 = jnp.broadcast_to(alpha0, r.shape).astype(real)

        def exact_step_on(pos_s, depth_s, a1_s, vids_s, nv_s, lane_valid_s,
                          vids_ok_s, vpos_s):
            """The reference-exact pure-XLA step (Euler or RK4) on any lane
            subset; also returns the start-position layer so callers can
            refresh the window hint.  Gathers trace lazily inside whichever
            cond branch calls this."""
            cols_f = gather_cols(front, attr_front, vids_s)
            cols_b = gather_cols(back, attr_back, vids_s) if pathline \
                else None
            vpos_l = vpos_s if vpos_s is not None \
                else mesh.vertex_xyz[vids_s]
            r_s = jnp.linalg.norm(pos_s, axis=-1)

            def eval_at(p, a):
                if pathline:
                    return _eval_stage_pathline(
                        cols_f, cols_b, p, depth_s, a, nv_s, lane_valid_s,
                        vids_ok_s, vpos_l, exact_clamp)
                h, w, ok = _eval_stage_streamline(
                    cols_f["ztop"], cols_f["vel"], cols_f["wvel"],
                    p, depth_s, nv_s, lane_valid_s, vids_ok_s, vpos_l,
                    exact_clamp)
                return h, w, jnp.zeros((p.shape[0], 3), dtype=real), ok

            if method == CalcMethod.EULER:
                hvel, wvel, attr, step_ok = eval_at(pos_s, a1_s)
                axis = geo.rotation_axis(pos_s, hvel)
                speed = jnp.linalg.norm(hvel, axis=-1)
                theta = speed * dt / jnp.maximum(EPS_ZERO, r_s)
                new_pos = geo.rotate_around_axis(pos_s, axis, theta)
            else:
                dalpha = dt / jnp.asarray(duration, dtype=real)
                a2 = jnp.clip(a1_s + 0.5 * dalpha, 0.0, 1.0)
                a4 = jnp.clip(a1_s + dalpha, 0.0, 1.0)
                k1, w1, at1, ok1 = eval_at(pos_s, a1_s)
                p2 = _advect_on_sphere(pos_s, k1, dt * 0.5)
                k2, w2, at2, ok2 = eval_at(p2, a2)
                p3 = _advect_on_sphere(pos_s, k2, dt * 0.5)
                k3, w3, at3, ok3 = eval_at(p3, a2)
                p4 = _advect_on_sphere(pos_s, k3, dt)
                k4, w4, at4, ok4 = eval_at(p4, a4)

                step_ok = ok1 & ok2 & ok3 & ok4
                hvel = (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0
                wvel = (w1 + 2.0 * w2 + 2.0 * w3 + w4) / 6.0
                attr = (at1 + 2.0 * at2 + 2.0 * at3 + at4) / 6.0

                x_trial = pos_s + hvel * dt
                x_len = jnp.linalg.norm(x_trial, axis=-1)
                new_pos = jnp.where(
                    (x_len > EPS_ZERO)[:, None],
                    x_trial / jnp.where(x_len == 0.0, 1.0, x_len)[:, None]
                    * r_s[:, None],
                    pos_s)

            # start-position layer for the window-hint refresh: a persistent
            # layer jump (e.g. below-bottom after a shelf crossing) would
            # otherwise leave a stale hint missing forever
            w0 = wachspress_weights(pos_s, vpos_l, nv_s)
            z0 = jnp.einsum("nk,nkl->nl", w0, cols_f["ztop"])
            z0 = _clamp_profile(z0, exact_clamp)
            if pathline:
                layer_s, _ = _layer_search_linear(z0, depth_s)
            else:
                layer_s = _layer_search_binary(z0, depth_s)
            return new_pos, hvel, wvel, attr, step_ok, layer_s

        def xla_full_step():
            out = exact_step_on(pos, depth_neg, a1, vids, nv, lane_valid,
                                vids_ok, vpos)
            return out[:5]
        if use_pallas:
            # Fused Pallas step: the whole per-stage pipeline (containment,
            # Wachspress, ztop clamp, layer search, vertical lerp, RK4/Euler)
            # runs in one kernel with the gathered vertex columns resident in
            # VMEM across all stages (pallas/stage_kernel.py).  Only the
            # relocation + the packed-row gathers + record writes stay in
            # XLA.  When the layer-windowed fast path is on
            # (pallas/window_kernel.py), the step gathers only a W-layer
            # vertical window per particle and falls back to this full-table
            # kernel for the (rare) steps where any particle's depth leaves
            # its window guard band.
            from .pallas.stage_kernel import (fused_pathline_step,
                                              fused_streamline_step)
            euler = method == CalcMethod.EULER
            attr_t = None
            if pathline:
                dalpha = dt / jnp.asarray(duration, dtype=real)
                a1s = alpha0.astype(real)
                a2s = jnp.clip(a1s + 0.5 * dalpha, 0.0, 1.0)
                a4s = jnp.clip(a1s + dalpha, 0.0, 1.0)

            def full_step():
                cols_t = _cols_t(packed_tab, vids)              # (K, F, N)
                if pathline:
                    colsb_t = _cols_t(packed_tab_b, vids)
                    np_, hv_, wv_, ok_, at_ = fused_pathline_step(
                        pos.T, depth_neg[None], nv[None].astype(jnp.int32),
                        cols_t, colsb_t, n_layers, dt, (a1s, a2s, a4s),
                        euler=euler, n_attrs=n_attrs, block=pallas_block,
                        interpret=pallas_interpret)
                else:
                    np_, hv_, wv_, ok_ = fused_streamline_step(
                        pos.T, depth_neg[None], nv[None].astype(jnp.int32),
                        cols_t, n_layers, dt, euler=euler,
                        block=pallas_block, interpret=pallas_interpret)
                    at_ = None
                return np_, hv_, wv_, ok_, at_

            if win_tab is not None:
                from .pallas.window_kernel import (
                    fused_window_pathline_step, fused_window_streamline_step,
                    pack_row_gather, quantized_starts)
                if win_pre is not None:                       # packed-row mode
                    win_t, win_bt = win_pre, win_pre_b
                else:
                    q, srt = quantized_starts(layer_c, n_layers, W_base,
                                              int(win_stride), W, NS)
                    prow_w = pack_row_gather(win_tab, cell, q)  # (R_w, N)
                    WKC_w = W * KC
                    win_t = prow_w[:WKC_w].reshape(W, KC, -1)
                    win_bt = prow_w[WKC_w:2 * WKC_w].reshape(W, KC, -1) \
                        if pathline else None
                if pathline:
                    wp, wh, ww, wok, wlayer, wmiss, wat = \
                        fused_window_pathline_step(
                            pos.T, depth_neg[None],
                            nv[None].astype(jnp.int32), srt[None], kst_t,
                            win_t, win_bt, n_layers, dt, (a1s, a2s, a4s),
                            euler=euler, n_attrs=n_attrs, block=pallas_block,
                            interpret=pallas_interpret)
                else:
                    wp, wh, ww, wok, wlayer, wmiss = \
                        fused_window_streamline_step(
                            pos.T, depth_neg[None],
                            nv[None].astype(jnp.int32), srt[None], kst_t,
                            win_t, n_layers, dt, euler=euler,
                            block=pallas_block, interpret=pallas_interpret)
                    wat = None
                miss_lanes = (wmiss[0] > 0) & alive & vids_ok
                any_miss = jnp.any(miss_lanes)
                n_miss = jnp.sum(miss_lanes, dtype=jnp.int32)
                miss_ct = miss_ct + miss_lanes.astype(jnp.int32)

                def _fallback(_):
                    # pure-XLA exact step for the WHOLE batch (no full-table
                    # packed copy needed in HBM -- at reference scale
                    # win_tab + packed_tab together would not fit);
                    # transpose into the kernel's return convention.  The
                    # window hint is refreshed from the full-profile layer
                    # search: a persistent layer jump (below-bottom after a
                    # bathymetry step) would otherwise miss forever.
                    np_x, hv_x, wv_x, at_x, ok_x, layer_x = exact_step_on(
                        pos, depth_neg, a1, vids, nv, lane_valid, vids_ok,
                        vpos)
                    return (np_x.T, hv_x.T, wv_x[None],
                            ok_x[None].astype(jnp.int32), layer_x, at_x.T)

                def _windowed(_):
                    at_ = wat if wat is not None else jnp.zeros_like(wp)
                    return wp, wh, ww, wok, wlayer[0], at_

                def _repair(_):
                    # granular fallback: keep the windowed result for hit
                    # lanes and recompute ONLY the (<= repair_cap) missed
                    # lanes exactly.  O(repair_cap) instead of O(N): in a
                    # bathymetry-crossing regime nearly every step has SOME
                    # missed particle, and the whole-batch fallback would
                    # run the slow exact step every step.
                    np_w, hv_w, wv_w, ok_w, layer_w, at_w = _windowed(None)
                    idx = jnp.nonzero(miss_lanes, size=repair_cap,
                                      fill_value=0)[0].astype(jnp.int32)
                    valid = jnp.arange(repair_cap) < n_miss
                    vids_m, nv_m, lv_m, vok_m, vpos_m = \
                        _gather_cell_vertices(mesh, cell[idx])
                    np_m, hv_m, wv_m, at_m, ok_m, layer_m = exact_step_on(
                        pos[idx], depth_neg[idx], a1[idx], vids_m, nv_m,
                        lv_m, vok_m, vpos_m)
                    # scatter repaired lanes back (invalid slots -> OOB drop)
                    tgt = jnp.where(valid, idx, pos.shape[0])
                    np_w = np_w.at[:, tgt].set(np_m.T, mode="drop")
                    hv_w = hv_w.at[:, tgt].set(hv_m.T, mode="drop")
                    wv_w = wv_w.at[:, tgt].set(wv_m, mode="drop")
                    ok_w = ok_w.at[:, tgt].set(
                        ok_m.astype(jnp.int32), mode="drop")
                    layer_w = layer_w.at[tgt].set(layer_m, mode="drop")
                    at_w = at_w.at[:, tgt].set(at_m.T, mode="drop")
                    return np_w, hv_w, wv_w, ok_w, layer_w, at_w

                def _miss_path(_):
                    if not repair_cap:
                        return _fallback(None)
                    return jax.lax.cond(n_miss <= repair_cap, _repair,
                                        _fallback, None)

                import os as _os
                if _os.environ.get("MOPS_WINDOW_FALLBACK") == "0":
                    # testing/benchmark escape hatch: skip tracing the full
                    # kernel; missed lanes are treated like the reference's
                    # zero-velocity RET0 (position held, velocity zeroed)
                    # instead of getting exact fallback values
                    new_pos_t, hvel_t, wv_t, ok_t, layer_new, attr_raw = \
                        _windowed(None)
                    hit = wmiss <= 0                       # (1, N)
                    ok_t = jnp.where(hit, ok_t, 0)
                    new_pos_t = jnp.where(hit, new_pos_t, pos.T)
                    hvel_t = jnp.where(hit, hvel_t, 0.0)
                    wv_t = jnp.where(hit, wv_t, 0.0)
                    attr_raw = jnp.where(hit, attr_raw, 0.0)
                else:
                    new_pos_t, hvel_t, wv_t, ok_t, layer_new, attr_raw = \
                        jax.lax.cond(any_miss, _miss_path, _windowed, None)
                if pathline and n_attrs:
                    attr_t = attr_raw
                layer_c = jnp.where(alive, layer_new, layer_c)
            else:
                new_pos_t, hvel_t, wv_t, ok_t, attr_t = full_step()
            # vids_ok (invalid vertex ids -> reference R_VLA_FAIL) is checked
            # outside the kernel: zero the velocities and keep the position,
            # exactly what the XLA stage functions do for those lanes.
            step_ok = ok_t[0].astype(bool) & vids_ok
            hvel = jnp.where(vids_ok[:, None], hvel_t.T, 0.0)
            wvel = jnp.where(vids_ok, wv_t[0], 0.0)
            new_pos = jnp.where(vids_ok[:, None], new_pos_t.T, pos)
            attr = jnp.zeros((pos.shape[0], 3), dtype=real) if attr_t is None \
                else jnp.where(vids_ok[:, None], attr_t.T, 0.0)
        else:
            new_pos, hvel, wvel, attr, step_ok = xla_full_step()

        write_ok = (alive & step_ok) if freeze else alive
        alive = write_ok if freeze else alive

        new_depth = jnp.maximum(0.0, depth.astype(real) - wvel * dt)
        r_new = jnp.maximum(1.0, r + wvel * dt)
        nlen = jnp.linalg.norm(new_pos, axis=-1)
        new_pos = jnp.where(
            (nlen > EPS_ZERO)[:, None],
            new_pos / jnp.where(nlen == 0.0, 1.0, nlen)[:, None] * r_new[:, None],
            new_pos)

        upd = write_ok[:, None]
        pos = jnp.where(upd, new_pos, pos)
        depth = jnp.where(write_ok, new_depth.astype(depth.dtype), depth)

        # first-step velocity/attr write into slot 0 (TBB kernel :988-991)
        first_mask = (write_ok & is_first)[:, None]
        vels = vels.at[:, 0].set(jnp.where(first_mask, hvel, vels[:, 0]))
        if attrs_buf is not None:
            attrs_buf = attrs_buf.at[:, 0].set(
                jnp.where(first_mask, attr, attrs_buf[:, 0]))

        rec_mask = (write_ok & rec_flag)[:, None]
        pts = pts.at[:, rec_slot].set(jnp.where(rec_mask, pos, pts[:, rec_slot]))
        vels = vels.at[:, rec_slot].set(
            jnp.where(rec_mask, hvel, vels[:, rec_slot]))
        if attrs_buf is not None:
            attrs_buf = attrs_buf.at[:, rec_slot].set(
                jnp.where(rec_mask, attr, attrs_buf[:, rec_slot]))

        return (pos, depth, cell, alive, layer_c, reloc_c_new, pts, vels,
                attrs_buf, miss_ct), None

    # Initial layer hints for the windowed fast path: one full-profile layer
    # search at the seed positions (XLA, once per run).
    layer0 = jnp.ones(n, dtype=jnp.int32)
    if win_tab is not None:
        vids0, nv0, _lv0, _vok0, vpos0 = _gather_cell_vertices(
            mesh, jnp.clip(cells, 0))
        w0 = wachspress_weights(seeds, vpos0, nv0)
        z0p = jnp.einsum("nk,nkl->nl", w0, front.vertex_ztop[vids0])
        z0p = _clamp_profile(z0p, exact_clamp)
        layer0 = _layer_search_binary(z0p, (-depths).astype(real))

    # Packed-row AND windowed modes seed the carried relocation row from the
    # mesh tables (one-time); every later step refreshes it from the gathered
    # pack/static row.
    reloc_c0 = None
    if pack_tab is not None or (use_pallas and use_window
                                and win_tab is not None):
        c0 = jnp.clip(cells, 0)
        # candidate rows carried TRANSPOSED (3(K+1), N) to match the
        # transposed pack/static row gathers
        reloc_c0 = (reloc_xyz[c0].astype(jnp.float32).reshape(n, -1).T,
                    mesh.cells_on_cell[c0].astype(jnp.int32),
                    mesh.n_edges_on_cell[c0].astype(jnp.int32))

    # per-particle cumulative window-miss counter; derived varying like the
    # record buffers so the vma type matches under shard_map
    miss0 = jnp.where(jnp.zeros(n, dtype=bool), cells, 0).astype(jnp.int32)
    init = (seeds, depths, cells, alive0, layer0, reloc_c0, pts, vels,
            attrs_buf, miss0)
    xs = (is_first_xs, flags_xs, slots_xs, alphas_xs)
    (pos, depth, cell, alive, _layerN, _reloc, pts, vels,
     attrs_buf, miss_ct), _ = jax.lax.scan(step, init, xs)
    return RawTrajectories(points=pts, velocities=vels, attrs=attrs_buf,
                           final_position=pos, final_depth=depth,
                           final_cell=cell, alive=alive,
                           window_misses=miss_ct)


_ADVECT_STATIC = ("method", "fail_mode", "pathline", "duration", "n_records",
                  "exact_clamp", "use_pallas", "pallas_interpret",
                  "pallas_block", "use_window", "use_pack", "win_stride",
                  "repair_cap")
_advect_jit = functools.partial(jax.jit, static_argnames=_ADVECT_STATIC)(
    _scan_core)


def run_advection(mesh: MPASMesh, front: SolutionFields,
                  seeds: np.ndarray, cells: np.ndarray,
                  settings: TrajectorySettings,
                  back: Optional[SolutionFields] = None,
                  exact_clamp: bool = True,
                  dtype=None,
                  use_pallas: Optional[bool] = None,
                  use_window: Optional[bool] = None,
                  chunk: Optional[int] = None) -> RawTrajectories:
    """Run a full streamline (back=None) or pathline advection.

    Mirrors the host orchestration in the reference backends: buffer setup per
    Common::InitTrajectoryOutputBuffers (src/Common/TrajectoryCommon.h:15-27),
    per-particle depths per BuildEffectiveDepths (:29-41), then the device
    loop.  ``seeds``/``cells`` are the sample positions and their KD-searched
    start cells (MPASOField::calcInWhichCells, src/Core/MPASOField.cpp:23-34).

    ``use_pallas`` routes the advection step through the fused Pallas TPU
    kernel (pallas/stage_kernel.py), covering streamline and pathline
    (including up to two named attributes).  Default None = auto: on for TPU
    float32 runs, off otherwise; MOPS_USE_PALLAS=1/0 overrides.
    """
    pathline = back is not None
    real = jnp.asarray(mesh.cell_xyz).dtype if dtype is None else jnp.dtype(dtype)
    n = len(seeds)
    n_steps, n_rec = settings.n_steps, settings.n_records
    if n_steps <= 0 or n_rec <= 0:
        raise ValueError("invalid integration steps "
                         f"(n_steps={n_steps}, n_records={n_rec})")

    if chunk is not None and n > chunk:
        # Particle-axis chunking: each slice is padded to `chunk` so every
        # piece reuses ONE compiled executable, bounding both compile-time
        # memory (very wide modules can exhaust the XLA compiler at N~1e6)
        # and device memory for the (N, R, 3) record buffers.  Eager-only.
        import dataclasses as _dc
        depths_all = np.asarray(settings.effective_depths(n))
        outs = []
        for i in range(0, n, chunk):
            j = min(i + chunk, n)
            pad = chunk - (j - i)
            seeds_c = np.asarray(seeds)[i:j]
            cells_c = np.asarray(cells)[i:j]
            depths_c = depths_all[i:j]
            if pad:
                seeds_c = np.concatenate(
                    [seeds_c, np.repeat(seeds_c[-1:], pad, axis=0)])
                cells_c = np.concatenate(
                    [cells_c, np.full(pad, -1, dtype=np.asarray(cells).dtype)])
                depths_c = np.concatenate([depths_c, np.zeros(pad)])
            cfg_c = _dc.replace(settings,
                                particle_depths=depths_c.astype(np.float32))
            outs.append(run_advection(
                mesh, front, seeds_c, cells_c, cfg_c, back=back,
                exact_clamp=exact_clamp, dtype=dtype, use_pallas=use_pallas,
                use_window=use_window))
        keep = [n - i for i in range(0, n, chunk)]
        cat = lambda f: jnp.concatenate(
            [getattr(o, f)[:min(chunk, k)] for o, k in zip(outs, keep)])
        return RawTrajectories(
            points=cat("points"), velocities=cat("velocities"),
            attrs=cat("attrs") if outs[0].attrs is not None else None,
            final_position=cat("final_position"),
            final_depth=cat("final_depth"),
            final_cell=cat("final_cell"), alive=cat("alive"),
            window_misses=cat("window_misses")
            if outs[0].window_misses is not None else None)

    # dtype consistency: mesh + solution tables must match the particle dtype
    # or the scan carry would silently promote (no-op casts when they agree)
    if jnp.asarray(mesh.cell_xyz).dtype != real:
        mesh = mesh.astype(real)
    if front.vertex_ztop.dtype != real:
        front = front.astype(real)
    if back is not None and back.vertex_ztop.dtype != real:
        back = back.astype(real)

    from .pallas.stage_kernel import resolve_block, resolve_use_pallas
    from .pallas.window_kernel import resolve_use_window
    use_attrs = pathline and len(front.cell_attrs) > 1 and back is not None \
        and len(back.cell_attrs) > 0
    pallas_on = resolve_use_pallas(use_pallas, real)
    pallas_interpret = os.environ.get("MOPS_FORCE_INTERPRET") == "1"
    # Resolve the EFFECTIVE kernel block before padding so N is always padded
    # to a multiple of the block actually passed to the kernel (a mismatch is
    # silent data corruption on the tail; the kernel also asserts), and clamp
    # it to what fits VMEM at this (K, L, attrs) shape.
    pallas_block = resolve_block(pathline)
    if pallas_on:
        import jax as _jax
        pallas_interpret = pallas_interpret \
            or _jax.default_backend() != "tpu"
        from .pallas.stage_kernel import vmem_block_limit
        pallas_block = min(pallas_block, vmem_block_limit(
            int(jnp.asarray(mesh.vertices_on_cell).shape[1]),
            int(front.vertex_ztop.shape[1]),
            2 if pathline else 1, 2 if use_attrs else 0))
        if pallas_block == 0:      # not even one 128-row block fits VMEM
            pallas_on = False
            pallas_block = resolve_block(pathline)
    window_on = resolve_use_window(use_window, pallas_on,
                                   front.vertex_ztop.shape[1],
                                   interpret=pallas_interpret) \
        and real == jnp.float32   # merged static rows are f32-bitcast
    pack_stride = 0
    _L = int(front.vertex_ztop.shape[1])
    _K = int(jnp.asarray(mesh.vertices_on_cell).shape[1])
    _na = 2 if use_attrs else 0
    _nV = int(jnp.asarray(mesh.vertex_xyz).shape[0])
    _max_id = max(int(mesh.n_cells), _nV)
    if window_on:
        from .pallas.window_kernel import (default_window, resolve_use_pack)
        pack_stride = resolve_use_pack(
            window_on, int(mesh.n_cells), _L, default_window(_L),
            2 if pathline else 1, _K, 5 + _na, max_id=_max_id)
    pack_on = pack_stride > 0
    win_stride = 1
    if window_on and not pack_on:
        from .pallas.window_kernel import (default_window,
                                           resolve_window_stride)
        win_stride = resolve_window_stride(
            int(mesh.n_cells), _L, default_window(_L),
            2 if pathline else 1, _K * (5 + _na), max_id=_max_id)
        if win_stride == 0:     # no strided window table fits the budget
            window_on = False
    if pallas_on and not window_on:
        # full-table mode materializes a packed (nV, F) copy of the vertex
        # fields next to the originals; at reference scale (2M cells x L=80
        # the copy is 6.5 GB and fields ~7 GB) that exceeds one chip's HBM
        # -> fall back to the pure-XLA step, which gathers from the field
        # tables directly with only O(N) transients
        _F = 3 + 4 * _L + (_L + 1) + _na * _L
        _packed_gb = (2 if pathline else 1) * _nV * _F * 4 / 1e9
        if _packed_gb > float(os.environ.get(
                "MOPS_PACKED_TABLE_BUDGET_GB", 4.0)):
            pallas_on = False

    # Record what this run actually resolved (pallas/window/pack + the
    # per-step gather bytes of that mode) so tooling (bench.py roofline)
    # reads the executed configuration instead of re-deriving it.
    if pack_on:
        from .pallas.window_kernel import (default_window, pack_row_floats,
                                           pack_stride_plan)
        _We, _ = pack_stride_plan(pack_stride, _L, default_window(_L))
        _gb = pack_row_floats(2 if pathline else 1, _We,
                              _K, 5 + _na) * 4
    elif window_on:
        from .pallas.window_kernel import default_window, pack_stride_plan
        _We, _ = pack_stride_plan(win_stride, _L, default_window(_L))
        _gb = ((2 if pathline else 1) * _We * _K * (5 + _na)
               + 8 * _K + 5) * 4
    else:
        _F = 3 + 4 * _L + (_L + 1) + _na * _L
        _gb = ((2 if pathline else 1) * _K * _F + 4 * _K + 4) * 4
    # miss-repair capacity: bounds the repair branch at ~6% of a full
    # fallback while covering percent-level miss rates (measured 4.2x at
    # miss_rate 4e-2 when misses fit); MOPS_MISS_REPAIR overrides
    # (0 = whole-batch fallback only)
    env_rc = os.environ.get("MOPS_MISS_REPAIR")
    repair_cap = int(env_rc) if env_rc is not None \
        else max(1024, min(4096, n // 16))
    LAST_RESOLVED.clear()
    LAST_RESOLVED.update(pallas=pallas_on, window=window_on, pack=pack_on,
                         pack_stride=pack_stride, win_stride=win_stride,
                         block=pallas_block, pathline=pathline,
                         n_attrs=_na, gather_bytes=_gb,
                         repair_cap=repair_cap)

    seeds = jnp.asarray(seeds, dtype=real)
    cells = jnp.asarray(cells, dtype=jnp.int32)
    depths = jnp.asarray(settings.effective_depths(n))
    n_padded = n
    if pallas_on:
        # The kernel grid needs N % block == 0; pad with dead particles
        # (cell = -1 -> alive0 False, never written) and slice outputs back.
        # jnp.pad (not np.pad): run_advection may itself be traced under jit.
        pallas_block = min(pallas_block, max(
            128, 128 * ((n + 127) // 128)))
        pad = (-n) % pallas_block
        if pad:
            seeds = jnp.pad(seeds, ((0, pad), (0, 0)))
            cells = jnp.pad(cells, (0, pad), constant_values=-1)
            depths = jnp.pad(depths, (0, pad))
            n_padded = n + pad

    attr_front = stacked_vertex_attrs(front) if use_attrs else None
    attr_back = stacked_vertex_attrs(back) if use_attrs else None

    xs = advection_schedule(settings, pathline, real)
    raw = _advect_jit(
        mesh, front, back, attr_front, attr_back, seeds, depths, cells, *xs,
        method=settings.method, fail_mode=settings.fail_mode,
        pathline=pathline, duration=int(settings.simulation_duration),
        n_records=n_rec, exact_clamp=exact_clamp, use_pallas=pallas_on,
        pallas_interpret=pallas_interpret, pallas_block=pallas_block,
        use_window=window_on, use_pack=pack_stride,
        win_stride=win_stride, repair_cap=repair_cap)
    if n_padded != n:
        sl = slice(0, n)
        raw = RawTrajectories(
            points=raw.points[sl], velocities=raw.velocities[sl],
            attrs=None if raw.attrs is None else raw.attrs[sl],
            final_position=raw.final_position[sl],
            final_depth=raw.final_depth[sl], final_cell=raw.final_cell[sl],
            alive=raw.alive[sl],
            window_misses=None if raw.window_misses is None
            else raw.window_misses[sl])
    return raw


def advection_schedule(settings: TrajectorySettings, pathline: bool, real):
    """Device xs arrays (is_first, flags, slots, alphas) + signed dt."""
    n_steps = settings.n_steps
    flags, slots = record_schedule(settings, pathline)
    is_first = np.zeros(n_steps, dtype=bool)
    is_first[0] = True
    alphas = (np.arange(n_steps) / n_steps).astype(np.float64) if pathline \
        else np.zeros(n_steps)
    sign = 1 if settings.direction == CalcDirection.FORWARD else -1
    signed_dt = jnp.asarray(sign * int(settings.delta_t), dtype=real)
    return (jnp.asarray(is_first), jnp.asarray(flags), jnp.asarray(slots),
            jnp.asarray(alphas, dtype=real), signed_dt)
