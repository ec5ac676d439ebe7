"""Layer-windowed fused advection step: the bandwidth-optimal TPU fast path.

The full-table kernel (stage_kernel.py) gathers every vertical layer of every
field per particle-step (~10 KB at L=60) although one RK stage reads only two
layers per field.  Measured on hardware, that gather bill IS the step time:
the chip sustains ~380 GB/s and the step moves ~3x the gathered bytes
(gather read + materialize + kernel read).

This module instead gathers a W-layer vertical WINDOW around each particle's
current layer (carried in the scan state) with ONE gather descriptor per
particle -- an `lax.gather` slice (1, W, K*C) from a layer-major per-cell
table -- cutting gathered bytes ~6x at W=8 (measured 2.2x step speedup at the
bench shape; see /root/repo/prof_kern.py).

Exactness: for particles whose depth lies strictly inside the window
(excluding an EPS_LAYER guard band at both window edges), every comparison of
the reference binary/linear layer search resolves identically to the
full-column search, so results are bit-equal to the full kernel.  Lanes that
hit the guard band raise a MISS flag and the driver re-runs that step through
the full-table kernel (lax.cond -- compiled but ~never taken, since a
particle's layer moves ~1 layer/step against a W/2 margin).  The only
accepted deviation is inside degenerate zero-thickness layer stacks, where
the window's locally-started monotonic clamp can differ from the reference's
global cascade by < L * 1e-9 m (those lanes carry zero velocity either way).

Data layout (see build_window_tables): window table (nC, L, K*C) with
per-layer chunk [k-major: ztop, vx, vy, vz, wvel(l) (, attrs...)]; static
table (nC, 5K) with [vpos xyz k-major | ztop[0] per vertex | ztop[L-1] per
vertex].  wvel[L] (deepest interface) is never read by the reference lerp
(dn_if = min(layer, L) <= L-1), so chunk l carrying wvel[l] suffices.

Reference semantics mirrored from the TBB kernel, same cites as
stage_kernel.py (src/CPU/TBB/Kernel/MPASOVisualizerKernels.cpp:740-1496).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EPS_LAYER, EPS_ZERO, ZTOP_CLAMP
from .stage_kernel import _check_block, _pspec, _smem

BIG = 1e30

# largest int magnitude exactly representable as f32: int fields riding in
# f32 row tables use VALUE conversion, not bitcast
I32_EXACT = 1 << 24


def enc_i32(a):
    """int32 -> f32 VALUE encode (exact for |v| <= 2**24).

    Deliberately NOT a bitcast: XLA:TPU flushes subnormals and canonicalizes
    NaNs on data movement it routes through the VPU, which silently zeroed
    bitcast int payloads inside the packed-row tables (small ints are
    subnormal f32 bit patterns; -1 is a NaN payload) -- the windowed TPU
    engine then advected zero-velocity particles while the CPU interpret
    tests stayed green.  resolve_use_pack / resolve_window_stride refuse
    meshes whose ids exceed the exact range."""
    return a.astype(jnp.int32).astype(jnp.float32)


def dec_i32(f):
    """f32 VALUE-encoded int (see enc_i32) -> int32."""
    return f.astype(jnp.int32)


def default_window(L: int) -> int:
    """Window size: MOPS_WINDOW_W (default 8), clamped to [4, L]."""
    w = int(os.environ.get("MOPS_WINDOW_W", 8))
    return max(2, min(L, max(4, w)))


def window_margin(W: int) -> int:
    """Window start offset below the carried layer (W/2 - 1)."""
    return max(1, W // 2 - 1)


def build_window_tables(mesh_voc, vertex_xyz, vertex_ztop, vertex_velocity,
                        vertex_vert_velocity, vertex_attrs=None):
    """(win_tab (nC, L*K*C) 2D, kstatic (nC, 5K), C) from per-vertex tables.

    One-time per run (inside jit); the per-(cell, layer) chunk layout is
    k-major [ztop, vx, vy, vz, wvel] (+ attrs), so a (1, W, K*C) gather slice
    is one CONTIGUOUS row run -- the shape XLA's TPU gather handles at
    near-bandwidth with a single descriptor per particle."""
    voc = jnp.clip(jnp.asarray(mesh_voc), 0)          # (nC, K)
    vertex_xyz = jnp.asarray(vertex_xyz).astype(
        jnp.asarray(vertex_ztop).dtype)
    vertex_ztop = jnp.asarray(vertex_ztop)
    vertex_velocity = jnp.asarray(vertex_velocity)
    vertex_vert_velocity = jnp.asarray(vertex_vert_velocity)
    nC, K = voc.shape
    L = vertex_ztop.shape[1]
    C = 5 + (vertex_attrs.shape[-1] if vertex_attrs is not None else 0)

    def rows_for(v):
        """(n, K) vertex ids -> ((n, L*K*C) window rows, (n, K) surface zt,
        (n, K) bottom zt, (n, 3K) vertex pos).  The table is kept 2D: a 3D
        (nC, L, KC) form tempts XLA into KC-minor tiled layouts that pad 40
        lanes to 128 (observed 6.4 GB -> 20.5 GB) or into materializing a
        separate 2D copy for the gather -- either one OOMs at 500k cells."""
        zt = vertex_ztop[v]                           # (n, K, L)
        vel = vertex_velocity[v]                      # (n, K, L, 3)
        wv = vertex_vert_velocity[v][:, :, :L]        # (n, K, L)
        parts = [zt[..., None], vel, wv[..., None]]
        if vertex_attrs is not None:
            parts.append(vertex_attrs[v])             # (n, K, L, A)
        ch = jnp.concatenate(parts, axis=-1)          # (n, K, L, C)
        n = v.shape[0]
        rows = jnp.transpose(ch, (0, 2, 1, 3)).reshape(n, L * K * C)
        return rows, zt[:, :, 0], zt[:, :, L - 1], vertex_xyz[v].reshape(n, -1)

    CH = int(os.environ.get("MOPS_WINTAB_CHUNK", 65536))
    if nC <= CH:
        win_tab, zs, zb, vpos = rows_for(voc)
    else:
        # chunked build: the all-at-once gather+transpose materializes
        # several padded (nC, K, L, C)-sized transients (observed 1.6x
        # layout padding -> OOM at nC=500k, L=80); per-chunk build keeps
        # peak memory at the final table + one chunk
        n_chunks = (nC + CH - 1) // CH

        def body(i, acc):
            win_a, zs_a, zb_a, vp_a = acc
            # clamp the last chunk's start instead of padding: the overlap
            # rows are recomputed identically, and no (npad, ...) buffer +
            # final-slice copy is ever materialized
            s = jnp.minimum(i * CH, nC - CH)
            v = jax.lax.dynamic_slice_in_dim(voc, s, CH, axis=0)
            rows, zs_c, zb_c, vp_c = rows_for(v)
            return (jax.lax.dynamic_update_slice(win_a, rows, (s, 0)),
                    jax.lax.dynamic_update_slice(zs_a, zs_c, (s, 0)),
                    jax.lax.dynamic_update_slice(zb_a, zb_c, (s, 0)),
                    jax.lax.dynamic_update_slice(vp_a, vp_c, (s, 0)))

        dt = vertex_ztop.dtype
        win_tab, zs, zb, vpos = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.zeros((nC, L * K * C), dt), jnp.zeros((nC, K), dt),
             jnp.zeros((nC, K), dt), jnp.zeros((nC, 3 * K), dt)))
    kstatic = jnp.concatenate([vpos, zs, zb], axis=1)
    return win_tab, kstatic, C


def window_starts(layer, L: int, W: int):
    """Per-particle window start s = clip(layer - margin, 0, L - W)."""
    return jnp.clip(layer - window_margin(W), 0, L - W).astype(jnp.int32)


def window_gather(win_tab, cells, starts, W: int, KC: int):
    """One-descriptor windowed slice gather -> (W, K*C, N) kernel layout.

    offset_dims=(0,) puts the particle batch dim LAST, so the gather writes
    the kernel's lanes-minor layout directly -- measured 3-4x faster on TPU
    than gathering (N, W, KC) and transposing (prof_gather_layout.py: the
    moveaxis costs a full extra HBM pass over the gathered bytes).

    The operand is viewed 2D as (nC, L*KC) with the slice start at
    srt*KC: on a 3D operand XLA picked a transposed tiled layout that pads
    the KC minor dim to 128 lanes (observed 6.4 GB -> 20.5 GB copy at
    nC=500k, L=80 -- an OOM); the 2D view's minor dim L*KC is naturally a
    multiple of 128 whenever KC is 8-lane aligned, and the (1, W*KC) slice
    stays one contiguous descriptor."""
    nC = win_tab.shape[0]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    si = jnp.stack([cells.astype(jnp.int32),
                    starts.astype(jnp.int32) * KC], axis=1)
    out = jax.lax.gather(win_tab, si, dn, (1, W * KC),
                         mode=jax.lax.GatherScatterMode.CLIP)
    return out.reshape(W, KC, -1)


def rows_t(tab, idx):
    """Row gather transposed: tab (M, S) indexed by idx (N,) -> (S, N).

    Same one-descriptor-per-row contiguous read as ``tab[idx]``, but the
    batch dim lands last so kernel-facing consumers need no transpose."""
    S = tab.shape[1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(tab, idx.astype(jnp.int32)[:, None], dn, (1, S),
                          mode=jax.lax.GatherScatterMode.CLIP)


def _wkernel(pos_ref, depthneg_ref, nv_ref, s_ref, kstat_ref, *refs,
             K: int, L: int, W: int, C: int, euler: bool, pathline: bool,
             n_attrs: int = 0):
    """Windowed block body (lanes = particles, all shapes (x, B)):
    pos (3, B), depthneg (1, B), nv (1, B), s (1, B) window starts,
    kstat (5K, B) static [vpos | zsurf | zbot], then win_f (W, K*C, B)
    [+ win_b, alpha (1, 3) SMEM when pathline], dt (1, 1) SMEM, outputs
    (new_pos, hvel, wvel, ok, layer, miss [, attr])."""
    attr_ref = None
    if pathline:
        (win_f_ref, win_b_ref, alpha_ref, dt_ref, newpos_ref, hvel_ref,
         wvelout_ref, ok_ref, layer_ref, miss_ref, *rest) = refs
        if n_attrs:
            (attr_ref,) = rest
    else:
        (win_f_ref, dt_ref, newpos_ref, hvel_ref, wvelout_ref, ok_ref,
         layer_ref, miss_ref) = refs

    pos = [pos_ref[d, :] for d in range(3)]
    depth_neg = depthneg_ref[0, :]
    nv = nv_ref[0, :]
    s = s_ref[0, :]
    dt = dt_ref[0, 0]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def norm(a):
        return jnp.sqrt(dot(a, a))

    vpos = [[kstat_ref[3 * k + d, :] for d in range(3)] for k in range(K)]

    def vnext(k):
        out = [jnp.zeros_like(pos[0]) for _ in range(3)]
        for j in range(K):
            if j == k + 1:
                sel = k + 1 < nv
            elif j == 0:
                sel = (k + 1 >= nv) & (k < nv)
            else:
                continue
            for d in range(3):
                out[d] = jnp.where(sel, vpos[j][d], out[d])
        return out

    def geometry(p):
        """Containment + Wachspress (identical to stage_kernel)."""
        inside = jnp.isfinite(p[0]) & jnp.isfinite(p[1]) & jnp.isfinite(p[2])
        for k in range(K):
            b = vnext(k)
            c = cross(vpos[k], b)
            d = dot(c, p)
            inside = inside & ((k >= nv) | (d >= 0.0))

        def tri_area(a, b, c):
            e1 = [b[i] - a[i] for i in range(3)]
            e2 = [c[i] - a[i] for i in range(3)]
            cr = cross(e1, e2)
            return 0.5 * jnp.sqrt(dot(cr, cr))

        w = []
        wsum = jnp.zeros_like(p[0])
        for k in range(K):
            if k > 0:
                prv = vpos[k - 1]
            else:
                prv = [jnp.zeros_like(p[0]) for _ in range(3)]
                for j in range(K):
                    selp = nv - 1 == j
                    for d in range(3):
                        prv[d] = jnp.where(selp, vpos[j][d], prv[d])
            nxt = vnext(k)
            a_i = tri_area(prv, vpos[k], p)
            a_n = tri_area(vpos[k], nxt, p)
            b_k = tri_area(prv, vpos[k], nxt)
            wk = jnp.where(k < nv, b_k / (a_i * a_n), 0.0)
            w.append(wk)
            wsum = wsum + wk
        inv = 1.0 / wsum
        return inside, [wk * inv for wk in w]

    def surf_bot(w):
        z0 = jnp.zeros_like(depth_neg)
        zL = jnp.zeros_like(depth_neg)
        for k in range(K):
            z0 = z0 + w[k] * kstat_ref[3 * K + k, :]
            zL = zL + w[k] * kstat_ref[4 * K + k, :]
        return z0, zL

    def z_window(wref, w):
        """Window ztop profile + locally-started monotonic clamp."""
        z = []
        for lw in range(W):
            acc = jnp.zeros_like(depth_neg)
            for k in range(K):
                acc = acc + w[k] * wref[lw, k * C + 0, :]
            z.append(acc)
        for lw in range(1, W):
            z[lw] = jnp.where(z[lw] > z[lw - 1], z[lw - 1] - ZTOP_CLAMP,
                              z[lw])
        return z

    def zw_at(z, lg):
        """z at GLOBAL layer lg with +/-BIG sentinels outside the window."""
        out = jnp.where(lg < s, BIG, -BIG)
        for lw in range(W):
            out = jnp.where(lg == s + lw, z[lw], out)
        return out

    def miss_of(z):
        """Guard band: depth within EPS_LAYER of either window edge could
        belong to an out-of-window layer -> refuse (driver falls back)."""
        miss_top = (s > 0) & (depth_neg >= z[0] - EPS_LAYER)
        miss_bot = (s + W < L) & (depth_neg <= z[W - 1] + EPS_LAYER)
        return miss_top | miss_bot

    def layer_binary(z, z0, zL):
        """Reference binary search simulated with window sentinels (exact
        for non-miss lanes, see module docstring)."""
        above = depth_neg > z0 + EPS_LAYER
        below = depth_neg < zL - EPS_LAYER
        lo = jnp.ones_like(nv)
        hi = jnp.full_like(nv, L - 1)
        ans = jnp.ones_like(nv)
        found = jnp.zeros_like(above)
        for _ in range(int(np.ceil(np.log2(max(2, L)))) + 2):
            active = (~found) & (lo <= hi)
            mid = (lo + hi) >> 1
            top_i = zw_at(z, mid - 1)
            bot_i = zw_at(z, mid)
            hit = (depth_neg <= top_i + EPS_LAYER) & \
                  (depth_neg >= bot_i - EPS_LAYER)
            ans = jnp.where(active & hit, mid, ans)
            found = found | (active & hit)
            go_up = depth_neg > top_i + EPS_LAYER
            hi = jnp.where(active & ~hit & go_up, mid - 1, hi)
            lo = jnp.where(active & ~hit & ~go_up, mid + 1, lo)
        ans = jnp.clip(ans, 1, L - 1)
        layer = jnp.where(above, 1, jnp.where(below, L - 1, ans))
        return layer, jnp.ones_like(above)

    def layer_linear(z, z0, zL):
        """Pathline first-hit scan over the window (exact for non-miss
        lanes: hits at layers <= s are impossible when the depth clears the
        window-top guard band)."""
        above = depth_neg > z0 + EPS_LAYER
        below = depth_neg < zL - EPS_LAYER
        first = jnp.ones_like(nv)
        found = jnp.zeros_like(above)
        for lw in range(W - 1, 0, -1):
            hit = (depth_neg <= z[lw - 1] + EPS_LAYER) & \
                  (depth_neg >= z[lw] - EPS_LAYER)
            first = jnp.where(hit, s + lw, first)
            found = found | hit
        layer = jnp.where(above, 1, jnp.where(below, L - 1, first))
        return layer, above | below | found

    def lerp_t(z, layer):
        z_dn = zw_at(z, layer)
        z_up = zw_at(z, layer - 1)
        x = jnp.clip(depth_neg, z_dn, z_up)
        denom = z_up - z_dn
        ok = jnp.abs(denom) >= EPS_ZERO
        return (x - z_dn) / jnp.where(ok, denom, 1.0), ok

    def field_pick(wref, w, layer, f_off):
        """(up, dn) Wachspress-weighted chunk field f at layer-1 / layer."""
        v_up = jnp.zeros_like(depth_neg)
        v_dn = jnp.zeros_like(depth_neg)
        for lw in range(W):
            lg = s + lw
            acc = jnp.zeros_like(depth_neg)
            for k in range(K):
                acc = acc + w[k] * wref[lw, k * C + f_off, :]
            v_up = jnp.where(layer - 1 == lg, acc, v_up)
            v_dn = jnp.where(layer == lg, acc, v_dn)
        return v_up, v_dn

    def eval_streamline(p):
        inside, w = geometry(p)
        z0, zL = surf_bot(w)
        z = z_window(win_f_ref, w)
        layer, _ = layer_binary(z, z0, zL)
        t, ok_denom = lerp_t(z, layer)
        vu = [None] * 3
        vd = [None] * 3
        for d in range(3):
            vu[d], vd[d] = field_pick(win_f_ref, w, layer, 1 + d)
        ok_mag = (norm(vd) >= EPS_ZERO) & (norm(vu) >= EPS_ZERO)
        hv = [t * vu[d] + (1.0 - t) * vd[d] for d in range(3)]
        ok_final = norm(hv) >= EPS_ZERO
        # wvel: up_if = layer-1, dn_if = layer (both in-window; wvel[L]
        # unreachable since dn_if <= L-1)
        w_up, w_dn = field_pick(win_f_ref, w, layer, 4)
        # field_pick gives values at layer-1/layer which are exactly
        # up_if/dn_if for the windowed range
        wv = t * w_up + (1.0 - t) * w_dn
        ok = inside & ok_denom & ok_mag & ok_final
        hv = [jnp.where(ok, h, 0.0) for h in hv]
        wv = jnp.where(ok, wv, 0.0)
        return hv, wv, [], ok, layer, miss_of(z)

    def eval_pathline(p, a):
        inside, w = geometry(p)
        z0, zL = surf_bot(w)

        def column(wref):
            z = z_window(wref, w)
            layer, ok_layer = layer_linear(z, z0, zL)
            t, ok_denom = lerp_t(z, layer)
            hv = []
            for d in range(3):
                vu, vd = field_pick(wref, w, layer, 1 + d)
                hv.append(t * vu + (1.0 - t) * vd)
            wu, wd = field_pick(wref, w, layer, 4)
            wv = t * wu + (1.0 - t) * wd
            at = []
            for ai in range(n_attrs):
                au, ad = field_pick(wref, w, layer, 5 + ai)
                at.append(t * au + (1.0 - t) * ad)
            return hv, wv, at, ok_layer & ok_denom, layer, miss_of(z)

        hv_f, wv_f, at_f, ok_f, layer_f, miss_f = column(win_f_ref)
        hv_b, wv_b, at_b, ok_b, _, miss_b = column(win_b_ref)
        hv = [a * hv_b[d] + (1.0 - a) * hv_f[d] for d in range(3)]
        wv = a * wv_b + (1.0 - a) * wv_f
        at = [a * at_b[i] + (1.0 - a) * at_f[i] for i in range(n_attrs)]
        ok = inside & ok_f & ok_b
        hv = [jnp.where(ok, h, 0.0) for h in hv]
        wv = jnp.where(ok, wv, 0.0)
        at = [jnp.where(ok, x, 0.0) for x in at]
        return hv, wv, at, ok, layer_f, miss_f | miss_b

    if pathline:
        a1 = alpha_ref[0, 0]
        a2 = alpha_ref[0, 1]
        a4 = alpha_ref[0, 2]

        def eval_stage(p, a):
            return eval_pathline(p, a)
    else:
        a1 = a2 = a4 = None

        def eval_stage(p, a):
            return eval_streamline(p)

    def advect(p, v, dtl):
        rr = norm(p)
        speed = norm(v)
        degen = (rr < EPS_ZERO) | (speed < EPS_ZERO)
        ax = cross(p, v)
        al = norm(ax)
        safe = jnp.where(degen, 1.0, al)
        u = [a / safe for a in ax]
        theta = speed * dtl / jnp.where(rr == 0, 1.0, rr)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        omc = 1.0 - ct
        r0 = (ct + u[0] * u[0] * omc) * p[0] + (u[0] * u[1] * omc - u[2] * st) * p[1] + (u[0] * u[2] * omc + u[1] * st) * p[2]
        r1 = (u[1] * u[0] * omc + u[2] * st) * p[0] + (ct + u[1] * u[1] * omc) * p[1] + (u[1] * u[2] * omc - u[0] * st) * p[2]
        r2 = (u[2] * u[0] * omc - u[1] * st) * p[0] + (u[2] * u[1] * omc + u[0] * st) * p[1] + (ct + u[2] * u[2] * omc) * p[2]
        return [jnp.where(degen, p[d], r) for d, r in enumerate((r0, r1, r2))]

    r = norm(pos)
    if euler:
        hv, wv, at, ok, layer1, miss = eval_stage(pos, a1)
        ax = cross(pos, hv)
        al = norm(ax)
        theta = norm(hv) * dt / jnp.maximum(EPS_ZERO, r)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        omc = 1.0 - ct
        u = [a / al for a in ax]
        new_pos = [
            (ct + u[0] * u[0] * omc) * pos[0] + (u[0] * u[1] * omc - u[2] * st) * pos[1] + (u[0] * u[2] * omc + u[1] * st) * pos[2],
            (u[1] * u[0] * omc + u[2] * st) * pos[0] + (ct + u[1] * u[1] * omc) * pos[1] + (u[1] * u[2] * omc - u[0] * st) * pos[2],
            (u[2] * u[0] * omc - u[1] * st) * pos[0] + (u[2] * u[1] * omc + u[0] * st) * pos[1] + (ct + u[2] * u[2] * omc) * pos[2],
        ]
        step_ok = ok
    else:
        k1, w1, at1, ok1, layer1, m1 = eval_stage(pos, a1)
        p2 = advect(pos, k1, dt * 0.5)
        k2, w2, at2, ok2, _, m2 = eval_stage(p2, a2)
        p3 = advect(pos, k2, dt * 0.5)
        k3, w3, at3, ok3, _, m3 = eval_stage(p3, a2)
        p4 = advect(pos, k3, dt)
        k4, w4, at4, ok4, _, m4 = eval_stage(p4, a4)
        step_ok = ok1 & ok2 & ok3 & ok4
        miss = m1 | m2 | m3 | m4
        hv = [(k1[d] + 2 * k2[d] + 2 * k3[d] + k4[d]) / 6.0 for d in range(3)]
        wv = (w1 + 2 * w2 + 2 * w3 + w4) / 6.0
        at = [(at1[i] + 2 * at2[i] + 2 * at3[i] + at4[i]) / 6.0
              for i in range(n_attrs)]
        xt = [pos[d] + hv[d] * dt for d in range(3)]
        xl = jnp.sqrt(xt[0] ** 2 + xt[1] ** 2 + xt[2] ** 2)
        good = xl > EPS_ZERO
        new_pos = [jnp.where(good, xt[d] / jnp.where(xl == 0, 1.0, xl) * r,
                             pos[d])
                   for d in range(3)]

    for d in range(3):
        newpos_ref[d, :] = new_pos[d]
        hvel_ref[d, :] = hv[d]
    wvelout_ref[0, :] = wv
    ok_ref[0, :] = step_ok.astype(jnp.int32)
    layer_ref[0, :] = jnp.clip(layer1, 1, L - 1).astype(jnp.int32)
    miss_ref[0, :] = miss.astype(jnp.int32)
    if attr_ref is not None:
        for i in range(3):
            attr_ref[i, :] = at[i] if i < n_attrs \
                else jnp.zeros_like(depth_neg)


def fused_window_streamline_step(pos, depth_neg, nv, s, kstat, win, L, dt,
                                 euler: bool = False, block: int = 512,
                                 interpret: bool = False):
    """Windowed streamline step.  Args (particle lanes, N = block multiple):
    pos (3, N), depth_neg (1, N), nv (1, N) i32, s (1, N) i32 window starts,
    kstat (5K, N), win (W, K*C, N).  Returns (new_pos, hvel (3, N),
    wvel (1, N), ok (1, N) i32, layer (1, N) i32, miss (1, N) i32)."""
    from jax.experimental import pallas as pl

    W, KC, n = win.shape
    SK, _ = kstat.shape
    K = SK // 5
    C = KC // K
    real = pos.dtype
    _check_block(n, block)
    dt_arr = jnp.asarray([[dt]], dtype=real)
    kern = functools.partial(_wkernel, K=K, L=L, W=W, C=C, euler=euler,
                             pathline=False)
    in_specs = [_pspec(block, 3), _pspec(block, 1), _pspec(block, 1),
                _pspec(block, 1), _pspec(block, SK), _pspec(block, W, KC),
                _smem((1, 1))]
    out_specs = [_pspec(block, 3), _pspec(block, 3), _pspec(block, 1),
                 _pspec(block, 1), _pspec(block, 1), _pspec(block, 1)]
    out_shape = [jax.ShapeDtypeStruct((3, n), real),
                 jax.ShapeDtypeStruct((3, n), real),
                 jax.ShapeDtypeStruct((1, n), real),
                 jax.ShapeDtypeStruct((1, n), jnp.int32),
                 jax.ShapeDtypeStruct((1, n), jnp.int32),
                 jax.ShapeDtypeStruct((1, n), jnp.int32)]
    return pl.pallas_call(
        kern, grid=(n // block,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(pos, depth_neg, nv, s, kstat, win, dt_arr)


def fused_window_pathline_step(pos, depth_neg, nv, s, kstat, win_f, win_b,
                               L, dt, alphas, euler: bool = False,
                               n_attrs: int = 0, block: int = 256,
                               interpret: bool = False):
    """Windowed pathline step (two snapshot windows, shared start s).
    Returns (new_pos, hvel, wvel, ok, layer, miss[, attr (3, N)])."""
    from jax.experimental import pallas as pl

    W, KC, n = win_f.shape
    SK, _ = kstat.shape
    K = SK // 5
    C = KC // K
    real = pos.dtype
    _check_block(n, block)
    dt_arr = jnp.asarray([[dt]], dtype=real)
    alpha_arr = jnp.stack(
        [jnp.asarray(a, dtype=real) for a in alphas]).reshape(1, 3)
    kern = functools.partial(_wkernel, K=K, L=L, W=W, C=C, euler=euler,
                             pathline=True, n_attrs=n_attrs)
    in_specs = [_pspec(block, 3), _pspec(block, 1), _pspec(block, 1),
                _pspec(block, 1), _pspec(block, SK), _pspec(block, W, KC),
                _pspec(block, W, KC), _smem((1, 3)), _smem((1, 1))]
    out_specs = [_pspec(block, 3), _pspec(block, 3), _pspec(block, 1),
                 _pspec(block, 1), _pspec(block, 1), _pspec(block, 1)]
    out_shape = [jax.ShapeDtypeStruct((3, n), real),
                 jax.ShapeDtypeStruct((3, n), real),
                 jax.ShapeDtypeStruct((1, n), real),
                 jax.ShapeDtypeStruct((1, n), jnp.int32),
                 jax.ShapeDtypeStruct((1, n), jnp.int32),
                 jax.ShapeDtypeStruct((1, n), jnp.int32)]
    if n_attrs:
        out_specs.append(_pspec(block, 3))
        out_shape.append(jax.ShapeDtypeStruct((3, n), real))
    outs = pl.pallas_call(
        kern, grid=(n // block,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(pos, depth_neg, nv, s, kstat, win_f, win_b, alpha_arr, dt_arr)
    if n_attrs:
        return outs
    return (*outs, None)


def pack_row_floats(n_win: int, W: int, K: int, C: int) -> int:
    """f32 lanes per packed row: [windows n_win*W*K*C | kstatic 5K |
    reloc candidates 3(K+1) | i32-bitcast vids K, coc K, nv 1], padded to a
    128-lane multiple (keeps every gathered row 512B-aligned)."""
    r = n_win * W * K * C + 5 * K + 3 * (K + 1) + 2 * K + 1
    return r + ((-r) % 128)


def build_pack_table(win_tabs, kstatic_tab, reloc_xyz, voc, coc, nv, W: int,
                     L: int, KC: int, stride: int = 1):
    """Materialize EVERY (cell, window-start) row into one (nC*NS, R) table.

    The 3-gather windowed step (static row for relocation + static row for
    evaluation + (1, W, KC) slice gather) is descriptor-bound on TPU
    (~20-40M rows/s); a single wide contiguous row gather runs at the HBM
    roofline (~100M rows/s measured, prof_kern.py).  This trades HBM
    capacity -- nC * (L-W+1) rows -- for one roofline-speed gather per
    particle-step.  Relocation candidates ride in the row, so the scan
    carries the previous step's row tail and needs NO old-cell gather.

    Built one window-start at a time (lax.fori_loop + dynamic_update_slice)
    so peak memory tracks the FINAL table (+ one (nC, R) slice), not the
    ~3x transient of materializing every per-snapshot window copy, the
    concatenated row, and a jnp.pad copy at once (ADVICE r3: the all-at-once
    build could OOM inside the budget resolve_use_pack enforces).

    Returns (pack_tab (nC, NSQ, R) f32, NSQ).  ``win_tabs`` are the 2D
    (nC, L*KC) window tables (see build_window_tables); ``stride`` > 1
    materializes rows only at every stride-th window start (W widened by
    the caller via pack_stride_plan) so the table scales to large meshes."""
    nC = win_tabs[0].shape[0]
    if voc.shape[1] != coc.shape[1]:
        # the unpack in advect.py slices vids and coc at the SAME width;
        # differing table widths would silently misalign relocation /
        # containment lanes (ADVICE r3)
        raise ValueError(
            f"verticesOnCell width {voc.shape[1]} != cellsOnCell width "
            f"{coc.shape[1]}; pad both connectivity tables to maxEdges")
    # rows i at starts min(i*stride, L-W); W here is already the widened
    # W_eff from pack_stride_plan, so NSQ = ceil((L-W)/stride) + 1
    NS = (L - W + stride - 1) // stride + 1
    f32i = enc_i32
    static = jnp.concatenate(
        [kstatic_tab.astype(jnp.float32),
         reloc_xyz.astype(jnp.float32).reshape(nC, -1),
         f32i(voc), f32i(coc), f32i(nv[:, None])], axis=1)
    r_raw = len(win_tabs) * W * KC + static.shape[1]
    R = r_raw + ((-r_raw) % 128)
    tabs_f32 = [t.astype(jnp.float32) for t in win_tabs]

    def one_start(u):
        parts = [jax.lax.dynamic_slice_in_dim(t, u * KC, W * KC, axis=1)
                 for t in tabs_f32]
        parts.append(static)
        row = jnp.concatenate(parts, axis=1)
        return jnp.pad(row, ((0, 0), (0, R - r_raw)))

    def body(i, acc):
        start = jnp.minimum(i * stride, L - W)
        return jax.lax.dynamic_update_slice(
            acc, one_start(start)[:, None, :], (0, i, 0))

    out = jax.lax.fori_loop(
        0, NS, body, jnp.zeros((nC, NS, R), jnp.float32))
    return out, NS


def build_pack_table_fields(vertex_sets, mesh_voc, vertex_xyz, reloc_xyz,
                            coc, nv, W: int, L: int, stride: int = 1,
                            cell_chunk: int = 65536,
                            with_statics: bool = True):
    """Materialize the strided pack table DIRECTLY from the per-vertex field
    tables, without ever building the intermediate (nC, L*KC) window table:
    at 500k cells / L=80 the window table (6.4 GB) plus the pack table could
    not coexist in HBM during the build.

    ``vertex_sets`` is a list of (vertex_ztop, vertex_velocity,
    vertex_vert_velocity, vertex_attrs-or-None) per snapshot (1 = streamline,
    2 = pathline).  ``W`` is the WIDENED window (pack_stride_plan); rows i
    sit at starts min(i*stride, L-W).  Built chunk-by-chunk over (cells x
    starts) with fori_loop + dynamic_update_slice so peak memory is the
    final table + one chunk's transients.

    Row layout matches build_pack_table: [windows n_win*W*KC | kstatic 5K |
    reloc 3(K+1) | i32-bitcast vids K, coc K, nv 1 | pad to 128].
    Returns (pack_tab (nC, NSQ, R) f32, NSQ)."""
    voc = jnp.clip(jnp.asarray(mesh_voc), 0)
    if jnp.asarray(mesh_voc).shape[1] != jnp.asarray(coc).shape[1]:
        raise ValueError("verticesOnCell/cellsOnCell width mismatch")
    nC, K = voc.shape
    zt0_tab = jnp.asarray(vertex_sets[0][0])
    C = 5 + (vertex_sets[0][3].shape[-1]
             if vertex_sets[0][3] is not None else 0)
    KC = K * C
    NSQ = (L - W + stride - 1) // stride + 1

    f32i = enc_i32
    if with_statics:
        vpos = jnp.asarray(vertex_xyz).astype(jnp.float32)[voc].reshape(
            nC, -1)
        z0 = zt0_tab[:, 0].astype(jnp.float32)[voc]      # (nC, K)
        zL = zt0_tab[:, L - 1].astype(jnp.float32)[voc]
        static = jnp.concatenate(
            [vpos, z0, zL,
             reloc_xyz.astype(jnp.float32).reshape(nC, -1),
             f32i(jnp.asarray(mesh_voc)), f32i(jnp.asarray(coc)),
             f32i(jnp.asarray(nv)[:, None])], axis=1)
        static_w = static.shape[1]
    else:
        static = None
        static_w = 0
    r_raw = len(vertex_sets) * W * KC + static_w
    R = r_raw + ((-r_raw) % 128)

    CH = min(nC, cell_chunk)
    n_cc = (nC + CH - 1) // CH

    def chunk_rows(vchunk, vs):
        """(CH, K) ids -> (CH, L*KC) full-column window rows for one
        snapshot (the per-chunk equivalent of build_window_tables)."""
        ztop, vel, wvel, attrs = vs
        n = vchunk.shape[0]
        zt = jnp.asarray(ztop)[vchunk]                     # (n, K, L)
        vl = jnp.asarray(vel)[vchunk]                      # (n, K, L, 3)
        wv = jnp.asarray(wvel)[vchunk][:, :, :L]
        parts = [zt[..., None], vl, wv[..., None]]
        if attrs is not None:
            parts.append(jnp.asarray(attrs)[vchunk])
        ch = jnp.concatenate(parts, axis=-1)               # (n, K, L, C)
        return jnp.transpose(ch, (0, 2, 1, 3)).reshape(
            n, L * K * C).astype(jnp.float32)

    def outer(j, acc):
        # gather each cell chunk's columns ONCE, slice every start from it
        cs = jnp.minimum(j * CH, nC - CH)
        vchunk = jax.lax.dynamic_slice_in_dim(voc, cs, CH, axis=0)
        chunks = [chunk_rows(vchunk, vs) for vs in vertex_sets]
        st_chunk = jax.lax.dynamic_slice_in_dim(static, cs, CH, axis=0) \
            if static is not None else None

        def inner(i, acc):
            start = jnp.minimum(i * stride, L - W)
            parts = [jax.lax.dynamic_slice_in_dim(c, start * K * C,
                                                  W * K * C, axis=1)
                     for c in chunks]
            if st_chunk is not None:
                parts.append(st_chunk)
            row = jnp.concatenate(parts, axis=1) if len(parts) > 1 \
                else parts[0]
            row = jnp.pad(row, ((0, 0), (0, R - r_raw)))
            return jax.lax.dynamic_update_slice(
                acc, row[:, None, :], (cs, i, 0))

        return jax.lax.fori_loop(0, NSQ, inner, acc)

    out = jax.lax.fori_loop(
        0, n_cc, outer, jnp.zeros((nC, NSQ, R), jnp.float32))
    return out, NSQ


def pack_row_gather(tab3, cell, srt):
    """One contiguous row per particle from the (nC, NS, R) table, returned
    TRANSPOSED as (R, N) -- the kernel's lanes-minor layout, written directly
    by the gather (batch dim last; see window_gather for the measurement).

    A 2-index slice gather keeps the operand's major dim at nC (flattening
    to an (nC*NS, R) single-index gather puts >1M rows in the operand at
    reference scale, which this stack's XLA lowers pathologically --
    observed to wedge the chip).  MOPS_PACK_GATHER=flat selects the flat
    variant for A/B measurement."""
    nC, NS, R = tab3.shape
    cell = jnp.clip(cell, 0).astype(jnp.int32)
    srt = srt.astype(jnp.int32)
    if os.environ.get("MOPS_PACK_GATHER") == "flat":
        return tab3.reshape(nC * NS, R)[cell * NS + srt].T
    # NOTE: keep the operand 3D -- a 2D (nC, NS*R) view with a computed
    # column start was measured 60x SLOWER here (XLA stops recognizing the
    # row-aligned slice); R is already lane-padded so the 3D layout is safe.
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1))
    si = jnp.stack([cell, srt], axis=1)
    return jax.lax.gather(tab3, si, dn, (1, 1, R),
                          mode=jax.lax.GatherScatterMode.CLIP)


def pack_stride_plan(S: int, L: int, W: int):
    """(W_eff, NSQ) for window-start stride S: rows i at starts
    min(i*S, L - W_eff), with W_eff = W + S - 1 so any exact start s* has a
    quantized start floor(s*/S)*S in (s* - S, s*] whose widened window
    still covers [s*, s* + W - 1]."""
    w_eff = min(L, W + S - 1)
    nsq = (L - w_eff + S - 1) // S + 1
    return w_eff, nsq


def quantized_starts(layer, L: int, W: int, S: int, W_eff: int, NSQ: int):
    """Per-particle (row index q, actual window start) for the strided pack
    table.  S=1 reduces to window_starts (q == start)."""
    m = window_margin(W)
    s_star = jnp.clip(layer - m, 0, L - W_eff)
    q = jnp.clip(s_star // S, 0, NSQ - 1).astype(jnp.int32)
    start = jnp.minimum(q * S, L - W_eff).astype(jnp.int32)
    return q, start


def resolve_use_pack(window_on: bool, n_cells: int, L: int, W: int,
                     n_win: int, K: int, C: int, max_id: int = 0):
    """Packed-row fast path: pick the smallest window-start stride S whose
    materialized table fits the budget (MOPS_PACK_BUDGET_GB, default 4.0).

    Returns 0 when packing is off, else the stride: S=1 materializes every
    start (smallest rows, most rows); larger S widens the per-row window to
    W + S - 1 and divides the row count by ~S, trading per-step gather bytes
    for table capacity -- the ONLY layout that scales to multi-100k-cell
    meshes, because the padded row keeps the gather a contiguous
    128-lane-aligned row read (a 3D (nC, L, K*C) window table is lane-padded
    40->128 by the TPU tiler, 3.2x memory; a 2D view makes the window slice
    start dynamic in the minor dim, which XLA lowers elementwise at ~0.6
    GB/s -- both measured).

    MOPS_WINDOW_PACK=1/0 forces on (stride via MOPS_PACK_STRIDE, default 1,
    skipping the budget check -- tests) / off."""
    if not window_on or L - W + 1 < 1:
        return 0
    if max_id >= I32_EXACT:
        # connectivity ids ride in the f32 row as VALUES (enc_i32); beyond
        # 2**24 the encode is inexact -> refuse, caller falls back
        return 0
    env = os.environ.get("MOPS_WINDOW_PACK")
    if env == "0":
        return 0
    if env == "1":
        return int(os.environ.get("MOPS_PACK_STRIDE", 1))
    budget = float(os.environ.get("MOPS_PACK_BUDGET_GB", 4.0)) * 1e9
    for S in (1, 2, 4, 8, 16, 24, 32, 48, 64):
        w_eff, nsq = pack_stride_plan(S, L, W)
        nbytes = 4 * n_cells * nsq * pack_row_floats(n_win, w_eff, K, C)
        if nbytes <= budget:
            return S
        if w_eff >= L:
            break
    return 0


def resolve_window_stride(n_cells: int, L: int, W: int, n_win: int,
                          KC: int, max_id: int = 0) -> int:
    """Stride for the 3D strided WINDOW table (window rows only, statics in
    the separate wstat table): the smallest stride whose table fits
    MOPS_WINDOW_BUDGET_GB (default 8.0).  0 = nothing fits (the caller must
    fall back to the full-table kernel).

    The 3D (nC, NSQ, R) row layout keeps the window gather a contiguous
    128-lane-aligned row read at ANY mesh size; the flat 2D window table's
    dynamic minor-dim slice start lowers elementwise on TPU (~0.6 GB/s
    measured), and a (nC, L, KC) table gets lane-padded 40->128 (3.2x)."""
    if max_id >= I32_EXACT:
        return 0       # see resolve_use_pack: enc_i32 exactness bound
    # default 6 GB: an 8 GB window table at 500k cells x L=80 compiled but
    # ran out of HBM at runtime next to the solution tables + the
    # fallback-branch temps; 6 GB admits no stride there, falling back to
    # the (fitting) full-table kernel instead of OOMing
    budget = float(os.environ.get("MOPS_WINDOW_BUDGET_GB", 6.0)) * 1e9
    for S in (1, 2, 4, 8, 16, 24, 32, 48, 64, max(1, L)):
        w_eff, nsq = pack_stride_plan(S, L, W)
        r = n_win * w_eff * KC
        r += (-r) % 128
        if 4 * n_cells * nsq * r <= budget:
            return S
        if w_eff >= L:
            break
    return 0


def resolve_use_window(explicit, pallas_on: bool, L: int,
                       interpret: bool = False) -> bool:
    """Windowed fast path: default ON when the fused kernel runs compiled on
    real TPU (OFF under the CPU interpreter, where the extra fallback branch
    only slows tests); MOPS_WINDOW=1/0 or the explicit argument override.
    Needs L > 2 for a meaningful window."""
    if explicit is not None:
        return bool(explicit) and pallas_on
    env = os.environ.get("MOPS_WINDOW")
    if env in ("0", "1"):
        return env == "1" and pallas_on
    return pallas_on and L > 2 and not interpret
