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


def default_window(L: int) -> int:
    """Window size: MOPS_WINDOW_W (default 8), clamped to [4, L]."""
    w = int(os.environ.get("MOPS_WINDOW_W", 8))
    return max(2, min(L, max(4, w)))


def window_margin(W: int) -> int:
    """Window start offset below the carried layer (W/2 - 1)."""
    return max(1, W // 2 - 1)


def build_window_tables(mesh_voc, vertex_xyz, vertex_ztop, vertex_velocity,
                        vertex_vert_velocity, vertex_attrs=None):
    """(win_tab (nC, L, K*C), kstatic (nC, 5K), C) from per-vertex tables.

    One-time per run (inside jit); the per-(cell, layer) chunk layout is
    k-major [ztop, vx, vy, vz, wvel] (+ attrs), so a (1, W, K*C) gather slice
    is one CONTIGUOUS row run -- the shape XLA's TPU gather handles at
    near-bandwidth with a single descriptor per particle."""
    voc = jnp.clip(mesh_voc, 0)                       # (nC, K)
    zt = vertex_ztop[voc]                             # (nC, K, L)
    vel = vertex_velocity[voc]                        # (nC, K, L, 3)
    L = zt.shape[2]
    wv = vertex_vert_velocity[voc][:, :, :L]          # (nC, K, L)
    parts = [zt[..., None], vel, wv[..., None]]
    if vertex_attrs is not None:
        parts.append(vertex_attrs[voc])               # (nC, K, L, A)
    chunk = jnp.concatenate(parts, axis=-1)           # (nC, K, L, C)
    nC, K, _, C = chunk.shape
    win_tab = jnp.transpose(chunk, (0, 2, 1, 3)).reshape(nC, L, K * C)
    vpos = vertex_xyz[voc].reshape(nC, 3 * K)
    kstatic = jnp.concatenate([vpos, zt[:, :, 0], zt[:, :, L - 1]], axis=1)
    return win_tab, kstatic, C


def window_starts(layer, L: int, W: int):
    """Per-particle window start s = clip(layer - margin, 0, L - W)."""
    return jnp.clip(layer - window_margin(W), 0, L - W).astype(jnp.int32)


def window_gather(win_tab, cells, starts, W: int):
    """One-descriptor windowed slice gather -> (W, K*C, N) kernel layout.

    offset_dims=(0, 1) puts the particle batch dim LAST, so the gather
    writes the kernel's lanes-minor layout directly -- measured 3-4x faster
    on TPU than gathering (N, W, KC) and transposing (prof_gather_layout.py:
    the moveaxis costs a full extra HBM pass over the gathered bytes)."""
    KC = win_tab.shape[2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 1), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    si = jnp.stack([cells.astype(jnp.int32), starts.astype(jnp.int32)],
                   axis=1)
    return jax.lax.gather(win_tab, si, dn, (1, W, KC),
                          mode=jax.lax.GatherScatterMode.CLIP)


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


def build_pack_table(win_tabs, kstatic_tab, reloc_xyz, voc, coc, nv, W: int):
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

    Returns (pack_tab (nC, NS, R) f32, NS)."""
    nC, L, KC = win_tabs[0].shape
    if voc.shape[1] != coc.shape[1]:
        # the unpack in advect.py slices vids and coc at the SAME width;
        # differing table widths would silently misalign relocation /
        # containment lanes (ADVICE r3)
        raise ValueError(
            f"verticesOnCell width {voc.shape[1]} != cellsOnCell width "
            f"{coc.shape[1]}; pad both connectivity tables to maxEdges")
    NS = L - W + 1
    f32i = lambda a: jax.lax.bitcast_convert_type(
        a.astype(jnp.int32), jnp.float32)
    static = jnp.concatenate(
        [kstatic_tab.astype(jnp.float32),
         reloc_xyz.astype(jnp.float32).reshape(nC, -1),
         f32i(voc), f32i(coc), f32i(nv[:, None])], axis=1)
    r_raw = len(win_tabs) * W * KC + static.shape[1]
    R = r_raw + ((-r_raw) % 128)
    tabs_f32 = [t.astype(jnp.float32) for t in win_tabs]

    def one_start(u):
        parts = [jax.lax.dynamic_slice_in_dim(t, u, W, axis=1)
                 .reshape(nC, W * KC) for t in tabs_f32]
        parts.append(static)
        row = jnp.concatenate(parts, axis=1)
        return jnp.pad(row, ((0, 0), (0, R - r_raw)))

    def body(u, acc):
        return jax.lax.dynamic_update_slice(
            acc, one_start(u)[:, None, :], (0, u, 0))

    out = jax.lax.fori_loop(
        0, NS, body, jnp.zeros((nC, NS, R), jnp.float32))
    return out, NS


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
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1))
    si = jnp.stack([cell, srt], axis=1)
    return jax.lax.gather(tab3, si, dn, (1, 1, R),
                          mode=jax.lax.GatherScatterMode.CLIP)


def resolve_use_pack(window_on: bool, n_cells: int, L: int, W: int,
                     n_win: int, K: int, C: int) -> bool:
    """Packed-row fast path: auto-ON whenever the windowed path runs and the
    materialized table fits the budget (MOPS_PACK_BUDGET_GB, default 4.0).
    MOPS_WINDOW_PACK=1/0 forces it (1 skips the budget check -- tests)."""
    if not window_on or L - W + 1 < 1:
        return False
    env = os.environ.get("MOPS_WINDOW_PACK")
    if env == "0":
        return False
    if env == "1":
        return True
    budget = float(os.environ.get("MOPS_PACK_BUDGET_GB", 4.0)) * 1e9
    nbytes = 4 * n_cells * (L - W + 1) * pack_row_floats(n_win, W, K, C)
    return nbytes <= budget


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
