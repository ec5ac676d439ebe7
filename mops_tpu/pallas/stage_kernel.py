"""Fused RK4 streamline step as a Pallas TPU kernel.

One kernel invocation advances a block of particles through the WHOLE step --
containment test, Wachspress weights, ztop profile + monotonic clamp, binary
layer search, vertical lerp of velocity/vertical-velocity, all four RK stages,
and the sphere position/depth update -- with the per-cell vertex columns held
in VMEM across all stages.  The XLA path re-reads the gathered columns from
HBM per stage (~60 KB/particle/step); this kernel reads them once
(~8.5 KB/particle/step), the HBM-bandwidth floor for this layout.

Data layout: PARTICLES IN LANES.  Every reference-scalar quantity becomes a
(1, B) vector, vertex-indexed quantities (K, B), layer-indexed (L, B); all
VPU ops then run at full lane utilization with K/L as unrolled Python loops
(K ~ 7, L <= 128 -- static).  The caller pre-gathers and transposes the
per-cell columns (one XLA gather per step, same as the fast path).

Wired into the production advection driver: ``advect.run_advection`` routes
streamline steps through this kernel when enabled (auto on TPU float32, or
forced with MOPS_USE_PALLAS=1 / ``use_pallas=True``); ``bench.py`` therefore
exercises this path on real hardware.  Numerically validated in interpret
mode against the XLA stage functions (tests/test_pallas.py) and end-to-end
through the driver (test_advect.py::test_pallas_driver_matches_xla).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EPS_LAYER, EPS_ZERO, ZTOP_CLAMP


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas  # noqa: F401
        return True
    except ImportError:
        return False


def _kernel(pos_ref, depthneg_ref, nv_ref, cols_ref, dt_ref,
            newpos_ref, hvel_ref, wvelout_ref, ok_ref,
            *, K: int, L: int, LP1: int, euler: bool):
    """Block body. Shapes (lanes = particles, B = block):
    pos (3, B), depthneg (1, B), nv (1, B), dt (1, 1) SMEM, and the packed
    per-cell vertex columns cols (K, F, B) with per-vertex field layout
    [xyz(3) | ztop(L) | vel(L*3, layer-major) | wvel(LP1)] -- one fused row
    per vertex so the caller does ONE gather per step (see
    pack_vertex_table)."""
    OFF_ZT = 3
    OFF_V = 3 + L
    OFF_W = 3 + 4 * L

    def vpos_ref(k, d):
        return cols_ref[k, d, :]

    def ztop_at(k, l):
        return cols_ref[k, OFF_ZT + l, :]

    def vel_at(k, l, d):
        return cols_ref[k, OFF_V + 3 * l + d, :]

    def wvel_at(k, l):
        return cols_ref[k, OFF_W + l, :]
    pos = [pos_ref[d, :] for d in range(3)]          # 3 x (B,)
    depth_neg = depthneg_ref[0, :]
    nv = nv_ref[0, :]
    dt = dt_ref[0, 0]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def norm(a):
        return jnp.sqrt(dot(a, a))

    vpos = [[vpos_ref(k, d) for d in range(3)] for k in range(K)]

    def vnext(k):
        """vertex (k+1) mod nv, lane-wise.

        j follows k when j == k+1 < nv, or j == 0 and k == nv-1.  k and j are
        static Python ints, so the inner predicates fold to compile-time
        bools; only vector int comparisons reach Mosaic (a boolean-typed
        select lowers to an unsupported i8->i1 truncation)."""
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

    def eval_stage(p):
        """CalcVelocityAt at position p (3 x (B,)). Returns hvel, wvel, ok."""
        # containment: cross(A_k, B_k) . p >= 0 for all valid edges
        inside = jnp.isfinite(p[0]) & jnp.isfinite(p[1]) & jnp.isfinite(p[2])
        for k in range(K):
            b = vnext(k)
            c = cross(vpos[k], b)
            d = dot(c, p)
            inside = inside & ((k >= nv) | (d >= 0.0))

        # Wachspress weights
        def tri_area(a, b, c):
            e1 = [b[i] - a[i] for i in range(3)]
            e2 = [c[i] - a[i] for i in range(3)]
            cr = cross(e1, e2)
            return 0.5 * jnp.sqrt(dot(cr, cr))

        w = []
        wsum = jnp.zeros_like(p[0])
        for k in range(K):
            # previous vertex: statically vpos[k-1] for k > 0; for k == 0 it
            # is vpos[nv-1], a lane-wise pick on a vector int comparison only
            # (no boolean-typed select -- Mosaic can't truncate i8->i1).
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
        w = [wk * inv for wk in w]

        # ztop profile + monotonic clamp (sequential, unrolled over L)
        z = []
        for l in range(L):
            acc = jnp.zeros_like(p[0])
            for k in range(K):
                acc = acc + w[k] * ztop_at(k, l)
            z.append(acc)
        for l in range(1, L):
            z[l] = jnp.where(z[l] > z[l - 1], z[l - 1] - ZTOP_CLAMP, z[l])

        # binary layer search (reference streamline semantics)
        above = depth_neg > z[0] + EPS_LAYER
        below = depth_neg < z[L - 1] - EPS_LAYER
        lo = jnp.ones_like(nv)
        hi = jnp.full_like(nv, L - 1)
        ans = jnp.ones_like(nv)
        found = jnp.zeros_like(above)

        def zpick(idx):
            out = jnp.zeros_like(p[0])
            for l in range(L):
                out = jnp.where(idx == l, z[l], out)
            return out

        for _ in range(int(np.ceil(np.log2(max(2, L)))) + 2):
            active = (~found) & (lo <= hi)
            mid = (lo + hi) >> 1
            top_i = zpick(mid - 1)
            bot_i = zpick(mid)
            hit = (depth_neg <= top_i + EPS_LAYER) & \
                  (depth_neg >= bot_i - EPS_LAYER)
            ans = jnp.where(active & hit, mid, ans)
            found = found | (active & hit)
            go_up = depth_neg > top_i + EPS_LAYER
            hi = jnp.where(active & ~hit & go_up, mid - 1, hi)
            lo = jnp.where(active & ~hit & ~go_up, mid + 1, lo)
        ans = jnp.clip(ans, 1, L - 1)
        layer = jnp.where(above, 1, jnp.where(below, L - 1, ans))

        z_dn = zpick(layer)
        z_up = zpick(layer - 1)
        x = jnp.clip(depth_neg, z_dn, z_up)
        denom = z_up - z_dn
        ok_denom = jnp.abs(denom) >= EPS_ZERO
        t = (x - z_dn) / jnp.where(ok_denom, denom, 1.0)

        # velocity pick at layer / layer-1
        v_up = [jnp.zeros_like(p[0]) for _ in range(3)]
        v_dn = [jnp.zeros_like(p[0]) for _ in range(3)]
        for l in range(L):
            m_up = (layer - 1) == l
            m_dn = layer == l
            for d in range(3):
                acc = jnp.zeros_like(p[0])
                for k in range(K):
                    acc = acc + w[k] * vel_at(k, l, d)
                v_up[d] = jnp.where(m_up, acc, v_up[d])
                v_dn[d] = jnp.where(m_dn, acc, v_dn[d])
        ok_mag = (norm(v_dn) >= EPS_ZERO) & (norm(v_up) >= EPS_ZERO)
        hv = [t * v_up[d] + (1.0 - t) * v_dn[d] for d in range(3)]
        ok_final = norm(hv) >= EPS_ZERO

        # vertical velocity
        dn_if = jnp.minimum(layer, LP1 - 1)
        up_if = jnp.minimum(jnp.maximum(layer - 1, 0), LP1 - 1)
        w_up = jnp.zeros_like(p[0])
        w_dn = jnp.zeros_like(p[0])
        for l in range(LP1):
            acc = jnp.zeros_like(p[0])
            for k in range(K):
                acc = acc + w[k] * wvel_at(k, l)
            w_up = jnp.where(up_if == l, acc, w_up)
            w_dn = jnp.where(dn_if == l, acc, w_dn)
        wv = t * w_up + (1.0 - t) * w_dn

        ok = inside & ok_denom & ok_mag & ok_final
        hv = [jnp.where(ok, h, 0.0) for h in hv]
        wv = jnp.where(ok, wv, 0.0)
        return hv, wv, ok

    def advect(p, v, dtl):
        """Rodrigues rotation mid-stage move (identity when degenerate)."""
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
        hv, wv, ok = eval_stage(pos)
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
        k1, w1, ok1 = eval_stage(pos)
        p2 = advect(pos, k1, dt * 0.5)
        k2, w2, ok2 = eval_stage(p2)
        p3 = advect(pos, k2, dt * 0.5)
        k3, w3, ok3 = eval_stage(p3)
        p4 = advect(pos, k3, dt)
        k4, w4, ok4 = eval_stage(p4)
        step_ok = ok1 & ok2 & ok3 & ok4
        hv = [(k1[d] + 2 * k2[d] + 2 * k3[d] + k4[d]) / 6.0 for d in range(3)]
        wv = (w1 + 2 * w2 + 2 * w3 + w4) / 6.0
        xt = [pos[d] + hv[d] * dt for d in range(3)]
        xl = jnp.sqrt(xt[0] ** 2 + xt[1] ** 2 + xt[2] ** 2)
        good = xl > EPS_ZERO
        new_pos = [jnp.where(good, xt[d] / jnp.where(xl == 0, 1.0, xl) * r, pos[d])
                   for d in range(3)]

    for d in range(3):
        newpos_ref[d, :] = new_pos[d]
        hvel_ref[d, :] = hv[d]
    wvelout_ref[0, :] = wv
    ok_ref[0, :] = step_ok.astype(jnp.int32)


def pack_vertex_table(vertex_xyz, vertex_ztop, vertex_velocity,
                      vertex_vert_velocity):
    """Fuse the four per-vertex tables into one (nV, F) row table with layout
    [xyz(3) | ztop(L) | vel(L*3, layer-major) | wvel(LP1)], F = 3+4L+LP1.

    One row gather then serves the whole fused step (vs four separate
    gathers), which roughly halves the per-step HBM gather cost on TPU --
    XLA's gather is row-descriptor-bound, so fewer/wider rows win.
    """
    nv_count, L = vertex_ztop.shape
    return jnp.concatenate(
        [vertex_xyz, vertex_ztop,
         vertex_velocity.reshape(nv_count, 3 * L),
         vertex_vert_velocity], axis=1)


def fused_streamline_step(pos, depth_neg, nv, cols, L, dt,
                          euler: bool = False,
                          block: int = 256, interpret: bool = False):
    """Run the fused step kernel.

    Args (particle-lane layout, N padded to a multiple of ``block``):
      pos (3, N), depth_neg (1, N), nv (1, N) int32,
      cols (K, F, N) packed per-cell vertex columns (pack_vertex_table
      layout, gathered per particle), L = number of layers, dt scalar.
    Returns (new_pos (3, N), hvel (3, N), wvel (1, N), ok (1, N) int32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, F, n = cols.shape
    LP1 = F - 3 - 4 * L
    real = pos.dtype
    grid = (n // block,)

    def pspec(*lead):
        return pl.BlockSpec(lead + (block,),
                            lambda i, _r=len(lead): (0,) * _r + (i,),
                            memory_space=pltpu.VMEM)

    dt_arr = jnp.asarray([[dt]], dtype=real)
    kern = functools.partial(_kernel, K=K, L=L, LP1=LP1, euler=euler)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pspec(3), pspec(1), pspec(1), pspec(K, F),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[pspec(3), pspec(3), pspec(1), pspec(1)],
        out_shape=[jax.ShapeDtypeStruct((3, n), real),
                   jax.ShapeDtypeStruct((3, n), real),
                   jax.ShapeDtypeStruct((1, n), real),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)],
        interpret=interpret,
    )(pos, depth_neg, nv, cols, dt_arr)


def resolve_use_pallas(explicit, dtype) -> bool:
    """Decide whether the fused kernel drives the streamline step.

    Priority: an explicit ``use_pallas`` argument > the MOPS_USE_PALLAS env
    var ("1"/"0") > auto-detection (on when the default backend is a real TPU
    and the particle dtype is float32, the kernel's native regime; Mosaic has
    no f64, and on CPU the interpreter would be slower than the XLA path).
    """
    if explicit is not None:
        return bool(explicit)
    env = os.environ.get("MOPS_USE_PALLAS")
    if env in ("0", "1"):
        return env == "1"
    import jax
    return (jax.default_backend() == "tpu"
            and jnp.dtype(dtype) == jnp.float32
            and pallas_available())
