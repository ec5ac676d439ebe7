#!/usr/bin/env python
"""Minimal reproducer: compiled vs interpret window-kernel outputs on TPU.

Crafts one hexagonal cell on the equator with a constant eastward velocity
field and known layer structure; every lane gets the same particle.  The
correct outputs are known in closed form (hvel ~ (0, 10, 0) m/s, layer 8,
ok 1, miss 0).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mops_tpu.config import EARTH_RADIUS
from mops_tpu.pallas.window_kernel import fused_window_streamline_step

R = EARTH_RADIUS
K, C, W, L = 8, 5, 8, 30
N = 128

# hexagon around (R, 0, 0), radius 100 km on the tangent plane (y, z)
center = np.array([R, 0.0, 0.0])
ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
vy, vz = 1e5 * np.cos(ang), 1e5 * np.sin(ang)
verts = np.stack([np.full(6, R), vy, vz], axis=1)
verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * R  # (6, 3)
vpos = np.zeros((K, 3), np.float32)
vpos[:6] = verts

kstat = np.zeros((5 * K, N), np.float32)
for k in range(K):
    for d in range(3):
        kstat[3 * k + d, :] = vpos[k, d]
    kstat[3 * K + k, :] = 0.0        # zsurf
    kstat[4 * K + k, :] = -4000.0    # zbot

layer_true = 8
s_start = 5
dz = 4000.0 / L
win = np.zeros((W, K * C, N), np.float32)
for lw in range(W):
    lg = s_start + lw
    for k in range(K):
        win[lw, k * C + 0, :] = -lg * dz          # ztop at layer lg
        win[lw, k * C + 1, :] = 0.0               # vx
        win[lw, k * C + 2, :] = 10.0              # vy (eastward at (R,0,0))
        win[lw, k * C + 3, :] = 0.0               # vz
        win[lw, k * C + 4, :] = 1e-5              # wvel

pos = np.tile(center.astype(np.float32)[:, None], (1, N))
depth_neg = np.full((1, N), -1000.0, np.float32)
nv = np.full((1, N), 6, np.int32)
s = np.full((1, N), s_start, np.int32)

for interp in (True, False):
    out = fused_window_streamline_step(
        jnp.asarray(pos), jnp.asarray(depth_neg), jnp.asarray(nv),
        jnp.asarray(s), jnp.asarray(kstat), jnp.asarray(win), L, 120.0,
        euler=False, block=128, interpret=interp)
    new_pos, hvel, wvel, ok, layer, miss = [np.asarray(o) for o in out]
    print(f"interpret={interp}: hvel={hvel[:, 0]} wvel={wvel[0, 0]:.2e} "
          f"ok={ok[0, 0]} layer={layer[0, 0]} miss={miss[0, 0]} "
          f"dpos={np.linalg.norm(new_pos[:, 0] - pos[:, 0]):.2f}")
