"""Trajectory finalization: record buffers -> TrajectoryLine list + NaN cleanup.

Vectorized re-implementation of the host-side plumbing in
reference src/Common/TrajectoryCommon.h:
  - InitTrajectoryLines (:43-55): each line starts with its seed point;
  - FinalizeTrajectoryLines[WithAttrs] (:131-190): append the R record slots;
    note the reference pushes R velocities against R+1 points, and the
    WithAttrs variant copies velocity.x/.y into temperature/salinity
    (TrajectoryCommon.h:179-180) -- the computed attrs are discarded there.
    We reproduce those fields for drop-in parity AND expose the real sampled
    attributes in ``TrajectoryLine.attrs``.
  - RemoveNaNTrajectoriesAndReindex (:57-129): truncate at the first
    non-finite point, pad with the last valid point, zero the velocity there.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .settings import TrajectoryLine, TrajectorySettings


def finalize_trajectories(seeds: np.ndarray,
                          points: np.ndarray,
                          velocities: np.ndarray,
                          settings: TrajectorySettings,
                          attrs: Optional[np.ndarray] = None,
                          with_attrs: bool = False) -> List[TrajectoryLine]:
    """Assemble + clean trajectory lines from raw (N, R, 3) record buffers.

    Matches Common::FinalizeTrajectoryLines followed by
    RemoveNaNTrajectoriesAndReindex (reference src/Common/TrajectoryCommon.h).
    """
    seeds = np.asarray(seeds, dtype=np.float64)
    points = np.asarray(points, dtype=np.float64)
    velocities = np.asarray(velocities, dtype=np.float64)
    n, n_rec = points.shape[:2]

    # points: [seed] + R records; velocity: R records + one trailing zero
    # (the cleanup's resize(original_len) append, TrajectoryCommon.h:88).
    pts = np.concatenate([seeds[:, None, :], points], axis=1)      # (N, R+1, 3)
    vel = np.concatenate(
        [velocities, np.zeros((n, 1, 3), dtype=velocities.dtype)], axis=1)

    if with_attrs and attrs is not None:
        att = np.asarray(attrs, dtype=np.float64)
        att = np.concatenate([att, np.zeros((n, 1, 3))], axis=1)
        # reference bug preserved: temperature/salinity get velocity.x/.y
        # (TrajectoryCommon.h:179-180)
        temp = np.concatenate([vel[:, :-1, 0], np.zeros((n, 1))], axis=1)
        sal = np.concatenate([vel[:, :-1, 1], np.zeros((n, 1))], axis=1)
    else:
        att = None
        temp = np.zeros((n, n_rec + 1))
        sal = np.zeros((n, n_rec + 1))

    finite = np.isfinite(pts).all(axis=2)                          # (N, R+1)
    # first non-finite index per line (R+1 if none)
    bad = ~finite
    cut = np.where(bad.any(axis=1), bad.argmax(axis=1), n_rec + 1)

    depths = settings.effective_depths(n)
    lines: List[TrajectoryLine] = []
    for i in range(n):
        p = pts[i].copy()
        v = vel[i].copy()
        t = temp[i].copy()
        s = sal[i].copy()
        a = att[i].copy() if att is not None else None
        k = int(cut[i])
        if k == 0:
            p[:] = p[0]
            v[:] = 0.0
            t[:] = t[0]
            s[:] = s[0]
        elif k < n_rec + 1:
            p[k:] = p[k - 1]
            v[k - 1:] = 0.0
            t[k:] = t[k - 1]
            s[k:] = s[k - 1]
        lines.append(TrajectoryLine(
            line_id=i,
            points=p, velocity=v, temperature=t, salinity=s,
            last_point=p[-1].copy(),
            duration=float(settings.simulation_duration),
            timestamp=float(settings.delta_t),
            depth=float(depths[i]),
            attrs=a,
        ))
    return lines


def remove_nan_trajectories_and_reindex(lines: List[TrajectoryLine]) -> List[TrajectoryLine]:
    """Standalone cleanup pass mirroring
    MPASOVisualizer::removeNaNTrajectoriesAndReindex
    (reference src/Core/MPASOVisualizer.cpp:304-307)."""
    cleaned: List[TrajectoryLine] = []
    for line in lines:
        p = np.asarray(line.points, dtype=np.float64).copy()
        if p.shape[0] == 0:
            continue
        n_pts = p.shape[0]
        v = np.zeros((n_pts, 3)) if line.velocity is None or len(line.velocity) == 0 \
            else np.asarray(line.velocity, dtype=np.float64).copy()
        if v.shape[0] < n_pts:
            v = np.concatenate([v, np.zeros((n_pts - v.shape[0], 3))], axis=0)
        t = np.resize(np.asarray(line.temperature, dtype=np.float64), n_pts) \
            if line.temperature is not None and len(line.temperature) else np.zeros(n_pts)
        s = np.resize(np.asarray(line.salinity, dtype=np.float64), n_pts) \
            if line.salinity is not None and len(line.salinity) else np.zeros(n_pts)

        finite = np.isfinite(p).all(axis=1)
        k = int((~finite).argmax()) if (~finite).any() else n_pts
        if k == 0:
            p[:] = p[0]
            v[:] = 0.0
            t[:] = t[0]
            s[:] = s[0]
        elif k < n_pts:
            p[k:] = p[k - 1]
            v[k - 1:] = 0.0
            t[k:] = t[k - 1]
            s[k:] = s[k - 1]
        cleaned.append(TrajectoryLine(
            line_id=len(cleaned),
            points=p, velocity=v, temperature=t, salinity=s,
            last_point=p[-1].copy(),
            duration=line.duration, timestamp=line.timestamp,
            depth=line.depth, attrs=line.attrs))
    return cleaned
