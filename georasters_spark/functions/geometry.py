"""Vectorized computational geometry — point-in-polygon + all_touched.

No shapely/GDAL in-sandbox (and the north rule wants the kernel from
scratch): polygons are ring arrays ``[[x, y], ...]`` (outer ring first,
holes after). Containment uses the even-odd (crossing-number) rule over
all rings, which handles holes with no special casing.

``cells_touched`` re-realizes rasterstats' ``all_touched=True`` cell
selection used by the reference's clip/stats
(georasters.py:884-886): a cell is selected when the polygon touches
any part of the cell rectangle — here: center inside, any corner
inside, any polygon vertex inside the cell, or any polygon edge
intersecting the rectangle (Liang-Barsky).

All functions take numpy arrays of points/cells and loop only over
polygon *edges* (small) — Arrow-batch friendly.
"""

from __future__ import annotations

import numpy as np


def points_in_rings(px, py, rings) -> np.ndarray:
    """Even-odd point-in-polygon over all rings. Strictly-inside points
    are classified correctly; boundary points are arbitrary (fixtures
    keep vertices off pixel centers)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        v = np.asarray(ring, dtype=np.float64)
        x1, y1 = v[:, 0], v[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for i in range(len(v)):
            a, b, c, d = x1[i], y1[i], x2[i], y2[i]
            if b == d:
                continue
            crosses = (b > py) != (d > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (c - a) * (py - b) / (d - b) + a
            inside ^= crosses & (px < xint)
    return inside


def _seg_intersects_rect(ax, ay, bx, by, rx0, ry0, rx1, ry1) -> np.ndarray:
    """Liang-Barsky: does segment (a, b) intersect each axis-aligned
    rect [rx0, rx1] x [ry0, ry1]? rect bounds are numpy arrays."""
    dx, dy = bx - ax, by - ay
    t0 = np.zeros(np.shape(rx0), dtype=np.float64)
    t1 = np.ones(np.shape(rx0), dtype=np.float64)
    ok = np.ones(np.shape(rx0), dtype=bool)
    for p, q in (
        (-dx, ax - rx0),
        (dx, rx1 - ax),
        (-dy, ay - ry0),
        (dy, ry1 - ay),
    ):
        q = np.asarray(q, dtype=np.float64)
        if p == 0.0:
            ok &= q >= 0.0
            continue
        t = q / p
        if p < 0.0:
            t0 = np.maximum(t0, t)
        else:
            t1 = np.minimum(t1, t)
    return ok & (t0 <= t1)


def cells_touched(xc, yc, cellx, celly, rings) -> np.ndarray:
    """all_touched cell test for cells with *centers* (xc, yc) and size
    (cellx, celly) (celly < 0). Vectorized over cells."""
    xc = np.asarray(xc, dtype=np.float64)
    yc = np.asarray(yc, dtype=np.float64)
    hx, hy = abs(cellx) / 2.0, abs(celly) / 2.0
    rx0, rx1 = xc - hx, xc + hx
    ry0, ry1 = yc - hy, yc + hy

    touched = points_in_rings(xc, yc, rings)
    for cx, cy in ((rx0, ry0), (rx0, ry1), (rx1, ry0), (rx1, ry1)):
        touched |= points_in_rings(cx, cy, rings)
    # polygon vertices inside a cell
    for ring in rings:
        v = np.asarray(ring, dtype=np.float64)
        for vx, vy in v:
            touched |= (rx0 <= vx) & (vx <= rx1) & (ry0 <= vy) & (vy <= ry1)
    # polygon edges crossing a cell
    for ring in rings:
        v = np.asarray(ring, dtype=np.float64)
        x1, y1 = v[:, 0], v[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for i in range(len(v)):
            todo = ~touched
            if not todo.any():
                break
            hit = _seg_intersects_rect(
                x1[i], y1[i], x2[i], y2[i],
                rx0[todo], ry0[todo], rx1[todo], ry1[todo],
            )
            idx = np.flatnonzero(todo)
            touched[idx[hit]] = True
    return touched


def rings_bbox(rings) -> tuple[float, float, float, float]:
    v = np.concatenate([np.asarray(r, dtype=np.float64) for r in rings])
    return float(v[:, 0].min()), float(v[:, 1].min()), float(v[:, 0].max()), float(v[:, 1].max())
