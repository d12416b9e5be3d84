"""Vectorized point-in-polygon + coverage fractions (pure NumPy).

This is the exact-refinement kernel the north rule mandates: ray-casting
in vectorized NumPy inside pandas/Arrow UDFs, replacing the reference's
exactextract C++ polygon/pixel clipping (reference
src/geoglue/zonalstats.py:44-62). Even-odd crossing over ALL rings of all
member polygons handles holes and multipolygons uniformly.

Determinism: the crossing test uses half-open vertical intervals
(``y1 > py`` xor ``y2 > py``), so a point exactly on a shared horizontal
grid line is counted by exactly one of two vertically adjacent rectangles —
assignments are reproducible across partitionings and parallelism levels.
"""

from __future__ import annotations

import numpy as np

from .geometry import Geom

_EDGE_CHUNK = 256  # edges per broadcast block: bounds temp matrix memory


class PreparedGeom:
    """Edge arrays extracted once per geometry, reused across point batches."""

    __slots__ = ("x1", "y1", "x2", "y2", "bbox")

    def __init__(self, geom: Geom):
        xs1, ys1, xs2, ys2 = [], [], [], []
        for poly in geom:
            for ring in poly:
                r = np.asarray(ring, dtype=np.float64)
                if not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[:1]])
                xs1.append(r[:-1, 0])
                ys1.append(r[:-1, 1])
                xs2.append(r[1:, 0])
                ys2.append(r[1:, 1])
        self.x1 = np.concatenate(xs1)
        self.y1 = np.concatenate(ys1)
        self.x2 = np.concatenate(xs2)
        self.y2 = np.concatenate(ys2)
        allx = np.concatenate([self.x1, self.x2])
        ally = np.concatenate([self.y1, self.y2])
        self.bbox = (allx.min(), ally.min(), allx.max(), ally.max())


def points_in_geom(lon: np.ndarray, lat: np.ndarray, geom: "Geom | PreparedGeom") -> np.ndarray:
    """Even-odd ray cast: bool mask of points inside the geometry.

    O(edges x points) in chunked NumPy broadcasts — no Python per point.
    """
    prep = geom if isinstance(geom, PreparedGeom) else PreparedGeom(geom)
    px = np.asarray(lon, dtype=np.float64)
    py = np.asarray(lat, dtype=np.float64)
    out_shape = px.shape
    px = px.ravel()
    py = py.ravel()

    # bbox pre-filter: points outside the hull can't be inside
    minx, miny, maxx, maxy = prep.bbox
    cand = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
    inside = np.zeros(px.shape[0], dtype=bool)
    if not cand.any():
        return inside.reshape(out_shape)

    cx = px[cand]
    cy = py[cand]
    crossings = np.zeros(cx.shape[0], dtype=np.int64)
    n_edges = prep.x1.shape[0]
    for s in range(0, n_edges, _EDGE_CHUNK):
        e = slice(s, min(s + _EDGE_CHUNK, n_edges))
        x1 = prep.x1[e][:, None]
        y1 = prep.y1[e][:, None]
        x2 = prep.x2[e][:, None]
        y2 = prep.y2[e][:, None]
        straddle = (y1 > cy[None, :]) != (y2 > cy[None, :])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (cy[None, :] - y1) / (y2 - y1) + x1
        crossings += np.count_nonzero(straddle & (cx[None, :] < xint), axis=0)
    inside[cand] = (crossings % 2) == 1
    return inside.reshape(out_shape)


def coverage_fractions(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    geom: "Geom | PreparedGeom",
    supersample: int = 16,
) -> np.ndarray:
    """Fractional coverage of axis-aligned cells by a geometry.

    Replaces exactextract's analytic partial-pixel clipping
    (reference src/geoglue/zonalstats.py:44) with deterministic n x n
    center-point supersampling: error <= O(perimeter-through-cell / n).
    Interior/exterior cells (decided upstream) never reach this kernel,
    so cost is O(boundary_cells * n^2) only.
    """
    prep = geom if isinstance(geom, PreparedGeom) else PreparedGeom(geom)
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    n = supersample
    # sub-center offsets in [0,1): (i + 0.5) / n
    off = (np.arange(n, dtype=np.float64) + 0.5) / n
    ox, oy = np.meshgrid(off, off)  # (n, n)
    # (cells, n*n) sample coordinates
    sx = minx[:, None] + (maxx - minx)[:, None] * ox.ravel()[None, :]
    sy = miny[:, None] + (maxy - miny)[:, None] * oy.ravel()[None, :]
    inside = points_in_geom(sx, sy, prep)
    return inside.mean(axis=1)
