"""Regular lon/lat grid math — the griddes analog.

Mirrors the reference's ``CdoGriddes`` (reference src/geoglue/types.py:183-277:
gridtype lonlat, xsize/ysize, xfirst/xinc, yfirst/yinc) but normalized to
west/south *edge* origin with positive increments; a ``y_descending`` flag
records the lat-descending storage convention the reference enforces at read
time (reference src/geoglue/util.py:165-172) without affecting index math.

Everything here exists twice: a NumPy form (used inside Arrow UDF kernels)
and a Spark ``Column`` form (JVM-side, whole-stage-codegen'd) so the hot
path never drops into Python per row.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


@dataclass(frozen=True)
class Grid:
    """A regular lon/lat grid. ``x0``/``y0`` are west/south cell EDGES,
    ``dx``/``dy`` positive increments, ``nx``/``ny`` cell counts."""

    x0: float
    dx: float
    nx: int
    y0: float
    dy: float
    ny: int
    y_descending: bool = False
    grid_id: str = ""

    # ---- constructors -------------------------------------------------
    @staticmethod
    def from_centers(
        xfirst: float, xinc: float, xsize: int, yfirst: float, yinc: float, ysize: int
    ) -> "Grid":
        """CDO-style center convention (types.py:216-247). Negative yinc
        (lat stored descending) is normalized to a south-edge origin."""
        y_desc = yinc < 0
        yinc_abs = abs(yinc)
        y_south_center = yfirst - (ysize - 1) * yinc_abs if y_desc else yfirst
        return Grid(
            x0=xfirst - xinc / 2.0,
            dx=xinc,
            nx=xsize,
            y0=y_south_center - yinc_abs / 2.0,
            dy=yinc_abs,
            ny=ysize,
            y_descending=y_desc,
        )

    @staticmethod
    def global_grid(level: int) -> "Grid":
        """Global quadkey-style grid: 2^level x 2^(level-1) square-degree
        cells. level=13 -> ~0.044 deg (~4.9 km at equator) cells."""
        n = 1 << level
        return Grid(
            x0=-180.0, dx=360.0 / n, nx=n, y0=-90.0, dy=360.0 / n, ny=n // 2,
            grid_id=f"global-q{level}",
        )

    # ---- scalar/NumPy index math --------------------------------------
    def ix(self, lon) -> np.ndarray:
        return np.clip(np.floor((np.asarray(lon) - self.x0) / self.dx), 0, self.nx - 1).astype(
            np.int64
        )

    def iy(self, lat) -> np.ndarray:
        return np.clip(np.floor((np.asarray(lat) - self.y0) / self.dy), 0, self.ny - 1).astype(
            np.int64
        )

    def cell_id_np(self, lon, lat) -> np.ndarray:
        return self.iy(lat) * np.int64(self.nx) + self.ix(lon)

    def cell_bounds(self, ix, iy):
        """(minx, miny, maxx, maxy) arrays for cell indices."""
        ix = np.asarray(ix, dtype=np.float64)
        iy = np.asarray(iy, dtype=np.float64)
        return (
            self.x0 + ix * self.dx,
            self.y0 + iy * self.dy,
            self.x0 + (ix + 1) * self.dx,
            self.y0 + (iy + 1) * self.dy,
        )

    def centers(self, ix, iy):
        return (
            self.x0 + (np.asarray(ix) + 0.5) * self.dx,
            self.y0 + (np.asarray(iy) + 0.5) * self.dy,
        )

    def cell_area_km2_np(self, iy) -> np.ndarray:
        """Spherical cell area (the reference's ``area_spherical_km2``
        coverage weight, types.py:77-82): R^2 * dlon * (sin(top)-sin(bot))."""
        _, y_bot, _, y_top = self.cell_bounds(np.zeros_like(iy), iy)
        dlam = math.radians(self.dx)
        return (
            EARTH_RADIUS_KM**2
            * dlam
            * (np.sin(np.radians(y_top)) - np.sin(np.radians(y_bot)))
        )

    # ---- Spark Column index math (JVM-side, codegen) -------------------
    def ix_col(self, lon: Column) -> Column:
        """Clamped column index — for on-grid raster coordinates only."""
        raw = F.floor((lon - F.lit(self.x0)) / F.lit(self.dx))
        return F.greatest(F.lit(0), F.least(F.lit(self.nx - 1), raw)).cast("long")

    def iy_col(self, lat: Column) -> Column:
        """Clamped column index — for on-grid raster coordinates only."""
        raw = F.floor((lat - F.lit(self.y0)) / F.lit(self.dy))
        return F.greatest(F.lit(0), F.least(F.lit(self.ny - 1), raw)).cast("long")

    def cell_id_col(self, lon: Column, lat: Column) -> Column:
        """Cell id, NULL outside the grid domain [x0, x0+nx*dx) x [y0, ...).

        NULL (not clamped): a point outside the grid must never join the
        cover table — clamping would silently glue off-domain points onto
        edge cells and mis-assign them to border admins."""
        ix = F.floor((lon - F.lit(self.x0)) / F.lit(self.dx)).cast("long")
        iy = F.floor((lat - F.lit(self.y0)) / F.lit(self.dy)).cast("long")
        valid = (
            (ix >= 0) & (ix < F.lit(int(self.nx))) & (iy >= 0) & (iy < F.lit(int(self.ny)))
        )
        return F.when(valid, iy * F.lit(int(self.nx)) + ix).otherwise(
            F.lit(None).cast("long")
        )

    def cell_prefix_col(self, cell_id: Column, shift: int = 4) -> Column:
        """Coarse spatial partition key: co-locates a (2^shift)^2 block of
        cells. Used for explicit repartitioning before heavy UDF stages so
        a 1000-executor run keeps spatial locality (north rule)."""
        iy = (cell_id / F.lit(int(self.nx))).cast("long")
        ix = cell_id - iy * F.lit(int(self.nx))
        return F.shiftright(iy, shift) * F.lit(1 << 20) + F.shiftright(ix, shift)

    def cell_area_km2_col(self, cell_id: Column) -> Column:
        """JVM-side spherical cell area from the cell id alone."""
        iy = (cell_id / F.lit(int(self.nx))).cast("long")
        y_bot = F.lit(self.y0) + iy.cast("double") * F.lit(self.dy)
        y_top = y_bot + F.lit(self.dy)
        dlam = math.radians(self.dx)
        return (
            F.lit(EARTH_RADIUS_KM**2 * dlam)
            * (F.sin(F.radians(y_top)) - F.sin(F.radians(y_bot)))
        )

    # ---- CDO griddes text interchange -----------------------------------
    @staticmethod
    def from_griddes_text(text: str) -> "Grid":
        """Parse a CDO griddes description (the reference's grid
        interchange format, types.py:216-247: gridtype/xsize/xfirst/xinc
        key = value lines, '#' comments). Only lonlat grids are accepted,
        like the reference (resample.py:130-141). Negative yinc
        (lat-descending storage) normalizes to the south-edge origin with
        y_descending=True."""
        kv: dict[str, str] = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            kv[k.strip()] = v.strip().strip('"')
        if kv.get("gridtype") != "lonlat":
            raise ValueError(
                f"only lonlat grids supported, got gridtype={kv.get('gridtype')!r}"
            )
        return Grid.from_centers(
            xfirst=float(kv["xfirst"]),
            xinc=float(kv["xinc"]),
            xsize=int(kv["xsize"]),
            yfirst=float(kv["yfirst"]),
            yinc=float(kv["yinc"]),
            ysize=int(kv["ysize"]),
        )

    def to_griddes_text(self) -> str:
        """Emit the CDO griddes description (center convention; respects
        y_descending by emitting a negative yinc from the north edge)."""
        yfirst = (
            self.y0 + (self.ny - 0.5) * self.dy
            if self.y_descending
            else self.y0 + self.dy / 2.0
        )
        yinc = -self.dy if self.y_descending else self.dy
        lines = [
            "gridtype  = lonlat",
            f"gridsize  = {self.nx * self.ny}",
            f"xsize     = {self.nx}",
            f"ysize     = {self.ny}",
            "xname     = lon",
            "yname     = lat",
            f"xfirst    = {self.x0 + self.dx / 2.0}",
            f"xinc      = {self.dx}",
            f"yfirst    = {yfirst}",
            f"yinc      = {yinc}",
        ]
        return "\n".join(lines)

    def bbox(self):
        """Edge-to-edge extent as a geometry.Bbox."""
        from .geometry import Bbox

        return Bbox(
            self.x0,
            self.y0,
            self.x0 + self.nx * self.dx,
            self.y0 + self.ny * self.dy,
        )

    # ---- compat --------------------------------------------------------
    def approx_equal(self, other: "Grid", rtol: float = 1e-5, atol: float = 1e-7) -> bool:
        """Grid compatibility gate before zonal stats / joins (the
        reference's griddes approx-equality, types.py:263-274, and the
        'Incompatible extent' precondition, tests/test_zonalstats.py:51-54)."""
        if (self.nx, self.ny) != (other.nx, other.ny):
            return False
        a = [self.x0, self.dx, self.y0, self.dy]
        b = [other.x0, other.dx, other.y0, other.dy]
        return all(math.isclose(p, q, rel_tol=rtol, abs_tol=atol) for p, q in zip(a, b))


def infer_grid(df, lon_col: str = "lon", lat_col: str = "lat") -> Grid:
    """Infer a Grid from a long-form raster DataFrame with min/max/count
    aggregates — the Spark restatement of `cdo griddes` inference
    (reference src/geoglue/types.py:216-247) as one shuffle-free agg."""
    row = df.agg(
        F.min(lon_col).alias("xmin"),
        F.max(lon_col).alias("xmax"),
        F.count_distinct(lon_col).alias("nx"),
        F.min(lat_col).alias("ymin"),
        F.max(lat_col).alias("ymax"),
        F.count_distinct(lat_col).alias("ny"),
    ).collect()[0]
    nx, ny = int(row.nx), int(row.ny)
    dx = (row.xmax - row.xmin) / (nx - 1) if nx > 1 else 1.0
    dy = (row.ymax - row.ymin) / (ny - 1) if ny > 1 else 1.0
    return Grid(x0=row.xmin - dx / 2, dx=dx, nx=nx, y0=row.ymin - dy / 2, dy=dy, ny=ny)
