"""Vector geometry: WKB polygons + bbox algebra, pure NumPy/stdlib.

The reference keeps vector admin polygons in a GeoDataFrame
(reference src/geoglue/region.py:111-122) and a ``Bbox`` NamedTuple with
partial order / intersection / geodetic area (types.py:22-180). Here
polygons travel as WKB ``binary`` columns in DataFrames and are decoded to
NumPy ring arrays only inside driver-side cover building or Arrow UDF
kernels — never per-row Python on the hot path.

Geometry model: ``Geom`` = list of polygons; each polygon = list of rings;
each ring = float64 array (N, 2) of (lon, lat), exterior first, holes after
(even-odd containment makes exterior/hole orientation irrelevant).
"""

from __future__ import annotations

import math
import struct
from typing import NamedTuple

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

Ring = np.ndarray  # (N, 2) float64, not necessarily closed
Polygon = list[Ring]  # exterior + holes
Geom = list[Polygon]


# --------------------------------------------------------------------------
# Bbox (reference types.py:22-180)
# --------------------------------------------------------------------------
class Bbox(NamedTuple):
    minx: float
    miny: float
    maxx: float
    maxy: float

    def __and__(self, other: "Bbox") -> "Bbox | None":
        """Intersection: max-of-mins / min-of-maxs, None if empty
        (types.py:99-107)."""
        minx, miny = max(self.minx, other.minx), max(self.miny, other.miny)
        maxx, maxy = min(self.maxx, other.maxx), min(self.maxy, other.maxy)
        if minx >= maxx or miny >= maxy:
            return None
        return Bbox(minx, miny, maxx, maxy)

    def contains(self, other: "Bbox") -> bool:
        return (
            self.minx <= other.minx
            and self.miny <= other.miny
            and self.maxx >= other.maxx
            and self.maxy >= other.maxy
        )

    def enlarge(self, by: float = 1.0) -> "Bbox":
        """Grow symmetrically (types.py:63-65), clamped to the sphere."""
        return Bbox(
            max(-180.0, self.minx - by),
            max(-90.0, self.miny - by),
            min(180.0, self.maxx + by),
            min(90.0, self.maxy + by),
        )

    def int(self) -> "Bbox":
        """Integer floor/ceil hull (types.py:55-61)."""
        return Bbox(
            math.floor(self.minx), math.floor(self.miny),
            math.ceil(self.maxx), math.ceil(self.maxy),
        )

    def geodetic_area_km2(self) -> float:
        """Spherical-excess band area (analog of types.py:77-82)."""
        from .grids import EARTH_RADIUS_KM

        dlam = math.radians(self.maxx - self.minx)
        return (
            EARTH_RADIUS_KM**2
            * dlam
            * (math.sin(math.radians(self.maxy)) - math.sin(math.radians(self.miny)))
        )

    def overlap_fraction(self, other: "Bbox") -> float:
        """Area of intersection / area of self (types.py:84-94)."""
        inter = self & other
        if inter is None:
            return 0.0
        return inter.geodetic_area_km2() / self.geodetic_area_km2()

    @staticmethod
    def from_string(s: str) -> "Bbox":
        parts = [float(p) for p in s.replace(",", " ").split()]
        if len(parts) != 4:
            raise ValueError(f"expected 4 numbers in bbox string, got {s!r}")
        return Bbox(*parts)

    def as_struct_items(self) -> dict[str, float]:
        return {"minx": self.minx, "miny": self.miny, "maxx": self.maxx, "maxy": self.maxy}


# --------------------------------------------------------------------------
# WKB codec (little-endian, 2-D, Polygon + MultiPolygon)
# --------------------------------------------------------------------------
def rings_to_wkb(geom: Geom) -> bytes:
    """Encode to WKB. Single-polygon geoms encode as POLYGON, else
    MULTIPOLYGON."""

    def _poly_body(poly: Polygon) -> bytes:
        out = [struct.pack("<I", len(poly))]
        for ring in poly:
            ring = np.asarray(ring, dtype=np.float64)
            if not np.array_equal(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            out.append(struct.pack("<I", len(ring)))
            out.append(ring.astype("<f8").tobytes())
        return b"".join(out)

    if len(geom) == 1:
        return b"\x01" + struct.pack("<I", _WKB_POLYGON) + _poly_body(geom[0])
    parts = [b"\x01", struct.pack("<II", _WKB_MULTIPOLYGON, len(geom))]
    for poly in geom:
        parts.append(b"\x01" + struct.pack("<I", _WKB_POLYGON) + _poly_body(poly))
    return b"".join(parts)


def wkb_to_rings(buf: bytes) -> Geom:
    """Decode WKB POLYGON / MULTIPOLYGON into ring arrays."""

    def _read_poly(mv: memoryview, off: int, le: bool) -> tuple[Polygon, int]:
        fmt = "<I" if le else ">I"
        (nrings,) = struct.unpack_from(fmt, mv, off)
        off += 4
        rings: Polygon = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from(fmt, mv, off)
            off += 4
            arr = np.frombuffer(mv, dtype="<f8" if le else ">f8", count=npts * 2, offset=off)
            rings.append(arr.reshape(npts, 2).astype(np.float64))
            off += npts * 16
        return rings, off

    mv = memoryview(buf)
    le = mv[0] == 1
    fmt = "<I" if le else ">I"
    (gtype_raw,) = struct.unpack_from(fmt, mv, 1)
    # EWKB flag handling must be EXPLICIT: masking flags off blindly would
    # accept Z/M payloads whose XYZ triples deinterleave as garbage (lon,
    # lat) pairs, and an SRID word would be read as a ring count. 2D-only:
    # Z/M raise; an SRID is skipped.
    if gtype_raw & 0xC0000000:
        raise ValueError(
            "EWKB Z/M geometry not supported (2D polygons only)"
        )
    has_srid = bool(gtype_raw & 0x20000000)
    gtype = gtype_raw & 0x1FFFFFFF
    if gtype >= 1000:  # ISO WKB Z/M/ZM variants (base type + 1000/2000/3000)
        raise ValueError(
            f"ISO WKB Z/M geometry type {gtype} not supported (2D only)"
        )
    hdr = 5 + (4 if has_srid else 0)  # byte order + type (+ SRID word)
    if gtype == _WKB_POLYGON:
        poly, _ = _read_poly(mv, hdr, le)
        return [poly]
    if gtype == _WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from(fmt, mv, hdr)
        off = hdr + 4
        geom: Geom = []
        for _ in range(npolys):
            sub_le = mv[off] == 1
            off += 5  # byte order + type of sub-polygon
            poly, off = _read_poly(mv, off, sub_le)
            geom.append(poly)
        return geom
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def geom_bbox(geom: Geom) -> Bbox:
    pts = np.vstack([r for poly in geom for r in poly])
    return Bbox(
        float(pts[:, 0].min()), float(pts[:, 1].min()),
        float(pts[:, 0].max()), float(pts[:, 1].max()),
    )
