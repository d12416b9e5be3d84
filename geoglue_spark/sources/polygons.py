"""Polygon ingestion — admin boundary files -> the engine's admins table.

The reference's region entry points (``gadm()`` / ``geoboundaries()``,
reference src/geoglue/region.py:225-342) download a shapefile/GeoJSON and
load it as a GeoDataFrame keyed by a primary-key field (GID_n /
shapeID), enforcing pk discipline (config.py:84-92). The Spark
restatement reads files already staged on shared storage (network staging
is out of engine scope per SURVEY §2.1) into the canonical

    admins_df: (admin_id string, name string, geometry binary/WKB)

shape the cover builder consumes:

* ``read_geojson`` — one FeatureCollection document, parsed driver-side:
  polygon dimension tables are metadata-scale (GADM-2 world is ~47k rows,
  a few hundred MB of WKB) so a driver parse + createDataFrame +
  broadcast-downstream is the right plan.
* ``read_geojsonl`` — newline-delimited GeoJSON features, parsed
  DISTRIBUTED (spark.read.text -> Arrow mapInPandas): the scale path when
  the polygon set itself is big (e.g. building footprints).
* ``read_shapefile`` — minimal pure-stdlib ESRI shapefile (.shp + .dbf)
  reader for Polygon/PolygonZ records (public format: ESRI Shapefile
  Technical Description, 1998). No geopandas/GDAL in this container.

All loaders enforce pk uniqueness eagerly and reject non-polygon
geometries, like the reference's read path.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..geometry import Geom, rings_to_wkb

ADMINS_SCHEMA = "admin_id string, name string, geometry binary"


# --------------------------------------------------------------------------
# GeoJSON
# --------------------------------------------------------------------------
def _geojson_geom(geometry: dict) -> Geom:
    gtype = geometry.get("type")
    if gtype == "Polygon":
        polys = [geometry["coordinates"]]
    elif gtype == "MultiPolygon":
        polys = geometry["coordinates"]
    else:
        raise ValueError(f"unsupported geometry type {gtype!r} (polygons only)")
    return [
        [np.asarray(ring, dtype=np.float64)[:, :2] for ring in poly] for poly in polys
    ]


def _feature_row(feat: dict, pk_field: str, name_field: str | None):
    props = feat.get("properties") or {}
    if pk_field not in props:
        raise KeyError(f"feature missing pk field {pk_field!r}")
    name = str(props.get(name_field, "")) if name_field else ""
    return (str(props[pk_field]), name, rings_to_wkb(_geojson_geom(feat["geometry"])))


def _check_pk_unique(rows: list[tuple], pk_field: str) -> None:
    seen: set[str] = set()
    for r in rows:
        if r[0] in seen:
            raise ValueError(
                f"duplicate primary key {r[0]!r} in polygon source "
                f"(pk discipline, reference config.py:84-92, field {pk_field!r})"
            )
        seen.add(r[0])


def read_geojson(
    spark: SparkSession,
    path: str,
    pk_field: str,
    name_field: str | None = None,
) -> DataFrame:
    """FeatureCollection -> admins DataFrame (driver parse; see module doc)."""
    with open(path, "r", encoding="utf-8") as f:
        doc = json.load(f)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    rows = [_feature_row(ft, pk_field, name_field) for ft in feats]
    _check_pk_unique(rows, pk_field)
    return spark.createDataFrame(rows, ADMINS_SCHEMA)


def read_geojsonl(
    spark: SparkSession,
    path: str,
    pk_field: str,
    name_field: str | None = None,
    check_pk: bool = True,
) -> DataFrame:
    """Newline-delimited GeoJSON features, parsed distributed: each text
    partition json-decodes its own lines inside an Arrow batch, so ingest
    scales with executors. ``check_pk`` adds one count-distinct aggregation
    (metadata-scale) as the eager uniqueness gate."""
    import pandas as pd

    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _feature_row(json.loads(s), pk_field, name_field)
                for s in pdf["value"]
                if s.strip()
            ]
            yield pd.DataFrame(rows, columns=["admin_id", "name", "geometry"])

    out = lines.mapInPandas(parse, ADMINS_SCHEMA)
    if check_pk:
        from pyspark.sql import functions as F

        # cache around the eager gate: without it the full distributed
        # JSON parse runs once for this count and AGAIN for the caller's
        # first real action — doubled ingest cost at footprint scale
        out = out.cache()
        row = out.agg(
            F.count("*").alias("n"), F.count_distinct("admin_id").alias("d")
        ).collect()[0]
        if row.n != row.d:
            raise ValueError(
                f"duplicate primary keys in {path}: {row.n} rows, "
                f"{row.d} distinct {pk_field!r}"
            )
    return out


# --------------------------------------------------------------------------
# ESRI shapefile (.shp + .dbf), polygons only, pure stdlib
# --------------------------------------------------------------------------
_SHP_POLYGON_TYPES = {5, 15, 25}  # Polygon, PolygonZ, PolygonM


def _ring_is_cw(ring: np.ndarray) -> bool:
    """Shapefile convention: outer rings clockwise (signed shoelace < 0...
    with y up, CW means negative area)."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0.0


def _shp_record_geom(content: bytes) -> Geom | None:
    (stype,) = struct.unpack_from("<i", content, 0)
    if stype == 0:  # null shape
        return None
    if stype not in _SHP_POLYGON_TYPES:
        raise ValueError(f"unsupported shapefile shape type {stype} (polygons only)")
    nparts, npoints = struct.unpack_from("<ii", content, 36)
    parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
    pts_off = 44 + 4 * nparts
    pts = np.frombuffer(content, dtype="<f8", count=npoints * 2, offset=pts_off)
    pts = pts.reshape(npoints, 2).astype(np.float64)
    bounds = np.append(parts, npoints)
    geom: Geom = []
    for i in range(nparts):
        ring = pts[bounds[i] : bounds[i + 1]]
        if len(ring) < 4:
            continue
        if _ring_is_cw(ring) or not geom:
            geom.append([ring])  # outer ring starts a new polygon
        else:
            geom[-1].append(ring)  # hole joins the current polygon
    return geom or None


def _read_shp(path: str) -> list[Geom | None]:
    with open(path, "rb") as f:
        buf = f.read()
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError(f"{path}: not a shapefile (magic {code})")
    (flen_words,) = struct.unpack_from(">i", buf, 24)
    end = flen_words * 2
    geoms: list[Geom | None] = []
    off = 100
    while off < end:
        (_recno, clen_words) = struct.unpack_from(">ii", buf, off)
        content = buf[off + 8 : off + 8 + clen_words * 2]
        geoms.append(_shp_record_geom(content))
        off += 8 + clen_words * 2
    return geoms


def _read_dbf(path: str) -> list[dict[str, str] | None]:
    with open(path, "rb") as f:
        buf = f.read()
    (nrec,) = struct.unpack_from("<i", buf, 4)
    (hdr_size, rec_size) = struct.unpack_from("<hh", buf, 8)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00")[0].decode("ascii")
        length = buf[off + 16]
        fields.append((name, length))
        off += 32
    out: list[dict[str, str] | None] = []
    for i in range(nrec):
        roff = hdr_size + i * rec_size
        if buf[roff : roff + 1] == b"*":
            # soft-deleted record: keep a placeholder so the .shp/.dbf zip
            # stays aligned (dropping it would desync every later record
            # and fail the count check on a file every GIS tool opens)
            out.append(None)
            continue
        roff += 1  # deletion flag
        rec = {}
        for name, length in fields:
            raw = buf[roff : roff + length].rstrip(b"\x00 ")  # DBF pads with NUL/space
            try:
                # real-world tables (geoBoundaries) are UTF-8; latin-1 is the
                # lossless legacy fallback (every byte decodes)
                rec[name] = raw.decode("utf-8").strip()
            except UnicodeDecodeError:
                rec[name] = raw.decode("latin-1").strip()
            roff += length
        out.append(rec)
    return out


def read_shapefile(
    spark: SparkSession,
    shp_path: str,
    pk_field: str,
    name_field: str | None = None,
    dbf_path: str | None = None,
) -> DataFrame:
    """.shp + .dbf -> admins DataFrame (driver parse — polygon dimension
    tables are metadata-scale; see module doc). ``dbf_path`` defaults to
    the .shp path with a .dbf suffix, like the reference's paired files."""
    dbf_path = dbf_path or (shp_path[:-4] + ".dbf" if shp_path.endswith(".shp") else shp_path + ".dbf")
    geoms = _read_shp(shp_path)
    attrs = _read_dbf(dbf_path)
    if len(geoms) != len(attrs):
        raise ValueError(
            f"shapefile record mismatch: {len(geoms)} shapes, {len(attrs)} dbf rows"
        )
    rows = []
    for geom, rec in zip(geoms, attrs):
        if geom is None or rec is None:  # null shape / deleted dbf record
            continue
        if pk_field not in rec:
            raise KeyError(f"dbf missing pk field {pk_field!r}; has {sorted(rec)}")
        name = rec.get(name_field, "") if name_field else ""
        rows.append((rec[pk_field], name, rings_to_wkb(geom)))
    _check_pk_unique(rows, pk_field)
    return spark.createDataFrame(rows, ADMINS_SCHEMA)
