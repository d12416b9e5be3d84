"""Polygon file ingestion (S1/S2): GeoJSON / NDJSON / shapefile loaders
feeding the cover builder end-to-end (reference region.py:225-342 read
path, tests/test_region.py:102-141)."""

import json
import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoglue_spark.cover import build_cover
from geoglue_spark.grids import Grid
from geoglue_spark.operators.assign import assign_admin
from geoglue_spark.sources.polygons import read_geojson, read_geojsonl, read_shapefile

# two unit squares side by side plus one square with a hole
FEATURES = [
    {
        "type": "Feature",
        "properties": {"GID_2": "A.1", "NAME_2": "West"},
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        },
    },
    {
        "type": "Feature",
        "properties": {"GID_2": "A.2", "NAME_2": "East"},
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [[[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]]],
        },
    },
    {
        "type": "Feature",
        "properties": {"GID_2": "A.3", "NAME_2": "Donut"},
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[3, 0], [6, 0], [6, 3], [3, 3], [3, 0]],
                [[4, 1], [5, 1], [5, 2], [4, 2], [4, 1]],
            ],
        },
    },
]


@pytest.fixture(scope="module")
def geojson_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("polys") / "admins.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": FEATURES}))
    return str(p)


@pytest.fixture(scope="module")
def geojsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("polys") / "admins.jsonl"
    p.write_text("\n".join(json.dumps(f) for f in FEATURES))
    return str(p)


def _write_shp_dbf(path_base, records):
    """Minimal polygon shapefile writer (test fixture only; the library
    ships the READER). records: list of (pk, name, list_of_rings_cw_first)."""
    shp_records = []
    for recno, (_, _, rings) in enumerate(records, start=1):
        parts, pts = [], []
        for ring in rings:
            parts.append(len(pts))
            pts.extend(ring)
        arr = np.asarray(pts, dtype="<f8")
        content = (
            struct.pack("<i", 5)
            + struct.pack("<4d", arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max())
            + struct.pack("<ii", len(parts), len(pts))
            + np.asarray(parts, dtype="<i4").tobytes()
            + arr.tobytes()
        )
        shp_records.append(struct.pack(">ii", recno, len(content) // 2) + content)
    body = b"".join(shp_records)
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, 5) + b"\x00" * 64
    (path_base + ".shp") and open(path_base + ".shp", "wb").write(header + body)

    fields = [("GID_2", 16), ("NAME_2", 16)]
    fdesc = b"".join(
        name.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([ln]) + b"\x00" * 15
        for name, ln in fields
    )
    rec_size = 1 + sum(ln for _, ln in fields)
    hdr_size = 32 + len(fdesc) + 1
    dbf_hdr = bytes([3, 24, 1, 1]) + struct.pack("<i", len(records))
    dbf_hdr += struct.pack("<hh", hdr_size, rec_size) + b"\x00" * 20
    recs = b"".join(
        b" " + pk.encode().ljust(16) + name.encode().ljust(16) for pk, name, _ in records
    )
    open(path_base + ".dbf", "wb").write(dbf_hdr + fdesc + b"\x0d" + recs + b"\x1a")


@pytest.fixture(scope="module")
def shapefile_path(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("polys") / "admins")
    cw = lambda ring: ring[::-1]  # FEATURES rings are CCW; shapefile outers are CW
    _write_shp_dbf(
        base,
        [
            ("A.1", "West", [cw(FEATURES[0]["geometry"]["coordinates"][0])]),
            ("A.2", "East", [cw(FEATURES[1]["geometry"]["coordinates"][0][0])]),
            (
                "A.3",
                "Donut",
                [
                    cw(FEATURES[2]["geometry"]["coordinates"][0]),
                    FEATURES[2]["geometry"]["coordinates"][1],  # hole stays CCW
                ],
            ),
        ],
    )
    return base + ".shp"


def _assert_admins_shape(df):
    rows = {r.admin_id: r for r in df.collect()}
    assert set(rows) == {"A.1", "A.2", "A.3"}
    assert rows["A.1"].name == "West"
    from geoglue_spark.geometry import wkb_to_rings

    donut = wkb_to_rings(bytes(rows["A.3"].geometry))
    assert len(donut) == 1 and len(donut[0]) == 2  # one polygon, outer + hole


def test_read_geojson(spark, geojson_path):
    _assert_admins_shape(read_geojson(spark, geojson_path, "GID_2", "NAME_2"))


def test_read_geojsonl_distributed(spark, geojsonl_path):
    df = read_geojsonl(spark, geojsonl_path, "GID_2", "NAME_2")
    _assert_admins_shape(df)


def test_read_shapefile(spark, shapefile_path):
    _assert_admins_shape(read_shapefile(spark, shapefile_path, "GID_2", "NAME_2"))


def test_pk_discipline_raises(spark, tmp_path):
    dupes = {"type": "FeatureCollection", "features": [FEATURES[0], FEATURES[0]]}
    p = tmp_path / "dupes.geojson"
    p.write_text(json.dumps(dupes))
    with pytest.raises(ValueError, match="duplicate primary key"):
        read_geojson(spark, str(p), "GID_2")


def test_file_loaded_polygons_end_to_end_assignment(spark, geojson_path):
    """File -> admins -> cover -> assignment: points land in the right
    polygon, hole points are excluded (the reference's region->zonalstats
    integration, tests/test_region.py:102-141)."""
    admins = read_geojson(spark, geojson_path, "GID_2", "NAME_2").withColumnRenamed(
        "admin_id", "admin_id"
    )
    grid = Grid(x0=0.0, dx=0.1, nx=60, y0=0.0, dy=0.1, ny=30)
    cover = build_cover(admins, grid, supersample=8)
    wkb = {r.admin_id: bytes(r.geometry) for r in admins.collect()}
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [1, 2, 3, 4, 5],
                "lon": [0.5, 1.5, 3.5, 4.5, 10.0],  # A.1, A.2, A.3, hole, outside
                "lat": [0.5, 0.5, 0.5, 1.5, 5.0],
            }
        )
    )
    got = {r.pid: r.admin_id for r in assign_admin(pts, cover, wkb, grid).collect()}
    assert got == {1: "A.1", 2: "A.2", 3: "A.3"}  # 4 in the hole, 5 outside


def test_shapefile_rejects_bad_magic_and_point_shapes(spark, tmp_path):
    import struct as _struct

    bad = tmp_path / "bad.shp"
    bad.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="not a shapefile"):
        read_shapefile(spark, str(bad), "GID_2")

    # a Point (type 1) record must be rejected, not silently mangled
    content = _struct.pack("<i", 1) + _struct.pack("<2d", 1.0, 2.0)
    body = _struct.pack(">ii", 1, len(content) // 2) + content
    header = _struct.pack(">i", 9994) + b"\x00" * 20 + _struct.pack(
        ">i", (100 + len(body)) // 2
    ) + _struct.pack("<ii", 1000, 1) + b"\x00" * 64
    pt = tmp_path / "pt.shp"
    pt.write_bytes(header + body)
    with pytest.raises(ValueError, match="polygons only"):
        read_shapefile(spark, str(pt), "GID_2", dbf_path=str(pt))


def test_geojson_rejects_non_polygon(spark, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"GID_2": "X"},
                "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1]]},
            }
        ],
    }
    p = tmp_path / "line.geojson"
    p.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="polygons only"):
        read_geojson(spark, str(p), "GID_2")


def test_read_shapefile_skips_deleted_dbf_record(spark, tmp_path_factory):
    """A soft-deleted .dbf record (flag '*') must not desync the
    geometry/attribute zip — its pair is skipped, the rest survive."""
    import struct as _st

    base = str(tmp_path_factory.mktemp("deleted") / "admins")
    cw = lambda ring: ring[::-1]
    _write_shp_dbf(
        base,
        [
            ("A.1", "West", [cw(FEATURES[0]["geometry"]["coordinates"][0])]),
            ("A.2", "East", [cw(FEATURES[1]["geometry"]["coordinates"][0][0])]),
        ],
    )
    dbf = bytearray(open(base + ".dbf", "rb").read())
    hdr_size, rec_size = _st.unpack_from("<hh", dbf, 8)
    dbf[hdr_size + rec_size] = 0x2A  # mark record 2 ('A.2') deleted
    open(base + ".dbf", "wb").write(bytes(dbf))
    rows = {r.admin_id for r in read_shapefile(spark, base + ".shp", "GID_2").collect()}
    assert rows == {"A.1"}
