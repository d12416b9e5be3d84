import numpy as np

from geoglue_spark.geometry import Bbox, geom_bbox, rings_to_wkb, wkb_to_rings
from geoglue_spark.synth import admin_fancy_geoms


def test_wkb_roundtrip_polygon():
    ring = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])
    geom = [[ring]]
    back = wkb_to_rings(rings_to_wkb(geom))
    assert len(back) == 1 and len(back[0]) == 1
    np.testing.assert_allclose(back[0][0], ring)


def test_wkb_roundtrip_multipolygon_with_hole():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]])
    other = np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0], [10.0, 10.0]])
    geom = [[outer, hole], [other]]
    back = wkb_to_rings(rings_to_wkb(geom))
    assert len(back) == 2
    assert len(back[0]) == 2
    np.testing.assert_allclose(back[0][1], hole)
    np.testing.assert_allclose(back[1][0], other)


def test_wkb_unclosed_ring_gets_closed():
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    back = wkb_to_rings(rings_to_wkb([[ring]]))
    np.testing.assert_allclose(back[0][0][0], back[0][0][-1])


def test_fancy_geoms_decode():
    for _, _, _, wkb in admin_fancy_geoms():
        geom = wkb_to_rings(wkb)
        assert geom_bbox(geom).maxx > geom_bbox(geom).minx


def test_bbox_algebra():
    a = Bbox(0, 0, 10, 10)
    b = Bbox(5, 5, 15, 15)
    assert (a & b) == Bbox(5, 5, 10, 10)
    assert (a & Bbox(20, 20, 30, 30)) is None
    assert a.contains(Bbox(1, 1, 2, 2))
    assert not a.contains(b)
    assert a.enlarge(1) == Bbox(-1, -1, 11, 11)
    assert Bbox(-0.5, -0.5, 0.5, 0.5).int() == Bbox(-1, -1, 1, 1)
    assert Bbox.from_string("1, 2, 3, 4") == Bbox(1, 2, 3, 4)
    # equator band is bigger than polar band of same degree size
    eq = Bbox(0, 0, 1, 1).geodetic_area_km2()
    pole = Bbox(0, 80, 1, 81).geodetic_area_km2()
    assert eq > pole > 0
    assert abs(a.overlap_fraction(b) - Bbox(5, 5, 10, 10).geodetic_area_km2() / a.geodetic_area_km2()) < 1e-12


def test_wkb_ewkb_srid_skipped_and_zm_rejected():
    """EWKB SRID payloads parse (the 4-byte SRID word is skipped), while
    Z/M payloads — EWKB-flagged or ISO type+1000 — raise instead of
    deinterleaving XYZ triples as (lon, lat) garbage."""
    import struct

    import numpy as np
    import pytest

    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 0.0)]
    body = struct.pack("<I", 1) + struct.pack("<I", len(ring))
    for x, y in ring:
        body += struct.pack("<dd", x, y)
    ewkb_srid = b"\x01" + struct.pack("<I", 3 | 0x20000000) + struct.pack("<i", 4326) + body
    geom = wkb_to_rings(ewkb_srid)
    assert len(geom) == 1 and np.allclose(geom[0][0], np.array(ring))

    with pytest.raises(ValueError, match="Z/M"):
        wkb_to_rings(b"\x01" + struct.pack("<I", 3 | 0x80000000) + body)
    with pytest.raises(ValueError, match="Z/M"):
        wkb_to_rings(b"\x01" + struct.pack("<I", 1003) + body)
