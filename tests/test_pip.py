import numpy as np

from geoglue_spark.geometry import wkb_to_rings
from geoglue_spark.pip import PreparedGeom, coverage_fractions, points_in_geom
from geoglue_spark.synth import admin_fancy_geoms

FANCY = {aid: wkb_to_rings(wkb) for aid, _, _, wkb in admin_fancy_geoms()}


def test_square():
    sq = [[np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])]]
    lon = np.array([1.0, 3.0, -1.0, 1.999, 0.001])
    lat = np.array([1.0, 1.0, 1.0, 1.999, 0.001])
    np.testing.assert_array_equal(
        points_in_geom(lon, lat, sq), [True, False, False, True, True]
    )


def test_concave_l_shape():
    g = FANCY["FANCY-L"]
    # inside the notch (removed part) vs inside the L arms
    assert not points_in_geom([2.0], [2.0], g)[0]
    assert points_in_geom([0.5], [2.5], g)[0]
    assert points_in_geom([2.5], [0.5], g)[0]


def test_donut_hole():
    g = FANCY["FANCY-DONUT"]
    assert not points_in_geom([7.0], [2.0], g)[0]  # in the hole
    assert points_in_geom([5.5], [2.0], g)[0]  # in the ring
    assert not points_in_geom([4.0], [2.0], g)[0]  # outside


def test_multipolygon():
    g = FANCY["FANCY-MULTI"]
    assert points_in_geom([1.0], [6.0], g)[0]
    assert points_in_geom([5.0], [6.0], g)[0]
    assert not points_in_geom([3.0], [6.0], g)[0]  # between the islands


def test_many_points_vectorized_matches_scalar():
    g = FANCY["FANCY-L"]
    rng_lon = np.linspace(-0.5, 3.5, 101)
    rng_lat = np.linspace(-0.5, 3.5, 101)
    mx, my = np.meshgrid(rng_lon, rng_lat)
    batch = points_in_geom(mx.ravel(), my.ravel(), g)
    ones = np.array([points_in_geom([x], [y], g)[0] for x, y in zip(mx.ravel(), my.ravel())])
    np.testing.assert_array_equal(batch, ones)


def test_prepared_geom_reuse():
    g = PreparedGeom(FANCY["FANCY-DONUT"])
    a = points_in_geom(np.array([5.5, 7.0]), np.array([2.0, 2.0]), g)
    np.testing.assert_array_equal(a, [True, False])


def test_coverage_fraction_halves():
    # square [0,2]x[0,2]; cell [1,3]x[0,2] -> half covered
    sq = [[np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])]]
    cov = coverage_fractions(
        np.array([1.0]), np.array([0.0]), np.array([3.0]), np.array([2.0]), sq, 16
    )
    assert abs(cov[0] - 0.5) < 0.05
    full = coverage_fractions(
        np.array([0.5]), np.array([0.5]), np.array([1.5]), np.array([1.5]), sq, 8
    )
    assert full[0] == 1.0
    none = coverage_fractions(
        np.array([5.0]), np.array([5.0]), np.array([6.0]), np.array([6.0]), sq, 8
    )
    assert none[0] == 0.0


def test_coverage_triangle():
    tri = [[np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])]]
    cov = coverage_fractions(
        np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0]), tri, 32
    )
    assert abs(cov[0] - 0.5) < 0.02
