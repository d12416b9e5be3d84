"""Coverage-weighted raster zonal statistics (J1/J2/A1/A2) vs a pure-NumPy
oracle computed independently per admin — the engine's analog of the
reference's exactextract golden-value tests (tests/test_zonalstats.py:57-73),
with goldens regenerated on our own deterministic fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoglue_spark.cover import build_cover, build_cover_local
from geoglue_spark.geometry import wkb_to_rings
from geoglue_spark.grids import Grid
from geoglue_spark.operators.zonal import raster_zonal_stats, zonal_stats
from geoglue_spark.synth import admins_df

# coarse raster NOT aligned with admin edges -> real fractional coverage
GRID = Grid(x0=99.9, dx=0.4, nx=26, y0=9.9, dy=0.4, ny=26)
SUPER = 16


def _value(lon, lat):
    return 2.0 * lon + 0.5 * lat


def _pixels_df(spark):
    ix, iy = np.meshgrid(np.arange(GRID.nx), np.arange(GRID.ny))
    lon, lat = GRID.centers(ix.ravel(), iy.ravel())
    rows = [(float(a), float(b), float(_value(a, b))) for a, b in zip(lon, lat)]
    return spark.createDataFrame(rows, "lon double, lat double, value double")


@pytest.fixture(scope="module")
def setup(spark):
    admins = admins_df(spark).limit(12)
    cover = build_cover(admins, GRID, supersample=SUPER).cache()
    cover.count()
    return admins, cover, _pixels_df(spark)


def _numpy_oracle(admins_rows, op):
    """Independent per-admin computation from local cover + dense values,
    using exactextract's definitions (count = coverage-weight sum over
    defined values, NOT the row count; area_weighted_sum = weighted_sum /
    count with the weights raster folded into the numerator only)."""
    out = {}
    for r in admins_rows:
        pdf = build_cover_local(r.admin_id, wkb_to_rings(r.geometry), GRID, SUPER)
        iy = pdf.cell_id.to_numpy() // GRID.nx
        ix = pdf.cell_id.to_numpy() % GRID.nx
        lon, lat = GRID.centers(ix, iy)
        v = _value(lon, lat)
        w = pdf.coverage.to_numpy() * GRID.cell_area_km2_np(iy)
        if op == "weighted_mean":
            out[r.admin_id] = (v * w).sum() / w.sum()
        elif op == "weighted_sum":
            out[r.admin_id] = (v * w).sum()
        elif op == "count":
            out[r.admin_id] = w.sum()
        elif op == "area_weighted_sum":
            p = (np.abs(lon - 104.5) < 1.0).astype(float) * 100.0 + 1.0
            out[r.admin_id] = (v * w * p).sum() / w.sum()
    return out


def test_weighted_mean_matches_numpy_oracle(spark, setup):
    admins, cover, pixels = setup
    got = {
        r.admin_id: r.weighted_mean
        for r in raster_zonal_stats(pixels, cover, GRID, ops=["weighted_mean"]).collect()
    }
    want = _numpy_oracle(admins.collect(), "weighted_mean")
    assert set(got) == set(want)
    for aid in want:
        np.testing.assert_allclose(got[aid], want[aid], rtol=1e-12)


def _pop_weights_df(spark):
    ix, iy = np.meshgrid(np.arange(GRID.nx), np.arange(GRID.ny))
    lon, lat = GRID.centers(ix.ravel(), iy.ravel())
    pop = (np.abs(lon - 104.5) < 1.0).astype(float) * 100.0 + 1.0  # urban strip
    return spark.createDataFrame(
        [(float(a), float(b), float(p)) for a, b, p in zip(lon, lat, pop)],
        "lon double, lat double, weight double",
    )


def test_weighted_and_area_weighted_sum(spark, setup):
    admins, cover, pixels = setup
    res = raster_zonal_stats(
        pixels, cover, GRID, ops=["count", "weighted_sum"]
    ).collect()
    want_ws = _numpy_oracle(admins.collect(), "weighted_sum")
    want_n = _numpy_oracle(admins.collect(), "count")
    for r in res:
        np.testing.assert_allclose(r.weighted_sum, want_ws[r.admin_id], rtol=1e-12)
        np.testing.assert_allclose(r["count"], want_n[r.admin_id], rtol=1e-12)
        assert r.weighted_sum >= 0  # non-negativity (reference test style)


def test_area_weighted_sum_composite(spark, setup):
    """area_weighted_sum = weighted_sum / count (reference
    zonalstats.py:43-63): weights raster in the numerator only, coverage-
    weight sum (NOT row count) in the denominator."""
    admins, cover, pixels = setup
    res = raster_zonal_stats(
        pixels, cover, GRID, ops=["area_weighted_sum"], weights=_pop_weights_df(spark)
    ).collect()
    want = _numpy_oracle(admins.collect(), "area_weighted_sum")
    for r in res:
        np.testing.assert_allclose(r.area_weighted_sum, want[r.admin_id], rtol=1e-12)


def test_area_weighted_sum_requires_weights(spark, setup):
    """Reference gate zonalstats.py:89-90."""
    admins, cover, pixels = setup
    with pytest.raises(ValueError, match="requires weights"):
        raster_zonal_stats(pixels, cover, GRID, ops=["area_weighted_sum"])


def test_nan_pixels_excluded(spark, setup):
    admins, cover, pixels = setup
    holey = pixels.withColumn(
        "value", F.when(F.col("lon") < 101.0, None).otherwise(F.col("value"))
    )
    full = raster_zonal_stats(pixels, cover, GRID, ops=["count"]).toPandas()
    part = raster_zonal_stats(holey, cover, GRID, ops=["count"]).toPandas()
    m = full.merge(part, on="admin_id", suffixes=("_f", "_p"))
    west = m[m.admin_id.isin(["ADM2-00"])]  # the westernmost admin loses pixels
    assert (west.count_p < west.count_f).all()


def test_population_weighted_mean(spark, setup):
    """J2: 3-way join with a weights raster on the same grid."""
    admins, cover, pixels = setup
    ix, iy = np.meshgrid(np.arange(GRID.nx), np.arange(GRID.ny))
    lon, lat = GRID.centers(ix.ravel(), iy.ravel())
    pop = (np.abs(lon - 104.5) < 1.0).astype(float) * 100.0 + 1.0  # urban strip
    wdf = spark.createDataFrame(
        [(float(a), float(b), float(p)) for a, b, p in zip(lon, lat, pop)],
        "lon double, lat double, weight double",
    )
    res = raster_zonal_stats(
        pixels, cover, GRID, ops=["weighted_mean"], weights=wdf
    ).collect()
    # oracle with population weight folded in
    want = {}
    for r in admins.collect():
        pdf = build_cover_local(r.admin_id, wkb_to_rings(r.geometry), GRID, SUPER)
        ciy = pdf.cell_id.to_numpy() // GRID.nx
        cix = pdf.cell_id.to_numpy() % GRID.nx
        clon, clat = GRID.centers(cix, ciy)
        v = _value(clon, clat)
        p = (np.abs(clon - 104.5) < 1.0).astype(float) * 100.0 + 1.0
        w = pdf.coverage.to_numpy() * GRID.cell_area_km2_np(ciy) * p
        want[r.admin_id] = (v * w).sum() / w.sum()
    for r in res:
        np.testing.assert_allclose(r.weighted_mean, want[r.admin_id], rtol=1e-12)


def test_incompatible_extent_raises(spark, setup):
    admins, cover, pixels = setup
    other = Grid(x0=0.0, dx=1.0, nx=10, y0=0.0, dy=1.0, ny=10)
    ix, iy = np.meshgrid(np.arange(other.nx), np.arange(other.ny))
    lon, lat = other.centers(ix.ravel(), iy.ravel())
    wdf = spark.createDataFrame(
        [(float(a), float(b), 1.0) for a, b in zip(lon, lat)],
        "lon double, lat double, weight double",
    )
    with pytest.raises(ValueError, match="[Ii]ncompatible extent"):
        raster_zonal_stats(pixels, cover, GRID, ops=["weighted_mean"], weights=wdf)


def test_salted_agg_matches_plain(spark, setup):
    """Two-level salted aggregation must equal the direct aggregation
    (both on the point-table path, where count = row count)."""
    pixels = setup[2]
    assigned = (
        pixels.withColumn("cell_id", GRID.cell_id_col(F.col("lon"), F.col("lat")))
        .join(F.broadcast(setup[1].select("cell_id", "admin_id")), "cell_id")
    )
    plain = {
        r.admin_id: r
        for r in zonal_stats(assigned, "value", ["count", "sum", "mean"]).collect()
    }
    salted = {
        r.admin_id: r
        for r in zonal_stats(assigned, "value", ["count", "sum", "mean"], salt=8).collect()
    }
    for aid, r in plain.items():
        assert salted[aid]["count"] == r["count"]
        np.testing.assert_allclose(salted[aid]["sum"], r["sum"], rtol=1e-9)
        np.testing.assert_allclose(salted[aid]["mean"], r["mean"], rtol=1e-9)


def test_weighted_mean_null_guard_point_path(spark):
    """Rows with NULL value must drop out of BOTH the numerator and the
    denominator of weighted_mean (ADVICE: null weights previously counted
    in the denominator, biasing the mean low)."""
    df = spark.createDataFrame(
        [("a", 10.0, 2.0), ("a", None, 100.0), ("a", 20.0, 2.0)],
        "admin_id string, value double, w double",
    )
    got = zonal_stats(df, "value", ["weighted_mean"], weight_col="w").collect()[0]
    np.testing.assert_allclose(got.weighted_mean, (10.0 * 2 + 20.0 * 2) / 4.0)
    salted = zonal_stats(df, "value", ["weighted_mean"], weight_col="w", salt=4).collect()[0]
    np.testing.assert_allclose(salted.weighted_mean, (10.0 * 2 + 20.0 * 2) / 4.0)


def test_raster_zonal_with_compacted_cover_identical(spark, setup):
    """The two-level (cells + interior blocks) zonal join must equal the
    flat-cover results exactly."""
    from geoglue_spark.cover import compact_cover

    admins, cover, pixels = setup
    cells, blocks = compact_cover(cover, GRID, block_shift=2)
    flat = {
        (r.admin_id,): (r["count"], r.weighted_mean)
        for r in raster_zonal_stats(
            pixels, cover, GRID, ops=["count", "weighted_mean"]
        ).collect()
    }
    blocked = {
        (r.admin_id,): (r["count"], r.weighted_mean)
        for r in raster_zonal_stats(
            pixels, cells, GRID, ops=["count", "weighted_mean"],
            blocks=blocks, block_shift=2,
        ).collect()
    }
    assert set(flat) == set(blocked)
    for k in flat:
        np.testing.assert_allclose(blocked[k][0], flat[k][0], rtol=1e-12)
        np.testing.assert_allclose(blocked[k][1], flat[k][1], rtol=1e-12)


def test_median_quantile_and_salt_guard(spark):
    from geoglue_spark.operators.zonal import zonal_stats

    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 4, 8]] + [("b", 5.0)],
        "admin_id string, value double",
    )
    got = {r.admin_id: r for r in zonal_stats(df, "value", ["median", "quantile(0.25)"]).collect()}
    np.testing.assert_allclose(got["a"]["median"], 3.0)
    np.testing.assert_allclose(got["a"]["quantile(0.25)"], 1.75)
    np.testing.assert_allclose(got["b"]["median"], 5.0)
    with pytest.raises(ValueError, match="holistic"):
        zonal_stats(df, "value", ["median"], salt=4)


def test_approx_quantile_rank_bound_and_partial_agg(spark):
    """approx_median/approx_quantile: (1) GK rank-error bound vs the NumPy
    exact order statistic, (2) pinned rank-ceil(q*n) exactness for groups
    below accuracy/2, (3) map-side partial aggregation in the plan (the
    property that makes it the 100-TB quantile path), (4) salt refusal."""
    import numpy as np

    from geoglue_spark.operators.zonal import zonal_stats

    rng = np.random.default_rng(11)
    rows = []
    sizes = {"a": 7, "b": 400, "c": 2503}
    vals = {g: rng.uniform(-50.0, 50.0, n) for g, n in sizes.items()}
    for g, v in vals.items():
        rows += [(g, float(x)) for x in v]
    df = spark.createDataFrame(rows, "admin_id string, value double").repartition(8)

    out = zonal_stats(
        df, "value", ["approx_median", "approx_quantile(0.9)"], approx_accuracy=10000
    )
    got = {r.admin_id: r for r in out.collect()}
    for g, v in vals.items():
        s = np.sort(v)
        n = len(s)
        for q, col in ((0.5, "approx_median"), (0.9, "approx_quantile(0.9)")):
            # n < accuracy/2 -> error under half a rank -> exact order stat
            expect = s[max(1, int(np.ceil(q * n))) - 1]
            assert got[g][col] == expect, (g, q, got[g][col], expect)

    # map-side partial: the plan must contain a partial ObjectHashAggregate
    # with percentile_approx partials (no whole-group shuffle of raw rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan
    assert plan.count("percentile_approx") >= 2

    import pytest

    with pytest.raises(ValueError, match="don't need the salted path"):
        zonal_stats(df, "value", ["approx_median"], salt=4)


def test_parse_operations_approx_quantile():
    from geoglue_spark.api import parse_operations

    names, sph = parse_operations("approx_median, approx_quantile(q=0.9)")
    assert names == ["approx_median", "approx_quantile(0.9)"]
    import pytest

    with pytest.raises(ValueError, match="requires a q="):
        parse_operations("approx_quantile")


def test_approx_quantile_rank_rule_adversarial(spark):
    """The zonal_value_quantiles_approx oracle depends on the GK sketch
    returning the exact rank-ceil(q*n) order statistic below accuracy/2.
    Pin that rule on the nasty shapes: heavy duplicates, all-equal groups,
    singletons, pairs, and q in {0, 1} — across a skewed partitioning."""
    import numpy as np

    from geoglue_spark.operators.zonal import zonal_stats

    groups = {
        "dup": [1.0] * 500 + [2.0] * 499 + [3.0],
        "const": [7.5] * 321,
        "one": [42.0],
        "two": [-1.0, 1.0],
        "neg": list(np.linspace(-5, -1, 97)),
    }
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "admin_id string, value double").repartition(7)
    ops = ["approx_quantile(0.0)", "approx_quantile(0.25)",
           "approx_median", "approx_quantile(0.75)", "approx_quantile(1.0)"]
    got = {r.admin_id: r for r in zonal_stats(df, "value", ops, approx_accuracy=10000).collect()}
    for g, vs in groups.items():
        s = np.sort(vs)
        n = len(s)
        for q, col in ((0.0, "approx_quantile(0.0)"), (0.25, "approx_quantile(0.25)"),
                       (0.5, "approx_median"), (0.75, "approx_quantile(0.75)"),
                       (1.0, "approx_quantile(1.0)")):
            expect = s[max(1, int(np.ceil(q * n))) - 1]
            assert got[g][col] == expect, (g, q, got[g][col], expect)


def test_weights_raster_duplicate_cells_raise(spark, setup):
    """A weights frame with more than one row per cell (e.g. a forgotten
    time axis) must raise, not silently fan out and inflate aggregates."""
    import pytest

    admins, cover, pixels = setup
    w1 = _pop_weights_df(spark)
    res_unique = {
        r.admin_id: r.weighted_mean
        for r in raster_zonal_stats(
            pixels, cover, GRID, ops=["weighted_mean"], weights=w1
        ).collect()
    }
    assert res_unique  # single raster path still works

    dup = w1.union(w1.limit(5))
    with pytest.raises(Exception, match="single 2-D raster|raise_error|rows"):
        raster_zonal_stats(
            pixels, cover, GRID, ops=["weighted_mean"], weights=dup
        ).collect()
