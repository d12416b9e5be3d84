"""User-facing facade parity: op-string parsing, one-call zonalstats,
config-driven compute with lineage round-trip (the path a geoglue user
switching to this engine would take)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoglue_spark.api import (
    compute_config,
    parse_operations,
    region_from_file,
    resample,
    zonalstats,
)
from geoglue_spark.config import ZonalJobConfig, read_job_configs
from geoglue_spark.grids import Grid


def test_parse_operations():
    assert parse_operations("mean") == (["mean"], False)
    assert parse_operations("mean(coverage_weight=area_spherical_km2)") == (
        ["mean"],
        True,
    )
    assert parse_operations("count, weighted_mean(coverage_weight=none)") == (
        ["count", "weighted_mean"],
        False,
    )
    with pytest.raises(ValueError, match="unknown operation"):
        parse_operations("mode")
    with pytest.raises(ValueError, match="coverage_weight"):
        parse_operations("mean(coverage_weight=pixels)")


def _toy_pixels(spark, value=2.0):
    rows = []
    for iy in range(8):
        for ix in range(8):
            rows.append((0.125 + ix * 0.25, 0.125 + iy * 0.25, float(value)))
    return spark.createDataFrame(rows, "lon double, lat double, value double")


def _toy_admins_file(tmp_path):
    feats = [
        {
            "type": "Feature",
            "properties": {"GID_2": f"R{i}"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[i, 0], [i + 1, 0], [i + 1, 2], [i, 2], [i, 0]]
                ],
            },
        }
        for i in range(2)
    ]
    p = tmp_path / "admins.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": feats}))
    return str(p)


def test_zonalstats_one_call_constant_field(spark, tmp_path):
    """mean of a constant field is that constant under ANY weighting —
    the reference's sanity invariant — and count = coverage-weight sum."""
    admins = region_from_file(spark, _toy_admins_file(tmp_path), "GID_2")
    out = zonalstats(
        _toy_pixels(spark), admins, "count, mean(coverage_weight=area_spherical_km2)",
        supersample=8,
    ).collect()
    assert {r.admin_id for r in out} == {"R0", "R1"}
    for r in out:
        np.testing.assert_allclose(r["mean"], 2.0, rtol=1e-12)
        assert r["count"] > 0


def test_compute_config_end_to_end_with_lineage(spark, tmp_path):
    raster_path = str(tmp_path / "raster.parquet")
    _toy_pixels(spark).write.parquet(raster_path)
    cfg = ZonalJobConfig(
        raster=raster_path,
        admins=_toy_admins_file(tmp_path),
        admins_pk="GID_2",
        output=str(tmp_path / "out.parquet"),
        operation="mean(coverage_weight=area_spherical_km2)",
    )
    out_path = compute_config(spark, cfg)
    got = spark.read.parquet(out_path)
    rows = got.collect()
    assert {r.admin_id for r in rows} == {"R0", "R1"}
    # lineage stamped and parseable back into the SAME config
    lineage = rows[0].geoglue_config
    assert read_job_configs(lineage) == [cfg]


def test_resample_dispatch_aliases(spark):
    src = Grid(x0=0.0, dx=0.25, nx=8, y0=0.0, dy=0.25, ny=8)
    tgt = Grid(x0=0.25, dx=0.125, nx=8, y0=0.25, dy=0.125, ny=8)
    px = _toy_pixels(spark)
    a = resample(px, src, tgt, "remapbil").collect()
    b = resample(px, src, tgt, "bilinear").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        np.testing.assert_allclose(r.value, 2.0, rtol=1e-12)
    with pytest.raises(ValueError, match="unknown resampling"):
        resample(px, src, tgt, "cubic")


def test_global_config_aliases_and_region_check(spark, tmp_path):
    from geoglue_spark.config import GlobalConfig, RegionSource, ValidationSpec

    admins_path = _toy_admins_file(tmp_path)
    toml_text = f"""
[operation]
popmean = "weighted_mean(coverage_weight=area_spherical_km2)"

[region.TOY2]
file = "{admins_path}"
pk = "GID_2"

[paths]
tmp = "~/scratch"
"""
    cfg = GlobalConfig.from_toml(toml_text)
    assert cfg.resolve_operation("popmean").startswith("weighted_mean(")
    assert cfg.resolve_operation("mean") == "mean"  # passthrough
    assert cfg.region["TOY2"].pk == "GID_2"
    assert "~" not in cfg.paths["tmp"]
    cfg.check(spark)  # loads every region + pk discipline

    assert RegionSource.from_str(f"{admins_path}::GID_2") == cfg.region["TOY2"]
    with pytest.raises(ValueError, match="::"):
        RegionSource.from_str("just-a-path")
    with pytest.raises(KeyError, match="'file' and 'pk'"):
        GlobalConfig.from_toml('[region.X]\nfile = "a.shp"\n')


def test_validation_spec(spark):
    from geoglue_spark.config import ValidationSpec

    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "value double")
    ValidationSpec(min=0.0, max=5.0, max_na_frac=0.5).apply(df)
    with pytest.raises(AssertionError, match="outside"):
        ValidationSpec(min=1.5, max=5.0, max_na_frac=0.5).apply(df)
    with pytest.raises(AssertionError, match="NA fraction"):
        ValidationSpec(min=0.0, max=5.0, max_na_frac=0.1).apply(df)
    with pytest.raises(ValueError, match="min"):
        ValidationSpec(min=7.0, max=5.0).validate()
    with pytest.raises(ValueError, match="max_na_frac"):
        ValidationSpec(max_na_frac=1.5).validate()


def test_parse_operations_quantile_param():
    assert parse_operations("median, quantile(q=0.9)") == (
        ["median", "quantile(0.9)"],
        False,
    )
    with pytest.raises(ValueError, match="q= parameter"):
        parse_operations("quantile")


def test_parse_operations_two_params():
    """Commas inside parens are parameter separators, not op separators
    (review finding: spherically-weighted quantiles were unparseable)."""
    assert parse_operations("quantile(q=0.9, coverage_weight=area_spherical_km2)") == (
        ["quantile(0.9)"],
        True,
    )
    # mixed explicit settings now raise (ADVICE r2) — agreeing ones parse
    assert parse_operations(
        "mean(coverage_weight=none), quantile(q=0.5, coverage_weight=none)"
    ) == (["mean", "quantile(0.5)"], False)

def test_parse_operations_mixed_coverage_weight_raises():
    """exactextract applies coverage_weight per op; one shared weight
    column means MIXED explicit settings must raise, not last-op-win
    (ADVICE r2)."""
    with pytest.raises(ValueError, match="mixed coverage_weight"):
        parse_operations(
            "mean(coverage_weight=area_spherical_km2), sum(coverage_weight=none)"
        )
    # agreeing explicit settings + bare ops are fine
    ops, sph = parse_operations(
        "mean(coverage_weight=area_spherical_km2), count, "
        "sum(coverage_weight=area_spherical_km2)"
    )
    assert ops == ["mean", "count", "sum"] and sph is True


def test_compute_config_resamples_raster_onto_weights_grid(spark, tmp_path):
    """Reference direction (zonalstats.py:126-130): with a FINER weights
    raster, the RASTER is resampled onto the WEIGHTS grid, so the output is
    computed at the fine resolution. NumPy oracle: value=lon is linear ->
    bilinear is exact, box edges align with fine-cell edges -> coverage 1;
    the old (weights->raster) direction gives 1.0390625 here, the correct
    fine-grid value is 1.041015625."""
    import json as _json

    # coarse raster 0.25deg over [0,2]^2, value = lon (linear)
    rows = [
        (0.125 + ix * 0.25, 0.125 + iy * 0.25, 0.125 + ix * 0.25)
        for iy in range(8) for ix in range(8)
    ]
    raster_path = str(tmp_path / "raster.parquet")
    spark.createDataFrame(rows, "lon double, lat double, value double").write.parquet(raster_path)
    # fine weights 0.125deg, weight = 1 + lon
    wrows = [
        (0.0625 + ix * 0.125, 0.0625 + iy * 0.125, 1.0 + 0.0625 + ix * 0.125)
        for iy in range(16) for ix in range(16)
    ]
    weights_path = str(tmp_path / "weights.parquet")
    spark.createDataFrame(wrows, "lon double, lat double, weight double").write.parquet(weights_path)
    feat = {
        "type": "Feature", "properties": {"GID_2": "BOX"},
        "geometry": {"type": "Polygon", "coordinates": [
            [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]]
        ]},
    }
    admins_path = tmp_path / "admins.geojson"
    admins_path.write_text(_json.dumps({"type": "FeatureCollection", "features": [feat]}))
    cfg = ZonalJobConfig(
        raster=raster_path, admins=str(admins_path), admins_pk="GID_2",
        output=str(tmp_path / "out.parquet"),
        operation="weighted_mean(coverage_weight=none)",
        weights=weights_path, resample="bilinear",
    )
    out = spark.read.parquet(compute_config(spark, cfg)).collect()
    assert len(out) == 1
    lons = np.array([0.5625 + 0.125 * k for k in range(8)])
    w = 1.0 + lons
    expected = float((w * lons).sum() / w.sum())  # = 1.041015625
    np.testing.assert_allclose(out[0]["weighted_mean"], expected, rtol=1e-9)


def test_parse_operations_small_q_fixed_point():
    """q values whose float repr is scientific (1e-05) must still resolve
    to the regex-matchable fixed-point internal form."""
    from geoglue_spark.api import parse_operations

    names, _ = parse_operations(
        "quantile(q=0.00001), approx_quantile(q=0.00001), quantile(q=1.0), quantile(q=0)"
    )
    assert names == [
        "quantile(0.00001)", "approx_quantile(0.00001)", "quantile(1)", "quantile(0)",
    ]
