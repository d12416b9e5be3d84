"""Zonal / admin-level aggregation — A1/A2 + the raster path of J1/J2.

Reproduces the reference's exactextract op set (op strings parsed at
src/geoglue/zonalstats.py:43-63, defaults at src/geoglue/cli.py:268-277):
``count sum mean min max weighted_mean weighted_sum area_weighted_sum``,
with coverage-fraction x spherical-cell-area x optional weights-raster
weighting, as a single groupBy with map-side partial aggregation.

Skew note (north rule): hash aggregation partial-combines per task, so a
mega-admin (urban unit holding 80 % of rows) reduces to one partial row per
task before the shuffle — no salting needed for algebraic aggregates. A
``salt`` parameter is still offered for holistic aggregates (collect_list /
exact percentile) where partials don't collapse.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..grids import Grid

ZONAL_OPS = (
    "count",
    "sum",
    "mean",
    "min",
    "max",
    "weighted_mean",
    "weighted_sum",
    "area_weighted_sum",
    "median",
    "quantile",  # parameterized: "quantile(0.9)"
    "approx_median",
    "approx_quantile",  # parameterized: "approx_quantile(0.9)"
)

_QUANTILE_RE = re.compile(r"^quantile\((0(\.\d+)?|1(\.0+)?)\)$")
_APPROX_QUANTILE_RE = re.compile(
    r"^approx_quantile\((0(\.\d+)?|1(\.0+)?)\)$"
)

#: Greenwald-Khanna accuracy for approx_median / approx_quantile(q):
#: rank error <= n / accuracy per group. While the error stays below half
#: a rank (n < accuracy/2) the returned element is EXACTLY the
#: rank-ceil(q*n) order statistic (1-indexed, min 1) — measured stable
#: across partitionings, which is what lets the DuckDB oracle pin it.
DEFAULT_APPROX_ACCURACY = 100_000


def _agg_exprs(
    value: Column,
    weight: Column,
    ops: list[str],
    cov_weight: Column | None = None,
    approx_accuracy: int = DEFAULT_APPROX_ACCURACY,
) -> list[Column]:
    """Aggregate expressions for the zonal op strings.

    Two semantic modes:

    * ``cov_weight is None`` — point-table mode: ``count``/``sum``/``mean``
      are plain row aggregates; ``weighted_*`` use ``weight`` with a
      null-value guard on the denominator (rows whose value is NULL
      contribute to neither numerator nor denominator).
    * ``cov_weight`` given — exactextract mode (reference
      src/geoglue/zonalstats.py:43-63 + exactextract's operation set):
      ``count`` = sum of coverage fractions x coverage weight over defined
      values, ``sum`` = sum(value x cov_weight), ``mean`` = sum/count, and
      the ``area_weighted_sum`` composite = weighted_sum / count — the
      denominator is the coverage-weight sum, NOT the row count.
    """
    w_defined = F.sum(F.when(value.isNotNull(), weight))
    exprs: list[Column] = []
    for op in ops:
        if op == "count":
            exprs.append(
                F.count(value).alias("count")
                if cov_weight is None
                else F.sum(F.when(value.isNotNull(), cov_weight)).alias("count")
            )
        elif op == "sum":
            exprs.append(
                F.sum(value).alias("sum")
                if cov_weight is None
                else F.sum(value * cov_weight).alias("sum")
            )
        elif op == "mean":
            exprs.append(
                F.avg(value).alias("mean")
                if cov_weight is None
                else (
                    F.sum(value * cov_weight)
                    / F.sum(F.when(value.isNotNull(), cov_weight))
                ).alias("mean")
            )
        elif op == "min":
            exprs.append(F.min(value).alias("min"))
        elif op == "max":
            exprs.append(F.max(value).alias("max"))
        elif op == "median":
            # EXACT percentile — holistic: partials can't collapse map-side,
            # so this is the op class the salt parameter exists for
            exprs.append(F.percentile(value, F.lit(0.5)).alias("median"))
        elif _QUANTILE_RE.match(op):
            q = float(op[op.index("(") + 1 : -1])
            exprs.append(F.percentile(value, F.lit(q)).alias(op))
        elif op == "approx_median":
            # Greenwald-Khanna sketch — partial-aggregates map-side
            # (ObjectHashAggregate), so unlike the exact percentile it
            # never shuffles whole groups: the 100-TB path for quantiles.
            exprs.append(
                F.percentile_approx(
                    value, F.lit(0.5), F.lit(approx_accuracy)
                ).alias("approx_median")
            )
        elif _APPROX_QUANTILE_RE.match(op):
            q = float(op[op.index("(") + 1 : -1])
            exprs.append(
                F.percentile_approx(value, F.lit(q), F.lit(approx_accuracy)).alias(op)
            )
        elif op == "weighted_sum":
            exprs.append(F.sum(value * weight).alias("weighted_sum"))
        elif op == "weighted_mean":
            exprs.append((F.sum(value * weight) / w_defined).alias("weighted_mean"))
        elif op == "area_weighted_sum":
            # reference composite: weighted_sum / count (zonalstats.py:43-63),
            # count = coverage-weight sum over defined values (exactextract),
            # NOT the row count.
            denom = (
                F.sum(F.when(value.isNotNull(), cov_weight))
                if cov_weight is not None
                else w_defined
            )
            exprs.append((F.sum(value * weight) / denom).alias("area_weighted_sum"))
        else:
            raise ValueError(f"unknown zonal op {op!r}; allowed: {ZONAL_OPS}")
    return exprs


def zonal_stats(
    assigned: DataFrame,
    value_col: str,
    ops: list[str],
    by: str | list[str] = "admin_id",
    weight_col: str | None = None,
    salt: int | None = None,
    approx_accuracy: int = DEFAULT_APPROX_ACCURACY,
) -> DataFrame:
    """Aggregate an assignment table per admin (and any extra dims).

    ``salt``: two-level aggregation for holistic cases — partial per
    (keys, salt) then final per keys. For the algebraic ops here Spark's
    hash-agg already partial-combines, so salt=None is the fast path.

    ``approx_median`` / ``approx_quantile(q)`` are the at-scale quantile
    ops: Greenwald-Khanna sketches merge, so they partial-aggregate
    map-side like the algebraic ops (rank error <= n/approx_accuracy per
    group) — use these instead of salting when a mega-admin makes the
    exact whole-group shuffle a bottleneck.
    """
    keys = [by] if isinstance(by, str) else list(by)
    value = F.col(value_col)
    weight = F.col(weight_col) if weight_col else F.lit(1.0)
    holistic = [o for o in ops if o == "median" or o.startswith("quantile(")]
    approx = [o for o in ops if o == "approx_median" or o.startswith("approx_quantile(")]
    if salt is not None and holistic:
        raise ValueError(
            f"holistic ops {holistic} cannot run on the salted two-level "
            "path (a percentile of per-salt percentiles is not the "
            "percentile); use salt=None — exact percentiles shuffle whole "
            "groups by design, or approx_median/approx_quantile(q) whose "
            "mergeable sketches partial-aggregate without salting"
        )
    if salt is not None and approx:
        raise ValueError(
            f"approx ops {approx} don't need the salted path: their "
            "Greenwald-Khanna sketches already partial-aggregate map-side; "
            "use salt=None"
        )
    if salt is None:
        return assigned.groupBy(*keys).agg(
            *_agg_exprs(value, weight, ops, approx_accuracy=approx_accuracy)
        )

    salted = assigned.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(k) for k in keys], value), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(value).alias("_n"),
        F.sum(value).alias("_s"),
        F.min(value).alias("_min"),
        F.max(value).alias("_max"),
        F.sum(value * weight).alias("_vw"),
        F.sum(F.when(value.isNotNull(), weight)).alias("_wd"),
    )
    final = partial.groupBy(*keys).agg(
        F.sum("_n").alias("count"),
        F.sum("_s").alias("sum"),
        (F.sum("_s") / F.sum("_n")).alias("mean"),
        F.min("_min").alias("min"),
        F.max("_max").alias("max"),
        (F.sum("_vw") / F.sum("_wd")).alias("weighted_mean"),
        F.sum("_vw").alias("weighted_sum"),
        (F.sum("_vw") / F.sum("_wd")).alias("area_weighted_sum"),
    )
    return final.select(*keys, *ops)


def raster_zonal_stats(
    pixels: DataFrame,
    cover: DataFrame,
    grid: Grid,
    value_col: str = "value",
    ops: list[str] = ("mean",),
    by_dims: list[str] = (),
    weights: DataFrame | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    use_spherical_area: bool = True,
    check_extent: bool = True,
    blocks: DataFrame | None = None,
    block_shift: int = 4,
) -> DataFrame:
    """Coverage-weighted zonal statistics over a long-form raster.

    ``blocks``: optional compacted interior-block table from
    ``cover.compact_cover`` (same ``block_shift``); pixels then join the
    cell-level cover AND the block table (both broadcast, coverage 1.0 for
    block hits, spherical area still computed from the pixel's own cell) —
    output-identical to the flat cover while keeping fine-grid world
    covers broadcastable.

    The Spark restatement of ``zonalstats(rast, vec, ops, weights)``
    (reference src/geoglue/zonalstats.py:71-100): pixels equi-join the
    broadcast cover on cell id; aggregation weight =
    coverage_fraction x area_spherical_km2 x (optional weights raster),
    matching exactextract's ``weighted_mean(coverage_weight=
    area_spherical_km2, default_weight=0)`` default (cli.py:268-277).

    ``weights`` must live on the SAME grid — the caller resamples first
    (the reference's incompatible-extent precondition,
    tests/test_zonalstats.py:51-54); verified here by joining on cell_id.
    """
    if "area_weighted_sum" in ops and weights is None:
        # reference gate: zonalstats.py:89-90
        raise ValueError("area_weighted_sum requires weights to be set")
    if weights is not None and check_extent:
        # J3 precondition: exactextract's "Incompatible extent" gate
        # (tests/test_zonalstats.py:51-54) — weights must live on the value
        # raster's grid; cheap metadata-scale aggregation, fail-fast.
        from ..grids import infer_grid

        wgrid = infer_grid(weights, lon_col, lat_col)
        if not wgrid.approx_equal(grid):
            raise ValueError(
                f"incompatible extent: weights grid {wgrid} != value grid {grid}; "
                "resample the weights first (operators.resample)"
            )
    px = pixels.withColumn("cell_id", grid.cell_id_col(F.col(lon_col), F.col(lat_col)))
    cov = F.broadcast(cover.select("cell_id", "admin_id", "coverage"))
    if blocks is None:
        joined = px.join(cov, "cell_id", "inner")
    else:
        from ..cover import join_cover_two_level

        joined = join_cover_two_level(
            px, cover.select("cell_id", "admin_id", "coverage"),
            blocks, grid, block_shift,
        ).withColumn("coverage", F.coalesce("coverage", F.lit(1.0)))

    # exactextract's two weights: the coverage weight (coverage fraction x
    # spherical area, used by count/sum/mean and the area_weighted_sum
    # denominator) and the full weight (x weights raster, used by
    # weighted_sum / weighted_mean numerators).
    cov_w: Column = F.col("coverage")
    if use_spherical_area:
        cov_w = cov_w * grid.cell_area_km2_col(F.col("cell_id"))
    w = cov_w
    if weights is not None:
        # aggregate to ONE row per cell with an in-plan duplicate trap: a
        # weights frame carrying an extra dimension (e.g. a time axis)
        # would otherwise fan out every matching value row and silently
        # inflate count/sum/mean. max() == the value when unique; the
        # raise fires lazily on the first duplicate cell.
        wpx = (
            weights.withColumn(
                "cell_id", grid.cell_id_col(F.col(lon_col), F.col(lat_col))
            )
            .groupBy("cell_id")
            .agg(
                F.max("weight").alias("_wmax"),
                F.count("*").alias("_nw"),
            )
            .select(
                "cell_id",
                F.when(
                    F.col("_nw") > 1,
                    F.raise_error(
                        F.format_string(
                            "raster_zonal_stats: weights raster has %s rows "
                            "for cell_id %s — it must be a single 2-D "
                            "raster (one row per cell); slice or aggregate "
                            "the extra dimension first",
                            F.col("_nw").cast("string"),
                            F.col("cell_id").cast("string"),
                        )
                    ).cast("double"),
                ).otherwise(F.col("_wmax")).alias("_wraster"),
            )
        )
        joined = joined.join(wpx, "cell_id", "left").withColumn(
            "_wraster", F.coalesce(F.col("_wraster"), F.lit(0.0))  # default_weight=0
        )
        w = w * F.col("_wraster")

    joined = (
        joined.withColumn("_covw", cov_w)
        .withColumn("_weight", w)
        .filter(F.col(value_col).isNotNull())
    )
    keys = ["admin_id", *by_dims]
    return joined.groupBy(*keys).agg(
        *_agg_exprs(
            F.col(value_col), F.col("_weight"), list(ops), cov_weight=F.col("_covw")
        )
    )
