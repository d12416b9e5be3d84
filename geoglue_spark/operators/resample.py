"""Grid resampling — R1 bilinear, R2 inverse-distance, R3 sparse-bilinear.

Replaces the reference's shell-out to the CDO binary
(reference src/geoglue/resample.py:81-161: remapbil/remapdis/sremapbil)
with native DataFrame math:

  * both grids are *regular* lon/lat (the reference rejects anything else,
    resample.py:130-141), so the 4 surrounding source pixels of any target
    pixel are pure arithmetic from the two griddes — no spatial search;
  * each target pixel explodes to <= 4 (bilinear) or k-ring (distance)
    source references, equi-joins the source table on the source cell id,
    and reduces with a weighted sum: one shuffle on cell id, broadcastable
    when the source raster is small;
  * sparse-bilinear (reference resample.py:19-78) runs value*mask and mask
    through the SAME weights in ONE pass — numerator and denominator are
    two aggregate columns — then divides where mask > eps, so NaN never
    bleeds across coastlines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..grids import Grid

SPARSE_EPS = 1e-6  # reference resample.py:19-78


def check_resample_coverage(
    source: Grid, target: Grid, strict: bool = False
) -> bool:
    """R4 pre-flight gate (reference resample.py:118-129): the source grid
    must entirely cover the target grid or edge pixels interpolate from
    clamped/missing neighbours (NA bleed). Warns by default — like the
    reference — or raises with ``strict=True``. Returns coverage status."""
    import warnings

    covered = source.bbox().contains(target.bbox())
    if not covered:
        msg = (
            "source grid bbox should entirely cover the target bbox to avoid "
            f"NA at the edges: source={source.bbox()} target={target.bbox()}; "
            "enlarge the source crop (Bbox.enlarge) or shrink the target"
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg)
    return covered


def _target_pixels(spark, target: Grid) -> DataFrame:
    """One row per target pixel with center coordinates (JVM-generated)."""
    n = target.nx * target.ny
    iy = (F.col("id") / target.nx).cast("long")
    ix = F.col("id") % target.nx
    return spark.range(0, n, 1, max(8, spark.sparkContext.defaultParallelism)).select(
        ix.alias("tix"),
        iy.alias("tiy"),
        (F.lit(target.x0) + (ix.cast("double") + 0.5) * F.lit(target.dx)).alias("tlon"),
        (F.lit(target.y0) + (iy.cast("double") + 0.5) * F.lit(target.dy)).alias("tlat"),
    )


def _bilinear_refs(tgt: DataFrame, source: Grid) -> DataFrame:
    """Explode each target pixel into its 4 bilinear source references with
    weights. Source pixels addressed by CENTER: fractional index
    fx = (tlon - center0_x)/dx; corners ix0=floor(fx), ix0+1 clamped."""
    cx0 = source.x0 + source.dx / 2.0
    cy0 = source.y0 + source.dy / 2.0
    fx = (F.col("tlon") - F.lit(cx0)) / F.lit(source.dx)
    fy = (F.col("tlat") - F.lit(cy0)) / F.lit(source.dy)
    ix0 = F.floor(fx).cast("long")
    iy0 = F.floor(fy).cast("long")
    ax = fx - ix0.cast("double")
    ay = fy - iy0.cast("double")

    def clamp(c: Column, n: int) -> Column:
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), c))

    refs = []
    for dx_i, wx in ((0, 1 - ax), (1, ax)):
        for dy_i, wy in ((0, 1 - ay), (1, ay)):
            sx = clamp(ix0 + dx_i, source.nx)
            sy = clamp(iy0 + dy_i, source.ny)
            refs.append(
                F.struct(
                    (sy * source.nx + sx).alias("scell"),
                    (wx * wy).alias("w"),
                )
            )
    return (
        tgt.select("tix", "tiy", "tlon", "tlat", F.explode(F.array(*refs)).alias("r"))
        .select("tix", "tiy", "tlon", "tlat", "r.scell", "r.w")
        .filter(F.col("w") > 0)
    )


def _source_cells(pixels: DataFrame, source: Grid, value_col: str,
                  lon_col: str, lat_col: str, dims: list[str]) -> DataFrame:
    return pixels.select(
        (source.iy_col(F.col(lat_col)) * source.nx + source.ix_col(F.col(lon_col))).alias(
            "scell"
        ),
        F.col(value_col).alias("_v"),
        *dims,
    )


def resample_bilinear(
    pixels: DataFrame,
    source: Grid,
    target: Grid,
    value_col: str = "value",
    lon_col: str = "lon",
    lat_col: str = "lat",
    dims: list[str] = (),
) -> DataFrame:
    """R1 remapbil analog. NaN in any contributing source pixel propagates
    (CDO bilinear behavior); use resample_sparse_bilinear to avoid bleed.
    ``dims`` are extra key columns (time, var) carried through. Emits the
    R4 coverage warning when the source doesn't cover the target."""
    check_resample_coverage(source, target)
    spark = pixels.sparkSession
    refs = _bilinear_refs(_target_pixels(spark, target), source)
    src = _source_cells(pixels, source, value_col, lon_col, lat_col, list(dims))
    joined = refs.join(src, "scell", "inner")
    return (
        joined.groupBy("tix", "tiy", "tlon", "tlat", *dims)
        .agg(
            # invalid = NULL or NaN (parquet preserves NaN; isNull alone
            # would let NaN poison the sum while _has_nan stays 0)
            (
                F.sum(
                    F.when(~F.isnan("_v"), F.col("_v") * F.col("w"))
                ) / F.sum(
                    F.when(F.col("_v").isNotNull() & ~F.isnan("_v"), F.col("w"))
                )
            ).alias("_num"),
            F.max(
                F.when(F.col("_v").isNull() | F.isnan("_v"), 1).otherwise(0)
            ).alias("_has_nan"),
        )
        .select(
            F.col("tlon").alias(lon_col),
            F.col("tlat").alias(lat_col),
            *dims,
            F.when(F.col("_has_nan") == 1, F.lit(None).cast("double"))
            .otherwise(F.col("_num"))
            .alias(value_col),
        )
    )


def resample_sparse_bilinear(
    pixels: DataFrame,
    source: Grid,
    target: Grid,
    value_col: str = "value",
    lon_col: str = "lon",
    lat_col: str = "lat",
    dims: list[str] = (),
    eps: float = SPARSE_EPS,
) -> DataFrame:
    """R3 sremapbil analog (reference resample.py:19-78):
    out = bilinear(value filled 0) / bilinear(valid mask), masked where the
    interpolated mask <= eps. One join + one aggregation (numerator and
    denominator as two agg columns), not two passes."""
    check_resample_coverage(source, target)
    spark = pixels.sparkSession
    refs = _bilinear_refs(_target_pixels(spark, target), source)
    # valid = non-NULL AND non-NaN: coalesce alone keeps NaN (the CDO/
    # xarray ocean encoding) and a NULL-only mask counts it as valid —
    # exactly the coastal bleed this operator exists to prevent
    _valid = F.col("_v").isNotNull() & ~F.isnan("_v")
    src = _source_cells(pixels, source, value_col, lon_col, lat_col, list(dims)).select(
        "scell",
        F.when(_valid, F.col("_v")).otherwise(F.lit(0.0)).alias("_v0"),
        F.when(_valid, 1.0).otherwise(0.0).alias("_m"),
        *dims,
    )
    joined = refs.join(src, "scell", "inner")
    return (
        joined.groupBy("tix", "tiy", "tlon", "tlat", *dims)
        .agg(
            F.sum(F.col("_v0") * F.col("w")).alias("_num"),
            F.sum(F.col("_m") * F.col("w")).alias("_den"),
            F.sum("w").alias("_wtot"),
        )
        .select(
            F.col("tlon").alias(lon_col),
            F.col("tlat").alias(lat_col),
            *dims,
            F.when(
                F.col("_den") / F.col("_wtot") > eps, F.col("_num") / F.col("_den")
            )
            .otherwise(F.lit(None).cast("double"))
            .alias(value_col),
        )
    )


def resample_distance(
    pixels: DataFrame,
    source: Grid,
    target: Grid,
    value_col: str = "value",
    lon_col: str = "lon",
    lat_col: str = "lat",
    dims: list[str] = (),
    k: int = 4,
    ring: int = 2,
) -> DataFrame:
    """R2 remapdis analog: inverse-distance-weighted mean of the k nearest
    source cells, found by k-ring expansion (J7): each target pixel
    explodes to the (2*ring+1)^2 neighborhood of its containing source
    cell, joins, ranks by distance (ties broken by cell id — deterministic)
    and keeps k."""
    check_resample_coverage(source, target)
    from pyspark.sql import Window as W

    spark = pixels.sparkSession
    tgt = _target_pixels(spark, target)
    cx0 = source.x0 + source.dx / 2.0
    cy0 = source.y0 + source.dy / 2.0
    ix_c = F.floor((F.col("tlon") - F.lit(cx0)) / F.lit(source.dx) + 0.5).cast("long")
    iy_c = F.floor((F.col("tlat") - F.lit(cy0)) / F.lit(source.dy) + 0.5).cast("long")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)
        ]
    )
    cand = (
        tgt.select("tix", "tiy", "tlon", "tlat", ix_c.alias("icx"), iy_c.alias("icy"),
                   F.explode(offsets).alias("o"))
        .select(
            "tix", "tiy", "tlon", "tlat",
            (F.col("icx") + F.col("o.ox")).alias("sx"),
            (F.col("icy") + F.col("o.oy")).alias("sy"),
        )
        .filter(
            (F.col("sx") >= 0) & (F.col("sx") < source.nx)
            & (F.col("sy") >= 0) & (F.col("sy") < source.ny)
        )
        .withColumn("scell", F.col("sy") * source.nx + F.col("sx"))
    )
    src = _source_cells(pixels, source, value_col, lon_col, lat_col, list(dims))
    slon = F.lit(cx0) + F.col("sx").cast("double") * F.lit(source.dx)
    slat = F.lit(cy0) + F.col("sy").cast("double") * F.lit(source.dy)
    joined = (
        cand.join(src, "scell", "inner")
        .filter(F.col("_v").isNotNull())
        .withColumn(
            "dist2",
            (F.col("tlon") - slon) ** 2 + (F.col("tlat") - slat) ** 2,
        )
    )
    w = W.partitionBy("tix", "tiy", *dims).orderBy(F.col("dist2"), F.col("scell"))
    kept = joined.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    inv = 1.0 / F.sqrt(F.col("dist2") + F.lit(1e-30))
    return (
        kept.groupBy("tlon", "tlat", *dims)
        .agg((F.sum(F.col("_v") * inv) / F.sum(inv)).alias(value_col))
        .withColumnsRenamed({"tlon": lon_col, "tlat": lat_col})
    )
