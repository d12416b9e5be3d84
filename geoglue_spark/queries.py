"""Query registry: every implemented operator as a (spark_fn, oracle_sql) pair.

The driver runs each Spark query and its DuckDB oracle side-by-side at
sf=0.01 and compares row counts + schema + order-insensitive value hashes.
Rules followed here:

  * identical column names + aliases on both sides;
  * every float aggregate wrapped in round(x, d) on BOTH sides so benign
    double-summation-order differences can't flip the hash;
  * geo queries derive deterministic points from ``events`` via dialect-
    neutral integer arithmetic (synth.POINTS_FROM_EVENTS_SQL): the Spark
    side goes through the full engine (cover -> broadcast join -> ray-cast
    refinement) while the oracle uses independent floor arithmetic valid
    for the rectangular admin layout — two genuinely different
    formulations that must agree;
  * ops that SQL can't express (LSH dedup, streaming, raster path) have no
    oracle -> the driver records a rows-only check; pytest carries their
    NumPy-oracle tests instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cover import build_cover
from .grids import Grid
from .operators.assign import assign_admin
from .operators.dedup import (
    SIMHASH_BITS,
    _mh_params,
    exact_dedup_stats,
    minhash_near_dupes,
    phash_near_dupes,
    simhash_near_dupes,
)
from .operators.similarity import cosine_topk, cosine_topk_lsh
from .operators.text import STOPWORDS, doc_stats, quality_score_col, token_count_col
from .operators.timeagg import week_start_col
from .operators.zonal import zonal_stats
from .synth import (
    ADMIN_ID_SQL,
    POINTS_FROM_EVENTS_SQL,
    admins_df,
    audio_parquet,
    audio_truth_parquet,
    image_truth_parquet,
    images_parquet,
    images_table,
    video_truth_parquet,
    videos_parquet,
)

QUERY_GRID = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)

# ---------------------------------------------------------------------------
# shared session-scoped artifacts (cover table is built once per session)
# ---------------------------------------------------------------------------
# keyed by applicationId, NOT id(spark): Python id() values are reused
# after garbage collection (same hazard as the executor-side prep cache)
_CACHE: dict[str, object] = {}


# pin the cover driver-side only below this row count: pinning turns each
# query's broadcast build into a LocalTableScan (fixed per-query cost ~0 on
# a shared local session), but a world-scale cover (10^6-10^7 rows) must
# stay distributed — F.broadcast on the cached frame handles it without a
# driver round-trip (VERDICT r01 "what's wrong" #5).
PIN_COVER_MAX_ROWS = 200_000


def _pinned_cover(spark: SparkSession, admins, grid: Grid):
    # cache BEFORE the count: the cover build is a full ray-cast +
    # supersampling applyInPandas plan, and counting the uncached frame
    # then toPandas()-ing it would execute that build twice
    cover = build_cover(admins, grid, supersample=8).cache()
    n = cover.count()
    if n <= PIN_COVER_MAX_ROWS:
        cover_pd = cover.toPandas()
        cover.unpersist()
        return spark.createDataFrame(
            cover_pd,
            "cell_id long, admin_id string, interior boolean, coverage double",
        )
    return cover


def _engine(spark: SparkSession):
    key = f"engine-{spark.sparkContext.applicationId}"
    if key not in _CACHE:
        admins = admins_df(spark)
        cover = _pinned_cover(spark, admins, QUERY_GRID)
        rows = admins.collect()
        wkb = {r.admin_id: bytes(r.geometry) for r in rows}
        admin1 = {r.admin_id: r.admin1_id for r in rows}
        _CACHE[key] = (cover, wkb, admin1)
    return _CACHE[key]


def _engine_wiggly(spark: SparkSession):
    """Cover + polygons for the realistic-complexity (256-vertex) admin set
    — the scaling-bench workload where ray-cast compute dominates."""
    key = f"wiggly-{spark.sparkContext.applicationId}"
    if key not in _CACHE:
        admins = admins_df(spark, wiggly=True)
        cover = _pinned_cover(spark, admins, QUERY_GRID)
        wkb = {r.admin_id: bytes(r.geometry) for r in admins.collect()}
        _CACHE[key] = (cover, wkb, None)
    return _CACHE[key]


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    _table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(POINTS_FROM_EVENTS_SQL)


def _spread_scan(df: DataFrame) -> DataFrame:
    """Starvation-gated spread for CPU-amplified downstream stages (r6):
    the driver testdata ships one file per table, so scans split at the
    4 MB open-cost floor into a handful of partitions — the Arrow
    ray-cast / decode stages downstream then hold 1-4 of the cores. When
    the scan already has >= parallelism partitions (any real multi-file
    fact table) this is a no-op, so nothing changes at cluster scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread (r6, measured): the keep kernel short-circuits interior
    # cells, so the Arrow stage is cheap per row and the few-task scan is
    # not the bottleneck — a forced repartition of 1 M points cost more
    # than it recovered (1.17 s -> 2.8 s).
    cover, wkb, _ = _engine(spark)
    return assign_admin(_points(spark, sf_dir), cover, wkb, QUERY_GRID)


_POINTS_CTE = f"WITH points AS ({POINTS_FROM_EVENTS_SQL})"


# ---------------------------------------------------------------------------
# geo queries (engine path vs floor-arithmetic oracle)
# ---------------------------------------------------------------------------
def q_admin_assign_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assigned(spark, sf_dir).groupBy("admin_id").agg(F.count("*").alias("n"))


SQL_ADMIN_ASSIGN_COUNT = f"""
{_POINTS_CTE}
SELECT {ADMIN_ID_SQL} AS admin_id, count(*) AS n
FROM points GROUP BY 1
"""


def q_zonal_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = zonal_stats(_assigned(spark, sf_dir), "value", ["count", "mean", "sum"])
    return out.select(
        "admin_id",
        F.col("count").alias("n"),
        F.round("mean", 6).alias("mean_value"),
        F.round("sum", 3).alias("sum_value"),
    )


SQL_ZONAL_VALUE_STATS = f"""
{_POINTS_CTE}
SELECT {ADMIN_ID_SQL} AS admin_id,
       count(value) AS n,
       round(avg(value), 6) AS mean_value,
       round(sum(value), 3) AS sum_value
FROM points GROUP BY 1
"""


def q_zonal_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holistic + sketch zonal quantiles in ONE single-shuffle aggregate
    (r4 verdict #1 consolidation: this row now carries the driver
    evidence for BOTH quantile paths):

    - EXACT median/p90 per admin — the op class where map-side partials
      cannot collapse, whole groups shuffle;
    - approx_median / approx_quantile(q) — Greenwald-Khanna sketches that
      MERGE, so they partial-aggregate map-side like algebraic ops: the
      quantile path that survives a mega-admin at 100 TB (exact
      percentile refuses the salted path by design).

    The sketch side is oracle-able because the GK bound is deterministic:
    with every group smaller than accuracy/2 the rank error is under half
    a rank, so the sketch returns EXACTLY the rank-ceil(q*n) order
    statistic (1-indexed, min 1; measured invariant across
    partitionings) — DuckDB selects that order statistic directly."""
    out = zonal_stats(
        _assigned(spark, sf_dir),
        "value",
        ["median", "quantile(0.9)", "approx_median", "approx_quantile(0.9)"],
    )
    return out.select(
        "admin_id",
        F.round("median", 6).alias("median_value"),
        F.round("`quantile(0.9)`", 6).alias("p90_value"),
        F.round("approx_median", 6).alias("approx_median_value"),
        F.round("`approx_quantile(0.9)`", 6).alias("approx_p90_value"),
    )


SQL_ZONAL_VALUE_QUANTILES = f"""
{_POINTS_CTE},
r AS (
  SELECT {ADMIN_ID_SQL} AS admin_id, value,
         row_number() OVER (PARTITION BY {ADMIN_ID_SQL} ORDER BY value) AS rk,
         count(*)     OVER (PARTITION BY {ADMIN_ID_SQL}) AS n
  FROM points WHERE value IS NOT NULL
),
ap AS (
  SELECT admin_id,
         round(max(CASE WHEN rk = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                        THEN value END), 6) AS approx_median_value,
         round(max(CASE WHEN rk = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
                        THEN value END), 6) AS approx_p90_value
  FROM r GROUP BY 1
),
ex AS (
  SELECT {ADMIN_ID_SQL} AS admin_id,
         round(quantile_cont(value, 0.5), 6) AS median_value,
         round(quantile_cont(value, 0.9), 6) AS p90_value
  FROM points GROUP BY 1
)
SELECT admin_id, median_value, p90_value, approx_median_value, approx_p90_value
-- LEFT join: ap only has admins with >=1 non-NULL value, while the Spark
-- side emits every assigned admin (NULL quantiles for all-NULL groups) —
-- an inner join would drop such an admin from the oracle only
FROM ex LEFT JOIN ap USING (admin_id)
"""


def q_admin1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, admin1 = _engine(spark)
    dim = F.broadcast(
        spark.createDataFrame(list(admin1.items()), "admin_id string, admin1_id string")
    )
    return (
        _assigned(spark, sf_dir)
        .join(dim, "admin_id")
        .groupBy("admin1_id")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("mean_value"))
    )


SQL_ADMIN1_ROLLUP = f"""
{_POINTS_CTE}
SELECT printf('ADM1-%d', CAST(floor(lat - 10.0) AS INT)) AS admin1_id,
       count(*) AS n,
       round(avg(value), 6) AS mean_value
FROM points GROUP BY 1
"""


def q_hotspot_cells_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    g = QUERY_GRID
    return (
        pts.withColumn("cell_id", g.cell_id_col(F.col("lon"), F.col("lat")))
        .groupBy("cell_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("cell_id"))
        .limit(10)
    )


SQL_HOTSPOT_CELLS_TOPK = f"""
{_POINTS_CTE}
SELECT CAST(floor((lat - 10.0) / 0.05) AS BIGINT) * 200
       + CAST(floor((lon - 100.0) / 0.05) AS BIGINT) AS cell_id,
       count(*) AS n
FROM points GROUP BY 1
ORDER BY n DESC, cell_id ASC LIMIT 10
"""


N_IMAGES = 5000


def _images(spark: SparkSession) -> DataFrame:
    """Scan the once-materialized deterministic images fixture — the query
    measures scan+assign, not synthesis (the at-scale generation path is
    synth.images_table; here the fact table already exists, as it would in
    production)."""
    return spark.read.parquet(images_parquet(N_IMAGES))


def q_images_admin_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full input_hint fact-table path: scan geocoded image records,
    assign via the engine, count per admin."""
    cover, wkb, _ = _engine(spark)
    imgs = _images(spark)
    assigned = assign_admin(imgs.select("image_id", "phash", "lat", "lon"), cover, wkb, QUERY_GRID)
    return assigned.groupBy("admin_id").agg(F.count("*").alias("n_images"))


SQL_IMAGES_ADMIN_COUNT = """
WITH pts AS (
  SELECT
    CASE WHEN i % 5 < 4
         THEN 12.25 + (CAST((i * 48271 + 7) % 99991 AS DOUBLE) / 99991.0) * 0.5
         ELSE 10.0  + (CAST((i * 48271 + 7) % 99991 AS DOUBLE) / 99991.0) * 10.0
    END AS lat,
    CASE WHEN i % 5 < 4
         THEN 104.25 + (CAST((i * 16807 + 11) % 99991 AS DOUBLE) / 99991.0) * 0.5
         ELSE 100.0  + (CAST((i * 16807 + 11) % 99991 AS DOUBLE) / 99991.0) * 10.0
    END AS lon
  FROM range(5000) t(i)
)
SELECT printf('ADM2-%02d', CAST(floor(lat - 10.0) AS INT) * 10
              + CAST(floor(lon - 100.0) AS INT)) AS admin_id,
       count(*) AS n_images
FROM pts GROUP BY 1
"""


# ---------------------------------------------------------------------------
# relational core (scan/filter/join/agg/window over the star schema)
# ---------------------------------------------------------------------------
def q_image_tile_zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star composition (S6 x J1 x A1): raster-to-vector zonal stats
    over DECODED image tiles — decode binary payloads in Arrow batches,
    assign each tile to its admin polygon through the cover join, and
    aggregate the pixel-count-weighted mean pixel value per admin.

    Restricted to the lossless formats (png/raw) so the DuckDB oracle can
    join an INDEPENDENTLY synthesized ground-truth table
    (synth.image_truth_parquet: pixels -> gray mean, no encode/decode
    round trip): a value-hash match proves the engine's distributed decode
    reproduces the original pixels exactly, per row, inside the full
    assignment + aggregation pipeline."""
    from .operators.multimodal import decode_stats

    cover, wkb, _ = _engine(spark)
    # spread: the one-file fixture scans as a single partition, and the
    # per-image codec work downstream is the expensive stage (decode-bound
    # queries only — the assign-only image queries measured FASTER without
    # the extra exchange)
    imgs = _spread_scan(_images(spark).filter(F.col("fmt") != "qnt"))
    # assign FIRST (payload bytes stay JVM-side through the keep kernel),
    # then decode with admin_id carried through the same pipeline — one
    # scan, zero fact-table joins. Decoding separately and re-joining on
    # image_id would shuffle two fact-sized tables at 10^12 rows.
    assigned = assign_admin(imgs, cover, wkb, QUERY_GRID)
    dec = decode_stats(assigned, carry=("admin_id",))
    npx = (F.col("w") * F.col("h")).cast("double")
    return dec.groupBy("admin_id").agg(
        F.count("*").alias("n_tiles"),
        F.round(F.sum(F.col("mean_px") * npx) / F.sum(npx), 6).alias("mean_px"),
    )


SQL_IMAGE_TILE_ZONAL = """
WITH imgs AS (
  SELECT image_id, lat, lon
  FROM read_parquet('{images_path}') WHERE fmt <> 'qnt'
),
truth AS (
  SELECT image_id, mean_px, n_px FROM read_parquet('{truth_path}')
),
a AS (
  SELECT printf('ADM2-%02d', CAST(floor(lat - 10.0) AS INT) * 10
                + CAST(floor(lon - 100.0) AS INT)) AS admin_id,
         t.mean_px, t.n_px
  FROM imgs i JOIN truth t USING (image_id)
)
SELECT admin_id, count(*) AS n_tiles,
       round(sum(mean_px * n_px) / sum(n_px), 6) AS mean_px
FROM a GROUP BY 1
"""


_TILE_W, _TILE_H = 0.17, 0.13  # deliberately NOT multiples of the 0.05 cell


def q_tile_overlap_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule tiling: image footprints are bboxes, not points — a tile
    near an admin border belongs FRACTIONALLY to several admins. The
    engine explodes each tile to its candidate cells (bounded fan-out),
    broadcast-joins the cover, and sums coverage x intersection area; the
    admin rectangles align with cell edges here, so the result is exact
    and the DuckDB oracle computes the closed-form bbox intersection with
    every 1-degree admin rectangle directly."""
    from .operators.assign import assign_tiles_fractional

    cover, _, _ = _engine(spark)
    hw, hh = _TILE_W / 2, _TILE_H / 2
    imgs = _images(spark).select("image_id", "lon", "lat").filter(
        (F.col("lon") - hw >= 100.0) & (F.col("lon") + hw <= 110.0)
        & (F.col("lat") - hh >= 10.0) & (F.col("lat") + hh <= 20.0)
    )
    out = assign_tiles_fractional(
        imgs, cover, QUERY_GRID, _TILE_W, _TILE_H, id_cols=["image_id"]
    )
    return out.select("image_id", "admin_id", F.round("frac", 6).alias("frac"))


SQL_TILE_OVERLAP_FRACTIONS = """
WITH imgs AS (
  SELECT image_id, lon, lat FROM read_parquet('{images_path}')
  WHERE lon - {hw} >= 100.0 AND lon + {hw} <= 110.0
    AND lat - {hh} >= 10.0  AND lat + {hh} <= 20.0
),
cand AS (
  SELECT i.image_id, ax.a AS ax, ay.a AS ay,
         least(i.lon + {hw}, 100.0 + ax.a + 1) - greatest(i.lon - {hw}, 100.0 + ax.a) AS ox,
         least(i.lat + {hh}, 10.0 + ay.a + 1) - greatest(i.lat - {hh}, 10.0 + ay.a) AS oy
  FROM imgs i
  CROSS JOIN (SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS a) ax
  CROSS JOIN (SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS a) ay
)
SELECT image_id, printf('ADM2-%02d', ay * 10 + ax) AS admin_id,
       round(ox * oy / ({w} * {h}), 6) AS frac
FROM cand WHERE ox > 0 AND oy > 0
"""


def q_image_tile_zonal_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full north-star statement in one oracled pipeline: decode image
    tiles, assign each FRACTIONALLY to every admin its footprint overlaps
    (J8), and aggregate per-admin pixel means weighted by
    frac x pixel count — boundary tiles contribute to several admins in
    proportion to overlap instead of snapping to their center point.
    One scan: decode carries lon/lat through the Arrow stage, the
    fraction join is a broadcast, the only shuffle is the final agg.
    Oracle: ground-truth pixel stats (no codec round trip) x closed-form
    bbox fractions, entirely in DuckDB."""
    from .operators.assign import assign_tiles_fractional
    from .operators.multimodal import decode_stats

    cover, _, _ = _engine(spark)
    hw, hh = _TILE_W / 2, _TILE_H / 2
    # spread before the decode stage: single-file fixture scan = 1 task
    imgs = _spread_scan(
        _images(spark).filter(
            (F.col("fmt") != "qnt")
            & (F.col("lon") - hw >= 100.0) & (F.col("lon") + hw <= 110.0)
            & (F.col("lat") - hh >= 10.0) & (F.col("lat") + hh <= 20.0)
        )
    )
    dec = decode_stats(imgs, carry=("lon", "lat"))
    tiles = dec.select(
        "image_id", "lon", "lat", "mean_px",
        (F.col("w") * F.col("h")).cast("double").alias("_npx"),
    )
    # grouped=False: the admin aggregate is linear in frac, so per-cell
    # contributions aggregate directly — ONE fact-scale shuffle, not two
    fr = assign_tiles_fractional(
        tiles, cover, QUERY_GRID, _TILE_W, _TILE_H,
        id_cols=["image_id", "mean_px", "_npx"], grouped=False,
    )
    wpx = F.col("_contrib") * F.col("_npx")
    return fr.groupBy("admin_id").agg(
        F.round(F.sum("_contrib"), 6).alias("tile_mass"),
        F.round(F.sum(F.col("mean_px") * wpx) / F.sum(wpx), 6).alias("mean_px"),
    )


SQL_IMAGE_TILE_ZONAL_FRAC = """
WITH imgs AS (
  SELECT image_id, lon, lat FROM read_parquet('{images_path}')
  WHERE fmt <> 'qnt'
    AND lon - {hw} >= 100.0 AND lon + {hw} <= 110.0
    AND lat - {hh} >= 10.0  AND lat + {hh} <= 20.0
),
truth AS (
  SELECT image_id, mean_px, n_px FROM read_parquet('{truth_path}')
),
cand AS (
  SELECT i.image_id, ax.a AS ax, ay.a AS ay,
         least(i.lon + {hw}, 100.0 + ax.a + 1) - greatest(i.lon - {hw}, 100.0 + ax.a) AS ox,
         least(i.lat + {hh}, 10.0 + ay.a + 1) - greatest(i.lat - {hh}, 10.0 + ay.a) AS oy
  FROM imgs i
  CROSS JOIN (SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS a) ax
  CROSS JOIN (SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS a) ay
),
fr AS (
  SELECT image_id, printf('ADM2-%02d', ay * 10 + ax) AS admin_id,
         ox * oy / ({w} * {h}) AS frac
  FROM cand WHERE ox > 0 AND oy > 0
)
SELECT admin_id,
       round(sum(frac), 6) AS tile_mass,
       round(sum(frac * mean_px * n_px) / sum(frac * n_px), 6) AS mean_px
FROM fr JOIN truth USING (image_id)
GROUP BY 1
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    rev = (
        li.groupBy("l_orderkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    # project the fact-side probe columns before the join (guide §2.3):
    # the 2-column orders scan is ~1/5 the bytes, which both narrows any
    # shuffle and lets the planner's size estimate pick a broadcast here
    # (estimate-driven, NOT forced — at a scale where orders outgrows the
    # threshold this degrades to the shuffled join unchanged)
    orders = orders.select("o_orderkey", "o_custkey")
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "c_mktsegment",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(20)
    )


SQL_TOP_REVENUE_ORDERS = """
SELECT l_orderkey AS orderkey, c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY l_orderkey, c_mktsegment
ORDER BY revenue DESC, orderkey ASC LIMIT 20
"""


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation for orders whose customer and
    supplier share the nation, one region, one order-date year. Exercises
    the full dimension chain (region -> nation -> customer/supplier) — all
    dims broadcast, the two fact joins shuffle on their keys."""
    li = _table(spark, sf_dir, "lineitem")
    orders = _table(spark, sf_dir, "orders")
    cust = _table(spark, sf_dir, "customer")
    supp = _table(spark, sf_dir, "supplier")
    nation = _table(spark, sf_dir, "nation")
    region = _table(spark, sf_dir, "region")
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    # pre-filter + project the orders side (guide §2.3/§3): the one-year,
    # 2-column orders scan is small enough for the planner to broadcast
    # (estimate-driven, not forced), so lineitem is never shuffled; at a
    # scale past the threshold this degrades to the same shuffled join
    # the un-projected form produced
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    ).select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(dims, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


SQL_TPCH_Q5_LOCAL_SUPPLIER = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
GROUP BY 1
"""


def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: revenue share of one part type per month — a
    broadcast part join + conditional aggregation."""
    li = _table(spark, sf_dir, "lineitem")
    part = _table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("month"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
                * 100.0
                / F.sum(rev),
                6,
            ).alias("promo_share_pct"),
            F.count("*").alias("n"),
        )
    )


SQL_TPCH_Q14_PROMO_SHARE = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       round(sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             * 100.0 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct,
       count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# time semantics (daily / ISO-weekly / tz shift with the accum -1 rule)
# ---------------------------------------------------------------------------
def q_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _table(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").alias("date"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


SQL_DAILY_EVENTS = """
SELECT CAST(ts AS DATE) AS date, event_type,
       count(*) AS n,
       round(avg(value), 6) AS mean_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY 1, 2
"""


def q_weekly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _table(spark, sf_dir, "events")
    return ev.groupBy(
        week_start_col(F.to_date("ts")).alias("week_start")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))


SQL_WEEKLY_EVENTS = """
SELECT CAST(ts AS DATE) - CAST(isodow(CAST(ts AS DATE)) - 1 AS INT) AS week_start,
       count(*) AS n,
       round(sum(value), 3) AS sum_value
FROM events GROUP BY 1
"""


def q_tz_shift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone shift +8 with the reference's accum -1 rule: 'error'
    events play the accumulated variable (end-of-hour label -> shift 7)."""
    from .operators.timeagg import local_time_col

    ev = _table(spark, sf_dir, "events").withColumn(
        "vartype", F.when(F.col("event_type") == "error", "accum").otherwise("instant")
    )
    local = ev.withColumn("local_ts", local_time_col(F.col("ts"), 8, "vartype"))
    return local.groupBy(F.to_date("local_ts").alias("local_date")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("sum_value")
    )


SQL_TZ_SHIFT_DAILY = """
SELECT CAST(ts + CASE WHEN event_type = 'error'
                      THEN INTERVAL 7 HOUR ELSE INTERVAL 8 HOUR END AS DATE) AS local_date,
       count(*) AS n,
       round(sum(value), 3) AS sum_value
FROM events GROUP BY 1
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (>30 min) per user via lag + running sum."""
    from pyspark.sql import Window as W

    ev = _table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ; go via timestamp (session
    # tz pinned to UTC) to fractional epoch seconds
    epoch = F.col("ts").cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    sess = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_sess").over(w))
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events")
    )


SQL_SESSIONIZATION = """
WITH g AS (
  SELECT user_id, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# documents: dedup + text analysis
# ---------------------------------------------------------------------------
def q_doc_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup per-source stats PLUS the benchmark-contamination
    family (r5): every 41st document stands in as the held-out eval set,
    `contamination_overlap` counts 3-gram hash overlap per doc (ONE
    broadcast equi-join — no all-pairs text comparison), and the
    per-source averages broadcast-join back onto the dedup row."""
    from .operators.text import contamination_overlap

    docs = _table(spark, sf_dir, "documents")
    base = exact_dedup_stats(docs, "text", by=["source"])
    bench = docs.filter(F.col("doc_id") % 41 == 0).select("text")
    cont = (
        contamination_overlap(docs, bench, n=3, carry=("source",))
        .groupBy("source")
        .agg(
            # integer micro-unit average (see q_doc_token_stats): exact
            # summation + integer-scale rounding keeps both engines'
            # half-boundary behavior identical
            (
                F.round(
                    F.sum(
                        F.round(F.col("contaminated_frac") * 1e6, 0).cast(
                            "long"
                        )
                    )
                    / F.count("*"),
                    0,
                )
                / F.lit(1e6)
            ).alias("avg_contaminated_frac"),
            F.sum(
                (F.col("contaminated_frac") >= 0.5).cast("long")
            ).alias("n_contaminated_docs"),
        )
    )
    return base.join(F.broadcast(cont), "source", "left")


SQL_DOC_DEDUP_STATS = r"""
WITH base AS (
  SELECT source,
         count(*) AS n_docs,
         count(DISTINCT coalesce(md5(text), '<null-text>')) AS n_distinct,
         count(*) - count(DISTINCT coalesce(md5(text), '<null-text>')) AS n_dupes
  FROM documents GROUP BY 1
),
tk AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
-- per-doc DISTINCT 3-grams (the operator array_distincts before explode)
g AS (
  SELECT doc_id, source,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               FOR i IN range(1, len(t) - 1)])) AS g
  FROM tk WHERE len(t) >= 3
),
bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 41 = 0),
pd AS (
  SELECT d.doc_id, d.source,
         coalesce(x.n_grams, 0) AS n_grams,
         coalesce(x.n_overlap, 0) AS n_overlap
  FROM documents d
  LEFT JOIN (
    SELECT g.doc_id, count(*) AS n_grams,
           sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
    FROM g LEFT JOIN bg ON g.g = bg.g GROUP BY 1
  ) x USING (doc_id)
),
fr AS (
  SELECT source,
         CASE WHEN n_grams > 0
              THEN round(n_overlap * 1.0 / n_grams, 6) ELSE 0.0 END AS f
  FROM pd
),
cont AS (
  SELECT source,
         round(sum(CAST(round(f * 1000000) AS BIGINT)) * 1.0
               / count(*)) / 1000000.0 AS avg_contaminated_frac,
         CAST(sum(CASE WHEN f >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated_docs
  FROM fr GROUP BY 1
)
SELECT base.*, cont.avg_contaminated_frac, cont.n_contaminated_docs
FROM base LEFT JOIN cont USING (source)
"""


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token/quality summary PLUS the punct/stopword quality
    signals (r4 verdict #1: doc_quality_detail folded in, one row of the
    driver artifact carries both operator families) — all JVM Column
    math, one scan, one shuffle. r5: the Gopher-style repetition family
    joins the row — avg fraction of characters covered by each doc's most
    frequent word 2-gram (`top_ngram_stats`), per-lang aggregated and
    broadcast-joined back (a 5-row dim join, no extra fact shuffle)."""
    from .operators.text import (
        punct_ratio_col,
        quality_score_col,
        stopword_ratio_col,
        token_count_col,
        top_ngram_stats,
    )

    docs = _table(spark, sf_dir, "documents")
    t = F.col("text")
    base = (
        docs.withColumn("_tokens", token_count_col(t))
        .withColumn("_quality", quality_score_col(t))
        .withColumn("_p", punct_ratio_col(t))
        .withColumn("_s", stopword_ratio_col(t))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_tokens").alias("total_tokens"),
            F.round(F.avg("_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg("_quality"), 6).alias("avg_quality"),
            F.round(F.avg("_p"), 6).alias("avg_punct_ratio"),
            F.round(F.avg("_s"), 6).alias("avg_stopword_ratio"),
        )
    )
    rep = (
        top_ngram_stats(docs, "text", "doc_id", n=2, carry=("lang",))
        .groupBy("lang")
        .agg(
            # integer micro-unit average: per-doc fracs are 6-dp, so
            # sum them as exact micro integers and round the quotient at
            # INTEGER scale — a .5 quotient is exactly representable
            # there, so Spark's BigDecimal HALF_UP and DuckDB's
            # scale-multiply rounding agree (at 1e-6 scale they diverge
            # on boundary values; observed on this very column)
            (
                F.round(
                    F.sum(
                        F.round(F.col("top_ngram_char_frac") * 1e6, 0).cast(
                            "long"
                        )
                    )
                    / F.count("*"),
                    0,
                )
                / F.lit(1e6)
            ).alias("avg_top2gram_frac")
        )
    )
    return base.join(F.broadcast(rep), "lang", "left")


def _sql_doc_token_stats() -> str:
    words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS["en"]))
    return rf"""
WITH docs0 AS (
  -- NULL text behaves as '' (Spark token/quality/stopword cols coalesce)
  SELECT lang, doc_id, coalesce(text, '') AS text FROM documents
),
t AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS tokens,
         length(text) AS chars,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(text,
                    '[.,;:!?''"()\[\]{{}}<>/\\|@#$%^&*_+=~`-]', '', 'g')))
                   * 1.0 / length(text)
              ELSE 0.0 END AS p,
         CASE WHEN trim(lower(text)) = '' THEN 0.0
              ELSE len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                   x -> list_contains([{words}], x)))
                   * 1.0 / len(string_split_regex(trim(lower(text)), '\s+'))
         END AS s
  FROM docs0
),
base AS (
  SELECT lang,
         count(*) AS n_docs,
         CAST(sum(tokens) AS BIGINT) AS total_tokens,
         round(avg(tokens), 4) AS avg_tokens,
         round(avg(round(least(1.0, tokens / 50.0) *
               (CASE WHEN tokens > 0 AND chars * 1.0 / tokens BETWEEN 3 AND 10
                     THEN 1.0 ELSE 0.5 END), 6)), 6) AS avg_quality,
         round(avg(p), 6) AS avg_punct_ratio,
         round(avg(s), 6) AS avg_stopword_ratio
  FROM t GROUP BY 1
),
-- Gopher repetition: per-doc most-frequent 2-gram (count desc, gram asc)
-- and the fraction of characters it covers
tg AS (
  SELECT lang, doc_id, length(text) AS chars,
         unnest([array_to_string(toks2[i:i+1], ' ')
                 FOR i IN range(1, len(toks2))]) AS g
  FROM (SELECT lang, doc_id, text,
               string_split_regex(trim(lower(text)), '\s+') AS toks2
        FROM docs0 WHERE trim(text) <> '') d
  WHERE len(toks2) >= 2
),
tc AS (
  SELECT lang, doc_id, chars, g, count(*) AS c FROM tg GROUP BY 1, 2, 3, 4
),
best AS (
  SELECT lang, doc_id,
         round(c * length(g) * 1.0 / chars, 6) AS frac,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
  FROM tc
),
rep AS (
  -- averaged over ALL docs per lang: the Spark side RETAINS short/empty
  -- docs as zero-fraction rows (r5 retention contract), so the oracle
  -- must count them in the denominator too
  SELECT d.lang,
         round(sum(CAST(round(coalesce(b.frac, 0) * 1000000) AS BIGINT)) * 1.0
               / count(*)) / 1000000.0 AS avg_top2gram_frac
  FROM docs0 d
  LEFT JOIN (SELECT doc_id, frac FROM best WHERE rn = 1) b
         ON b.doc_id = d.doc_id
  GROUP BY 1
)
SELECT base.*, rep.avg_top2gram_frac
FROM base LEFT JOIN rep USING (lang)
"""


SQL_DOC_TOKEN_STATS = _sql_doc_token_stats()


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------
def _queries_from_embeddings(spark: SparkSession, sf_dir: str, n: int = 5):
    emb = _table(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < n).select("vec_id", "embedding").collect()
    return emb.filter(F.col("vec_id") >= n), [
        (int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows
    ]


def _tagged_union_sql(inner: str, methods: list[str]) -> str:
    """Oracle for a method-tagged union query: the SAME inner SQL once per
    method literal (the engine paths must agree exactly, so one oracle
    serves every tag — r4 verdict #1, fitting queries() under the
    driver's 50-row artifact cap without losing per-operator evidence)."""
    return "\nUNION ALL\n".join(
        f"SELECT '{m}' AS method, * FROM ({inner})" for m in methods
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k UNION the IVF path (method-tagged;
    r4 verdict #1 merge of ann_cosine_topk + ann_cosine_topk_ivf): with
    ``nprobe = n_clusters`` every cluster is probed, so IVF must EQUAL
    the exact top-k and one brute-force oracle serves both tags. The
    probed-cluster IN-list still reaches the at-rest scan as
    PartitionFilters (explain_audit REQUIRE) — the fragment that makes
    nprobe < n_clusters skip untouched directories at scale."""
    from .operators.similarity import cosine_topk_ivf

    cands, qs = _queries_from_embeddings(spark, sf_dir)
    exact = cosine_topk(cands, qs, k=5).select(
        F.lit("exact").alias("method"), "query_id", "rank", "neighbor_id"
    )
    path, cents = _ivf_index_path(spark, sf_dir)
    ckey = f"ivf-index-{spark.sparkContext.applicationId}-{path}"
    if ckey not in _CACHE:
        _CACHE[ckey] = spark.read.parquet(path)
    ivf = cosine_topk_ivf(
        spark, path, cents, qs, k=5, nprobe=_IVF_CLUSTERS, index_df=_CACHE[ckey]
    ).select(F.lit("ivf").alias("method"), "query_id", "rank", "neighbor_id")
    return exact.unionByName(ivf)


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
     c AS (SELECT vec_id AS neighbor_id, embedding FROM embeddings WHERE vec_id >= 5),
     qe AS (SELECT query_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i FROM q),
     ce AS (SELECT neighbor_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i FROM c),
     qn AS (SELECT query_id, sqrt(sum(x * x)) AS nrm FROM qe GROUP BY 1),
     cn AS (SELECT neighbor_id, sqrt(sum(x * x)) AS nrm FROM ce GROUP BY 1),
     dots AS (
       SELECT qe.query_id, ce.neighbor_id, sum(qe.x * ce.x) AS dot
       FROM qe JOIN ce ON qe.i = ce.i
       GROUP BY 1, 2
     ),
     sims AS (
       SELECT d.query_id, d.neighbor_id,
              round(d.dot / (qn.nrm * cn.nrm), 6) AS sim
       FROM dots d JOIN qn ON d.query_id = qn.query_id
                   JOIN cn ON d.neighbor_id = cn.neighbor_id
     ),
     ranked AS (
       SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rank
       FROM sims
     )
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# assembly / validation / reshape operators
# ---------------------------------------------------------------------------
def q_crop_bbox_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .geometry import Bbox
    from .operators.merge import crop

    pts = _points(spark, sf_dir)
    return crop(pts, Bbox(102.0, 12.0, 106.0, 16.0)).groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("sum_value")
    )


SQL_CROP_BBOX_COUNT = f"""
{_POINTS_CTE}
SELECT event_type, count(*) AS n, round(sum(value), 3) AS sum_value
FROM points
WHERE lon BETWEEN 102.0 AND 106.0 AND lat BETWEEN 12.0 AND 16.0
GROUP BY 1
"""


def q_lon_normalize_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: push a third of the points into 0..360-style longitudes (+360),
    normalize back to [-180, 180), histogram per integer band — verifies
    wraparound AND idempotence against plain SQL arithmetic."""
    from .operators.merge import normalize_longitudes

    pts = _points(spark, sf_dir).withColumn(
        "lon",
        F.when(F.col("event_id") % 3 == 0, F.col("lon") + 360.0).otherwise(
            F.col("lon")
        ),
    )
    norm = normalize_longitudes(pts)
    return norm.groupBy(F.floor("lon").alias("lon_band")).agg(
        F.count("*").alias("n"), F.round(F.avg("lon"), 6).alias("mean_lon")
    )


SQL_LON_NORMALIZE_HIST = f"""
{_POINTS_CTE},
shifted AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN lon + 360.0 ELSE lon END AS lon
  FROM points
)
SELECT CAST(floor(((lon + 180.0) % 360.0) - 180.0) AS BIGINT) AS lon_band,
       count(*) AS n,
       round(avg(((lon + 180.0) % 360.0) - 180.0), 6) AS mean_lon
FROM shifted GROUP BY 1
"""


def q_validate_per_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.validate import per_slice_stats

    ev = _table(spark, sf_dir, "events")
    out = per_slice_stats(ev, ["event_type"], "value")
    return out.select(
        "event_type", "n", F.col("nna").cast("long").alias("nna"),
        "mean", "min", "max",
    )


SQL_VALIDATE_PER_SLICE = """
SELECT event_type,
       count(value) AS n,
       CAST(sum(CASE WHEN value IS NULL OR isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS nna,
       round(avg(value), 6) AS mean,
       min(value) AS min,
       max(value) AS max
FROM events GROUP BY 1
"""


def q_durations_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.reshape import durations

    ev = _table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("time")
    )
    out = durations(ev, "time", n_months=6)
    return out.select(
        F.col("time").cast("date").alias("month_start"),
        F.col("month").cast("int").alias("month"),
        F.col("days").cast("int").alias("days"),
    )


SQL_DURATIONS_MATRIX = """
WITH starts AS (SELECT DISTINCT CAST(date_trunc('month', ts) AS DATE) AS month_start
                FROM events),
     m AS (SELECT unnest(generate_series(1, 6)) AS month)
SELECT s.month_start,
       CAST(m.month AS INT) AS month,
       CAST(date_diff('day',
                      s.month_start + (m.month - 1) * INTERVAL 1 MONTH,
                      s.month_start + m.month * INTERVAL 1 MONTH) AS INT) AS days
FROM starts s CROSS JOIN m
"""


def q_top3_per_admin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    assigned = _assigned(spark, sf_dir)
    w = W.partitionBy("admin_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("admin_id", F.col("rk").cast("int").alias("rk"), "event_id", "value")
    )


SQL_TOP3_PER_ADMIN = f"""
{_POINTS_CTE}
SELECT admin_id, CAST(rk AS INT) AS rk, event_id, value FROM (
  SELECT {ADMIN_ID_SQL} AS admin_id, event_id, value,
         row_number() OVER (PARTITION BY {ADMIN_ID_SQL}
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM points
) WHERE rk <= 3
"""


def q_knn_admin_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: 3 nearest admin centroids per point via cell-ring expansion."""
    from .operators.knn import admin_centroids, knn_join

    pts = _points(spark, sf_dir).select("event_id", "lon", "lat")
    cents = admin_centroids(admins_df(spark))
    # assume_small=True: the admin table is a known-small dimension (100
    # rows here, ~47k GADM-2 worldwide) — explicit, so plan construction
    # stays job-free
    return knn_join(
        pts, cents, QUERY_GRID, k=3, id_cols=["event_id"], assume_small=True
    ).select("event_id", "rk", "admin_id")


SQL_KNN_ADMIN_CENTROIDS = f"""
{_POINTS_CTE},
cents AS (
  SELECT printf('ADM2-%02d', a) AS admin_id,
         100.5 + (a % 10) AS clon,
         10.5 + (a // 10) AS clat
  FROM (SELECT CAST(unnest(generate_series(0, 99)) AS INT) AS a)
),
d AS (
  SELECT p.event_id, c.admin_id,
         2.0 * 6371.0088 * asin(sqrt(
           pow(sin(radians(c.clat - p.lat) / 2), 2)
           + cos(radians(p.lat)) * cos(radians(c.clat))
             * pow(sin(radians(c.clon - p.lon) / 2), 2)
         )) AS dist_km
  FROM points p CROSS JOIN cents c
)
SELECT event_id, CAST(rk AS INT) AS rk, admin_id FROM (
  SELECT event_id, admin_id,
         row_number() OVER (PARTITION BY event_id ORDER BY dist_km, admin_id) AS rk
  FROM d
) WHERE rk <= 3
"""


def q_images_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode path, per-image VALUE oracle (r4 verdict #5 —
    this was the last rows-only query): decode binary payloads in Arrow
    batches and emit each image's gray mean + pixel count + phash check.
    The DuckDB oracle joins the independently-synthesized ground-truth
    stats (image_truth fixture, computed from the raw pixels with NO
    encode->decode round trip), so a broken decoder hash-mismatches.
    Lossless formats (png, raw) must reproduce the truth means bit-for-
    bit and pass the phash check on every row; the lossy 'qnt' format is
    NULLed in both oracle-checked columns (quantization legitimately
    shifts the mean and flips ~14 % of phashes — its decoder is pinned by
    the pixel-exact pytest oracle in tests/test_images.py instead)."""
    from .operators.multimodal import decode_stats

    imgs = _spread_scan(
        _images(spark).filter(F.col("image_id") < f"img{2000:012d}")
    )
    lossless = F.col("fmt") != "qnt"
    return decode_stats(imgs).select(
        "image_id",
        "fmt",
        F.when(lossless, F.round("mean_px", 6)).otherwise(F.lit(-1.0)).alias("mean_px"),
        (F.col("w") * F.col("h")).cast("bigint").alias("n_px"),
        F.when(lossless, F.col("phash_check").cast("int"))
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("phash_ok"),
    )


SQL_IMAGES_DECODE_STATS = """
SELECT i.image_id, i.fmt,
       CASE WHEN i.fmt <> 'qnt' THEN round(t.mean_px, 6) ELSE -1.0 END AS mean_px,
       CAST(t.n_px AS BIGINT) AS n_px,
       CAST(CASE WHEN i.fmt <> 'qnt' THEN 1 ELSE -1 END AS INT) AS phash_ok
FROM read_parquet('{images_path}') i
JOIN read_parquet('{truth_path}') t USING (image_id)
WHERE i.image_id < 'img{n:012d}'
"""


def q_raster_zonal_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-weighted raster zonal stats over the synthetic hourly
    raster. Oracle: the 0.25-degree cells align with the 1-degree admin
    rectangles, so coverage is exactly 1.0 and the whole computation
    (admin = floor arithmetic on the cell, weight = spherical cell area,
    count = coverage-weight sum) is closed-form SQL."""
    from .operators.zonal import raster_zonal_stats
    from .synth import grid_pixels_table

    grid = Grid(x0=100.0, dx=0.25, nx=65, y0=10.0, dy=0.25, ny=33)
    cover, _, _ = _engine_raster(spark, grid)
    px = grid_pixels_table(spark, hours=24).filter("var = 't2m'")
    out = raster_zonal_stats(
        px, cover, grid, ops=["count", "weighted_mean"], by_dims=["time"]
    )
    return out.select(
        "admin_id",
        "time",
        F.round("count", 3).alias("count"),
        F.round("weighted_mean", 6).alias("weighted_mean"),
    )


def _sql_raster_zonal_weighted_mean() -> str:
    import math

    from .grids import EARTH_RADIUS_KM

    area_k = EARTH_RADIUS_KM**2 * math.radians(0.25)
    return f"""
WITH px AS (
  SELECT ix, iy, ih,
         CASE WHEN (ix * 7 + iy * 13) % 23 = 0 THEN NULL
              ELSE 280.0 + sin((100.0 + ix * 0.25) / 10) * 5
                   + cos((10.0 + iy * 0.25) / 10) * 3 + (ih % 24) * 0.1
         END AS value,
         TIMESTAMP '2019-01-01 00:00:00' + ih * INTERVAL 1 HOUR AS time
  FROM (SELECT unnest(generate_series(0, 64)) AS ix),
       (SELECT unnest(generate_series(0, 32)) AS iy),
       (SELECT unnest(generate_series(0, 23)) AS ih)
),
w AS (
  SELECT printf('ADM2-%02d', (iy // 4) * 10 + (ix // 4)) AS admin_id, time, value,
         {area_k!r} * (sin(radians(10.0 + (iy + 1) * 0.25))
                       - sin(radians(10.0 + iy * 0.25))) AS wgt
  FROM px WHERE ix < 40 AND value IS NOT NULL
)
SELECT admin_id, time,
       round(sum(wgt), 3) AS count,
       round(sum(value * wgt) / sum(wgt), 6) AS weighted_mean
FROM w GROUP BY 1, 2
"""


SQL_RASTER_ZONAL_WEIGHTED_MEAN = _sql_raster_zonal_weighted_mean()


def _engine_raster(spark: SparkSession, grid: Grid):
    key = f"raster-{spark.sparkContext.applicationId}-{grid.nx}x{grid.ny}"
    if key not in _CACHE:
        admins = admins_df(spark)
        cover = build_cover(admins, grid, supersample=8).cache()
        cover.count()
        _CACHE[key] = (cover, None, None)
    return _CACHE[key]


def q_resample_bilinear_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-bilinear regrid of the synthetic raster to a finer grid, then
    per-variable summary. Oracle: both grids are closed-form, so the 4-corner
    weights, the coastline NaN mask and the num/den renormalization are all
    replicated as plain SQL arithmetic."""
    from .operators.resample import resample_sparse_bilinear
    from .synth import grid_pixels_table

    src = Grid(x0=100.0, dx=0.25, nx=65, y0=10.0, dy=0.25, ny=33)
    tgt = Grid(x0=100.5, dx=0.1, nx=120, y0=10.5, dy=0.1, ny=60)
    px = grid_pixels_table(spark, hours=2)
    out = resample_sparse_bilinear(px, src, tgt, dims=["var", "time"])
    return out.groupBy("var").agg(
        F.count("*").alias("n_pixels"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_na"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    )


SQL_RESAMPLE_BILINEAR_SUMMARY = """
WITH tgt AS (
  SELECT (100.5 + (tix + 0.5) * 0.1 - 100.125) / 0.25 AS fx,
         (10.5 + (tiy + 0.5) * 0.1 - 10.125) / 0.25 AS fy
  FROM (SELECT unnest(generate_series(0, 119)) AS tix),
       (SELECT unnest(generate_series(0, 59)) AS tiy)
),
refs AS (
  SELECT fx, fy, corner,
         greatest(0, least(64, CAST(floor(fx) AS BIGINT) + (corner % 2))) AS sx,
         greatest(0, least(32, CAST(floor(fy) AS BIGINT) + (corner // 2))) AS sy,
         (CASE WHEN corner % 2 = 0 THEN 1 - (fx - floor(fx)) ELSE fx - floor(fx) END)
       * (CASE WHEN corner // 2 = 0 THEN 1 - (fy - floor(fy)) ELSE fy - floor(fy) END)
         AS w
  FROM tgt, (SELECT unnest(generate_series(0, 3)) AS corner)
),
src AS (
  SELECT iy * 65 + ix AS scell, var, ih,
         CASE WHEN (ix * 7 + iy * 13) % 23 = 0 THEN NULL
              WHEN var = 't2m'
              THEN 280.0 + sin((100.0 + ix * 0.25) / 10) * 5
                   + cos((10.0 + iy * 0.25) / 10) * 3 + (ih % 24) * 0.1
              ELSE greatest(0.0,
                   sin((100.0 + ix * 0.25) + (10.0 + iy * 0.25) + ih / 7.0) * 2.0)
         END AS value
  FROM (SELECT unnest(generate_series(0, 64)) AS ix),
       (SELECT unnest(generate_series(0, 32)) AS iy),
       (SELECT unnest(generate_series(0, 1)) AS ih),
       (SELECT unnest(['t2m', 'tp']) AS var)
),
agg AS (
  SELECT r.fx, r.fy, s.var, s.ih,
         sum(coalesce(s.value, 0.0) * r.w) AS num,
         sum(CASE WHEN s.value IS NOT NULL THEN r.w ELSE 0.0 END) AS den,
         sum(r.w) AS wtot
  FROM (SELECT * FROM refs WHERE w > 0) r
  JOIN src s ON s.scell = r.sy * 65 + r.sx
  GROUP BY 1, 2, 3, 4
),
vals AS (
  SELECT var, CASE WHEN den / wtot > 1e-06 THEN num / den END AS value FROM agg
)
SELECT var, count(*) AS n_pixels,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_na,
       round(avg(value), 6) AS mean_value
FROM vals GROUP BY 1
"""


def q_resample_idw_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 remapdis analog: inverse-distance-weighted mean of the k=4
    nearest non-null source cells per target pixel, found by k-ring
    expansion. Oracle: both grids and the synthetic field are closed-form,
    so DuckDB replicates the candidate ring, the NaN coastline mask, the
    (dist2, cell-id) ranking and the 1/sqrt(d) weighting exactly.

    Target offsets are deliberately INCOMMENSURATE with the source step
    (0.523/0.481 vs 0.25): a half-step-aligned target center is
    equidistant from two sources in real arithmetic, and then the
    k-th-neighbor choice hinges on sub-ulp pow() differences between
    engines. This grid was checked to have zero exact ties and a minimum
    candidate-distance gap of 5e-15 — ~15x above cross-implementation
    float noise, so the ranking is engine-independent."""
    from .operators.resample import resample_distance
    from .synth import grid_pixels_table

    src = Grid(x0=100.0, dx=0.25, nx=65, y0=10.0, dy=0.25, ny=33)
    tgt = Grid(x0=100.309, dx=0.523, nx=17, y0=10.271, dy=0.481, ny=9)
    px = grid_pixels_table(spark, hours=1).filter("var = 't2m'")
    out = resample_distance(px, src, tgt, k=4, ring=2)
    return out.select(
        F.round("lon", 6).alias("lon"),
        F.round("lat", 6).alias("lat"),
        F.round("value", 6).alias("value"),
    )


SQL_RESAMPLE_IDW_SUMMARY = """
WITH tgt AS (
  SELECT tix, tiy,
         100.309 + (tix + 0.5) * 0.523 AS tlon,
         10.271 + (tiy + 0.5) * 0.481 AS tlat
  FROM (SELECT unnest(generate_series(0, 16)) AS tix),
       (SELECT unnest(generate_series(0, 8)) AS tiy)
),
src AS (
  SELECT iy * 65 + ix AS scell, ix, iy,
         CASE WHEN (ix * 7 + iy * 13) % 23 = 0 THEN NULL
              ELSE 280.0 + sin((100.0 + ix * 0.25) / 10) * 5
                   + cos((10.0 + iy * 0.25) / 10) * 3 + 0.0
         END AS value
  FROM (SELECT unnest(generate_series(0, 64)) AS ix),
       (SELECT unnest(generate_series(0, 32)) AS iy)
),
cand AS (
  SELECT t.tix, t.tiy, t.tlon, t.tlat,
         CAST(floor((t.tlon - 100.125) / 0.25 + 0.5) AS BIGINT) + o.ox AS sx,
         CAST(floor((t.tlat - 10.125) / 0.25 + 0.5) AS BIGINT) + o.oy AS sy
  FROM tgt t,
       (SELECT a.v AS ox, b.v AS oy
        FROM (SELECT unnest(generate_series(-2, 2)) AS v) a,
             (SELECT unnest(generate_series(-2, 2)) AS v) b) o
),
j AS (
  SELECT c.tix, c.tiy, c.tlon, c.tlat, s.scell, s.value,
         pow(c.tlon - (100.125 + c.sx * 0.25), 2)
       + pow(c.tlat - (10.125 + c.sy * 0.25), 2) AS dist2
  FROM cand c
  JOIN src s ON s.scell = c.sy * 65 + c.sx
  WHERE c.sx BETWEEN 0 AND 64 AND c.sy BETWEEN 0 AND 32
    AND s.value IS NOT NULL
),
k AS (
  SELECT *, row_number() OVER (PARTITION BY tix, tiy
                               ORDER BY dist2, scell) AS rn
  FROM j
)
SELECT round(tlon, 6) AS lon, round(tlat, 6) AS lat,
       round(sum(value / sqrt(dist2 + 1e-30))
             / sum(1.0 / sqrt(dist2 + 1e-30)), 6) AS value
FROM k WHERE rn <= 4
GROUP BY tix, tiy, tlon, tlat
"""


def q_rolling_weekly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 rolling warm-up window: rolling(4)-week mean of weekly event
    counts per event type (the reference's rolling weekly reduce) —
    4 weekly points including the current week, pandas ``rolling(4)``
    convention (ADVICE r3: the old bound included 5 points)."""
    from .operators.timeagg import rolling_weekly, week_start_col

    ev = _table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", week_start_col(F.to_date("ts")).alias("week_start")
    ).agg(F.count("*").alias("n"))
    out = rolling_weekly(weekly, window=4, how="mean", value_col="n",
                         keys=["event_type"])
    return out.select(
        "event_type",
        F.col("week_start").cast("string").alias("week_start"),
        "n",
        F.round("rolling_mean", 6).alias("rolling_mean_n"),
    )


SQL_ROLLING_WEEKLY_EVENTS = """
WITH weekly AS (
  SELECT event_type,
         CAST(ts AS DATE) - CAST(isodow(CAST(ts AS DATE)) - 1 AS INT) AS week_start,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       strftime(week_start, '%Y-%m-%d') AS week_start,
       n,
       round(avg(n) OVER (
         PARTITION BY event_type
         ORDER BY epoch(CAST(week_start AS TIMESTAMP))
         RANGE BETWEEN 1814400 PRECEDING AND CURRENT ROW), 6) AS rolling_mean_n
FROM weekly
"""


def q_asof_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join, r4: every event attaches the event
    count of the most recent COMPLETED hour for its type — counts become
    available at hour end, so the right-side timestamp is hour_start + 1h
    and first-hour events exercise the LEFT-join NULL path. One window
    shuffle, no range join (operators/timeagg.asof_join). Oracle: DuckDB's
    native ASOF LEFT JOIN over the identical hourly CTE."""
    from .operators.timeagg import asof_join

    ev = _table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("_hr"))
        .agg(F.count("*").alias("prev_hr_n"))
        .select(
            "event_type",
            (F.col("_hr") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
            "prev_hr_n",
        )
    )
    out = asof_join(
        ev.select("event_id", "ts", "event_type"), hourly,
        on="ts", by=["event_type"],
    )
    # second precision both sides: DuckDB strftime %S truncates micros
    return out.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_type",
        "prev_hr_n",
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("hour_end"),
    )


SQL_ASOF_EVENT_RATES = """
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS hts,
         count(*) AS prev_hr_n
  FROM events GROUP BY 1, date_trunc('hour', ts)
)
SELECT e.event_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts, e.event_type,
       h.prev_hr_n, strftime(h.hts, '%Y-%m-%d %H:%M:%S') AS hour_end
FROM events e ASOF LEFT JOIN hourly h
  ON e.event_type = h.event_type AND e.ts >= h.hts
"""


def q_interval_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join, r4: 24 deterministic one-hour promo
    windows per event type, every event joined to the windows containing
    it via the BUCKETED equi-join (operators/timeagg.interval_join — a
    bare range condition would plan as a nested loop). Oracle: DuckDB's
    plain inequality join over identical generated windows."""
    from .operators.timeagg import interval_join

    ev = _table(spark, sf_dir, "events")
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    wins = (
        ev.select("event_type").distinct()
        .withColumn("win_id", F.explode(F.sequence(F.lit(0), F.lit(23))))
        .select(
            "event_type",
            "win_id",
            (t0 + F.make_interval(secs=F.col("win_id") * 9000)).alias("ws"),
            (t0 + F.make_interval(secs=F.col("win_id") * 9000 + 3600)).alias("we"),
        )
    )
    j = interval_join(
        ev.select("ts", "event_type", "value"), wins,
        ts_col="ts", start_col="ws", end_col="we", by=["event_type"],
        bucket_seconds=3600,
    )
    return j.groupBy("event_type", "win_id").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    )


SQL_INTERVAL_EVENT_COUNTS = """
WITH wins AS (
  SELECT t.event_type, k.k AS win_id,
         TIMESTAMP '2024-01-01 00:00:00' + k.k * 9000 * INTERVAL 1 SECOND AS ws,
         TIMESTAMP '2024-01-01 00:00:00' + (k.k * 9000 + 3600) * INTERVAL 1 SECOND AS we
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(0, 23)) AS k) k
)
SELECT w.event_type, w.win_id, count(*) AS n, round(avg(e.value), 6) AS mean_value
FROM events e JOIN wins w
  ON e.event_type = w.event_type AND e.ts >= w.ws AND e.ts < w.we
GROUP BY 1, 2
"""


def q_month_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/I3 pre-commit gate: per-month last observed date + completeness
    (a month is complete when its max date is the month's last day — the
    open trailing month must come back incomplete)."""
    from .operators.timeagg import month_completeness

    ev = _table(spark, sf_dir, "events")
    out = month_completeness(ev, time_col="ts")
    return out.select(
        "year", "month",
        F.col("last_date").cast("string").alias("last_date"),
        "complete",
    )


SQL_MONTH_COMPLETENESS = """
SELECT CAST(year(ts) AS INT) AS year,
       CAST(month(ts) AS INT) AS month,
       strftime(max(CAST(ts AS DATE)), '%Y-%m-%d') AS last_date,
       max(CAST(ts AS DATE)) = last_day(max(CAST(ts AS DATE))) AS complete
FROM events GROUP BY 1, 2
"""


def q_concat_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 concat + lineage combination: two overlapping event frames with
    different job configs concatenate; the lineage column becomes the
    ordered-distinct newline-join (INPUT order, not collection order —
    flipping the order would flip the string and fail the hash)."""
    from .operators.merge import concat_with_lineage

    ev = _table(spark, sf_dir, "events")
    a = ev.filter("event_id % 2 = 0").withColumn("geoglue_config", F.lit("cfg=a"))
    b = ev.withColumn("geoglue_config", F.lit("cfg=b"))
    out = concat_with_lineage([a, b], lineage_col="geoglue_config")
    return out.groupBy("geoglue_config").agg(
        F.count("*").alias("n"),
        F.count_distinct("event_id").alias("n_ids"),
    )


SQL_CONCAT_LINEAGE = """
SELECT 'cfg=a' || chr(10) || 'cfg=b' AS geoglue_config,
       (SELECT count(*) FROM events WHERE event_id % 2 = 0)
         + (SELECT count(*) FROM events) AS n,
       (SELECT count(DISTINCT event_id) FROM events) AS n_ids
"""


def q_raster_na_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9 global-sum + NA-fraction stats over the synthetic raster: the
    NaN 'coastline' mask is closed-form ((ix*7 + iy*13) % 23 == 0), so the
    oracle recomputes counts, fraction, and the non-NA global sum exactly
    — the same expressions validate.na_fraction / summary gates use."""
    from .synth import grid_pixels_table

    px = grid_pixels_table(spark, hours=2)
    v = F.col("value")
    is_na = v.isNull() | F.isnan(v)
    return px.groupBy("var").agg(
        F.count("*").alias("n"),
        F.sum(F.when(is_na, 1).otherwise(0)).alias("n_na"),
        F.round(F.sum(F.when(is_na, 1).otherwise(0)) / F.count("*"), 6).alias(
            "na_frac"
        ),
        F.round(F.sum(F.when(~is_na, v)), 3).alias("sum_value"),
    )


SQL_RASTER_NA_SUMMARY = """
WITH src AS (
  SELECT var, ih,
         CASE WHEN (ix * 7 + iy * 13) % 23 = 0 THEN NULL
              WHEN var = 't2m'
              THEN 280.0 + sin((100.0 + ix * 0.25) / 10) * 5
                   + cos((10.0 + iy * 0.25) / 10) * 3 + (ih % 24) * 0.1
              ELSE greatest(0.0,
                   sin((100.0 + ix * 0.25) + (10.0 + iy * 0.25) + ih / 7.0) * 2.0)
         END AS value
  FROM (SELECT unnest(generate_series(0, 64)) AS ix),
       (SELECT unnest(generate_series(0, 32)) AS iy),
       (SELECT unnest(generate_series(0, 1)) AS ih),
       (SELECT unnest(['t2m', 'tp']) AS var)
)
SELECT var, count(*) AS n,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_na,
       round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS na_frac,
       round(sum(value), 3) AS sum_value
FROM src GROUP BY 1
"""


def q_multi_file_archive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file DatasetPool scan (r4; reference cds.py:680-757): a
    three-month netCDF archive read through api.raster_from_file's GLOB
    dispatch — one executor-parsed mapInPandas scan over the path list —
    partition-stamped from the filename convention JVM-side, then
    per-partition aggregates. The fixture values are a closed dyadic form,
    so the oracle recomputes the whole multi-file scan exactly."""
    from .api import raster_from_file
    from .sources.pool import pool_partition_col
    from .synth import era5_archive_fixture

    px = raster_from_file(spark, era5_archive_fixture(), var="t2m")
    return (
        px.withColumn("part", pool_partition_col())
        .groupBy("part")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("time").alias("n_hours"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


SQL_MULTI_FILE_ARCHIVE_STATS = """
WITH months(part, h0, nh) AS (
  VALUES ('2019-01', 0, 72), ('2019-02', 744, 72), ('2019-03', 1416, 36)
),
hs AS (SELECT unnest(generate_series(0, 71)) AS h),
ixs AS (SELECT unnest(generate_series(0, 19)) AS ix),
iys AS (SELECT unnest(generate_series(0, 9)) AS iy),
src AS (
  SELECT part, h0 + h AS g,
         200.0 + ix * 0.5 + iy * 0.25 + (h0 + h) * 0.125 AS value
  FROM months, hs, ixs, iys WHERE h < nh
)
SELECT part, count(*) AS n, count(DISTINCT g) AS n_hours,
       round(sum(value), 6) AS sum_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM src GROUP BY part
"""


def q_validate_value_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 value-range gate expressions as a summary: out-of-range counts
    per event type (the aggregation check_value_range raises on)."""
    ev = _table(spark, sf_dir, "events")
    lo, hi = 10.0, 90.0
    oob = (F.col("value") < lo) | (F.col("value") > hi)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(oob, 1).otherwise(0)).alias("n_oob"),
    )


SQL_VALIDATE_VALUE_RANGE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN value < 10.0 OR value > 90.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oob
FROM events GROUP BY 1
"""


_WF_K, _WF_W = 5, 4


def q_winnow_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints per document, summarized per
    source: docs, mean fingerprints/doc, distinct fingerprints."""
    from .operators.text import winnow_fingerprints

    docs = _table(spark, sf_dir, "documents")
    # grouped=False + carry (r4): one row per (doc, fingerprint) with
    # source carried through — drops the collect_set shuffle, the re-join
    # against documents, and the array re-explode from the plan.
    # distinct=False (r5): the final aggregate's count_distincts dedup
    # map-side under Expand, so the eager pre-distinct was a second
    # full-width shuffle for nothing — the whole query is now ONE
    # doc-keyed window shuffle plus one source-keyed agg.
    fp = winnow_fingerprints(
        docs, "text", "doc_id", _WF_K, _WF_W, out_col="_f",
        grouped=False, carry=("source",), distinct=False,
    )
    # Two-level distinct (r5): a direct count_distinct keyed by `source`
    # (20 values) funnels every expanded row into ONE final task — the
    # per-(source, fingerprint) aggregate is keyed high-cardinality and
    # runs parallel, and the rollup's count/sum partial-aggregate
    # map-side, so the last stage merges partial rows, not data.
    per_fp = fp.groupBy("source", "_f").agg(
        F.count_distinct("doc_id").alias("_nd")
    )
    return per_fp.groupBy("source").agg(
        F.count("*").alias("n_distinct_fp"),
        F.round(F.sum("_nd") / F.count("*"), 6).alias("fp_reuse_ratio"),
    )


SQL_WINNOW_FINGERPRINT_STATS = f"""
WITH t AS (
  SELECT source, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
g AS (
  SELECT source,
         CASE WHEN len(toks) < {_WF_K} THEN [array_to_string(toks, ' ')]
              ELSE [array_to_string(toks[i:i+{_WF_K - 1}], ' ')
                    FOR i IN range(1, len(toks) - {_WF_K - 2})]
         END AS grams
  FROM t
),
x AS (
  SELECT source,
         [('0x' || substr(md5(g), 1, 15))::BIGINT % 2147483647 FOR g IN grams] AS xs
  FROM g
),
w AS (
  SELECT source,
         list_distinct([list_min(xs[i:i+{_WF_W - 1}])
                        FOR i IN range(1, greatest(2, len(xs) - {_WF_W - 2}))]) AS fp
  FROM x
),
e AS (SELECT source, unnest(fp) AS f FROM w)
SELECT source,
       count(DISTINCT f) AS n_distinct_fp,
       round(count(*) * 1.0 / count(DISTINCT f), 6) AS fp_reuse_ratio
FROM e GROUP BY 1
"""


def q_daily_stats_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 driven by the variable registry: ONE aggregation pass computes
    every daily statistic, the broadcast (var, stat) allow-table unpivots
    to long form (t2m -> mean/min/max, tp -> sum)."""
    from .registry import apply_daily_statistics, default_registry
    from .synth import grid_pixels_table

    px = grid_pixels_table(spark, hours=48)
    out = apply_daily_statistics(px, default_registry(), keys=["lon", "lat"])
    return out.groupBy("var", "stat", "date").agg(
        F.count("*").alias("n_cells"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    )


SQL_DAILY_STATS_REGISTRY = """
WITH px AS (
  SELECT ix, iy, ih, var,
         DATE '2019-01-01' + CAST(ih // 24 AS INT) AS date,
         CASE WHEN (ix * 7 + iy * 13) % 23 = 0 THEN NULL
              WHEN var = 't2m'
              THEN 280.0 + sin((100.0 + ix * 0.25) / 10) * 5
                   + cos((10.0 + iy * 0.25) / 10) * 3 + (ih % 24) * 0.1
              ELSE greatest(0.0,
                   sin((100.0 + ix * 0.25) + (10.0 + iy * 0.25) + ih / 7.0) * 2.0)
         END AS value
  FROM (SELECT unnest(generate_series(0, 64)) AS ix),
       (SELECT unnest(generate_series(0, 32)) AS iy),
       (SELECT unnest(generate_series(0, 47)) AS ih),
       (SELECT unnest(['t2m', 'tp']) AS var)
),
daily AS (
  SELECT date, var, ix, iy,
         avg(value) AS daily_mean, min(value) AS daily_min,
         max(value) AS daily_max, sum(value) AS daily_sum
  FROM px GROUP BY 1, 2, 3, 4
),
long AS (
  SELECT date, var, stat,
         CASE stat WHEN 'daily_mean' THEN daily_mean
                   WHEN 'daily_min' THEN daily_min
                   WHEN 'daily_max' THEN daily_max
                   ELSE daily_sum END AS value
  FROM daily,
       (SELECT unnest(['daily_mean', 'daily_min', 'daily_max', 'daily_sum']) AS stat)
  WHERE (var = 't2m' AND stat IN ('daily_mean', 'daily_min', 'daily_max'))
     OR (var = 'tp' AND stat = 'daily_sum')
)
SELECT var, stat, date, count(*) AS n_cells, round(avg(value), 6) AS mean_value
FROM long GROUP BY 1, 2, 3
"""


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import lang_id_col

    docs = _table(spark, sf_dir, "documents")
    return (
        docs.withColumn("pred_lang", lang_id_col(F.col("text")))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n"))
    )


def _sql_lang_id_counts() -> str:
    """DuckDB restatement of lang_id_udf: per-doc stopword-hit scores per
    language, argmax with first-max tie-break over the sorted language
    list, 'und' when nothing matches."""
    langs = sorted(STOPWORDS)
    score_sel = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
        score_sel.append(
            f"len(list_filter(toks, x -> list_contains([{words}], x))) AS s_{lang}"
        )
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = f"CASE WHEN {best} = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH t AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
),
s AS (
  SELECT {", ".join(score_sel)} FROM t
)
SELECT {case} AS pred_lang, count(*) AS n
FROM s GROUP BY 1
"""


SQL_LANG_ID_COUNTS = _sql_lang_id_counts()



def q_embedding_near_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection. The driver testdata has no true
    near-dups (max pairwise cosine ~0.51), so duplicates of the first 20
    vectors are injected at vec_id+100000 — the detector must recover
    exactly those pairs at cosine 1.0."""
    from .operators.dedup import embedding_near_dupes

    emb = _table(spark, sf_dir, "embeddings")
    # inject via a per-row explode, NOT a self-union: a Union of two scans
    # makes every downstream re-analysis re-run the per-branch resolution
    # checks (driver CPU on each broadcast build / AQE step); the explode
    # keeps the universe a single linear scan
    offsets = F.when(
        F.col("vec_id") < 20, F.lit([0, 100000])
    ).otherwise(F.lit([0]))
    both = emb.select(
        "vec_id", "embedding", "label", F.explode(offsets).alias("_off")
    ).select(
        (F.col("vec_id") + F.col("_off")).alias("vec_id"), "embedding", "label"
    )
    return embedding_near_dupes(both, min_cosine=0.9)


# Brute-force ALL-PAIRS value oracle (r4 upgrade): now that the engine's
# exact-cosine stage is a JVM double fold, DuckDB recomputes every pairwise
# cosine over the same (originals + injected dupes) universe and keeps
# pairs >= 0.9 — verifying the detector against ground truth instead of
# restating the injection construction.
SQL_EMBEDDING_NEAR_DUPES = """
WITH all_v AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 20
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cosine
FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 6) >= 0.9
"""


_MH_N_PERM, _MH_BANDS, _MH_K, _MH_MINJ = 64, 16, 3, 0.2


def q_minhash_near_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _table(spark, sf_dir, "documents")
    out = minhash_near_dupes(
        docs, "text", "doc_id",
        n_perm=_MH_N_PERM, bands=_MH_BANDS, shingle_k=_MH_K, min_jaccard=_MH_MINJ,
    )
    return out.select("id_a", "id_b", F.round("jaccard_est", 6).alias("jaccard_est"))


def _minhash_sql_parts() -> tuple[str, str, str]:
    """Shared DuckDB CTE block (shingles -> md5 keys -> signatures) plus the
    band-candidate condition and the agreement-fraction expression."""
    n_perm, bands, k = _MH_N_PERM, _MH_BANDS, _MH_K
    a, b = _mh_params(n_perm)
    perms = ",\n         ".join(
        f"list_min([({int(a[j])} * x + {int(b[j])}) % 2147483647 FOR x IN xs])"
        for j in range(n_perm)
    )
    rpb = n_perm // bands
    band_conds = "\n    OR ".join(
        f"a.sig[{i * rpb + 1}:{(i + 1) * rpb}] = b.sig[{i * rpb + 1}:{(i + 1) * rpb}]"
        for i in range(bands)
    )
    agree = (
        f"list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END "
        f"FOR i IN range(1, {n_perm + 1})]) / {n_perm}.0"
    )
    ctes = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) < {k} THEN [array_to_string(toks, ' ')]
              ELSE [array_to_string(toks[i:i+{k - 1}], ' ')
                    FOR i IN range(1, len(toks) - {k - 2})]
         END AS grams
  FROM t
),
x AS (
  SELECT doc_id,
         [('0x' || substr(md5(g), 1, 15))::BIGINT % 2147483647 FOR g IN grams] AS xs
  FROM g
),
s AS (
  SELECT doc_id, [{perms}] AS sig FROM x
)"""
    return ctes, band_conds, agree


def _sql_minhash_near_dupes() -> str:
    """DuckDB restatement: identical md5-based shingle keys and universal
    hashes mod 2^31-1 (same a_j/b_j literals), LSH candidates = exact
    equality of at least one signature band (the Spark side equi-joins on a
    murmur3 band hash — a superset only via ~2^-32 hash collisions)."""
    ctes, band_conds, agree = _minhash_sql_parts()
    return f"""
{ctes}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, round({agree}, 6) AS jaccard_est
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE ({band_conds})
  AND {agree} >= {_MH_MINJ}
"""


SQL_MINHASH_NEAR_DUPES = _sql_minhash_near_dupes()


def q_ngram_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verify stage after LSH: exact word-shingle-set Jaccard for every
    MinHash candidate pair — pure JVM array set math."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = _table(spark, sf_dir, "documents")
    cand = minhash_near_dupes(
        docs, "text", "doc_id",
        n_perm=_MH_N_PERM, bands=_MH_BANDS, shingle_k=_MH_K, min_jaccard=_MH_MINJ,
    ).select("id_a", "id_b")
    out = ngram_jaccard_pairs(docs, cand, "text", "doc_id", shingle_k=_MH_K)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _sql_ngram_jaccard_verify() -> str:
    ctes, band_conds, agree = _minhash_sql_parts()
    return f"""
{ctes},
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE ({band_conds})
    AND {agree} >= {_MH_MINJ}
),
gd AS (SELECT doc_id, list_distinct(grams) AS gs FROM g)
SELECT c.id_a, c.id_b,
       round(CASE WHEN len(list_distinct(ga.gs || gb.gs)) > 0
                  THEN len(list_intersect(ga.gs, gb.gs)) * 1.0
                       / len(list_distinct(ga.gs || gb.gs))
                  ELSE 1.0 END, 6) AS jaccard
FROM cand c
JOIN gd ga ON c.id_a = ga.doc_id
JOIN gd gb ON c.id_b = gb.doc_id
"""


SQL_NGRAM_JACCARD_VERIFY = _sql_ngram_jaccard_verify()


_SH_MAX_HAMMING = 6


def q_simhash_near_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _table(spark, sf_dir, "documents")
    out = simhash_near_dupes(docs, "text", "doc_id", max_hamming=_SH_MAX_HAMMING)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def _sql_simhash_near_dupes() -> str:
    """DuckDB restatement of simhash_col + pair search. The oracle is
    brute-force all-pairs (exact); the Spark side's pigeonhole banding
    (n_bands = h+1) is guaranteed-exact, so the two must agree."""
    return f"""
WITH ms AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE [md5(t) || md5(t || '#')
                    FOR t IN string_split_regex(trim(text), '\\s+')] END AS hs
  FROM documents
),
sigs AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(
            [CASE WHEN 2 * len(list_filter(hs, h -> h[b + 1] >= '8')) > len(hs)
                  THEN (1::BIGINT << b) ELSE 0::BIGINT END
             FOR b IN range(0, {SIMHASH_BITS})]), 0) AS BIGINT) AS sig
  FROM ms
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {_SH_MAX_HAMMING}
"""


SQL_SIMHASH_NEAR_DUPES = _sql_simhash_near_dupes()


def q_phash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phash duplicate pairs over the materialized images fixture;
    max_hamming=0 -> a single full-width band (plain equality equi-join)."""
    imgs = _images(spark)
    out = phash_near_dupes(imgs, "phash", "image_id", max_hamming=0)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


SQL_PHASH_DEDUP_PAIRS = f"""
WITH imgs AS (SELECT image_id, phash FROM read_parquet('{{images_path}}'))
SELECT a.image_id AS id_a, b.image_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM imgs a JOIN imgs b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 0
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER resolution (r4): exact-phash pairs over the images
    fixture -> connected components (pointer-jumped min-label propagation)
    -> per-cluster size + canonical keeper id. The production step after
    any pair generator: transitive duplicate groups dedup as one group.
    Each cluster also ELECTS a quality-aware representative (r5:
    elect_cluster_representatives) — the highest-resolution member by
    pixel count w*h, ties to the smallest id — the keep-the-best-copy
    rule production curation actually applies. Oracle: DuckDB recursive
    CTE computing min-reachable-id fixpoints over the same brute-force
    pair graph, plus a per-component argmax."""
    from .operators.dedup import (
        cluster_winners,
        connected_components,
        phash_near_dupes,
    )

    imgs = _images(spark)
    pairs = phash_near_dupes(imgs, "phash", "image_id", max_hamming=0)
    # phash pairs are canonical and emitted exactly once (first-matching-
    # band filter), so the edge-dedup shuffle is skippable
    comp = connected_components(pairs, assume_unique_pairs=True)
    return cluster_winners(
        comp,
        imgs.withColumn("_q", F.col("w") * F.col("h")),
        "image_id",
        "_q",
        with_size=True,
    ).select(
        F.col("comp").alias("keeper_id"),
        "cluster_size",
        F.col("id").alias("rep_id"),
    )


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
imgs AS (SELECT image_id, phash, w, h FROM read_parquet('{{images_path}}')),
pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM imgs a JOIN imgs b ON a.image_id < b.image_id AND a.phash = b.phash
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
scored AS (
  -- NULL quality coalesces to -infinity like cluster_winners: an
  -- all-NULL cluster must still elect its min-id member, not vanish
  -- through a never-matching q = max(q) join
  SELECT comp.component, comp.id,
         coalesce(CAST(i.w * i.h AS DOUBLE), '-infinity'::DOUBLE) AS q
  FROM comp JOIN imgs i ON i.image_id = comp.id
),
best AS (SELECT component, max(q) AS bq FROM scored GROUP BY component),
winners AS (
  SELECT s.component, min(s.id) AS rep_id
  FROM scored s JOIN best b ON s.component = b.component AND s.q = b.bq
  GROUP BY s.component
)
SELECT c.component AS keeper_id, count(*) AS cluster_size, w.rep_id AS rep_id
FROM comp c JOIN winners w ON w.component = c.component
GROUP BY c.component, w.rep_id
"""


_JPG_N = 150


N_AUDIO, N_VIDEO = 300, 120


def q_av_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio + video decode paths under ONE driver-gated value oracle
    (r5: the WAV and MJPEG codecs in av.py upgraded the last two honest
    stubs): decode RIFF/WAVE + rawpcm clips to per-clip sample count and
    RMS, and mjpeg + rawvid containers to per-frame dimensions and gray
    mean, all in Arrow batches. The DuckDB oracle reads the
    independently-synthesized truth tables (computed from the raw
    PCM/frames with NO encode round trip): PCM audio is lossless, so RMS
    must reproduce the truth float64 bit-for-bit; frame index/dims are
    exact for every container; the lossy MJPEG frame means use a sentinel
    (quantization legitimately shifts them — the ≥40 dB PSNR bound lives
    in tests/test_av.py)."""
    from .operators.multimodal import audio_features, decode_video_frames

    audio = spark.read.parquet(audio_parquet(N_AUDIO))
    videos = spark.read.parquet(videos_parquet(N_VIDEO))
    # the fixtures are ONE row group each, so scan parallelism is 1 task;
    # row-redistribute the CPU-bound frame decode (measured 5x at 16
    # threads). Audio decode is sub-second single-task — not worth the
    # extra shuffle.
    par = spark.sparkContext.defaultParallelism
    a = audio_features(audio).select(
        F.col("audio_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.col("n_samples").cast("bigint").alias("n_units"),
        F.round("rms", 6).alias("metric"),
    )
    v = decode_video_frames(videos, parallelism=par).select(
        F.concat(
            F.col("video_id"), F.lit("#"), F.col("frame_idx").cast("string")
        ).alias("media_id"),
        F.lit("video").alias("kind"),
        (F.col("w") * F.col("h")).cast("bigint").alias("n_units"),
        F.when(F.col("fmt") == "rawvid", F.round("mean_px", 6))
        .otherwise(F.lit(-1.0))
        .alias("metric"),
    )
    return a.unionByName(v)


SQL_AV_MEDIA_STATS = """
SELECT audio_id AS media_id, 'audio' AS kind,
       CAST(n_samples AS BIGINT) AS n_units, round(rms, 6) AS metric
FROM read_parquet('{audio_truth}')
UNION ALL
SELECT video_id || '#' || CAST(frame_idx AS VARCHAR), 'video',
       CAST(w * h AS BIGINT),
       CASE WHEN fmt = 'rawvid' THEN round(mean_px, 6) ELSE -1.0 END
FROM read_parquet('{video_truth}')
"""


def q_images_jpg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-codec gate in the driver loop (r4): a deterministic
    150-image fixture subset re-encodes through the pure-NumPy baseline
    JPEG codec (jpeg.py) inside Arrow batches; EVERY image must hold the
    input_hint PSNR >= 40 dB invariant (the <=2-bit phash-drift half of
    the invariant is pytest-pinned in tests/test_jpeg.py). The oracle is
    the closed-form expectation (all rows pass) — a codec regression
    flips the pass counts and hash-mismatches."""
    from .operators.multimodal import reencode_psnr

    imgs = _images(spark).filter(
        F.col("image_id") < f"img{_JPG_N:012d}"
    )
    re = reencode_psnr(imgs, fmt="jpg")
    return re.agg(
        F.count("*").alias("n_images"),
        F.sum(F.when(F.col("psnr_db") >= 40.0, 1).otherwise(0)).alias(
            "n_psnr_ge_40"
        ),
        F.round(F.min("psnr_db"), 1).alias("min_psnr_floor"),
    ).select(
        "n_images", "n_psnr_ge_40",
        # the exact minimum is codec-version-specific; the driver-stable
        # fact is that it clears the 40 dB gate
        F.when(F.col("min_psnr_floor") >= 40.0, F.lit(40.0)).otherwise(
            F.lit(-1.0)
        ).alias("min_psnr_ge_gate"),
    )


SQL_IMAGES_JPG_ROUNDTRIP = """
SELECT count(*) AS n_images, count(*) AS n_psnr_ge_40,
       40.0 AS min_psnr_ge_gate
FROM read_parquet('{images_path}')
WHERE image_id < 'img{jpg_n:012d}'
"""


def q_ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live LSH-pruned top-k UNION the at-rest signature-PARTITIONED
    store (method-tagged; r4 verdict #1 merge of ann_cosine_topk_lsh +
    ann_cosine_topk_indexed): the index path must return IDENTICAL rows
    to the live query, so one DuckDB LSH restatement serves both tags.
    At-rest probe signatures become an IN-list partition filter — only
    probed buckets are listed/read (PartitionFilters INSET asserted by
    explain_audit)."""
    from .operators.similarity import cosine_topk_lsh_indexed

    cands, qs = _queries_from_embeddings(spark, sf_dir)
    live = cosine_topk_lsh(cands, qs, k=5, n_bits=12, probe_hamming=4).select(
        F.lit("live").alias("method"), "query_id", "rank", "neighbor_id"
    )
    path = _ann_index_path(spark, sf_dir)
    # open the store once per session: listing a 2^12-directory partition
    # tree costs a driver-side file walk per open
    ckey = f"ann-index-{spark.sparkContext.applicationId}-{path}"
    if ckey not in _CACHE:
        _CACHE[ckey] = spark.read.parquet(path)
    at_rest = cosine_topk_lsh_indexed(
        spark, path, qs, k=5, n_bits=12, probe_hamming=4, index_df=_CACHE[ckey]
    ).select(F.lit("at_rest").alias("method"), "query_id", "rank", "neighbor_id")
    return live.unionByName(at_rest)


def _sql_ann_cosine_topk_lsh(dim: int = 64, n_bits: int = 12, probe_hamming: int = 4) -> str:
    """DuckDB restatement of the LSH-pruned ANN: the SAME deterministic
    hyperplanes (PCG64 seed 42) inlined as literal lists, sign-bit
    signatures, Hamming-<=h prune, exact cosine ranking on the survivors."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(42))
    planes = rng.standard_normal((dim, n_bits))
    sig_terms = []
    for b in range(n_bits):
        plane = "[" + ", ".join(repr(float(x)) for x in planes[:, b]) + "]"
        sig_terms.append(
            f"(CASE WHEN list_sum([CAST(embedding[i] AS DOUBLE) * ({plane})[i] "
            f"FOR i IN range(1, {dim + 1})]) > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        )
    sig = " + ".join(sig_terms)
    nrm = (
        f"sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) "
        f"FOR i IN range(1, {dim + 1})]))"
    )
    return f"""
WITH sc AS (
  SELECT vec_id, embedding, {sig} AS sig,
         CASE WHEN {nrm} = 0 THEN 1.0 ELSE {nrm} END AS nrm
  FROM embeddings WHERE vec_id >= 5
),
sq AS (
  SELECT vec_id AS query_id, embedding, {sig} AS sig,
         CASE WHEN {nrm} = 0 THEN 1.0 ELSE {nrm} END AS nrm
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                         FOR i IN range(1, {dim + 1})]) / (q.nrm * c.nrm), 6) AS sim
  FROM sq q JOIN sc c ON bit_count(xor(q.sig, c.sig)) <= {probe_hamming}
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
"""


SQL_ANN_COSINE_TOPK_LSH = _sql_ann_cosine_topk_lsh()


def _ann_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the signature-partitioned ANN index at rest ONCE per
    scale factor (same pattern as the images fixture): the store is
    deterministic (seeded hyperplanes over the fixed embeddings table), so
    a completed _SUCCESS marker means reuse."""
    import os

    from .operators.similarity import build_ann_index

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/root/repo/.cache/ann_index_{tag}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        cands, _ = _queries_from_embeddings(spark, sf_dir)
        build_ann_index(cands, path, n_bits=12)
    return path


_IVF_CLUSTERS = 16


def _ivf_index_path(spark: SparkSession, sf_dir: str):
    """Materialize the cluster-partitioned IVF store ONCE per scale factor
    (deterministic: xxhash64-sampled centroids over the fixed embeddings
    table); the centroid matrix is persisted next to the index so later
    sessions never re-collect it."""
    import os

    import numpy as np

    from .operators.similarity import build_ivf_index

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/root/repo/.cache/ivf_index_{tag}"
    cents_path = os.path.join(path, "centroids.npy")
    if os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(cents_path):
        return path, np.load(cents_path)
    cands, _ = _queries_from_embeddings(spark, sf_dir)
    cents = build_ivf_index(cands, path, n_clusters=_IVF_CLUSTERS)
    np.save(cents_path, cents)
    return path, cents


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "admin_assign_count": q_admin_assign_count,
        "zonal_value_stats": q_zonal_value_stats,
        "zonal_value_quantiles": q_zonal_value_quantiles,
        "admin1_rollup": q_admin1_rollup,
        "hotspot_cells_topk": q_hotspot_cells_topk,
        "images_admin_count": q_images_admin_count,
        "image_tile_zonal": q_image_tile_zonal,
        "tile_overlap_fractions": q_tile_overlap_fractions,
        "image_tile_zonal_frac": q_image_tile_zonal_frac,
        "tpch_q1": q_tpch_q1,
        "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
        "tpch_q14_promo_share": q_tpch_q14_promo_share,
        "top_revenue_orders": q_top_revenue_orders,
        "daily_events": q_daily_events,
        "weekly_events": q_weekly_events,
        "tz_shift_daily": q_tz_shift_daily,
        "sessionization": q_sessionization,
        "doc_dedup_stats": q_doc_dedup_stats,
        "doc_token_stats": q_doc_token_stats,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_cosine_topk_lsh": q_ann_cosine_topk_lsh,
        "minhash_near_dupes": q_minhash_near_dupes,
        "simhash_near_dupes": q_simhash_near_dupes,
        "phash_dedup_pairs": q_phash_dedup_pairs,
        "dedup_clusters": q_dedup_clusters,
        "images_jpg_roundtrip": q_images_jpg_roundtrip,
        "av_media_stats": q_av_media_stats,
        "embedding_near_dupes": q_embedding_near_dupes,
        "lon_normalize_hist": q_lon_normalize_hist,
        "crop_bbox_count": q_crop_bbox_count,
        "validate_per_slice": q_validate_per_slice,
        "durations_matrix": q_durations_matrix,
        "top3_per_admin": q_top3_per_admin,
        "knn_admin_centroids": q_knn_admin_centroids,
        "images_decode_stats": q_images_decode_stats,
        "raster_zonal_weighted_mean": q_raster_zonal_weighted_mean,
        "resample_bilinear_summary": q_resample_bilinear_summary,
        "resample_idw_summary": q_resample_idw_summary,
        "rolling_weekly_events": q_rolling_weekly_events,
        "asof_event_rates": q_asof_event_rates,
        "interval_event_counts": q_interval_event_counts,
        "month_completeness": q_month_completeness,
        "raster_na_summary": q_raster_na_summary,
        "multi_file_archive_stats": q_multi_file_archive_stats,
        "validate_value_range": q_validate_value_range,
        "concat_lineage": q_concat_lineage,
        "lang_id_counts": q_lang_id_counts,
        "daily_stats_registry": q_daily_stats_registry,
        "ngram_jaccard_verify": q_ngram_jaccard_verify,
        "winnow_fingerprint_stats": q_winnow_fingerprint_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "admin_assign_count": SQL_ADMIN_ASSIGN_COUNT,
        "zonal_value_stats": SQL_ZONAL_VALUE_STATS,
        "zonal_value_quantiles": SQL_ZONAL_VALUE_QUANTILES,
        "admin1_rollup": SQL_ADMIN1_ROLLUP,
        "hotspot_cells_topk": SQL_HOTSPOT_CELLS_TOPK,
        "images_admin_count": SQL_IMAGES_ADMIN_COUNT,
        "tpch_q1": SQL_TPCH_Q1,
        "tpch_q5_local_supplier": SQL_TPCH_Q5_LOCAL_SUPPLIER,
        "tpch_q14_promo_share": SQL_TPCH_Q14_PROMO_SHARE,
        "top_revenue_orders": SQL_TOP_REVENUE_ORDERS,
        "daily_events": SQL_DAILY_EVENTS,
        "weekly_events": SQL_WEEKLY_EVENTS,
        "tz_shift_daily": SQL_TZ_SHIFT_DAILY,
        "sessionization": SQL_SESSIONIZATION,
        "doc_dedup_stats": SQL_DOC_DEDUP_STATS,
        "doc_token_stats": SQL_DOC_TOKEN_STATS,
        # nprobe = n_clusters makes IVF exact, so one brute-force oracle
        # serves both method tags of the exact+IVF union
        "ann_cosine_topk": _tagged_union_sql(SQL_ANN_COSINE_TOPK, ["exact", "ivf"]),
        "lon_normalize_hist": SQL_LON_NORMALIZE_HIST,
        "crop_bbox_count": SQL_CROP_BBOX_COUNT,
        "validate_per_slice": SQL_VALIDATE_PER_SLICE,
        "durations_matrix": SQL_DURATIONS_MATRIX,
        "top3_per_admin": SQL_TOP3_PER_ADMIN,
        "knn_admin_centroids": SQL_KNN_ADMIN_CENTROIDS,
        "embedding_near_dupes": SQL_EMBEDDING_NEAR_DUPES,
        "minhash_near_dupes": SQL_MINHASH_NEAR_DUPES,
        "raster_zonal_weighted_mean": SQL_RASTER_ZONAL_WEIGHTED_MEAN,
        "resample_bilinear_summary": SQL_RESAMPLE_BILINEAR_SUMMARY,
        "resample_idw_summary": SQL_RESAMPLE_IDW_SUMMARY,
        "rolling_weekly_events": SQL_ROLLING_WEEKLY_EVENTS,
        "asof_event_rates": SQL_ASOF_EVENT_RATES,
        "interval_event_counts": SQL_INTERVAL_EVENT_COUNTS,
        "month_completeness": SQL_MONTH_COMPLETENESS,
        "raster_na_summary": SQL_RASTER_NA_SUMMARY,
        "multi_file_archive_stats": SQL_MULTI_FILE_ARCHIVE_STATS,
        "validate_value_range": SQL_VALIDATE_VALUE_RANGE,
        "concat_lineage": SQL_CONCAT_LINEAGE,
        # the at-rest index must return IDENTICAL rows to the live LSH
        # query — one LSH restatement serves both method tags
        "ann_cosine_topk_lsh": _tagged_union_sql(
            SQL_ANN_COSINE_TOPK_LSH, ["live", "at_rest"]
        ),
        "simhash_near_dupes": SQL_SIMHASH_NEAR_DUPES,
        # brute-force all-pairs oracle over the SAME materialized fixture
        # file the Spark query scans (ensured to exist here)
        "dedup_clusters": SQL_DEDUP_CLUSTERS.format(
            images_path=images_parquet(N_IMAGES)
        ),
        "images_jpg_roundtrip": SQL_IMAGES_JPG_ROUNDTRIP.format(
            images_path=images_parquet(N_IMAGES), jpg_n=_JPG_N
        ),
        # audio/video decode oracle: truth computed from raw PCM/frames,
        # no encode round trip (fixtures materialize here if absent)
        "av_media_stats": SQL_AV_MEDIA_STATS.format(
            audio_truth=audio_truth_parquet(N_AUDIO),
            video_truth=video_truth_parquet(N_VIDEO),
        ),
        "phash_dedup_pairs": SQL_PHASH_DEDUP_PAIRS.format(
            images_path=images_parquet(N_IMAGES)
        ),
        # decoded-tile zonal: the oracle joins the independently
        # synthesized ground-truth pixel stats (no encode/decode round
        # trip) against the same fact-table parquet the Spark query scans
        "image_tile_zonal": SQL_IMAGE_TILE_ZONAL.format(
            images_path=images_parquet(N_IMAGES),
            truth_path=image_truth_parquet(N_IMAGES),
        ),
        # closed-form bbox-x-admin-rectangle intersection over the same
        # fact parquet (tiles align cell edges with admin edges, so the
        # engine's cover-based fraction sum is exact)
        "tile_overlap_fractions": SQL_TILE_OVERLAP_FRACTIONS.format(
            images_path=images_parquet(N_IMAGES),
            hw=_TILE_W / 2, hh=_TILE_H / 2, w=_TILE_W, h=_TILE_H,
        ),
        "image_tile_zonal_frac": SQL_IMAGE_TILE_ZONAL_FRAC.format(
            images_path=images_parquet(N_IMAGES),
            truth_path=image_truth_parquet(N_IMAGES),
            hw=_TILE_W / 2, hh=_TILE_H / 2, w=_TILE_W, h=_TILE_H,
        ),
        "lang_id_counts": SQL_LANG_ID_COUNTS,
        "daily_stats_registry": SQL_DAILY_STATS_REGISTRY,
        "ngram_jaccard_verify": SQL_NGRAM_JACCARD_VERIFY,
        "winnow_fingerprint_stats": SQL_WINNOW_FINGERPRINT_STATS,
        # decode path value oracle: per-image stats vs the independently
        # synthesized ground truth (no encode/decode round trip)
        "images_decode_stats": SQL_IMAGES_DECODE_STATS.format(
            images_path=images_parquet(N_IMAGES),
            truth_path=image_truth_parquet(N_IMAGES),
            n=2000,
        ),
    }
