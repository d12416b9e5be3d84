"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "assign_rows_per_sec": ...}

--scaling mode: run the identical flagship assignment+zonal job at two
parallelism levels (local[8] vs local[32]) on the same input and report
throughput at both plus scaling efficiency — the sandbox evidence for the
north rule's two-cluster-size criterion (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))


def _materialize(df) -> int:
    """Force full computation; return row count."""
    return df.count()


def flagship_points(spark, n: int):
    """n deterministic geocoded points, all-JVM generation (measures the
    engine, not the generator): same hotspot-skew layout as synth."""
    i = F.col("id")
    u1 = ((i * 48271 + 7) % 99991).cast("double") / 99991.0
    u2 = ((i * 16807 + 11) % 99991).cast("double") / 99991.0
    hot = (i % 5) < 4
    return spark.range(0, n, 1, spark.sparkContext.defaultParallelism).select(
        i.alias("pid"),
        F.when(hot, 12.25 + u1 * 0.5).otherwise(10.0 + u1 * 10.0).alias("lat"),
        F.when(hot, 104.25 + u2 * 0.5).otherwise(100.0 + u2 * 10.0).alias("lon"),
        (i % 1000).cast("double").alias("value"),
    )


def run_flagship(spark, n_rows: int) -> tuple[float, int]:
    """Assignment + zonal agg over n_rows points; returns (sec, rows)."""
    from geoglue_spark.operators.assign import assign_admin
    from geoglue_spark.operators.zonal import zonal_stats
    from geoglue_spark.queries import QUERY_GRID, _engine

    cover, wkb, _ = _engine(spark)
    pts = flagship_points(spark, n_rows)
    t0 = time.time()
    assigned = assign_admin(pts, cover, wkb, QUERY_GRID)
    out = zonal_stats(assigned, "value", ["count", "mean", "sum", "min", "max"])
    n_admins = _materialize(out)
    return time.time() - t0, n_rows


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from geoglue_spark import queries as Q

    names = [
        "admin_assign_count",
        "zonal_value_stats",
        "images_admin_count",
        "tpch_q1",
        "top_revenue_orders",
        "daily_events",
        "weekly_events",
        "tz_shift_daily",
        "sessionization",
        "doc_dedup_stats",
        "doc_token_stats",
        "ann_cosine_topk",
        "minhash_near_dupes",
        "simhash_near_dupes",
    ]
    qs = Q.queries()
    times: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        _materialize(qs[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times


def main_bench() -> None:
    from geoglue_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("bench", cores=cores, shuffle_partitions=cores)

    # warm the cover cache, broadcast relation, and Python workers outside
    # the timed sections: steady-state throughput is the target metric
    from geoglue_spark.queries import _engine

    _engine(spark)
    run_flagship(spark, BENCH_ROWS // 10)

    flag_sec, flag_rows = run_flagship(spark, BENCH_ROWS)
    times = bench_queries(spark, sf_dir)
    times["flagship_assign_zonal"] = round(flag_sec, 3)
    total = round(sum(times.values()), 3)
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    print(
        json.dumps(
            {
                "metric": "admin-assignment + zonal-agg + headline query suite wall time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "assign_rows": flag_rows,
                "assign_rows_per_sec": round(flag_rows / flag_sec, 1),
                "cores": cores,
            }
        )
    )


def main_scaling() -> None:
    """Identical job at two parallelism levels on the same input."""
    from geoglue_spark.session import get_spark
    from geoglue_spark import queries as Q

    results = {}
    n = BENCH_ROWS
    for cores in (8, 32):
        Q._CACHE.clear()  # cover cache is session-bound
        spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
        Q._engine(spark)
        run_flagship(spark, n // 10)  # warm-up
        best = min(run_flagship(spark, n)[0] for _ in range(2))
        results[cores] = {"sec": round(best, 3), "rows_per_sec": round(n / best, 1)}
        spark.stop()
    lo, hi = results[8], results[32]
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency local[8] -> local[32]",
                "rows": n,
                "local8": lo,
                "local32": hi,
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_bench()
