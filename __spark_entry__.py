"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship admin-assignment + zonal-aggregation
pipeline at sf0.001; ``queries()``/``oracle_sql()`` expose every operator
(SURVEY.md §2) with DuckDB oracles where SQL can express them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoglue_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocoded points from sf0.001 events -> cell-cover broadcast
    join -> ray-cast refinement -> per-admin zonal stats."""
    from pyspark.sql import functions as F

    from geoglue_spark.operators.zonal import zonal_stats

    assigned = _q._assigned(spark, "/root/testdata/sf0.001")
    out = zonal_stats(assigned, "value", ["count", "mean", "sum"])
    return out.select(
        "admin_id",
        F.col("count").alias("n"),
        F.round("mean", 6).alias("mean_value"),
        F.round("sum", 3).alias("sum_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
