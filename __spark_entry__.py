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

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

_SHIPPED: set[str] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the geoglue_spark package to Python workers of an ALREADY
    RUNNING SparkContext (the driver builds its own session before importing
    this module, so env-var PYTHONPATH is too late). ``addPyFile`` of a
    package zip is the runtime analog of ``spark-submit --py-files``."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    import shutil
    import tempfile

    zip_base = os.path.join(tempfile.gettempdir(), f"geoglue_spark_pkg_{os.getpid()}")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(zip_base, "zip", root_dir=_REPO, base_dir="geoglue_spark")
    sc.addPyFile(zip_path)
    _SHIPPED.add(app)

from geoglue_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocoded points from sf0.001 events -> cell-cover broadcast
    join -> ray-cast refinement -> per-admin zonal stats."""
    from pyspark.sql import functions as F

    from geoglue_spark.operators.zonal import zonal_stats

    _ensure_shipped(spark)
    assigned = _q._assigned(spark, "/root/testdata/sf0.001")
    out = zonal_stats(assigned, "value", ["count", "mean", "sum"])
    return out.select(
        "admin_id",
        F.col("count").alias("n"),
        F.round("mean", 6).alias("mean_value"),
        F.round("sum", 3).alias("sum_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def shipped(fn):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: shipped(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
