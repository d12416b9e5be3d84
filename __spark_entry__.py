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
    import hashlib
    import tempfile
    import zipfile

    # cache key = content fingerprint of the .py sources, NOT the pid:
    # pids are reused, so a pid-named zip could ship STALE code to the
    # workers after an edit (driver running new code, executors old).
    # Only .py files ship — make_archive would also pack __pycache__.
    pkg = os.path.join(_REPO, "geoglue_spark")
    py_files = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(pkg)
        for f in fn
        if f.endswith(".py")
    )
    h = hashlib.md5()
    for f in py_files:
        st = os.stat(f)
        h.update(f"{os.path.relpath(f, _REPO)}:{st.st_mtime_ns}:{st.st_size};".encode())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"geoglue_spark_pkg_{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = f"{zip_path}.tmp-{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for f in py_files:
                zf.write(f, os.path.relpath(f, _REPO))
        os.replace(tmp, zip_path)
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
