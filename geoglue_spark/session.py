"""SparkSession factory tuned for this engine.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions ~ cores (not 200), AQE on (runtime coalesce + skew-join),
Arrow enabled for every pandas-UDF boundary, UTC session timezone so
results compare bit-for-bit with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geoglue_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession on ``local[cores]``.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all CPUs. Shuffle
    partitions default to the core count: on a real cluster this maps to
    2-3x total executor cores; at 100 TB you would raise
    ``spark.sql.shuffle.partitions`` to keep post-shuffle partitions
    ~128-256 MB (AQE coalescing trims the excess at runtime).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # Python workers must be able to unpickle our UDF closures: ship the
    # package directory on the worker PYTHONPATH (the local-mode analog of
    # `spark-submit --py-files geoglue_spark.zip`, which is how a real
    # cluster run distributes this package per the north rule).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{py_path}" if py_path else pkg_root
        )
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # NOTE: a large heap (48g) measured 5x SLOWER than 12g on this
        # hypervisor (GC scan/page-fault cost grows with heap, amplified at
        # high thread counts); see BENCH/BASELINE.md. Raise only for
        # genuinely large broadcasts/collects.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
