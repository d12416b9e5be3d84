"""Deterministic point generator shared by bench.py and submit_job.py
(shipped via --py-files next to the driver script)."""

from pyspark.sql import functions as F


def flagship_points(spark, n: int):
    """n deterministic geocoded points, all-JVM generation: same
    hotspot-skew layout as bench.py::flagship_points."""
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
