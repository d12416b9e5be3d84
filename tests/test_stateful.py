"""Stateful streaming ops (applyInPandasWithState)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _staged_stream(spark, tmp_path, name):
    src = "/root/testdata/sf0.001/events.parquet"
    d = str(tmp_path / name)
    os.makedirs(d)
    shutil.copy(src, os.path.join(d, "part-0.parquet"))
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(d)


def test_streaming_dedup(spark, tmp_path):
    from geoglue_spark.streaming.stateful import streaming_dedup

    stream = _staged_stream(spark, tmp_path, "in1").withColumn(
        "utype", F.col("event_type")
    )
    out = streaming_dedup(stream, "utype", ["event_id"])
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM dedup_out").toPandas()
    # exactly one row per event_type (5 types in testdata)
    assert len(got) == got.utype.nunique() == 5


def test_streaming_running_stats(spark, tmp_path):
    from geoglue_spark.streaming.stateful import streaming_running_stats

    stream = _staged_stream(spark, tmp_path, "in2")
    out = streaming_running_stats(
        stream.withColumn("k", F.col("event_type")), "k", "value"
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stats_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM stats_out").toPandas()
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(F.col("event_type").alias("k"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .toPandas()
    )
    # final state per key equals the batch aggregate
    last = got.groupby("k").last().reset_index()
    m = last.merge(batch, on="k", suffixes=("_s", "_b"))
    assert len(m) == 5
    assert (m.n_s == m.n_b).all()
    assert (abs(m.sum_value_s - m.sum_value_b) < 1e-6).all()
