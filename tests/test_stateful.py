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


def test_streaming_admin_assignment_matches_batch(spark, tmp_path):
    """The flagship cover join runs UNCHANGED under Structured Streaming:
    broadcast cover + Arrow keep-kernel inside micro-batches, per-admin
    counts identical to the batch plan over the same rows (north star:
    streaming ingest of geocoded records with admin assignment). Files
    arrive in two chunks to force multiple micro-batches."""
    import numpy as np
    import pandas as pd

    from geoglue_spark.cover import build_cover
    from geoglue_spark.grids import Grid
    from geoglue_spark.operators.assign import assign_admin
    from geoglue_spark.synth import _point_lat, _point_lon, admins_df

    grid = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)
    admins = admins_df(spark)
    cover = build_cover(admins, grid, supersample=4).cache()
    wkb = {r.admin_id: bytes(r.geometry) for r in admins.collect()}

    i = np.arange(4000)
    pdf = pd.DataFrame({"pid": i, "lat": _point_lat(i), "lon": _point_lon(i)})
    src = str(tmp_path / "pts_in")
    os.makedirs(src)
    pdf.iloc[:2500].to_parquet(os.path.join(src, "a.parquet"), index=False)
    pdf.iloc[2500:].to_parquet(os.path.join(src, "b.parquet"), index=False)

    batch_pts = spark.createDataFrame(pdf)
    want = {
        r.admin_id: r["count"]
        for r in assign_admin(batch_pts, cover, wkb, grid)
        .groupBy("admin_id").count().collect()
    }

    schema = spark.read.parquet(os.path.join(src, "a.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    assigned = assign_admin(stream, cover, wkb, grid)
    q = (
        assigned.groupBy("admin_id").count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_assign_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_assign"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.admin_id: r["count"]
        for r in spark.sql("SELECT * FROM stream_assign_out").collect()
    }
    assert got == want
    assert sum(got.values()) == 4000


def test_streaming_fractional_tiles_match_batch(spark, tmp_path):
    """J8 parity (r3 verdict #10): assign_tiles_fractional runs UNCHANGED
    under Structured Streaming — per-(tile, admin) fractions across
    multiple micro-batch triggers identical to the batch plan over the
    same rows, and per-admin fraction mass conserved."""
    import numpy as np
    import pandas as pd

    from geoglue_spark.cover import build_cover
    from geoglue_spark.grids import Grid
    from geoglue_spark.operators.assign import assign_tiles_fractional
    from geoglue_spark.synth import _point_lat, _point_lon, admins_df

    grid = Grid(x0=100.0, dx=0.05, nx=200, y0=10.0, dy=0.05, ny=200)
    cover = build_cover(admins_df(spark), grid, supersample=4).cache()

    i = np.arange(3000)
    pdf = pd.DataFrame({"tid": i, "lat": _point_lat(i), "lon": _point_lon(i)})
    src = str(tmp_path / "tiles_in")
    os.makedirs(src)
    pdf.iloc[:1000].to_parquet(os.path.join(src, "a.parquet"), index=False)
    pdf.iloc[1000:].to_parquet(os.path.join(src, "b.parquet"), index=False)

    kw = dict(tile_w_deg=0.12, tile_h_deg=0.12, id_cols=["tid"])
    batch = assign_tiles_fractional(
        spark.createDataFrame(pdf), cover, grid, **kw
    )
    want = {
        (r.tid, r.admin_id): round(r.frac, 9) for r in batch.collect()
    }

    schema = spark.read.parquet(os.path.join(src, "a.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # the per-(tile, admin) groupBy is a streaming aggregation: complete
    # mode (no watermark needed; tiles are keyed, not time-windowed)
    frac = assign_tiles_fractional(stream, cover, grid, **kw)
    q = (
        frac.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_frac_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_frac"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.tid, r.admin_id): round(r.frac, 9)
        for r in spark.sql("SELECT * FROM stream_frac_out").collect()
    }
    assert got == want  # identical (tile, admin, frac) rows
    # conservation in-stream: fraction mass never exceeds 1, and every
    # tile fully INSIDE the admin-covered domain sums to exactly 1
    # (domain-edge tiles hang off the union and legitimately sum < 1)
    sums = {
        r.tid: r.s
        for r in spark.sql(
            "SELECT tid, sum(frac) s FROM stream_frac_out GROUP BY tid"
        ).collect()
    }
    assert len(sums) == 3000
    assert all(s <= 1.0 + 1e-6 for s in sums.values())
    interior = pdf[
        (pdf.lon > 100.1) & (pdf.lon < 109.9)
        & (pdf.lat > 10.1) & (pdf.lat < 19.9)
    ].tid
    assert len(interior) > 2000
    assert all(abs(sums[t] - 1.0) < 1e-6 for t in interior)


def test_streaming_running_stats_long_key(spark, tmp_path):
    """Non-string keys (user ids, phashes) must serialize: the declared
    output field is string, so the kernel casts the key itself — a raw
    int64 used to fail Arrow conversion at the first micro-batch."""
    from geoglue_spark.streaming.stateful import streaming_running_stats

    stream = _staged_stream(spark, tmp_path, "in_longkey")
    out = streaming_running_stats(
        stream.withColumn("k", (F.xxhash64("event_type") % 100)), "k", "value"
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stats_longkey")
        .option("checkpointLocation", str(tmp_path / "ckpt_longkey"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM stats_longkey").toPandas()
    assert len(got) > 0 and got.n.sum() > 0
