"""Structured-Streaming windowed aggregation — the streaming face of A3/A4.

The reference is batch-only (SURVEY.md §2.9), but its late-data semantics
(the always-rewritten partial month, reference src/geoglue/cds.py:591-610)
map naturally onto watermarked tumbling windows: a watermark bounds how
long the "open" window stays mutable, exactly like the partial-month chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_daily_counts(
    stream: DataFrame,
    time_col: str = "ts",
    keys: list[str] = (),
    value_col: str | None = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling 1-day windowed count/sum with late-data watermark.

    Use ``writeStream.outputMode('append')`` — a window only emits once the
    watermark passes its end (the 'month complete' commit discipline, I3).
    """
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    ts = F.col(time_col).cast("timestamp")
    return (
        stream.withColumn("_ts", ts)
        .withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", "1 day").alias("win"), *keys)
        .agg(*aggs)
        .select(
            F.col("win.start").cast("date").alias("date"), *keys, "n",
            *( ["sum_value"] if value_col else [] ),
        )
    )


def run_stream_once(agg: DataFrame, query_name: str) -> DataFrame:
    """Drive a streaming aggregation to completion over the currently
    available input (memory sink) and return the result as a batch DF."""
    spark = agg.sparkSession
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
