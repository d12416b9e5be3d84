"""Bucketed layout: the co-located-join contract. Writing both join
sides bucketed by the key must make the join exchange-free (shuffle paid
once at write time, amortized over every later join), with values
identical to the plain-shuffle join."""

import pytest
from pyspark.sql import functions as F

from geoglue_spark.layout import (
    bucketed_join,
    join_is_exchange_free,
    write_bucketed,
)


def test_cobucketed_join_is_exchange_free(spark, tmp_path):
    facts = spark.range(0, 20_000).select(
        F.col("id").alias("image_id"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(0, 20_000, 2).select(
        F.col("id").alias("image_id"), (F.col("id") % 7).alias("w")
    )
    # disable auto-broadcast: at this toy size Spark would BHJ both cases
    # and the exchange-free check would be vacuous; the layout contract is
    # about the SortMergeJoin path two fact-scale tables take
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(facts, "t_facts", "image_id", 8, path=str(tmp_path / "f"))
        write_bucketed(dims, "t_dims", "image_id", 8, path=str(tmp_path / "d"))
        joined = bucketed_join(spark, "t_facts", "t_dims", "image_id")
        # the layout contract: a SORT-MERGE join with zero shuffle
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert join_is_exchange_free(joined)
        # and values match the plain-shuffle join exactly
        want = sorted(
            tuple(r) for r in facts.join(dims, "image_id").collect()
        )
        got = sorted(tuple(r) for r in joined.collect())
        assert got == want and len(got) == 10_000
        # mismatched bucket counts fall back to a shuffle (the failure
        # mode join_is_exchange_free exists to catch)
        write_bucketed(dims, "t_dims5", "image_id", 5, path=str(tmp_path / "d5"))
        mixed = bucketed_join(spark, "t_facts", "t_dims5", "image_id")
        mixed.collect()
        assert not join_is_exchange_free(mixed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        for t in ("t_facts", "t_dims", "t_dims5"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_write_bucketed_validation(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "t_bad", "k", 0, path=str(tmp_path / "b"))
