"""Deterministic sampling operators: partitioning-invariance, exactness
of stratified quotas (vs a pandas brute-force oracle over the identical
hash order), correction-pass coverage, and split algebra."""

import pytest
from pyspark.sql import functions as F

from geoglue_spark.operators.sample import (
    deterministic_sample,
    stratified_sample,
    train_test_split,
)


def _events(spark, n=5000, parts=8):
    i = F.col("id")
    return spark.range(0, n, 1, parts).select(
        i.alias("event_id"),
        (i % 7).cast("string").alias("grp"),
        (i * 13 % 1000).cast("double").alias("value"),
    )


def test_deterministic_sample_partitioning_invariant(spark):
    df = _events(spark)
    a = {r.event_id for r in deterministic_sample(df, 0.3, ["event_id"]).collect()}
    b = {
        r.event_id
        for r in deterministic_sample(
            df.repartition(17), 0.3, ["event_id"]
        ).collect()
    }
    assert a == b and 0.2 < len(a) / 5000 < 0.4
    # different seed -> different (but again stable) membership
    c = {r.event_id for r in deterministic_sample(df, 0.3, ["event_id"], seed=9).collect()}
    assert c != a
    with pytest.raises(ValueError):
        deterministic_sample(df, 1.5, ["event_id"])


def test_train_test_split_disjoint_exhaustive(spark):
    df = _events(spark, 2000)
    out = train_test_split(df, 0.25, ["event_id"]).cache()
    n = out.count()
    n_test = out.filter("split = 'test'").count()
    assert n == 2000 and 0.18 < n_test / n < 0.32
    # split is a pure row function: re-derives identically after shuffle
    again = train_test_split(df.repartition(5), 0.25, ["event_id"])
    diff = (
        out.select("event_id", "split")
        .exceptAll(again.select("event_id", "split"))
        .count()
    )
    assert diff == 0
    out.unpersist()


def test_stratified_sample_exact_quota_and_determinism(spark):
    df = _events(spark, 5000)
    out = stratified_sample(df, ["grp"], 25, ["event_id"]).cache()
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {str(g) for g in range(7)}
    assert all(v == 25 for v in sizes.values())
    # determinism across partitionings
    again = stratified_sample(df.repartition(13), ["grp"], 25, ["event_id"])
    assert {r.event_id for r in out.collect()} == {
        r.event_id for r in again.collect()
    }
    # the kept rows are exactly the 25 smallest hash01 per group: rank the
    # full table by the same hash expression and compare
    from geoglue_spark.operators.sample import _hash01

    full = df.withColumn("_u", _hash01([F.col("event_id")], 0)).toPandas()
    want = set(
        full.sort_values(["grp", "_u", "event_id"])
        .groupby("grp")
        .head(25)["event_id"]
    )
    assert {r.event_id for r in out.collect()} == want
    out.unpersist()


def test_stratified_sample_small_groups_keep_everything(spark):
    df = _events(spark, 40)  # ~6 rows per group < quota 25
    out = stratified_sample(df, ["grp"], 25, ["event_id"])
    assert out.count() == 40


def test_stratified_sample_correction_pass_exact_under_tiny_margin(spark):
    """Force the prefilter to bite too deep (margin 0, low min_count →
    per-group threshold 64/count, below the quota's rank for at least
    one group on this fixture): the correction pass must still deliver
    the exact hash-order quota."""
    from geoglue_spark.operators.sample import _hash01

    quota = 60
    df = _events(spark, 4000)
    full = df.withColumn("_u", _hash01([F.col("event_id")], 0)).toPandas()
    # prove the prefilter actually bites on this fixture (else the test
    # is vacuous and should fail loudly): some group has fewer than
    # `quota` rows under its threshold
    cnts = full.groupby("grp").size()
    survivors = {
        g: int((full[full.grp == g]["_u"] < min(1.0, 64.0 / c)).sum())
        for g, c in cnts.items()
    }
    assert min(survivors.values()) < quota, survivors

    out = stratified_sample(
        df,
        ["grp"],
        quota,
        ["event_id"],
        prefilter_margin=0.0,
        prefilter_min_count=1,
    )
    sizes = [r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()]
    assert sizes and all(v == quota for v in sizes)
    # and the selection is STILL the true top-quota by hash (exactness,
    # not just cardinality)
    want = set(
        full.sort_values(["grp", "_u", "event_id"])
        .groupby("grp")
        .head(quota)["event_id"]
    )
    assert {r.event_id for r in out.collect()} == want


def test_stratified_sample_plan_shape(spark):
    """Broadcast mode: the threshold/short joins are broadcast hash
    joins — no sort-merge join of the fact table against the counts."""
    df = _events(spark, 5000)
    out = stratified_sample(df, ["grp"], 10, ["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def _mix_fixture(spark, n=3000):
    # deterministic skew: 60% web / 30% code / 10% papers
    rows = [
        (i, "web" if i % 10 < 6 else ("code" if i % 10 < 9 else "papers"))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string"), rows


def test_mix_sources_exact_quotas_and_hash_order(spark):
    """Quotas are exact floor(p*total); the kept set per source is the
    quota smallest hash01 values (verified against Spark-recomputed
    hashes sorted in Python); membership is partitioning-invariant."""
    from geoglue_spark.operators.sample import _hash01, mix_sources

    df, rows = _mix_fixture(spark)
    props = {"web": 0.5, "code": 0.3, "papers": 0.2}
    out = mix_sources(df, "source", props, ["doc_id"], total_rows=1000, seed=4)
    got = {r.doc_id for r in out.collect()}
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"web": 500, "code": 300, "papers": 200}

    hashes = {
        r.doc_id: (r.source, r.u)
        for r in df.select(
            "doc_id", "source", _hash01([F.col("doc_id")], 4).alias("u")
        ).collect()
    }
    want = set()
    for src, q in (("web", 500), ("code", 300), ("papers", 200)):
        ranked = sorted(
            (u, i) for i, (s, u) in hashes.items() if s == src
        )[:q]
        want |= {i for _, i in ranked}
    assert got == want

    repart = mix_sources(
        df.repartition(17), "source", props, ["doc_id"], total_rows=1000, seed=4
    )
    assert {r.doc_id for r in repart.collect()} == want


def test_mix_sources_auto_total_binds_on_scarcest(spark):
    """total_rows=None consumes the binding source: with papers at 10% of
    rows but a 20% target, papers caps the total."""
    from geoglue_spark.operators.sample import mix_sources

    df, rows = _mix_fixture(spark)  # 1800 web / 900 code / 300 papers
    props = {"web": 0.5, "code": 0.3, "papers": 0.2}
    out = mix_sources(df, "source", props, ["doc_id"])
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total = 300 * 5  # papers binds: 300 / 0.2
    assert by_src == {"web": total // 2, "code": int(total * 0.3), "papers": 300}


def test_mix_sources_validation(spark):
    from geoglue_spark.operators.sample import mix_sources

    df, _ = _mix_fixture(spark)
    with pytest.raises(ValueError, match="more rows than exist"):
        mix_sources(df, "source", {"web": 0.5, "papers": 0.5}, ["doc_id"],
                    total_rows=2000)
    with pytest.raises(ValueError, match="no rows"):
        mix_sources(df, "source", {"web": 0.5, "books": 0.5}, ["doc_id"])
    with pytest.raises(ValueError, match="positive weight"):
        mix_sources(df, "source", {"web": 0.0}, ["doc_id"])
    # weight-0 sources are dropped entirely
    out = mix_sources(df, "source", {"web": 1.0, "code": 0.0}, ["doc_id"],
                      total_rows=100)
    assert {r.source for r in out.collect()} == {"web"}


def test_mix_sources_correction_pass_exact_under_tiny_margin(spark):
    """Force the prefilter to bite below quota (margin ~0, min_count 0):
    the correction pass must still deliver exact quotas."""
    from geoglue_spark.operators.sample import mix_sources

    df, _ = _mix_fixture(spark)
    out = mix_sources(
        df, "source", {"web": 0.5, "code": 0.5}, ["doc_id"],
        total_rows=800, seed=9, prefilter_margin=0.0, prefilter_min_count=0,
    )
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"web": 400, "code": 400}


def test_stratified_sample_null_group_key_is_a_group(spark):
    """NULL group keys must sample like any other group — plain equi-joins
    would silently drop the whole NULL group."""
    from geoglue_spark.operators.sample import stratified_sample

    rows = [(i, None if i % 3 == 0 else f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, ["lang"], 5, ["doc_id"], seed=3)
    sizes = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {None: 5, "g1": 5, "g2": 5}
    # determinism under repartitioning, NULL group included
    again = stratified_sample(df.repartition(7), ["lang"], 5, ["doc_id"], seed=3)
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in out.collect()}
