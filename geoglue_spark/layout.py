"""Bucketed table layout — shuffle-free equi-joins across runs.

The reference processes each archive in one pass, so it never needs a
persistent join layout; at 10^12-row scale the same fact tables join on
the same keys (image_id, doc_id, cell_id) run after run, and every run
pays the shuffle again unless the LAYOUT carries the partitioning.
``bucketBy`` is Spark's at-rest hash partitioning: both sides of an
equi-join written with the same bucket count on the join key scan
straight into a SortMergeJoin with ZERO Exchange — the shuffle is paid
once at write time, then amortized over every subsequent join, and a
``sortBy`` on the same key drops the per-join sort too.

Scale math: joining two 100 TB tables shuffles ~200 TB over the network
per run; co-bucketed layouts replace that with local scans. The write
itself costs one shuffle (the same one the first join would have paid).

Bucketed tables must go through the session catalog (``saveAsTable`` —
plain ``parquet(path)`` silently drops bucket metadata, which is why
this helper exists instead of a doc note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    by: list[str] | str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` hash-bucketed by ``by`` into ``n_buckets`` files per
    partition, registered as catalog table ``table`` (external at ``path``
    when given). ``sort=True`` additionally sorts each bucket file by the
    same key, so bucketed joins skip their per-task sort as well.

    Pick ``n_buckets`` so one bucket of the LARGER table fits an executor
    core's working set (~bytes / n_buckets <= a few hundred MB); both join
    sides must use the SAME count for the exchange-free plan.
    """
    by = [by] if isinstance(by, str) else list(by)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *by)
    if sort:
        w = w.sortBy(*by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. The plan
    this produces is the POINT of the layout: assert no Exchange with
    :func:`join_is_exchange_free` (a silent mismatch in bucket count or
    key falls back to a full shuffle without warning)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on, how)


def join_is_exchange_free(df: DataFrame) -> bool:
    """True iff the executed plan contains no shuffle Exchange — the
    contract check for a co-bucketed join (AQE wraps the plan, so string
    inspection covers both adaptive and static plans)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan and (
        "Exchange rangepartitioning" not in plan
    )
