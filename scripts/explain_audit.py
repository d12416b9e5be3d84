"""Print the physical plan of every registered query and flag anti-patterns:
missing pushed filters, row-at-a-time Python (BatchEvalPython), unexpected
cartesian products, and non-broadcast joins against small dims.

    python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from geoglue_spark.session import get_spark

FLAGS = {
    "BatchEvalPython": "row-at-a-time Python UDF (should be Arrow)",
    "CartesianProduct": "cartesian product",
    "BroadcastNestedLoopJoin": "nested-loop join",
}

# No intentional nested-loop joins remain: kNN uses the bucket-probe
# equi-join and ANN-LSH the probe-signature equi-join.
ALLOW: dict[str, set[str]] = {}

# Plan fragments that MUST appear (positive assertions): the at-rest ANN
# index only scales if the probe signatures reach the scan as a partition
# filter — untouched buckets never listed/read.
REQUIRE: dict[str, list[str]] = {
    "ann_cosine_topk_lsh": ["PartitionFilters: [_sig"],
    "ann_cosine_topk": ["PartitionFilters: [_cluster"],
    "admin_assign_count": ["BroadcastHashJoin"],
    # r4 verdict #7: the r4 operators' scale claims, asserted in-plan.
    # asof: tagged-union + single window carry, NOT a range join (a range
    # join would surface as the globally-flagged BroadcastNestedLoopJoin).
    "asof_event_rates": ["Window [last(_r"],
    # interval: bucketed EQUI-join (BHJ on (_bkt, keys)), never a nested loop.
    "interval_event_counts": ["BroadcastHashJoin"],
    # connected components: the returned frame reads the localCheckpointed
    # RDD — lineage truncated, not the full iterative join tree.
    "dedup_clusters": ["Scan ExistingRDD"],
}

# Shuffle-count ceilings (Exchange hash/range partitioning) — stage-count
# regressions fail the audit before they reach a benchmark: asof is ONE
# operator exchange (window partitioning) + one for the query's right-side
# pre-aggregation; interval is one candidate-bucket exchange + the final
# count; the converged cluster frame re-shuffles once for its summary agg.
MAX_SHUFFLES: dict[str, int] = {
    "asof_event_rates": 2,
    "interval_event_counts": 2,
    # r5: the converged cluster frame takes exactly two comp-keyed
    # exchanges for the quality-aware representative election (member
    # scores + the max/count aggregate; the argmax filter is a post-join
    # inequality so the float never becomes a join key, and the final
    # groupBy reuses the join partitioning)
    "dedup_clusters": 2,
    # r5 folds: token stats = base agg + top-ngram (explode-count +
    # mode window) with a broadcast dim join back; dedup stats = base
    # agg + contamination (doc-distinct gram agg + per-doc overlap agg)
    "doc_token_stats": 4,
    "doc_dedup_stats": 5,
}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])  # flags like -v must not become name filters
    spark = get_spark("explain-audit", cores=4, shuffle_partitions=4)
    bad = 0
    registry = entrymod.queries()
    unknown = only - set(registry)
    if unknown:
        print(f"ERROR: unknown query name(s) {sorted(unknown)}")
        return 2
    for name, fn in registry.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        allowed = ALLOW.get(name, set())
        flags = [msg for pat, msg in FLAGS.items() if pat in plan and pat not in allowed]
        flags += [
            f"missing required plan fragment {frag!r}"
            for frag in REQUIRE.get(name, [])
            if frag not in plan
        ]
        n_shuffles = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        if name in MAX_SHUFFLES and n_shuffles > MAX_SHUFFLES[name]:
            flags.append(
                f"shuffle count {n_shuffles} exceeds ceiling {MAX_SHUFFLES[name]}"
            )
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_arrow = plan.count("ArrowEvalPython")
        status = "FLAG" if flags else "ok"
        if flags:
            bad += 1
        print(
            f"{status:4s} {name:28s} shuffles={n_shuffles} bhj={n_bhj} "
            f"smj={n_smj} arrow={n_arrow} {'; '.join(flags)}"
        )
        if "-v" in sys.argv:
            print(plan)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
