import numpy as np
import pytest
from pyspark.sql import functions as F

from geoglue_spark.operators.similarity import cosine_topk, cosine_topk_lsh


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    return df, vecs


def _numpy_topk(vecs, qidx, cand_ids, k):
    q = vecs[qidx].astype(np.float64)
    q = q / np.linalg.norm(q)
    out = {}
    for qi, qv in zip(qidx, q if q.ndim > 1 else [q]):
        pass
    res = {}
    qs = vecs[qidx].astype(np.float64)
    qs = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    cs = vecs[cand_ids].astype(np.float64)
    cs = cs / np.linalg.norm(cs, axis=1, keepdims=True)
    sims = np.round(cs @ qs.T, 6)
    for j, qi in enumerate(qidx):
        order = np.lexsort((cand_ids, -sims[:, j]))[:k]
        res[qi] = [int(cand_ids[o]) for o in order]
    return res


def test_bruteforce_matches_numpy(spark, emb):
    df, vecs = emb
    qidx = [0, 1, 2]
    queries = [(i, [float(x) for x in vecs[i]]) for i in qidx]
    cands = df.filter(F.col("vec_id") >= 3)
    got = cosine_topk(cands, queries, k=5).toPandas()
    want = _numpy_topk(vecs, qidx, np.arange(3, 200), 5)
    for qi in qidx:
        g = got[got.query_id == qi].sort_values("rank").neighbor_id.tolist()
        assert g == want[qi], f"query {qi}"


def test_topk_deterministic_across_partitionings(spark, emb):
    df, vecs = emb
    queries = [(0, [float(x) for x in vecs[0]])]
    a = cosine_topk(df.repartition(2), queries, k=10).toPandas()
    b = cosine_topk(df.repartition(13), queries, k=10).toPandas()
    assert a.sort_values("rank").neighbor_id.tolist() == b.sort_values("rank").neighbor_id.tolist()


def test_lsh_recall(spark, emb):
    df, vecs = emb
    qidx = [0, 1, 2, 3]
    queries = [(i, [float(x) for x in vecs[i]]) for i in qidx]
    cands = df.filter(F.col("vec_id") >= 4)
    exact = cosine_topk(cands, queries, k=5).toPandas()
    approx = cosine_topk_lsh(cands, queries, k=5, n_bits=10, probe_hamming=3).toPandas()
    recalls = []
    for qi in qidx:
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(approx[approx.query_id == qi].neighbor_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls


def test_self_similarity_rank1(spark, emb):
    df, vecs = emb
    queries = [(5, [float(x) for x in vecs[5]])]
    got = cosine_topk(df, queries, k=3).toPandas()  # candidate set includes the query itself
    assert got[got["rank"] == 1].neighbor_id.iloc[0] == 5
    assert got[got["rank"] == 1].sim.iloc[0] == 1.0


def test_ann_index_at_rest_partition_pruned(spark, tmp_path):
    """build_ann_index + cosine_topk_lsh_indexed must (a) return exactly
    what cosine_topk_lsh returns over the same candidates, and (b) scan
    only the probed signature buckets (partition pruning)."""
    from geoglue_spark.operators.similarity import (
        build_ann_index,
        cosine_topk_lsh,
        cosine_topk_lsh_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter("vec_id < 5").collect()
    ]
    cands = emb.filter("vec_id >= 5")
    path = str(tmp_path / "ann_index")
    build_ann_index(cands, path, n_bits=12)

    direct = cosine_topk_lsh(cands, qs, k=5, n_bits=12, probe_hamming=4).orderBy(
        "query_id", "rank"
    )
    indexed = cosine_topk_lsh_indexed(
        spark, path, qs, k=5, n_bits=12, probe_hamming=4
    ).orderBy("query_id", "rank")
    assert [tuple(r) for r in direct.collect()] == [tuple(r) for r in indexed.collect()]

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [_sig#" in plan and "INSET" in plan


def test_ivf_index_recall_and_pruning(spark, tmp_path):
    """IVF: partition-pruned probe scan; recall@5 vs exact brute force must
    be high at nprobe=8/64 and exact at nprobe=n_clusters."""
    from geoglue_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        cosine_topk_ivf,
    )

    # clustered data (IVF's regime; on isotropic-random vectors recall is
    # necessarily ~nprobe/n_clusters — no index can beat that structure):
    # 40 gaussian clusters of 25 points, queries drawn near cluster centers
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(7))
    centers = rng.standard_normal((40, 32)) * 4.0
    rows = []
    vid = 100
    for ci, c in enumerate(centers):
        for _ in range(25):
            rows.append((vid, [float(x) for x in c + rng.standard_normal(32) * 0.3]))
            vid += 1
    cands = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = [
        (int(i), [float(x) for x in centers[i] + rng.standard_normal(32) * 0.3])
        for i in range(10)
    ]
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(cands, path, n_clusters=64)
    assert cents.shape == (64, 32)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(cands, qs, k=5).collect()
    }
    probed_df = cosine_topk_ivf(spark, path, cents, qs, k=5, nprobe=8)
    probed = {(r.query_id, r.neighbor_id) for r in probed_df.collect()}
    recall = len(exact & probed) / len(exact)
    assert recall >= 0.8, recall
    plan = probed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [_cluster#" in plan

    full = cosine_topk_ivf(spark, path, cents, qs, k=5, nprobe=64)
    assert {(r.query_id, r.neighbor_id) for r in full.collect()} == exact


def test_quantize_roundtrip_error_bound(spark, emb):
    """Per-element reconstruction error <= scale/2 (+ float32 store eps);
    zero vectors survive; plan is pure JVM (no Python eval nodes)."""
    from geoglue_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    df, vecs = emb
    withzero = df.union(
        spark.createDataFrame([(999, [0.0] * 16)], "vec_id long, embedding array<float>")
    )
    q = quantize_embeddings(withzero, keep_original=True)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # Arrow or Batch — neither allowed
    back = dequantize_embeddings(q.withColumnRenamed("embedding", "orig"))
    err = back.select(
        F.max(
            F.aggregate(
                F.zip_with(
                    "orig",
                    "embedding",
                    lambda a, b: F.abs(a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda s, v: F.greatest(s, v),
            )
        ).alias("maxerr"),
        F.max(
            F.array_max(F.transform("orig", lambda x: F.abs(x.cast("double"))))
            / F.lit(254.0)
        ).alias("bound"),
    ).collect()[0]
    # bound uses the GLOBAL max-amax; per-row scale/2 <= that, plus a hair
    # of float32 scale-storage rounding
    assert err.maxerr <= err.bound * (1 + 1e-5)
    zero = back.filter("vec_id = 999").collect()[0]
    assert list(zero.embedding) == [0.0] * 16


def test_quantized_topk_recall(spark, emb):
    """recall@10 of brute-force cosine over int8-dequantized vectors vs
    the float32 originals: >= 0.9 mean across queries (int8 keeps ~2
    decimal digits per element; rank inversions happen only between
    near-equal sims)."""
    from geoglue_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    df, vecs = emb
    qidx = [0, 1, 2, 3, 4]
    queries = [(i, [float(x) for x in vecs[i]]) for i in qidx]
    cands = df.filter(F.col("vec_id") >= 5)
    exact = cosine_topk(cands, queries, k=10).toPandas()
    deq = dequantize_embeddings(quantize_embeddings(cands))
    approx = cosine_topk(deq, queries, k=10).toPandas()
    recalls = []
    for qi in qidx:
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(approx[approx.query_id == qi].neighbor_id)
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9, recalls
