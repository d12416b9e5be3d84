"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path. The kernel is a NumPy matmul per
Arrow batch against a broadcast query matrix; each batch emits only its
LOCAL top-k per query, so the shuffle carries O(batches * k * n_queries)
rows instead of the full n_candidates * n_queries cross product — the
property that matters at 10^9 candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _stack_vectors(s: pd.Series) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list column WITHOUT per-row
    Python (r3 verdict: ``Series.apply`` was the last per-row loop in the
    dedup/similarity family) — ``np.vstack`` consumes the object array of
    per-row buffers in one call."""
    return np.vstack(s.to_numpy()).astype(np.float64, copy=False)


def cosine_col(a, b, decimals: int | None = 6):
    """Cosine similarity between two array<numeric> columns as a pure JVM
    Column expression (no Python at all): element-wise product fold +
    norm folds. Zero-norm vectors behave as norm 1 (matching
    :func:`_normalize`), so cos(0-vec, x) = 0. Computed entirely in double
    — numerically identical (at 6-decimal rounding) to the DuckDB oracle's
    ``list_cosine_similarity`` over ``::DOUBLE[]`` casts."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda s, x: s + x * x))
    cos = dot / (
        F.when(na == 0.0, F.lit(1.0)).otherwise(na)
        * F.when(nb == 0.0, F.lit(1.0)).otherwise(nb)
    )
    return F.round(cos, decimals) if decimals is not None else cos


def cosine_topk(
    candidates: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int | None = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k.

    ``queries``: small (query_id, vector) list, shipped in the UDF closure
    (broadcast by Spark). Deterministic ranking: (rounded sim DESC, id ASC)
    — stable across partitionings and float reduction orders.
    """
    spark = candidates.sparkSession
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf[id_col].to_numpy(np.int64)
            cmat = _normalize(_stack_vectors(pdf[vec_col]))
            sims = cmat @ qmat.T  # (batch, n_queries)
            if sim_decimals is not None:
                sims = np.round(sims, sim_decimals)
            kk = min(k, sims.shape[0])
            # local top-k per query inside the batch
            frames = []
            for j, qid in enumerate(qids):
                order = np.lexsort((cids, -sims[:, j]))[:kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cids[order],
                            "sim": sims[order, j],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    local = candidates.select(id_col, vec_col).mapInPandas(
        local_topk, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """The deterministic hyperplane family: identical for a given
    (dim, n_bits, seed) wherever it is generated (driver, executor, or the
    DuckDB oracle's NumPy replica)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((dim, n_bits))


_SIG_UDF_MEMO: dict[tuple, object] = {}


def hyperplane_signature_udf(dim: int | None, n_bits: int = 16, seed: int = 42):
    """Random-hyperplane LSH signature (deterministic seed): sign pattern of
    n_bits projections — cos-similar vectors collide with high probability.

    ``dim=None`` defers plane generation to the first Arrow batch on each
    worker (vector width read from the data) — plan construction launches
    no Spark job, and the planes are bit-identical to the eager form.

    Memoized per (dim, n_bits, seed): callers get the SAME udf object, so
    plans built on it are Catalyst-``sameResult`` across invocations — the
    dedup scoped signature cache hits instead of recomputing (a fresh udf
    object per call made every query re-sign, re-cache, and re-count the
    whole table: the r4 `embedding_near_dupes` clean-window regression)."""
    memo_key = (dim, n_bits, seed)
    memoed = _SIG_UDF_MEMO.get(memo_key)
    if memoed is not None:
        return memoed
    planes_cache: dict[int, np.ndarray] = {}
    if dim is not None:
        planes_cache[dim] = _hyperplanes(dim, n_bits, seed)

    @F.pandas_udf("long")
    def sig(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int64")
        m = _stack_vectors(vec)
        planes = planes_cache.get(m.shape[1])
        if planes is None:
            planes = planes_cache[m.shape[1]] = _hyperplanes(m.shape[1], n_bits, seed)
        bits = (m @ planes) > 0  # (n, n_bits)
        vals = np.zeros(len(m), dtype=np.int64)
        for b in range(n_bits):
            vals |= bits[:, b].astype(np.int64) << b
        return pd.Series(vals)

    _SIG_UDF_MEMO[memo_key] = sig
    return sig



def _probe_masks(n_bits: int, probe_hamming: int) -> list[int]:
    """Every XOR mask within probe_hamming bit flips (incl. 0)."""
    import itertools

    return [
        sum(1 << b for b in combo)
        for r in range(probe_hamming + 1)
        for combo in itertools.combinations(range(n_bits), r)
    ]


def _query_probes_and_vecs(
    queries: list[tuple[int, list[float]]], dim: int, n_bits: int, probe_hamming: int
) -> tuple[list[tuple[int, int]], dict[int, np.ndarray]]:
    """(query_id, probe_sig) rows + normalized query vectors, from the SAME
    deterministic hyperplanes as hyperplane_signature_udf (seed 42)."""
    planes = _hyperplanes(dim, n_bits, 42)
    masks = _probe_masks(n_bits, probe_hamming)
    probe_rows: list[tuple[int, int]] = []
    qvecs: dict[int, np.ndarray] = {}
    for qid, v in queries:
        vec = np.asarray(v, np.float64)
        bits = (vec @ planes) > 0
        qsig = int(sum(int(b) << i for i, b in enumerate(bits)))
        probe_rows += [(int(qid), qsig ^ m) for m in masks]
        n = np.linalg.norm(vec)
        qvecs[int(qid)] = vec / (n if n else 1.0)
    return probe_rows, qvecs


def _score_topk(
    pruned: DataFrame,
    qvecs: dict[int, np.ndarray],
    k: int,
    id_col: str,
    vec_col: str,
    sim_decimals: int | None,
) -> DataFrame:
    """Shared exact-rerank stage: one scalar pandas UDF over
    (query_id, vec) + deterministic (sim DESC, id ASC) ranking. Single
    source of truth for rounding and tie-break order across the LSH,
    indexed-LSH and IVF paths."""
    spark = pruned.sparkSession
    bc = spark.sparkContext.broadcast(qvecs)

    @F.pandas_udf("double")
    def sim_udf(query_id: pd.Series, vec: pd.Series) -> pd.Series:
        qv = bc.value
        cmat = _normalize(_stack_vectors(vec))
        # vectorized query lookup: sorted-key searchsorted, no per-row dict
        keys = np.fromiter(sorted(qv), dtype=np.int64, count=len(qv))
        qarr = np.vstack([qv[int(k)] for k in keys])  # n_queries rows only
        qmat = qarr[np.searchsorted(keys, query_id.to_numpy(np.int64))]
        s = np.einsum("ij,ij->i", cmat, qmat)
        if sim_decimals is not None:
            s = np.round(s, sim_decimals)
        return pd.Series(s)

    scored = pruned.withColumn("sim", sim_udf(F.col("query_id"), F.col(vec_col)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "sim")
    )


def cosine_topk_lsh(
    candidates: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 12,
    probe_hamming: int = 2,
    sim_decimals: int | None = 6,
) -> DataFrame:
    """Approximate top-k: only candidates whose hyperplane signature is
    within ``probe_hamming`` bits of the query's signature are scored.

    Scale shape: the candidate side carries its signature as a plain
    column (a write-once index at rest — partition/bucket the stored table
    by ``_sig``), and each QUERY explodes to every signature within
    ``probe_hamming`` bit-flips — sum(C(n_bits, 0..h)) probe rows per
    query, broadcast, then a pure broadcast-hash-EQUI-join on the
    signature. No per-candidate predicate evaluation: at 10^9 candidates
    the scan cost is the hash probe, and with a signature-partitioned
    store the untouched buckets are never read.
    """
    dim = len(queries[0][1])
    sig_udf = hyperplane_signature_udf(dim, n_bits)
    with_sig = candidates.withColumn("_sig", sig_udf(F.col(vec_col)))
    probe_rows, qvecs = _query_probes_and_vecs(queries, dim, n_bits, probe_hamming)
    spark = candidates.sparkSession
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "query_id long, psig long")
    )
    pruned = with_sig.join(probes, F.col("_sig") == F.col("psig")).select(
        id_col, vec_col, "query_id"
    )
    return _score_topk(pruned, qvecs, k, id_col, vec_col, sim_decimals)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantization by nearest centroid, store
# partitioned by cluster, query probes the nprobe nearest clusters only.
# Centroids come from a deterministic seeded sample (k-means would need
# iteration; sampled centroids give the same partition-pruning shape and
# keep builds reproducible).
# ---------------------------------------------------------------------------
def _ivf_centroids(
    candidates: DataFrame, n_clusters: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic centroid pick: the n_clusters rows with the smallest
    xxhash64(id) — a reproducible pseudo-random sample. orderBy().limit(n)
    compiles to TakeOrderedAndProject (per-partition top-n heaps + driver
    merge, verified in the plan), NOT a full sort — O(scan) at any scale."""
    rows = (
        candidates.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_clusters)
        .collect()
    )
    return _normalize(
        np.stack([np.asarray(r[vec_col], np.float64) for r in rows])
    )


def build_ivf_index(
    candidates: DataFrame,
    path: str,
    n_clusters: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Write an IVF index: every vector goes to its nearest (by cosine)
    centroid's partition. Returns the centroid matrix — persist it next to
    the index (tiny) or regenerate from the same candidates. Assignment is
    one Arrow-batched matmul per batch; the write is partitioned by
    cluster id, so probe queries read only nprobe directories."""
    cents = _ivf_centroids(candidates, n_clusters, id_col, vec_col)
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def cluster_udf(vec: pd.Series) -> pd.Series:
        m = _normalize(_stack_vectors(vec))
        return pd.Series(np.argmax(m @ bc.value.T, axis=1).astype(np.int32))

    (
        candidates.select(id_col, vec_col)
        .withColumn("_cluster", cluster_udf(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("_cluster")
        .parquet(path)
    )
    return cents


def cosine_topk_ivf(
    spark,
    index_path: str,
    centroids: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int | None = 6,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """IVF probe: per query, scan only the ``nprobe`` clusters whose
    centroids are most cosine-similar, then exact rerank. The cluster list
    becomes an IN partition filter — untouched clusters are never read.
    Recall rises with nprobe (nprobe = n_clusters degrades to exact scan).

    ``index_df``: pass the opened store to amortize partition discovery
    across query batches (same contract as cosine_topk_lsh_indexed).
    """
    qids = [int(q) for q, _ in queries]
    qmat = _normalize(np.array([v for _, v in queries], np.float64))
    sims_qc = qmat @ centroids.T  # (n_queries, n_clusters)
    order = np.argsort(-sims_qc, axis=1)[:, :nprobe]
    pairs = [
        (qid, int(c)) for qid, clusters in zip(qids, order) for c in clusters
    ]
    probe_df = F.broadcast(
        spark.createDataFrame(pairs, "query_id long, _cluster int")
    )
    all_clusters = sorted({c for _, c in pairs})
    index = index_df if index_df is not None else spark.read.parquet(index_path)
    pruned = (
        index.filter(F.col("_cluster").isin(all_clusters))  # partition prune
        .join(probe_df, "_cluster")
        .select(id_col, vec_col, "query_id")
    )
    qvecs = {qid: qmat[i] for i, qid in enumerate(qids)}
    return _score_topk(pruned, qvecs, k, id_col, vec_col, sim_decimals)


# ---------------------------------------------------------------------------
# ANN index at rest: signature-PARTITIONED candidate store. Build once, then
# every query batch reads ONLY the probed buckets (partition pruning at the
# file-listing level) — at 10^9 candidates the untouched ~99 % of the store
# is never opened.
# ---------------------------------------------------------------------------
def build_ann_index(
    candidates: DataFrame,
    path: str,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Write the candidates as a parquet table PARTITIONED BY the
    hyperplane signature (one directory per occupied bucket, <= 2^n_bits).
    The signature family is the same deterministic seed as
    cosine_topk_lsh, so indexes are query-compatible."""
    sig_udf = hyperplane_signature_udf(None, n_bits)  # dim read from the data
    (
        candidates.select(id_col, vec_col)
        .withColumn("_sig", sig_udf(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("_sig")
        .parquet(path)
    )
    return path


def cosine_topk_lsh_indexed(
    spark,
    index_path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 12,
    probe_hamming: int = 2,
    sim_decimals: int | None = 6,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """cosine_topk_lsh against a :func:`build_ann_index` store: the probe
    signatures become an IN-list partition filter, so the scan lists and
    reads ONLY the probed buckets (check PartitionFilters in the plan).
    Results are identical to cosine_topk_lsh over the same candidates.

    ``index_df``: pass the opened store to amortize partition discovery
    across query batches — re-opening a (2^n_bits)-directory store pays a
    driver-side file listing per call."""
    dim = len(queries[0][1])
    probe_rows, qvecs = _query_probes_and_vecs(queries, dim, n_bits, probe_hamming)
    index = index_df if index_df is not None else spark.read.parquet(index_path)
    all_probes = sorted({ps for _, ps in probe_rows})
    pruned_scan = index.filter(F.col("_sig").isin(all_probes))  # partition prune
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "query_id long, psig long")
    )
    pruned = pruned_scan.join(probes, F.col("_sig") == F.col("psig")).select(
        id_col, vec_col, "query_id"
    )
    return _score_topk(pruned, qvecs, k, id_col, vec_col, sim_decimals)


# --------------------------------------------------------------------------
# int8 at-rest quantization (4x smaller index, bounded recall loss)
# --------------------------------------------------------------------------
def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "qvec",
    scale_col: str = "qscale",
    keep_original: bool = False,
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an ``array<float>``
    column: ``q[i] = round(x[i] / scale)`` with ``scale = max|x| / 127``,
    stored as (``array<tinyint>``, one float scale). Pure JVM Column
    expressions — no Python, rides whole-stage codegen, and the quantized
    store is ~4x smaller at rest than float32 (the number that matters
    when a 10^12-vector ANN index must fit a cluster's disks / page
    cache). Reconstruction error is bounded by scale/2 per element, so
    cosine ranking degrades gracefully (see the recall pytest).

    Zero vectors quantize to all-zero with scale 1. Dequantize with
    :func:`dequantize_embeddings`.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = F.when(amax > 0.0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    out = df.withColumn(
        q_col, F.transform(vec, lambda x: F.round(x / scale).cast("tinyint"))
    ).withColumn(scale_col, scale.cast("float"))
    return out if keep_original else out.drop(vec_col)


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "qvec",
    scale_col: str = "qscale",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: reconstruct an
    ``array<float>`` column (``x[i] ~= q[i] * scale``). Also pure JVM; the
    reconstructed column feeds any of the cosine_topk* paths unchanged."""
    return df.withColumn(
        vec_col,
        F.transform(
            F.col(q_col),
            lambda v: (v.cast("double") * F.col(scale_col)).cast("float"),
        ),
    ).drop(q_col, scale_col)
