"""Deduplication suite — exact, phash-Hamming, MinHash-LSH, SimHash.

A10 (phash dedup) from SURVEY.md §2.4 plus the training-data-pipeline
dedup family. Design rules at 100 TB scale:

  * candidate generation NEVER compares all pairs: banding (LSH) or
    prefix-bucketing bounds the join to same-bucket pairs;
  * bit math (XOR + bit_count) stays JVM-side — only signature
    *generation* from text touches Python, Arrow-batched;
  * pair outputs are canonicalized (a < b) so results are
    partitioning-independent.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup_stats(df: DataFrame, text_col: str, by: list[str] = ()) -> DataFrame:
    """Per-group document/distinct counts on a content fingerprint."""
    fp = F.md5(F.col(text_col))
    keys = list(by) or [F.lit(1).alias("all")]
    return df.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(fp).alias("n_distinct"),
        (F.count("*") - F.count_distinct(fp)).alias("n_dupes"),
    )


def exact_dedup_keep_first(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest-id row per exact content — deterministic across
    partitionings; one shuffle (partial-agg combines map-side)."""
    fp = F.md5(F.col(text_col)).alias("_fp")
    keep = df.select(fp, F.col(id_col)).groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


# --------------------------------------------------------------------------
# phash near-dup (Hamming distance on 64-bit perceptual hashes)
# --------------------------------------------------------------------------
def phash_near_dupes(
    df: DataFrame, phash_col: str = "phash", id_col: str = "image_id", max_hamming: int = 8
) -> DataFrame:
    """Near-duplicate image pairs by phash Hamming distance.

    Banding: split the 64-bit hash into 4 x 16-bit bands; two hashes within
    Hamming distance 3 share >= 1 exact band (pigeonhole), and max_hamming
    <= 8 keeps high recall in practice. Join is equi on (band_idx, band
    value) — never all-pairs; XOR + bit_count verification is pure JVM.
    """
    bands = df.select(
        F.col(id_col).alias("_id"),
        F.col(phash_col).alias("_ph"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col(phash_col), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("_id", "_ph", "b.band_idx", "b.band")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._ph").bitwiseXOR(F.col("b._ph"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# --------------------------------------------------------------------------
# MinHash + LSH over text shingles
# --------------------------------------------------------------------------
def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = np.frombuffer(hashlib.blake2b(g.encode(), digest_size=8).digest(), np.uint64)[0]
    return out


# universal-hash parameters: h_i(x) = (a_i * x + b_i) mod p, deterministic seed
_MH_P = np.uint64((1 << 61) - 1)


def _mh_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(42))
    a = rng.integers(1, int(_MH_P), size=n_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MH_P), size=n_perm, dtype=np.uint64)
    return a, b


def minhash_udf(n_perm: int = 64, shingle_k: int = 3):
    """Arrow UDF: text -> array<long> of n_perm minhashes of word-k-shingles."""
    a, b = _mh_params(n_perm)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def mh(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = _shingle_hashes(t or "", shingle_k)
            # (n_perm, n_shingles) universal hashes, min over shingles
            hv = (a[:, None] * sh[None, :] + b[:, None]) % _MH_P
            out.append(hv.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return mh


def minhash_near_dupes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with estimated Jaccard.

    signature -> band rows (band hash of rows-per-band values) -> equi-join
    on (band_idx, band_hash) -> verify by full-signature agreement fraction
    (unbiased Jaccard estimate). Shuffle volume = n_docs * bands rows.
    """
    rows_per_band = n_perm // bands
    sig = df.select(
        F.col(id_col).alias("_id"), minhash_udf(n_perm, shingle_k)(F.col(text_col)).alias("_sig")
    ).cache()
    band_rows = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.hash(F.slice("_sig", i * rows_per_band + 1, rows_per_band)).alias(
                            "band_hash"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("_id", "_sig", "b.band_idx", "b.band_hash")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("sig_a"),
            F.col("b._sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    return (
        cand.withColumn("jaccard_est", agree / F.lit(n_perm))
        .filter(F.col("jaccard_est") >= min_jaccard)
        .select("id_a", "id_b", "jaccard_est")
    )


# --------------------------------------------------------------------------
# SimHash (64-bit) over tokens
# --------------------------------------------------------------------------
def simhash_udf():
    @F.pandas_udf(T.LongType())
    def sh(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            toks = (t or "").split()
            if not toks:
                out[i] = 0
                continue
            hv = np.empty(len(toks), dtype=np.uint64)
            for j, tok in enumerate(toks):
                hv[j] = np.frombuffer(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), np.uint64
                )[0]
            bits = (hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
            votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            val = np.uint64(0)
            for bit in range(64):
                if votes[bit] > 0:
                    val |= np.uint64(1) << np.uint64(bit)
            out[i] = val.view(np.int64) if isinstance(val, np.uint64) else int(val)
        return pd.Series(out)

    return sh


def simhash_near_dupes(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs: signature in Arrow UDF, then the same
    band-join + JVM bit_count verification as phash."""
    sigs = df.select(F.col(id_col).alias(id_col), simhash_udf()(F.col(text_col)).alias("phash"))
    return phash_near_dupes(sigs, "phash", id_col, max_hamming)


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------
def embedding_near_dupes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_cosine: float = 0.95,
    n_bits: int = 12,
    band_hamming: int = 1,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    Candidate generation via random-hyperplane signatures (same family as
    similarity.cosine_topk_lsh): pairs whose signatures differ in
    <= band_hamming bits are scored exactly; never all-pairs. Output
    (id_a, id_b, cosine) canonicalized a < b.
    """
    import pandas as pd

    from .similarity import hyperplane_signature_udf, _normalize

    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], f"id_a long, id_b long, cosine double"
        )
    dim = len(first[0])
    sig = hyperplane_signature_udf(dim, n_bits)
    with_sig = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), sig(F.col(vec_col)).alias("_sig")
    )
    # multiprobe equi-join (scales, unlike a non-equi self-join): the LEFT
    # side emits its signature plus every <=band_hamming-bit-flip variant;
    # an exact match on the RIGHT's plain signature covers all pairs within
    # that Hamming radius. Fan-out = 1 + n_bits (for radius 1).
    if band_hamming > 1:
        raise NotImplementedError("multiprobe implemented for band_hamming <= 1")
    probes = [F.col("_sig")]
    if band_hamming >= 1:
        probes += [
            F.col("_sig").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)
        ]
    a = with_sig.select(
        "_id", "_v", F.explode(F.array(*probes)).alias("_probe")
    ).alias("a")
    b = with_sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._probe") == F.col("b._sig")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    @F.pandas_udf(T.DoubleType())
    def cos_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = _normalize(np.stack(va.apply(lambda v: np.asarray(v, np.float64))))
        mb = _normalize(np.stack(vb.apply(lambda v: np.asarray(v, np.float64))))
        return pd.Series(np.round(np.einsum("ij,ij->i", ma, mb), 6))

    return (
        cand.withColumn("cosine", cos_udf(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs)
# --------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str, id_col: str, shingle_k: int = 3
) -> DataFrame:
    """Exact word-shingle Jaccard for candidate pairs (the verify stage
    after any LSH): join texts, compute in an Arrow UDF."""

    @F.pandas_udf(T.DoubleType())
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            sa = set(map(int, _shingle_hashes(x or "", shingle_k)))
            sb = set(map(int, _shingle_hashes(y or "", shingle_k)))
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 1.0
        return pd.Series(out)

    texts = df.select(F.col(id_col), F.col(text_col))
    return (
        pairs.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed(text_col, "_ta"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed(text_col, "_tb"), "id_b")
        .withColumn("jaccard", jac(F.col("_ta"), F.col("_tb")))
        .drop("_ta", "_tb")
    )
