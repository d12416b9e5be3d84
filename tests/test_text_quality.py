"""Gopher-style repetition metrics, contamination overlap, PII ops.

Reference analog: the reference has no text-quality layer (nearest is
attrs validation, validate.py:37-98); these are the training-data-pipeline
extensions the engine adds. Every metric is pinned against a pure-Python
oracle on planted and randomized documents.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

import geoglue_spark.operators.text as TX


# ---------------------------------------------------------------------------
# pure-Python oracles
# ---------------------------------------------------------------------------
def py_dup_line_frac(text: str) -> float:
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    if not lines:
        return 0.0
    return (len(lines) - len(set(lines))) / len(lines)


def py_dup_line_char_frac(text: str) -> float:
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    total = sum(len(l) for l in lines)
    if not total:
        return 0.0
    c = Counter(lines)
    dup = sum(len(l) for l in lines if c[l] > 1)
    return dup / total


def py_top_ngram(text: str, n: int):
    toks = text.strip().lower().split()
    if len(toks) < n or not text.strip():
        return None
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    c = Counter(grams)
    best = max(c.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0]]))
    # tie-break: highest count, then lexicographically smallest gram
    maxc = max(c.values())
    gram = min(g for g, k in c.items() if k == maxc)
    return gram, maxc, round(maxc * len(gram) / len(text), 6) if len(text) else 0.0


def py_contamination(doc: str, bench_grams: set, n: int):
    toks = doc.strip().lower().split()
    if len(toks) < n or not doc.strip():
        return 0, 0
    grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return len(grams), len(grams & bench_grams)


def _rand_doc(rng: random.Random) -> str:
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    lines = []
    for _ in range(rng.randint(0, 8)):
        lines.append(" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 6))))
    if rng.random() < 0.5 and lines:
        lines.append(rng.choice(lines))  # plant a duplicate line
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# duplicate-line fractions
# ---------------------------------------------------------------------------
def test_dup_line_frac_planted(spark):
    docs = [
        ("a", "copy me\nunique one\ncopy me\nanother"),
        ("b", "all\ndifferent\nlines"),
        ("c", ""),
        ("d", "   \n  \n"),
        ("e", "x\nx\nx\nx"),
        ("f", "long boilerplate line here\nshort\nlong boilerplate line here"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = {
        r.doc_id: (r.lf, r.cf)
        for r in df.select(
            "doc_id",
            TX.dup_line_frac_col(F.col("text")).alias("lf"),
            TX.dup_line_char_frac_col(F.col("text")).alias("cf"),
        ).collect()
    }
    for doc_id, text in docs:
        assert out[doc_id][0] == pytest.approx(py_dup_line_frac(text)), doc_id
        assert out[doc_id][1] == pytest.approx(py_dup_line_char_frac(text)), doc_id
    # char weighting catches the long boilerplate harder than line counting
    assert out["f"][1] > out["f"][0]


def test_dup_line_frac_randomized(spark):
    rng = random.Random(42)
    docs = [(str(i), _rand_doc(rng)) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = {
        r.doc_id: (r.lf, r.cf)
        for r in df.select(
            "doc_id",
            TX.dup_line_frac_col(F.col("text")).alias("lf"),
            TX.dup_line_char_frac_col(F.col("text")).alias("cf"),
        ).collect()
    }
    for doc_id, text in docs:
        assert out[doc_id][0] == pytest.approx(py_dup_line_frac(text)), doc_id
        assert out[doc_id][1] == pytest.approx(py_dup_line_char_frac(text)), doc_id


# ---------------------------------------------------------------------------
# top n-gram
# ---------------------------------------------------------------------------
def test_top_ngram_stats_planted(spark):
    docs = [
        ("a", "buy now buy now buy now limited offer"),
        ("b", "every word appears once only here"),
        ("c", "tie aa tie bb tie aa tie bb"),  # 'aa tie'/'bb tie'/'tie aa'/'tie bb' ties
        ("d", "one"),  # shorter than n=2 -> zero-fraction row, RETAINED
        ("e", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = {
        r.doc_id: (r.top_ngram, r.top_ngram_count, r.top_ngram_char_frac)
        for r in TX.top_ngram_stats(df, "text", "doc_id", n=2).collect()
    }
    # short/empty docs survive as zero rows (a gate joining on
    # frac < threshold must not silently drop them)
    assert out["d"] == (None, 0, 0.0) and out["e"] == (None, 0, 0.0)
    for doc_id, text in docs:
        exp = py_top_ngram(text, 2)
        if exp is None:
            assert out[doc_id] == (None, 0, 0.0)
            continue
        gram, cnt, frac = exp
        assert out[doc_id][0] == gram, doc_id
        assert out[doc_id][1] == cnt, doc_id
        assert out[doc_id][2] == pytest.approx(frac, abs=1e-6), doc_id
    # determinism of the tie-break: smallest gram among the tied
    assert out["c"][0] == "aa tie"


def test_top_ngram_stats_randomized_and_carry(spark):
    rng = random.Random(7)
    docs = [
        (str(i), "s%d" % (i % 3), " ".join(rng.choice("abcde") for _ in range(rng.randint(2, 40))))
        for i in range(150)
    ]
    df = spark.createDataFrame(docs, "doc_id string, source string, text string")
    rows = TX.top_ngram_stats(df, "text", "doc_id", n=3, carry=("source",)).collect()
    out = {r.doc_id: r for r in rows}
    for doc_id, source, text in docs:
        exp = py_top_ngram(text, 3)
        if exp is None:
            r = out[doc_id]  # retained as a zero row, carry intact
            assert (r.top_ngram, r.top_ngram_count, r.top_ngram_char_frac) == (
                None, 0, 0.0,
            )
            assert r.source == source
            continue
        gram, cnt, frac = exp
        r = out[doc_id]
        assert (r.top_ngram, r.top_ngram_count) == (gram, cnt), doc_id
        assert r.source == source
        assert r.top_ngram_char_frac == pytest.approx(frac, abs=1e-6)


# ---------------------------------------------------------------------------
# contamination overlap
# ---------------------------------------------------------------------------
def test_contamination_overlap_planted(spark):
    bench_texts = [
        "the quick brown fox jumps over the lazy dog",
        "to be or not to be that is the question",
    ]
    n = 3
    bench_grams = set()
    for t in bench_texts:
        toks = t.lower().split()
        bench_grams |= {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    docs = [
        # verbatim inclusion -> heavy overlap
        ("a", "I said the quick brown fox jumps over everything"),
        # no overlap at all
        ("b", "completely unrelated training text with many words"),
        # exact benchmark copy -> frac 1.0
        ("c", bench_texts[1]),
        # too short for any gram
        ("d", "tiny doc"),
        ("e", ""),
    ]
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    bdf = spark.createDataFrame([(t,) for t in bench_texts], "text string")
    out = {
        r.doc_id: r
        for r in TX.contamination_overlap(ddf, bdf, n=n).collect()
    }
    assert set(out) == {d for d, _ in docs}  # gram-less docs still present
    for doc_id, text in docs:
        n_grams, n_overlap = py_contamination(text, bench_grams, n)
        r = out[doc_id]
        assert (r.n_grams, r.n_overlap) == (n_grams, n_overlap), doc_id
        exp_frac = round(n_overlap / n_grams, 6) if n_grams else 0.0
        assert r.contaminated_frac == pytest.approx(exp_frac, abs=1e-6)
    assert out["c"].contaminated_frac == 1.0
    assert out["b"].n_overlap == 0
    assert out["d"].n_grams == 0 and out["d"].contaminated_frac == 0.0


def test_contamination_overlap_non_broadcast_matches(spark):
    rng = random.Random(3)
    mk = lambda k: " ".join(rng.choice("pqrstuv") for _ in range(k))
    docs = [(str(i), mk(rng.randint(0, 25))) for i in range(80)]
    bench = [(mk(rng.randint(5, 15)),) for _ in range(10)]
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    bdf = spark.createDataFrame(bench, "text string")
    a = sorted(
        map(tuple, TX.contamination_overlap(ddf, bdf, n=4).collect())
    )
    b = sorted(
        map(
            tuple,
            TX.contamination_overlap(
                ddf, bdf, n=4, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------
def test_pii_counts_and_redaction(spark):
    rows = [
        ("a", "mail me at jane.doe+x@example.co.uk or call 555-123-4567"),
        ("b", "server at 192.168.1.1 and 10.0.0.255 no mail"),
        ("c", "clean text with no identifiers at all"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            TX.pii_counts_col(F.col("text"), "email").alias("n_email"),
            TX.pii_counts_col(F.col("text"), "phone").alias("n_phone"),
            TX.pii_counts_col(F.col("text"), "ipv4").alias("n_ip"),
            TX.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out["a"].n_email, out["a"].n_phone) == (1, 1)
    assert out["b"].n_ip == 2
    assert (out["c"].n_email, out["c"].n_phone, out["c"].n_ip) == (0, 0, 0)
    assert (out["d"].n_email, out["d"].n_phone, out["d"].n_ip) == (0, 0, 0)
    assert "jane.doe" not in out["a"].red and "[PII]" in out["a"].red
    assert "4567" not in out["a"].red
    assert "192.168.1.1" not in out["b"].red
    assert out["c"].red == rows[2][1]  # untouched
    # redaction never leaves a raw match behind
    import re

    for r in out.values():
        for pat in TX.PII_PATTERNS.values():
            assert not re.search(pat, r.red.replace("[PII]", ""))


# ---------------------------------------------------------------------------
# corpus-level boilerplate line removal
# ---------------------------------------------------------------------------
def py_remove_boilerplate(docs: list[tuple], min_docs: int):
    from collections import defaultdict

    owners = defaultdict(set)
    for doc_id, text in docs:
        for l in (x.strip() for x in text.split("\n")):
            if l:
                owners[l].add(doc_id)
    boiler = {l for l, o in owners.items() if len(o) >= min_docs}
    out = {}
    for doc_id, text in docs:
        lines = [x.strip() for x in text.split("\n") if x.strip()]
        kept = [l for l in lines if l not in boiler]
        out[doc_id] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_remove_boilerplate_lines_planted(spark):
    docs = [
        (1, "COOKIE BANNER\nreal content one\nfooter text"),
        (2, "COOKIE BANNER\nreal content two\nfooter text"),
        (3, "COOKIE BANNER\nunique paragraph here"),
        (4, "totally original document\nwith its own lines"),
        (5, ""),
        (6, "  \n \n"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.text, r.n_lines, r.n_removed)
        for r in TX.remove_boilerplate_lines(df, min_docs=2).collect()
    }
    exp = py_remove_boilerplate(docs, 2)
    assert out == exp
    assert out[1][0] == "real content one"  # banner + footer stripped
    assert out[4][2] == 0  # unique doc untouched
    assert out[5] == ("", 0, 0) and out[6] == ("", 0, 0)


def test_remove_boilerplate_lines_randomized(spark):
    rng = random.Random(11)
    chrome = ["nav home about", "copyright 2026 corp", "subscribe now"]
    docs = []
    for i in range(120):
        lines = [
            " ".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(0, 6))
        ]
        for c in chrome:
            if rng.random() < 0.4:
                lines.insert(rng.randrange(len(lines) + 1), c)
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: (r.text, r.n_lines, r.n_removed)
        for r in TX.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert out == py_remove_boilerplate(docs, 3)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------
def py_pack(docs: list[tuple], budget: int):
    run = 0
    out = {}
    for doc_id, nt in sorted(docs):
        out[doc_id] = (nt, run // budget)
        run += nt
    return out


def test_pack_sequences_matches_serial_oracle(spark):
    rng = random.Random(5)
    docs = [(i, rng.randint(1, 300)) for i in range(500)]
    df = spark.createDataFrame(docs, "doc_id long, n long")
    out = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in TX.pack_sequences(
            df, token_col="n", budget=1000, bucket_size=64
        ).collect()
    }
    assert out == py_pack(docs, 1000)
    # shards are contiguous in id order and roughly budget-sized
    shards = [out[i][1] for i in range(500)]
    assert shards == sorted(shards)


def test_pack_sequences_partitioning_invariant(spark):
    rng = random.Random(9)
    docs = [(i, " ".join("w" for _ in range(rng.randint(1, 40)))) for i in range(300)]
    df1 = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    df2 = spark.createDataFrame(docs, "doc_id long, text string").repartition(2)
    a = sorted(
        (r.doc_id, r.shard_id)
        for r in TX.pack_sequences(df1, budget=256, bucket_size=50).collect()
    )
    b = sorted(
        (r.doc_id, r.shard_id)
        for r in TX.pack_sequences(df2, budget=256, bucket_size=17).collect()
    )
    assert a == b  # same ids -> same shards under any partitioning/bucketing


def test_top_ngram_stats_retains_short_and_empty_docs(spark):
    """Docs with < n tokens (or empty text) must emit a ZERO-fraction row
    — the gate pattern join(filter(frac < t), left_semi) would otherwise
    silently drop them from the corpus."""
    from geoglue_spark.operators.text import top_ngram_stats

    df = spark.createDataFrame(
        [(0, "single"), (1, ""), (2, "two tokens"), (3, "a a a a")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in top_ngram_stats(df, "text", "doc_id", n=2).collect()}
    assert set(got) == {0, 1, 2, 3}
    for short in (0, 1):
        assert got[short].top_ngram is None
        assert got[short].top_ngram_count == 0
        assert got[short].top_ngram_char_frac == 0.0
    assert got[2].top_ngram == "two tokens" and got[2].top_ngram_count == 1
    assert got[3].top_ngram == "a a" and got[3].top_ngram_count == 3


def test_pack_sequences_rejects_string_ids(spark):
    """Bucketing divides the id — a string id would hash to NULL buckets
    (silent empty output) or throw mid-job under ANSI; fail fast."""
    from geoglue_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [("doc1", "a b c"), ("doc2", "d e")], "doc_id string, text string"
    )
    with pytest.raises(TypeError, match="numeric id_col"):
        pack_sequences(df, budget=10)


def test_token_counts_null_text_is_zero(spark):
    """NULL text: token counts must be 0, not size(split(NULL)) = -1 —
    a negative count corrupts quality scores and packing prefix sums."""
    from geoglue_spark.operators.text import (
        bpe_ish_token_count_col,
        stopword_ratio_col,
        token_count_col,
    )

    df = spark.createDataFrame([(None,), ("a b",), ("",)], "text string")
    got = df.select(
        token_count_col(F.col("text")).alias("n"),
        bpe_ish_token_count_col(F.col("text")).alias("nb"),
        stopword_ratio_col(F.col("text")).alias("sw"),
    ).collect()
    assert [(r.n, r.nb, r.sw) for r in got] == [(0, 0, 0.0), (2, 2, 0.5), (0, 0, 0.0)]
