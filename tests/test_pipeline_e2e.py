"""End-to-end training-data pipeline composition: the operators are
tested individually elsewhere; this pins that they COMPOSE — one
DataFrame flowing dedup → cluster-resolution → keep-first → split →
sample → decode/resize/features with the cross-stage invariants a real
pipeline depends on (no duplicate survivors, disjoint splits, exact
per-stratum quotas, payload integrity through resize)."""

import numpy as np
from pyspark.sql import functions as F

from geoglue_spark.synth import DUP_EVERY, images_table


def test_image_training_pipeline_composes(spark):
    from geoglue_spark.images import decode_image
    from geoglue_spark.operators.dedup import (
        near_dedup_keep_first,
        phash_near_dupes,
    )
    from geoglue_spark.operators.multimodal import (
        resize_images,
        thumbnail_features,
    )
    from geoglue_spark.operators.sample import train_test_split

    n = 300
    imgs = images_table(spark, n)

    # 1. near-dup detection + transitive keep-first on the phash column
    pairs = phash_near_dupes(imgs, "phash", "image_id", max_hamming=0)
    deduped = near_dedup_keep_first(imgs, pairs, "image_id")
    kept = deduped.count()
    # keep-first at hamming 0 keeps exactly ONE row per distinct phash
    # (the synthetic gradients collide beyond the injected duplicates —
    # that's the point of transitive resolution)
    assert kept == imgs.select("phash").distinct().count()
    assert deduped.groupBy("phash").count().filter("count > 1").count() == 0
    # the injected copy of each i-1 (i % DUP_EVERY == 0) never survives
    # its smaller-id original
    survivors = {r.image_id for r in deduped.select("image_id").collect()}
    for i in range(DUP_EVERY, n, DUP_EVERY):
        assert f"img{i:012d}" not in survivors

    # 2. deterministic split on the deduped set: disjoint + exhaustive
    split = train_test_split(deduped, 0.2, ["image_id"])
    counts = dict(
        (r.split, r.n)
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert sum(counts.values()) == kept

    # 3. train side -> letterbox-resize -> feature extraction; one row per
    # input, payloads decode to the exact letterbox shape
    train = split.filter("split = 'train'").drop("split")
    n_train = train.count()
    resized = resize_images(train, 12, 12, out_fmt="raw", letterbox=True)
    rows = resized.collect()
    assert len(rows) == n_train
    for r in rows[:10]:
        assert decode_image(bytes(r.bytes), r.w, r.h, r.fmt).shape[:2] == (12, 12)

    feats = thumbnail_features(resized, grid=8)
    fr = feats.collect()
    assert len(fr) == n_train
    assert all(len(r.embedding) == 64 for r in fr[:10])

    # 4. the whole chain is deterministic: re-running from a repartitioned
    # source yields byte-identical resized payloads
    again = resize_images(
        train.repartition(7), 12, 12, out_fmt="raw", letterbox=True
    )
    assert {(r.image_id, bytes(r.bytes)) for r in rows} == {
        (r.image_id, bytes(r.bytes)) for r in again.collect()
    }


def test_document_pipeline_with_stratified_cap(spark):
    """Documents: near-dup pairs -> keep-first -> per-language stratified
    cap — group sizes come out exactly min(cap, group size)."""
    from geoglue_spark.operators.dedup import (
        minhash_near_dupes,
        near_dedup_keep_first,
    )
    from geoglue_spark.operators.sample import stratified_sample
    from geoglue_spark.operators.text import lang_id_col

    rows = []
    for i in range(60):
        text = f"unique document number {i} with content tokens " + " ".join(
            f"w{i}_{j}" for j in range(12)
        )
        rows.append((i, text))
    # 10 exact dup pairs: 60..69 duplicate 0..9
    for i in range(10):
        rows.append((60 + i, rows[i][1]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_near_dupes(docs, "text", "doc_id", min_jaccard=0.9)
    deduped = near_dedup_keep_first(docs, pairs, "doc_id")
    assert deduped.count() == 60  # the 10 higher-id copies dropped
    assert deduped.filter("doc_id >= 60").count() == 0

    stamped = deduped.withColumn("lang", lang_id_col(F.col("text"))).withColumn(
        "bucket", (F.col("doc_id") % 3).cast("string")
    )
    capped = stratified_sample(stamped, ["bucket"], 15, ["doc_id"])
    sizes = {
        r.bucket: r.n
        for r in capped.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"0": 15, "1": 15, "2": 15}


def test_text_curation_pipeline_composes(spark):
    """The r5 curation family composes end to end: boilerplate strip →
    exact dedup keep-first → contamination filter → quality gates →
    sequence packing. Invariants: boilerplate never survives, benchmark
    copies are gone, shards cover survivors exactly once with contiguous
    budget-ordered ids."""
    import random

    from geoglue_spark.operators.dedup import exact_dedup_keep_first
    from geoglue_spark.operators.text import (
        contamination_overlap,
        pack_sequences,
        remove_boilerplate_lines,
        token_count_col,
        top_ngram_stats,
    )

    rng = random.Random(17)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    chrome = "subscribe to our newsletter today"
    bench_text = "held out benchmark question answer pair"
    docs = []
    for i in range(200):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(10, 40)))
        lines = [body]
        if i % 3 == 0:
            lines.insert(0, chrome)           # boilerplate in 1/3 of docs
        if i % 50 == 7:
            lines.append(bench_text)          # planted contamination
        if i % 25 == 0 and i > 0:
            docs.append((i * 1000, "\n".join(lines)))  # exact dupe id
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bdf = spark.createDataFrame([(bench_text,)], "text string")

    # 1. corpus boilerplate strip: the chrome line appears in >= 60 docs
    clean = remove_boilerplate_lines(df, min_docs=10)
    assert clean.filter(F.col("text").contains(chrome)).count() == 0
    assert clean.count() == len(docs)

    # 2. exact dedup (post-strip: stripped copies collide exactly)
    deduped = exact_dedup_keep_first(clean, "text", "doc_id")
    assert (
        deduped.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    )

    # 3. contamination gate at 5-gram granularity drops the planted docs
    cont = contamination_overlap(deduped, bdf, n=5)
    flagged = {r.doc_id for r in cont.filter("n_overlap > 0").collect()}
    assert flagged  # the planted docs carry the benchmark 5-grams
    surviving = deduped.join(
        cont.filter("n_overlap = 0").select("doc_id"), "doc_id", "left_semi"
    )
    assert surviving.filter(F.col("text").contains(bench_text)).count() == 0

    # 4. quality gate: top-2-gram char fraction below 0.5. A short doc
    # over a 10-word vocab CAN legitimately be 2-gram-dominated, so
    # verify the gate drops exactly the docs a pure-Python oracle calls
    # degenerate rather than assuming none exist.
    rep = top_ngram_stats(surviving, "text", "doc_id", n=2)
    gated = surviving.join(
        rep.filter("top_ngram_char_frac < 0.5").select("doc_id"),
        "doc_id",
        "left_semi",
    )

    def py_top2_frac(text):
        toks = text.lower().split()
        if len(toks) < 2:
            return 0.0
        counts = {}
        for a, b in zip(toks, toks[1:]):
            g = f"{a} {b}"
            counts[g] = counts.get(g, 0) + 1
        best = max(counts.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
        return len(best[0]) * best[1] / len(text)

    degenerate = {
        r.doc_id
        for r in surviving.collect()
        if py_top2_frac(r.text) >= 0.5
    }
    assert {r.doc_id for r in gated.collect()} == (
        {r.doc_id for r in surviving.collect()} - degenerate
    )

    # 5. pack into ~500-token shards: every survivor lands in exactly one
    # shard, shards are contiguous in id order, budget respected serially
    packed = pack_sequences(gated, budget=500, bucket_size=37)
    rows = sorted(
        (r.doc_id, r.n_tokens, r.shard_id) for r in packed.collect()
    )
    assert len(rows) == gated.count()
    run, expect = 0, []
    for doc_id, nt, shard in rows:
        expect.append(run // 500)
        run += nt
    assert [s for _, _, s in rows] == expect
