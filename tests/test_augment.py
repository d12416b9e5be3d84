"""Augmentation kernels + quality stats + pair-cosine filter.

Training-data-pipeline extensions on the image axis: every kernel pinned
against direct NumPy computation; the distributed operators pinned for
determinism across partitionings (the resumable-epoch contract).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoglue_spark import images as I
from geoglue_spark.operators.multimodal import (
    augment_images,
    filter_pairs_by_cosine,
    image_quality_stats,
)
from geoglue_spark.synth import images_table


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def test_flip_rot_crop_kernels():
    pix = I.synth_pixels(9, 6, 4, color=True)
    np.testing.assert_array_equal(I.flip_h(pix), pix[:, ::-1])
    np.testing.assert_array_equal(I.flip_v(pix), pix[::-1])
    np.testing.assert_array_equal(I.rot90(pix), np.rot90(pix, 1, axes=(0, 1)))
    # involutions / cycles
    np.testing.assert_array_equal(I.flip_h(I.flip_h(pix)), pix)
    np.testing.assert_array_equal(I.rot90(I.rot90(pix, 2), 2), pix)
    np.testing.assert_array_equal(I.crop(pix, 1, 2, 3, 2), pix[2:4, 1:4])
    np.testing.assert_array_equal(I.center_crop(pix, 2, 2), pix[1:3, 2:4])
    with pytest.raises(ValueError):
        I.crop(pix, 4, 0, 3, 2)  # overruns width


def test_sharpness_and_entropy():
    rng = np.random.Generator(np.random.PCG64(1))
    flat = np.full((32, 32), 128, np.uint8)
    noise = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    blurred = I.resize_bilinear(I.resize_area(noise, 8, 8), 32, 32)
    assert I.sharpness(flat) == 0.0
    assert I.sharpness(noise) > I.sharpness(blurred) > 0.0
    assert I.gray_entropy(flat) == 0.0
    assert I.gray_entropy(noise) > 7.0  # near-uniform histogram
    # tiny images degrade gracefully
    assert I.sharpness(np.zeros((2, 2), np.uint8)) == 0.0


# ---------------------------------------------------------------------------
# augment operator
# ---------------------------------------------------------------------------
def test_augment_images_deterministic_and_correct(spark):
    import hashlib

    imgs = images_table(spark, 60)
    out = augment_images(
        imgs, ops=("identity", "flip_h", "rot180"), crop_w=8, crop_h=8, seed=3
    )
    rows = {r.image_id: r for r in out.collect()}
    src = {r.image_id: r for r in imgs.collect()}
    assert rows  # at least the decodable formats survive
    for iid, r in rows.items():
        s = src[iid]
        pix = I.decode_image(bytes(s.bytes), s.w, s.h, s.fmt)
        digest = hashlib.md5(f"{iid}:3".encode()).digest()
        op = ("identity", "flip_h", "rot180")[
            int.from_bytes(digest[:8], "big") % 3
        ]
        pix = I.AUGMENT_KERNELS[op](pix)
        h, w = pix.shape[:2]
        x0 = int.from_bytes(digest[8:12], "big") % (w - 8 + 1)
        y0 = int.from_bytes(digest[12:16], "big") % (h - 8 + 1)
        want = I.crop(pix, x0, y0, 8, 8)
        got = I.decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        np.testing.assert_array_equal(got, want)
        assert r.aug == f"{op}+crop({x0},{y0})"
        assert (r.w, r.h) == (8, 8)
    # partitioning invariance: identical rows at a different layout
    out2 = {
        r.image_id: (bytes(r.bytes), r.aug)
        for r in augment_images(
            imgs.repartition(7),
            ops=("identity", "flip_h", "rot180"),
            crop_w=8,
            crop_h=8,
            seed=3,
        ).collect()
    }
    assert out2 == {k: (bytes(v.bytes), v.aug) for k, v in rows.items()}
    # a different seed changes at least one draw
    out3 = {
        r.image_id: r.aug
        for r in augment_images(
            imgs, ops=("identity", "flip_h", "rot180"), crop_w=8, crop_h=8,
            seed=4,
        ).collect()
    }
    assert out3 != {k: v.aug for k, v in rows.items()}


def test_augment_images_rejects_unknown_op(spark):
    imgs = images_table(spark, 4)
    with pytest.raises(ValueError, match="unknown augment ops"):
        augment_images(imgs, ops=("flip_h", "zoom"))


# ---------------------------------------------------------------------------
# quality stats operator
# ---------------------------------------------------------------------------
def test_image_quality_stats_matches_numpy(spark):
    imgs = images_table(spark, 40)
    out = {r.image_id: r for r in image_quality_stats(imgs).collect()}
    checked = 0
    for s in imgs.collect():
        if s.image_id not in out:
            continue
        pix = I.decode_image(bytes(s.bytes), s.w, s.h, s.fmt)
        r = out[s.image_id]
        assert r.sharpness == pytest.approx(round(I.sharpness(pix), 6))
        assert r.entropy == pytest.approx(round(I.gray_entropy(pix), 6))
        assert r.mean_val == pytest.approx(
            round(float(np.asarray(pix, np.float64).mean()), 6)
        )
        checked += 1
    assert checked >= 30


# ---------------------------------------------------------------------------
# pair-cosine filter
# ---------------------------------------------------------------------------
def test_filter_pairs_by_cosine(spark):
    rows = [
        ("a", [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]),   # cos 1.0
        ("b", [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),   # cos 0.0
        ("c", [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),   # cos ~0.7071
        ("d", [2.0, 0.0, 0.0], [1.0, 0.0, 0.0]),   # scale-invariant: 1.0
    ]
    df = spark.createDataFrame(
        rows, "pair_id string, img_emb array<double>, txt_emb array<double>"
    )
    kept = filter_pairs_by_cosine(df, "img_emb", "txt_emb", 0.5)
    got = {r.pair_id: r.pair_cosine for r in kept.collect()}
    assert set(got) == {"a", "c", "d"}
    assert got["a"] == pytest.approx(1.0)
    assert got["c"] == pytest.approx(0.707107, abs=1e-6)
    # no shuffle, no Python in the plan
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_image_quality_stats_typed_carry(spark):
    """Carry columns keep their input types (an int carry hardcoded as
    string crashed Arrow serialization before the fix)."""
    imgs = images_table(spark, 8).withColumn(
        "label", (F.length("image_id") + F.col("w")).cast("int")
    )
    out = image_quality_stats(imgs, carry=("label",))
    assert dict(out.dtypes)["label"] == "int"
    rows = out.collect()
    assert rows and all(isinstance(r.label, int) for r in rows)
    with pytest.raises(ValueError, match="carry column"):
        image_quality_stats(imgs, carry=("nope",)).collect()
