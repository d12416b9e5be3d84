import numpy as np
import pytest

from geoglue_spark import images as I


def test_png_roundtrip_gray():
    pix = I.synth_pixels(3, 16, 8, color=False)
    back = I.decode_png(I.encode_png(pix))
    np.testing.assert_array_equal(back, pix)


def test_png_roundtrip_rgb():
    pix = I.synth_pixels(4, 8, 32, color=True)
    back = I.decode_png(I.encode_png(pix))
    np.testing.assert_array_equal(back, pix)


def test_raw_roundtrip():
    pix = I.synth_pixels(5, 8, 8, color=True)
    back = I.decode_raw(I.encode_raw(pix), 8, 8)
    np.testing.assert_array_equal(back, pix)


def test_qnt_is_lossy_but_psnr_over_40():
    pix = I.synth_pixels(6, 32, 32, color=False)
    back = I.decode_png(I.encode_qnt(pix))
    assert not np.array_equal(back, pix)  # genuinely lossy
    assert I.psnr(pix, back) >= 40.0  # the BASELINE.json invariant


def test_psnr_lossless_inf():
    pix = I.synth_pixels(7, 8, 8)
    assert I.psnr(pix, pix) == float("inf")


def test_phash_stable_under_quantization():
    pix = I.synth_pixels(8, 32, 32)
    back = I.decode_png(I.encode_qnt(pix))
    assert I.hamming64(I.phash64(pix), I.phash64(back)) <= 2


def test_phash_differs_for_different_content():
    a = I.phash64(I.synth_pixels(1, 32, 32))
    b = I.phash64(I.synth_pixels(2000, 32, 32))
    assert I.hamming64(a, b) > 4


def test_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        I.decode_image(b"xx", 2, 2, "jpeg")
    with pytest.raises(NotImplementedError):
        I.encode_image(np.zeros((2, 2), np.uint8), "webp")


def test_images_table_schema_and_determinism(spark):
    from geoglue_spark.synth import images_table

    a = images_table(spark, 200).orderBy("image_id").toPandas()
    b = images_table(spark, 200, partitions=3).orderBy("image_id").toPandas()
    assert list(a.columns) == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lat", "lon", "ts",
    ]
    # identical content regardless of partitioning
    assert (a.image_id == b.image_id).all()
    assert (a.phash == b.phash).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a.bytes, b.bytes))


def test_images_decode_invariants(spark):
    """Per-row invariant vs synthesis: decoded pixels PSNR>=40 (lossy) or
    exact (lossless), captions byte-equal (BASELINE.json input_hint)."""
    from geoglue_spark.synth import DUP_EVERY, images_table

    pdf = images_table(spark, 150).toPandas()
    for _, r in pdf.iterrows():
        i = int(r.image_id[3:])
        ci = max(i - 1, 0) if i % DUP_EVERY == 0 else i
        want = I.synth_pixels(ci, r.w, r.h, color=(ci % 2 == 0))
        got = I.decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        if r.fmt == "qnt":
            assert I.psnr(want, got) >= 40.0
        else:
            np.testing.assert_array_equal(got, want)
        assert r.caption == f"caption for image {ci:012d} over tile ({ci % 64},{ci // 64 % 64})"
        assert int(r.phash) == I.phash64(want)
