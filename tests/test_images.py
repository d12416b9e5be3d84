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
    # webp remains a genuine stub; jpeg is now implemented, so garbage
    # bytes fail with a decode error rather than NotImplementedError
    with pytest.raises(NotImplementedError):
        I.decode_image(b"xx", 2, 2, "webp")
    with pytest.raises(NotImplementedError):
        I.encode_image(np.zeros((2, 2), np.uint8), "webp")
    with pytest.raises(ValueError, match="not a JPEG"):
        I.decode_image(b"xx", 2, 2, "jpeg")


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


def test_resize_bilinear_identity_and_constant():
    pix = I.synth_pixels(11, 16, 12, color=True)
    np.testing.assert_array_equal(I.resize_bilinear(pix, 16, 12), pix)  # identity
    const = np.full((9, 7), 137, np.uint8)
    for fn in (I.resize_nearest, I.resize_bilinear, I.resize_area):
        assert (fn(const, 13, 5) == 137).all()  # constants survive any kernel


def test_resize_bilinear_matches_naive_oracle():
    """Per-pixel double-loop oracle of the half-pixel-center convention."""
    rng = np.random.Generator(np.random.PCG64(17))
    pix = rng.integers(0, 256, size=(7, 11), dtype=np.uint8)
    out_h, out_w = 5, 16
    want = np.empty((out_h, out_w))
    for oy in range(out_h):
        for ox in range(out_w):
            fy = (oy + 0.5) * (7 / out_h) - 0.5
            fx = (ox + 0.5) * (11 / out_w) - 0.5
            y0, x0 = int(np.floor(fy)), int(np.floor(fx))
            wy, wx = min(max(fy - y0, 0.0), 1.0), min(max(fx - x0, 0.0), 1.0)
            yc0, yc1 = min(max(y0, 0), 6), min(max(y0 + 1, 0), 6)
            xc0, xc1 = min(max(x0, 0), 10), min(max(x0 + 1, 0), 10)
            a = float(pix[yc0, xc0]) * (1 - wx) + float(pix[yc0, xc1]) * wx
            b = float(pix[yc1, xc0]) * (1 - wx) + float(pix[yc1, xc1]) * wx
            want[oy, ox] = a * (1 - wy) + b * wy
    got = I.resize_bilinear(pix, out_w, out_h)
    np.testing.assert_array_equal(got, np.rint(want).clip(0, 255).astype(np.uint8))


def test_resize_area_exact_block_mean():
    rng = np.random.Generator(np.random.PCG64(23))
    pix = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    got = I.resize_area(pix, 6, 4)  # integer factors 2x2
    want = np.rint(
        pix.astype(np.float64).reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    ).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    # upscale falls back to bilinear (no empty-bin division)
    np.testing.assert_array_equal(
        I.resize_area(pix, 24, 16), I.resize_bilinear(pix, 24, 16)
    )


def test_resize_letterbox_geometry():
    pix = np.full((10, 20), 200, np.uint8)  # 2:1 landscape
    out = I.resize_letterbox(pix, 16, 16, pad_value=3)
    assert out.shape == (16, 16)
    # scaled to 16x8, centered vertically: rows 4..11 content, rest pad
    assert (out[4:12] == 200).all()
    assert (out[:4] == 3).all() and (out[12:] == 3).all()
    # color canvas keeps channel dim; content square for portrait input
    rgb = np.full((30, 15, 3), 90, np.uint8)
    out3 = I.resize_letterbox(rgb, 12, 12, pad_value=0)
    assert out3.shape == (12, 12, 3)
    assert (out3[:, 3:9] == 90).all()
    assert (out3[:, :3] == 0).all() and (out3[:, 9:] == 0).all()


def test_resize_images_letterbox(spark):
    from geoglue_spark.images import decode_image, resize_letterbox
    from geoglue_spark.operators.multimodal import resize_images
    from geoglue_spark.synth import images_table

    imgs = images_table(spark, 8)
    src = {
        r.image_id: decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        for r in imgs.collect()
    }
    out = resize_images(
        imgs, 10, 10, out_fmt="raw", letterbox=True, pad_value=5
    ).collect()
    assert len(out) == 8
    for r in out:
        got = decode_image(bytes(r.bytes), 10, 10, "raw")
        np.testing.assert_array_equal(
            got, resize_letterbox(src[r.image_id], 10, 10, pad_value=5)
        )


def test_resize_images_methods(spark):
    from geoglue_spark.images import RESIZE_KERNELS, decode_image
    from geoglue_spark.operators.multimodal import resize_images
    from geoglue_spark.synth import images_table

    imgs = images_table(spark, 12)
    src = {
        r.image_id: decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        for r in imgs.collect()
    }
    for method, kernel in RESIZE_KERNELS.items():
        out = resize_images(imgs, 6, 5, out_fmt="raw", method=method).collect()
        assert len(out) == 12
        for r in out:
            got = decode_image(bytes(r.bytes), 6, 5, "raw")
            np.testing.assert_array_equal(got, kernel(src[r.image_id], 6, 5))
    with pytest.raises(ValueError, match="unknown resize method"):
        resize_images(imgs, 6, 5, method="lanczos")


def test_resize_images(spark):
    from geoglue_spark.images import decode_image
    from geoglue_spark.operators.multimodal import resize_images
    from geoglue_spark.synth import images_table

    imgs = images_table(spark, 30)
    out = resize_images(imgs, 8, 8, out_fmt="raw").collect()
    assert len(out) == 30  # raw/png/qnt all decode natively
    import numpy as np

    for r in out[:5]:
        assert (r.w, r.h, r.fmt) == (8, 8, "raw")
        pix = decode_image(bytes(r.bytes), 8, 8, "raw")
        assert pix.shape[:2] == (8, 8)
    # resize is deterministic: same input -> same bytes across partitionings
    again = {r.image_id: bytes(r.bytes) for r in resize_images(imgs.repartition(7), 8, 8).collect()}
    assert {r.image_id: bytes(r.bytes) for r in out} == again


def test_sample_video_frames_plumbing(spark):
    import numpy as np

    from geoglue_spark.operators.multimodal import encode_rawvid, sample_video_frames

    rng = np.random.Generator(np.random.PCG64(5))
    rows = []
    for vid in range(3):
        frames = rng.integers(0, 256, size=(25, 4, 6), dtype=np.uint8)
        rows.append((f"v{vid}", encode_rawvid(frames), "rawvid"))
    rows.append(("v_real", b"\x00\x00\x00\x18ftypmp42", "mp4"))  # real codec -> dropped
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    out = sample_video_frames(df, every_n=10).toPandas()
    # 25 frames sampled every 10 -> idx 0, 10, 20 per video; mp4 dropped
    assert sorted(out.video_id.unique()) == ["v0", "v1", "v2"]
    assert sorted(out[out.video_id == "v0"].frame_idx) == [0, 10, 20]
    assert (out.w == 6).all() and (out.h == 4).all()
    assert len(bytes(out.frame.iloc[0])) == 24


def test_audio_features_plumbing(spark):
    import numpy as np

    from geoglue_spark.operators.multimodal import audio_features

    t = np.arange(16000, dtype=np.float64) / 16000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 10000).astype("<i2")
    rows = [("a0", sine.tobytes(), "rawpcm"), ("a1", b"\xff\xfb\x90", "mp3")]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = {r.audio_id: r for r in audio_features(df).collect()}
    assert set(out) == {"a0"}  # mp3 dropped (no codec)
    r = out["a0"]
    assert abs(r.duration_sec - 1.0) < 1e-9
    assert abs(r.rms - 10000 / 2**0.5) < 100  # sine RMS = A/sqrt(2)
    assert abs(r.zcr - 2 * 440 / 16000) < 0.005  # 880 crossings/sec

def test_png_filters_1_to_4_round_trip():
    """All five PNG scanline filters (None/Sub/Up/Average/Paeth) must
    encode -> decode bit-exactly for gray and RGB (r2 verdict #5: filters
    1-4 were a stub)."""
    import numpy as np

    from geoglue_spark.images import decode_png, encode_png, synth_pixels

    rng = np.random.Generator(np.random.PCG64(5))
    gray = synth_pixels(3, 23, 17)
    rgb = synth_pixels(4, 19, 13, color=True)
    noisy = rng.integers(0, 256, size=(11, 29), dtype=np.uint8)
    for img in (gray, rgb, noisy):
        for ftype in range(5):
            buf = encode_png(img, filter_type=ftype)
            out = decode_png(buf)
            np.testing.assert_array_equal(out, img), ftype


def test_png_mixed_filters_per_scanline():
    """Decoder handles per-line filter bytes (real encoders mix filters):
    splice scanlines filtered with different types into one IDAT."""
    import struct
    import zlib

    import numpy as np

    from geoglue_spark.images import (
        _PNG_SIG,
        _chunk,
        _filter_scanlines,
        decode_png,
        synth_pixels,
    )

    img = synth_pixels(9, 8, 5)  # (5, 8) gray
    # filter each line y with type y % 5, chaining priors correctly
    raw = bytearray()
    for y in range(img.shape[0]):
        two = _filter_scanlines(img[: y + 1], 1, y % 5)
        # take the LAST line's filtered bytes (priors consistent)
        raw += two[-(img.shape[1] + 1):]
    ihdr = struct.pack(">IIBBBBB", img.shape[1], img.shape[0], 8, 0, 0, 0, 0)
    buf = (
        _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(buf), img)


def test_png_filtered_through_spark_decode_path(spark):
    """Filtered PNGs flow through the Arrow decode UDF end-to-end."""
    import numpy as np

    from geoglue_spark.images import encode_png, phash64, synth_pixels
    from geoglue_spark.operators.multimodal import decode_stats

    rows = []
    for i, ftype in enumerate([1, 2, 3, 4]):
        px = synth_pixels(i, 16, 16)
        rows.append((f"f{ftype}", encode_png(px, filter_type=ftype), 16, 16,
                     "png", f"cap {i}", phash64(px)))
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )
    got = decode_stats(df).collect()
    assert len(got) == 4 and all(r.mean_px > 0 for r in got)


def test_image_truth_matches_distributed_decode(spark, tmp_path):
    """The ground-truth table (pixels -> gray mean, no codec round trip)
    must agree bit-for-bit with the engine's distributed decode for the
    lossless formats — the invariant behind the image_tile_zonal oracle —
    and DISAGREE for the lossy qnt rows (which is why that query filters
    them out)."""
    import pandas as pd

    from geoglue_spark.operators.multimodal import decode_stats
    from geoglue_spark.synth import image_truth_parquet, images_table

    n = 120
    truth = pd.read_parquet(image_truth_parquet(n, root=str(tmp_path)))
    dec = (
        decode_stats(images_table(spark, n))
        .select("image_id", "fmt", "mean_px", "w", "h")
        .toPandas()
    )
    m = dec.merge(truth, on="image_id", validate="one_to_one")
    assert len(m) == n
    assert (m.n_px == m.w * m.h).all()
    lossless = m[m.fmt != "qnt"]
    lossy = m[m.fmt == "qnt"]
    assert len(lossless) and len(lossy)
    # bit-exact equality, not allclose: lossless decode must reproduce the
    # synthesized pixels exactly
    assert (lossless.mean_px_x == lossless.mean_px_y).all()
    # quantization moves the mean for (nearly) every qnt image
    assert (lossy.mean_px_x != lossy.mean_px_y).mean() > 0.9


def test_decode_stats_carry_validation(spark):
    """Carrying a base input/output column would duplicate it in the
    select and crash the Arrow task with an opaque error; unknown names
    should fail fast too."""
    import pytest

    from geoglue_spark.operators.multimodal import decode_stats
    from geoglue_spark.synth import images_table

    imgs = images_table(spark, 5)
    with pytest.raises(ValueError, match="collide"):
        decode_stats(imgs, carry=("bytes",))
    with pytest.raises(ValueError, match="collide"):
        decode_stats(imgs, carry=("phash",))
    with pytest.raises(ValueError, match="not in input"):
        decode_stats(imgs, carry=("nope",))
    # a legitimate carry still works
    out = decode_stats(imgs, carry=("caption",)).toPandas()
    assert "caption" in out.columns and len(out) == 5
