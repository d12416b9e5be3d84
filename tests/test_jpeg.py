"""Pure-NumPy baseline JPEG codec — spec-pinned golden markers,
round-trip PSNR across shapes/subsampling, the BASELINE.json PSNR >= 40
lossy invariant on the engine's own fixtures, and phash stability of the
lossy round trip (the pipeline property dedup relies on)."""

import struct

import numpy as np
import pytest

from geoglue_spark.images import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
    synth_pixels,
)
from geoglue_spark.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(xx / 9) + np.cos(yy / 7)) * 60 + 128).clip(0, 255).astype(np.uint8)


def test_golden_markers():
    """Byte positions per ITU-T T.81: SOI, JFIF APP0, SOF0 with big-endian
    (height, width), component count, EOI."""
    buf = encode_jpeg(_gradient(18, 58), quality=90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert buf[2:4] == b"\xff\xe0" and buf[6:11] == b"JFIF\x00"
    i = buf.find(b"\xff\xc0")
    assert i > 0
    assert buf[i + 4] == 8  # sample precision
    assert struct.unpack(">HH", buf[i + 5 : i + 9]) == (18, 58)
    assert buf[i + 9] == 1  # grayscale: one component
    rgb = np.stack([_gradient(18, 58)] * 3, axis=-1)
    buf3 = encode_jpeg(rgb, quality=90, subsampling="420")
    j = buf3.find(b"\xff\xc0")
    assert buf3[j + 9] == 3
    assert buf3[j + 11] == 0x22  # Y sampling factors (2,2) in 4:2:0


@pytest.mark.parametrize("shape", [(8, 8), (17, 31), (18, 58), (40, 56), (64, 48)])
def test_round_trip_gray(shape):
    img = _gradient(*shape)
    back = decode_jpeg(encode_jpeg(img, quality=92))
    assert back.shape == img.shape and back.dtype == np.uint8
    assert psnr(img, back) >= 40


@pytest.mark.parametrize("sub", ["444", "420"])
def test_round_trip_color(sub):
    g = _gradient(30, 46)
    rgb = np.stack([g, (0.5 * g + 60).astype(np.uint8), np.roll(g, 3, axis=1)], axis=-1)
    back = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling=sub))
    assert back.shape == rgb.shape
    assert psnr(rgb, back) >= (40 if sub == "444" else 32)


def test_fuzz_sizes_and_stuffing():
    """Random sizes: exercises byte stuffing and the literal-0xFF-then-
    0xD0-0xD7 data sequence that must NOT parse as a restart marker."""
    rng = np.random.default_rng(0)
    for _ in range(25):
        h, w = int(rng.integers(8, 80)), int(rng.integers(8, 80))
        img = _gradient(h, w)
        back = decode_jpeg(encode_jpeg(img, quality=92))
        assert back.shape == (h, w) and psnr(img, back) >= 40


def test_engine_fixture_psnr_and_phash():
    """The input_hint invariant on the engine's OWN image content: lossy
    jpg re-encode at the dispatch default holds PSNR >= 40 dB, and the
    perceptual hash moves at most 2 bits."""
    for i in range(6):
        for (w, h, color) in ((48, 32, True), (64, 48, False)):
            pix = synth_pixels(i, w, h, color=color)
            buf = encode_image(pix, "jpg")
            back = decode_image(buf, w, h, "jpg")
            assert psnr(pix, back) >= 40.0
            assert hamming64(phash64(pix), phash64(back)) <= 2


def test_decoder_rejects_non_baseline():
    buf = bytearray(encode_jpeg(_gradient(16, 16)))
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # progressive SOF
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(buf))


def test_decoder_rejects_truncated():
    buf = encode_jpeg(_gradient(32, 32))
    with pytest.raises(ValueError):
        decode_jpeg(buf[: len(buf) // 2])


def test_reencode_psnr_operator_jpg(spark):
    """multimodal.reencode_psnr now measures a REAL lossy codec: every
    fixture image re-encodes through jpg at >= 40 dB inside Arrow
    batches."""
    from geoglue_spark.operators.multimodal import reencode_psnr
    from geoglue_spark.synth import images_table

    imgs = images_table(spark, 60)
    out = reencode_psnr(imgs, fmt="jpg").toPandas()
    assert len(out) == 60
    assert (out.refmt == "jpg").all()
    assert (out.psnr_db >= 40.0).all()
