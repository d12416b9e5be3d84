"""WAV (RIFF/WAVE PCM) and MJPEG (raw motion-JPEG stream) codecs — the
r5 upgrade of the last two multimodal stubs — plus their Spark operators.

NumPy oracles throughout: PCM WAV must round-trip bit-exactly; MJPEG
frames must hold >= 40 dB PSNR at the fixture quality and split
correctly even when marker-looking bytes hide inside segment payloads.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geoglue_spark.av import (
    _jpeg_frame_end,
    decode_mjpeg,
    decode_wav,
    encode_mjpeg,
    encode_wav,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(seed))


@pytest.mark.parametrize(
    "n,ch,sr", [(1, 1, 8000), (1001, 1, 16000), (500, 2, 44100), (4097, 3, 48000)]
)
def test_wav_round_trip_bit_exact(n, ch, sr):
    pcm = _rng(n + ch).integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    out, sr2 = decode_wav(encode_wav(pcm, sr))
    assert sr2 == sr
    assert out.shape == (n, ch)
    assert (out == pcm).all()


def test_wav_mono_1d_input():
    pcm = _rng(7).integers(-32768, 32768, size=333, dtype=np.int16)
    out, _ = decode_wav(encode_wav(pcm, 16000))
    assert out.shape == (333, 1) and (out[:, 0] == pcm).all()


def test_wav_odd_data_chunk_is_word_aligned():
    """RIFF chunks are word-aligned: an odd-byte data chunk (mono,
    odd sample count is always even bytes at 16-bit — force oddness with
    a trailing extra chunk instead) must still parse, and the RIFF size
    field must cover the pad byte."""
    pcm = _rng(9).integers(-100, 100, size=11, dtype=np.int16)
    buf = encode_wav(pcm, 8000)
    declared = 8 + struct.unpack_from("<I", buf, 4)[0]
    assert declared == len(buf)
    # appending a chunk AFTER data must not confuse the walk
    extra = b"cue " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    hacked = buf + extra
    hacked = b"RIFF" + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    out, _ = decode_wav(hacked)
    assert (out[:, 0] == pcm).all()


def test_wav_skips_unknown_chunks_before_data():
    pcm = _rng(3).integers(-32768, 32768, size=(64, 2), dtype=np.int16)
    buf = encode_wav(pcm, 22050)
    lst = b"LIST" + struct.pack("<I", 10) + b"INFOIART\x00\x00"
    hacked = buf[:12] + lst + buf[12:]
    hacked = b"RIFF" + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    out, sr = decode_wav(hacked)
    assert sr == 22050 and (out == pcm).all()


def test_wav_rejects_non_pcm_and_non_riff():
    pcm = np.zeros(8, dtype=np.int16)
    buf = bytearray(encode_wav(pcm, 8000))
    buf[20] = 85  # fmt codec id -> MP3
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + bytes(40))
    with pytest.raises(ValueError, match="int16"):
        encode_wav(np.zeros(8, dtype=np.float32), 8000)


def test_mjpeg_round_trip_psnr():
    frames = np.stack(
        [
            ((np.add.outer(np.arange(32) * 5, np.arange(48) * 3) + f * 17) % 256).astype(
                np.uint8
            )
            for f in range(7)
        ]
    )
    dec = decode_mjpeg(encode_mjpeg(frames, quality=95))
    assert len(dec) == 7
    for d, f in zip(dec, frames):
        assert d.shape == (32, 48)
        mse = np.mean((d.astype(np.float64) - f.astype(np.float64)) ** 2)
        assert 10 * np.log10(255.0**2 / mse) >= 40.0


def test_mjpeg_rgb_frames():
    fr = _rng(11).integers(0, 256, size=(3, 16, 16, 3), dtype=np.uint8)
    # smooth it so JPEG has a chance; exactness not required, shape is
    fr = (fr // 8) * 8
    dec = decode_mjpeg(encode_mjpeg(fr, quality=92, subsampling="420"))
    assert len(dec) == 3 and dec[0].shape == (16, 16, 3)


def test_jpeg_frame_end_ignores_marker_bytes_in_segment_payloads():
    """An EOI byte pattern INSIDE a COM segment payload must not truncate
    the frame — the splitter walks segments, it does not grep for FFD9."""
    frame = ((np.add.outer(np.arange(16), np.arange(16)) * 7) % 256).astype(np.uint8)
    buf = encode_mjpeg(frame[None], quality=90)
    # inject a COM segment right after SOI whose payload contains FFD9+FFD8
    payload = b"ab\xff\xd9\xff\xd8cd"
    com = b"\xff\xfe" + struct.pack(">H", 2 + len(payload)) + payload
    hacked = buf[:2] + com + buf[2:]
    assert _jpeg_frame_end(hacked, 0) == len(hacked)
    two = hacked + buf
    assert _jpeg_frame_end(two, 0) == len(hacked)
    dec = decode_mjpeg(buf + hacked + buf)
    assert len(dec) == 3 and all((d == dec[0]).all() for d in dec)


def test_mjpeg_truncated_raises():
    frame = np.zeros((8, 8), dtype=np.uint8)
    buf = encode_mjpeg(frame[None])
    with pytest.raises(ValueError, match="EOI"):
        decode_mjpeg(buf[:-1])


# ---------------------------------------------------------------------------
# Spark operators over the real containers
# ---------------------------------------------------------------------------


def test_audio_features_wav_matches_numpy(spark):
    from geoglue_spark.operators.multimodal import audio_features

    t = np.arange(8000, dtype=np.float64) / 16000.0
    sine = (np.sin(2 * np.pi * 220 * t) * 12000).astype(np.int16)
    stereo = np.stack([sine, (sine * 0.5).astype(np.int16)], axis=1)
    rows = [
        ("w0", encode_wav(sine, 16000), "wav"),
        ("w1", encode_wav(stereo, 32000), "wav"),
        ("p0", sine.astype("<i2").tobytes(), "rawpcm"),
        ("x0", b"\xff\xfb\x90\x00", "mp3"),  # no codec -> dropped
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = {r.audio_id: r for r in audio_features(df).collect()}
    assert set(out) == {"w0", "w1", "p0"}
    ref = np.sqrt(np.mean(sine.astype(np.float64) ** 2))
    assert out["w0"].rms == pytest.approx(ref, abs=0)
    assert out["w0"].sr == 16000 and out["w0"].n_samples == 8000
    assert out["p0"].rms == pytest.approx(ref, abs=0)
    # stereo mixes down before rms: mean of (x, 0.5x) = 0.75x
    mix = stereo.astype(np.float64).mean(axis=1)
    assert out["w1"].rms == pytest.approx(np.sqrt(np.mean(mix**2)), abs=0)
    assert out["w1"].sr == 32000 and out["w1"].duration_sec == 8000 / 32000


def test_video_frames_mjpeg_and_rawvid(spark):
    from geoglue_spark.operators.multimodal import (
        decode_video_frames,
        encode_rawvid,
        sample_video_frames,
    )

    frames = np.stack(
        [((np.add.outer(np.arange(16) * 3, np.arange(32) * 5) + f * 11) % 256).astype(np.uint8) for f in range(5)]
    )
    rows = [
        ("m0", encode_mjpeg(frames, quality=95), "mjpeg"),
        ("r0", encode_rawvid(frames), "rawvid"),
        ("h0", b"\x00\x00\x00\x18ftypmp42", "mp4"),  # no codec -> dropped
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    out = decode_video_frames(df).toPandas()
    assert sorted(out.video_id.unique()) == ["m0", "r0"]
    assert sorted(out[out.video_id == "m0"].frame_idx) == [0, 1, 2, 3, 4]
    assert (out.w == 32).all() and (out.h == 16).all()
    # rawvid is lossless: decoded bytes identical to the source frames
    r0 = out[out.video_id == "r0"].sort_values("frame_idx")
    for i, fr in enumerate(r0.frame):
        assert np.frombuffer(fr, dtype=np.uint8).reshape(16, 32).tolist() == frames[i].tolist()
    # mjpeg is lossy but bounded
    m0 = out[out.video_id == "m0"].sort_values("frame_idx")
    for i, fr in enumerate(m0.frame):
        d = np.frombuffer(fr, dtype=np.uint8).reshape(16, 32).astype(np.float64)
        mse = np.mean((d - frames[i].astype(np.float64)) ** 2)
        assert mse == 0.0 or 10 * np.log10(255.0**2 / mse) >= 40.0
    # every_n sampling still works over mjpeg
    s = sample_video_frames(df, every_n=2).toPandas()
    assert sorted(s[s.video_id == "m0"].frame_idx) == [0, 2, 4]


def test_decode_audio_pcm_bytes(spark):
    from geoglue_spark.operators.multimodal import decode_audio

    pcm = _rng(5).integers(-32768, 32768, size=777, dtype=np.int16)
    df = spark.createDataFrame(
        [("a", encode_wav(pcm, 24000), "wav")],
        "audio_id string, bytes binary, fmt string",
    )
    r = decode_audio(df).collect()[0]
    assert r.sr == 24000 and r.n_samples == 777
    assert (np.frombuffer(bytes(r.pcm), dtype="<i2") == pcm).all()


def test_resample_pcm_numpy_oracle():
    from geoglue_spark.av import resample_pcm

    # identity
    pcm = _rng(2).integers(-32768, 32768, size=64, dtype=np.int16)
    assert (resample_pcm(pcm, 16000, 16000) == pcm).all()
    # exact 2x upsample of a ramp: midpoints are exact averages
    ramp = (np.arange(10, dtype=np.int16) * 100)
    up = resample_pcm(ramp, 8000, 16000)
    assert len(up) == 20
    assert (up[0::2] == ramp).all()
    assert (up[1:19:2] == (ramp[:-1] + 50)).all()
    # 2x downsample picks every other sample (aligned first sample)
    down = resample_pcm(up, 16000, 8000)
    assert (down == ramp).all()
    # length rule + clamped right edge, non-integer ratio
    x = _rng(3).integers(-32768, 32768, size=441, dtype=np.int16)
    y = resample_pcm(x, 44100, 16000)
    assert len(y) == round(441 * 16000 / 44100)
    # stereo keeps channels independent
    st = np.stack([ramp, ramp[::-1]], axis=1).astype(np.int16)
    both = resample_pcm(st, 8000, 16000)
    assert (both[:, 0] == resample_pcm(ramp, 8000, 16000)).all()
    assert (both[:, 1] == resample_pcm(ramp[::-1].copy(), 8000, 16000)).all()
    with pytest.raises(ValueError, match="int16"):
        resample_pcm(np.zeros(4, dtype=np.float64), 1, 2)
    with pytest.raises(ValueError, match="positive"):
        resample_pcm(ramp, 0, 16000)


def test_resample_audio_operator(spark):
    from geoglue_spark.operators.multimodal import audio_features, resample_audio

    t = np.arange(32000, dtype=np.float64) / 32000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 9000).astype(np.int16)
    df = spark.createDataFrame(
        [
            ("hi", encode_wav(sine, 32000), "wav"),
            ("raw", sine[:16000].astype("<i2").tobytes(), "rawpcm"),
            ("mp3", b"\xff\xfb\x90\x00", "mp3"),
        ],
        "audio_id string, bytes binary, fmt string",
    )
    out = resample_audio(df, sr_out=16000).toPandas().set_index("audio_id")
    assert sorted(out.index) == ["hi", "raw"]
    assert (out.fmt == "wav").all() and (out.sr == 16000).all()
    assert out.loc["hi"].n_samples == 16000  # 1 s at 32 kHz -> 1 s at 16 kHz
    # the normalized container feeds straight back into audio_features,
    # and a pure tone keeps its zero-crossing rate across rate conversion
    feats = audio_features(
        spark.createDataFrame(
            [("hi", bytes(out.loc["hi"].bytes), "wav")],
            "audio_id string, bytes binary, fmt string",
        )
    ).collect()[0]
    assert feats.sr == 16000 and feats.n_samples == 16000
    assert abs(feats.zcr - 2 * 440 / 16000) < 0.005


def test_av_fixture_truth_alignment():
    """The fixture payload tables and their truth companions must agree on
    ids, formats, and (losslessly) decoded content."""
    import pandas as pd

    from geoglue_spark.synth import (
        _audio_clip,
        audio_parquet,
        audio_truth_parquet,
        video_truth_parquet,
        videos_parquet,
    )

    a = pd.read_parquet(audio_parquet(30))
    at = pd.read_parquet(audio_truth_parquet(30))
    assert list(a.audio_id) == list(at.audio_id)
    pcm, sr = _audio_clip(7)
    row = a[a.audio_id == "aud000000007"].iloc[0]
    dec, sr2 = decode_wav(bytes(row.bytes))
    assert sr2 == sr and (dec[:, 0] == pcm).all()
    v = pd.read_parquet(videos_parquet(9))
    vt = pd.read_parquet(video_truth_parquet(9))
    assert set(v.video_id) == set(vt.video_id)
    assert (vt.groupby("video_id").frame_idx.count() >= 4).all()


def test_mjpeg_truncated_inside_length_field_raises():
    """A stream cut 1-3 bytes into a segment's 2-byte length must raise
    the documented ValueError, not an opaque struct.error."""
    frame = np.zeros((8, 8), dtype=np.uint8)
    buf = encode_mjpeg(frame[None])
    # cut right after the first non-standalone marker byte pair: SOI(2) +
    # APP0 marker(2) leaves the parser needing APP0's length field
    with pytest.raises(ValueError, match="EOI"):
        decode_mjpeg(buf[:4])
    with pytest.raises(ValueError, match="EOI"):
        decode_mjpeg(buf[:5])
