"""Multimodal column operators: decode / feature-extract / resize over
opaque binary image, audio, and video payloads (input_hint schema).

Everything is ``mapInPandas`` over Arrow batches. Decoders are REAL for
png/raw/qnt/jpeg images (images.py, jpeg.py), RIFF/WAVE PCM audio and
raw MJPEG video (av.py), and the deterministic rawpcm/rawvid test
containers. Only compressed audio (mp3/aac/opus) and inter-frame video
(h264/vp9/av1) lack decoders in this container; rows in those formats
drop with the contract documented per operator.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..images import _block_reduce_8, _to_gray, decode_image, phash64, psnr

DECODE_STATS_SCHEMA = (
    "image_id string, fmt string, w int, h int, mean_px double, std_px double, "
    "phash_check boolean"
)


def decode_stats(images: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Decode every image and emit per-image pixel statistics + a check
    that the stored phash matches the decoded pixels (input_hint per-row
    invariant). Arrow-batched; decode failures surface as rows with
    mean_px NULL rather than killing the task.

    ``carry``: extra input columns to pass through unchanged (e.g. an
    ``admin_id`` stamped by assign_admin) — at fact-table scale the
    decode must ride the SAME pipeline as the assignment; re-joining the
    decode output to a second scan by image_id would shuffle two
    fact-sized tables."""
    carry = tuple(c for c in carry)
    # both the output names AND the base input selection: carrying e.g.
    # "bytes" or "phash" would duplicate the column in the select and the
    # executor-side pdf[c] would return a 2-column frame
    base = {
        "image_id", "bytes", "fmt", "w", "h", "phash",
        "mean_px", "std_px", "phash_check",
    }
    clash = [c for c in carry if c in base]
    if clash:
        raise ValueError(
            f"decode_stats carry column(s) {clash} collide with the base "
            "input/output schema; rename them upstream"
        )
    missing = [c for c in carry if c not in images.columns]
    if missing:
        raise ValueError(f"decode_stats carry column(s) {missing} not in input")
    # schema string built in CARRY-TUPLE order — the same order the pandas
    # result appends the columns — so correctness never depends on Arrow's
    # assign-columns-by-name conf (ADVICE r3: iterating images.schema order
    # here could silently misalign slots if that conf were false)
    in_fields = {f.name: f.dataType.simpleString() for f in images.schema}
    carry_schema = "".join(f", {c} {in_fields[c]}" for c in carry)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                    gray = _to_gray(pix.astype(np.float64))
                    ok = phash64(pix) == int(r.phash)
                    out.append(
                        (r.image_id, r.fmt, r.w, r.h, float(gray.mean()),
                         float(gray.std()), bool(ok))
                    )
                except (NotImplementedError, ValueError):
                    # NotImplementedError = format without a codec here;
                    # ValueError = corrupt payload (bad PNG filter byte,
                    # size mismatch). Both surface as the documented NULL
                    # row — one bad image must never fail a 10^8-image job
                    out.append((r.image_id, r.fmt, r.w, r.h, None, None, None))
            res = pd.DataFrame(
                out,
                columns=[
                    "image_id", "fmt", "w", "h", "mean_px", "std_px", "phash_check",
                ],
            )
            for c in carry:  # one output row per input row, order preserved
                res[c] = pdf[c].to_numpy()
            yield res

    return images.select(
        "image_id", "bytes", "w", "h", "fmt", "phash", *carry
    ).mapInPandas(run, DECODE_STATS_SCHEMA + carry_schema)


def thumbnail_features(images: DataFrame, grid: int = 8) -> DataFrame:
    """Decode + average-pool to a grid x grid feature vector (array<float>)
    — the feature-extraction stage an embedding pipeline would feed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for r in pdf.itertuples(index=False):
                try:
                    pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                except (NotImplementedError, ValueError):
                    continue
                blk = _block_reduce_8(_to_gray(pix.astype(np.float64)))
                ids.append(r.image_id)
                feats.append((blk.ravel() / 255.0).astype(np.float32).tolist())
            yield pd.DataFrame({"image_id": ids, "embedding": feats})

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, "image_id string, embedding array<float>"
    )


def reencode_psnr(images: DataFrame, fmt: str = "qnt") -> DataFrame:
    """Re-encode through a lossy codec and report PSNR per image — the
    operator behind the PSNR >= 40 dB gate."""
    from ..images import encode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                    re = decode_image(encode_image(pix, fmt), r.w, r.h, fmt)
                except (NotImplementedError, ValueError):
                    continue  # undecodable row drops, like every sibling op
                p = psnr(pix, re)
                out.append((r.image_id, fmt, float(min(p, 1e9))))
            yield pd.DataFrame(out, columns=["image_id", "refmt", "psnr_db"])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, "image_id string, refmt string, psnr_db double"
    )


def resize_images(
    images: DataFrame,
    out_w: int,
    out_h: int,
    out_fmt: str = "raw",
    method: str = "bilinear",
    letterbox: bool = False,
    pad_value: int = 0,
) -> DataFrame:
    """Decode -> resize (whole-array NumPy kernel) -> re-encode. Real
    end-to-end for the container-native codecs (raw/png/qnt/jpeg); formats
    needing external decoders surface as dropped rows (the count is
    observable as input minus output).

    ``method``: ``bilinear`` (half-pixel-center, the pipeline default),
    ``area`` (anti-aliased pixel-binning downscale — the right kernel when
    shrinking >2x, e.g. thumbnailing for an embedding model), or
    ``nearest`` (index gather; preserves exact palette values).

    ``letterbox=True`` preserves aspect ratio: scale to fit, center on a
    ``pad_value`` canvas of exactly (out_h, out_w) — the standard
    vision-model preprocessing shape contract."""
    from ..images import RESIZE_KERNELS, encode_image, resize_letterbox

    if method not in RESIZE_KERNELS:
        raise ValueError(
            f"unknown resize method {method!r}; expected one of "
            f"{sorted(RESIZE_KERNELS)}"
        )
    if letterbox:
        def kernel(pix, ow, oh):
            return resize_letterbox(pix, ow, oh, method=method, pad_value=pad_value)
    else:
        kernel = RESIZE_KERNELS[method]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                except (NotImplementedError, ValueError):
                    continue
                resized = kernel(pix, out_w, out_h)
                out.append(
                    (r.image_id, encode_image(resized, out_fmt), out_w, out_h, out_fmt)
                )
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, "image_id string, bytes binary, w int, h int, fmt string"
    )


def augment_images(
    images: DataFrame,
    ops: tuple[str, ...] = ("identity", "flip_h"),
    crop_w: int | None = None,
    crop_h: int | None = None,
    seed: int = 0,
    out_fmt: str = "raw",
) -> DataFrame:
    """Deterministic per-image augmentation for training epochs: each
    image's op (and crop offset, when ``crop_w/crop_h`` are set) is drawn
    from md5(image_id, seed) — NOT Python's salted hash() and NOT an RNG,
    so the same (image, seed) always produces the same output on any
    executor count, partitioning, or retry (the reproducibility contract
    a resumable 100-TB epoch needs; change ``seed`` per epoch for fresh
    draws). Decode → flip/rotate → crop happens as whole-array NumPy in
    one mapInPandas pass; payloads never cross to Python outside the
    kernel. Images smaller than the crop are dropped (observable as
    input minus output rows).

    Output: (image_id, bytes, w, h, fmt, aug) where ``aug`` is e.g.
    ``flip_h+crop(3,7)``."""
    import hashlib

    from ..images import AUGMENT_KERNELS, crop as crop_k, encode_image

    bad = set(ops) - set(AUGMENT_KERNELS)
    if bad:
        raise ValueError(
            f"unknown augment ops {sorted(bad)}; expected from "
            f"{sorted(AUGMENT_KERNELS)}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                except (NotImplementedError, ValueError):
                    continue
                digest = hashlib.md5(
                    f"{r.image_id}:{seed}".encode()
                ).digest()
                draw = int.from_bytes(digest[:8], "big")
                op = ops[draw % len(ops)]
                pix = AUGMENT_KERNELS[op](pix)
                aug = op
                if crop_w is not None and crop_h is not None:
                    h, w = pix.shape[:2]
                    if w < crop_w or h < crop_h:
                        continue
                    x0 = int.from_bytes(digest[8:12], "big") % (w - crop_w + 1)
                    y0 = int.from_bytes(digest[12:16], "big") % (h - crop_h + 1)
                    pix = crop_k(pix, x0, y0, crop_w, crop_h)
                    aug = f"{op}+crop({x0},{y0})"
                oh, ow = pix.shape[:2]
                out.append(
                    (r.image_id, encode_image(pix, out_fmt), ow, oh, out_fmt, aug)
                )
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt", "aug"]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, "image_id string, bytes binary, w int, h int, fmt string, aug string"
    )


def image_quality_stats(images: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Per-image quality signals for corpus filtering: Laplacian-variance
    sharpness (blur detection), grayscale histogram entropy (flat-fill /
    synthetic detection), mean and std intensity. One mapInPandas decode
    pass; each metric is a whole-array NumPy reduction."""
    from ..images import gray_entropy, sharpness

    cols = ["image_id", *carry]
    # carry-clash guard, same rules as decode_stats: a carry colliding
    # with the base input selection duplicates a column (itertuples then
    # renames positionally -> executor AttributeError), and a collision
    # with an output metric name duplicates schema columns
    base = {
        "image_id", "bytes", "w", "h", "fmt",
        "sharpness", "entropy", "mean_val", "std_val",
    }
    clash = [c for c in carry if c in base]
    if clash:
        raise ValueError(
            f"image_quality_stats carry column(s) {clash} collide with the "
            "base input/output schema; rename them upstream"
        )
    # carry columns keep their INPUT types (same pattern as decode_stats:
    # hardcoding `string` would crash Arrow serialization on an int carry)
    in_fields = {f.name: f.dataType.simpleString() for f in images.schema}
    missing = [c for c in carry if c not in in_fields]
    if missing:
        raise ValueError(f"image_quality_stats carry column(s) {missing} not in input")
    schema = (
        ", ".join(["image_id string"] + [f"{c} {in_fields[c]}" for c in carry])
        + ", sharpness double, entropy double, mean_val double, std_val double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                except (NotImplementedError, ValueError):
                    continue
                out.append(
                    tuple(getattr(r, c) for c in cols)
                    + (
                        round(sharpness(pix), 6),
                        round(gray_entropy(pix), 6),
                        round(float(np.asarray(pix, np.float64).mean()), 6),
                        round(float(np.asarray(pix, np.float64).std()), 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=cols + ["sharpness", "entropy", "mean_val", "std_val"],
            )

    return images.select(*cols, "bytes", "w", "h", "fmt").mapInPandas(run, schema)


def filter_pairs_by_cosine(
    pairs: DataFrame,
    emb_a: str,
    emb_b: str,
    min_cosine: float,
    out_col: str = "pair_cosine",
) -> DataFrame:
    """CLIP-style image-text pair filtering: keep rows whose two embedding
    columns (array<float/double>, same dimension) have cosine similarity
    >= ``min_cosine``. Pure JVM fold (`cosine_col`) — no shuffle, no
    Python; composes with any upstream join that paired the modalities."""
    from .similarity import cosine_col

    c = cosine_col(F.col(emb_a), F.col(emb_b))
    return pairs.withColumn(out_col, c).filter(F.col(out_col) >= min_cosine)


# ---------------------------------------------------------------------------
# video / audio: REAL Spark plumbing over deterministic fake containers.
# The container ships no video/audio codec libraries, so per the build rules
# the decode bodies support only the self-describing fake formats below and
# raise NotImplementedError for real ones — schema, partitioning, UDF
# signature and batch shape are the production-shaped parts.
# ---------------------------------------------------------------------------
def encode_rawvid(frames: np.ndarray) -> bytes:
    """Deterministic fake video container: header (n, h, w as uint32 LE) +
    concatenated 8-bit grayscale frames."""
    import struct

    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return struct.pack("<III", n, h, w) + f.tobytes()


def _decode_rawvid(buf: bytes) -> np.ndarray:
    import struct

    n, h, w = struct.unpack_from("<III", buf, 0)
    return np.frombuffer(buf, dtype=np.uint8, offset=12).reshape(n, h, w)


def sample_video_frames(
    videos: DataFrame,
    every_n: int = 10,
    fmt_col: str = "fmt",
    parallelism: int | None = None,
) -> DataFrame:
    """Frame sampling: one output row per kept frame
    (video_id, fmt, frame_idx, w, h, frame binary, mean_px).
    Arrow-batched mapInPandas over two REAL containers: 'rawvid' (the
    deterministic fake) and 'mjpeg' (raw motion-JPEG — back-to-back
    baseline JFIF frames, decoded by the in-repo T.81 codec via av.py).
    Inter-frame codecs (mp4/h264/vp9/av1) have no decoder in this
    container and surface as dropped rows — that skip is the documented
    contract, not silent data loss.

    ``parallelism``: row-redistribute before decoding. Decode cost is
    per-ROW CPU, but scan parallelism follows FILE layout — a
    single-file/single-row-group ingest otherwise decodes on ONE task
    (measured 5x on 951 frames x 16 threads). Leave None when the input
    is already many files/partitions: the repartition is a shuffle of
    payload bytes that a file-granular 100-TB archive doesn't need."""
    from ..av import decode_mjpeg

    if parallelism is not None:
        videos = videos.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                fmt = getattr(r, fmt_col)
                if fmt == "rawvid":
                    frames = _decode_rawvid(bytes(r.bytes))
                elif fmt == "mjpeg":
                    frames = decode_mjpeg(bytes(r.bytes))
                else:
                    # no inter-frame codec in this container: drop row
                    continue
                for idx in range(0, len(frames), every_n):
                    fr = frames[idx]
                    out.append(
                        (
                            r.video_id,
                            fmt,
                            int(idx),
                            int(fr.shape[1]),
                            int(fr.shape[0]),
                            fr.tobytes(),
                            float(fr.mean()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["video_id", "fmt", "frame_idx", "w", "h", "frame", "mean_px"],
            )

    return videos.select("video_id", "bytes", fmt_col).mapInPandas(
        run,
        "video_id string, fmt string, frame_idx int, w int, h int, "
        "frame binary, mean_px double",
    )


def audio_features(
    audio: DataFrame, sample_rate: int = 16000, parallelism: int | None = None
) -> DataFrame:
    """Per-clip audio features (duration, RMS, zero-crossing rate) over
    two REAL containers: 'wav' (RIFF/WAVE 16-bit PCM, decoded by av.py —
    sample rate read from the header) and 'rawpcm' (headerless 16-bit LE
    mono at ``sample_rate``). Multi-channel WAV mixes down (channel mean)
    before rms/zcr. Compressed codecs (mp3/aac/opus) have no decoder in
    this container and surface as dropped rows — the documented contract.
    The feature math is real NumPy over Arrow batches.
    ``parallelism``: see :func:`sample_video_frames` — row-redistribute a
    file-parallelism-starved ingest before the per-row decode."""
    from ..av import decode_wav

    if parallelism is not None:
        audio = audio.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    if r.fmt == "rawpcm":
                        pcm = np.frombuffer(bytes(r.bytes), dtype="<i2").astype(np.float64)
                        sr = sample_rate
                    elif r.fmt == "wav":
                        frames, sr = decode_wav(bytes(r.bytes))
                        pcm = frames.astype(np.float64).mean(axis=1)
                    else:
                        # no compressed-audio codec in this container: drop row
                        continue
                except (NotImplementedError, ValueError):
                    continue  # 24-bit/float PCM, odd-length rawpcm: drop
                if sr <= 0:
                    continue  # corrupt header; n/sr below would divide by 0
                n = len(pcm)
                rms = float(np.sqrt(np.mean(pcm**2))) if n else 0.0
                zc = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))) if n > 1 else 0.0
                out.append((r.audio_id, r.fmt, int(sr), n, n / sr, rms, zc))
            yield pd.DataFrame(
                out,
                columns=[
                    "audio_id", "fmt", "sr", "n_samples",
                    "duration_sec", "rms", "zcr",
                ],
            )

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        run,
        "audio_id string, fmt string, sr int, n_samples bigint, "
        "duration_sec double, rms double, zcr double",
    )


def decode_video_frames(
    videos: DataFrame, fmt_col: str = "fmt", parallelism: int | None = None
) -> DataFrame:
    """Decode EVERY frame (sample_video_frames with every_n=1): real for
    'rawvid' and 'mjpeg' payloads; inter-frame codecs drop (no decoder in
    this container — see sample_video_frames)."""
    return sample_video_frames(
        videos, every_n=1, fmt_col=fmt_col, parallelism=parallelism
    )


def resample_audio(
    audio: DataFrame, sr_out: int = 16000, sample_rate: int = 16000
) -> DataFrame:
    """Normalize every clip to one sample rate (the standard first step
    of an audio training pipeline): decode ('wav'/'rawpcm', mixdown to
    mono like decode_audio), linear-interp resample to ``sr_out`` (av.py)
    and re-encode as WAV — so downstream operators see a single uniform
    container. Output: (audio_id, fmt='wav', sr, n_samples, bytes).
    Compressed codecs drop (no decoder in this container)."""
    from ..av import decode_wav, encode_wav, resample_pcm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    if r.fmt == "rawpcm":
                        pcm = np.frombuffer(bytes(r.bytes), dtype="<i2")
                        sr = sample_rate
                    elif r.fmt == "wav":
                        frames, sr = decode_wav(bytes(r.bytes))
                        pcm = np.round(
                            frames.astype(np.float64).mean(axis=1)
                        ).astype("<i2")
                    else:
                        continue
                except (NotImplementedError, ValueError):
                    continue  # unsupported PCM variant / corrupt payload
                if sr <= 0:
                    continue
                res = resample_pcm(pcm, sr, sr_out)
                out.append(
                    (r.audio_id, "wav", sr_out, len(res), encode_wav(res, sr_out))
                )
            yield pd.DataFrame(
                out, columns=["audio_id", "fmt", "sr", "n_samples", "bytes"]
            )

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        run,
        "audio_id string, fmt string, sr int, n_samples bigint, bytes binary",
    )


def decode_audio(audio: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Decode clips to canonical mono float64-mixdown PCM stored as 16-bit
    LE bytes: (audio_id, fmt, sr, n_samples, pcm). Real for 'wav' (RIFF
    chunk walk, header sample rate) and 'rawpcm'; compressed codecs drop
    (no decoder in this container — see audio_features)."""
    from ..av import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    if r.fmt == "rawpcm":
                        pcm = np.frombuffer(bytes(r.bytes), dtype="<i2")
                        sr = sample_rate
                    elif r.fmt == "wav":
                        frames, sr = decode_wav(bytes(r.bytes))
                        pcm = np.round(
                            frames.astype(np.float64).mean(axis=1)
                        ).astype("<i2")
                    else:
                        continue
                except (NotImplementedError, ValueError):
                    continue  # unsupported PCM variant / corrupt payload
                if sr <= 0:
                    continue
                out.append((r.audio_id, r.fmt, int(sr), len(pcm), pcm.tobytes()))
            yield pd.DataFrame(
                out, columns=["audio_id", "fmt", "sr", "n_samples", "pcm"]
            )

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(
        run,
        "audio_id string, fmt string, sr int, n_samples bigint, pcm binary",
    )
