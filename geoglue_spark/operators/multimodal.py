"""Multimodal column operators: decode / feature-extract / resize over
opaque binary image payloads (input_hint schema), plus clearly-marked
stubs for codecs absent from this container.

Everything is ``mapInPandas`` over Arrow batches: the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested; only the exotic
codec bodies are stubbed (NotImplementedError) per the build rules.
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


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image and emit per-image pixel statistics + a check
    that the stored phash matches the decoded pixels (input_hint per-row
    invariant). Arrow-batched; decode failures surface as rows with
    mean_px NULL rather than killing the task."""

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
                except NotImplementedError:
                    out.append((r.image_id, r.fmt, r.w, r.h, None, None, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "fmt", "w", "h", "mean_px", "std_px", "phash_check",
                ],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        run, DECODE_STATS_SCHEMA
    )


def thumbnail_features(images: DataFrame, grid: int = 8) -> DataFrame:
    """Decode + average-pool to a grid x grid feature vector (array<float>)
    — the feature-extraction stage an embedding pipeline would feed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for r in pdf.itertuples(index=False):
                try:
                    pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                except NotImplementedError:
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
                pix = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
                re = decode_image(encode_image(pix, fmt), r.w, r.h, fmt)
                p = psnr(pix, re)
                out.append((r.image_id, fmt, float(min(p, 1e9))))
            yield pd.DataFrame(out, columns=["image_id", "refmt", "psnr_db"])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, "image_id string, refmt string, psnr_db double"
    )


def decode_video_frames(*_args, **_kwargs):
    """STUB: video frame sampling needs a codec library absent from this
    container. The plumbing would mirror decode_stats: mapInPandas emitting
    one row per sampled frame (image_id, frame_idx, bytes)."""
    raise NotImplementedError("STUB: no video codec in this container")


def decode_audio(*_args, **_kwargs):
    """STUB: audio decode absent from this container; same mapInPandas
    plumbing with (audio_id, sample_rate, pcm binary) output."""
    raise NotImplementedError("STUB: no audio codec in this container")
