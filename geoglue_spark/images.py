"""Image payload codecs + perceptual hash + PSNR — stdlib zlib + NumPy only.

The input table carries images as opaque ``binary`` columns
(BASELINE.json input_hint: image_id, bytes, w, h, fmt, caption, phash).
This container has no PIL/opencv, so the engine ships a real, dependency-
free codec for the formats the synthetic fixtures use:

  * ``raw``  — w*h*c uint8, row-major (lossless)
  * ``png``  — valid PNG (8-bit gray/RGB; all five scanline filters
               None/Sub/Up/Average/Paeth decode, encoder picks any) via zlib
  * ``qnt``  — deterministic fake-lossy: PNG of 4-level-quantized pixels;
               round-trips at PSNR ~= 46 dB, exercising the PSNR >= 40 dB
               invariant without a JPEG library.

Baseline JPEG is implemented in :mod:`geoglue_spark.jpeg` (pure NumPy);
formats needing external decoders (webp/...) raise NotImplementedError
— clearly-marked stubs; the Spark-side plumbing (schema, Arrow batching,
partitioning) is identical for them.

Everything operates on whole NumPy batches inside pandas UDFs / mapInPandas
— never per-row Python in the plan (north rule).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------------
# codecs
# --------------------------------------------------------------------------
def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 9.4) — vectorized over a scanline."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def _filter_scanlines(body: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Apply one PNG filter (0-4) to every scanline of (h, w*bpp) bytes.
    Filtering uses the RECONSTRUCTED (= original) bytes for a/b/c, per the
    spec, so any decoder round-trips exactly."""
    h, stride = body.shape
    prior = np.zeros(stride, np.uint8)
    out = bytearray()
    for y in range(h):
        line = body[y]
        a = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
        if filter_type == 0:
            filt = line
        elif filter_type == 1:  # Sub
            filt = line - a
        elif filter_type == 2:  # Up
            filt = line - prior
        elif filter_type == 3:  # Average
            filt = line - ((a.astype(np.uint16) + prior.astype(np.uint16)) // 2).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            c = np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]])
            filt = line - _paeth(a, prior, c)
        else:
            raise ValueError(f"invalid PNG filter type {filter_type}")
        out.append(filter_type)
        out += filt.tobytes()
        prior = line
    return bytes(out)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 to a minimal PNG.
    ``filter_type`` applies one PNG filter (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) to every scanline."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        h, w, color_type, bpp = pixels.shape[0], pixels.shape[1], 0, 1
        body = pixels
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        h, w, color_type, bpp = pixels.shape[0], pixels.shape[1], 2, 3
        body = pixels.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = _filter_scanlines(np.ascontiguousarray(body), bpp, filter_type)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter_scanline(
    ftype: int, filt: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline (PNG spec 9.4). Sub/Average/Paeth have a
    serial left-neighbour dependency, resolved pixel-group-wise (bpp
    columns at a time) — w steps of vectorized uint8 math, not w*bpp."""
    if ftype == 0:
        return filt.copy()
    if ftype == 2:  # Up — fully vectorized
        return filt + prior
    line = filt.copy()
    n = line.shape[0]
    if ftype == 1:  # Sub
        for x in range(bpp, n, bpp):
            line[x : x + bpp] += line[x - bpp : x]
        return line
    if ftype == 3:  # Average
        line[:bpp] += (prior[:bpp].astype(np.uint16) // 2).astype(np.uint8)
        for x in range(bpp, n, bpp):
            avg = (
                line[x - bpp : x].astype(np.uint16)
                + prior[x : x + bpp].astype(np.uint16)
            ) // 2
            line[x : x + bpp] += avg.astype(np.uint8)
        return line
    if ftype == 4:  # Paeth
        zero = np.zeros(bpp, np.uint8)
        line[:bpp] += _paeth(zero, prior[:bpp], zero)
        for x in range(bpp, n, bpp):
            line[x : x + bpp] += _paeth(
                line[x - bpp : x], prior[x : x + bpp], prior[x - bpp : x]
            )
        return line
    raise ValueError(f"invalid PNG filter type {ftype}")


def decode_png(buf: bytes) -> np.ndarray:
    """Decode 8-bit gray/RGB non-interlaced PNGs, all five scanline filter
    types (None/Sub/Up/Average/Paeth — the r2 stub covered only 0)."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = color_type = None
    idat = []
    while off < len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        payload = buf[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bit_depth != 8 or interlace != 0 or color_type not in (0, 2):
                raise NotImplementedError(
                    "STUB: only 8-bit non-interlaced gray/RGB PNGs (all five "
                    "scanline filters supported; palette/alpha/16-bit are not)"
                )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    channels = 3 if color_type == 2 else 1
    bpp = channels
    arr = np.frombuffer(raw, np.uint8).reshape(h, w * channels + 1)
    ftypes = arr[:, 0]
    if np.any(ftypes > 4):
        raise ValueError(f"invalid PNG filter byte {int(ftypes.max())}")
    if np.all(ftypes == 0):
        pix = arr[:, 1:]  # fast path: no per-line reconstruction needed
    else:
        pix = np.empty((h, w * channels), np.uint8)
        prior = np.zeros(w * channels, np.uint8)
        for y in range(h):
            prior = _unfilter_scanline(int(ftypes[y]), arr[y, 1:], prior, bpp)
            pix[y] = prior
    return pix.reshape(h, w, 3) if channels == 3 else pix.reshape(h, w)


def encode_raw(pixels: np.ndarray) -> bytes:
    return np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_raw(buf: bytes, w: int, h: int) -> np.ndarray:
    arr = np.frombuffer(buf, np.uint8)
    if arr.size == w * h:
        return arr.reshape(h, w)
    if arr.size == w * h * 3:
        return arr.reshape(h, w, 3)
    raise ValueError(f"raw buffer size {arr.size} != {w}x{h}[x3]")


QUANT_STEP = 4  # fake-lossy quantization step -> PSNR ~= 46.9 dB


def encode_qnt(pixels: np.ndarray) -> bytes:
    """Deterministic fake-lossy re-encode: quantize then PNG-pack."""
    q = (np.asarray(pixels, np.uint16) // QUANT_STEP * QUANT_STEP + QUANT_STEP // 2).clip(
        0, 255
    ).astype(np.uint8)
    return encode_png(q)


JPEG_QUALITY = 98  # 4:4:4 at q98 holds PSNR >= 40 dB even on the
#                    hard-edged synthetic fixtures (input_hint invariant)


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(buf, w, h)
    if fmt in ("png", "qnt"):
        return decode_png(buf)
    if fmt in ("jpg", "jpeg"):
        from .jpeg import decode_jpeg

        return decode_jpeg(buf)
    raise NotImplementedError(f"STUB: no decoder for fmt={fmt!r} in this container")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "qnt":
        return encode_qnt(pixels)
    if fmt in ("jpg", "jpeg"):
        from .jpeg import encode_jpeg

        return encode_jpeg(pixels, quality=JPEG_QUALITY, subsampling="444")
    raise NotImplementedError(f"STUB: no encoder for fmt={fmt!r} in this container")


# --------------------------------------------------------------------------
# resize kernels — whole-array NumPy, no per-pixel Python
# --------------------------------------------------------------------------
def resize_nearest(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize by integer index gather (floor convention)."""
    h, w = pix.shape[:2]
    sy = np.arange(out_h) * h // out_h
    sx = np.arange(out_w) * w // out_w
    return pix[sy][:, sx]


def resize_bilinear(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Half-pixel-center bilinear resize with edge clamp (the OpenCV
    INTER_LINEAR / align_corners=False convention). Same-size input is an
    exact identity (all fractional weights land on 0). Gray (h, w) and
    color (h, w, c) both supported; output rounds to uint8."""
    h, w = pix.shape[:2]
    a = np.asarray(pix, np.float64)
    fy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0f = np.floor(fy)
    x0f = np.floor(fx)
    # out-of-range centers clamp both neighbours to the same edge pixel, so
    # the (also-clamped) weight is inert there — pure edge replication
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, h - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, w - 1)
    wy = np.clip(fy - y0f, 0.0, 1.0).reshape(-1, 1, *([1] * (a.ndim - 2)))
    wx = np.clip(fx - x0f, 0.0, 1.0).reshape(1, -1, *([1] * (a.ndim - 2)))
    top = a[y0][:, x0] * (1.0 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1.0 - wx) + a[y1][:, x1] * wx
    out = top * (1.0 - wy) + bot * wy
    return np.rint(out).clip(0, 255).astype(np.uint8)


def resize_area(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Anti-aliased downscale by pixel binning: every source pixel
    contributes to the destination cell its index maps into, then cells
    average — the exact box mean whenever the factors divide evenly
    (OpenCV INTER_AREA's integer-factor case). Upscale has empty bins, so
    it falls back to :func:`resize_bilinear` (mirroring INTER_AREA's own
    bilinear-like upscale behavior)."""
    h, w = pix.shape[:2]
    if out_w > w or out_h > h:
        return resize_bilinear(pix, out_w, out_h)
    a = np.asarray(pix, np.float64)
    yi = (np.arange(h) * out_h // h).clip(0, out_h - 1)
    xi = (np.arange(w) * out_w // w).clip(0, out_w - 1)
    flat = (yi[:, None] * out_w + xi[None, :]).ravel()
    cnt = np.bincount(flat, minlength=out_h * out_w).astype(np.float64)
    if a.ndim == 2:
        sums = np.bincount(flat, weights=a.ravel(), minlength=out_h * out_w)
        out = (sums / cnt).reshape(out_h, out_w)
    else:
        out = np.stack(
            [
                np.bincount(flat, weights=a[..., c].ravel(), minlength=out_h * out_w)
                / cnt
                for c in range(a.shape[2])
            ],
            axis=-1,
        ).reshape(out_h, out_w, a.shape[2])
    return np.rint(out).clip(0, 255).astype(np.uint8)


RESIZE_KERNELS = {
    "nearest": resize_nearest,
    "bilinear": resize_bilinear,
    "area": resize_area,
}


def resize_letterbox(
    pix: np.ndarray,
    out_w: int,
    out_h: int,
    method: str = "bilinear",
    pad_value: int = 0,
) -> np.ndarray:
    """Aspect-preserving resize into an (out_h, out_w) canvas — the
    standard vision-model preprocessing: scale by min(out_w/w, out_h/h),
    resize with ``method``, center on a ``pad_value`` canvas. Always
    returns exactly (out_h, out_w[, c])."""
    h, w = pix.shape[:2]
    scale = min(out_w / w, out_h / h)
    rw = max(1, min(out_w, int(round(w * scale))))
    rh = max(1, min(out_h, int(round(h * scale))))
    resized = RESIZE_KERNELS[method](pix, rw, rh)
    shape = (out_h, out_w) if pix.ndim == 2 else (out_h, out_w, pix.shape[2])
    canvas = np.full(shape, np.uint8(pad_value), np.uint8)
    oy = (out_h - rh) // 2
    ox = (out_w - rw) // 2
    canvas[oy : oy + rh, ox : ox + rw] = resized
    return canvas


# --------------------------------------------------------------------------
# perceptual hash + quality metrics
# --------------------------------------------------------------------------
def _to_gray(pixels: np.ndarray) -> np.ndarray:
    if pixels.ndim == 3:
        return (
            0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
        )
    return pixels.astype(np.float64)


def _block_reduce_8(gray: np.ndarray) -> np.ndarray:
    """Average-pool any (h, w) image down to 8x8 via index binning
    (bincount over flat bin ids — same accumulation order as the old
    np.add.at formulation, so phash bits are unchanged, ~10x faster on
    the per-image hot path and no materialized index matrices)."""
    h, w = gray.shape
    yi = (np.arange(h) * 8 // h).clip(0, 7)
    xi = (np.arange(w) * 8 // w).clip(0, 7)
    flat = (yi[:, None] * 8 + xi[None, :]).ravel()
    out = np.bincount(flat, weights=gray.ravel(), minlength=64)
    cnt = np.bincount(flat, minlength=64)
    return (out / cnt).reshape(8, 8)


def phash64(pixels: np.ndarray) -> int:
    """64-bit mean perceptual hash: 8x8 average pool, threshold by mean.

    Quantization-robust (a qnt re-encode keeps the same hash), returned as
    signed int64 to fit the input_hint's ``phash:int64`` column.
    """
    blk = _block_reduce_8(_to_gray(np.asarray(pixels, np.float64)))
    bits = (blk > blk.mean()).ravel()
    val = np.uint64(0)
    for b in bits:
        val = np.uint64(val << np.uint64(1)) | np.uint64(int(b))
    return int(val.view(np.int64))


def flip_h(pix: np.ndarray) -> np.ndarray:
    """Horizontal mirror (left-right)."""
    return np.ascontiguousarray(pix[:, ::-1])


def flip_v(pix: np.ndarray) -> np.ndarray:
    """Vertical mirror (top-bottom)."""
    return np.ascontiguousarray(pix[::-1])


def rot90(pix: np.ndarray, k: int = 1) -> np.ndarray:
    """Rotate by k*90 degrees counter-clockwise (axes (0, 1) so channel
    layout survives)."""
    return np.ascontiguousarray(np.rot90(pix, k, axes=(0, 1)))


def crop(pix: np.ndarray, x0: int, y0: int, out_w: int, out_h: int) -> np.ndarray:
    """Axis-aligned crop; raises when the window leaves the image."""
    h, w = pix.shape[:2]
    if x0 < 0 or y0 < 0 or x0 + out_w > w or y0 + out_h > h:
        raise ValueError(
            f"crop ({x0},{y0},{out_w},{out_h}) outside image ({w}x{h})"
        )
    return np.ascontiguousarray(pix[y0 : y0 + out_h, x0 : x0 + out_w])


def center_crop(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = pix.shape[:2]
    return crop(pix, (w - out_w) // 2, (h - out_h) // 2, out_w, out_h)


AUGMENT_KERNELS = {
    "flip_h": flip_h,
    "flip_v": flip_v,
    "rot90": rot90,
    "rot180": lambda p: rot90(p, 2),
    "rot270": lambda p: rot90(p, 3),
    "identity": lambda p: p,
}


def sharpness(pix: np.ndarray) -> float:
    """Variance of the 4-neighbour Laplacian over the grayscale image —
    the standard blur detector (higher = sharper); whole-array slicing,
    no convolution library."""
    g = _to_gray(np.asarray(pix, np.float64))
    if g.shape[0] < 3 or g.shape[1] < 3:
        return 0.0
    lap = (
        g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
        - 4.0 * g[1:-1, 1:-1]
    )
    return float(lap.var())


def gray_entropy(pix: np.ndarray, bins: int = 256) -> float:
    """Shannon entropy (bits) of the grayscale intensity histogram —
    near-0 for flat/synthetic fills, ~8 for full-range noise."""
    g = _to_gray(np.asarray(pix, np.float64)).ravel()
    hist, _ = np.histogram(g, bins=bins, range=(0.0, 255.0))
    p = hist[hist > 0] / g.size
    return float(-(p * np.log2(p)).sum())


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val**2 / mse)


def synth_pixels(i: int, w: int, h: int, color: bool = False) -> np.ndarray:
    """Deterministic synthetic image content, seeded by row index only."""
    y, x = np.mgrid[0:h, 0:w]
    base = (i * 7 + x * 13 + y * 31) % 251
    if not color:
        return base.astype(np.uint8)
    return np.stack(
        [base, (base + i * 3 + x) % 251, (base + i * 5 + y) % 251], axis=-1
    ).astype(np.uint8)
