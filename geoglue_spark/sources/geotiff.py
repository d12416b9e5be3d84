"""Pure-NumPy GeoTIFF reader (S8 raster-source fidelity, weights path).

The reference reads WorldPop population rasters for weighted zonal stats
(reference src/geoglue/util.py:46-73 read_geotiff via rioxarray;
zonalstats.py weights path). This container has no GDAL, but TIFF/BigTIFF
is a public byte format: this module parses IFDs (classic + BigTIFF, both
byte orders), decodes strips/tiles with compression none / deflate / LZW
(TIFF-variant LZW with early-change, implemented here), reverses
predictors 2 (horizontal differencing, applied word-wise as libtiff does
— including float32 data written that way, e.g. WorldPop) and 3
(floating-point byte-plane predictor), applies GDAL_NODATA, and
georeferences through ModelPixelScale + ModelTiepoint.

Scale shape mirrors sources.netcdf3: one file parses driver-side
(:func:`geotiff_to_pixels`); an archive fans out per-file on executors
(:func:`read_geotiff_distributed` via mapInPandas) — no GDAL on workers,
just this parser.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

# tag ids (public TIFF 6.0 / GeoTIFF / GDAL registries)
T_WIDTH, T_LENGTH, T_BITS, T_COMPRESSION = 256, 257, 258, 259
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PREDICTOR, T_TILE_W, T_TILE_L, T_TILE_OFFSETS, T_TILE_COUNTS = 317, 322, 323, 324, 325
T_SAMPLE_FORMAT = 339
T_MODEL_SCALE, T_MODEL_TIEPOINT = 33550, 33922
T_GDAL_NODATA = 42113

_TYPE = {
    1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4), 6: ("b", 1),
    7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 11: ("f", 4), 12: ("d", 8),
    16: ("Q", 8), 17: ("q", 8),
}


@dataclass
class GeoTiff:
    width: int
    height: int
    data: np.ndarray          # (height, width) float64, nodata -> NaN
    pixel_scale: tuple        # (sx, sy)
    tiepoint: tuple           # (i, j, k, x, y, z): raster->model anchor
    nodata: float | None

    def lonlat_axes(self) -> tuple[np.ndarray, np.ndarray]:
        """Pixel-CENTER lon/lat axes (GeoTIFF raster space: tiepoint maps
        the (0,0) pixel's top-left corner; y decreases row-wise)."""
        sx, sy = self.pixel_scale
        _, _, _, x0, y0, _ = self.tiepoint
        lon = x0 + (np.arange(self.width) + 0.5) * sx
        lat = y0 - (np.arange(self.height) + 0.5) * sy
        return lon, lat


def _lzw_decode(data: bytes, out_size_hint: int = 0) -> bytes:
    """TIFF-variant LZW (MSB-first packing, 256=Clear, 257=EOI, early
    code-width change) — the public algorithm from the TIFF 6.0 spec."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258

    width = 9
    next_code = 258
    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        bitbuf &= (1 << nbits) - 1  # keep the residue small (bounded int math)
        if code == 256:  # Clear
            reset()
            prev = None
            continue
        if code == 257:  # EOI
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            table.append(prev + entry[:1])
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
        out += entry
        prev = entry
        # TIFF early change: widen one code EARLY (at 510/1022/2046)
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1


def _undo_predictor(
    raw: bytes, predictor: int, rows: int, cols: int, spp: int,
    sample_bytes: int, bo: str,
) -> bytes:
    if predictor in (0, 1):
        return raw
    if predictor == 2:
        # horizontal differencing, word-wise per libtiff (uint wraparound;
        # float32 written this way — WorldPop — round-trips losslessly)
        dt = {1: "u1", 2: "u2", 4: "u4", 8: "u8"}[sample_bytes]
        arr = np.frombuffer(raw, bo + dt).reshape(rows, cols * spp).copy()
        np.cumsum(arr.view(f"{bo}{dt}"), axis=1, dtype=dt, out=arr)
        return arr.tobytes()
    if predictor == 3:
        # floating-point predictor: rows are byte-plane-shuffled then
        # byte-differenced; reverse both (bytes stored big-endian planes)
        arr = np.frombuffer(raw, np.uint8).reshape(rows, -1).copy()
        np.cumsum(arr, axis=1, dtype=np.uint8, out=arr)
        rowlen = cols * spp
        planes = arr.reshape(rows, sample_bytes, rowlen)
        le = planes[:, ::-1, :].transpose(0, 2, 1)  # -> little-endian samples
        return np.ascontiguousarray(le).tobytes()
    raise ValueError(f"unsupported TIFF predictor {predictor}")


def read_geotiff(path: str, band: int = 0) -> GeoTiff:
    """Parse one GeoTIFF (classic or BigTIFF, II/MM) into a float array +
    georeferencing. Supports stripped and tiled layouts, compression
    1/5/8/32946, predictors 1/2/3, one sample per pixel (the DEM /
    population-raster shape the reference consumes)."""
    if band != 0:
        raise NotImplementedError(
            "read_geotiff parses the first IFD only (band 0); a multi-band "
            "TIFF needs an IFD-chain walk — split bands into files or "
            "extend the reader"
        )
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"{path}: not a TIFF")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic == 42:
        big = False
        (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    elif magic == 43:
        big = True
        (ifd_off,) = struct.unpack_from(bo + "Q", buf, 8)
    else:
        raise ValueError(f"{path}: bad TIFF magic {magic}")

    def read_ifd(off: int) -> dict[int, list]:
        tags: dict[int, list] = {}
        if big:
            (cnt,) = struct.unpack_from(bo + "Q", buf, off)
            entry_off, entry_sz, inline = off + 8, 20, 8
        else:
            (cnt,) = struct.unpack_from(bo + "H", buf, off)
            entry_off, entry_sz, inline = off + 2, 12, 4
        for i in range(cnt):
            eo = entry_off + i * entry_sz
            tag, typ = struct.unpack_from(bo + "HH", buf, eo)
            if big:
                (n,) = struct.unpack_from(bo + "Q", buf, eo + 4)
                val_off = eo + 12
            else:
                (n,) = struct.unpack_from(bo + "I", buf, eo + 4)
                val_off = eo + 8
            if typ == 5:  # RATIONAL: n pairs of u32 (numerator, denominator)
                fmt, sz, total = "II", 8, n * 8
            elif typ in _TYPE:
                fmt, sz = _TYPE[typ]
                total = n * sz
            else:
                continue
            src = val_off if total <= inline else (
                struct.unpack_from(bo + ("Q" if big else "I"), buf, val_off)[0]
            )
            if typ == 2:
                tags[tag] = [buf[src : src + n].split(b"\x00")[0].decode(errors="replace")]
            else:
                tags[tag] = list(struct.unpack_from(bo + fmt * n, buf, src))
        return tags

    tags = read_ifd(ifd_off)
    width = tags[T_WIDTH][0]
    height = tags[T_LENGTH][0]
    bits = tags.get(T_BITS, [8])[0]
    spp = tags.get(T_SPP, [1])[0]
    comp = tags.get(T_COMPRESSION, [1])[0]
    pred = tags.get(T_PREDICTOR, [1])[0]
    sfmt = tags.get(T_SAMPLE_FORMAT, [1])[0]
    sample_bytes = bits // 8
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt)
    if kind is None or bits not in (8, 16, 32, 64):
        raise ValueError(f"{path}: unsupported sample format {sfmt}/{bits}")
    dtype = np.dtype(f"{bo}{kind}{sample_bytes}")
    if spp != 1:
        raise ValueError(f"{path}: only 1 sample/pixel supported (got {spp})")

    def decode(chunk: bytes, rows: int, cols: int) -> np.ndarray:
        if comp == 1:
            raw = chunk
        elif comp in (8, 32946):  # deflate
            raw = zlib.decompress(chunk)
        elif comp == 5:
            raw = _lzw_decode(chunk)
        else:
            raise ValueError(f"{path}: unsupported TIFF compression {comp}")
        raw = raw[: rows * cols * spp * sample_bytes]
        raw = _undo_predictor(raw, pred, rows, cols, spp, sample_bytes, bo)
        dt = np.dtype(f"<{kind}{sample_bytes}") if pred in (2, 3) and bo == "<" else (
            np.dtype(f"{'<' if pred == 3 else bo}{kind}{sample_bytes}")
        )
        return np.frombuffer(raw, dt).reshape(rows, cols)

    out = np.empty((height, width), np.float64)
    if T_TILE_OFFSETS in tags:
        tw, tl = tags[T_TILE_W][0], tags[T_TILE_L][0]
        offs, cnts = tags[T_TILE_OFFSETS], tags[T_TILE_COUNTS]
        ntx = (width + tw - 1) // tw
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(idx, ntx)
            tile = decode(buf[o : o + c], tl, tw)
            y0, x0 = ty * tl, tx * tw
            ys, xs = min(tl, height - y0), min(tw, width - x0)
            out[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
    else:
        rps = tags.get(T_ROWS_PER_STRIP, [height])[0]
        offs, cnts = tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS]
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            y0 = idx * rps
            rows = min(rps, height - y0)
            out[y0 : y0 + rows] = decode(buf[o : o + c], rows, width)

    nodata = None
    if T_GDAL_NODATA in tags:
        try:
            nodata = float(tags[T_GDAL_NODATA][0])
        except ValueError:
            nodata = None
    if nodata is not None:
        out = np.where(out == nodata, np.nan, out)
    scale = tags.get(T_MODEL_SCALE, [1.0, 1.0, 0.0])
    tie = tags.get(T_MODEL_TIEPOINT, [0.0] * 6)
    return GeoTiff(
        width=width, height=height, data=out,
        pixel_scale=(float(scale[0]), float(scale[1])),
        tiepoint=tuple(float(v) for v in tie[:6]),
        nodata=nodata,
    )


def geotiff_to_pixels(spark, path: str, value_col: str = "value"):
    """One GeoTIFF -> long-form (lon, lat, value) DataFrame; NaN/nodata
    pixels are dropped (a population-weights table wants real weights
    only — the reference's default_weight=0 handles absent cells)."""
    import pandas as pd

    gt = read_geotiff(path)
    lon, lat = gt.lonlat_axes()
    glon, glat = np.meshgrid(lon, lat)
    keep = ~np.isnan(gt.data.ravel())
    pdf = pd.DataFrame(
        {
            "lon": glon.ravel()[keep],
            "lat": glat.ravel()[keep],
            value_col: gt.data.ravel()[keep],
        }
    )
    return spark.createDataFrame(pdf)


def read_geotiff_distributed(spark, paths: list[str], value_col: str = "value"):
    """Many GeoTIFFs -> one long-form DataFrame, parsed on the EXECUTORS
    (mapInPandas over the path list — same 100-TB shape as
    sources.netcdf3.read_netcdf3_distributed; no GDAL on workers)."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                gt = read_geotiff(p)
                lon, lat = gt.lonlat_axes()
                glon, glat = np.meshgrid(lon, lat)
                keep = ~np.isnan(gt.data.ravel())
                yield pd.DataFrame(
                    {
                        "src": p,
                        "lon": glon.ravel()[keep],
                        "lat": glat.ravel()[keep],
                        value_col: gt.data.ravel()[keep],
                    }
                )

    from .pool import distribute_paths

    plist = distribute_paths(spark, paths)
    return plist.mapInPandas(
        parse, f"src string, lon double, lat double, {value_col} double"
    )
