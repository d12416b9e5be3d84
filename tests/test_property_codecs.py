"""Property-based round-trips (hypothesis) for the pure-NumPy codecs:
PNG scanline filters, TIFF-LZW, classic netCDF-3 — random shapes, dtypes
and byte distributions, no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geoglue_spark.images import decode_png, encode_png
from geoglue_spark.sources.geotiff import _lzw_decode
from geoglue_spark.sources.netcdf3 import read_netcdf3, write_netcdf3


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    color=st.booleans(),
    ftype=st.integers(0, 4),
)
def test_png_filter_round_trip(seed, h, w, color, ftype):
    rng = np.random.Generator(np.random.PCG64(seed))
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img, filter_type=ftype)), img)


def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF-LZW compressor (public spec; width switch paired
    with the decoder, which is externally anchored by GDAL-written files)."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out, bitbuf, nbits = bytearray(), 0, 0

    def emit(code, w):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << w) | code
        nbits += w
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
            bitbuf &= (1 << nbits) - 1

    emit(256, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: emit Clear and reset
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(0, 30000),
    alphabet=st.integers(1, 256),
)
def test_tiff_lzw_round_trip(seed, n, alphabet):
    """Low-alphabet payloads force deep LZW tables (width growth through
    10/11/12 bits and the Clear-code reset path)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    payload = bytes(rng.integers(0, alphabet, n, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(payload)) == payload


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    ny=st.integers(1, 20),
    nx=st.integers(1, 20),
    dt=st.sampled_from(["f8", "f4", "i4", "i2", "i1"]),
)
def test_netcdf3_round_trip(tmp_path_factory, seed, ny, nx, dt):
    rng = np.random.Generator(np.random.PCG64(seed))
    if dt.startswith("f"):
        arr = rng.standard_normal((ny, nx)).astype(dt)
    else:
        info = np.iinfo(dt)
        arr = rng.integers(info.min, info.max, (ny, nx)).astype(dt)
    path = str(tmp_path_factory.mktemp("nc") / "r.nc")
    write_netcdf3(
        path,
        dims=[("y", ny), ("x", nx)],
        variables={"v": (["y", "x"], arr)},
        attrs={"seed": np.int32(seed % 2**31)},
    )
    nc = read_netcdf3(path)
    np.testing.assert_array_equal(nc.data["v"], arr)
    assert nc.data["v"].dtype == np.dtype(dt)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    nj=st.integers(1, 24),
    ni=st.integers(1, 24),
    scale=st.sampled_from([1e-3, 1.0, 1e3, 1e6]),
    offset=st.sampled_from([0.0, -500.0, 273.15, 1e5]),
    dec=st.integers(2, 6),
    nan_frac=st.floats(0.0, 0.4),
)
def test_grib2_round_trip(tmp_path_factory, seed, nj, ni, scale, offset, dec, nan_frac):
    """GRIB2 simple-packing round trip across magnitudes, decimal scales,
    and NaN bitmaps: |decoded - original| <= the packing quantum
    (0.5 * 10^-D, plus the binary-scale widening when the 32-bit cap
    binds)."""
    import datetime

    from geoglue_spark.sources.grib2 import parse_grib2, write_grib2

    rng = np.random.Generator(np.random.PCG64(seed))
    vals = offset + rng.random((nj, ni)) * scale
    mask = rng.random((nj, ni)) < nan_frac
    vals[mask] = np.nan
    p = str(tmp_path_factory.mktemp("g2") / "x.grib2")
    write_grib2(
        p,
        [{
            "name": "t2m", "time": datetime.datetime(2020, 6, 1, 12),
            "lat0": 50.0, "lon0": -10.0, "dlat": 0.5, "dlon": 0.5,
            "values": vals,
        }],
        dec_scale=dec,
    )
    r = parse_grib2(p)[0]
    assert r.values.shape == (nj, ni)
    np.testing.assert_array_equal(np.isnan(r.values), mask)
    fin = ~mask
    if fin.any():
        span = float(np.nanmax(vals) - np.nanmin(vals)) * 10.0 ** dec
        # quantum: 0.5 ulp of the packed step; E>0 only when span > 2^32
        step = 2.0 ** max(0, int(np.ceil(np.log2(max(span, 1) + 1))) - 32)
        tol = 0.5 * step * 10.0 ** -dec + 1e-12
        assert float(np.abs(r.values[fin] - vals[fin]).max()) <= tol


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(8, 48),
    w=st.integers(8, 48),
    color=st.booleans(),
    quality=st.integers(85, 100),
)
def test_jpeg_round_trip_property(seed, h, w, color, quality):
    """Baseline JPEG on band-limited random fields: decodes to the same
    shape with quality-calibrated PSNR floors (small images put the full
    field into one 8x8 block, so mid-quality quantization legitimately
    costs more there)."""
    from geoglue_spark.images import psnr
    from geoglue_spark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.random((6, 6)) * 200 + 28
    # bilinear-upsample a coarse field -> band-limited image
    ys = np.linspace(0, 5, h)
    xs = np.linspace(0, 5, w)
    y0 = np.floor(ys).astype(int).clip(0, 4); x0 = np.floor(xs).astype(int).clip(0, 4)
    fy = (ys - y0)[:, None]; fx = (xs - x0)[None, :]
    img = ((1 - fy) * (1 - fx) * base[y0][:, x0] + (1 - fy) * fx * base[y0][:, x0 + 1]
           + fy * (1 - fx) * base[y0 + 1][:, x0] + fy * fx * base[y0 + 1][:, x0 + 1])
    img = img.clip(0, 255).astype(np.uint8)
    if color:
        # modest chroma (scaled copies): the Annex-K chroma table's high
        # frequencies are 99s, so saturated complementary channels at
        # mid quality lose 10+ dB legitimately — that's JPEG, not a bug
        img = np.stack(
            [img, (img * 0.8 + 20).astype(np.uint8), (img * 0.9 + 10).astype(np.uint8)],
            axis=-1,
        )
    back = decode_jpeg(encode_jpeg(img, quality=quality, subsampling="444"))
    assert back.shape == img.shape
    assert psnr(img, back) >= (38.0 if quality >= 95 else 30.0)
    # near-lossless limit: q100 quant tables are all-ones scale
    back100 = decode_jpeg(encode_jpeg(img, quality=100, subsampling="444"))
    assert psnr(img, back100) >= 45.0


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    oh=st.integers(1, 48),
    ow=st.integers(1, 48),
    color=st.booleans(),
    method=st.sampled_from(["nearest", "bilinear", "area"]),
)
def test_resize_kernel_properties(seed, h, w, oh, ow, color, method):
    """Any kernel, any shape pair: output dtype/shape exact, values stay
    inside the input's [min, max] envelope (all three kernels are convex
    combinations of input pixels, up to uint8 rounding), and a constant
    image stays constant."""
    from geoglue_spark.images import RESIZE_KERNELS

    rng = np.random.Generator(np.random.PCG64(seed))
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = RESIZE_KERNELS[method](img, ow, oh)
    assert out.dtype == np.uint8
    assert out.shape == ((oh, ow, 3) if color else (oh, ow))
    assert out.min() >= img.min() and out.max() <= img.max()
    const = np.full(shape, 91, np.uint8)
    assert (RESIZE_KERNELS[method](const, ow, oh) == 91).all()


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    oh=st.integers(1, 16),
    ow=st.integers(1, 16),
    fy=st.integers(1, 4),
    fx=st.integers(1, 4),
)
def test_resize_area_integer_factor_is_exact_block_mean(seed, oh, ow, fy, fx):
    rng = np.random.Generator(np.random.PCG64(seed))
    img = rng.integers(0, 256, (oh * fy, ow * fx), dtype=np.uint8)
    from geoglue_spark.images import resize_area

    want = np.rint(
        img.astype(np.float64).reshape(oh, fy, ow, fx).mean(axis=(1, 3))
    ).astype(np.uint8)
    np.testing.assert_array_equal(resize_area(img, ow, oh), want)
