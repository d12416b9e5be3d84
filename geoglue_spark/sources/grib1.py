"""Pure-NumPy GRIB edition-1 reader (S6: the reference's CDS pipeline
also delivers ERA5 as GRIB — reference src/geoglue/cds.py `grib` format
path; its tests ship SGP-2019-era5_grib.grib).

GRIB1 is a public WMO byte format: each message = IS ("GRIB", length,
edition) + PDS (parameter/level/date/decimal scale) + GDS (lat/lon grid)
+ optional BMS (bitmap) + BDS (simple packing: IBM-float reference value
R, binary scale E, N-bit integers X; value = (R + X·2^E) / 10^D).

Scope: regular lat/lon grids, simple packing (what ERA5 GRIB1 uses).
Cross-format anchor: the reference's GRIB fixture carries the SAME year
of data as its netCDF fixtures, so decoded values must agree with the
independent HDF5 reader within packing precision (tests/test_grib1.py).

Scale shape: one file parses driver-side; archives fan out per-file on
executors via mapInPandas (:func:`read_grib1_distributed`), the same
pattern as sources.netcdf3/geotiff.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass

import numpy as np

# ECMWF table-128 parameter ids seen in ERA5 surface GRIB1
PARAM_NAMES = {167: "t2m", 228: "tp", 165: "u10", 166: "v10", 168: "d2m"}


@dataclass
class GribRecord:
    param: int
    name: str
    time: datetime.datetime
    ni: int
    nj: int
    lat0: float
    lon0: float
    dlat: float
    dlon: float
    scan_neg_j: bool           # True: latitudes run north -> south
    values: np.ndarray         # (nj, ni) float64, bitmap holes -> NaN


def _i3(b: bytes, o: int) -> int:
    return (b[o] << 16) | (b[o + 1] << 8) | b[o + 2]


def _s3(b: bytes, o: int) -> int:
    v = _i3(b, o)
    return -(v & 0x7FFFFF) if v & 0x800000 else v


def _s2(b: bytes, o: int) -> int:
    v = (b[o] << 8) | b[o + 1]
    return -(v & 0x7FFF) if v & 0x8000 else v


def _ibm_float(b: bytes, o: int) -> float:
    """IBM System/360 32-bit float (GRIB1 reference values)."""
    a = b[o]
    sign = -1.0 if a & 0x80 else 1.0
    exp = (a & 0x7F) - 64
    mant = ((b[o + 1] << 16) | (b[o + 2] << 8) | b[o + 3]) / float(1 << 24)
    return sign * mant * (16.0 ** exp)


def _unpack_bits(data: bytes, nbits: int, n: int) -> np.ndarray:
    if nbits == 0:
        return np.zeros(n, np.int64)
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    bits = bits[: n * nbits].reshape(n, nbits).astype(np.int64)
    weights = (1 << np.arange(nbits - 1, -1, -1, dtype=np.int64))
    return bits @ weights


def parse_grib1(path: str, params: set[int] | None = None) -> list[GribRecord]:
    """Parse every (or the selected) message of a GRIB1 file."""
    with open(path, "rb") as fh:
        buf = fh.read()
    out: list[GribRecord] = []
    off = 0
    while off + 8 <= len(buf):
        if buf[off : off + 4] != b"GRIB":
            break
        if buf[off + 7] != 1:
            raise NotImplementedError(f"GRIB edition {buf[off + 7]} (only 1)")
        total = _i3(buf, off + 4)
        msg = buf[off : off + total]
        off += total
        p = 8  # PDS start
        pds_len = _i3(msg, p)
        flags = msg[p + 7]
        param = msg[p + 8]
        if params is not None and param not in params:
            continue
        yy, mm, dd, hh, mi = msg[p + 12], msg[p + 13], msg[p + 14], msg[p + 15], msg[p + 16]
        p1 = msg[p + 18]
        p2 = msg[p + 19]
        tri = msg[p + 20]  # time range indicator
        century = msg[p + 24]
        dec_scale = _s2(msg, p + 26)
        year = (century - 1) * 100 + yy
        # instant fields are valid at reference+P1; accumulations (TRI 4)
        # over [P1, P2] are valid at the END of the interval (reference+P2)
        step = p2 if tri == 4 else p1
        time = datetime.datetime(year, mm, dd, hh, mi) + datetime.timedelta(hours=step)
        q = p + pds_len
        ni = nj = 0
        lat0 = lon0 = dlat = dlon = 0.0
        scan_neg_j = True
        bitmap = None
        if flags & 0x80:  # GDS present
            gds_len = _i3(msg, q)
            drt = msg[q + 5]
            if drt != 0:
                raise NotImplementedError(f"GRIB1 grid type {drt} (only lat/lon)")
            ni = (msg[q + 6] << 8) | msg[q + 7]
            nj = (msg[q + 8] << 8) | msg[q + 9]
            la1 = _s3(msg, q + 10) / 1000.0
            lo1 = _s3(msg, q + 13) / 1000.0
            la2 = _s3(msg, q + 17) / 1000.0
            lo2 = _s3(msg, q + 20) / 1000.0
            scan = msg[q + 27]
            scan_neg_j = not (scan & 0x40)
            lat0, lon0 = la1, lo1
            dlat = abs(la2 - la1) / max(nj - 1, 1)
            # longitude span wraps mod 360 (same formula as the GRIB2
            # fallback): a Fiji-like grid with lo1=177, lo2=-177 spans 6°,
            # while a global 0 -> 359.75 grid spans 359.75° — a naive
            # ">180 means wrapped" flip would corrupt every global grid
            dlon = ((lo2 - lo1) % 360.0) / max(ni - 1, 1)
            q += gds_len
        if flags & 0x40:  # BMS present
            bms_len = _i3(msg, q)
            unused = msg[q + 3]
            table = (msg[q + 4] << 8) | msg[q + 5]
            if table != 0:
                raise NotImplementedError("predefined GRIB bitmaps")
            nbits_total = (bms_len - 6) * 8 - unused
            bitmap = np.unpackbits(
                np.frombuffer(msg[q + 6 : q + bms_len], np.uint8)
            )[:nbits_total].astype(bool)
            q += bms_len
        # BDS
        bds_len = _i3(msg, q)
        bds_flags = msg[q + 3] >> 4
        if bds_flags & 0x4 or bds_flags & 0x8:
            raise NotImplementedError("only grid-point simple packing")
        unused_bits = msg[q + 3] & 0x0F
        e_scale = _s2(msg, q + 4)
        ref = _ibm_float(msg, q + 6)
        nbits = msg[q + 10]
        data = msg[q + 11 : q + bds_len]
        npts = ni * nj
        nstored = npts if bitmap is None else int(bitmap.sum())
        x = _unpack_bits(data, nbits, nstored)
        vals = (ref + x.astype(np.float64) * (2.0 ** e_scale)) / (10.0 ** dec_scale)
        if bitmap is not None:
            full = np.full(npts, np.nan)
            full[bitmap[:npts]] = vals
            vals = full
        out.append(
            GribRecord(
                param=param, name=PARAM_NAMES.get(param, f"p{param}"), time=time,
                ni=ni, nj=nj, lat0=lat0, lon0=lon0, dlat=dlat, dlon=dlon,
                scan_neg_j=scan_neg_j, values=vals.reshape(nj, ni),
            )
        )
    return out


def _records_to_pdf(recs: list[GribRecord], src: str | None = None):
    import pandas as pd

    frames = []
    for r in recs:
        lats = r.lat0 + (np.arange(r.nj) * (-r.dlat if r.scan_neg_j else r.dlat))
        lons = r.lon0 + np.arange(r.ni) * r.dlon
        glon, glat = np.meshgrid(lons, lats)
        d = {
            "var": r.name,
            "time": pd.Timestamp(r.time),
            "lon": glon.ravel(),
            "lat": glat.ravel(),
            "value": r.values.ravel(),
        }
        if src is not None:
            d = {"src": src, **d}
        frames.append(pd.DataFrame(d))
    return pd.concat(frames, ignore_index=True)


def grib1_to_pixels(spark, path: str, params: set[int] | None = None):
    """One GRIB1 file -> long-form (var, time, lon, lat, value) table."""
    return spark.createDataFrame(_records_to_pdf(parse_grib1(path, params)))


def read_grib1_distributed(spark, paths: list[str], params: set[int] | None = None):
    """Many GRIB1 files parsed on the executors (mapInPandas) — the same
    100-TB fan-out shape as the netCDF-3/GeoTIFF sources."""

    def parse(batches):
        for pdf in batches:
            for p in pdf["path"]:
                yield _records_to_pdf(parse_grib1(p, params), src=p)

    from .pool import distribute_paths

    plist = distribute_paths(spark, paths)
    return plist.mapInPandas(
        parse,
        "src string, var string, time timestamp, lon double, lat double, value double",
    )
