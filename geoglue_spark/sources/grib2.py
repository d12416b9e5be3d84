"""Pure-NumPy GRIB edition-2 reader + writer (S6 sibling of grib1.py —
current CDS deliveries are increasingly GRIB2; reference
src/geoglue/cds.py:389-414 reads both editions through cfgrib).

GRIB2 is the public WMO FM 92 byte format: a message is section 0
(indicator: "GRIB", discipline, edition=2, 64-bit total length) followed
by numbered sections, each ``length(4) number(1) body``, terminated by
"7777":

* 1 identification — centre, tables version, REFERENCE time (y,m,d,h,m,s)
* 3 grid definition — template 3.0 regular lat/lon: Ni/Nj, La1/Lo1/La2/
  Lo2 and Di/Dj in 1e-6 degree units, scanning mode (bit 0x40 = +j)
* 4 product definition — template 4.0 (instant: category/number/surface,
  forecast step) or 4.8 (accumulation: step + explicit end-of-interval
  time, which IS the valid time)
* 5 data representation — template 5.0 simple packing: IEEE-float32
  reference R, binary scale E, decimal scale D, bits per value
* 6 bitmap — 255 none / 0 present (bit per grid point) / 254 previous
* 7 data — big-endian N-bit integers X; value = (R + X*2^E) / 10^D

Unlike GRIB1: lengths are 32/64-bit, the reference value is IEEE (not
IBM) float, negative integers are SIGN-AND-MAGNITUDE, and parameters are
(discipline, category, number) triples instead of table-128 ids.

Scope: regular lat/lon grids (template 3.0), products 4.0/4.8, simple
packing 5.0 — what ERA5 surface GRIB2 uses. The writer emits the same
subset, so decoded output cross-validates against the independent
HDF5/netCDF readers on the reference's real data (tests/test_grib2.py),
and hand-crafted golden bytes pin both directions against the spec.

Scale shape: one file parses driver-side; archives fan out per-file on
executors via mapInPandas (:func:`read_grib2_distributed`).
"""

from __future__ import annotations

import datetime
import struct

import numpy as np

from .grib1 import GribRecord, _unpack_bits

# (discipline, category, number, first-surface type) -> short name, for the
# ERA5 surface set (WMO code tables 4.1/4.2); surface None = any
G2_PARAM_NAMES = {
    (0, 0, 0, 103): "t2m",
    (0, 0, 6, 103): "d2m",
    (0, 2, 2, 103): "u10",
    (0, 2, 3, 103): "v10",
    (0, 1, 8, 1): "tp",
    (0, 1, 52, 1): "tp",  # ECMWF total-precipitation-rate variant
}
# reverse map for the writer (name -> triple + surface (type, scaled value))
G2_PARAM_ENCODE = {
    "t2m": (0, 0, 0, 103, 2),
    "d2m": (0, 0, 6, 103, 2),
    "u10": (0, 2, 2, 103, 10),
    "v10": (0, 2, 3, 103, 10),
    "tp": (0, 1, 8, 1, 0),
}

_TIME_UNIT_HOURS = {0: 1 / 60.0, 1: 1.0, 2: 24.0, 10: 3.0, 11: 6.0, 12: 12.0, 13: 1 / 3600.0}


def _u16(b, o):
    return int.from_bytes(b[o : o + 2], "big")


def _u32(b, o):
    return int.from_bytes(b[o : o + 4], "big")


def _u64(b, o):
    return int.from_bytes(b[o : o + 8], "big")


def _sm16(b, o):
    """GRIB2 sign-and-magnitude 16-bit int."""
    v = _u16(b, o)
    return -(v & 0x7FFF) if v & 0x8000 else v


def _sm32(b, o):
    v = _u32(b, o)
    return -(v & 0x7FFFFFFF) if v & 0x80000000 else v


def parse_grib2(path: str, params: set[str] | None = None) -> list[GribRecord]:
    """Parse every (or the named-parameter subset of) message of a GRIB2
    file into :class:`~geoglue_spark.sources.grib1.GribRecord` rows —
    identical downstream shape to the edition-1 parser. ``params`` filters
    by SHORT NAME ('t2m', 'tp', ...)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    out: list[GribRecord] = []
    off = 0
    while off + 16 <= len(buf):
        if buf[off : off + 4] != b"GRIB":
            break
        edition = buf[off + 7]
        if edition != 2:
            raise NotImplementedError(
                f"GRIB edition {edition} in {path!r} (this module reads 2; "
                "use sources.grib1 for edition 1)"
            )
        discipline = buf[off + 6]
        total = _u64(buf, off + 8)
        msg = buf[off : off + total]
        off += total
        p = 16
        ref_time = None
        ni = nj = 0
        lat0 = lon0 = dlat = dlon = 0.0
        scan_neg_j = True
        cat = num = surf = None
        valid = None
        r_ref = 0.0
        e_scale = d_scale = 0
        nbits = 0
        bitmap = None
        values = None
        while p + 5 <= len(msg):
            if msg[p : p + 4] == b"7777":
                break
            slen = _u32(msg, p)
            snum = msg[p + 4]
            s = msg[p : p + slen]
            # param filter BEFORE the expensive sections: once section 4
            # names the variable, filtered-out messages skip the
            # bit-unpacking of sections 5-7 entirely (the dominant
            # per-message cost; grib1 applies the same pre-decode skip)
            if snum >= 5 and params is not None and cat is not None:
                _name = G2_PARAM_NAMES.get(
                    (discipline, cat, num, surf), f"p{discipline}.{cat}.{num}"
                )
                if _name not in params:
                    p += slen
                    continue
            if snum == 1:
                ref_time = datetime.datetime(
                    _u16(s, 12), s[14], s[15], s[16], s[17], s[18]
                )
            elif snum == 3:
                tmpl = _u16(s, 12)
                if tmpl != 0:
                    raise NotImplementedError(
                        f"GRIB2 grid template 3.{tmpl} (only 3.0 lat/lon)"
                    )
                ni = _u32(s, 30)
                nj = _u32(s, 34)
                la1 = _sm32(s, 46) / 1e6
                lo1 = _sm32(s, 50) / 1e6
                la2 = _sm32(s, 55) / 1e6
                lo2 = _sm32(s, 59) / 1e6
                # Di/Dj "missing" is ALL-ONES (0xFFFFFFFF), not 0 — a
                # truthiness test would accept the 4294.967295 sentinel as
                # a real increment and corrupt every coordinate. Fall back
                # to the la2/lo2 span (lon wraps mod 360 for antimeridian
                # grids) when either increment is missing or zero.
                di_raw = _u32(s, 63)
                dj_raw = _u32(s, 67)
                scan = s[71]
                scan_neg_j = not (scan & 0x40)
                lat0, lon0 = la1, lo1
                if dj_raw not in (0, 0xFFFFFFFF):
                    dlat = dj_raw / 1e6
                else:
                    dlat = abs(la2 - la1) / max(nj - 1, 1)
                if di_raw not in (0, 0xFFFFFFFF):
                    dlon = di_raw / 1e6
                else:
                    dlon = ((lo2 - lo1) % 360.0) / max(ni - 1, 1)
            elif snum == 4:
                tmpl = _u16(s, 7)
                if tmpl not in (0, 8):
                    raise NotImplementedError(
                        f"GRIB2 product template 4.{tmpl} (only 4.0/4.8)"
                    )
                cat, num = s[9], s[10]
                unit = s[17]
                step = _u32(s, 18)
                surf = s[22]
                if tmpl == 8:
                    # accumulation: the END of the overall interval is the
                    # valid time, carried explicitly (octets 35-41)
                    valid = datetime.datetime(
                        _u16(s, 34), s[36], s[37], s[38], s[39], s[40]
                    )
                else:
                    valid = ref_time + datetime.timedelta(
                        hours=step * _TIME_UNIT_HOURS.get(unit, 1.0)
                    )
            elif snum == 5:
                tmpl = _u16(s, 9)
                if tmpl != 0:
                    raise NotImplementedError(
                        f"GRIB2 data-representation template 5.{tmpl} "
                        "(only 5.0 simple packing)"
                    )
                r_ref = struct.unpack(">f", s[11:15])[0]
                e_scale = _sm16(s, 15)
                d_scale = _sm16(s, 17)
                nbits = s[19]
            elif snum == 6:
                ind = s[5]
                if ind == 0:
                    bitmap = np.unpackbits(np.frombuffer(s[6:], np.uint8))[
                        : ni * nj
                    ].astype(bool)
                elif ind == 255:
                    bitmap = None
                else:
                    # 254 (reuse previously-defined bitmap) is NOT tracked
                    # across messages here — accepting it would unpack
                    # ni*nj values from a bitmap-compressed section 7:
                    # reshape error at best, silently wrong values when the
                    # byte-padded length happens to fit. Refuse loudly.
                    raise NotImplementedError(f"predefined GRIB2 bitmap {ind}")
            elif snum == 7:
                npts = ni * nj
                nstored = npts if bitmap is None else int(bitmap.sum())
                x = _unpack_bits(s[5:], nbits, nstored)
                vals = (r_ref + x.astype(np.float64) * (2.0 ** e_scale)) / (
                    10.0 ** d_scale
                )
                if bitmap is not None:
                    full = np.full(npts, np.nan)
                    full[bitmap] = vals
                    vals = full
                values = vals
            p += slen
        if values is None:
            continue
        key = (discipline, cat, num, surf)
        name = G2_PARAM_NAMES.get(key, f"p{discipline}.{cat}.{num}")
        if params is not None and name not in params:
            continue
        out.append(
            GribRecord(
                param=(discipline << 16) | (cat << 8) | num, name=name,
                time=valid, ni=ni, nj=nj, lat0=lat0, lon0=lon0,
                dlat=dlat, dlon=dlon, scan_neg_j=scan_neg_j,
                values=values.reshape(nj, ni),
            )
        )
    return out


def grib2_to_pixels(spark, path: str, params: set[str] | None = None):
    """One GRIB2 file -> long-form (var, time, lon, lat, value) table."""
    from .grib1 import _records_to_pdf

    return spark.createDataFrame(_records_to_pdf(parse_grib2(path, params)))


def read_grib2_distributed(spark, paths: list[str], params: set[str] | None = None):
    """Many GRIB2 files parsed on the executors (mapInPandas) — the same
    100-TB fan-out shape as the other byte sources."""
    from .grib1 import _records_to_pdf

    def parse(batches):
        for pdf in batches:
            for p in pdf["path"]:
                yield _records_to_pdf(parse_grib2(p, params), src=p)

    from .pool import distribute_paths

    plist = distribute_paths(spark, paths)
    return plist.mapInPandas(
        parse,
        "src string, var string, time timestamp, lon double, lat double, value double",
    )


# ---------------------------------------------------------------------------
# writer (simple packing, template 3.0 / 4.0 / 5.0) — gives the decoder an
# independent-data cross-check and lets tests re-encode the reference's real
# netCDF/GRIB1 fields into edition 2
# ---------------------------------------------------------------------------
def _pack_bits(x: np.ndarray, nbits: int) -> bytes:
    if nbits == 0:
        return b""
    bits = ((x[:, None] >> np.arange(nbits - 1, -1, -1, dtype=np.int64)) & 1).astype(
        np.uint8
    )
    return np.packbits(bits.ravel()).tobytes()


def _sm_bytes(v: int, width: int) -> bytes:
    """Sign-and-magnitude big-endian encoding."""
    sign = 0x80 << (8 * (width - 1)) if v < 0 else 0
    return (abs(v) | sign).to_bytes(width, "big")


def write_grib2(
    path: str,
    fields: list[dict],
    dec_scale: int = 6,
    max_bits: int = 32,
) -> str:
    """Write GRIB2 messages with simple packing. Each field dict:
    ``name`` (key of G2_PARAM_ENCODE), ``time`` (datetime, emitted as the
    reference time with step 0), ``lat0 lon0 dlat dlon`` (degrees; rows
    run north->south from lat0), ``values`` ((nj, ni) float array — NaN
    holes become a bitmap). ``dec_scale`` sets the packing precision to
    10^-dec_scale; bits per value are sized from the field's range (capped
    at ``max_bits``, widening the quantization step if the cap binds)."""
    msgs = []
    for f in fields:
        name = f["name"]
        disc, cat, num, stype, sval = G2_PARAM_ENCODE[name]
        vals = np.asarray(f["values"], np.float64)
        nj, ni = vals.shape
        mask = np.isfinite(vals)
        flat = vals.ravel()[mask.ravel()]
        d = dec_scale
        if flat.size:
            lo, hi = float(flat.min()), float(flat.max())
        else:
            lo = hi = 0.0
        # the wire carries R as IEEE float32: quantize the reference DOWN
        # to a representable value first (so X stays non-negative) and size
        # the integer span from THAT — otherwise float32 round-off on R
        # alone costs ~2^-24 relative error, swamping the 10^-D quantum
        ref32 = np.float32(lo * 10.0 ** d)
        if float(ref32) > lo * 10.0 ** d:
            ref32 = np.nextafter(ref32, np.float32(-np.inf))
        ref = float(ref32)
        span = hi * 10.0 ** d - ref
        nbits = max(1, int(np.ceil(np.log2(span + 1))) if span > 0 else 1)
        e = 0
        while nbits > max_bits:  # widen the step: value = (R + X*2^E)/10^D
            e += 1
            nbits = max(1, int(np.ceil(np.log2(span / 2.0 ** e + 1))))
        x = np.rint((flat * 10.0 ** d - ref) / 2.0 ** e).astype(np.int64)
        t = f["time"]
        sec1 = (
            b"\x01" + (0).to_bytes(2, "big") * 2 + bytes([4, 0, 1])
            + t.year.to_bytes(2, "big")
            + bytes([t.month, t.day, t.hour, t.minute, t.second, 0, 2])
        )
        la1 = round(f["lat0"] * 1e6)
        lo1 = round(f["lon0"] * 1e6)
        la2 = round((f["lat0"] - f["dlat"] * (nj - 1)) * 1e6)
        lo2 = round((f["lon0"] + f["dlon"] * (ni - 1)) * 1e6)
        sec3 = (
            b"\x03\x00" + (ni * nj).to_bytes(4, "big") + b"\x00\x00"
            + (0).to_bytes(2, "big")  # template 3.0
            + bytes([6]) + b"\x00" + (0).to_bytes(4, "big")  # earth shape
            + b"\x00" + (0).to_bytes(4, "big") + b"\x00" + (0).to_bytes(4, "big")
            + ni.to_bytes(4, "big") + nj.to_bytes(4, "big")
            + (0).to_bytes(4, "big") + (0xFFFFFFFF).to_bytes(4, "big")
            + _sm_bytes(la1, 4) + _sm_bytes(lo1, 4)
            + bytes([0x30])  # resolution flags: Di & Dj given
            + _sm_bytes(la2, 4) + _sm_bytes(lo2, 4)
            + round(f["dlon"] * 1e6).to_bytes(4, "big")
            + round(f["dlat"] * 1e6).to_bytes(4, "big")
            + bytes([0x00])  # scanning: +i, -j (north -> south rows)
        )
        sec4 = (
            b"\x04" + (0).to_bytes(2, "big") + (0).to_bytes(2, "big")  # template 4.0
            + bytes([cat, num, 0, 255, 255]) + (0).to_bytes(2, "big") + b"\x00"
            + bytes([1]) + (0).to_bytes(4, "big")  # unit=hour, step 0
            + bytes([stype, 0]) + sval.to_bytes(4, "big")
            + bytes([255, 0]) + (0).to_bytes(4, "big")
        )
        # octets 6-9 of section 5 = number of data points actually PACKED
        # in section 7 (WMO FM 92-16): with a bitmap that is the masked
        # count, not ni*nj — external decoders (cfgrib/wgrib2) parse this
        # field even though the in-repo reader derives it from the bitmap
        sec5 = (
            b"\x05" + int(mask.sum()).to_bytes(4, "big") + (0).to_bytes(2, "big")
            + struct.pack(">f", ref) + _sm_bytes(e, 2) + _sm_bytes(d, 2)
            + bytes([nbits, 0])
        )
        if mask.all():
            sec6 = b"\x06\xff"
        else:
            sec6 = b"\x06\x00" + np.packbits(mask.ravel().astype(np.uint8)).tobytes()
        sec7 = b"\x07" + _pack_bits(x, nbits)
        # section length octets 1-4 count THEMSELVES (WMO spec)
        body = b"".join(
            (len(s) + 4).to_bytes(4, "big") + s
            for s in (
                sec1,
                sec3,
                sec4,
                sec5,
                sec6,
                sec7,
            )
        )
        total = 16 + len(body) + 4
        sec0 = b"GRIB" + b"\x00\x00" + bytes([disc, 2]) + total.to_bytes(8, "big")
        msgs.append(sec0 + body + b"7777")
    with open(path, "wb") as fh:
        fh.write(b"".join(msgs))
    return path
