"""Pure-NumPy classic netCDF-3 reader/writer (S8 raster-source fidelity).

The reference opens rasters by suffix dispatch (reference
src/geoglue/util.py:26-73: ``.nc`` -> xarray, ``.tif`` -> rioxarray);
this container has neither library, but classic netCDF-3 (CDF-1/CDF-2) is
a simple, fully public binary format — readable with stdlib ``struct`` +
NumPy. The reader parses the header (dims / attrs / vars), memory-maps
fixed and record variables, and :func:`netcdf3_to_pixels` emits the
engine's long-form ``(lon, lat[, time], value)`` table.

Scale shape: ONE .nc file is driver-parsed (ERA5 slices are file-granular,
~MBs); a 100-TB archive is MANY files, so :func:`read_netcdf3_distributed`
fans the file list out via mapInPandas — each task parses its own file
with this same parser, no driver bottleneck.

netCDF-4 (HDF5 container, magic ``\\x89HDF``) is a different, far larger
format and stays out of scope — the reader raises a clear error naming it.
Byte layout follows the public NetCDF Classic Format specification
(magic CDF1/CDF2, big-endian, 4-byte-aligned, tagged dim/att/var lists).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
ABSENT = (0, 0)

# nc_type -> (numpy dtype (big-endian), size)
_TYPES = {
    1: (">i1", 1),  # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}
_REV_TYPES = {np.dtype(d).newbyteorder("="): t for t, (d, _) in _TYPES.items() if t != 2}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


@dataclass
class NcVariable:
    name: str
    dim_ids: list[int]
    attrs: dict
    nc_type: int
    vsize: int
    begin: int


@dataclass
class NcFile:
    dims: list[tuple[str, int]]           # (name, length); 0 = record dim
    attrs: dict
    variables: dict[str, NcVariable]
    numrecs: int
    version: int
    data: dict[str, np.ndarray] = field(default_factory=dict)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.off)
        self.off += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.off)
        self.off += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.off : self.off + n].decode()
        self.off += n + _pad4(n)
        return s

    def values(self, nc_type: int, n: int):
        dt, sz = _TYPES[nc_type]
        raw = self.buf[self.off : self.off + n * sz]
        self.off += n * sz + _pad4(n * sz)
        if nc_type == 2:
            return raw.decode(errors="replace")
        arr = np.frombuffer(raw, dt)
        return arr[0].item() if n == 1 else arr

    def att_list(self) -> dict:
        tag, count = self.u32(), self.u32()
        if (tag, count) == ABSENT:
            return {}
        if tag != NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag 0x{tag:X}")
        out = {}
        for _ in range(count):
            nm = self.name()
            t = self.u32()
            n = self.u32()
            out[nm] = self.values(t, n)
        return out


def read_netcdf3(path: str, load: bool = True) -> NcFile:
    """Parse a classic netCDF-3 file; ``load=True`` materializes every
    variable as a native-endian NumPy array (record vars stitched across
    records)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] == b"\x89HDF":
        raise ValueError(
            f"{path}: netCDF-4/HDF5 container — only classic netCDF-3 "
            "(CDF-1/CDF-2) is supported by this pure-NumPy reader"
        )
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic netCDF file")
    version = buf[3]
    r = _Reader(buf)
    r.off = 4
    numrecs = r.u32()  # 0xFFFFFFFF = STREAMING; treated as computed below
    tag, ndims = r.u32(), r.u32()
    dims: list[tuple[str, int]] = []
    if (tag, ndims) != ABSENT:
        if tag != NC_DIMENSION:
            raise ValueError(f"bad dimension-list tag 0x{tag:X}")
        for _ in range(ndims):
            dims.append((r.name(), r.u32()))
    gatts = r.att_list()
    tag, nvars = r.u32(), r.u32()
    variables: dict[str, NcVariable] = {}
    if (tag, nvars) != ABSENT:
        if tag != NC_VARIABLE:
            raise ValueError(f"bad variable-list tag 0x{tag:X}")
        for _ in range(nvars):
            nm = r.name()
            nd = r.u32()
            dim_ids = [r.u32() for _ in range(nd)]
            vatts = r.att_list()
            nc_type = r.u32()
            vsize = r.u32()
            begin = r.u64() if version == 2 else r.u32()
            variables[nm] = NcVariable(nm, dim_ids, vatts, nc_type, vsize, begin)
    rec_vars = [v for v in variables.values() if _is_record(v, dims)]
    recsize = sum(v.vsize for v in rec_vars)
    if numrecs == 0xFFFFFFFF:  # STREAMING: compute from the file size
        if rec_vars and recsize:
            first = min(v.begin for v in rec_vars)
            numrecs = (len(buf) - first) // recsize
        else:
            numrecs = 0
    nc = NcFile(dims, gatts, variables, numrecs, version)
    if load:
        for v in variables.values():
            nc.data[v.name] = _load_var(buf, v, dims, numrecs, recsize, len(rec_vars))
    return nc


def _is_record(v: NcVariable, dims: list[tuple[str, int]]) -> bool:
    return bool(v.dim_ids) and dims[v.dim_ids[0]][1] == 0


def _load_var(
    buf: bytes,
    v: NcVariable,
    dims: list[tuple[str, int]],
    numrecs: int,
    recsize: int,
    n_rec_vars: int,
) -> np.ndarray:
    dt, sz = _TYPES[v.nc_type]
    shape = [dims[d][1] for d in v.dim_ids]
    if not _is_record(v, dims):
        n = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, dt, count=n, offset=v.begin)
        return arr.reshape(shape).astype(np.dtype(dt).newbyteorder("="))
    # record variable: one slab per record at begin + rec * recsize
    # (single record variable: slabs are contiguous — spec special case)
    slab_shape = shape[1:]
    slab_n = int(np.prod(slab_shape)) if slab_shape else 1
    stride = slab_n * sz if n_rec_vars == 1 else recsize
    out = np.empty([numrecs] + slab_shape, np.dtype(dt).newbyteorder("="))
    for rec in range(numrecs):
        out[rec] = np.frombuffer(
            buf, dt, count=slab_n, offset=v.begin + rec * stride
        ).reshape(slab_shape)
    return out


# --------------------------------------------------------------------------
# writer (CDF-1, fixed variables only) — enough to round-trip fixtures and
# to emit rasters other classic-netCDF tools can open
# --------------------------------------------------------------------------
def write_netcdf3(
    path: str,
    dims: list[tuple[str, int]],
    variables: dict,
    attrs: dict | None = None,
) -> str:
    """Write a classic CDF-1 file of FIXED-size variables.
    ``variables``: name -> (dim names, array[, var attrs dict]); dtype one
    of int8/int16/int32/float32/float64."""

    def name_bytes(s: str) -> bytes:
        b = s.encode()
        return struct.pack(">I", len(b)) + b + b"\x00" * _pad4(len(b))

    def att_bytes(d: dict) -> bytes:
        if not d:
            return struct.pack(">II", 0, 0)
        out = [struct.pack(">II", NC_ATTRIBUTE, len(d))]
        for k, val in d.items():
            out.append(name_bytes(k))
            if isinstance(val, str):
                raw = val.encode()
                out.append(struct.pack(">II", 2, len(raw)))
                out.append(raw + b"\x00" * _pad4(len(raw)))
            else:
                arr = np.atleast_1d(np.asarray(val))
                t = _REV_TYPES[arr.dtype.newbyteorder("=")]
                raw = arr.astype(_TYPES[t][0]).tobytes()
                out.append(struct.pack(">II", t, arr.size))
                out.append(raw + b"\x00" * _pad4(len(raw)))
        return b"".join(out)

    dim_index = {nm: i for i, (nm, _) in enumerate(dims)}
    header = [b"CDF\x01", struct.pack(">I", 0)]
    header.append(struct.pack(">II", NC_DIMENSION, len(dims)))
    for nm, ln in dims:
        header.append(name_bytes(nm) + struct.pack(">I", ln))
    header.append(att_bytes(attrs or {}))
    header.append(struct.pack(">II", NC_VARIABLE, len(variables)))
    # first pass with placeholder begins to learn the header size
    var_entries = []
    for nm, spec in variables.items():
        vdims, arr = spec[0], np.asarray(spec[1])
        vattrs = spec[2] if len(spec) > 2 else {}
        t = _REV_TYPES[arr.dtype.newbyteorder("=")]
        vsize = arr.size * _TYPES[t][1]
        vsize += _pad4(vsize)
        ent = (
            name_bytes(nm)
            + struct.pack(">I", len(vdims))
            + b"".join(struct.pack(">I", dim_index[d]) for d in vdims)
            + att_bytes(vattrs)
            + struct.pack(">II", t, vsize)
        )
        var_entries.append((ent, t, arr, vsize))
    fixed = sum(len(e) + 4 for e, *_ in var_entries)  # +4: CDF-1 begin field
    data_start = sum(len(h) for h in header) + fixed
    body = []
    begin = data_start
    for ent, t, arr, vsize in var_entries:
        header.append(ent + struct.pack(">I", begin))
        raw = arr.astype(_TYPES[t][0]).tobytes()
        body.append(raw + b"\x00" * _pad4(len(raw)))
        begin += vsize
    with open(path, "wb") as fh:
        fh.write(b"".join(header) + b"".join(body))
    return path


# --------------------------------------------------------------------------
# Spark adapters
# --------------------------------------------------------------------------
def netcdf3_to_pixels(
    spark,
    path: str,
    var: str,
    lon_name: str = "longitude",
    lat_name: str = "latitude",
    time_name: str = "time",
):
    """One .nc file -> long-form pixel DataFrame (lon, lat[, time], value).
    2-D (lat, lon) or 3-D (time, lat, lon) variables; coordinate variables
    supply the axis values (the reference reads the same CF layout)."""
    nc = read_netcdf3(path)
    v = nc.variables[var]
    dim_names = [nc.dims[d][0] for d in v.dim_ids]
    arr = np.asarray(nc.data[var], np.float64)
    lon = np.asarray(nc.data[lon_name], np.float64)
    lat = np.asarray(nc.data[lat_name], np.float64)
    # CF order: _FillValue is in PACKED units — mask first, then unpack
    if "_FillValue" in v.attrs:
        arr = np.where(arr == float(v.attrs["_FillValue"]), np.nan, arr)
    if "scale_factor" in v.attrs or "add_offset" in v.attrs:
        arr = arr * float(v.attrs.get("scale_factor", 1.0)) + float(
            v.attrs.get("add_offset", 0.0)
        )
    if dim_names[-2:] != [lat_name, lon_name]:
        raise ValueError(f"{var}: expected trailing dims ({lat_name}, {lon_name}), got {dim_names}")
    glon, glat = np.meshgrid(lon, lat)
    if arr.ndim == 2:
        import pandas as pd

        pdf = pd.DataFrame(
            {"lon": glon.ravel(), "lat": glat.ravel(), "value": arr.ravel()}
        )
        return spark.createDataFrame(pdf)
    if arr.ndim == 3:
        import pandas as pd

        # CF units on the time coordinate -> a real 'time' timestamp column
        # (the name every downstream by_dims/resample path keys on,
        # matching netcdf4_to_pixels); raw indices fall back to 'time_idx'
        tvals = np.asarray(nc.data[time_name]) if time_name in nc.data else np.arange(arr.shape[0])
        units = (
            nc.variables[time_name].attrs.get("units")
            if time_name in nc.variables
            else None
        )
        if units and " since " in str(units):
            from .hdf5 import decode_time

            stamps = decode_time(tvals, str(units))
            tcol = lambda i: ("time", pd.Timestamp(stamps[i]))
        else:
            tcol = lambda i: ("time_idx", np.int64(tvals[i]))
        frames = []
        for i in range(arr.shape[0]):
            k, v = tcol(i)
            frames.append(
                pd.DataFrame(
                    {
                        k: v,
                        "lon": glon.ravel(),
                        "lat": glat.ravel(),
                        "value": arr[i].ravel(),
                    }
                )
            )
        return spark.createDataFrame(pd.concat(frames, ignore_index=True))
    raise ValueError(f"{var}: unsupported rank {arr.ndim}")


def read_netcdf3_distributed(spark, paths: list[str], var: str, **names):
    """Many .nc files -> one long-form DataFrame, parsed ON THE EXECUTORS:
    the path list becomes a DataFrame and each mapInPandas task runs the
    pure-NumPy parser on its own files — the 100-TB shape for a
    file-granular archive (no driver parse, no shared-library dependency).
    A ``src`` column carries the originating path for lineage."""
    from pyspark.sql import functions as F  # noqa: F401

    lon_name = names.get("lon_name", "longitude")
    lat_name = names.get("lat_name", "latitude")
    time_name = names.get("time_name", "time")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                nc = read_netcdf3(p)
                arr = np.asarray(nc.data[var], np.float64)
                v = nc.variables[var]
                if "_FillValue" in v.attrs:  # packed units — mask before unpack
                    arr = np.where(arr == float(v.attrs["_FillValue"]), np.nan, arr)
                if "scale_factor" in v.attrs or "add_offset" in v.attrs:
                    arr = arr * float(v.attrs.get("scale_factor", 1.0)) + float(
                        v.attrs.get("add_offset", 0.0)
                    )
                lon = np.asarray(nc.data[lon_name], np.float64)
                lat = np.asarray(nc.data[lat_name], np.float64)
                # same trailing-dims guard as netcdf3_to_pixels: a
                # transposed variable reshapes cleanly (sizes divide) but
                # pairs every value with the wrong (lon, lat)
                dim_names = [nc.dims[d][0] for d in v.dim_ids]
                if dim_names[-2:] != [lat_name, lon_name]:
                    raise ValueError(
                        f"{var}: expected trailing dims ({lat_name}, "
                        f"{lon_name}), got {dim_names}"
                    )
                glon, glat = np.meshgrid(lon, lat)
                flat = arr.reshape(-1, glon.size)
                # CF time decode, same rules as netcdf3_to_pixels: a time
                # coordinate with '<unit> since <epoch>' units becomes real
                # timestamps; time-less 2-D rasters carry NULL time — the
                # SAME schema as read_netcdf4_distributed so mixed-container
                # archives union cleanly (r4 multi-file dispatch)
                stamps = None
                if arr.ndim >= 3 and time_name in nc.data:
                    units = (
                        nc.variables[time_name].attrs.get("units")
                        if time_name in nc.variables
                        else None
                    )
                    if units and " since " in str(units):
                        from .hdf5 import decode_time

                        stamps = decode_time(
                            np.asarray(nc.data[time_name]), str(units)
                        )
                for i in range(flat.shape[0]):
                    yield pd.DataFrame(
                        {
                            "src": p,
                            "time": pd.Timestamp(stamps[i])
                            if stamps is not None
                            else pd.NaT,
                            "lon": glon.ravel(),
                            "lat": glat.ravel(),
                            "value": flat[i],
                        }
                    )

    from .pool import distribute_paths

    plist = distribute_paths(spark, paths)
    return plist.mapInPandas(
        parse, "src string, time timestamp, lon double, lat double, value double"
    )
