"""Pure-NumPy HDF5 / netCDF-4 subset reader (S8: the reference's REAL
ERA5 fixtures are netCDF-4).

The reference's CDS pipeline stores ERA5 slices as netCDF-4 (HDF5
containers: reference src/geoglue/cds.py:389-414 opens them with xarray/
h5netcdf). This container ships no libhdf5, but the HDF5 file format is a
public specification; this module implements the subset the netCDF-4
writer stack actually produces, verified against every .nc fixture the
reference ships:

  * superblock v0/v2/v3; object headers v1 and v2 (+ continuations)
  * groups: compact link messages and v1 symbol tables (+ local heap)
  * dataspace v1/v2; datatypes: fixed-point, IEEE float, fixed string,
    vlen string (global-heap backed)
  * layouts: compact, contiguous, chunked v3 (B-tree v1 chunk index)
  * filters: shuffle + deflate (gzip), fletcher32 (checksum skipped)
  * attributes: inline messages (v1/v3) AND dense storage (fractal heap
    direct blocks scanned sequentially — netCDF attribute heaps are
    write-once, so objects are packed back to back)

Out of scope (clear errors): dense GROUP links via fractal heap B-trees,
multi-row indirect fractal-heap blocks, compound/enum datatypes, v4
chunk indexes. None appear in netCDF-4 files written by the CDS stack.

``netcdf4_to_pixels`` mirrors sources.netcdf3: CF unpacking
(scale/offset/_FillValue), long-form (time, lon, lat, value) output, plus
an executor-side many-files path.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


@dataclass
class H5Dataset:
    name: str
    shape: tuple
    dtype: np.dtype | str      # numpy dtype, or "vlen-str"
    attrs: dict
    _file: "H5File"
    _layout: tuple             # ("contiguous", addr, size) | ("chunked", btree, chunk_dims, elem) | ("compact", bytes)
    _filters: list             # [(filter_id, client_values), ...]
    _fillvalue: bytes | None

    def read(self) -> np.ndarray:
        return self._file._read_dataset(self)


@dataclass
class H5File:
    buf: bytes
    root_attrs: dict = field(default_factory=dict)
    datasets: dict = field(default_factory=dict)

    # ---- low-level ------------------------------------------------------
    def u(self, off: int, n: int) -> int:
        return int.from_bytes(self.buf[off : off + n], "little")

    # ---- object headers -------------------------------------------------
    def _messages(self, off: int) -> list[tuple[int, int, int]]:
        """All (type, payload offset, size) messages of an object header,
        following continuations; v1 and v2 headers."""
        buf = self.buf
        msgs: list[tuple[int, int, int]] = []
        if buf[off : off + 4] == b"OHDR":  # v2
            flags = buf[off + 5]
            p = off + 6
            if flags & 0x20:
                p += 16  # access/mod/change/birth times, 4 bytes each
            if flags & 0x10:
                p += 4
            c0 = 1 << (flags & 3)
            chunk0 = self.u(p, c0)
            p += c0
            blocks = [(p, p + chunk0 - 4)]
            track = bool(flags & 0x04)
            bi = 0
            while bi < len(blocks):
                q, end = blocks[bi]
                bi += 1
                while q + 4 <= end:
                    mtype = buf[q]
                    msize = self.u(q + 1, 2)
                    q += 4
                    if track:
                        q += 2
                    if mtype == 0x10:
                        addr, length = struct.unpack_from("<QQ", buf, q)
                        blocks.append((addr + 4, addr + length - 8))
                    msgs.append((mtype, q, msize))
                    q += msize
            return msgs
        if buf[off] == 1:  # v1 header: no signature
            nmsgs = self.u(off + 2, 2)
            hdr_size = self.u(off + 8, 4)
            blocks = [(off + 16, off + 16 + hdr_size)]
            bi = 0
            left = nmsgs
            while bi < len(blocks) and left > 0:
                q, end = blocks[bi]
                bi += 1
                while q + 8 <= end and left > 0:
                    mtype = self.u(q, 2)
                    msize = self.u(q + 2, 2)
                    q += 8
                    if mtype == 0x10:
                        addr, length = struct.unpack_from("<QQ", buf, q)
                        blocks.append((addr, addr + length))
                    msgs.append((mtype, q, msize))
                    q += msize
                    left -= 1
            return msgs
        raise ValueError(f"unrecognized object header at {off}")

    # ---- groups ----------------------------------------------------------
    def _links(self, off: int) -> list[tuple[str, int]]:
        buf = self.buf
        out: list[tuple[str, int]] = []
        for t, p, s in self._messages(off):
            if t == 0x06:  # link message
                flags = buf[p + 1]
                q = p + 2
                if flags & 0x8:
                    q += 1
                if flags & 0x4:
                    q += 8
                if flags & 0x10:
                    q += 1
                sz = 1 << (flags & 3)
                n = self.u(q, sz)
                q += sz
                name = buf[q : q + n].decode()
                q += n
                out.append((name, self.u(q, 8)))
            elif t == 0x11:  # symbol table (v1 group)
                btree, heap = struct.unpack_from("<QQ", buf, p)
                out += self._symbol_table_links(btree, heap)
            elif t == 0x02:  # link info — dense links unsupported if used
                fheap = self.u(p + 2 + (8 if buf[p + 1] & 1 else 0), 8)
                if fheap != UNDEF:
                    raise NotImplementedError("dense group-link storage")
        return out

    def _symbol_table_links(self, btree: int, heap: int) -> list[tuple[str, int]]:
        buf = self.buf
        # local heap data segment
        assert buf[heap : heap + 4] == b"HEAP"
        data_seg = self.u(heap + 24, 8)
        out = []

        def walk(node: int):
            assert buf[node : node + 4] == b"TREE", "bad group B-tree node"
            level = buf[node + 5]
            n = self.u(node + 6, 2)
            p = node + 8 + 8 + 8  # skip left/right siblings
            if level > 0:
                p += 8  # key 0
                for _ in range(n):
                    child = self.u(p, 8)
                    walk(child)
                    p += 16  # child + key
                return
            # leaf: children are SNOD blocks
            q = node + 24 + 8
            for _ in range(n):
                snod = self.u(q, 8)
                assert buf[snod : snod + 4] == b"SNOD"
                cnt = self.u(snod + 6, 2)
                e = snod + 8
                for _ in range(cnt):
                    name_off = self.u(e, 8)
                    hdr = self.u(e + 8, 8)
                    name = buf[data_seg + name_off :].split(b"\x00")[0].decode()
                    out.append((name, hdr))
                    e += 40
                q += 16

        walk(btree)
        return out

    # ---- datatypes / dataspace -------------------------------------------
    def _datatype(self, p: int):
        buf = self.buf
        cls = buf[p] & 0xF
        size = self.u(p + 4, 4)
        bits0 = buf[p + 1]
        if cls == 0:  # fixed-point
            signed = bool(bits0 & 0x08)
            return np.dtype(f"<{'i' if signed else 'u'}{size}")
        if cls == 1:  # float
            return np.dtype(f"<f{size}")
        if cls == 3:  # fixed string
            return np.dtype(f"S{size}")
        if cls == 9 and (bits0 & 0x0F) == 1:  # vlen string
            return "vlen-str"
        if cls == 7:  # reference
            return np.dtype(f"V{size}")
        raise NotImplementedError(f"HDF5 datatype class {cls}")

    def _dataspace(self, p: int) -> tuple:
        buf = self.buf
        ver = buf[p]
        rank = buf[p + 1]
        if ver == 1:
            return tuple(self.u(p + 8 + i * 8, 8) for i in range(rank))
        return tuple(self.u(p + 4 + i * 8, 8) for i in range(rank))

    # ---- attributes --------------------------------------------------------
    def _attr_from_msg(self, p: int) -> tuple[str, object]:
        buf = self.buf
        ver = buf[p]
        if ver == 1:
            name_sz = self.u(p + 2, 2)
            dt_sz = self.u(p + 4, 2)
            ds_sz = self.u(p + 6, 2)
            q = p + 8
            pad = lambda n: (n + 7) & ~7
            name = buf[q : q + name_sz].split(b"\x00")[0].decode()
            q += pad(name_sz)
            dt_off = q
            q += pad(dt_sz)
            ds_off = q
            q += pad(ds_sz)
        elif ver == 3:
            name_sz = self.u(p + 2, 2)
            dt_sz = self.u(p + 4, 2)
            ds_sz = self.u(p + 6, 2)
            q = p + 9
            name = buf[q : q + name_sz].split(b"\x00")[0].decode()
            q += name_sz
            dt_off = q
            q += dt_sz
            ds_off = q
            q += ds_sz
        else:
            raise NotImplementedError(f"attribute message v{ver}")
        dtype = self._datatype(dt_off)
        shape = self._dataspace(ds_off)
        n = int(np.prod(shape)) if shape else 1
        if dtype == "vlen-str":
            vals = [self._vlen_str(q + i * 16) for i in range(n)]
            val = vals[0] if not shape else vals
        elif isinstance(dtype, np.dtype) and dtype.kind == "S":
            raw = buf[q : q + dtype.itemsize * n]
            val = raw.split(b"\x00")[0].decode(errors="replace")
        elif isinstance(dtype, np.dtype) and dtype.kind == "V":
            val = None  # object references (DIMENSION_LIST) — not needed
        else:
            arr = np.frombuffer(buf, dtype, count=n, offset=q)
            val = arr[0].item() if not shape else arr.copy()
        return name, val

    def _vlen_str(self, p: int) -> str:
        length = self.u(p, 4)
        gcol = self.u(p + 4, 8)
        idx = self.u(p + 12, 4)
        buf = self.buf
        assert buf[gcol : gcol + 4] == b"GCOL"
        q = gcol + 16
        while True:
            obj_idx = self.u(q, 2)
            obj_sz = self.u(q + 8, 8)
            if obj_idx == idx:
                return buf[q + 16 : q + 16 + length].decode(errors="replace")
            if obj_idx == 0:
                raise ValueError("global-heap object not found")
            q += 16 + ((obj_sz + 7) & ~7)

    def _dense_attrs(self, fheap: int) -> dict:
        """Scan a fractal heap's direct block(s) for packed attribute
        messages (netCDF attribute heaps are write-once: objects are
        back-to-back, terminated by free space / padding)."""
        buf = self.buf
        assert buf[fheap : fheap + 4] == b"FRHP", "bad fractal heap"
        heap_off_sz = self.u(fheap + 5, 2)  # heap-id length... layout below
        # FRHP layout (v0): sig(4) ver(1) heap_id_len(2) io_filter_len(2)
        # flags(1) max_managed_size(4) next_huge_id(8) huge_btree(8)
        # free_space(8) fs_mgr(8) managed_space(8) alloc_space(8)
        # iterator_off(8) nmanaged(8) huge_size(8) nhuge(8) tiny_size(8)
        # ntiny(8) table_width(2) start_block_size(8) max_direct_size(8)
        # max_heap_size(2) start_nrows(2) root_addr(8) cur_nrows(2) [csum]
        p = fheap + 4 + 1 + 2 + 2 + 1 + 4 + 8 * 12
        table_width = self.u(p, 2)
        start_block = self.u(p + 2, 8)
        max_direct = self.u(p + 10, 8)
        max_heap_bits = self.u(p + 18, 2)
        root_addr = self.u(p + 22, 8)
        cur_nrows = self.u(p + 30, 2)
        attrs: dict = {}
        if root_addr == UNDEF:
            return attrs
        blk_off_bytes = (max_heap_bits + 7) // 8

        def scan_direct(addr: int, size: int):
            assert buf[addr : addr + 4] == b"FHDB", "expected direct block"
            q = addr + 4 + 1 + 8 + blk_off_bytes
            # netCDF files enable checksums on heap blocks (flags bit 1)
            q += 4  # checksum field (present when heap flags & 2; it is for netCDF)
            end = addr + size
            while q + 9 < end:
                ver = buf[q]
                if ver != 3 or buf[q + 1] & 0xFC:
                    q += 1
                    continue
                try:
                    name, val = self._attr_from_msg(q)
                except Exception:
                    q += 1
                    continue
                if name:
                    attrs[name] = val
                # advance past this message: recompute its span
                name_sz = self.u(q + 2, 2)
                dt_sz = self.u(q + 4, 2)
                ds_sz = self.u(q + 6, 2)
                hdr = 9 + name_sz + dt_sz + ds_sz
                # data size from datatype x dataspace
                dt = self._datatype(q + 9 + name_sz)
                shape = self._dataspace(q + 9 + name_sz + dt_sz)
                n = int(np.prod(shape)) if shape else 1
                elem = 16 if dt == "vlen-str" else (
                    dt.itemsize if isinstance(dt, np.dtype) else 8
                )
                q += hdr + n * elem
            return attrs

        if cur_nrows == 0:
            scan_direct(root_addr, start_block)
            return attrs
        # root is an indirect block: scan its direct-block pointers
        ind = root_addr
        assert buf[ind : ind + 4] == b"FHIX" or buf[ind : ind + 4] == b"FHIB"
        q = ind + 4 + 1 + 8 + blk_off_bytes
        sizes = []
        size = start_block
        for row in range(cur_nrows):
            sizes += [size] * table_width
            if row >= 1:
                size *= 2
        for sz in sizes:
            addr = self.u(q, 8)
            q += 8
            if addr != UNDEF:
                scan_direct(addr, sz)
        return attrs

    def _attrs(self, off: int) -> dict:
        attrs: dict = {}
        for t, p, s in self._messages(off):
            if t == 0x0C:
                try:
                    name, val = self._attr_from_msg(p)
                    attrs[name] = val
                except NotImplementedError:
                    pass
            elif t == 0x15:  # attribute info -> dense storage
                flags = self.buf[p + 1]
                q = p + 2
                if flags & 1:
                    q += 2
                fheap = self.u(q, 8)
                if fheap != UNDEF:
                    attrs.update(self._dense_attrs(fheap))
        return attrs

    # ---- datasets -----------------------------------------------------------
    def _dataset(self, name: str, off: int) -> H5Dataset:
        buf = self.buf
        shape: tuple = ()
        dtype = None
        layout = None
        filters: list = []
        fill = None
        for t, p, s in self._messages(off):
            if t == 0x01:
                shape = self._dataspace(p)
            elif t == 0x03:
                dtype = self._datatype(p)
            elif t == 0x05:  # fill value
                ver = buf[p]
                if ver >= 2:
                    if ver == 2:
                        defined = buf[p + 3]
                        if defined:
                            n = self.u(p + 4, 4)
                            fill = buf[p + 8 : p + 8 + n]
                    else:  # v3
                        flags = buf[p + 1]
                        if flags & 0x20:
                            n = self.u(p + 2, 4)
                            fill = buf[p + 6 : p + 6 + n]
            elif t == 0x08:
                ver = buf[p]
                if ver != 3:
                    raise NotImplementedError(f"layout v{ver}")
                lclass = buf[p + 1]
                if lclass == 0:  # compact
                    n = self.u(p + 2, 2)
                    layout = ("compact", buf[p + 4 : p + 4 + n])
                elif lclass == 1:  # contiguous
                    addr, size = struct.unpack_from("<QQ", buf, p + 2)
                    layout = ("contiguous", addr, size)
                else:  # chunked
                    ndims = buf[p + 2]
                    btree = self.u(p + 3, 8)
                    cdims = [self.u(p + 11 + i * 4, 4) for i in range(ndims)]
                    layout = ("chunked", btree, tuple(cdims[:-1]), cdims[-1])
            elif t == 0x0B:
                ver = buf[p]
                nf = buf[p + 1]
                q = p + (2 if ver == 2 else 8)
                for _ in range(nf):
                    fid = self.u(q, 2)
                    if ver == 1 or fid >= 256:
                        name_len = self.u(q + 2, 2)
                        ncv = self.u(q + 6, 2)
                        q += 8 + ((name_len + 7) & ~7)
                    else:
                        # v2, id < 256: id(2) flags(2) n_client_values(2)
                        ncv = self.u(q + 4, 2)
                        q += 6
                    cvals = [self.u(q + i * 4, 4) for i in range(ncv)]
                    q += 4 * ncv
                    if ver == 1 and ncv % 2 == 1:
                        q += 4
                    filters.append((fid, cvals))
        return H5Dataset(
            name=name, shape=shape, dtype=dtype, attrs=self._attrs(off),
            _file=self, _layout=layout, _filters=filters, _fillvalue=fill,
        )

    def _read_dataset(self, ds: H5Dataset) -> np.ndarray:
        if ds.dtype == "vlen-str":
            raise NotImplementedError("vlen-string dataset reads")
        buf = self.buf
        kind, *rest = ds._layout
        n = int(np.prod(ds.shape)) if ds.shape else 1
        if kind == "compact":
            return np.frombuffer(rest[0], ds.dtype, count=n).reshape(ds.shape)
        if kind == "contiguous":
            addr, size = rest
            if addr == UNDEF:  # never written -> fill value
                out = np.empty(ds.shape, ds.dtype)
                out[:] = np.frombuffer(ds._fillvalue or b"\x00" * ds.dtype.itemsize, ds.dtype)[0]
                return out
            return np.frombuffer(buf, ds.dtype, count=n, offset=addr).reshape(ds.shape).copy()
        btree, cdims, elem = rest
        out = np.empty(ds.shape, ds.dtype)
        if ds._fillvalue:
            out[:] = np.frombuffer(ds._fillvalue[: ds.dtype.itemsize], ds.dtype)[0]

        def undo_filters(raw: bytes) -> bytes:
            for fid, cvals in reversed(ds._filters):
                if fid == 1:
                    raw = zlib.decompress(raw)
                elif fid == 2:  # shuffle
                    esz = cvals[0] if cvals else ds.dtype.itemsize
                    arr = np.frombuffer(raw, np.uint8).reshape(esz, -1)
                    raw = arr.T.tobytes()
                elif fid == 3:  # fletcher32: strip trailing checksum
                    raw = raw[:-4]
                else:
                    raise NotImplementedError(f"HDF5 filter {fid}")
            return raw

        rank = len(cdims)

        def walk(node: int):
            assert buf[node : node + 4] == b"TREE", "bad chunk B-tree"
            level = buf[node + 5]
            cnt = self.u(node + 6, 2)
            # keys: size(4) mask(4) offsets(8 * (rank+1)); children: addr(8)
            key_sz = 8 + 8 * (rank + 1)
            p = node + 24
            for i in range(cnt):
                key_off = p + i * (key_sz + 8)
                child = self.u(key_off + key_sz, 8)
                if level > 0:
                    walk(child)
                    continue
                nbytes = self.u(key_off, 4)
                offs = [self.u(key_off + 8 + j * 8, 8) for j in range(rank)]
                raw = undo_filters(bytes(buf[child : child + nbytes]))
                chunk = np.frombuffer(raw, ds.dtype).reshape(cdims)
                sl = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(offs, cdims, ds.shape)
                )
                trim = tuple(slice(0, sl[d].stop - sl[d].start) for d in range(rank))
                out[sl] = chunk[trim]

        walk(btree)
        return out


def read_hdf5(path: str) -> H5File:
    """Open a netCDF-4/HDF5 file read-only into arrays + attrs."""
    with open(path, "rb") as fh:
        buf = fh.read()
    sig = b"\x89HDF\r\n\x1a\n"
    off = 0
    while buf[off : off + 8] != sig:
        off = (off or 256) * 2  # userblock doubling per spec
        if off > len(buf):
            raise ValueError(f"{path}: not an HDF5 file")
    f = H5File(buf=buf)
    ver = buf[off + 8]
    if ver == 0:
        # root group symbol-table entry: after 24-byte prefix, entry's
        # object header address at +8
        root = f.u(off + 24 + 8, 8)
    elif ver in (2, 3):
        root = f.u(off + 36, 8)
    else:
        raise NotImplementedError(f"HDF5 superblock v{ver}")
    f.root_attrs = f._attrs(root)
    for name, addr in f._links(root):
        try:
            f.datasets[name] = f._dataset(name, addr)
        except NotImplementedError:
            continue  # e.g. vlen datasets (expver) — not needed
    return f


def _scalar(v) -> float:
    """Attribute values may arrive as size-1 arrays — normalize to float."""
    a = np.asarray(v, np.float64).ravel()
    return float(a[0]) if a.size else float("nan")


def _cf_unpack(ds: H5Dataset, arr: np.ndarray) -> np.ndarray:
    out = np.asarray(arr, np.float64)
    fv = ds.attrs.get("_FillValue")
    if fv is None and ds._fillvalue is not None and isinstance(ds.dtype, np.dtype):
        fv = np.frombuffer(ds._fillvalue[: ds.dtype.itemsize], ds.dtype)[0].item()
    if fv is not None:
        fvf = _scalar(fv)
        if not np.isnan(fvf):
            out = np.where(np.asarray(arr) == fvf, np.nan, out)
    if "scale_factor" in ds.attrs or "add_offset" in ds.attrs:
        out = out * _scalar(ds.attrs.get("scale_factor", 1.0)) + _scalar(
            ds.attrs.get("add_offset", 0.0)
        )
    return out


def decode_time(vals: np.ndarray, units: str) -> np.ndarray:
    """CF time decode for the common epoch forms ('<unit> since <stamp>').

    Coordinates stay FLOAT until the final whole-second rounding: CF
    allows fractional values ('0.5 days' = noon — common for daily means)
    and an int64 cast would silently truncate them up to 23h59m. Singular
    unit names ('day since ...') are CF-legal too."""
    unit, _, rest = units.partition(" since ")
    base = np.datetime64(rest.strip().replace(" ", "T").rstrip("Z"), "s")
    key = unit.strip().lower()
    if not key.endswith("s"):
        key += "s"
    steps = {"seconds": 1, "hours": 3600, "days": 86400, "minutes": 60}
    if key not in steps:
        raise ValueError(f"unsupported CF time unit {unit.strip()!r} in {units!r}")
    secs = np.rint(np.asarray(vals, np.float64) * steps[key]).astype(np.int64)
    return base + secs.astype("timedelta64[s]")


def netcdf4_to_pixels(
    spark,
    path: str,
    var: str,
    lon_name: str = "longitude",
    lat_name: str = "latitude",
    time_name: str = "valid_time",
):
    """netCDF-4 file -> long-form pixel DataFrame (time, lon, lat, value)
    — the ERA5 layout the reference consumes (time, lat, lon), CF-unpacked."""
    import pandas as pd

    f = read_hdf5(path)
    v = f.datasets[var]
    arr = _cf_unpack(v, v.read())
    lon = np.asarray(f.datasets[lon_name].read(), np.float64)
    lat = np.asarray(f.datasets[lat_name].read(), np.float64)
    glon, glat = np.meshgrid(lon, lat)
    if arr.ndim == 2 and time_name not in f.datasets:
        # time-less 2-D raster (e.g. an NDVI composite): no time column
        pdf = pd.DataFrame(
            {"lon": glon.ravel(), "lat": glat.ravel(), "value": arr.ravel()}
        )
        return spark.createDataFrame(pdf)
    if arr.ndim == 2:
        arr = arr[None, ...]
    t = f.datasets[time_name]
    times = decode_time(t.read(), t.attrs.get("units", "seconds since 1970-01-01"))
    frames = []
    for i in range(arr.shape[0]):
        frames.append(
            pd.DataFrame(
                {
                    "time": pd.Timestamp(times[i]),
                    "lon": glon.ravel(),
                    "lat": glat.ravel(),
                    "value": arr[i].ravel(),
                }
            )
        )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def read_netcdf4_distributed(
    spark,
    paths: list[str],
    var: str,
    lon_name: str = "longitude",
    lat_name: str = "latitude",
    time_name: str = "valid_time",
):
    """Many netCDF-4 files parsed ON THE EXECUTORS via mapInPandas — the
    same 100-TB fan-out shape as the netCDF-3/GeoTIFF/GRIB1 sources (an
    ERA5 archive is one file per month/year/variable)."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                f = read_hdf5(p)
                v = f.datasets[var]
                arr = _cf_unpack(v, v.read())
                if arr.ndim == 2:
                    arr = arr[None, ...]
                lon = np.asarray(f.datasets[lon_name].read(), np.float64)
                lat = np.asarray(f.datasets[lat_name].read(), np.float64)
                if arr.shape[-2:] != (lat.size, lon.size):
                    raise ValueError(
                        f"{var}: expected trailing (lat, lon) = "
                        f"({lat.size}, {lon.size}), got {arr.shape} — a "
                        "transposed variable would silently scramble pixels"
                    )
                glon, glat = np.meshgrid(lon, lat)
                # time-less 2-D rasters carry NULL time — the SAME schema
                # as read_netcdf3_distributed so mixed-container archives
                # union cleanly. The fallback applies ONLY to single-slice
                # variables: a multi-slice array with no (findable) time
                # coordinate would emit N overlapping rasters all stamped
                # NaT — indistinguishable duplicates — so that case stays
                # a loud error (e.g. the coordinate is named 'time', not
                # the default 'valid_time': pass time_name=).
                times = None
                if time_name in f.datasets:
                    t = f.datasets[time_name]
                    times = decode_time(
                        t.read(), t.attrs.get("units", "seconds since 1970-01-01")
                    )
                elif arr.shape[0] > 1:
                    raise KeyError(
                        f"{time_name!r} not in {sorted(f.datasets)} but "
                        f"{var!r} has {arr.shape[0]} slices — pass the "
                        "file's actual time coordinate via time_name="
                    )
                for i in range(arr.shape[0]):
                    yield pd.DataFrame(
                        {
                            "src": p,
                            "time": pd.Timestamp(times[i])
                            if times is not None
                            else pd.NaT,
                            "lon": glon.ravel(),
                            "lat": glat.ravel(),
                            "value": arr[i].ravel(),
                        }
                    )

    from .pool import distribute_paths

    plist = distribute_paths(spark, paths)
    return plist.mapInPandas(
        parse, "src string, time timestamp, lon double, lat double, value double"
    )
