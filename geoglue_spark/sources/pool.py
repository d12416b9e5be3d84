"""Multi-file raster archives as ONE distributed scan — the DatasetPool.

The reference's unit of work is a folder of per-year / per-month ERA5
files named ``{ISO3}-{year}[-{month}][_part]-{stub}.{instant|accum}.nc``
(reference src/geoglue/cds.py:680-757 DatasetPool: filename regexes at
cds.py:698-704, single-folder / single-iso3 / single-stub validation at
cds.py:714-737, the trailing ``_part`` month always reprocessed at
cds.py:591-610). This module is the Spark-first restatement:

* :func:`expand_paths` — glob / directory / list -> concrete file list
  (the api/CLI entry: ``geoglue-spark zonalstats 'era5/*.nc' ...``).
* :class:`DatasetPool` — parses the reference's filename convention into
  (partition, open?) metadata and hands each partition's files to the
  executor-side distributed readers; plugs straight into
  ``run_incremental`` (partitions / open_partitions / process).
* :func:`pool_partition_col` — the same filename -> partition mapping as
  a pure JVM Column over the readers' ``src`` lineage column, for
  partition-stamping a whole-archive scan without a driver loop.

Scale shape: the DRIVER only ever touches the file list (names + one
4-byte magic probe per .nc to split HDF5-container files from classic
netCDF-3 — the same dispatch the single-file path does); all byte
parsing runs on the executors via mapInPandas over the path list, one
task per file batch.
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import functions as F

# reference cds.py:698-704 — yearly and monthly(_part) chunk names
POOL_RE = re.compile(
    r"^(?P<iso3>[A-Z]{3})-(?P<year>\d{4})(?:-(?P<month>0\d|1[0-2]))?"
    r"(?P<part>_part)?-(?P<stub>[A-Za-z0-9_.-]+?)\.(?P<vartype>instant|accum)\.nc$"
)

RASTER_EXTS = (
    ".nc", ".tif", ".tiff", ".grib", ".grb", ".grib1", ".grib2", ".parquet"
)


def distribute_paths(spark, paths: list[str]):
    """Path list -> one-column DataFrame repartitioned for executor-side
    file parsing: one task per file while files are scarce, capped at the
    cluster's parallelism. The SINGLE fan-out policy for every
    distributed byte reader (hdf5/netcdf3/grib1/grib2/geotiff) — change
    the heuristic here, not in five copies."""
    return spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    )


def expand_paths(source) -> list[str]:
    """Concrete sorted file list from a path, glob pattern, directory, or
    list of any of those. A directory keeps only known raster extensions
    (a ``.parquet`` directory is itself a dataset and passes through
    whole). Raises on a glob matching nothing."""
    if isinstance(source, (list, tuple)):
        out: list[str] = []
        for s in source:
            out.extend(expand_paths(s))
        return sorted(dict.fromkeys(out))
    if glob.has_magic(source):
        hits = sorted(p for p in glob.glob(source) if not os.path.isdir(p)
                      or p.rstrip("/").endswith(".parquet"))
        if not hits:
            raise FileNotFoundError(f"glob {source!r} matched no files")
        return hits
    if os.path.isdir(source) and not source.rstrip("/").endswith(".parquet"):
        hits = sorted(
            os.path.join(source, f)
            for f in os.listdir(source)
            if f.lower().endswith(RASTER_EXTS)
        )
        if not hits:
            raise FileNotFoundError(
                f"directory {source!r} holds no raster files ({RASTER_EXTS})"
            )
        return hits
    return [source]


def pool_partition_col(src=None):
    """Partition name ('YYYY' or 'YYYY-MM') from a DatasetPool filename as
    a JVM Column over the distributed readers' ``src`` path column —
    unmatched filenames map to NULL. Zero driver work at any file count."""
    src = F.col("src") if src is None else src
    fname = F.element_at(F.split(src, "/"), -1)
    ym = F.regexp_extract(
        fname, r"^[A-Z]{3}-(\d{4}(?:-(?:0\d|1[0-2]))?)(?:_part)?-", 1
    )
    return F.when(ym == "", F.lit(None).cast("string")).otherwise(ym)


@dataclass
class DatasetPool:
    """Parsed archive: filename convention -> resumable partitions.

    ``partitions()`` yields every distinct chunk name in order (years then
    year-months, as strings); ``open_partitions()`` is the subset marked
    ``_part`` — the reference always redownloads/overwrites those
    (cds.py:591-610), which is exactly run_incremental's open set.
    """

    paths: list[str]
    stub: str = "era5"
    iso3: str = field(init=False)
    folder: str = field(init=False)
    # partition name -> {vartype: path}
    chunks: dict[str, dict[str, str]] = field(init=False)
    _open: set[str] = field(init=False)

    def __post_init__(self):
        self.paths = expand_paths(self.paths)
        parents = {os.path.dirname(os.path.abspath(p)) for p in self.paths}
        if len(parents) != 1:
            # reference cds.py:714-718 — one folder per pool
            raise ValueError(
                f"All files in DatasetPool must be in same folder, found: "
                f"{sorted(parents)}"
            )
        self.folder = parents.pop()
        iso3s, stubs = set(), set()
        self.chunks, self._open = {}, set()
        for p in self.paths:
            m = POOL_RE.match(os.path.basename(p))
            if not m or m.group("stub") != self.stub:
                continue  # foreign files in the folder are ignored, like the glob
            iso3s.add(m.group("iso3"))
            stubs.add(m.group("stub"))
            part = m.group("year") + (
                f"-{m.group('month')}" if m.group("month") else ""
            )
            self.chunks.setdefault(part, {})[m.group("vartype")] = p
            if m.group("part"):
                self._open.add(part)
        if not self.chunks:
            raise ValueError(
                f"no files matching the DatasetPool convention "
                f"'ISO3-year[-month][_part]-{self.stub}.(instant|accum).nc' "
                f"under {self.folder}"
            )
        if len(iso3s) > 1:
            # reference cds.py:733-737
            raise ValueError(
                f"Multiple iso3={sorted(iso3s)} not allowed in DatasetPool, "
                "specify a stricter path glob"
            )
        self.iso3 = iso3s.pop()

    def partitions(self) -> list[str]:
        return sorted(self.chunks)

    def open_partitions(self) -> set[str]:
        return set(self._open)

    def files(self, partition: str | None = None, vartype: str | None = None) -> list[str]:
        parts = [partition] if partition is not None else self.partitions()
        out = []
        for p in parts:
            for vt, path in sorted(self.chunks[p].items()):
                if vartype is None or vt == vartype:
                    out.append(path)
        return out

    def to_pixels(self, spark, var: str, partition: str | None = None,
                  vartype: str | None = None):
        """Distributed long-form pixel scan of (a partition of) the pool,
        partition-stamped via :func:`pool_partition_col`."""
        from ..api import raster_from_files

        df = raster_from_files(spark, self.files(partition, vartype), var=var)
        return df.withColumn("part", pool_partition_col())
