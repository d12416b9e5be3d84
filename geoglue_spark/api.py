"""User-facing facade mirroring the reference's public entry points.

A geoglue user drives: ``region = gadm(iso3)`` (polygon source),
``zonalstats(rast, vec, ops, weights)`` (src/geoglue/zonalstats.py:71-100),
``resample(infile, target, resampling)`` (resample.py:81-161) and the
config-driven ``compute_config(cfg)`` (zonalstats.py:103-137). This module
provides the Spark-first equivalents with the same semantics:

* :func:`region_from_file` — polygon ingestion by extension (network
  staging out of scope; point it at a staged GeoJSON/NDJSON/shapefile).
* :func:`zonalstats` — exactextract-style operation STRINGS, including
  the ``coverage_weight=area_spherical_km2`` parameterization the CLI
  defaults to (reference cli.py:268-277).
* :func:`resample` — kernel dispatch by name (remapbil/remapdis/sremapbil
  aliases accepted).
* :func:`compute_config` — run a ZonalJobConfig end-to-end and stamp its
  logfmt lineage into the output (reproducible-by-string).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import ZonalJobConfig
from .cover import build_cover
from .grids import Grid, infer_grid
from .operators.zonal import ZONAL_OPS, raster_zonal_stats

_OP_RE = re.compile(r"^\s*(\w+)\s*(?:\(([^)]*)\))?\s*$")


def _split_top_level(s: str) -> list[str]:
    """Split on commas OUTSIDE parentheses — 'a(x=1, y=2), b' -> 2 pieces."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def parse_operations(ops: str) -> tuple[list[str], bool]:
    """Parse an exactextract-style operation string (comma-separated names,
    optional parenthesized params — commas INSIDE parens are parameter
    separators, e.g. 'quantile(q=0.9, coverage_weight=area_spherical_km2)')
    into (op names, use_spherical_area).

    ``coverage_weight=area_spherical_km2`` turns on spherical-area
    weighting (the reference CLI default, cli.py:274); ``none``/``fraction``
    turn it off; bare names (no coverage_weight param) inherit whatever the
    explicit ops chose. exactextract applies coverage_weight PER operation;
    the engine's aggregation builds every op from one shared weight column,
    so MIXED explicit settings in one string raise instead of silently
    letting the last op win (ADVICE r2 fix).
    """
    names: list[str] = []
    per_op_spherical: list[bool | None] = []
    for piece in _split_top_level(ops):
        m = _OP_RE.match(piece)
        if not m:
            raise ValueError(f"unparseable operation {piece!r}")
        name, params = m.group(1), m.group(2) or ""
        if name not in ZONAL_OPS:
            raise ValueError(f"unknown operation {name!r}; allowed: {ZONAL_OPS}")
        resolved = name
        op_spherical: bool | None = None
        for kv in filter(None, (p.strip() for p in params.split(","))):
            k, _, v = kv.partition("=")
            if name in ("quantile", "approx_quantile") and k.strip() == "q":
                # fixed-point, never scientific: repr(1e-05) is '1e-05',
                # which the internal-form regex cannot match (q is rounded
                # to 12 decimals, far below any percentile's significance)
                q_txt = f"{float(v):.12f}".rstrip("0").rstrip(".")
                resolved = f"{name}({q_txt or '0'})"  # internal form
            if k.strip() == "coverage_weight":
                if v.strip() == "area_spherical_km2":
                    op_spherical = True
                elif v.strip() in ("none", "fraction"):
                    op_spherical = False
                else:
                    raise ValueError(f"unknown coverage_weight {v!r}")
        if name in ("quantile", "approx_quantile") and resolved == name:
            raise ValueError(f"{name} requires a q= parameter, e.g. {name}(q=0.9)")
        names.append(resolved)
        per_op_spherical.append(op_spherical)
    explicit = {s for s in per_op_spherical if s is not None}
    if len(explicit) > 1:
        raise ValueError(
            f"mixed coverage_weight settings across operations in {ops!r}: "
            "all ops in one string must agree (run two zonalstats calls to mix)"
        )
    return names, bool(explicit.pop()) if explicit else False


def raster_from_files(
    spark: SparkSession,
    paths,
    var: str | None = None,
    value_col: str = "value",
    **reader_kwargs,
) -> DataFrame:
    """MANY raster files -> one long-form pixel table, parsed ON THE
    EXECUTORS (r3 verdict #1: the reference's unit of work is a
    DatasetPool of monthly/yearly files, cds.py:680-757 — a production run
    is thousands of them). ``paths`` may be a glob, a directory, or a
    list; dispatch is by extension, with ``.nc`` split by its 4-byte magic
    into HDF5-container vs classic netCDF-3 groups (unioned — mixed
    archives happen when CDS deliveries change container format). Every
    row carries a ``src`` lineage column;
    :func:`geoglue_spark.sources.pool.pool_partition_col` maps it to the
    reference's year / year-month partition names JVM-side.

    The driver only touches the file LIST (plus one 4-byte read per .nc);
    all byte decoding is mapInPandas on the executors."""
    from .sources.pool import expand_paths

    paths = expand_paths(paths)
    exts = set()
    for p in paths:
        e = os.path.splitext(p)[1].lower()
        exts.add(
            {".tiff": ".tif", ".grb": ".grib", ".grib1": ".grib",
             ".grib2": ".grib"}.get(e, e)
        )
    if len(exts) != 1:
        raise ValueError(
            f"mixed raster extensions {sorted(exts)} in one source; "
            "read each format separately and merge"
        )
    ext = exts.pop()
    if ext == ".parquet":
        df = spark.read.parquet(*paths)
        if value_col != "value" and "value" in df.columns:
            df = df.withColumnRenamed("value", value_col)
        return df
    if ext == ".nc":
        if var is None:
            raise ValueError("netCDF raster needs var= (e.g. 't2m')")
        hdf5, classic = [], []
        for p in paths:
            with open(p, "rb") as fh:
                (hdf5 if fh.read(4) == b"\x89HDF" else classic).append(p)
        frames = []
        if hdf5:
            from .sources.hdf5 import read_netcdf4_distributed

            frames.append(read_netcdf4_distributed(spark, hdf5, var, **reader_kwargs))
        if classic:
            from .sources.netcdf3 import read_netcdf3_distributed

            frames.append(read_netcdf3_distributed(spark, classic, var, **reader_kwargs))
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        return df if value_col == "value" else df.withColumnRenamed("value", value_col)
    if ext == ".tif":
        from .sources.geotiff import read_geotiff_distributed

        return read_geotiff_distributed(spark, paths, value_col=value_col)
    if ext == ".grib":
        # editions can mix within one archive (CDS switched delivery
        # format mid-stream) — sniff octet 8 per file, union the groups
        ed1, ed2 = [], []
        for p in paths:
            (ed1 if _grib_edition(p) == 1 else ed2).append(p)
        frames = []
        if ed1:
            from .sources.grib1 import PARAM_NAMES, read_grib1_distributed

            params = None
            if var is not None:
                ids = {pid for pid, nm in PARAM_NAMES.items() if nm == var}
                params = ids or None
            frames.append(read_grib1_distributed(spark, ed1, params))
        if ed2:
            from .sources.grib2 import read_grib2_distributed

            frames.append(
                read_grib2_distributed(spark, ed2, {var} if var is not None else None)
            )
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f)
        if var is not None:
            df = df.filter(df["var"] == var).drop("var")
        return df if value_col == "value" else df.withColumnRenamed("value", value_col)
    raise ValueError(f"unsupported raster source extension {ext!r}")


def _grib_edition(path: str) -> int:
    """GRIB edition from the indicator section's octet 8."""
    with open(path, "rb") as fh:
        head = fh.read(8)
    if head[:4] != b"GRIB" or len(head) < 8:
        raise ValueError(f"{path!r} is not a GRIB file")
    return head[7]


def raster_from_file(
    spark: SparkSession,
    path,
    var: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Raster source dispatch by extension (reference util.py:26-73
    read_raster: .nc -> xarray, .tif -> rioxarray): parquet scans stay the
    native store; classic netCDF-3 and GeoTIFF load through the engine's
    pure-NumPy codecs into the long-form pixel table. ``var`` selects the
    netCDF variable (required for .nc).

    ``path`` may also be a glob pattern, a directory, or a list of paths
    (r4): anything expanding to more than one file routes through
    :func:`raster_from_files` — executor-side parsing with a ``src``
    lineage column, the DatasetPool archive shape."""
    from .sources.pool import expand_paths

    expanded = expand_paths(path)
    if len(expanded) != 1:
        return raster_from_files(spark, expanded, var=var, value_col=value_col)
    path = expanded[0]
    low = path.lower()
    # value_col is honored on EVERY branch: the single-file and multi-file
    # paths must produce the same schema for the same source, or a glob
    # matching one vs two files silently changes downstream column names
    if low.endswith(".parquet"):
        df = spark.read.parquet(path)
        if value_col != "value" and "value" in df.columns:
            df = df.withColumnRenamed("value", value_col)
        return df
    if low.endswith(".nc"):
        if var is None:
            raise ValueError("netCDF raster needs var= (e.g. 't2m')")
        with open(path, "rb") as fh:
            magic = fh.read(4)
        if magic == b"\x89HDF":
            from .sources.hdf5 import netcdf4_to_pixels

            df = netcdf4_to_pixels(spark, path, var)
        else:
            from .sources.netcdf3 import netcdf3_to_pixels

            df = netcdf3_to_pixels(spark, path, var)
        return df if value_col == "value" else df.withColumnRenamed("value", value_col)
    if low.endswith((".tif", ".tiff")):
        from .sources.geotiff import geotiff_to_pixels

        return geotiff_to_pixels(spark, path, value_col=value_col)
    if low.endswith((".grib", ".grb", ".grib1", ".grib2")):
        if _grib_edition(path) == 2:
            from .sources.grib2 import grib2_to_pixels

            df = grib2_to_pixels(spark, path, {var} if var is not None else None)
            if var is not None:
                df = df.drop("var")
            return df if value_col == "value" else df.withColumnRenamed("value", value_col)
        from .sources.grib1 import PARAM_NAMES, grib1_to_pixels

        params = None
        if var is not None:
            ids = {pid for pid, nm in PARAM_NAMES.items() if nm == var}
            params = ids or None
        df = grib1_to_pixels(spark, path, params)
        if var is None:
            # multi-parameter file: KEEP the var column — crop's
            # per-variable split keys on it, and dropping it would silently
            # mix physically different variables into one value column
            return df if value_col == "value" else df.withColumnRenamed("value", value_col)
        df = df.filter(df["var"] == var).drop("var")
        return df if value_col == "value" else df.withColumnRenamed("value", value_col)
    raise ValueError(f"unsupported raster source {path!r}")


def region_from_file(
    spark: SparkSession, path: str, pk_field: str, name_field: str | None = None
) -> DataFrame:
    """Polygon source dispatch by extension — the staged-file analog of
    gadm()/geoboundaries() (reference region.py:225-342)."""
    from .sources import polygons as P

    low = path.lower()
    if low.endswith((".geojson", ".json")):
        return P.read_geojson(spark, path, pk_field, name_field)
    if low.endswith((".jsonl", ".ndjson", ".geojsonl")):
        return P.read_geojsonl(spark, path, pk_field, name_field)
    if low.endswith(".shp"):
        return P.read_shapefile(spark, path, pk_field, name_field)
    if low.endswith(".parquet"):
        return spark.read.parquet(path)
    raise ValueError(f"unsupported polygon source {path!r}")


def zonalstats(
    pixels: DataFrame,
    admins: DataFrame,
    operation: str = "mean(coverage_weight=area_spherical_km2)",
    weights: DataFrame | None = None,
    grid: Grid | None = None,
    by_dims: list[str] = ("time",),
    value_col: str = "value",
    supersample: int = 16,
) -> DataFrame:
    """One-call coverage-weighted zonal statistics: infer the grid from the
    pixel table (griddes inference), build the cell cover distributed, run
    the op string — the reference's zonalstats(rast, vec, ops, weights)."""
    if grid is None:
        grid = infer_grid(pixels)
    ops, spherical = parse_operations(operation)
    cover = build_cover(admins, grid, supersample=supersample)
    dims = [d for d in by_dims if d in pixels.columns]
    return raster_zonal_stats(
        pixels,
        cover,
        grid,
        value_col=value_col,
        ops=ops,
        by_dims=dims,
        weights=weights,
        use_spherical_area=spherical,
    )


_RESAMPLERS = {
    "bilinear": "resample_bilinear",
    "remapbil": "resample_bilinear",
    "distance": "resample_distance",
    "remapdis": "resample_distance",
    "sparse_bilinear": "resample_sparse_bilinear",
    "sremapbil": "resample_sparse_bilinear",
}


def resample(
    pixels: DataFrame,
    source: Grid,
    target: Grid,
    resampling: str = "bilinear",
    **kwargs,
) -> DataFrame:
    """Kernel dispatch by reference name (resample.py:150-160 match arms)."""
    from .operators import resample as R

    try:
        fn = getattr(R, _RESAMPLERS[resampling])
    except KeyError:
        raise ValueError(
            f"unknown resampling {resampling!r}; allowed: {sorted(_RESAMPLERS)}"
        ) from None
    return fn(pixels, source, target, **kwargs)


def compute_config(spark: SparkSession, cfg: ZonalJobConfig) -> str:
    """Run one config end-to-end (reference compute_config,
    zonalstats.py:103-137): read raster + admins, optionally read and
    pre-resample the weights per cfg.resample, compute, write the output
    parquet with the config's logfmt lineage stamped in a
    ``geoglue_config`` column. Returns the output path."""
    pixels = raster_from_file(spark, cfg.raster, var=cfg.var)
    admins = region_from_file(spark, cfg.admins, cfg.admins_pk)
    if cfg.admins_pk in admins.columns and "admin_id" not in admins.columns:
        admins = admins.withColumnRenamed(cfg.admins_pk, "admin_id")
    grid = infer_grid(pixels)
    weights = None
    if cfg.weights:
        weights = raster_from_file(spark, cfg.weights, value_col="weight")
        if cfg.resample != "off":
            wgrid = infer_grid(weights)
            if not wgrid.approx_equal(grid):
                # the reference resamples the RASTER onto the WEIGHTS grid
                # (zonalstats.py:126-130 regrids to
                # CdoGriddes.from_dataset(weights)) — population weights are
                # typically FINER than the raster, so the output keeps the
                # fine resolution (ADVICE r2 fix: the old direction silently
                # coarsened weighted outputs)
                dims = [d for d in ("time",) if d in pixels.columns]
                pixels = resample(
                    pixels, grid, wgrid, cfg.resample, value_col="value", dims=dims
                )
                grid = wgrid
    out = zonalstats(pixels, admins, cfg.operation, weights=weights, grid=grid)
    out.withColumn("geoglue_config", F.lit(cfg.lineage())).write.mode(
        "overwrite"
    ).parquet(cfg.output)
    return cfg.output
