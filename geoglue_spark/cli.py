"""geoglue-style command line over the Spark engine.

Mirrors the reference CLI's surface and pipeline style (reference
src/geoglue/cli.py:89-305): subcommands compose via stdout/stdin
manifests —

    python -m geoglue_spark crop raster.parquet 100,10,104,14 -o c.parquet \\
      | python -m geoglue_spark merge -o merged.parquet

Subcommands (reference analog in parens):

* ``crop RASTER BOUNDS`` (cli.py:109-188) — bbox / named-region /
  ``path::pk`` bounds, optional ``--cover`` enlargement, per-variable
  split printing one ``crop <path>`` manifest line per output.
* ``merge`` (cli.py:81-94) — concatenates the datasets named on stdin
  (or ``--file``), combining config lineage first-seen-ordered (O4).
* ``zonalstats RASTER REGION`` (cli.py:190-305) — operation defaulting +
  weighted_ prefixing + config alias resolution, runs
  :func:`geoglue_spark.api.compute_config`, prints the reference's
  logfmt progress lines.
* ``stats FILES...`` (cli.py:96-105) — summary statistics per file.
* ``griddes FILE`` (cli.py:307-312) — CDO grid description of a parquet
  raster.

Storage is parquet where the reference reads/writes netCDF — the engine's
table analog (SURVEY §2.1); everything else (bounds resolution order,
manifest composition, operation strings, output naming) follows the
reference.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .config import GlobalConfig, RegionSource, ZonalJobConfig
from .geometry import Bbox, wkb_to_rings
from .grids import infer_grid


def _spark() -> SparkSession:
    from .session import get_spark

    return get_spark("geoglue-spark-cli")


def _read_config(path: str | None) -> GlobalConfig:
    if path is None:
        return GlobalConfig()
    with open(path, encoding="utf-8") as fh:
        return GlobalConfig.from_toml(fh.read())


def _region_bbox(spark: SparkSession, src: RegionSource) -> Bbox:
    """Integer-hull bbox of a polygon source (reference bbox_from_region
    with integer_bounds=True, util.py:129-146). Polygon tables are
    dimension-scale; collecting geometries is metadata-sized."""
    rows = src.load(spark).select("geometry").collect()
    minx = miny = float("inf")
    maxx = maxy = float("-inf")
    for r in rows:
        for poly in wkb_to_rings(bytes(r.geometry)):
            for ring in poly:
                minx = min(minx, float(ring[:, 0].min()))
                maxx = max(maxx, float(ring[:, 0].max()))
                miny = min(miny, float(ring[:, 1].min()))
                maxy = max(maxy, float(ring[:, 1].max()))
    return Bbox(minx, miny, maxx, maxy).int()


def _resolve_bounds(spark: SparkSession, bounds: str, cfg: GlobalConfig) -> Bbox:
    """Reference resolution order (cli.py:148-157): config region name,
    else ``path::pk`` polygon source, else a bbox literal."""
    if bounds in cfg.region:
        return _region_bbox(spark, cfg.region[bounds])
    if "::" in bounds:
        return _region_bbox(spark, RegionSource.from_str(bounds))
    return Bbox.from_string(bounds).int()


def _data_bbox(df) -> Bbox:
    """Cell-edge bbox of a long-form raster (one metadata-scale agg)."""
    g = infer_grid(df)
    return Bbox(g.x0, g.y0, g.x0 + g.nx * g.dx, g.y0 + g.ny * g.dy)


def _is_multi_source(path: str) -> bool:
    """True when a raster argument expands to more than one file (glob,
    directory, or DatasetPool archive) — those route through the
    executor-side multi-file readers and need an explicit output path."""
    import glob as _g

    from .sources.pool import expand_paths

    if not (_g.has_magic(path) or os.path.isdir(path)):
        return False
    try:
        return len(expand_paths(path)) > 1
    except FileNotFoundError:
        return False


def _source_exists(path: str) -> bool:
    """os.path.exists generalized to glob / directory / list sources."""
    from .sources.pool import expand_paths

    try:
        return all(os.path.exists(p) for p in expand_paths(path))
    except FileNotFoundError:
        return False


def _safe_name(b: Bbox) -> str:
    return "_".join(
        str(int(v)) if float(v).is_integer() else str(v).replace(".", "p")
        for v in b
    )


# --------------------------------------------------------------------------
# crop
# --------------------------------------------------------------------------
def cmd_crop(args: argparse.Namespace) -> int:
    from .operators.merge import crop as crop_op

    from .api import raster_from_file

    spark = _spark()
    cfg = _read_config(args.config)
    pixels = raster_from_file(spark, args.raster, var=args.var)
    src_bbox = _data_bbox(pixels)
    bbox = _resolve_bounds(spark, args.bounds, cfg)
    if args.cover:
        cover_bbox = _data_bbox(raster_from_file(spark, args.cover, var=args.var))
        while not bbox.contains(cover_bbox):
            grown = bbox.enlarge(by=1)
            if grown == bbox:  # clamped at the sphere and still short:
                print(f"ERROR: cannot enlarge {bbox} to cover {cover_bbox}")
                return 1
            bbox = grown
        # one more cell ring so edge cells exist on all sides (cli.py:165-167)
        bbox = bbox.enlarge(by=1)
    if not src_bbox.contains(bbox):
        print(f"ERROR: Source bbox {src_bbox} not larger than target bbox {bbox}")
        return 1
    if _is_multi_source(args.raster) and not args.output:
        print("ERROR: multi-file RASTER (glob/directory) needs -o/--output")
        return 1
    out_base = args.output or (
        os.path.splitext(args.raster)[0] + f".{_safe_name(bbox)}.parquet"
    )
    cropped = crop_op(pixels, bbox)
    variables = (
        [r["var"] for r in cropped.select("var").distinct().orderBy("var").collect()]
        if "var" in cropped.columns
        else []
    )
    if len(variables) > 1 and args.split:
        # per-variable outputs, one manifest line each (cli.py:183-186)
        root = out_base[: -len(".parquet")] if out_base.endswith(".parquet") else out_base
        for v in variables:
            path = f"{root}.{v}.parquet"
            cropped.filter(F.col("var") == v).write.mode("overwrite").parquet(path)
            print(f"crop {path}")
    else:
        cropped.write.mode("overwrite").parquet(out_base)
        print(out_base)
    return 0


# --------------------------------------------------------------------------
# merge
# --------------------------------------------------------------------------
def cmd_merge(args: argparse.Namespace) -> int:
    from .operators.merge import (
        LINEAGE_KEY,
        concat_time,
        concat_with_lineage,
        variable_merge,
    )

    spark = _spark()
    lines = (
        open(args.file, encoding="utf-8").read().splitlines()
        if args.file
        else sys.stdin.read().splitlines()
    )
    paths = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        # manifest lines may carry the emitting command as a first token
        # ("crop <path>", cli.py:183-186 / merge.py:12-22)
        paths.append(line.split()[-1])
    if not paths:
        print("ERROR: no input datasets on stdin/--file")
        return 1
    frames = [spark.read.parquet(p) for p in paths]
    # group by column set: same-schema inputs concatenate along the dim,
    # different variable groups merge horizontally (reference
    # merge_datasets, merge.py:24-75)
    groups: dict[tuple[str, ...], list] = {}
    for f in frames:
        groups.setdefault(tuple(sorted(f.columns)), []).append(f)
    merged = []
    for fs in groups.values():
        if any(LINEAGE_KEY in f.columns for f in fs):
            merged.append(concat_with_lineage(fs))
        else:
            merged.append(concat_time(fs))
    if len(merged) == 1:
        out = merged[0]
    else:
        dims = set(merged[0].columns)
        for m in merged[1:]:
            dims &= set(m.columns)
        dims.discard(LINEAGE_KEY)
        value_cols = [
            c for m in merged for c in m.columns if c not in dims and c != LINEAGE_KEY
        ]
        dupes = sorted({c for c in value_cols if value_cols.count(c) > 1})
        if dupes:
            print(
                f"ERROR: variable name(s) {dupes} appear in more than one "
                "input schema group; rename the columns before merging"
            )
            return 1
        out = variable_merge([m.drop(LINEAGE_KEY) for m in merged], sorted(dims), value_cols)
    out.write.mode("overwrite").parquet(args.output)
    print(args.output)
    return 0


# --------------------------------------------------------------------------
# zonalstats
# --------------------------------------------------------------------------
def cmd_zonalstats(args: argparse.Namespace) -> int:
    from .api import compute_config

    spark = _spark()
    gcfg = _read_config(args.config)
    if "::" in args.region:
        shp = RegionSource.from_str(args.region)
    elif args.region in gcfg.region:
        shp = gcfg.region[args.region]
    else:
        print(
            f"ERROR: region={args.region!r} not found in configuration and no "
            "specific path::pk param passed"
        )
        return 1
    # operation defaulting + weighted_ prefixing (cli.py:268-277)
    if args.weights:
        op = args.operation or "weighted_mean(coverage_weight=area_spherical_km2)"
        if "weighted" not in op:
            print("WARN: Passed weights but operation is not weighted, prefixing!")
            op = "weighted_" + op
    else:
        op = args.operation or "mean(coverage_weight=area_spherical_km2)"
    op = gcfg.resolve_operation(op)
    print(f"config\t\toperation {op}")
    multi = _is_multi_source(args.raster)
    if multi and not args.output:
        print("ERROR: multi-file RASTER (glob/directory) needs -o/--output")
        return 1
    output = args.output or os.path.splitext(args.raster)[0] + ".zs.parquet"
    cfg = ZonalJobConfig(
        raster=args.raster,
        admins=shp.file,
        admins_pk=shp.pk,
        output=output,
        operation=op,
        weights=args.weights,
        resample=args.resample,
        var=args.var,
    )
    for p in (cfg.raster, cfg.admins, cfg.weights):
        if p and not _source_exists(p):
            print(f"ERROR: missing input {p}")
            return 1
    t0 = time.time()
    begin = datetime.datetime.now(datetime.timezone.utc)
    print(f"zonalstats\tbegin={begin.isoformat()}")
    out_path = compute_config(spark, cfg)
    out = spark.read.parquet(out_path)
    stat_cols = [
        c for c, t in out.dtypes
        if c not in ("admin_id", "geoglue_config") and t in ("double", "float")
    ]
    nna = 0
    if stat_cols:
        # backtick-escape: op columns like "quantile(0.9)" contain a dot
        # that an unescaped column reference parses as nested-field access
        row = out.agg(
            *[
                F.sum(F.when(F.col(f"`{c}`").isNull(), 1).otherwise(0)).alias(c)
                for c in stat_cols
            ]
        ).collect()[0]
        nna = sum(int(v or 0) for v in row)
    print(f"zonalstats\tNA={nna} {cfg}")
    end = datetime.datetime.now(datetime.timezone.utc)
    print(f"zonalstats\tend={end.isoformat()} elapsed={time.time() - t0:.1f}s")
    return 0


# --------------------------------------------------------------------------
# stats / griddes
# --------------------------------------------------------------------------
def cmd_stats(args: argparse.Namespace) -> int:
    from .operators.validate import summary_stats

    spark = _spark()
    from .api import raster_from_file

    for path in args.files:
        df = raster_from_file(spark, path, var=args.var) if not path.endswith(".parquet") else spark.read.parquet(path)
        value_cols = [
            c for c, t in df.dtypes if t in ("double", "float") and c not in ("lon", "lat")
        ]
        n = df.count()
        print(f"{path}\trows={n}")
        if value_cols:
            row = summary_stats(df, value_cols).collect()[0].asDict()
            for c in value_cols:
                print(
                    f"{path}\t{c}\tnna={row[f'{c}_nna']} mean={row[f'{c}_mean']} "
                    f"min={row[f'{c}_min']} max={row[f'{c}_max']}"
                )
    return 0


def cmd_griddes(args: argparse.Namespace) -> int:
    from .api import raster_from_file

    spark = _spark()
    df = raster_from_file(spark, args.file, var=args.var)
    if "var" in df.columns:  # multi-parameter GRIB: any variable, same grid
        df = df.filter(df["var"] == df.select("var").first()[0])
    grid = infer_grid(df)
    print(grid.to_griddes_text())
    return 0


# --------------------------------------------------------------------------
# plot
# --------------------------------------------------------------------------
def _gray_scale(vals):
    """float array -> uint8 grayscale, NaN -> 0 (black), data 32..255."""
    import numpy as np

    out = np.zeros(vals.shape, np.uint8)
    m = np.isfinite(vals)
    if m.any():
        lo, hi = float(vals[m].min()), float(vals[m].max())
        span = (hi - lo) or 1.0
        out[m] = (32 + (vals[m] - lo) / span * 223).astype(np.uint8)
    return out


def _draw_rings(img, rings, x0, dx, y0, dy, level=255):
    """Burn polygon ring OUTLINES into the grayscale image (row 0 = north):
    each segment sampled at sub-pixel steps — pure NumPy, no plot libs."""
    import numpy as np

    h, w = img.shape
    for poly in rings:
        for ring in poly:
            a = np.asarray(ring, np.float64)
            for i in range(len(a) - 1):
                n = max(
                    2,
                    int(
                        max(
                            abs(a[i + 1][0] - a[i][0]) / abs(dx),
                            abs(a[i + 1][1] - a[i][1]) / abs(dy),
                        )
                        * 4
                    )
                    + 2,
                )
                xs = np.linspace(a[i][0], a[i + 1][0], n)
                ys = np.linspace(a[i][1], a[i + 1][1], n)
                # x0/y0 are cell edges: floor buckets a coordinate into its cell
                ix = np.floor((xs - x0) / dx).astype(int)
                iy = np.floor((ys - y0) / dy).astype(int)
                keep = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                img[h - 1 - iy[keep], ix[keep]] = level
    return img


def cmd_plot(args: argparse.Namespace) -> int:
    """Render FILE to a grayscale PNG with the engine's OWN encoder
    (reference cli.py:48-78 + plot.py, matplotlib/geopandas replaced by
    the PNG codec in images.py):

    * a zonalstats output (``admin_id`` + ``geoglue_config`` columns) ->
      CHOROPLETH: the geometry comes from the config lineage stamped in
      the file (plot.py:46-62) or ``-g``, polygons filled by ray-cast
      point-in-polygon on a render grid;
    * any raster source -> gridded slice, ``-v`` selecting the variable
      (required when several, like the reference) and ``-i`` the index
      along the non-spatial dim; ``-g`` overlays boundary outlines.

    Output is always ``-o`` (no terminal display in this engine). The
    collect is render-sized: one raster slice / one row per admin."""
    import numpy as np

    from .images import encode_png

    spark = _spark()
    df = (
        spark.read.parquet(args.file)
        if args.file.endswith(".parquet")
        else None
    )
    if df is not None and "admin_id" in df.columns and "geoglue_config" in df.columns:
        from .config import read_job_configs
        from .geometry import wkb_to_rings
        from .pip import points_in_geom

        rows = df.collect()  # admin-dimension scale
        stat_cols = [
            c for c, t in df.dtypes
            if t in ("double", "float") and c not in ("admin_id",)
        ]
        stat = args.var or (stat_cols[0] if len(stat_cols) == 1 else None)
        if stat is None:
            print(f"ERROR: use -v to select a column from {stat_cols}")
            return 1
        geom_src = args.geometry
        if geom_src in (None, "."):
            cfgs = read_job_configs(rows[0]["geoglue_config"])
            geom_src, pk = cfgs[0].admins, cfgs[0].admins_pk
        else:
            geom_src, _, pk = geom_src.partition("::")
        from .api import region_from_file

        admins = region_from_file(spark, geom_src, pk or "admin_id")
        if pk and pk in admins.columns and "admin_id" not in admins.columns:
            admins = admins.withColumnRenamed(pk, "admin_id")
        geoms = {r.admin_id: wkb_to_rings(bytes(r.geometry)) for r in admins.collect()}
        vals = {r["admin_id"]: r[stat] for r in rows}
        minx = min(p[:, 0].min() for g in geoms.values() for poly in g for p in poly)
        maxx = max(p[:, 0].max() for g in geoms.values() for poly in g for p in poly)
        miny = min(p[:, 1].min() for g in geoms.values() for poly in g for p in poly)
        maxy = max(p[:, 1].max() for g in geoms.values() for poly in g for p in poly)
        w = args.width
        h = max(1, int(round(w * (maxy - miny) / max(maxx - minx, 1e-9))))
        dx, dy = (maxx - minx) / w, (maxy - miny) / h
        gx, gy = np.meshgrid(
            minx + (np.arange(w) + 0.5) * dx, miny + (np.arange(h) + 0.5) * dy
        )
        val_img = np.full((h, w), np.nan)
        for aid, rings in geoms.items():
            if aid not in vals or vals[aid] is None:
                continue
            inside = points_in_geom(gx.ravel(), gy.ravel(), rings).reshape(h, w)
            val_img[inside] = float(vals[aid])
        img = _gray_scale(val_img)[::-1]  # row 0 = north
        png = encode_png(img)
        kind = "choropleth"
    else:
        from .api import raster_from_file

        pixels = raster_from_file(spark, args.file, var=args.var)
        if "var" in pixels.columns:
            vs = [r["var"] for r in pixels.select("var").distinct().collect()]
            if len(vs) > 1 and args.var is None:
                print(f"ERROR: Use -v (--var) to select a variable from {sorted(vs)}")
                return 1
            pixels = pixels.filter(F.col("var") == (args.var or vs[0])).drop("var")
        non_spatial = [
            c for c in pixels.columns
            if c not in ("lon", "lat", "value", "src", "vartype")
        ]
        if non_spatial:
            # one -i index per non-spatial dim: filtering only the first
            # but dropping ALL of them would overlay the remaining dims'
            # slices into one image, each pixel taking whichever row
            # arrived last
            idxs = [int(x) for x in str(args.isel).split(",")]
            if len(idxs) != len(non_spatial):
                # too FEW with >1 dim is ambiguous; too MANY means the
                # user believes a dim exists that doesn't — both must
                # error rather than silently truncate the zip
                if len(non_spatial) > 1 or len(idxs) > len(non_spatial):
                    print(
                        f"ERROR: raster has non-spatial dims {non_spatial}; "
                        f"pass exactly one -i index per dim (got {idxs})"
                    )
                    return 1
            for dim, idx in zip(non_spatial, idxs):
                ticks = [
                    r[dim]
                    for r in pixels.select(dim).distinct().orderBy(dim).collect()
                ]
                if not 0 <= idx < len(ticks):
                    print(
                        f"ERROR: -i {idx} out of range (0..{len(ticks) - 1} {dim})"
                    )
                    return 1
                print(f"Selecting {{{dim!s}: {idx}}}")
                pixels = pixels.filter(F.col(dim) == ticks[idx])
            pixels = pixels.drop(*non_spatial)
        grid = infer_grid(pixels)
        img_vals = np.full((grid.ny, grid.nx), np.nan)
        for r in pixels.select("lon", "lat", "value").collect():  # one slice
            # grid.x0/y0 are cell EDGES (infer_grid), lon/lat are centers
            ix = int((r.lon - grid.x0) / grid.dx)
            iy = int((r.lat - grid.y0) / grid.dy)
            if 0 <= ix < grid.nx and 0 <= iy < grid.ny:
                img_vals[grid.ny - 1 - iy, ix] = (
                    r.value if r.value is not None else np.nan
                )
        img = _gray_scale(img_vals)
        if args.geometry and args.geometry != ".":
            from .geometry import wkb_to_rings

            gpath, _, gpk = args.geometry.partition("::")
            from .api import region_from_file

            admins = region_from_file(spark, gpath, gpk or "admin_id")
            for r in admins.select("geometry").collect():
                _draw_rings(
                    img, wkb_to_rings(bytes(r.geometry)),
                    grid.x0, grid.dx, grid.y0, grid.dy,
                )
        png = encode_png(img)
        kind = "raster"
    with open(args.output, "wb") as fh:
        fh.write(png)
    print(f"plot {args.output} kind={kind} size={img.shape[1]}x{img.shape[0]}")
    return 0


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------
def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="geoglue-spark",
        description="geoglue-spark — Spark-native geospatial data processing",
    )
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("crop", help="Crop raster data to region")
    c.add_argument("raster")
    c.add_argument("bounds", help="bbox 'minx,miny,maxx,maxy', config region name, or path::pk")
    c.add_argument("--split", action=argparse.BooleanOptionalAction, default=True,
                   help="split output by variable")
    c.add_argument("--var", help="netCDF/GRIB variable when RASTER is .nc/.grib")
    c.add_argument("--cover", help="raster the cropped output must cover")
    c.add_argument("-o", "--output")
    c.add_argument("-c", "--config")
    c.set_defaults(fn=cmd_crop)

    m = sub.add_parser("merge", help="Merge datasets named on standard input")
    m.add_argument("-o", "--output", required=True)
    m.add_argument("--file", help="manifest file instead of stdin")
    m.set_defaults(fn=cmd_merge)

    z = sub.add_parser("zonalstats", help="Compute zonal statistics")
    z.add_argument("raster")
    z.add_argument("region", help="config region name or <polygons>::<pk>")
    z.add_argument("--operation")
    z.add_argument("--var", help="netCDF/GRIB variable when RASTER is .nc/.grib")
    z.add_argument("--weights")
    z.add_argument("--resample", default="off",
                   choices=["remapdis", "remapbil", "sremapbil", "bilinear",
                            "distance", "sparse_bilinear", "off"])
    z.add_argument("-o", "--output")
    z.add_argument("-c", "--config")
    z.set_defaults(fn=cmd_zonalstats)

    s = sub.add_parser("stats", help="Show statistics for result files")
    s.add_argument("files", nargs="+")
    s.add_argument("--var", help="netCDF/GRIB variable when a file is .nc/.grib")
    s.set_defaults(fn=cmd_stats)

    pl = sub.add_parser("plot", help="Plot datasets (grayscale PNG)")
    pl.add_argument("file")
    pl.add_argument("-i", "--isel", default="0",
                    help="Non-spatial index to select")
    pl.add_argument("-v", "--var", help="Variable / stat column to select")
    pl.add_argument("-o", "--output", required=True,
                    help="PNG filename to save plot")
    pl.add_argument("-g", "--geometry", default=".",
                    help="Geometry file (path or path::pk) to overlay")
    pl.add_argument("--width", type=int, default=400,
                    help="Choropleth render width in pixels")
    pl.set_defaults(fn=cmd_plot)

    g = sub.add_parser("griddes", help="Show CDO grid description for a file")
    g.add_argument("file")
    g.add_argument("--var", help="netCDF/GRIB variable when FILE is .nc/.grib")
    g.set_defaults(fn=cmd_griddes)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
