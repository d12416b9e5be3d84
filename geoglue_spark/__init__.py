"""geoglue_spark — a PySpark-native spatial-join + zonal-aggregation engine.

Brand-new engine with the query/data-processing capabilities of
kraemer-lab/geoglue (reference studied read-only at /root/reference),
re-expressed Spark-first: DataFrame/Catalyst logical plans, broadcast
cell-cover joins, Arrow-vectorized NumPy kernels, explicit partitioning.

Layout:
    grids       regular lon/lat grid math (griddes analog, types.py:183-277)
    geometry    WKB polygons, bbox algebra (types.py:22-180)
    pip         vectorized ray-casting point-in-polygon + coverage fractions
    cover       polygon -> cell cover (interior/boundary), broadcast structure
    synth       deterministic synthetic fixtures (admins, geocoded images)
    images      PNG/raw codecs, phash, PSNR (stdlib zlib + numpy only)
    api         user-facing facade (region_from_file, raster_from_file,
                zonalstats, resample, compute_config) — start here when
                migrating from geoglue
    cli         geoglue-style CLI (python -m geoglue_spark: crop, merge,
                zonalstats, stats, griddes; manifest pipe composition)
    config      job/global configuration + logfmt lineage round-trip
    registry    variable registry (metrics.toml analog)
    functions   scalar helpers (tz lookup, logfmt, zero-padded ranges)
    sources/    polygon ingestion (GeoJSON / NDJSON / shapefile) + pure-
                NumPy raster codecs (classic netCDF-3, netCDF-4/HDF5,
                GeoTIFF/BigTIFF, GRIB1), each with an executor-side
                many-files path
    operators/  assign, zonal, timeagg, resample, merge, reshape, validate,
                dedup, similarity, text, multimodal, knn
    streaming/  incremental checkpoint/resume, replace-partition commits,
                windowed + stateful streaming aggs
"""

__version__ = "0.2.0"

__all__ = ["api", "config", "registry", "functions"]
