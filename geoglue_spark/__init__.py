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
    operators/  assign, zonal, timeagg, resample, merge, reshape, validate,
                dedup, similarity, text
    streaming/  incremental checkpoint/resume, windowed streaming aggs
"""

__version__ = "0.1.0"
