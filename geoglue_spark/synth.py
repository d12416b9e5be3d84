"""Deterministic synthetic fixtures (seed-free arithmetic, no external data).

Mirrors FIXTURES.md: a geocoded image+caption fact table (input_hint schema
verbatim + lat/lon/ts), an admin-polygon dimension (rect grid + concave /
hole / multipolygon shapes, reference tests/test_zonalstats.py:17-26), and
a long-form hourly raster (ERA5 analog, reference tests/conftest.py:38-51).

Point coordinates derive from ``event_id`` by pure integer arithmetic that
is expressible identically in Spark SQL and DuckDB SQL — the driver's
oracle comparison runs the very same derivation on both engines. 80 % of
points land in a half-degree "urban" hotspot (mega-cell skew per the north
rule); the rest are uniform over the 10x10-degree country.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geometry import Bbox, rings_to_wkb
from .images import encode_image, phash64, synth_pixels

# ---- country layout -------------------------------------------------------
DOMAIN = Bbox(100.0, 10.0, 110.0, 20.0)  # lon/lat extent of the synthetic country
ADMIN_NX = 10  # 10 x 10 one-degree admin-2 rectangles
ADMIN_NY = 10
HOT_LON0, HOT_LAT0, HOT_SPAN = 104.25, 12.25, 0.5  # the dense urban hotspot

# Dialect-neutral derivation (Spark SQL == DuckDB SQL, bit-identical doubles):
# u ~ LCG residue in [0,1); 4/5 of rows in the hotspot box, 1/5 uniform.
POINTS_FROM_EVENTS_SQL = """
SELECT
  event_id,
  ts,
  event_type,
  value,
  CASE WHEN event_id % 5 < 4
       THEN 12.25 + (CAST((event_id * 48271 + 7) % 99991 AS DOUBLE) / 99991.0) * 0.5
       ELSE 10.0  + (CAST((event_id * 48271 + 7) % 99991 AS DOUBLE) / 99991.0) * 10.0
  END AS lat,
  CASE WHEN event_id % 5 < 4
       THEN 104.25 + (CAST((event_id * 16807 + 11) % 99991 AS DOUBLE) / 99991.0) * 0.5
       ELSE 100.0  + (CAST((event_id * 16807 + 11) % 99991 AS DOUBLE) / 99991.0) * 10.0
  END AS lon
FROM events
"""

# The floor-arithmetic oracle for rectangular admins (DuckDB side only; the
# Spark side goes through the full cover + broadcast-join + ray-cast path).
ADMIN_ID_SQL = "printf('ADM2-%02d', CAST(floor(lat - 10.0) AS INT) * 10 + CAST(floor(lon - 100.0) AS INT))"


def admin_rect_geoms() -> list[tuple[str, str, str, bytes]]:
    """(admin_id, admin1_id, name, wkb) for the 10x10 one-degree grid.
    admin1 groups rows of 10 (rollup tests)."""
    out = []
    for r in range(ADMIN_NY):
        for c in range(ADMIN_NX):
            x0, y0 = DOMAIN.minx + c, DOMAIN.miny + r
            ring = np.array(
                [[x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1], [x0, y0 + 1], [x0, y0]]
            )
            i = r * ADMIN_NX + c
            out.append(
                (f"ADM2-{i:02d}", f"ADM1-{r:01d}", f"District {i}", rings_to_wkb([[ring]]))
            )
    return out


def admin_wiggly_geoms(vertices: int = 256, amplitude: float = 0.02) -> list[tuple[str, str, str, bytes]]:
    """Realistic-complexity admins: each 1-degree cell becomes a ~``vertices``-
    vertex polygon whose border wiggles sinusoidally around the rectangle
    (real GADM-2 shapes carry hundreds-thousands of vertices — the 4-vertex
    rectangles are the toy case). Deterministic per admin index."""
    out = []
    per_side = vertices // 4
    t = np.arange(per_side) / per_side  # [0,1) along each side
    for r in range(ADMIN_NY):
        for c in range(ADMIN_NX):
            i = r * ADMIN_NX + c
            x0, y0 = DOMAIN.minx + c, DOMAIN.miny + r
            phase = i * 0.7
            wig = lambda tt, k: amplitude * np.sin(2 * np.pi * (k * tt) + phase)
            bottom = np.stack([x0 + t, y0 + wig(t, 6)], axis=1)
            right = np.stack([x0 + 1 + wig(t, 6), y0 + t], axis=1)
            top = np.stack([x0 + 1 - t, y0 + 1 + wig(t, 6)], axis=1)
            left = np.stack([x0 + wig(t, 6), y0 + 1 - t], axis=1)
            ring = np.vstack([bottom, right, top, left, bottom[:1]])
            out.append(
                (f"ADM2-{i:02d}", f"ADM1-{r:01d}", f"District {i}", rings_to_wkb([[ring]]))
            )
    return out


def admin_fancy_geoms() -> list[tuple[str, str, str, bytes]]:
    """Concave L-shape, donut (hole), multipolygon, and an 'excluded
    archipelago' outside the raster extent — the shapes the reference's
    fixtures exercise (FIXTURES.md §2, tests/test_zonalstats.py:22-26)."""
    l_shape = np.array(
        [[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0], [1.0, 3.0], [0.0, 3.0], [0.0, 0.0]]
    )
    donut_outer = np.array([[5.0, 0.0], [9.0, 0.0], [9.0, 4.0], [5.0, 4.0], [5.0, 0.0]])
    donut_hole = np.array([[6.0, 1.0], [8.0, 1.0], [8.0, 3.0], [6.0, 3.0], [6.0, 1.0]])
    multi_a = np.array([[0.0, 5.0], [2.0, 5.0], [2.0, 7.0], [0.0, 7.0], [0.0, 5.0]])
    multi_b = np.array([[4.0, 5.0], [6.0, 5.0], [6.0, 7.0], [4.0, 7.0], [4.0, 5.0]])
    archi = np.array([[50.0, 50.0], [51.0, 50.0], [51.0, 51.0], [50.0, 51.0], [50.0, 50.0]])
    return [
        ("FANCY-L", "ADM1-F", "LShape", rings_to_wkb([[l_shape]])),
        ("FANCY-DONUT", "ADM1-F", "Donut", rings_to_wkb([[donut_outer, donut_hole]])),
        ("FANCY-MULTI", "ADM1-F", "TwoIslands", rings_to_wkb([[multi_a], [multi_b]])),
        ("FANCY-ARCHI", "ADM1-F", "Archipelago", rings_to_wkb([[archi]])),
    ]


def admins_df(
    spark: SparkSession, fancy: bool = False, wiggly: bool = False
) -> DataFrame:
    rows = (
        admin_fancy_geoms()
        if fancy
        else (admin_wiggly_geoms() if wiggly else admin_rect_geoms())
    )
    df = spark.createDataFrame(
        rows, "admin_id string, admin1_id string, name string, geometry binary"
    )
    # pk uniqueness discipline, enforced eagerly like config.py:84-92
    return df


# ---- geocoded image+caption fact table (input_hint schema) -----------------
IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, lat double, lon double, ts timestamp"
)
_T0 = dt.datetime(2019, 1, 1)
_N_HOURS = 2 * 8760 + 16 * 24  # two full years + a trailing partial month
_FMTS = ["png", "raw", "qnt"]
_DIMS = [8, 16, 32]
DUP_EVERY = 97  # every 97th image repeats the previous content (dedup tests)


def _image_content_ids(ids: np.ndarray) -> np.ndarray:
    """Content id per row id: every DUP_EVERY-th image repeats the
    previous content (the injected duplicates dedup tests depend on)."""
    return np.where(ids % DUP_EVERY == 0, np.maximum(ids - 1, 0), ids)


# Fixture content-version tag, shared by images_parquet AND
# image_truth_parquet so the two cached files invalidate TOGETHER (ADVICE
# r3: a count-only cache key let a spec change desynchronize the truth
# table from the images fixture). Bump whenever _image_spec / synth_pixels
# / the caption format / IMAGES_SCHEMA change.
IMG_FIXTURE_V = "v2"


def _image_spec(ci: int) -> tuple[int, int, str, bool]:
    """(w, h, fmt, color) for a content id — the SINGLE definition shared
    by the distributed generator, the driver-local fixture, and the
    ground-truth table: a change here changes all three together."""
    return (
        _DIMS[int(ci) % 3],
        _DIMS[int(ci + 1) % 3],
        _FMTS[int(ci) % 3],
        ci % 2 == 0,
    )


def _point_lat(i: np.ndarray) -> np.ndarray:
    u = ((i * 48271 + 7) % 99991) / 99991.0
    return np.where(i % 5 < 4, 12.25 + u * 0.5, 10.0 + u * 10.0)


def _point_lon(i: np.ndarray) -> np.ndarray:
    u = ((i * 16807 + 11) % 99991) / 99991.0
    return np.where(i % 5 < 4, 104.25 + u * 0.5, 100.0 + u * 10.0)


def images_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic synthesis of the input_hint fact table.

    `spark.range` partitions the id space; each Arrow batch renders its own
    payloads — generation scales linearly with executors, no driver bottleneck.
    """
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            content = _image_content_ids(ids)
            recs = []
            for i, ci in zip(ids, content):
                w, h, fmt, color = _image_spec(int(ci))
                pix = synth_pixels(int(ci), w, h, color=color)
                recs.append(
                    (
                        f"img{i:012d}",
                        encode_image(pix, fmt),
                        w,
                        h,
                        fmt,
                        f"caption for image {ci:012d} over tile ({ci % 64},{ci // 64 % 64})",
                        phash64(pix),
                    )
                )
            out = pd.DataFrame(
                recs, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )
            out["lat"] = _point_lat(ids)
            out["lon"] = _point_lon(ids)
            out["ts"] = pd.Timestamp(_T0) + pd.to_timedelta(ids % _N_HOURS, unit="h")
            yield out

    return spark.range(0, n, 1, partitions).mapInPandas(gen, IMAGES_SCHEMA)


def images_pandas(n: int) -> pd.DataFrame:
    """Driver-local generation of the SAME images table (identical bytes to
    images_table) — used to materialize the fixture parquet once so
    benchmarks measure scan+assign, not synthesis, and so the DuckDB oracle
    can read the very same rows."""
    ids = np.arange(n, dtype=np.int64)
    content = _image_content_ids(ids)
    recs = []
    for i, ci in zip(ids, content):
        w, h, fmt, color = _image_spec(int(ci))
        pix = synth_pixels(int(ci), w, h, color=color)
        recs.append(
            (
                f"img{i:012d}",
                encode_image(pix, fmt),
                w,
                h,
                fmt,
                f"caption for image {ci:012d} over tile ({ci % 64},{ci // 64 % 64})",
                phash64(pix),
            )
        )
    out = pd.DataFrame(
        recs, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )
    out["lat"] = _point_lat(ids)
    out["lon"] = _point_lon(ids)
    # microsecond unit: Spark's parquet reader rejects TIMESTAMP(NANOS)
    out["ts"] = (
        pd.Timestamp(_T0) + pd.to_timedelta(ids % _N_HOURS, unit="h")
    ).astype("datetime64[us]")
    return out


def image_truth_parquet(n: int, root: str = "/root/repo/.cache") -> str:
    """Ground-truth per-image pixel stats (image_id, mean_px, n_px),
    materialized ONCE — computed straight from the synthesized pixels,
    WITHOUT the encode->store->decode round trip. The DuckDB oracle joins
    this against the fact table so a driver-checked query can pin the
    engine's decode path: for lossless formats the decoded gray mean must
    reproduce these float64 values bit-for-bit."""
    import os

    from .images import _to_gray

    path = os.path.join(root, f"image_truth_{n}_{IMG_FIXTURE_V}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        ids = np.arange(n, dtype=np.int64)
        content = _image_content_ids(ids)
        recs = []
        for i, ci in zip(ids, content):
            w, h, _fmt, color = _image_spec(int(ci))
            pix = synth_pixels(int(ci), w, h, color=color)
            gray = _to_gray(pix.astype(np.float64))
            recs.append((f"img{i:012d}", float(gray.mean()), int(w * h)))
        tmp = f"{path}.tmp-{os.getpid()}"
        pd.DataFrame(recs, columns=["image_id", "mean_px", "n_px"]).to_parquet(
            tmp, index=False
        )
        os.replace(tmp, path)
    return path


def images_parquet(n: int, root: str = "/root/repo/.cache") -> str:
    """Materialize the deterministic images fixture to parquet ONCE (atomic
    rename; concurrent callers race benignly) and return the file path.
    Both the Spark queries and the DuckDB oracle scan this same file."""
    import os

    path = os.path.join(root, f"images_{n}_{IMG_FIXTURE_V}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        images_pandas(n).to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path


# Audio/video fixture version tag — shared by the payload parquet AND its
# truth companion so the cached files invalidate together (same rule as
# IMG_FIXTURE_V). Bump whenever _audio_clip / _video_frames / the encode
# parameters change.
AV_FIXTURE_V = "v1"


def _audio_clip(i: int) -> tuple[np.ndarray, int]:
    """Deterministic int16 mono PCM for clip i: a pure tone of varying
    frequency/amplitude plus LCG noise, varying length. Returns (pcm, sr)."""
    sr = 16000
    n = 2000 + (i * 37) % 6000
    freq = 100.0 + (i % 40) * 25.0
    amp = 6000.0 + (i % 5) * 2000.0
    t = np.arange(n, dtype=np.float64) / sr
    noise = (((np.arange(n, dtype=np.int64) * 48271 + i * 16807 + 11) % 99991)
             / 99991.0 - 0.5) * 800.0
    return np.clip(amp * np.sin(2 * np.pi * freq * t) + noise,
                   -32768, 32767).astype(np.int16), sr


def audio_parquet(n: int, root: str = "/root/repo/.cache") -> str:
    """Materialize the deterministic audio fixture ONCE: (audio_id, bytes,
    fmt) with fmt cycling wav/wav/rawpcm — REAL RIFF/WAVE containers for
    two thirds of the rows (av.py), headerless 16-bit PCM for the rest."""
    import os

    from .av import encode_wav

    path = os.path.join(root, f"audio_{n}_{AV_FIXTURE_V}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        recs = []
        for i in range(n):
            pcm, sr = _audio_clip(i)
            fmt = "rawpcm" if i % 3 == 2 else "wav"
            buf = pcm.astype("<i2").tobytes() if fmt == "rawpcm" else encode_wav(pcm, sr)
            recs.append((f"aud{i:09d}", buf, fmt))
        tmp = f"{path}.tmp-{os.getpid()}"
        pd.DataFrame(recs, columns=["audio_id", "bytes", "fmt"]).to_parquet(
            tmp, index=False
        )
        os.replace(tmp, path)
    return path


def audio_truth_parquet(n: int, root: str = "/root/repo/.cache") -> str:
    """Ground-truth per-clip features computed straight from the raw PCM,
    WITHOUT the encode->store->decode round trip — PCM WAV is lossless, so
    the engine's decoded rms/zcr/duration must reproduce these float64
    values bit-for-bit (the audio analogue of image_truth_parquet)."""
    import os

    path = os.path.join(root, f"audio_truth_{n}_{AV_FIXTURE_V}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        recs = []
        for i in range(n):
            pcm, sr = _audio_clip(i)
            x = pcm.astype(np.float64)
            rms = float(np.sqrt(np.mean(x**2)))
            zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            fmt = "rawpcm" if i % 3 == 2 else "wav"
            recs.append((f"aud{i:09d}", fmt, len(pcm), len(pcm) / sr, rms, zcr))
        tmp = f"{path}.tmp-{os.getpid()}"
        pd.DataFrame(
            recs,
            columns=["audio_id", "fmt", "n_samples", "duration_sec", "rms", "zcr"],
        ).to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path


def _video_frames(i: int) -> np.ndarray:
    """Deterministic (n_frames, h, w) uint8 gray frames for video i: a
    drifting gradient (every frame distinct, every video distinct)."""
    nf = 4 + i % 9
    w = 48 + 16 * (i % 3)
    h = 32 + 16 * (i % 2)
    f = np.arange(nf)[:, None, None]
    y = np.arange(h)[None, :, None]
    x = np.arange(w)[None, None, :]
    return ((x * 3 + y * 5 + f * 17 + i * 29) % 256).astype(np.uint8)


def videos_parquet(n: int, root: str = "/root/repo/.cache") -> str:
    """Materialize the deterministic video fixture ONCE: (video_id, bytes,
    fmt) with fmt cycling mjpeg/mjpeg/rawvid — REAL raw motion-JPEG
    streams (back-to-back baseline JFIF frames, av.py + jpeg.py) for two
    thirds of the rows, the length-prefixed rawvid container for the rest."""
    import os

    from .av import encode_mjpeg
    from .operators.multimodal import encode_rawvid

    path = os.path.join(root, f"videos_{n}_{AV_FIXTURE_V}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        recs = []
        for i in range(n):
            frames = _video_frames(i)
            fmt = "rawvid" if i % 3 == 2 else "mjpeg"
            buf = (
                encode_rawvid(frames)
                if fmt == "rawvid"
                else encode_mjpeg(frames, quality=95)
            )
            recs.append((f"vid{i:09d}", buf, fmt))
        tmp = f"{path}.tmp-{os.getpid()}"
        pd.DataFrame(recs, columns=["video_id", "bytes", "fmt"]).to_parquet(
            tmp, index=False
        )
        os.replace(tmp, path)
    return path


def video_truth_parquet(n: int, root: str = "/root/repo/.cache") -> str:
    """Ground-truth PER-FRAME structure + pixel stats from the raw frames
    (no encode/decode round trip): frame index and dimensions are exact
    for EVERY container; the gray mean is exact only for the lossless
    rawvid rows (MJPEG quantization legitimately shifts it — those rows
    carry the PSNR bound in tests/test_av.py instead). Per-frame rather
    than per-video so the oracle compares the IDENTICAL NumPy
    frame.mean() computed on both sides, never a re-associated float
    aggregate."""
    import os

    path = os.path.join(root, f"video_truth_{n}_{AV_FIXTURE_V}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        recs = []
        for i in range(n):
            frames = _video_frames(i)
            fmt = "rawvid" if i % 3 == 2 else "mjpeg"
            for idx in range(frames.shape[0]):
                recs.append(
                    (
                        f"vid{i:09d}", fmt, int(idx),
                        int(frames.shape[2]), int(frames.shape[1]),
                        float(frames[idx].mean()),
                    )
                )
        tmp = f"{path}.tmp-{os.getpid()}"
        pd.DataFrame(
            recs, columns=["video_id", "fmt", "frame_idx", "w", "h", "mean_px"]
        ).to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path


def era5_archive_fixture(root: str = "/root/repo/.cache") -> str:
    """A three-month classic-netCDF archive named per the reference's
    DatasetPool convention (cds.py:698-704): two closed months plus a
    trailing ``_part`` month. Values are the closed DYADIC form
    ``200 + ix*0.5 + iy*0.25 + g*0.125`` (g = hours since 2019-01-01) —
    every term exactly representable in float64, so the DuckDB oracle
    recomputes the multi-file scan bit-for-bit. Returns the glob pattern.
    20x10 grid at 0.25 deg from (100E, 10N); 72 h per closed month, 36 h
    for the partial one."""
    import os

    from .sources.netcdf3 import write_netcdf3

    d = os.path.join(root, "era5_arch_v1")
    months = [("2019-01", 0, 72), ("2019-02", 744, 72), ("2019-03", 1416, 36)]
    pattern = os.path.join(d, "SYN-*-era5.instant.nc")
    names = [
        os.path.join(
            d, f"SYN-{m}{'_part' if m == '2019-03' else ''}-era5.instant.nc"
        )
        for m, _, _ in months
    ]
    if all(os.path.exists(p) for p in names):
        return pattern
    os.makedirs(d, exist_ok=True)
    nx, ny = 20, 10
    lon = 100.0 + np.arange(nx) * 0.25
    lat = 10.0 + np.arange(ny) * 0.25
    ix = np.arange(nx)[None, None, :]
    iy = np.arange(ny)[None, :, None]
    for path, (_m, h0, nh) in zip(names, months):
        g = (h0 + np.arange(nh))[:, None, None].astype(np.float64)
        arr = 200.0 + ix * 0.5 + iy * 0.25 + g * 0.125
        # tmp + atomic rename, like every other fixture writer here: a
        # crash mid-write would otherwise leave a truncated .nc that the
        # all-exists guard above treats as complete forever
        tmp = f"{path}.tmp-{os.getpid()}"
        write_netcdf3(
            tmp,
            dims=[("time", nh), ("latitude", ny), ("longitude", nx)],
            variables={
                "time": (
                    ["time"],
                    (h0 + np.arange(nh)).astype(np.float64),
                    {"units": "hours since 2019-01-01"},
                ),
                "latitude": (["latitude"], lat),
                "longitude": (["longitude"], lon),
                "t2m": (["time", "latitude", "longitude"], arr),
            },
            attrs={"title": "synthetic DatasetPool archive"},
        )
        os.replace(tmp, path)
    return pattern


# ---- hourly raster (ERA5 analog), long form -------------------------------
def grid_pixels_table(
    spark: SparkSession,
    nx: int = 65,
    ny: int = 33,
    hours: int = 48,
    x0: float = 100.0,
    y0: float = 10.0,
    inc: float = 0.25,
) -> DataFrame:
    """Long-form hourly raster with instant (t2m) + accum (tp) variables and
    a deterministic NaN 'coastline' (sparse-resample tests, reference
    src/geoglue/resample.py:19-78). Entirely JVM-side arithmetic."""
    n = nx * ny * hours
    base = spark.range(0, n, 1, max(8, spark.sparkContext.defaultParallelism))
    ih = (F.col("id") / (nx * ny)).cast("long")
    rem = F.col("id") % (nx * ny)
    iy = (rem / nx).cast("long")
    ix = rem % nx
    lat = F.lit(y0) + iy.cast("double") * F.lit(inc)
    lon = F.lit(x0) + ix.cast("double") * F.lit(inc)
    t = F.to_timestamp(F.lit("2019-01-01 00:00:00")) + F.make_interval(hours=ih.cast("int"))
    val_t2m = F.lit(280.0) + F.sin(lon / 10) * 5 + F.cos(lat / 10) * 3 + (ih % 24).cast(
        "double"
    ) * 0.1
    val_tp = F.greatest(F.lit(0.0), F.sin(lon + lat + ih.cast("double") / 7.0) * 2.0)
    coast = ((ix * 7 + iy * 13) % 23) == 0  # deterministic sparse NaN mask
    t2m = base.select(
        t.alias("time"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.lit("instant").alias("vartype"),
        F.lit("t2m").alias("var"),
        F.when(coast, F.lit(None).cast("double")).otherwise(val_t2m).alias("value"),
    )
    tp = base.select(
        t.alias("time"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.lit("accum").alias("vartype"),
        F.lit("tp").alias("var"),
        F.when(coast, F.lit(None).cast("double")).otherwise(val_tp).alias("value"),
    )
    return t2m.unionByName(tp)
