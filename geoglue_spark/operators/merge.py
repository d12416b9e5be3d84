"""Dataset assembly: crop, concat, variable merge, lineage combination.

Spark restatements of the reference's crop/merge CLI stages
(reference src/geoglue/cli.py:136-188, src/geoglue/merge.py:12-75):

  * crop (P4) = a bbox filter — Catalyst pushes it into the scan;
  * concat along time (O2) = unionByName;
  * variable merge (O3) = full outer join on the dim columns;
  * lineage combination (O4) = first-wins per attribute EXCEPT the config
    lineage, where distinct values are newline-joined in first-seen order
    (reference merge.py:24-62) — reproduced order-sensitively with min_by
    on an input rank.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geometry import Bbox

LINEAGE_KEY = "geoglue_config"


def crop(
    df: DataFrame, bbox: Bbox, lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """Spatial crop — predicate pushed to the scan (check PushedFilters)."""
    return df.filter(
        F.col(lon_col).between(bbox.minx, bbox.maxx)
        & F.col(lat_col).between(bbox.miny, bbox.maxy)
    )


def normalize_lon_col(lon) -> "F.Column":
    """P6: longitude to [-180, 180) — ``(lon + 180) mod 360 - 180`` with
    pmod so negative inputs land in range too (reference util.py:165-172
    applies this to 0..360 ERA5 longitudes). Idempotent for in-range
    values; pure Column arithmetic, codegen'd."""
    return F.pmod(lon + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


def normalize_longitudes(df: DataFrame, lon_col: str = "lon") -> DataFrame:
    """P6 as a DataFrame op. The reference also re-sorts coordinates after
    normalizing; long-form Spark tables carry no storage order — index math
    (Grid) and the y_descending flag (O1) replace the sort."""
    return df.withColumn(lon_col, normalize_lon_col(F.col(lon_col)))


def concat_time(frames: list[DataFrame]) -> DataFrame:
    """O2: union along time; schema-aligned by name."""
    return reduce(lambda a, b: a.unionByName(b), frames)


def variable_merge(
    frames: list[DataFrame], dims: list[str], value_cols: list[str]
) -> DataFrame:
    """O3: horizontal merge of single-variable tables into one multi-var
    table — outer join on the dim columns (each input must carry exactly
    one of ``value_cols``)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, list(dims), "full_outer")
    return out.select(*dims, *value_cols)


def combine_lineage(configs: list[str | None]) -> str:
    """O4 driver-side form: distinct config strings newline-joined in
    first-seen order (reference merge.py:46-57)."""
    seen: list[str] = []
    for c in configs:
        if c and c not in seen:
            seen.append(c)
    return "\n".join(seen)


def concat_with_lineage(
    frames: list[DataFrame], lineage_col: str = LINEAGE_KEY
) -> DataFrame:
    """O4 as a DataFrame op: rows concatenated; the lineage column is
    replaced everywhere by the ordered-distinct newline-join of all inputs'
    lineages. Input order is respected (rank column, min_by aggregation) —
    NOT collection order, which Spark doesn't guarantee."""
    ranked = [
        f.withColumn("_rank", F.lit(i)) for i, f in enumerate(frames)
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), ranked)
    lineage_rows = (
        unioned.select("_rank", F.col(lineage_col).alias("_cfg"))
        .filter(F.col("_cfg").isNotNull())
        .groupBy("_cfg")
        .agg(F.min("_rank").alias("_first"))
        .orderBy("_first")
        .collect()
    )
    combined = "\n".join(r._cfg for r in lineage_rows)
    return unioned.drop("_rank").withColumn(lineage_col, F.lit(combined))
