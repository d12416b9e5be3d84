"""Variable registry — the metrics.toml analog (SURVEY §2 "variable
registry"; reference src/geoglue/metrics.toml:47-146).

A registry maps variable names to the statistics allowed for them
(daily_mean/daily_min/daily_max/daily_sum) and the resampling kernel to
use. The reference's rule (metrics.toml:1-2): resampling is BILINEAR
unless the variable carries a daily_sum statistic (accumulated/flux-like
variables resample with the distance kernel), overridable per variable.

The registry drives Spark-side dispatch:

* :func:`apply_daily_statistics` — ONE aggregation pass computes every
  needed daily statistic; a tiny broadcast (var, stat) allow-table then
  unpivots to long form. No per-variable job loop.
* :func:`resampler_for` — picks resample_bilinear / resample_distance.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAILY_STATS = ("daily_mean", "daily_min", "daily_max", "daily_sum")
_STAT_AGG = {
    "daily_mean": F.avg,
    "daily_min": F.min,
    "daily_max": F.max,
    "daily_sum": F.sum,
}


@dataclass(frozen=True)
class VariableSpec:
    name: str
    source: str = ""
    description: str = ""
    units: str = ""
    statistics: tuple[str, ...] = ("daily_mean",)
    resampling: str | None = None  # None -> infer by the daily_sum rule
    depends: tuple[str, ...] = ()

    @property
    def vartype(self) -> str:
        """accum iff the variable aggregates by summation (W2 dispatch)."""
        return "accum" if "daily_sum" in self.statistics else "instant"

    @property
    def effective_resampling(self) -> str:
        if self.resampling:
            return self.resampling
        return "distance" if "daily_sum" in self.statistics else "bilinear"


@dataclass
class VariableRegistry:
    variables: dict[str, VariableSpec] = field(default_factory=dict)

    def __getitem__(self, name: str) -> VariableSpec:
        return self.variables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.variables

    def add(self, spec: VariableSpec) -> None:
        self.variables[spec.name] = spec

    def allowed_stats(self) -> list[tuple[str, str]]:
        """(var, stat) allow-pairs — the broadcast dim table."""
        return [
            (v.name, s) for v in self.variables.values() for s in v.statistics
        ]

    @staticmethod
    def from_toml(text: str) -> "VariableRegistry":
        """Parse a metrics.toml-shaped document: [source.variable] tables
        with statistics/resampling/units keys ([sources.*] blocks are
        provenance metadata, kept as descriptions only)."""
        import tomllib

        doc = tomllib.loads(text)
        reg = VariableRegistry()
        for source, entries in doc.items():
            if source == "sources" or not isinstance(entries, dict):
                continue
            for var, spec in entries.items():
                if not isinstance(spec, dict):
                    continue
                stats = tuple(spec.get("statistics", ("daily_mean",)))
                bad = [s for s in stats if s not in DAILY_STATS]
                if bad:
                    raise ValueError(f"{source}.{var}: unknown statistics {bad}")
                resampling = spec.get("resampling")
                if resampling in ("remapbil", "bilinear"):
                    resampling = "bilinear"
                elif resampling in ("remapdis", "distance"):
                    resampling = "distance"
                reg.add(
                    VariableSpec(
                        name=var,
                        source=source,
                        description=spec.get("description", ""),
                        units=spec.get("units", ""),
                        statistics=stats,
                        resampling=resampling,
                        depends=tuple(spec.get("depends", ())),
                    )
                )
        return reg


DEFAULT_REGISTRY_TOML = """
[era5.t2m]
description = "Air temperature at 2m"
units = "K"
statistics = ["daily_mean", "daily_min", "daily_max"]
resampling = "bilinear"

[era5.tp]
description = "Total precipitation"
units = "m"
statistics = ["daily_sum"]

[era5.ssrd]
description = "Accumulated solar radiation downwards"
units = "J/m^2"
statistics = ["daily_sum"]
resampling = "bilinear"

[era5.ws10]
description = "Wind speed at 10m"
units = "m/s"
depends = ["u10", "v10"]
statistics = ["daily_mean"]
"""


def default_registry() -> VariableRegistry:
    return VariableRegistry.from_toml(DEFAULT_REGISTRY_TOML)


def apply_daily_statistics(
    df: DataFrame,
    registry: VariableRegistry,
    var_col: str = "var",
    value_col: str = "value",
    time_col: str = "time",
    keys: list[str] = (),
) -> DataFrame:
    """Hourly -> daily per the registry, all variables in ONE pass.

    Single groupBy computes every daily statistic as a column (map-side
    partial agg), then a stack unpivot + broadcast semi-join against the
    (var, stat) allow-pairs keeps only the statistics the registry permits
    per variable. Unknown variables are dropped (strict registries can
    pre-validate with ``df.var ∈ registry``).

    Output: (date, var, *keys, stat, value).
    """
    spark = df.sparkSession
    agged = df.groupBy(
        F.to_date(time_col).alias("date"), F.col(var_col).alias("var"), *keys
    ).agg(*[_STAT_AGG[s](F.col(value_col)).alias(s) for s in DAILY_STATS])
    stack = F.expr(
        "stack({n}, {args}) AS (stat, value)".format(
            n=len(DAILY_STATS),
            args=", ".join(f"'{s}', {s}" for s in DAILY_STATS),
        )
    )
    long = agged.select("date", "var", *keys, stack)
    allow = F.broadcast(
        spark.createDataFrame(registry.allowed_stats(), "var string, stat string")
    )
    return long.join(allow, ["var", "stat"], "left_semi")


def resampler_for(spec: VariableSpec):
    """The resample kernel the registry picks for a variable — bilinear by
    default, distance for daily_sum variables (metrics.toml:1-2 rule)."""
    from .operators import resample as R

    return (
        R.resample_distance
        if spec.effective_resampling == "distance"
        else R.resample_sparse_bilinear
    )
