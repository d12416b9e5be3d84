"""Job configuration records with logfmt lineage round-tripping.

The Spark restatement of the reference's ZonalStatsConfig
(reference src/geoglue/config.py:126-220): a frozen dataclass whose
stringification is a logfmt line stamped into output lineage
(zonalstats.py:137) and into the incremental manifest's lineage column —
every output is reproducible-by-string: parse the lineage back into a
config and re-run.
"""

from __future__ import annotations

import shlex
from dataclasses import dataclass, fields

from .functions import logfmt_escape

_REQUIRED = ("raster", "admins", "admins_pk", "output", "operation")


@dataclass(frozen=True)
class ZonalJobConfig:
    """One zonal-statistics job, fully described.

    ``raster``/``admins``/``weights``/``output`` are storage URIs (parquet
    paths here, where the reference takes .nc/.shp files); ``admins_pk`` is
    the polygon primary-key column (reference shapefile_id);  ``operation``
    the exactextract-style op string; ``resample`` the weights pre-resample
    mode ('off' | 'bilinear' | 'distance' | 'sparse_bilinear', or the CDO
    aliases remapbil/remapdis/sremapbil — the values api.resample accepts).
    """

    raster: str
    admins: str
    admins_pk: str
    output: str
    operation: str
    weights: str | None = None
    resample: str = "off"
    var: str | None = None  # netCDF/GRIB variable to read from ``raster``

    def lineage(self) -> str:
        """Canonical logfmt line (the reference's __str__, config.py:146-161)."""
        keys = ("raster", "admins", "admins_pk", "output", "operation", "weights", "resample")
        line = " ".join(f"{k}={logfmt_escape(getattr(self, k))}" for k in keys)
        if self.var:
            line += f" var={logfmt_escape(self.var)}"
        return line

    __str__ = lineage

    @staticmethod
    def from_lineage(line: str) -> "ZonalJobConfig":
        """Parse a lineage line back into a config (config.py:163-196).
        Raises KeyError when a required key is absent."""
        kv: dict[str, str] = {}
        for part in shlex.split(line):
            k, _, v = part.partition("=")
            kv[k] = v
        missing = [k for k in _REQUIRED if k not in kv]
        if missing:
            raise KeyError(f"lineage line missing required keys {missing}")
        weights = kv.get("weights") or None
        if weights == '""':
            weights = None
        return ZonalJobConfig(
            raster=kv["raster"],
            admins=kv["admins"],
            admins_pk=kv["admins_pk"],
            output=kv["output"],
            operation=kv["operation"],
            weights=weights,
            resample=kv.get("resample", "off"),
            var=kv.get("var") or None,
        )


@dataclass(frozen=True)
class ValidationSpec:
    """Per-variable validation thresholds (reference VariableSpec,
    config.py:25-38): allowed value range + maximum NA fraction. ``apply``
    runs the checks as ONE metadata-scale aggregation via
    operators.validate.check_value_range."""

    min: float | None = 0.0
    max: float | None = None
    max_na_frac: float = 0.0

    def validate(self) -> None:
        if self.min is not None and self.max is not None and self.min > self.max:
            raise ValueError(f"min ({self.min}) > max ({self.max})")
        if not 0.0 <= self.max_na_frac <= 1.0:
            raise ValueError(
                f"max_na_frac must be between 0 and 1 (got {self.max_na_frac})"
            )

    def apply(self, df, value_col: str = "value") -> None:
        from .operators.validate import check_value_range

        self.validate()
        check_value_range(df, value_col, self.min, self.max, self.max_na_frac)


@dataclass(frozen=True)
class RegionSource:
    """Polygon source + primary key, parseable from the reference's
    '<path>::<pk>' string form (config.py:41-53)."""

    file: str
    pk: str

    @staticmethod
    def from_str(s: str) -> "RegionSource":
        parts = s.split("::")
        if len(parts) != 2:
            raise ValueError(
                "RegionSource.from_str takes '<polygon_path>::<pk_field>'"
            )
        return RegionSource(parts[0], parts[1])

    def load(self, spark):
        from .api import region_from_file

        return region_from_file(spark, self.file, self.pk)


@dataclass(frozen=True)
class GlobalConfig:
    """The geoglue-config.toml analog (reference GeoglueConfig,
    config.py:56-117): operation ALIASES (short name -> exactextract op
    string), named region sources, and path settings. ``check(spark)``
    eagerly verifies every region file loads and carries its pk — the
    reference validates at read time too."""

    operation: dict[str, str] = None  # type: ignore[assignment]
    region: dict[str, RegionSource] = None  # type: ignore[assignment]
    paths: dict[str, str] = None  # type: ignore[assignment]

    def __post_init__(self):
        object.__setattr__(self, "operation", dict(self.operation or {}))
        object.__setattr__(self, "region", dict(self.region or {}))
        object.__setattr__(self, "paths", dict(self.paths or {}))

    def resolve_operation(self, op: str) -> str:
        """Alias lookup with passthrough (reference cli.py:278)."""
        return self.operation.get(op, op)

    @staticmethod
    def from_toml(text: str) -> "GlobalConfig":
        import os
        import tomllib

        doc = tomllib.loads(text)
        region = {}
        for name, spec in (doc.get("region") or {}).items():
            if set(spec) != {"file", "pk"}:
                raise KeyError(
                    f"region {name!r} must have exactly 'file' and 'pk' keys"
                )
            region[name] = RegionSource(spec["file"], spec["pk"])
        paths = {
            k: os.path.expandvars(os.path.expanduser(v))
            for k, v in (doc.get("paths") or {}).items()
        }
        return GlobalConfig(
            operation=doc.get("operation") or {}, region=region, paths=paths
        )

    def check(self, spark) -> None:
        for name, src in self.region.items():
            df = src.load(spark)  # raises on missing file / pk / bad geometry
            if df.limit(1).count() == 0:
                raise ValueError(f"region {name!r}: {src.file} has no features")


def read_job_configs(text: str) -> list[ZonalJobConfig]:
    """One config per non-empty line (reference read_zonalstats_config,
    config.py:199-206 — normalized to always return a list)."""
    return [
        ZonalJobConfig.from_lineage(line)
        for line in text.splitlines()
        if line.strip()
    ]
