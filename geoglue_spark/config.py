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
    mode ('off' | 'bilinear' | 'nearest').
    """

    raster: str
    admins: str
    admins_pk: str
    output: str
    operation: str
    weights: str | None = None
    resample: str = "off"

    def lineage(self) -> str:
        """Canonical logfmt line (the reference's __str__, config.py:146-161)."""
        keys = ("raster", "admins", "admins_pk", "output", "operation", "weights", "resample")
        return " ".join(f"{k}={logfmt_escape(getattr(self, k))}" for k in keys)

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
        )


def read_job_configs(text: str) -> list[ZonalJobConfig]:
    """One config per non-empty line (reference read_zonalstats_config,
    config.py:199-206 — normalized to always return a list)."""
    return [
        ZonalJobConfig.from_lineage(line)
        for line in text.splitlines()
        if line.strip()
    ]
