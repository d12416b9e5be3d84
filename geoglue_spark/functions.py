"""Scalar utility functions — the F-family of SURVEY.md §2.7.

Driver-side helpers (metadata-scale, never in the row hot path):
timezone lookup pinned to a reproducible date (F2), zero-padded integer
ranges for chunk naming (F5), logfmt escaping for lineage strings (F7),
and the bias-corrected attribute transform (F12).
"""

from __future__ import annotations

import datetime as dt
import re
from pathlib import Path

# ISO-3166 alpha-3 -> alpha-2 for common countries (public standard codes;
# the reference resolves these via the pycountry package, which is not in
# this container). Extend as needed; get_timezone also accepts alpha-2.
ISO3_TO_ISO2 = {
    "AFG": "AF", "ARG": "AR", "AUS": "AU", "AUT": "AT", "BEL": "BE",
    "BGD": "BD", "BRA": "BR", "CAN": "CA", "CHE": "CH", "CHL": "CL",
    "CHN": "CN", "COL": "CO", "DEU": "DE", "DNK": "DK", "EGY": "EG",
    "ESP": "ES", "ETH": "ET", "FIN": "FI", "FRA": "FR", "GBR": "GB",
    "GRC": "GR", "IDN": "ID", "IND": "IN", "IRN": "IR", "IRQ": "IQ",
    "ITA": "IT", "JPN": "JP", "KEN": "KE", "KHM": "KH", "KOR": "KR",
    "LAO": "LA", "MEX": "MX", "MMR": "MM", "MNG": "MN", "MYS": "MY",
    "NGA": "NG", "NLD": "NL", "NOR": "NO", "NPL": "NP", "PAK": "PK",
    "PER": "PE", "PHL": "PH", "POL": "PL", "PRT": "PT", "RUS": "RU",
    "SAU": "SA", "SGP": "SG", "SWE": "SE", "THA": "TH", "TUR": "TR",
    "UKR": "UA", "USA": "US", "VNM": "VN", "ZAF": "ZA",
}

# mid-January: northern-hemisphere standard time, no DST ambiguity — the
# reference pins the localization date for reproducibility (region.py:174-208)
DEFAULT_LOCALIZE_DATE = dt.datetime(2023, 1, 15)


def get_timezone(
    country: str, localize_date: dt.datetime = DEFAULT_LOCALIZE_DATE
) -> str | None:
    """Unique UTC offset '[+-]HH:MM' for a country, or None when the country
    spans several timezones (F2, reference src/geoglue/region.py:174-208).

    ``country``: ISO3 (via the built-in alpha-3 map) or ISO2 directly.
    The offset is evaluated at ``localize_date`` so DST policy changes can't
    make runs irreproducible.
    """
    try:
        import pytz
    except ImportError as e:  # pragma: no cover - pytz ships with pandas
        raise RuntimeError("get_timezone requires pytz") from e

    code = country.upper()
    if len(code) == 3:
        if code not in ISO3_TO_ISO2:
            raise KeyError(f"unknown ISO3 country code {country!r}")
        code = ISO3_TO_ISO2[code]
    zones = pytz.country_timezones.get(code.lower()) or pytz.country_timezones.get(
        code
    )
    if zones is None:
        raise KeyError(f"no timezones known for country {country!r}")
    if len(zones) > 1:
        return None
    stamp = pytz.timezone(zones[0]).localize(localize_date).strftime("%z")
    return f"{stamp[:3]}:{stamp[3:]}"


def zero_padded_intrange(start: int, end: int, inclusive: bool = True) -> list[str]:
    """['01', '02', ...] — width follows the reference's rule: the decimal
    width of the first integer PAST the range end (F5, util.py:238-242)."""
    if end <= start:
        raise ValueError("end of range must be greater than start")
    stop = end + 1 if inclusive else end
    width = len(str(stop))
    return [f"{v:0{width}d}" for v in range(start, stop)]


_NEEDS_QUOTING = re.compile(r'[\s="\\]')


def logfmt_escape(value: str | Path | None) -> str:
    """Escape one value for logfmt output (F7, reference util.py:76-93):
    None -> '""'; plain tokens pass through; anything with whitespace,
    '=', quotes or backslashes is backslash-escaped and quoted."""
    if value is None:
        return '""'
    s = str(value)
    if not _NEEDS_QUOTING.search(s):
        return s
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def logfmt(pairs: dict) -> str:
    """key=value logfmt line with escaped values — the lineage string
    format (reference config.py:146-161)."""
    return " ".join(f"{k}={logfmt_escape(v)}" for k, v in pairs.items())


def bias_corrected(attrs: dict) -> dict:
    """Attribute transform marking a variable as bias-corrected (F12,
    reference attrs.py:75-79): long_name gets a suffix, short_name '_bc'."""
    out = dict(attrs)
    out["long_name"] = f"{out['long_name']} (bias_corrected)"
    out["short_name"] = f"{out['short_name']}_bc"
    return out
