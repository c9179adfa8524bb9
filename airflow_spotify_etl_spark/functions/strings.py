"""String scalar expressions (SURVEY.md §2.2 P7/P8/P10/P11)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["duration_mmss", "url_encode_col", "parse_bool_flag"]


def parse_bool_flag(value: str | None, default: bool = False) -> bool:
    """P12 — the reference's config-flag parse idiom
    (``Variable.get(...).lower() == "true"``, new.py:224)."""
    if value is None:
        return default
    return value.strip().lower() == "true"


def duration_mmss(ms: Column | str) -> Column:
    """ms → ``m:ss`` display string (P8 — new.py:170's divmod formatting)."""
    c = F.col(ms) if isinstance(ms, str) else ms
    return F.format_string(
        "%d:%02d", (c / 60000).cast("bigint"), ((c % 60000) / 1000).cast("bigint")
    )


def url_encode_col(col: Column | str) -> Column:
    """Percent-encode (P7 — the reference URL-encodes artist names for the
    search endpoint, spotify_etl.py:108). Spark ≥3.4 built-in."""
    c = F.col(col) if isinstance(col, str) else col
    return F.url_encode(c)
