"""OSM width-tag parser (SURVEY.md F7).

Replicates ``_parse_width_tags`` (osm_waterway_extractor.py:2607-2641):

- empty/missing → (raw='', meters=NULL, source='none')
- non-empty → source='tag'; s = raw.lower().strip()
    * 'm' in s            → float(s with all 'm' removed, stripped)
    * elif 'ft'/'feet' in s → float(s with 'ft' then 'feet' removed) × 0.3048
    * elif s minus '.' is all digits → float(s)
    * parse failure → NULL  (reference catches ValueError)
- validity: NULL unless 0 < meters ≤ 1000 (:2630-2632)

Two twin implementations: a pure-Catalyst column builder (JVM-side, used in
the pipeline hot path) and a plain-Python one for the oracle. Their parity is
pinned by the FIXTURES.md F-E unit table.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

FT_TO_M = 0.3048


def width_columns(width_raw: Column) -> tuple[Column, Column, Column]:
    """(width_raw_norm, width_m, width_source) columns from a raw tag value."""
    raw = F.coalesce(width_raw, F.lit(""))
    s = F.trim(F.lower(raw))
    has_m = s.contains("m")
    has_ft = s.contains("ft") | s.contains("feet")
    digitish = F.regexp_replace(s, r"\.", "").rlike(r"^[0-9]+$")
    m_val = F.trim(F.regexp_replace(s, "m", "")).try_cast("double")
    ft_val = F.trim(
        F.regexp_replace(F.regexp_replace(s, "ft", ""), "feet", "")
    ).try_cast("double") * F.lit(FT_TO_M)
    parsed = (
        F.when(s == "", F.lit(None).cast("double"))
        .when(has_m, m_val)
        .when(has_ft, ft_val)
        .when(digitish, s.try_cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )
    width_m = F.when((parsed > 0.0) & (parsed <= 1000.0), parsed)
    width_source = F.when(raw == "", F.lit("none")).otherwise(F.lit("tag"))
    return raw, width_m, width_source


def width_sql(raw_expr: str) -> dict[str, str]:
    """DuckDB-SQL twin of ``width_columns`` for oracle queries."""
    raw = f"coalesce({raw_expr}, '')"
    s = f"trim(lower({raw}))"
    parsed = f"""(CASE
        WHEN {s} = '' THEN NULL
        WHEN contains({s}, 'm') THEN try_cast(trim(replace({s}, 'm', '')) AS DOUBLE)
        WHEN contains({s}, 'ft') OR contains({s}, 'feet')
            THEN try_cast(trim(replace(replace({s}, 'ft', ''), 'feet', '')) AS DOUBLE) * {FT_TO_M}
        WHEN regexp_matches(replace({s}, '.', ''), '^[0-9]+$')
            THEN try_cast({s} AS DOUBLE)
        ELSE NULL END)"""
    return {
        "width_raw": raw,
        "width_m": f"(CASE WHEN {parsed} > 0.0 AND {parsed} <= 1000.0 THEN {parsed} ELSE NULL END)",
        "width_source": f"(CASE WHEN {raw} = '' THEN 'none' ELSE 'tag' END)",
    }


def parse_width(width_raw: Optional[str]) -> tuple[str, Optional[float], str]:
    """Python twin (oracle path) — literal port of the reference semantics."""
    raw = width_raw or ""
    if raw == "":
        return "", None, "none"
    s = raw.lower().strip()
    meters: Optional[float] = None
    try:
        if "m" in s:
            meters = float(s.replace("m", "").strip())
        elif "ft" in s or "feet" in s:
            meters = float(s.replace("ft", "").replace("feet", "").strip()) * FT_TO_M
        elif s.replace(".", "").isdigit():
            meters = float(s)
    except ValueError:
        meters = None
    if meters is not None and (meters <= 0 or meters > 1000):
        meters = None
    return raw, meters, "tag"
