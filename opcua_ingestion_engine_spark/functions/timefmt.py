"""Timestamp text formatting (SURVEY.md §2.7 X5).

The reference stores timestamps as TEXT ``yyyy-MM-ddTHH:mm:ss.ffffff`` (UTC,
microseconds) — format string at ``Services/OpcSubscribeService.cs:247,331,
555,685,719,990``. Keeping this exact format matters for oracle value-hash
parity (SURVEY.md §7 risk 3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MODVALUES_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

# DuckDB strftime equivalent (%f = 6-digit microseconds).
SQL_MODVALUES_TS_FMT = "%Y-%m-%dT%H:%M:%S.%f"


def format_modvalues_ts(ts: Column) -> Column:
    return F.date_format(ts, MODVALUES_TS_FMT)
