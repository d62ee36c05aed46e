"""Graphite line parsing: whitespace-separated ``name value ts`` triples.

Reference /root/reference/src/protocols/graphite.rs:9-47 — every triple
becomes a Telemetry with kind Set and the explicit epoch-second timestamp;
non-numeric value or timestamp invalidates the line.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM = r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
#: name = any non-whitespace (may contain @ % - etc.), then value, then int ts
GRAPHITE_LINE_RX = rf"^(\S+)\s+({_NUM})\s+([+-]?\d+)$"


def graphite_parse_columns(line: Column) -> list[Column]:
    name = F.regexp_extract(line, GRAPHITE_LINE_RX, 1)
    val = F.regexp_extract(line, GRAPHITE_LINE_RX, 2)
    ets = F.regexp_extract(line, GRAPHITE_LINE_RX, 3)
    valid = name != F.lit("")
    return [
        F.when(valid, name).alias("name"),
        F.when(valid, val.cast("double")).alias("value"),
        F.when(valid, F.lit("SET")).alias("kind"),
        F.when(valid, F.lit(False)).alias("persist"),
        F.when(valid, ets.cast("long")).alias("event_epoch"),
        valid.alias("is_valid"),
    ]


def parse_graphite_lines(
    df: DataFrame, line_col: str = "line", keep_invalid: bool = False
) -> DataFrame:
    """Parse graphite triples; overrides the row timestamp with the wire one."""
    out = df.select("*", *graphite_parse_columns(F.col(line_col)))
    if not keep_invalid:
        out = out.filter(F.col("is_valid"))
    return out
