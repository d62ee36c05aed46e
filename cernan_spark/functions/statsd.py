"""Statsd line parsing as pure column expressions (JVM-side, codegen'd).

Grammar (reference /root/reference/src/protocols/statsd.rs:22-163):

    name:value|type[|@rate]      and the no-pipe form   name:value|type@rate

* type ``c``  → kind Sum, persist false
* type ``g``  → persist true; signed value (leading +/-) → kind Sum
  (delta gauge), else kind Set
* type ``ms``/``h`` → kind Summarize, persist false — unless the name
  matches a histogram mask rule, then kind Histogram with the rule bounds
  (statsd.rs:105-115,135-145)
* any type with a sample rate scales ``value * (1/rate)``
  (statsd.rs:66-116)
* name may contain ``=``, ``/``, ``-``; it is everything before the first
  ``:``; empty name / missing pipe / non-numeric value or rate → bad line
  (counted, not crashed; statsd.rs:553-573)

Kinds are encoded as strings SUM | SET | SUMMARIZE | HISTOGRAM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM = r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
#: One regex for the whole line. Groups: 1=name 2=value 3=type 4=rate.
STATSD_LINE_RX = rf"^([^:]+):({_NUM})\|(g|c|ms|h)(?:\|?@({_NUM}))?$"

KIND_SUM = "SUM"
KIND_SET = "SET"
KIND_SUMMARIZE = "SUMMARIZE"
KIND_HISTOGRAM = "HISTOGRAM"


def statsd_parse_columns(line: Column) -> list[Column]:
    """Columns (name, value, kind, persist, is_valid) parsed from one line."""
    name = F.regexp_extract(line, STATSD_LINE_RX, 1)
    val_str = F.regexp_extract(line, STATSD_LINE_RX, 2)
    ty = F.regexp_extract(line, STATSD_LINE_RX, 3)
    rate_str = F.regexp_extract(line, STATSD_LINE_RX, 4)

    valid = ty != F.lit("")
    signed = F.substring(val_str, 1, 1).isin("+", "-")
    raw_val = val_str.cast("double")
    scale = F.when(rate_str == "", F.lit(1.0)).otherwise(
        F.lit(1.0) / rate_str.cast("double")
    )
    value = raw_val * scale

    kind = (
        F.when(ty == "c", F.lit(KIND_SUM))
        .when((ty == "g") & signed, F.lit(KIND_SUM))
        .when(ty == "g", F.lit(KIND_SET))
        .when(ty.isin("ms", "h"), F.lit(KIND_SUMMARIZE))
        .otherwise(F.lit(None).cast("string"))
    )
    persist = ty == "g"

    return [
        F.when(valid, name).alias("name"),
        F.when(valid, value).alias("value"),
        F.when(valid, kind).alias("kind"),
        F.when(valid, persist).otherwise(F.lit(None).cast("boolean")).alias("persist"),
        valid.alias("is_valid"),
    ]


def parse_statsd_lines(
    df: DataFrame,
    line_col: str = "line",
    masks: DataFrame | None = None,
    keep_invalid: bool = False,
) -> DataFrame:
    """Parse a DataFrame of statsd lines into typed telemetry rows.

    Adds (name, value, kind, persist, is_valid[, bounds]). If ``masks`` is
    given (mask regex → bounds, priority), Summarize rows whose name matches
    a mask are upgraded to Histogram with the first matching rule's bounds —
    a broadcast nested-loop join against a tiny rules table, mirroring the
    reference's linear mask scan (statsd.rs:105-115).
    """
    out = df.select("*", *statsd_parse_columns(F.col(line_col)))
    if not keep_invalid:
        out = out.filter(F.col("is_valid"))

    if masks is not None:
        m = F.broadcast(
            masks.select(
                F.col("mask"),
                F.col("bounds").alias("_mask_bounds"),
                F.col("priority").alias("_mask_priority"),
            )
        )
        joined = out.join(
            m,
            (F.col("kind") == KIND_SUMMARIZE)
            & F.regexp_like(F.col("name"), F.col("mask")),
            "left",
        )
        # first matching rule wins, by priority (reference scans in config
        # order and breaks on first match)
        from pyspark.sql import Window as W

        order_cols = [c for c in ("order_key", "turn_idx") if c in df.columns]
        w = W.partitionBy(*(order_cols or [line_col]), "name").orderBy(
            F.col("_mask_priority").asc_nulls_last()
        )
        joined = (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "mask")
        )
        out = joined.select(
            "*",
            F.when(F.col("_mask_bounds").isNotNull(), F.lit(KIND_HISTOGRAM))
            .otherwise(F.col("kind"))
            .alias("_kind2"),
        )
        out = (
            out.drop("kind")
            .withColumnRenamed("_kind2", "kind")
            .withColumnRenamed("_mask_bounds", "bounds")
            .drop("_mask_priority")
        )
    return out
