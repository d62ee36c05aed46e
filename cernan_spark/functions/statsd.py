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
    """Columns (name, value, kind, persist, is_valid) parsed from one line,
    mirroring the reference's find(':')/find('|')/find('@') scan.

    Slicing runs through anchored LITERAL regexes (compiled once per
    operator by codegen) instead of nested substring_index chains: every
    output column re-evaluates its inputs — conditional branches are
    skipped by codegen subexpression elimination — so with nested chains
    the fused parse→partial-aggregate method exceeded janino's 64 KB
    limit and the whole hot stage silently ran interpreted (measured 6.7×
    slower at 2M lines). Numeric validity stays on ``try_cast`` (NOT a
    number-shaped regex) so values like ``' 1.5 '``, ``'NaN'``, ``'inf'``
    keep the exact cast semantics the golden/model tests and the DuckDB
    oracles pin.
    """
    # chars between start and the FIRST ':' (empty when no colon or the
    # line starts with ':') — find(':') in statsd.rs:553-573
    name = F.regexp_extract(line, r"^([^:]+):", 1)
    # chars between the first ':' and the FIRST '|'; '' when either
    # separator is missing (→ invalid below, same as the position scan)
    val_str = F.regexp_extract(line, r"^[^:]+:([^|]*)\|", 1)
    # everything after the first '|'
    tyrate = F.regexp_extract(line, r"^[^:]+:[^|]*\|(.*)$", 1)
    # 'c|@0.2' and 'c@0.2' both → ty 'c' (pipe stripped only in the rate
    # form — a bare trailing pipe like 'c|' is invalid, statsd.rs:120-148)
    ty_part = F.substring_index(tyrate, "@", 1)
    has_rate = tyrate.contains("@")
    ty = F.when(
        has_rate & ty_part.endswith("|"),
        F.substring(ty_part, 1, F.length(ty_part) - 1),
    ).otherwise(ty_part)
    rate_str = F.when(has_rate, F.substring(tyrate, F.length(ty_part) + 2, F.lit(1 << 30)))

    raw_val = val_str.try_cast("double")
    rate = rate_str.try_cast("double")
    valid = (
        (F.length(name) > 0)
        & (F.length(val_str) > 0)
        & raw_val.isNotNull()
        & ty.isin("c", "g", "ms", "h")
        & (~has_rate | (rate.isNotNull() & (F.length(rate_str) > 0)))
    )
    signed = F.substring(val_str, 1, 1).isin("+", "-")
    value = F.when(has_rate, raw_val * (F.lit(1.0) / rate)).otherwise(raw_val)

    kind = (
        F.when(ty == "c", F.lit(KIND_SUM))
        .when((ty == "g") & signed, F.lit(KIND_SUM))
        .when(ty == "g", F.lit(KIND_SET))
        .otherwise(F.lit(KIND_SUMMARIZE))
    )
    persist = ty == "g"

    return [
        F.when(valid, name).alias("name"),
        F.when(valid, value).alias("value"),
        F.when(valid, kind).alias("kind"),
        F.when(valid, persist).otherwise(F.lit(None).cast("boolean")).alias("persist"),
        valid.alias("is_valid"),
    ]


def mask_bounds_expr(masks: DataFrame, name_col: str = "name") -> Column:
    """First-match-wins name→bounds CASE chain compiled from the tiny mask
    rules table (collected driver-side): a pure codegen'd expression — no
    join/window/shuffle on the fact table. The reference scans masks
    linearly per metric the same way (statsd.rs:105-115)."""
    rules = sorted(
        masks.select("mask", "bounds", "priority").collect(),
        key=lambda r: r["priority"],
    )
    expr = F.lit(None).cast("array<double>")
    for r in reversed(rules):
        expr = F.when(
            F.col(name_col).rlike(r["mask"]),
            F.array(*[F.lit(float(b)) for b in r["bounds"]]),
        ).otherwise(expr)
    return expr


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
        bounds_expr = F.when(
            F.col("kind") == KIND_SUMMARIZE, mask_bounds_expr(masks)
        )
        out = out.withColumn("bounds", bounds_expr).withColumn(
            "kind",
            F.when(F.col("bounds").isNotNull(), F.lit(KIND_HISTOGRAM)).otherwise(
                F.col("kind")
            ),
        )
    return out
