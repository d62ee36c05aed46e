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


def _slice_exprs(line: Column) -> tuple[Column, Column, Column]:
    """(name, val_str, tyrate) via position arithmetic — the reference's
    find(':')/find('|') scan (statsd.rs:553-573), cheap string ops only:

    * name   = chars before the FIRST ':' ('' when absent / line starts ':')
    * val_str= chars between the first ':' and the FIRST '|' after it
    * tyrate = everything after that '|'
    """
    colon = F.instr(line, ":")
    name = F.when(colon > 0, line.substr(F.lit(1), colon - 1)).otherwise(
        F.lit("")
    )
    rest = F.when(colon > 0, line.substr(colon + 1, F.length(line))).otherwise(
        F.lit("")
    )
    pipe = F.instr(rest, "|")
    val_str = F.when(pipe > 0, rest.substr(F.lit(1), pipe - 1)).otherwise(
        F.lit("")
    )
    tyrate = F.when(pipe > 0, rest.substr(pipe + 1, F.length(rest))).otherwise(
        F.lit("")
    )
    return name, val_str, tyrate


def _outputs_from_slices(
    name: Column, val_str: Column, tyrate: Column
) -> list[Column]:
    """(name, value, kind, persist, is_valid) from the three raw slices.
    Numeric validity stays on ``try_cast`` (NOT a number-shaped regex) so
    values like ``' 1.5 '``, ``'NaN'``, ``'inf'`` keep the exact cast
    semantics the golden/model tests and the DuckDB oracles pin."""
    # 'c|@0.2' and 'c@0.2' both → ty 'c' (pipe stripped only in the rate
    # form — a bare trailing pipe like 'c|' is invalid, statsd.rs:120-148)
    ty_part = F.substring_index(tyrate, "@", 1)
    has_rate = tyrate.contains("@")
    ty = F.when(
        has_rate & ty_part.endswith("|"),
        F.substring(ty_part, 1, F.length(ty_part) - 1),
    ).otherwise(ty_part)
    rate_str = F.when(
        has_rate, F.substring(tyrate, F.length(ty_part) + 2, F.lit(1 << 30))
    )

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
    # rate 0 → ×(1/0.0) = +inf in the reference's f64 arithmetic
    # (statsd.rs:66-116); under ANSI a plain division would CRASH the job
    # on one '@0' line, so the zero case is branched around explicitly
    inv_rate = F.when(rate == 0, F.lit(float("inf"))).otherwise(
        F.lit(1.0) / rate
    )
    value = F.when(has_rate, raw_val * inv_rate).otherwise(raw_val)

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


def statsd_parse_columns(line: Column) -> list[Column]:
    """Columns (name, value, kind, persist, is_valid) parsed from one line,
    mirroring the reference's find(':')/find('|')/find('@') scan.

    NOTE on expression blowup: every output column re-derives the slices
    (conditional branches are skipped by codegen subexpression
    elimination), so embedding ALL FIVE outputs in a wide fused stage can
    exceed janino's 64 KB method limit and silently fall back to
    interpreted execution. Single-column consumers (classify) are fine
    with this form; multi-column consumers should go through
    :func:`parse_statsd_lines`, which materializes the slices ONCE per
    row behind a Generate barrier.
    """
    return _outputs_from_slices(*_slice_exprs(line))


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

    The three raw slices materialize ONCE per row behind a single-element
    ``explode`` (a Generate node): CollapseProject cannot inline the
    consumer projection through it, so the five outputs read cheap struct
    fields instead of each re-deriving the scan. This keeps the fused
    parse→aggregate codegen method far below janino's 64 KB limit (the
    nested form overflowed it and silently ran interpreted, 6.7× slower
    at 2M lines) AND evaluates the slicing exactly once per row (a regex
    re-slicing variant that stayed under the limit still re-matched per
    consumer column — measured 2× slower on the bucket aggregates than
    this form).
    """
    name, val_str, tyrate = _slice_exprs(F.col(line_col))
    sliced = df.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    name.alias("n"), val_str.alias("v"), tyrate.alias("t")
                )
            )
        ).alias("_sl"),
    )
    out = sliced.select(
        *df.columns,
        *_outputs_from_slices(
            F.col("_sl.n"), F.col("_sl.v"), F.col("_sl.t")
        ),
    )
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
