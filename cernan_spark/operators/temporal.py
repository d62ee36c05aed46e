"""Temporal joins and counter semantics.

Two operator families the reference implies but never names:

* **As-of (point-in-time) join** — cernan reloads its routing/filter
  config on SIGHUP and every line is routed under the config version in
  force when it arrived (`/root/reference/src/lib.rs` config-reload path;
  the programmable-filter topology is rebuilt per reload). In a batch
  rebuild over history that is exactly an as-of join: each turn joins the
  latest config version with ``valid_from <= ts``. Spark has no ASOF
  relation, so two strategies are provided and proven equal:

  - :func:`asof_join_broadcast` — the dimension side is tiny (config
    versions), so pack each key's versions into one sorted array, broadcast
    that, equi-join on the key alone, and pick the as-of version with a
    sorted-array ``filter`` + ``element_at(-1)``. No shuffle and no row
    multiplication of the fact side at all. This is the 100 TB plan when
    the right side fits in a broadcast (config tables always do).
  - :func:`asof_join_union` — the general two-big-sides form: union-tag
    both sides, ONE shuffle on the join key, and carry the latest right
    row forward with ``last(..., ignorenulls=True)`` over
    ``(key, ts, side)``. Hot keys chunk the same way the gauge fold does
    (operators/aggregate.py segmented scan); the config use case never
    needs it, so chunking is not wired here.

* **Counter increase / reset detection** — prometheus counters are
  cumulative and wrap on process restart; ``increase()`` semantics say a
  drop in the raw series is a restart and the post-reset value is the
  increase (the sink-side mirror of cernan's perpetual SUM accumulators,
  `/root/reference/src/sink/prometheus.rs:279-310`, which only ever add).
  :func:`counter_increase` recovers per-sample deltas from a sampled
  cumulative series: ``lag`` per series, negative delta → reset.

Both are pure column expressions over built-in window/aggregate
functions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Point-in-time join with a broadcast-sized right side.

    For each left row, attach ``payload_cols`` from the right row with the
    greatest ``right_ts <= left_ts`` for the same key. Left rows with no
    eligible right row keep NULL payloads (left join).

    Plan shape: the right side collapses to ONE row per key holding a
    sorted ``array<struct<ts, payload...>>`` of its versions (a trivial
    aggregate over the dimension), which broadcasts; the fact side then
    does a plain BroadcastHashJoin on the key and picks the version with
    ``element_at(filter(versions, v -> v.ts <= left_ts), -1)`` — the
    array is sorted, so the last surviving element IS the as-of row.
    ``sort_array`` orders the struct lexicographically, so duplicate
    version timestamps deterministically resolve to the max payload. The
    fact side is never shuffled and never multiplied: at 100 TB this is
    pure scan-local work, strictly better than a range-predicate join
    that fans each left row out to every eligible version first.
    """
    lcols = left.columns
    versions = right.groupBy(*key_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(right_ts).alias("__ts"),
                    *[F.col(c) for c in payload_cols],
                )
            )
        ).alias("__versions")
    )
    joined = left.join(F.broadcast(versions), key_cols, "left")
    lts = F.col(left_ts)
    # try_element_at: the filtered array is EMPTY for left rows older than
    # the first version (and for keys with no versions at all) — plain
    # element_at raises under ANSI mode; NULL is the wanted left-join value.
    pick = F.try_element_at(
        F.filter("__versions", lambda v: v["__ts"] <= lts), F.lit(-1)
    )
    return joined.select(
        *lcols, *[pick[c].alias(c) for c in payload_cols]
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """General as-of join: both sides large, ONE shuffle on the key.

    Union-tag the two sides, sort within each key by
    ``(ts, side)`` — right rows sort BEFORE left rows at the same
    timestamp so ``valid_from == ts`` is inclusive, matching
    :func:`asof_join_broadcast` and DuckDB ``ASOF JOIN`` (``>=``) — and
    carry the latest right payload forward with ``last(ignorenulls)``.
    Rows-preserving for the left side; right rows are dropped after the
    carry. Equality with the broadcast form is pinned in
    tests/test_temporal.py.
    """
    lcols = left.columns
    # Duplicate right timestamps per key: keep the max payload, mirroring
    # the broadcast form's struct tie-break.
    r_dedup = right.groupBy(*key_cols, F.col(right_ts).alias("__ts")).agg(
        F.max(F.struct(*payload_cols)).alias("__payload")
    )
    l_tag = left.select(
        *[F.col(k) for k in key_cols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__row"),
        F.lit(None).cast(r_dedup.schema["__payload"].dataType).alias("__payload"),
    )
    r_tag = r_dedup.select(
        *[F.col(k) for k in key_cols],
        "__ts",
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
        "__payload",
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "__state", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__row.{c}").alias(c) for c in lcols],
        *[F.col(f"__state.{c}").alias(c) for c in payload_cols],
    )


def counter_increase(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-sample ``increase()`` over a sampled cumulative counter series.

    Adds three columns: ``prev_value`` (lag within the series),
    ``is_reset`` (value dropped → the process restarted and the counter
    re-started from zero), and ``increase`` — the prometheus rule:

    * first sample of a series → increase ``value`` (counter born at 0),
    * monotonic step → ``value - prev_value``,
    * reset → ``value`` (everything since the restart).

    One window shuffle keyed on the series; a hot series chunks the same
    way sessionize does (operators/skew.sessionize_chunked) — not wired
    here because scrape series are bounded by scrape interval × retention.
    """
    w = Window.partitionBy(*series_cols).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    reset = F.when(prev.isNull(), F.lit(False)).otherwise(F.col(value_col) < prev)
    inc = (
        F.when(prev.isNull(), F.col(value_col))
        .when(F.col(value_col) < prev, F.col(value_col))
        .otherwise(F.col(value_col) - prev)
    )
    return (
        df.withColumn("prev_value", prev)
        .withColumn("is_reset", reset)
        .withColumn("increase", inc)
    )
