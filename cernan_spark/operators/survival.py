"""Survival analysis over routed event streams: the Kaplan–Meier
product-limit estimator with right censoring, plus the Nelson–Aalen
cumulative hazard — the time-to-conversion / time-to-failure curve an
ops dashboard draws from the same per-user lifetimes a telemetry
pipeline already derives (cernan's analog surface: the per-sink
aggregate counts its wavefront/prometheus sinks feed to alerting,
`/root/reference/src/sink/wavefront.rs:143-210` — this closes the loop
from shipped aggregates to the reliability statistic read off them).

Float discipline (repo law): deaths, censorings and the at-risk counts
are exact BIGINTs; the at-risk count comes from an INTEGER running sum
(exact under any fold order); the only doubles are the per-step hazard
ratios ``d_i / n_i`` and the survival product — both folded LEFT over
the time-ordered step list via ``F.aggregate`` so DuckDB's
``list_reduce`` replays them bit-for-bit. One ``round(·, 6)`` at emit.

Scale: the lifetime frame aggregates to ONE row per distinct duration
(bounded by the observation window in days — dozens to hundreds of
rows at any corpus size), so the single-task window + collected step
list never grows with input rows. The per-user lifetime derivation
upstream is ordinary map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(lifetimes: DataFrame, t_col: str, event_col: str) -> DataFrame:
    """Product-limit survival curve from one row per subject.

    ``lifetimes`` carries ``t_col`` (integer duration, e.g. days) and
    ``event_col`` (boolean: True = the event fired at t, False = the
    subject was right-censored at t). Returns one row per distinct
    duration with ``t, n_risk, n_event, n_censored, survival,
    cum_hazard``.

    Conventions (documented so the oracle is a twin, not a hope):
    subjects censored at t are still at risk for deaths at t (deaths
    process first on ties); censoring never reduces the survival
    estimate; ``cum_hazard`` is Nelson–Aalen ``Σ d_i/n_i`` over steps
    with at least one death or censoring (the step grid is every
    distinct observed duration).
    """
    steps = (
        lifetimes.select(
            F.col(t_col).cast("long").alias("t"),
            F.col(event_col).cast("boolean").alias("ev"),
        )
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("ev"), 1).otherwise(0))
            .cast("long")
            .alias("d"),
            F.sum(F.when(F.col("ev"), 0).otherwise(1))
            .cast("long")
            .alias("c"),
        )
    )
    # at-risk n_t = N - (deaths+censorings strictly before t): an
    # INTEGER running sum — exact in both engines under any fold order.
    # The frame is duration-grained (bounded), so one task is fine.
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    total = lifetimes.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    risked = steps.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0))
        ).alias("n"),
    )
    # collect the bounded step list once; per-step survival/hazard are
    # LEFT folds over the time-ordered prefix (F.aggregate ≡ list_reduce).
    arr = risked.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("t", "n", "d", "c"))).alias("arr")
    )
    ex = arr.select(F.posexplode("arr").alias("k0", "s"), F.col("arr"))
    pref = F.slice(F.col("arr"), F.lit(1), F.col("k0") + F.lit(1))
    surv = F.aggregate(
        F.transform(pref, lambda s: (s["n"] - s["d"]) / s["n"]),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    haz = F.aggregate(
        F.transform(pref, lambda s: s["d"] / s["n"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return ex.select(
        F.col("s.t").alias("t"),
        F.col("s.n").alias("n_risk"),
        F.col("s.d").alias("n_event"),
        F.col("s.c").alias("n_censored"),
        F.round(surv, 6).alias("survival"),
        F.round(haz, 6).alias("cum_hazard"),
    )
