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


def logrank_test(
    lifetimes: DataFrame,
    t_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Two-sample log-rank test (Mantel–Cox) between the survival
    curves of two cohorts — "did cohort A start purchasing faster than
    cohort B", the hypothesis-test layer over :func:`kaplan_meier`
    (which only draws the curves). At each distinct EVENT time t:

        E1_t = d_t · n1_t / n_t
        V_t  = d_t · (n1_t/n_t) · (1 − n1_t/n_t) · (n_t − d_t)/(n_t − 1)

    and χ² = (Σ(d1_t − E1_t))² / ΣV_t with df = 1.

    Float discipline: at-risk and event counts are exact BIGINTs from
    one rollup + descending cumulative windows (the kaplan_meier
    shape); each E1_t/V_t is a fixed chain of products and divisions of
    those integers; both Σ are LEFT folds over the time-sorted term
    list. Ties (events in both groups at one t) follow the standard
    pooled-d_t treatment.

    Output one row: ``n1, n2, events1, events2, o_minus_e, var_sum,
    chi2`` (round 6; χ² NULL when ΣV = 0).
    """
    base = lifetimes.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(event_col).cast("boolean").alias("ev"),
        (F.col(group_col).cast("long") == 1).alias("g1"),
    )
    rollup = base.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum(F.col("g1").cast("long")).alias("c_1"),
        F.sum(F.col("ev").cast("long")).alias("d_all"),
        F.sum((F.col("ev") & F.col("g1")).cast("long")).alias("d_1"),
    )
    wdesc = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = rollup.select(
        "t",
        "d_all",
        "d_1",
        F.sum("c_all").over(wdesc).alias("n_t"),
        F.sum("c_1").over(wdesc).alias("n1_t"),
    ).filter((F.col("d_all") > 0) & (F.col("n_t") > 1))
    p1 = F.col("n1_t").cast("double") / F.col("n_t").cast("double")
    terms = at_risk.select(
        "t",
        "d_1",
        (F.col("d_1").cast("double") - F.col("d_all").cast("double") * p1).alias(
            "ome"
        ),
        (
            F.col("d_all").cast("double")
            * p1
            * (F.lit(1.0) - p1)
            * (
                (F.col("n_t") - F.col("d_all")).cast("double")
                / (F.col("n_t") - 1).cast("double")
            )
        ).alias("v"),
    )
    folded = terms.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("t", "ome"))),
            F.lit(0.0),
            lambda acc, x: acc + x["ome"],
        ).alias("o_minus_e"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("t", "v"))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("var_sum"),
    )
    counts = base.agg(
        F.sum(F.col("g1").cast("long")).alias("n1"),
        F.sum((~F.col("g1")).cast("long")).alias("n2"),
        F.sum((F.col("ev") & F.col("g1")).cast("long")).alias("events1"),
        F.sum((F.col("ev") & ~F.col("g1")).cast("long")).alias("events2"),
    )
    return counts.crossJoin(F.broadcast(folded)).select(
        "n1",
        "n2",
        "events1",
        "events2",
        F.round("o_minus_e", 6).alias("o_minus_e"),
        F.round("var_sum", 6).alias("var_sum"),
        F.round(
            F.when(
                F.col("var_sum") != 0.0,
                F.col("o_minus_e") * F.col("o_minus_e") / F.col("var_sum"),
            ),
            6,
        ).alias("chi2"),
    )
