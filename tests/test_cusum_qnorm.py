"""Batch: CUSUM alarms, rank (quantile) normalization, seasonal-naive
forecast error, join-skew report."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernan_spark.operators.anomaly import cusum_alarms, seasonal_naive_error
from cernan_spark.operators.corpus import rank_normalize
from cernan_spark.operators.skew import skew_report


def test_cusum_accumulates_and_resets(spark):
    # k=10, h=2k=20: values 15,15,25 → S = 5, 10, 25>20 → alarm+reset;
    # then 5 → S stays 0
    rows = [("m", 0, h, x, 10) for h, x in enumerate([15, 15, 25, 5])]
    df = spark.createDataFrame(rows, "key string, day long, hour int, x long, k long")
    r = cusum_alarms(df, ["key", "day"], "hour", "x", "k", h_mult=2).collect()[0]
    assert (r.n_points, r.n_alarms, r.max_s) == (4, 1, 25)


def test_cusum_no_alarm_below_threshold(spark):
    rows = [("m", 0, h, 11, 10) for h in range(5)]  # drips +1, S max 5 < 20
    df = spark.createDataFrame(rows, "key string, day long, hour int, x long, k long")
    r = cusum_alarms(df, ["key", "day"], "hour", "x", "k", h_mult=2).collect()[0]
    assert (r.n_alarms, r.max_s) == (0, 5)


def test_rank_normalize_min_rank_ties(spark):
    # values 10,20,20,30 in one partition: rank_before = 0,1,1,3; N=4
    df = spark.createDataFrame(
        [("p", "a", 10), ("p", "a", 20), ("p", "b", 20), ("p", "b", 30)],
        "part string, grp string, v long",
    )
    got = {r.grp: r for r in rank_normalize(df, ["part"], "v", ["grp"]).collect()}
    assert got["a"].mean_q == (0 + 1) / (3 * 2)   # (0+1)/((4-1)*2)
    assert got["b"].mean_q == (1 + 3) / (3 * 2)


def test_seasonal_naive_error_lags_same_slot(spark):
    df = spark.createDataFrame(
        [("m", 0, 9, 100), ("m", 1, 9, 130), ("m", 2, 9, 120), ("m", 0, 10, 50)],
        "key string, day long, hour int, x long",
    )
    r = seasonal_naive_error(df, ["key"], "day", "hour", "x").collect()[0]
    # pairs: (130-100)=30, (120-130)=10 — hour 10 has no prior day
    assert (r.n_pairs, r.mae, r.max_err) == (2, 20.0, 30)


def test_skew_report_salt_ceiling(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, "hot").otherwise("cold").alias("k")
    )
    got = {r.k: r for r in skew_report(df, ["k"], 100).collect()}
    assert (got["hot"].n, got["hot"].salt_factor, got["hot"].ppm) == (900, 9, 900000)
    assert (got["cold"].n, got["cold"].salt_factor) == (100, 1)


def test_rank_normalize_plan_broadcasts_histogram(spark):
    """The histogram side must come back as a broadcast, not a shuffled
    join, and only two hash exchanges may touch the frame (histogram agg
    + final group agg)."""
    import re

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 50).alias("v"),
    )
    out = rank_normalize(df, ["p"], "v", ["g"])
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"BroadcastHashJoin", plan)) == 1
    assert len(re.findall(r"SortMergeJoin", plan)) == 0
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
