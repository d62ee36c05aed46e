"""Batch: pivot matrix, RANGE-frame peak load, chi-square cells, and the
bucketed-table co-located join (the zero-shuffle join strategy)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cernan_spark.operators.temporal import peak_range_load


def test_peak_range_load_time_frame_not_rows(spark):
    """Three events inside one 2 h span peak together; a far-away event
    does not join the frame even though it is the adjacent ROW."""
    df = spark.createDataFrame(
        [("m", 0, 10), ("m", 3600, 20), ("m", 7199, 30), ("m", 100_000, 5)],
        "k string, e long, v long",
    )
    r = peak_range_load(df, ["k"], "e", "v", range_s=7200).collect()[0]
    assert r.peak_load == 60  # 10+20+30 share a window; 5 is alone
    assert r.n_rows == 4


def test_peak_range_load_includes_ts_peers(spark):
    """RANGE frames include equal-timestamp peers on both engines."""
    df = spark.createDataFrame(
        [("m", 100, 1), ("m", 100, 2), ("m", 100, 4)],
        "k string, e long, v long",
    )
    r = peak_range_load(df, ["k"], "e", "v", range_s=10).collect()[0]
    assert r.peak_load == 7


def test_chi2_cells_independence_is_zero(spark):
    """A perfectly independent table has contrib 0 in every cell."""
    rows = [(t, h) for t in ("a", "b") for h in (0, 1) for _ in range(10)]
    df = spark.createDataFrame(rows, "t string, h int")
    cells = df.groupBy("t", "h").agg(F.count(F.lit(1)).alias("o"))
    from pyspark.sql import Window as W

    od = F.col("o").cast("double")
    rd = F.sum("o").over(W.partitionBy("t")).cast("double")
    cd = F.sum("o").over(W.partitionBy("h")).cast("double")
    nd = F.sum("o").over(W.partitionBy()).cast("double")
    num = od * nd - rd * cd
    out = cells.select((num * num / (nd * rd * cd)).alias("contrib")).collect()
    assert all(r.contrib == 0.0 for r in out)


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key co-locate: the sort-merge join
    runs with ZERO Exchange operators — the pre-shuffled layout a 100 TB
    fact↔fact join relies on (bucket both sides once at write time, join
    free forever). Guard the whole plan, not just the join node."""
    spark.sql("DROP TABLE IF EXISTS bj_left")
    spark.sql("DROP TABLE IF EXISTS bj_right")
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("x")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("y")
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bj_left")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bj_right")
    joined = (
        spark.table("bj_left")
        .hint("merge")  # force SMJ so the test pins the bucketed path,
        .join(spark.table("bj_right"), "k")  # not a broadcast fallback
        .groupBy()
        .agg(F.sum(F.col("x") * F.col("y")).alias("s"))
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(k" not in plan
    # cleanup so reruns start clean
    spark.sql("DROP TABLE IF EXISTS bj_left")
    spark.sql("DROP TABLE IF EXISTS bj_right")
