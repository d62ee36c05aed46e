"""Plan-shape guards for the round-5 conversation/corpus-assembly ops:
the scale properties (single wide shuffle, broadcast offsets, no global
sort of the fact table) must survive refactors."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, pattern: str) -> int:
    return len(re.findall(pattern, plan))


def test_pack_plan_one_wide_shuffle_broadcast_offsets(spark):
    """pack_concat_chop: the corpus shuffles ONCE (to the per-bucket
    window); the bucket-offsets table joins back as a broadcast. A
    SortMergeJoin or a second corpus-sized hash exchange is the
    regression that serializes packing at 100 TB."""
    from cernan_spark.operators.conversation import pack_concat_chop

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = _plan(pack_concat_chop(docs, 64, chunk_width=128))
    assert _count(plan, r"BroadcastExchange") == 1
    assert _count(plan, r"SortMergeJoin") == 0
    # wide data moves once; the remaining exchanges carry only the tiny
    # bucket-totals frame (aggregate + its single-partition prefix window)
    assert _count(plan, r"Exchange hashpartitioning") <= 3


def test_priority_sample_no_global_sort_of_corpus(spark):
    """priority_sample: the only global sort is the TakeOrderedAndProject
    over the ≤ n_buckets×k survivors — a full-width Sort+Exchange
    rangepartitioning over the corpus is the regression."""
    from cernan_spark.operators.conversation import priority_sample

    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("w")
    )
    plan = _plan(priority_sample(docs, 100, "w", n_buckets=16))
    assert _count(plan, r"TakeOrderedAndProject") == 1
    assert _count(plan, r"Exchange rangepartitioning") == 0
    # one hash exchange: the per-bucket rank window
    assert _count(plan, r"Exchange hashpartitioning") == 1


def test_turn_dedup_single_exchange(spark):
    """dedup_consecutive_turns: the lag window and the re-densify window
    share the conv_id partitioning — exactly one exchange end-to-end."""
    from cernan_spark.operators.conversation import dedup_consecutive_turns

    t = spark.range(1000).select(
        (F.col("id") % 50).cast("string").alias("conv_id"),
        (F.col("id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("text"),
        F.lit("none").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    plan = _plan(dedup_consecutive_turns(t))
    assert _count(plan, r"Exchange hashpartitioning") == 1


def test_tail_trim_single_exchange(spark):
    """trim_to_tail_budget: one window does the reverse count and the
    cut — one exchange, no join."""
    from cernan_spark.operators.conversation import trim_to_tail_budget

    t = spark.range(1000).select(
        (F.col("id") % 50).cast("string").alias("conv_id"),
        (F.col("id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("a b c").alias("text"),
        F.lit("none").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    plan = _plan(trim_to_tail_budget(t, 10))
    assert _count(plan, r"Exchange hashpartitioning") == 1
    assert _count(plan, r"Join") == 0


def test_hopping_and_centroids_single_exchange(spark):
    """hopping_sums and label_centroids: ONE corpus exchange each, with a
    map-side partial aggregate in front of it."""
    from cernan_spark.operators.aggregate import hopping_sums
    from cernan_spark.operators.similarity import label_centroids

    tele = spark.range(1000).select(
        F.lit("m").alias("name"), F.lit("SUM").alias("kind"),
        F.col("id").cast("double").alias("value"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id"))).alias("ts"),
    )
    p = _plan(hopping_sums(tele))
    assert _count(p, r"Exchange hashpartitioning") == 1
    assert _count(p, r"partial") >= 1

    emb = spark.range(100).select(
        (F.col("id") % 5).cast("int").alias("label"),
        F.array(*[F.rand(seed=1) for _ in range(8)]).cast(
            "array<float>"
        ).alias("embedding"),
    )
    p = _plan(label_centroids(emb, dim=8))
    assert _count(p, r"Exchange hashpartitioning") == 1
    assert _count(p, r"partial") >= 1


def test_countmin_two_scans_one_broadcast(spark):
    """countmin_estimates: the corpus is read exactly twice (counters +
    keys) and the d x width counter table joins back as ONE broadcast —
    per-hash-row join branches would re-scan the corpus d times."""
    from cernan_spark.operators.anomaly import countmin_estimates

    import tempfile

    d = tempfile.mkdtemp(prefix="cm_plan_")
    spark.range(5000).select(F.pmod(F.col("id"), 97).alias("kh")).write.mode(
        "overwrite"
    ).parquet(d)
    df = spark.read.parquet(d)
    p = _plan(countmin_estimates(df, "kh"))
    assert _count(p, r"FileScan") == 2
    assert _count(p, r"BroadcastExchange") == 1
    assert _count(p, r"SortMergeJoin") == 0
