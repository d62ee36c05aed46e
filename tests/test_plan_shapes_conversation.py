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
