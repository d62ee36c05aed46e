"""Physical-plan shape guards for the round-5 training-example layer:
the 100 TB properties each operator was designed around (benchmark side
broadcasts, bounded exchange counts, single Arrow fold) must survive
refactors. Structural facts about the EXECUTED plan, not timings."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    """Plan AFTER execution — under AQE join strategies are only fixed
    once the adaptive plan finalizes."""
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, pattern: str) -> int:
    return len(re.findall(pattern, plan))


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), (F.col("id") % (j + 2)).cast("string"))
                for j in range(12)
            ],
        ).alias("text"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.lit(50).cast("long").alias("n_chars"),
    )


def test_decontam_spans_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — a shuffled join here
    reshuffles the full corpus against a tiny benchmark table."""
    from cernan_spark.operators.textstats import decontam_token_spans

    d = _docs(spark)
    plan = _final_plan(
        decontam_token_spans(d.filter("doc_id >= 5"), d.filter("doc_id < 5"))
    )
    assert _count(plan, r"BroadcastHashJoin") >= 1
    assert _count(plan, r"SortMergeJoin|ShuffledHashJoin") == 0


def test_exact_substr_two_wide_exchanges(spark):
    """ExactSubstr spans: ONE gram-grain exchange + ONE doc-grain
    exchange (the island window); the (id, island) and final per-doc
    aggregates must REUSE the window's doc partitioning, not add
    exchanges of the position frame."""
    from cernan_spark.operators.dedup import exact_substr_spans

    plan = _final_plan(exact_substr_spans(_docs(spark), gram_len=8))
    assert _count(plan, r"Exchange hashpartitioning") == 2


def test_pack_sft_single_arrow_fold_bounded_exchanges(spark):
    """SFT packing: exactly ONE Arrow fold (the per-shard greedy pack);
    no join anywhere; the offset window reuses the shard partitioning."""
    from cernan_spark.operators.conversation import pack_sft_examples

    t = spark.range(40).select(
        F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.lit("some answer text").alias("text"),
        F.lit("none").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    plan = _final_plan(pack_sft_examples(t, bin_chars=100, n_shards=4))
    assert _count(plan, r"FlatMapGroupsInPandas") == 1
    assert _count(plan, r"Join") == 0
    # render conv agg + shard regroup (+ nothing else wide)
    assert _count(plan, r"Exchange hashpartitioning") <= 3


def test_distinct_ngrams_two_exchanges_no_join(spark):
    """Diversity profile: gram-grain aggregate + (group, n)-grain rollup
    — two exchanges total, map-side combine before each."""
    from cernan_spark.operators.corpus import distinct_ngram_profile

    plan = _final_plan(distinct_ngram_profile(_docs(spark)))
    assert _count(plan, r"Exchange hashpartitioning") == 2
    assert _count(plan, r"Join") == 0
    # partial + final pairs for both aggregates (map-side combine alive)
    assert _count(plan, r"HashAggregate") >= 4


def test_js_divergence_totals_broadcast_never_shuffle(spark):
    """JSD drift: the 1-row totals frame comes back as a broadcast
    nested-loop (crossJoin of a scalar), and the vocabulary only
    shuffles on (tok) then (bucket) — never joins wide-to-wide."""
    from cernan_spark.operators.corpus import js_divergence_drift

    plan = _final_plan(js_divergence_drift(_docs(spark)))
    assert _count(plan, r"BroadcastNestedLoopJoin") == 1
    assert _count(plan, r"SortMergeJoin|ShuffledHashJoin") == 0
