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


def _final_plan_collected(df) -> str:
    """AQE-final plan of the SAME DataFrame — a noop write finalizes a
    DIFFERENT QueryExecution and reads back isFinalPlan=false."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the adaptive toString appends an "== Initial Plan ==" section that
    # would double-count every node
    return plan.split("== Initial Plan ==")[0]


def test_posting_lists_two_exchanges_mapside_combine(spark):
    """Posting-list build, AQE final plan: exactly ONE wide exchange —
    ENSURE_REQUIREMENTS collapses the (token, doc) tf exchange into the
    window's token exchange (every (token, doc) pair is born co-located
    since explode never splits a document row); tf still combines
    map-side; the final token aggregate reuses the window partitioning
    (subset rule), never adding another shuffle."""
    from cernan_spark.operators.corpus import posting_lists

    plan = _final_plan_collected(posting_lists(_docs(spark)))
    assert _count(plan, r"Exchange hashpartitioning") == 1
    assert _count(plan, r"hashpartitioning\(tok") == 1
    assert _count(plan, r"partial") >= 1  # map-side combine
    assert _count(plan, r"CartesianProduct") == 0


def test_pagerank_iteration_plan_shape(spark):
    """PageRank: earlier iterations are checkpointed (lineage would
    otherwise double per round), so the final plan is exactly ONE
    iteration: the dangling-mass attachment is the single broadcast
    one-row nested-loop join, the edge/inflow joins are hash joins,
    and there is no all-pairs step anywhere."""
    from cernan_spark.operators.graph import pagerank

    edges = spark.range(200).select(
        F.concat(F.lit("s"), (F.col("id") % 23).cast("string")).alias("src"),
        F.concat(F.lit("s"), ((F.col("id") * 7 + 3) % 29).cast("string")).alias(
            "dst"
        ),
    )
    plan = _final_plan_collected(pagerank(edges, iters=3))
    assert _count(plan, r"CartesianProduct") == 0
    assert _count(plan, r"BroadcastNestedLoopJoin") == 1
    assert (
        _count(plan, r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin") >= 2
    )


def test_triangle_counts_plan_no_cartesian(spark):
    """Triangle enumeration must stay equi-join shaped: the wedge and
    closing joins hash on (b) and (a, c) — no CartesianProduct, no
    nested loop over the edge set."""
    from cernan_spark.operators.graph import triangle_counts

    edges = spark.range(300).select(
        (F.col("id") % 23).alias("src"), (F.col("id") % 29).alias("dst")
    )
    plan = _final_plan(triangle_counts(edges))
    assert _count(plan, r"CartesianProduct") == 0
    assert _count(plan, r"BroadcastNestedLoopJoin") == 0


def test_bradley_terry_final_plan_is_one_iteration(spark):
    """Earlier MM iterations are checkpointed, so the executed plan
    holds ONE iteration's joins plus the strength normalization — a
    single one-row broadcast NLJ (the total fold), zero cartesian."""
    from cernan_spark.operators.graph import bradley_terry

    comps = spark.range(400).select(
        F.concat(F.lit("i"), (F.col("id") % 5).cast("string")).alias(
            "winner"
        ),
        F.concat(F.lit("i"), ((F.col("id") + 1 + F.col("id") % 3) % 5)
                 .cast("string")).alias("loser"),
    ).filter(F.col("winner") != F.col("loser"))
    plan = _final_plan(bradley_terry(comps, iters=3))
    assert _count(plan, r"CartesianProduct") == 0
    assert _count(plan, r"BroadcastNestedLoopJoin") == 1


def test_silhouette_centroids_broadcast_not_shuffled(spark):
    """The k×dim centroid table must reach every point by BROADCAST
    (one-row-per-cluster dimension table); the point side is never
    shuffled for the distance map."""
    from cernan_spark.operators.similarity import simplified_silhouette

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (j + 2)).cast("float") for j in range(8)])
         .alias("embedding"),
        (F.col("id") % 4).cast("int").alias("label"),
    )
    plan = _final_plan(simplified_silhouette(emb))
    assert _count(plan, r"BroadcastNestedLoopJoin") >= 1  # k-row cross
    assert _count(plan, r"CartesianProduct") == 0


def test_mann_whitney_rank_spine_is_distinct_grain(spark):
    """The rank pass aggregates per DISTINCT value before the single
    cumulative window — the shuffle carries the value spine, not the
    raw rows (verify: exactly one window, partial aggregation
    present)."""
    from cernan_spark.operators.rankstats import mann_whitney

    df = spark.range(5000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        (F.col("id") % 37).alias("v"),
    )
    plan = _final_plan(mann_whitney(df, "g", "v", "a", "b"))
    assert _count(plan, r"Window") == 1
    assert _count(plan, r"partial") >= 1
    assert _count(plan, r"CartesianProduct") == 0
