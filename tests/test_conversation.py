"""Conversation-level transcript operators: consecutive-turn dedup,
role transitions, tail trimming, context packing, priority sampling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cernan_spark.operators.conversation import (
    dedup_consecutive_turns,
    pack_concat_chop,
    priority_sample,
    role_transitions,
    trim_to_tail_budget,
)
from tests.conftest import rows_to_tuples

_TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def _transcript(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, "none", _TS) for (c, i, r, t) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_dedup_consecutive_turns_golden(spark):
    t = _transcript(
        spark,
        [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "user", "hi"),  # consecutive dup -> dropped
            ("c1", 2, "assistant", "yo"),
            ("c1", 3, "user", "hi"),  # same content, not adjacent -> kept
            ("c2", 0, "user", "hi"),  # other conv unaffected
        ],
    )
    out = rows_to_tuples(
        dedup_consecutive_turns(t), ["conv_id", "turn_idx", "orig_turn_idx", "role"]
    )
    assert out == [
        ("c1", 0, 0, "user"),
        ("c1", 1, 2, "assistant"),
        ("c1", 2, 3, "user"),
        ("c2", 0, 0, "user"),
    ]


def test_dedup_consecutive_turns_idempotent(spark):
    t = _transcript(
        spark,
        [("c1", i, "user" if i % 3 else "assistant", f"m{i // 2}") for i in range(20)],
    )
    once = dedup_consecutive_turns(t)
    twice = dedup_consecutive_turns(once.drop("orig_turn_idx"))
    assert twice.count() == once.count()


def test_role_transitions_golden(spark):
    t = _transcript(
        spark,
        [
            ("c1", 0, "user", "a"),
            ("c1", 1, "assistant", "b"),
            ("c2", 0, "user", "c"),
            ("c2", 1, "assistant", "d"),
            ("c2", 2, "user", "e"),
        ],
    )
    out = rows_to_tuples(
        role_transitions(t), ["role", "next_role", "n_adj", "n_convs"]
    )
    assert out == [
        ("assistant", "END", 1, 1),
        ("assistant", "user", 1, 1),
        ("user", "END", 1, 1),
        ("user", "assistant", 2, 2),
    ]


def test_trim_to_tail_budget_suffix_property(spark):
    # per-turn tokens: 1 + (turn_idx % 3); budget keeps a whole suffix
    t = _transcript(
        spark,
        [("c1", i, "user", "x" + " y" * (i % 3)) for i in range(10)]
        + [("c2", 0, "user", "lone")],
    )
    out = trim_to_tail_budget(t, budget=5)
    kept = rows_to_tuples(out, ["conv_id", "turn_idx"])
    # c1 tails: idx9 tokens=1, idx8 =3, idx7 =2 (cum 6 > 5) -> keep 9,8
    assert kept == [("c1", 8), ("c1", 9), ("c2", 0)]
    # suffix property: kept turn indices are contiguous to the max index
    mx = out.groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx"), F.count("*").alias("n"),
        F.min("turn_idx").alias("mn")
    )
    for r in mx.collect():
        assert r["mx"] - r["mn"] + 1 == r["n"]


def test_pack_chunk_width_invariance(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (i % 17 + 1)) for i in range(257)], "doc_id long, text string"
    )
    a = rows_to_tuples(
        pack_concat_chop(docs, 64, chunk_width=7),
        ["doc_id", "n_tokens", "start_offset", "first_bin", "n_bins"],
    )
    b = rows_to_tuples(
        pack_concat_chop(docs, 64, chunk_width=10**9),  # single bucket
        ["doc_id", "n_tokens", "start_offset", "first_bin", "n_bins"],
    )
    assert a == b
    # offsets are a proper prefix sum: sorted by doc_id, each start is the
    # previous start + previous n_tokens
    prev_end = 0
    for (_, n, start, first_bin, n_bins) in a:
        assert start == prev_end
        assert first_bin == start // 64
        assert n_bins == (start + n - 1) // 64 - start // 64 + 1
        prev_end = start + n


def test_priority_sample_bucket_invariance_and_nesting(spark):
    docs = spark.createDataFrame(
        [(i, (i * 37) % 101 + 1) for i in range(1000)], "doc_id long, w int"
    )
    a = rows_to_tuples(priority_sample(docs, 100, "w", n_buckets=1), ["doc_id"])
    b = rows_to_tuples(priority_sample(docs, 100, "w", n_buckets=64), ["doc_id"])
    assert a == b
    # priority order gives nested samples: top-50 is a subset of top-100
    small = set(
        r[0] for r in rows_to_tuples(priority_sample(docs, 50, "w"), ["doc_id"])
    )
    assert small <= set(r[0] for r in a)


def test_priority_sample_weight_monotone(spark):
    # identical u-stream, uniformly larger weights -> strictly larger
    # priorities, so a doc sampled under w is sampled under 2w when the
    # competing docs keep their weights (spot: doubling ALL weights keeps
    # the same sample -- scale invariance of top-k)
    docs = spark.createDataFrame(
        [(i, (i * 13) % 29 + 1) for i in range(500)], "doc_id long, w int"
    )
    doubled = docs.withColumn("w", F.col("w") * 2)
    a = rows_to_tuples(priority_sample(docs, 64, "w"), ["doc_id"])
    b = rows_to_tuples(priority_sample(doubled, 64, "w"), ["doc_id"])
    assert a == b


def test_thread_paths_small_tree(spark):
    from cernan_spark.operators.conversation import thread_paths

    #        0
    #       / \
    #      1   2
    #     / \
    #    3   4
    #    |
    #    5
    rows = [("c", 0, None), ("c", 1, 0), ("c", 2, 0), ("c", 3, 1),
            ("c", 4, 1), ("c", 5, 3), ("d", 0, None), ("d", 1, 0)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, parent_idx int"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["depth"], r["root_idx"])
        for r in thread_paths(df).collect()
    }
    assert got == {
        ("c", 0): (0, 0), ("c", 1): (1, 0), ("c", 2): (1, 0),
        ("c", 3): (2, 0), ("c", 4): (2, 0), ("c", 5): (3, 0),
        ("d", 0): (0, 0), ("d", 1): (1, 0),
    }


def test_thread_paths_deep_chain_converges_logarithmically(spark):
    from cernan_spark.operators.conversation import thread_paths

    # depth-40 chain: pointer doubling must resolve within ceil(log2(40))+1
    # rounds — max_iters=7 passes, a per-level walk would need 40
    rows = [("c", i, i - 1 if i else None) for i in range(41)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, parent_idx int"
    )
    got = {r["turn_idx"]: r["depth"] for r in thread_paths(df, max_iters=7).collect()}
    assert got == {i: i for i in range(41)}


def test_thread_paths_cycle_raises(spark):
    import pytest as _pytest

    from cernan_spark.operators.conversation import thread_paths

    df = spark.createDataFrame(
        [("c", 1, 2), ("c", 2, 1)],
        "conv_id string, turn_idx int, parent_idx int",
    )
    with _pytest.raises(ValueError, match="did not converge"):
        thread_paths(df, max_iters=3)


def test_json_schema_profile_counts_and_malformed(spark):
    from cernan_spark.functions.jsonlog import json_schema_profile

    df = spark.createDataFrame(
        [
            ("svc", '{"a": 1, "b": 2}'),
            ("svc", '{"a": 3}'),
            ("svc", "not json at all"),
            ("other", '{"z": 0}'),
        ],
        "service string, payload string",
    )
    out = json_schema_profile(df, "payload", ["service"])
    got = {
        (r["service"], r["key"]): (r["n_rows"], r["n_group"], r["presence"])
        for r in out.collect()
    }
    # the malformed row contributes to the denominator but yields no keys
    assert got == {
        ("svc", "a"): (2, 3, 2 / 3),
        ("svc", "b"): (1, 3, 1 / 3),
        ("other", "z"): (1, 1, 1.0),
    }


def test_preference_length_bias_hand_model(spark):
    """Two pairs in group g: (chosen longer by 100) and (chosen SHORTER,
    lengths 105 vs 100 -> close). Rates and deltas are hand-computable."""
    from cernan_spark.operators.conversation import preference_length_bias

    pairs = spark.createDataFrame(
        [("g", 1, 2), ("g", 3, 4)], "lang string, chosen long, rejected long"
    )
    lengths = spark.createDataFrame(
        [(1, 200), (2, 100), (3, 100), (4, 105)], "doc_id long, n_chars long"
    )
    row = preference_length_bias(
        pairs, lengths, group_col="lang", id_col="doc_id", len_col="n_chars"
    ).collect()[0]
    assert row["n_pairs"] == 2
    assert row["n_chosen_longer"] == 1
    assert row["chosen_longer_rate"] == 0.5
    # deltas: +100 and -5 -> avg 47.5
    assert row["avg_len_delta"] == 47.5
    # |100-200|*10 > 200 (not close); |100-105|*10=50 <= 105 (close)
    assert row["n_close"] == 1 and row["n_close_chosen_longer"] == 0


def test_turn_latency_hand_model(spark):
    """conv: user(grep)@0 -> assistant@7, user(read)@10 -> assistant@13,
    tool->assistant@20 ignored (prev not user). Delays: grep [7],
    read [3]."""
    import datetime as dt

    from cernan_spark.operators.conversation import turn_latency

    t0 = dt.datetime(2026, 1, 1)

    def row(idx, role, tool, sec):
        return ("c1", idx, role, f"t{idx}", tool, t0 + dt.timedelta(seconds=sec))

    df = spark.createDataFrame(
        [
            row(0, "user", "grep", 0),
            row(1, "assistant", "search", 7),
            row(2, "user", "read", 10),
            row(3, "assistant", "search", 13),
            row(4, "tool", "bash", 15),
            row(5, "assistant", "search", 20),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r["trigger_tool"]: (
            r["n_responses"], r["mean_delay_s"], r["p50_delay_s"], r["max_delay_s"]
        )
        for r in turn_latency(df).collect()
    }
    assert got == {"grep": (1, 7.0, 7, 7), "read": (1, 3.0, 3, 3)}


def test_user_behavior_profile_bot_vs_organic(spark):
    """A metronomic single-action user flags bot_like (entropy 0, CV 0);
    a user mixing types with irregular gaps does not."""
    import datetime as dt

    from cernan_spark.operators.behavior import user_behavior_profile

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (i, 1, "click", t0 + dt.timedelta(seconds=60 * i)) for i in range(25)
    ]
    organic_gaps = [5, 90, 30, 700, 12, 45, 3, 200, 77, 8, 130, 22, 9,
                    310, 40, 6, 55, 400, 18, 70, 25, 95, 11, 60]
    t = 0
    for i, g in enumerate(organic_gaps):
        t += g
        rows.append(
            (1000 + i, 2, ["click", "view", "purchase", "error"][i % 4],
             t0 + dt.timedelta(seconds=t))
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {r["user_id"]: r for r in user_behavior_profile(df).collect()}
    assert got[1]["bot_like"] is True
    assert got[1]["type_entropy"] == 0.0 and got[1]["gap_cv"] == 0.0
    assert got[2]["bot_like"] is False
    assert got[2]["type_entropy"] > 1.0 and got[2]["gap_cv"] > 0.5


def test_markov_entropy_rate_hand_models(spark):
    """A deterministic chain has rate 0; a two-state uniform coin-flip
    chain has rate ln 2."""
    import math

    from cernan_spark.operators.conversation import markov_entropy_rate

    det = spark.createDataFrame(
        [(f"c{i}", t, ["user", "assistant"][t % 2])
         for i in range(6) for t in range(4)],
        "conv_id string, turn_idx int, role string",
    )
    got = markov_entropy_rate(det).first()
    # every source state transitions deterministically except the
    # terminal → END edge, which is ALSO deterministic per state here:
    # assistant at t=3 always → END? no — assistant appears at t=1,3;
    # t=1 → user, t=3 → END: that's a 50/50 split for 'assistant'.
    # So entropy comes only from that split: pi(assistant)=12/24,
    # H(assistant)=ln 2 → rate = 0.5·ln2
    assert got["entropy_rate"] == round(0.5 * math.log(2), 6)

    # uniform 2-state chain without END effects dominating: one long
    # conversation alternating between blocks chosen to make each row
    # uniform is fiddly — instead check monotonicity: a shuffled-role
    # corpus scores HIGHER than the scripted one.
    noisy = spark.createDataFrame(
        [(f"c{i}", t, ["user", "assistant", "tool"][(i * 7 + t * 5) % 3])
         for i in range(8) for t in range(6)],
        "conv_id string, turn_idx int, role string",
    )
    assert markov_entropy_rate(noisy).first()["entropy_rate"] > got["entropy_rate"]


def test_topic_shifts_hand_model(spark):
    """A conversation that switches vocabulary mid-way gets exactly one
    boundary; repeated-vocabulary turns don't split; mean Jaccard is
    the hand value."""
    from cernan_spark.operators.conversation import topic_shifts

    rows = [
        ("c1", 0, "alpha beta gamma"),
        ("c1", 1, "beta gamma delta"),     # J = 2/4 = 0.5 — no boundary
        ("c1", 2, "xray yankee zulu"),      # J = 0 — boundary
        ("c1", 3, "zulu xray quebec"),      # J = 2/4 — no boundary
        ("c2", 0, "solo"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r["conv_id"]: r for r in topic_shifts(df).collect()}
    c1 = out["c1"]
    assert c1["n_turns"] == 4 and c1["n_boundaries"] == 1
    assert c1["n_segments"] == 2
    assert c1["mean_jaccard"] == round((0.5 + 0.0 + 0.5) / 3, 6)
    c2 = out["c2"]
    assert c2["n_segments"] == 1 and c2["mean_jaccard"] == 0.0


def test_topic_shifts_duplicate_tokens_dedup(spark):
    """Token multisets dedup before Jaccard: 'a a a b' vs 'a b' are
    identical sets (J = 1)."""
    from cernan_spark.operators.conversation import topic_shifts

    df = spark.createDataFrame(
        [("c", 0, "a a a b"), ("c", 1, "a b")],
        "conv_id string, turn_idx int, text string",
    )
    r = topic_shifts(df).first()
    assert r["n_boundaries"] == 0 and r["mean_jaccard"] == 1.0
