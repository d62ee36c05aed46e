"""Batch: exact exponential decay (hitters, discounted return) and the
privacy/compliance gates (purge accounting, k-anonymity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernan_spark.operators.conversation import discounted_return
from cernan_spark.operators.loghygiene import (
    k_anonymity_suppress,
    purge_accounting,
)
from cernan_spark.operators.temporal import decayed_counts


def test_decayed_counts_exact_powers(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 2), ("b", 50)],  # b clamps to max_age
        "k string, age_d long",
    )
    got = {r.k: r for r in decayed_counts(df, ["k"], "age_d", max_age=30).collect()}
    assert got["a"].decayed == 1.0 + 0.5 + 0.25
    assert got["a"].n == 3
    assert got["b"].decayed == 2.0**-30


def test_discounted_return_front_loads(spark):
    df = spark.createDataFrame(
        [("c", 0, 100), ("c", 1, 200), ("c", 25, 10_000)],  # t=25 > horizon
        "conv string, t int, reward_cents long",
    )
    r = discounted_return(df, "conv", "t", "reward_cents", horizon=20).collect()[0]
    assert r.n_rewards == 2
    assert r.ret == 1.0 * 1.0 + 2.0 * 0.5  # 1.00 + 2.00·γ


def test_purge_accounting_counts(spark):
    ev = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (3, "y")], "uid long, g string"
    )
    dels = spark.createDataFrame([(1,), (1,)], "uid long")  # dup requests ok
    got = {r.g: r for r in purge_accounting(ev, dels, ["uid"], ["g"]).collect()}
    assert (got["x"].n_purged, got["x"].n_retained) == (1, 1)
    assert (got["y"].n_purged, got["y"].n_retained) == (1, 1)


def test_k_anonymity_verdicts(spark):
    rows = [("big", f"u{i}") for i in range(5)] + [("small", "u1"), ("small", "u1")]
    df = spark.createDataFrame(rows, "qi string, uid string")
    got = {r.qi: r for r in k_anonymity_suppress(df, ["qi"], "uid", k=3).collect()}
    assert (got["big"].n_ids, got["big"].published) == (5, 1)
    assert (got["small"].n_rows, got["small"].n_ids, got["small"].published) == (
        2,
        1,
        0,
    )


def test_truncation_recall_full_dim_is_perfect(spark):
    """Truncating to the FULL dimension must give recall 1.0 for every
    probe (the two rankings coincide)."""
    from cernan_spark.operators.similarity import truncation_recall

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = truncation_recall(emb, n_probes=5, k=5, trunc_dim=64).collect()
    assert len(out) == 5
    assert all(r.recall == 1.0 and r.n_common == 5 for r in out)


def test_burstiness_poisson_vs_heartbeat(spark):
    from cernan_spark.operators.anomaly import burstiness_profile

    rows = [("beat", "u", i, 100 * i) for i in range(10)]          # constant gaps
    rows += [("burst", "u", i, e) for i, e in enumerate([0, 1, 2, 3, 1000])]
    df = spark.createDataFrame(rows, "k string, u string, seq long, e long")
    got = {
        r.k: r
        for r in burstiness_profile(
            df, ["k"], ["k", "u"], "seq", "e"
        ).collect()
    }
    # constant gaps: n·Σg²/(Σg)² = 9·(9·100²) / 900² = 1.0
    assert got["beat"].cv2 == 1.0
    assert got["burst"].cv2 > 2.0
    assert got["beat"].mean_gap_s == 100.0


def test_tool_cooccurrence_lift(spark):
    from cernan_spark.operators.behavior import tool_cooccurrence

    rows = [
        ("c1", 0, "a"), ("c1", 1, "b"),
        ("c2", 0, "a"), ("c2", 1, "b"),
        ("c3", 0, "a"), ("c3", 1, "c"),
        ("c4", 0, "c"),
    ]
    df = spark.createDataFrame(rows, "conv string, i int, tool string")
    got = {(r.tool_a, r.tool_b): r for r in
           tool_cooccurrence(df, "conv", "tool").collect()}
    ab = got[("a", "b")]
    assert ab.n_ab == 2
    assert ab.lift == (2 * 4) / (3 * 2)   # n_ab·N / (n_a·n_b)
    assert got[("a", "c")].n_ab == 1


def test_t_closeness_hand_model(spark):
    """Two QI groups over an ordered 3-value domain with hand-computed
    EMDs: a group matching the global mix exactly scores 0; a fully
    homogeneous group scores the hand value."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.loghygiene import t_closeness_audit

    # global mix: a:4, b:2, c:2 (N=8). g1 mirrors it (a:2,b:1,c:1);
    # g2 is all 'a' (a:2).
    rows = (
        [("g1", "a")] * 2 + [("g1", "b")] + [("g1", "c")]
        + [("g2", "a")] * 2 + [("g3", "b")] + [("g3", "c")]
    )
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r["q"]: r for r in t_closeness_audit(df, ["q"], "s", 0.3).collect()}
    # hand EMD for g2: p_g=(1,0,0), p=(1/2,1/4,1/4)
    # cum diffs: 1/2, 1/4, 0; EMD=(1/2+1/4)/2=0.375
    assert got["g1"]["emd"] == 0.0 and bool(got["g1"]["publish"]) is True
    assert got["g2"]["emd"] == 0.375 and bool(got["g2"]["publish"]) is False
    # g3: p_g=(0,1/2,1/2): cum -1/2, -1/4 → EMD=(1/2+1/4)/2=0.375
    assert got["g3"]["emd"] == 0.375 and bool(got["g3"]["publish"]) is False
    assert got["g1"]["n"] == 4 and got["g2"]["n"] == 2
