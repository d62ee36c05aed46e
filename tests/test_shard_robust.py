"""Batch: rendezvous sharding, token-bucket admission, robust MAD profile,
behavioral trace signatures."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernan_spark.operators.anomaly import robust_mad_profile
from cernan_spark.operators.conversation import trace_signatures
from cernan_spark.operators.loghygiene import token_bucket_admit
from cernan_spark.operators.sharding import rendezvous_shard, resize_movement


def test_rendezvous_minimal_disruption(spark):
    """8→9 resize: every mover lands on the NEW shard, movement is near
    1/9, and no shard is empty or hot."""
    keys = spark.range(500).select(F.col("id").alias("k"))
    tagged = keys.select(
        rendezvous_shard(F.col("k"), 8).alias("s8"),
        rendezvous_shard(F.col("k"), 9).alias("s9"),
    )
    rows = tagged.collect()
    movers = [r for r in rows if r.s8 != r.s9]
    assert all(r.s9 == 8 for r in movers)          # minimal disruption
    frac = len(movers) / len(rows)
    assert 0.05 < frac < 0.20                       # ideal 1/9 ≈ 0.111
    counts = tagged.groupBy("s8").count().collect()
    assert len(counts) == 8                         # no empty shard
    assert max(c["count"] for c in counts) < 3 * min(c["count"] for c in counts)


def test_resize_movement_report(spark):
    keys = spark.range(500).select(F.col("id").alias("k"))
    rep = resize_movement(keys, "k", 8, 9)
    rows = rep.collect()
    assert sum(r.n for r in rows) == 500
    assert all(r.n_moved < r.n for r in rows)       # nobody moves wholesale


def test_token_bucket_burst_and_refill(spark):
    """burst=2, refill 1 token/3600 s: two immediate admits, third in the
    same burst drops, an hour of silence readmits."""
    df = spark.createDataFrame(
        [("u", 0, 1, 0), ("u", 0, 2, 1), ("u", 0, 3, 2), ("u", 0, 4, 3700)],
        "k string, day long, seq long, e long",
    )
    out = token_bucket_admit(df, ["k", "day"], "seq", "e", burst=2, refill_s=3600)
    got = {r.seq: r.admitted for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 1}


def test_token_bucket_cap_never_exceeds_burst(spark):
    """A huge gap refills to the cap, not beyond: after 10 h of silence
    only `burst` consecutive admits are possible."""
    rows = [("u", 0, 1, 0), ("u", 0, 2, 36000)] + [
        ("u", 0, i + 3, 36000 + i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "k string, day long, seq long, e long")
    out = token_bucket_admit(df, ["k", "day"], "seq", "e", burst=2, refill_s=3600)
    got = [r.admitted for r in sorted(out.collect(), key=lambda r: r.seq)]
    assert got == [1, 1, 1, 0, 0]  # seq1 spends, refill caps at 2, then dry


def test_robust_mad_profile_exact(spark):
    df = spark.createDataFrame(
        [("m", 1, 10), ("m", 2, 20), ("m", 3, 30), ("m", 4, 1000)],
        "key string, oid long, cents long",
    )
    out = robust_mad_profile(df, ["key"], "cents", "oid").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.median, r.mad) == (4, 0.25, 0.2)
    # devs d=|2c-50| are [30,10,10,1950]; rule 4d > 3*mad2=120 → only 1950
    # (d=30 sits exactly ON the boundary and is NOT an outlier)
    assert r.n_outliers == 1


def test_robust_mad_profile_odd_n(spark):
    df = spark.createDataFrame(
        [("m", 1, 10), ("m", 2, 50), ("m", 3, 20)],
        "key string, oid long, cents long",
    )
    r = robust_mad_profile(df, ["key"], "cents", "oid").collect()[0]
    assert (r.n, r.median) == (3, 0.2)  # med2 = 20+20
    # devs |2c-40|: [20, 60, 0] → sorted [0,20,60] → mad2 = 40 → 0.2
    assert r.mad == 0.2


def test_trace_signatures_groups_and_exemplar(spark):
    df = spark.createDataFrame(
        [
            ("c2", 0, "user"), ("c2", 1, "assistant"),
            ("c1", 0, "user"), ("c1", 1, "assistant"),
            ("c3", 0, "tool"), ("c3", 1, "assistant"),
        ],
        "conv string, idx int, role string",
    )
    rows = {r.sig: r for r in trace_signatures(df, "conv", "idx", "role").collect()}
    assert rows["user>assistant"].n_convs == 2
    assert rows["user>assistant"].rep_conv == "c1"   # lexicographic exemplar
    assert rows["user>assistant"].total_turns == 4
    assert rows["tool>assistant"].n_convs == 1
