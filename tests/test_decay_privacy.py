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
