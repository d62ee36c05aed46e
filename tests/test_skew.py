"""Hot-key skew handling: salted repartition + two-phase aggregation must
be correct AND actually spread the hot key (the synthetic corpus puts ~20%
of turns in one conversation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cernan_spark.operators.skew import salted_count, salted_repartition, with_salt
from cernan_spark.sources.transcripts import synthetic_transcripts


def test_salted_count_equals_plain_count(spark):
    t = synthetic_transcripts(spark, n_convs=50, turns_per_conv=40)
    plain = {
        r["conv_id"]: r["n"]
        for r in t.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r["conv_id"]: r["n_rows"]
        for r in salted_count(t, ["conv_id"], n_salts=8).collect()
    }
    assert salted == plain


def test_salt_is_deterministic_and_spreads_hot_key(spark):
    t = synthetic_transcripts(spark, n_convs=50, turns_per_conv=40)
    hot = (
        t.groupBy("conv_id").count().orderBy(F.col("count").desc()).first()["conv_id"]
    )
    s1 = with_salt(t.filter(F.col("conv_id") == hot), n_salts=8)
    # the hot conversation's rows land on >1 salt bucket...
    n_buckets = s1.select(F.countDistinct("_salt")).collect()[0][0]
    assert n_buckets > 1
    # ...and the salt is a pure function of the order key (rerun-identical,
    # required for resumable writes)
    s2 = with_salt(t.filter(F.col("conv_id") == hot), n_salts=8)
    assert sorted(
        (r["order_key"], r["_salt"]) for r in s1.collect()
    ) == sorted((r["order_key"], r["_salt"]) for r in s2.collect())


def test_salted_repartition_partition_spread(spark):
    t = synthetic_transcripts(spark, n_convs=10, turns_per_conv=100)
    hot = (
        t.groupBy("conv_id").count().orderBy(F.col("count").desc()).first()["conv_id"]
    )
    rep = salted_repartition(t, "conv_id", n_partitions=8, n_salts=8)
    spread = (
        rep.filter(F.col("conv_id") == hot)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert spread > 1  # one conversation no longer serializes into one task
