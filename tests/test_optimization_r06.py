"""Focused tests for the round-6 optimization internals.

Each optimization that changed an operator's internals gets an equality
pin here: the optimized form must be bit-identical to the straightforward
reference form it replaced.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def test_minhash_signatures_agg_form_matches_hof_form(spark):
    """The explode+min-aggregate signature path (codegen'd) must equal the
    per-permutation transform/array_min HOF form it replaced."""
    from cernan_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
        with_shingle_hashes,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = minhash_signatures(docs, portable=False)
    hashed = (
        with_shingle_hashes(
            docs.select(F.col("doc_id").alias("id"), "text"), "text", 3,
            portable=False,
        )
        .select("id", "_h")
        .filter(F.size("_h") > 0)
    )
    old = hashed.select("id", minhash_signature(F.col("_h"), 32).alias("sig"))
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_minhash_signatures_portable_agg_form_matches_hof_form(spark):
    """Same equality pin for the portable-hash (oracle) path."""
    from cernan_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
        with_shingle_hashes,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    new = minhash_signatures(docs, portable=True)
    hashed = (
        with_shingle_hashes(
            docs.select(F.col("doc_id").alias("id"), "text"), "text", 3,
            portable=True,
        )
        .select("id", "_h")
        .filter(F.size("_h") > 0)
    )
    old = hashed.select("id", minhash_signature(F.col("_h"), 32).alias("sig"))
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_spread_scan_preserves_rows_and_noops_when_parallel(spark):
    from cernan_spark.sources.tables import spread_scan

    ev = spark.read.parquet(f"{SF}/events.parquet")
    spread = spread_scan(ev, "event_id")
    # row multiset unchanged
    assert spread.exceptAll(ev).count() == 0
    assert ev.exceptAll(spread).count() == 0
    # deficient scan got the session's parallelism
    par = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == par
    # an input that already has >= par partitions passes through untouched
    wide = ev.repartition(par + 4, "event_id")
    assert spread_scan(wide, "event_id") is wide
