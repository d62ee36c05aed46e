"""Hand-model checks for the Heaps'-law vocabulary-growth fit."""

from __future__ import annotations

import pytest

from cernan_spark.operators.corpus import heaps_law


def test_heaps_all_unique_tokens_gives_beta_one(spark):
    """Every token globally unique -> V(N) = N -> beta = 1, K = 1."""
    rows = [(d, f"t{d}_{i}") for d in range(24) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    out = heaps_law(df, "doc_id", "tok", 8).collect()
    assert out, "no checkpoints"
    assert all(r["beta"] == pytest.approx(1.0) for r in out)
    assert all(r["k_coef"] == pytest.approx(1.0) for r in out)
    assert all(r["n_tokens"] == r["vocab"] for r in out)


def test_heaps_constant_vocab_degenerates_to_plus_zero(spark):
    """One shared token -> V constant 1 -> beta prints +0 (never -0),
    K = 1, and cumulative counts are monotone."""
    rows = [(d, "a") for d in range(30) for _ in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    out = sorted(
        heaps_law(df, "doc_id", "tok", 6).collect(),
        key=lambda r: r["checkpoint"],
    )
    assert all(r["vocab"] == 1 for r in out)
    assert all(str(r["beta"]) == "0.0" for r in out)
    assert all(r["k_coef"] == pytest.approx(1.0) for r in out)
    ns = [r["n_tokens"] for r in out]
    assert ns == sorted(ns)
