"""Hand-model checks for the twelfth-session operators: ACF profile,
neighborhood link prediction, Wald SPRT, Youden operating point, and
Yule's K vocabulary richness."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cernan_spark.operators.corpus import yule_k
from cernan_spark.operators.experiment import operating_point, sprt_decision
from cernan_spark.operators.graph import link_prediction
from cernan_spark.operators.temporal import acf_profile


# ---------------------------------------------------------------- acf


def _acf_ref(ys, k):
    n = len(ys)
    m = sum(ys) / n
    den = sum((y - m) ** 2 for y in ys)
    num = sum((ys[t] - m) * (ys[t + k] - m) for t in range(n - k))
    return num / den


def test_acf_alternating_series(spark):
    """A strict +1/−1 alternation has acf(1) = −1-ish, acf(2) = +1-ish
    (finite-sample: |acf_k| < 1 because the denominator spans all n)."""
    ys = [1, -1] * 8
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = {
        r["lag"]: r["acf"]
        for r in acf_profile(df, ["k"], "x", "y", max_lag=3).collect()
    }
    assert out[1] == pytest.approx(round(_acf_ref(ys, 1), 6))
    assert out[2] == pytest.approx(round(_acf_ref(ys, 2), 6))
    assert out[1] < -0.8 and out[2] > 0.8


def test_acf_linear_trend_positive(spark):
    ys = list(range(1, 13))
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = {
        r["lag"]: r
        for r in acf_profile(df, ["k"], "x", "y", max_lag=2).collect()
    }
    assert out[1]["n_pairs"] == 11
    assert out[1]["acf"] == pytest.approx(round(_acf_ref(ys, 1), 6))
    assert out[1]["acf"] > 0.5


def test_acf_short_series_lags_dropped(spark):
    """n=3 keeps only lags with n_pairs >= 2, i.e. lag 1."""
    df = spark.createDataFrame(
        [("a", 0, 5), ("a", 1, 7), ("a", 2, 5)], "k string, x int, y long"
    )
    out = acf_profile(df, ["k"], "x", "y", max_lag=4).collect()
    assert [r["lag"] for r in out] == [1]


# ---------------------------------------------------- link prediction


def test_link_prediction_path_graph(spark):
    """Path 1-2-3-4: non-adjacent pairs with a shared neighbor are
    (1,3) via 2 and (2,4) via 3; both middle nodes have degree 2."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {(r["u"], r["v"]): r for r in link_prediction(df).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    r = out[(1, 3)]
    assert r["cn"] == 1 and r["deg_u"] == 1 and r["deg_v"] == 2
    # union = 1 + 2 - 1 = 2
    assert r["jaccard"] == pytest.approx(0.5)
    assert r["adamic_adar"] == pytest.approx(round(1 / math.log(2), 6))


def test_link_prediction_shared_hub(spark):
    """Star + one rim edge: rim pairs share the hub; the adjacent rim
    pair is excluded even though it also shares the hub."""
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "src long, dst long"
    )
    out = {(r["u"], r["v"]): r for r in link_prediction(df).collect()}
    # (1,2) adjacent -> excluded; (1,3) and (2,3) share hub 0
    assert set(out) == {(1, 3), (2, 3)}
    r = out[(1, 3)]
    assert r["cn"] == 1
    assert r["adamic_adar"] == pytest.approx(round(1 / math.log(3), 6))
    # jaccard = 1 / (2 + 1 - 1)
    assert r["jaccard"] == pytest.approx(0.5)


def test_link_prediction_two_common_neighbors(spark):
    """Square 1-2-3-4-1: diagonals share BOTH side nodes."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {(r["u"], r["v"]): r for r in link_prediction(df).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    assert out[(1, 3)]["cn"] == 2
    assert out[(1, 3)]["adamic_adar"] == pytest.approx(
        round(2 / math.log(2), 6)
    )
    assert out[(1, 3)]["jaccard"] == pytest.approx(1.0)


# ------------------------------------------------------------- sprt


def _sprt_df(spark, bits):
    return spark.createDataFrame(
        [("s", i, 0, b) for i, b in enumerate(bits)],
        "k string, t1 int, t2 int, x int",
    )


def test_sprt_accepts_h1_on_success_run(spark):
    """ln(19) / ln(1.2) ≈ 16.15 → 17 straight successes cross A."""
    out = sprt_decision(
        _sprt_df(spark, [1] * 25), ["k"], ["t1", "t2"], "x"
    ).collect()[0]
    assert out["decision"] == "accept_h1"
    assert out["n_decide"] == 17 and out["k_decide"] == 17
    assert out["llr_decide"] == pytest.approx(
        round(17 * math.log(1.2), 6)
    )


def test_sprt_accepts_h0_on_failure_run(spark):
    """ln(1/19) / ln(0.8) ≈ 13.2 → 14 straight failures cross B."""
    out = sprt_decision(
        _sprt_df(spark, [0] * 20), ["k"], ["t1", "t2"], "x"
    ).collect()[0]
    assert out["decision"] == "accept_h0"
    assert out["n_decide"] == 14 and out["k_decide"] == 0


def test_sprt_continue_when_no_crossing(spark):
    """A short balanced stream stays between the boundaries."""
    out = sprt_decision(
        _sprt_df(spark, [1, 0, 1, 0, 1, 0]), ["k"], ["t1", "t2"], "x"
    ).collect()[0]
    assert out["decision"] == "continue"
    assert out["n_decide"] is None and out["llr_decide"] is None
    assert out["n_total"] == 6 and out["k_total"] == 3


def test_sprt_earliest_crossing_wins(spark):
    """After the first crossing, later (even stronger) evidence must
    not move the decision point."""
    bits = [1] * 17 + [0] * 40 + [1] * 40
    out = sprt_decision(
        _sprt_df(spark, bits), ["k"], ["t1", "t2"], "x"
    ).collect()[0]
    assert out["decision"] == "accept_h1"
    assert out["n_decide"] == 17


# -------------------------------------------------- operating point


def test_operating_point_perfect_separation(spark):
    df = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "score int, y int"
    )
    out = operating_point(df, "score", "y").collect()[0]
    assert out["threshold"] == 9
    assert (out["tp"], out["fp"], out["tn"], out["fn"]) == (2, 0, 2, 0)
    assert out["youden_j"] == pytest.approx(1.0)
    assert out["f1"] == pytest.approx(1.0)
    assert out["mcc"] == pytest.approx(1.0)
    assert out["balanced_acc"] == pytest.approx(1.0)


def test_operating_point_tie_prefers_higher_threshold(spark):
    """Scores 3,2,1 with y 1,1,0: thresholds 2 and 3 tie nowhere, but
    an all-positive classifier (threshold 1) ties J=0 with nothing —
    check the documented argmax instead on a crafted tie: two
    thresholds reach the same J; the HIGHER one must win."""
    # scores: pos at 4 and 2, neg at 3 and 1
    # thr=4: tp=1 fp=0 -> J = 1/2 - 0 = .5
    # thr=3: tp=1 fp=1 -> J = 0
    # thr=2: tp=2 fp=1 -> J = 1 - 1/2 = .5  (ties thr=4)
    # thr=1: tp=2 fp=2 -> J = 0
    df = spark.createDataFrame(
        [(4, 1), (3, 0), (2, 1), (1, 0)], "score int, y int"
    )
    out = operating_point(df, "score", "y").collect()[0]
    assert out["threshold"] == 4
    assert out["youden_j"] == pytest.approx(0.5)


def test_operating_point_mcc_matches_reference(spark):
    rows = [(5, 1), (4, 1), (4, 0), (3, 1), (2, 0), (1, 0), (1, 1)]
    df = spark.createDataFrame(rows, "score int, y int")
    out = operating_point(df, "score", "y").collect()[0]
    # brute force in python
    best = None
    pos = sum(y for _, y in rows)
    neg = len(rows) - pos
    for thr in sorted({s for s, _ in rows}, reverse=True):
        tp = sum(1 for s, y in rows if s >= thr and y == 1)
        fp = sum(1 for s, y in rows if s >= thr and y == 0)
        j_num = tp * neg - fp * pos
        key = (j_num, thr)
        if best is None or key > best[0]:
            best = (key, tp, fp)
    (j_num, thr), tp, fp = best
    assert out["threshold"] == thr
    fn, tn = pos - tp, neg - fp
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert out["mcc"] == pytest.approx(round(mcc, 6))


# ------------------------------------------------------------ yule k


def test_yule_k_uniform_vs_repetitive(spark):
    """All-distinct tokens → K = 0; a single repeated token pushes K to
    its 10⁴·(n−1)/n² ceiling."""
    rows = [("rich", t) for t in "a b c d e f g h".split()]
    rows += [("dull", "x")] * 8
    df = spark.createDataFrame(rows, "lang string, tok string")
    out = {r["lang"]: r for r in yule_k(df, ["lang"]).collect()}
    assert out["rich"]["yule_k"] == pytest.approx(0.0)
    assert out["rich"]["v_types"] == 8
    # one type with m=8: K = 1e4 * (64 - 8) / 64
    assert out["dull"]["yule_k"] == pytest.approx(round(1e4 * 56 / 64, 6))
    assert out["dull"]["v_types"] == 1


def test_yule_k_textbook_spectrum(spark):
    """Spectrum {m=1: 2 types, m=2: 1 type}: N=4, Σm²V_m = 2+4 = 6,
    K = 1e4·(6−4)/16 = 1250."""
    df = spark.createDataFrame(
        [("l", t) for t in ["a", "b", "c", "c"]], "lang string, tok string"
    )
    out = yule_k(df, ["lang"]).collect()[0]
    assert out["n_tokens"] == 4 and out["v_types"] == 3
    assert out["yule_k"] == pytest.approx(1250.0)
