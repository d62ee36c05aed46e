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


# ------------------------------------------------------------- cmh


def _cmh_frame(spark, tables):
    """tables: {stratum: (a, b, c, d)} expanded to row grain."""
    rows = []
    for s, (a, b, c, d) in tables.items():
        rows += [(s, True, True)] * a + [(s, True, False)] * b
        rows += [(s, False, True)] * c + [(s, False, False)] * d
    return spark.createDataFrame(
        rows, "stratum string, ex boolean, outc boolean"
    )


def test_cmh_hand_tables(spark):
    from cernan_spark.operators.experiment import cmh_odds

    df = _cmh_frame(spark, {"A": (4, 1, 1, 4), "B": (2, 2, 2, 2)})
    out = {r["stratum"]: r for r in cmh_odds(df, "stratum", "ex", "outc").collect()}
    assert (out["A"]["a"], out["A"]["d"]) == (4, 4)
    assert out["A"]["or_stratum"] == pytest.approx(16.0)
    assert out["B"]["or_stratum"] == pytest.approx(1.0)
    # num = 16/10 + 4/8 = 2.1 ; den = 1/10 + 4/8 = 0.6
    assert out["A"]["or_cmh"] == pytest.approx(3.5)
    assert out["B"]["or_cmh"] == pytest.approx(3.5)


def test_cmh_zero_cell_stratum_or_null(spark):
    from cernan_spark.operators.experiment import cmh_odds

    df = _cmh_frame(spark, {"A": (3, 0, 2, 3)})
    out = cmh_odds(df, "stratum", "ex", "outc").collect()[0]
    assert out["or_stratum"] is None  # b·c = 0
    # pooled still defined: num = 9/8, den = 0 -> NULL pooled too
    assert out["or_cmh"] is None


# ----------------------------------------------------- brier decomp


def test_brier_identity_and_value(spark):
    from cernan_spark.operators.experiment import brier_decomposition

    # scores 32 (p=.25) and 96 (p=.75); outcomes 1/4 and 3/4 positive
    rows = [(32, 1)] + [(32, 0)] * 3 + [(96, 1)] * 3 + [(96, 0)]
    df = spark.createDataFrame(rows, "score int, y int")
    out = brier_decomposition(df, "score", "y", denom=128).collect()[0]
    # perfectly calibrated bins: REL = 0
    assert out["reliability"] == pytest.approx(0.0)
    assert out["base_rate"] == pytest.approx(0.5)
    assert out["uncertainty"] == pytest.approx(0.25)
    # RES = mean (o_k - .5)^2 = .0625 ; brier = REL - RES + UNC
    assert out["resolution"] == pytest.approx(0.0625)
    assert out["brier"] == pytest.approx(0.25 - 0.0625)


def test_brier_miscalibrated_reliability(spark):
    from cernan_spark.operators.experiment import brier_decomposition

    # one bin predicting .25 but empirically always positive
    rows = [(32, 1)] * 4
    df = spark.createDataFrame(rows, "score int, y int")
    out = brier_decomposition(df, "score", "y", denom=128).collect()[0]
    assert out["reliability"] == pytest.approx(0.5625)  # (0.25-1)^2
    assert out["resolution"] == pytest.approx(0.0)
    assert out["uncertainty"] == pytest.approx(0.0)
    assert out["brier"] == pytest.approx(0.5625)


# ------------------------------------------------------ turn hazard


def test_turn_hazard_life_table(spark):
    from cernan_spark.operators.conversation import turn_hazard

    rows = []
    for conv, n in [("c1", 1), ("c2", 1), ("c3", 2), ("c4", 3)]:
        rows += [(conv, i) for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = {r["t_turns"]: r for r in turn_hazard(df).collect()}
    assert out[1]["n_end"] == 2 and out[1]["n_risk"] == 4
    assert out[1]["hazard"] == pytest.approx(0.5)
    assert out[1]["survival"] == pytest.approx(0.5)
    assert out[2]["n_risk"] == 2
    assert out[2]["survival"] == pytest.approx(0.25)
    assert out[3]["hazard"] == pytest.approx(1.0)
    assert out[3]["survival"] == pytest.approx(0.0)


# ------------------------------------------------------ grid dbscan


def test_grid_dbscan_merge_and_noise(spark):
    from cernan_spark.operators.similarity import grid_dbscan

    def pt(i, x, y):
        return (i, [float(x), float(y)])

    rows = (
        # cluster A: cells (0,0) and (1,1) touch diagonally, 2 pts each
        [pt(1, 0.1, 0.1), pt(2, 0.2, 0.2), pt(3, 1.1, 1.1), pt(4, 1.2, 1.2)]
        # cluster B: cell (5,5) with 3 pts, isolated
        + [pt(5, 5.1, 5.1), pt(6, 5.2, 5.2), pt(7, 5.3, 5.3)]
        # noise: lone point
        + [pt(8, 10.5, 10.5)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = grid_dbscan(df, "vec_id", "embedding", eps=1.0, min_pts=2)
    got = sorted(
        (r["n_cells"], r["n_points"]) for r in out.collect()
    )
    # noise row: 1 sparse cell, 1 point
    assert got == [(1, 1), (1, 3), (2, 4)]
    noise = [r for r in out.collect() if r["cluster_id"] == -1]
    assert len(noise) == 1 and noise[0]["n_points"] == 1


def test_grid_dbscan_chain_converges_to_one_component(spark):
    from cernan_spark.operators.similarity import grid_dbscan

    # a 6-cell horizontal chain, 2 pts per cell -> ONE cluster
    rows = []
    i = 0
    for cx in range(6):
        for k in range(2):
            i += 1
            rows.append((i, [cx + 0.5, 0.5, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = grid_dbscan(df, "vec_id", "embedding", eps=1.0, min_pts=2).collect()
    assert len(out) == 1
    assert out[0]["n_cells"] == 6 and out[0]["n_points"] == 12
    assert out[0]["cluster_id"] != -1


def test_grid_dbscan_all_noise(spark):
    from cernan_spark.operators.similarity import grid_dbscan

    df = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [3.5, 3.5])],
        "vec_id long, embedding array<float>",
    )
    out = grid_dbscan(df, "vec_id", "embedding", eps=1.0, min_pts=2).collect()
    assert len(out) == 1
    assert out[0]["cluster_id"] == -1
    assert out[0]["n_points"] == 2 and out[0]["n_cells"] == 2


# ---------------------------------------------------- seq patterns


def _seq_frame(spark, seqs):
    rows = [
        (g, i, tool)
        for g, toks in seqs.items()
        for i, tool in enumerate(toks)
    ]
    return spark.createDataFrame(rows, "g string, o int, i string")


def test_seq_patterns_gapped_support(spark):
    from cernan_spark.operators.behavior import seq_patterns

    df = _seq_frame(
        spark, {"c1": ["a", "b", "a"], "c2": ["b", "a"], "c3": ["a", "b"]}
    )
    out = {
        r["pattern"]: r["n_groups"]
        for r in seq_patterns(df, "g", "o", "i", min_support=2).collect()
    }
    # a->b in c1 (0<1) and c3; NOT c2 (first a=1, last b=0)
    # b->a in c1 (1<2) and c2
    assert out == {"a>b": 2, "b>a": 2}


def test_seq_patterns_repeats_and_triples(spark):
    from cernan_spark.operators.behavior import seq_patterns

    df = _seq_frame(spark, {"c1": ["a", "b", "a"]})
    out = {
        r["pattern"]: r["n_groups"]
        for r in seq_patterns(df, "g", "o", "i", min_support=1).collect()
    }
    # repeat a->a via first(a)=0 < last(a)=2; triple a>b>a via b at 1
    assert out["a>a"] == 1
    assert out["a>b>a"] == 1
    assert "b>a>b" not in out  # only one b occurrence
    # gap requirement is STRICT betweenness: a>a>a needs an 'a' strictly
    # between first and last -> absent with two occurrences
    assert "a>a>a" not in out


def test_seq_patterns_order_sensitivity(spark):
    from cernan_spark.operators.behavior import seq_patterns

    # identical BAGS, opposite orders: sets agree, sequences must not
    df = _seq_frame(spark, {"c1": ["x", "y"], "c2": ["y", "x"]})
    out = {
        r["pattern"]: r["n_groups"]
        for r in seq_patterns(df, "g", "o", "i", min_support=2).collect()
    }
    assert out == {}  # neither direction reaches support 2


# ----------------------------------------------------- assoc rules


def test_assoc_rules_confidence_lift(spark):
    from cernan_spark.operators.behavior import assoc_rules

    rows = [
        ("g1", "a"), ("g1", "b"),
        ("g2", "a"), ("g2", "b"),
        ("g3", "a"),
        ("g4", "b"), ("g4", "c"),
    ]
    df = spark.createDataFrame(rows, "g string, i string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in assoc_rules(df, "g", "i", min_support=2).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    assert (ab["supp_pair"], ab["supp_a"], ab["supp_b"]) == (2, 3, 3)
    assert ab["confidence"] == pytest.approx(round(2 / 3, 6))
    assert ab["lift"] == pytest.approx(round(8 / 9, 6))
    # direction asymmetry shows in confidence when supports differ
    assert out[("b", "a")]["confidence"] == pytest.approx(round(2 / 3, 6))


# --------------------------------------------------- burrows delta


def test_burrows_delta_three_shards(spark):
    from cernan_spark.operators.textstats import burrows_delta

    shards = {
        "s1": ["the"] * 6 + ["of"] * 2 + ["and"] * 2,
        "s2": ["the"] * 4 + ["of"] * 4 + ["and"] * 2,
        "s3": ["the"] * 2 + ["of"] * 2 + ["and"] * 6,
    }
    rows = [(g, w) for g, ws in shards.items() for w in ws]
    df = spark.createDataFrame(rows, "g string, tok string")
    out = {
        (r["g1"], r["g2"]): r
        for r in burrows_delta(df, "g", "tok", top_k=3).collect()
    }

    # python reference
    import statistics

    words = ["and", "of", "the"]  # all tie at 10 -> top-3 by token
    f = {
        g: {w: ws.count(w) / len(ws) for w in words}
        for g, ws in shards.items()
    }
    mu = {w: sum(f[g][w] for g in shards) / 3 for w in words}
    sg = {
        w: math.sqrt(sum((f[g][w] - mu[w]) ** 2 for g in shards) / 3)
        for w in words
    }
    z = {g: {w: (f[g][w] - mu[w]) / sg[w] for w in words} for g in shards}

    def delta(g1, g2):
        return sum(abs(z[g1][w] - z[g2][w]) for w in words) / 3

    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    for (g1, g2), r in out.items():
        assert r["n_words"] == 3
        assert r["delta"] == pytest.approx(delta(g1, g2), abs=1e-5)
    # s1 vs s3 differ most
    assert out[("s1", "s3")]["delta"] > out[("s1", "s2")]["delta"]


def test_burrows_delta_zero_variance_word_excluded(spark):
    from cernan_spark.operators.textstats import burrows_delta

    # 'zz' has identical relative frequency in both shards -> excluded
    rows = (
        [("a", "zz")] * 2 + [("a", "x")] * 2
        + [("b", "zz")] * 2 + [("b", "y")] * 2
    )
    df = spark.createDataFrame(rows, "g string, tok string")
    out = burrows_delta(df, "g", "tok", top_k=3).collect()[0]
    assert out["n_words"] == 2  # x and y survive, zz dropped


# ------------------------------------------------------------ anova


def test_anova_hand_value(spark):
    from cernan_spark.operators.rankstats import anova_oneway

    rows = [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)]
    df = spark.createDataFrame(rows, "g string, y long")
    out = anova_oneway(df, "g", "y").collect()[0]
    assert (out["k"], out["n"]) == (2, 6)
    # S=21 SS=91 C=73.5 ; t=36/3+225/3=87 ; SSB=13.5 SSW=4
    assert out["ss_between"] == pytest.approx(13.5)
    assert out["ss_within"] == pytest.approx(4.0)
    assert out["f_stat"] == pytest.approx(13.5)
    assert out["eta_sq"] == pytest.approx(round(13.5 / 17.5, 6))


def test_anova_identical_groups_f_zero(spark):
    from cernan_spark.operators.rankstats import anova_oneway

    rows = [("A", 1), ("A", 3), ("B", 1), ("B", 3)]
    df = spark.createDataFrame(rows, "g string, y long")
    out = anova_oneway(df, "g", "y").collect()[0]
    assert out["ss_between"] == pytest.approx(0.0)
    assert out["f_stat"] == pytest.approx(0.0)


def test_anova_single_group_null_f(spark):
    from cernan_spark.operators.rankstats import anova_oneway

    df = spark.createDataFrame([("A", 1), ("A", 2)], "g string, y long")
    out = anova_oneway(df, "g", "y").collect()[0]
    assert out["f_stat"] is None


# ------------------------------------------------------------ hurst


def _rs_ref(block):
    m = sum(block) / len(block)
    zs, acc = [], 0.0
    for i, v in enumerate(block, 1):
        acc += v
        zs.append(acc - i * m)
    r = max(zs) - min(zs)
    s = math.sqrt(sum((v - m) ** 2 for v in block) / len(block))
    return r / s


def test_hurst_block_rs_matches_hand(spark):
    from cernan_spark.operators.temporal import hurst_rs

    ys = [1, 2, 3, 4, 2, 2, 4, 4]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = hurst_rs(df, ["k"], "x", "y", window_sizes=(4,)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_blocks"] == 2
    exp = (_rs_ref([1, 2, 3, 4]) + _rs_ref([2, 2, 4, 4])) / 2
    assert r["mean_rs"] == pytest.approx(round(exp, 6), abs=1e-6)
    assert r["hurst"] is None  # single size -> no fit


def test_hurst_trending_vs_alternating(spark):
    from cernan_spark.operators.temporal import hurst_rs

    n = 128
    rows = [("trend", i, i * 10) for i in range(n)]
    rows += [("alt", i, 100 + 10 * (i % 2)) for i in range(n)]
    df = spark.createDataFrame(rows, "k string, x int, y long")
    out = {
        (r["k"], r["w"]): r
        for r in hurst_rs(
            df, ["k"], "x", "y", window_sizes=(8, 16, 32)
        ).collect()
    }
    h_trend = out[("trend", 8)]["hurst"]
    h_alt = out[("alt", 8)]["hurst"]
    assert h_trend > 0.9  # persistent ramp
    assert h_alt < 0.3  # mean-reverting oscillation
    assert out[("trend", 8)]["n_blocks"] == 16


# --------------------------------------------------------- textrank


def test_textrank_hub_token_ranks_highest(spark):
    from cernan_spark.operators.graph import pagerank

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c")], "doc_id long, text string"
    )
    arr = F.split("text", " ")
    prs = F.zip_with(
        F.slice(arr, 1, F.size(arr) - 1),
        F.slice(arr, 2, F.size(arr) - 1),
        lambda a, b: F.struct(a.alias("s"), b.alias("d")),
    )
    e0 = (
        docs.select(F.explode(prs).alias("p"))
        .select(F.col("p.s").alias("src"), F.col("p.d").alias("dst"))
        .filter((F.length("src") > 0) & (F.length("dst") > 0))
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    # path a-b-c: b is the hub
    assert set(out) == {"a", "b", "c"}
    assert out["b"] > out["a"] and out["b"] > out["c"]
    assert out["a"] == pytest.approx(out["c"])


# --------------------------------------------------------- friedman


def test_friedman_hand_blocks(spark):
    from cernan_spark.operators.rankstats import friedman_test

    # 3 blocks x 3 treatments, no ties; classic rank sums
    rows = [
        ("b1", "A", 1), ("b1", "B", 2), ("b1", "C", 3),
        ("b2", "A", 1), ("b2", "B", 2), ("b2", "C", 3),
        ("b3", "A", 2), ("b3", "B", 1), ("b3", "C", 3),
    ]
    df = spark.createDataFrame(rows, "b string, trt string, v long")
    out = {r["treatment"]: r for r in friedman_test(df, "b", "trt", "v").collect()}
    # rank sums: A=1+1+2=4, B=2+2+1=5, C=9 ; doubled = 8,10,18
    assert out["A"]["r2_sum"] == 8 and out["C"]["r2_sum"] == 18
    assert out["C"]["mean_rank"] == pytest.approx(3.0)
    # chi2 = 12/(3*3*4) * (16+25+81) - 3*3*4 = (122/3) - 36
    exp = 12 / 36 * (16 + 25 + 81) - 36
    assert out["A"]["chi2_f"] == pytest.approx(round(exp, 6))


def test_friedman_incomplete_block_dropped(spark):
    from cernan_spark.operators.rankstats import friedman_test

    rows = [
        ("b1", "A", 1), ("b1", "B", 2),
        ("b2", "A", 5),  # incomplete -> dropped
    ]
    df = spark.createDataFrame(rows, "b string, trt string, v long")
    out = {r["treatment"]: r for r in friedman_test(df, "b", "trt", "v").collect()}
    assert out["A"]["n_blocks"] == 1 and out["B"]["n_blocks"] == 1


def test_friedman_tie_average_ranks(spark):
    from cernan_spark.operators.rankstats import friedman_test

    rows = [("b1", "A", 5), ("b1", "B", 5), ("b1", "C", 7)]
    df = spark.createDataFrame(rows, "b string, trt string, v long")
    out = {r["treatment"]: r for r in friedman_test(df, "b", "trt", "v").collect()}
    # A,B tie at ranks 1-2 -> avg 1.5 -> doubled 3 ; C rank 3 -> 6
    assert out["A"]["r2_sum"] == 3 and out["B"]["r2_sum"] == 3
    assert out["C"]["r2_sum"] == 6


# ---------------------------------------------------------- logrank


def test_logrank_identical_groups_chi2_zero(spark):
    from cernan_spark.operators.survival import logrank_test

    # mirrored cohorts: every event time has one death per group
    rows = [(1, True, 0), (1, True, 1), (3, True, 0), (3, True, 1)]
    df = spark.createDataFrame(rows, "t long, ev boolean, g long")
    out = logrank_test(df, "t", "ev", "g").collect()[0]
    assert out["o_minus_e"] == pytest.approx(0.0)
    assert out["chi2"] == pytest.approx(0.0)
    assert (out["n1"], out["n2"]) == (2, 2)


def test_logrank_hand_value(spark):
    from cernan_spark.operators.survival import logrank_test

    # g1 dies at 1,2 ; g0 dies at 3,4 -> strong separation
    rows = [(1, True, 1), (2, True, 1), (3, True, 0), (4, True, 0)]
    df = spark.createDataFrame(rows, "t long, ev boolean, g long")
    out = logrank_test(df, "t", "ev", "g").collect()[0]
    # hand: t=1: E1=.5 V=.25 ; t=2: E1=1/3 V=2/9 ; t=3: E1=0
    # V=0 (n1=0) ; t=4 skipped (n_t=1)
    ome = (1 - 0.5) + (1 - 1 / 3) + (0 - 0.0)
    vs = 0.25 + 2 / 9 + 0.0
    assert out["o_minus_e"] == pytest.approx(round(ome, 6), abs=1e-6)
    assert out["var_sum"] == pytest.approx(round(vs, 6), abs=1e-6)
    assert out["chi2"] == pytest.approx(round(ome * ome / vs, 6), abs=1e-5)


def test_logrank_censoring_shrinks_risk(spark):
    from cernan_spark.operators.survival import logrank_test

    # censored g0 subject at t=1 leaves the risk set before t=2
    rows = [(1, False, 0), (2, True, 1), (2, True, 0)]
    df = spark.createDataFrame(rows, "t long, ev boolean, g long")
    out = logrank_test(df, "t", "ev", "g").collect()[0]
    # at t=2: n=2, n1=1, d=2 -> E1=1, V=2*(1/2)*(1/2)*0/1=0
    assert out["o_minus_e"] == pytest.approx(0.0)
    assert out["chi2"] is None  # V sums to 0


# ---------------------------------------------------------- lindley


def test_lindley_hand_walk(spark):
    from cernan_spark.operators.temporal import lindley_wait

    # arrivals at 0,1,2,5 ; services 3,3,1,2
    # W1=0; W2=max(0,0+3-1)=2; W3=max(0,2+3-1)=4; W4=max(0,4+1-3)=2
    rows = [("k", 0, 3), ("k", 1, 3), ("k", 2, 1), ("k", 5, 2)]
    df = spark.createDataFrame(rows, "k string, at long, s long")
    out = lindley_wait(df, ["k"], ["at"], "at", "s").collect()[0]
    assert out["n_jobs"] == 4
    assert out["sum_wait"] == 8
    assert out["max_wait"] == 4
    assert out["n_waited"] == 3
    assert out["final_wait"] == 2
    assert out["mean_wait"] == pytest.approx(2.0)


def test_lindley_idle_server_never_waits(spark):
    from cernan_spark.operators.temporal import lindley_wait

    rows = [("k", i * 10, 1) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, at long, s long")
    out = lindley_wait(df, ["k"], ["at"], "at", "s").collect()[0]
    assert out["sum_wait"] == 0 and out["max_wait"] == 0
    assert out["n_waited"] == 0


def test_lindley_saturated_server_backlog_grows(spark):
    from cernan_spark.operators.temporal import lindley_wait

    # service 2 every 1 tick: W_n = n-1
    rows = [("k", i, 2) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, at long, s long")
    out = lindley_wait(df, ["k"], ["at"], "at", "s").collect()[0]
    assert out["final_wait"] == 5
    assert out["max_wait"] == 5
    assert out["sum_wait"] == 15


# ------------------------------------------------------------ gumbel


def test_gumbel_moments_and_return_levels(spark):
    from cernan_spark.operators.anomaly import gumbel_fit

    # two 4-hour blocks with maxima 10 and 20
    rows = [("k", 0, 1), ("k", 1, 10), ("k", 2, 3), ("k", 3, 4),
            ("k", 4, 20), ("k", 5, 5), ("k", 6, 6), ("k", 7, 7)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = gumbel_fit(
        df, ["k"], "x", "y", block=4, return_periods=(10,)
    ).collect()[0]
    assert out["n_blocks"] == 2
    assert out["mean_max"] == pytest.approx(15.0)
    assert out["sd_max"] == pytest.approx(5.0)
    beta = 5.0 * math.sqrt(6.0) / math.pi
    mu = 15.0 - 0.5772156649015329 * beta
    assert out["beta"] == pytest.approx(round(beta, 6), abs=1e-6)
    assert out["mu"] == pytest.approx(round(mu, 6), abs=1e-6)
    rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 10.0))
    assert out["rl_10"] == pytest.approx(round(rl, 6), abs=1e-5)
    assert out["rl_10"] > out["mean_max"]  # extrapolates beyond seen


def test_gumbel_incomplete_block_dropped(spark):
    from cernan_spark.operators.anomaly import gumbel_fit

    rows = [("k", 0, 1), ("k", 1, 10), ("k", 2, 3), ("k", 3, 4),
            ("k", 4, 99)]  # second block has 1 of 4 rows
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = gumbel_fit(df, ["k"], "x", "y", block=4).collect()[0]
    assert out["n_blocks"] == 1
    assert out["mean_max"] == pytest.approx(10.0)
    # min_fill loosens the gate
    out2 = gumbel_fit(df, ["k"], "x", "y", block=4, min_fill=1).collect()[0]
    assert out2["n_blocks"] == 2


# -------------------------------------------------------------- chrf


def test_chrf_identical_pair_is_one(spark):
    from cernan_spark.operators.textstats import chrf_score

    df = spark.createDataFrame(
        [(1, "abcd ef", "abcd ef")], "id long, cand string, ref string"
    )
    out = {r["n"]: r for r in chrf_score(df, "cand", "ref", "id").collect()}
    # stripped text 'abcdef': 5 bigrams, 4 trigrams, all matched
    assert out[2]["matched"] == 5 and out[2]["fscore"] == pytest.approx(1.0)
    assert out[3]["matched"] == 4 and out[3]["fscore"] == pytest.approx(1.0)


def test_chrf_clipped_multiset_overlap(spark):
    from cernan_spark.operators.textstats import chrf_score

    # cand 'aaaa' has bigram aa x3 ; ref 'aab' has aa x1, ab x1
    df = spark.createDataFrame(
        [(1, "aaaa", "aab")], "id long, cand string, ref string"
    )
    out = {r["n"]: r for r in chrf_score(df, "cand", "ref", "id").collect()}
    r2 = out[2]
    assert r2["matched"] == 1  # clipped at ref count
    assert r2["prec"] == pytest.approx(round(1 / 3, 6))
    assert r2["rec"] == pytest.approx(0.5)
    p, r = 1 / 3, 1 / 2
    assert r2["fscore"] == pytest.approx(
        round(5 * p * r / (4 * p + r), 6), abs=1e-6
    )


def test_chrf_short_text_zero_grams(spark):
    from cernan_spark.operators.textstats import chrf_score

    df = spark.createDataFrame(
        [(1, "ab", "xy")], "id long, cand string, ref string"
    )
    out = {r["n"]: r for r in chrf_score(df, "cand", "ref", "id").collect()}
    # trigrams: neither side has any gram -> NO row for that order
    # (the oracle's unnest-of-empty-list has the same semantics)
    assert 3 not in out
    # bigrams exist but do not overlap
    assert out[2]["matched"] == 0 and out[2]["fscore"] == pytest.approx(0.0)


# --------------------------------------------------------- poststrat


def test_poststrat_corrects_oversampled_stratum(spark):
    from cernan_spark.operators.experiment import poststratified_mean

    # population: stratum A 80 docs of length 10, B 20 docs of length 100
    # sample: 2 from A, 8 from B (B massively over-sampled)
    rows = []
    for i in range(80):
        rows.append(("A", 10, i < 2))
    for i in range(20):
        rows.append(("B", 100, i < 8))
    df = spark.createDataFrame(rows, "h string, v long, s boolean")
    out = poststratified_mean(df, "h", "v", "s").collect()[0]
    # naive: (2*10+8*100)/10 = 82 ; truth/poststrat: .8*10+.2*100 = 28
    assert out["naive_mean"] == pytest.approx(82.0)
    assert out["poststrat_mean"] == pytest.approx(28.0)
    assert out["uncovered_share"] == pytest.approx(0.0)


def test_poststrat_uncovered_stratum_disclosed(spark):
    from cernan_spark.operators.experiment import poststratified_mean

    rows = [("A", 10, True), ("A", 20, False), ("B", 99, False)]
    df = spark.createDataFrame(rows, "h string, v long, s boolean")
    out = poststratified_mean(df, "h", "v", "s").collect()[0]
    assert out["n_covered"] == 1 and out["n_strata"] == 2
    assert out["uncovered_share"] == pytest.approx(round(1 / 3, 6))
    # estimate over covered strata only: stratum A mean 10
    assert out["poststrat_mean"] == pytest.approx(10.0)


# ----------------------------------------------------------- chapman


def test_chapman_hand_population(spark):
    from cernan_spark.operators.sketch import chapman_estimate

    # 6 ids: 1-4 in ch1 ; 3-6 in ch2 ; recaptures {3,4}
    rows = [(i, i <= 4, i >= 3) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "id long, s1 boolean, s2 boolean")
    out = chapman_estimate(df, "id", "s1", "s2").collect()[0]
    assert (out["n1"], out["n2"], out["m"]) == (4, 4, 2)
    assert out["petersen"] == pytest.approx(8.0)
    assert out["chapman"] == pytest.approx(round(25 / 3 - 1, 6))
    assert out["n_observed"] == 6


def test_chapman_no_recapture_null_petersen(spark):
    from cernan_spark.operators.sketch import chapman_estimate

    rows = [(1, True, False), (2, False, True)]
    df = spark.createDataFrame(rows, "id long, s1 boolean, s2 boolean")
    out = chapman_estimate(df, "id", "s1", "s2").collect()[0]
    assert out["petersen"] is None
    assert out["chapman"] == pytest.approx(3.0)  # (2)(2)/1 - 1


# -------------------------------------------------------------- haar


def test_haar_hand_two_levels(spark):
    from cernan_spark.operators.temporal import haar_energy

    df = spark.createDataFrame(
        [("k", 0, 1), ("k", 1, 3), ("k", 2, 2), ("k", 3, 2)],
        "k string, x int, y long",
    )
    out = {r["level"]: r for r in haar_energy(df, ["k"], "x", "y").collect()}
    # level1: d = [-1, 0] -> energy 1 ; level2: avg [2,2] -> d=[0]
    assert out[1]["n_coeffs"] == 2 and out[1]["energy"] == pytest.approx(1.0)
    assert out[2]["n_coeffs"] == 1 and out[2]["energy"] == pytest.approx(0.0)
    assert 3 not in out  # single coefficient cannot pair again


def test_haar_python_mirror(spark):
    from cernan_spark.operators.temporal import haar_energy

    ys = [5, 1, 4, 4, 2, 8, 7, 3, 9, 9, 1]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = {r["level"]: r["energy"] for r in haar_energy(df, ["k"], "x", "y").collect()}

    a = [float(v) for v in ys]
    ref = {}
    for lv in range(1, 6):
        half = len(a) // 2
        if half == 0:
            break
        d = [(a[2 * i] - a[2 * i + 1]) * 0.5 for i in range(half)]
        a = [(a[2 * i] + a[2 * i + 1]) * 0.5 for i in range(half)]
        ref[lv] = sum(x * x for x in d)
    assert set(out) == set(ref)
    for lv, e in ref.items():
        assert out[lv] == pytest.approx(round(e, 6), abs=1e-6)


def test_haar_jitter_vs_slow_swing(spark):
    from cernan_spark.operators.temporal import haar_energy

    # alternating series: ALL energy at level 1
    ys = [0, 10] * 16
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = {r["level"]: r["energy"] for r in haar_energy(df, ["k"], "x", "y").collect()}
    assert out[1] > 0 and out[2] == pytest.approx(0.0)
    assert out[5] == pytest.approx(0.0)


# ----------------------------------------------------------- goertzel


def _goertzel_ref(ys, coeff):
    s1 = s2 = 0.0
    for x in ys:
        s1, s2 = x + coeff * s1 - s2, s1
    return s1 * s1 + s2 * s2 - coeff * s1 * s2


def test_goertzel_python_mirror_and_daily_peak(spark):
    from cernan_spark.operators.temporal import (
        GOERTZEL_COEFFS,
        goertzel_power,
    )

    # period-24 pulse train over 14 days
    ys = [100 + (50 if i % 24 == 0 else 0) for i in range(336)]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = {
        r["period"]: r
        for r in goertzel_power(df, ["k"], "x", "y", (24, 168)).collect()
    }
    for p in (24, 168):
        ref = _goertzel_ref([float(v) for v in ys], GOERTZEL_COEFFS[p])
        assert out[p]["power"] == pytest.approx(ref, rel=1e-9)
    # a 24-periodic signal carries more relative power in the 24 bin
    assert out[24]["rel_power"] > out[168]["rel_power"]


def test_goertzel_short_series_skips_period(spark):
    from cernan_spark.operators.temporal import goertzel_power

    ys = list(range(48))
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = goertzel_power(df, ["k"], "x", "y", (24, 168)).collect()
    assert [r["period"] for r in out] == [24]  # 168 > n -> skipped


def test_goertzel_unknown_period_raises(spark):
    from cernan_spark.operators.temporal import goertzel_power

    df = spark.createDataFrame([("k", 0, 1)], "k string, x int, y long")
    with pytest.raises(ValueError):
        goertzel_power(df, ["k"], "x", "y", (12,))


# -------------------------------------------------------- naive bayes


def _nb_frame(spark, docs):
    rows = []
    for doc, (lbl, text, train) in docs.items():
        for w in text.split():
            rows.append((doc, lbl, w, train))
    return spark.createDataFrame(
        rows, "doc long, lbl string, w string, tr boolean"
    )


def test_naive_bayes_separable_classes(spark):
    from cernan_spark.operators.corpus import naive_bayes_eval

    df = _nb_frame(
        spark,
        {
            1: ("A", "x x y", True),
            2: ("B", "z z y", True),
            3: ("A", "x x", False),
            4: ("B", "z", False),
        },
    )
    out = {
        (r["label_true"], r["label_pred"]): r
        for r in naive_bayes_eval(df, "doc", "lbl", "w", "tr").collect()
    }
    assert out[("A", "A")]["n"] == 1 and out[("A", "A")]["share"] == 1.0
    assert out[("B", "B")]["n"] == 1
    assert ("A", "B") not in out


def test_naive_bayes_unseen_word_ties_to_first_class(spark):
    from cernan_spark.operators.corpus import naive_bayes_eval

    df = _nb_frame(
        spark,
        {
            1: ("A", "x x y", True),
            2: ("B", "z z y", True),
            3: ("B", "q", False),  # unseen word: symmetric scores
        },
    )
    out = naive_bayes_eval(df, "doc", "lbl", "w", "tr").collect()
    assert len(out) == 1
    # equal priors, equal likelihoods -> lexicographically first class
    assert out[0]["label_pred"] == "A" and out[0]["label_true"] == "B"


def test_naive_bayes_prior_breaks_likelihood_tie(spark):
    from cernan_spark.operators.corpus import naive_bayes_eval

    df = _nb_frame(
        spark,
        {
            1: ("A", "y", True),
            2: ("A", "y", True),
            3: ("B", "y", True),
            4: ("B", "q", False),
        },
    )
    out = naive_bayes_eval(df, "doc", "lbl", "w", "tr").collect()[0]
    # A has prior 2/3 and the same smoothed likelihood denominator
    # shape; its ntok differs though: A ntok=2, B ntok=1 -> check the
    # actual argmax matches a python mirror
    import math as _m

    v = 1  # train vocab {'y'}
    def score(cls, nd, ntok):
        return _m.log(nd / 3) + 1.0 * _m.log((0 + 1) / (ntok + v))

    sa, sb = score("A", 2, 2), score("B", 1, 1)
    expect = "A" if (sa, "A") > (sb, "B") or sa > sb else ("A" if sa == sb else "B")
    assert out["label_pred"] == ("A" if sa >= sb else "B") == expect


# -------------------------------------------------------- yule-walker


def test_yule_walker_ar1_like_series(spark):
    from cernan_spark.operators.temporal import yule_walker_ar2

    # deterministic ramp+wiggle; mirror the closed form in python
    ys = [i * 3 + (7 * i * i) % 11 for i in range(40)]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = yule_walker_ar2(df, ["k"], "x", "y").collect()[0]
    r1, r2 = _acf_ref(ys, 1), _acf_ref(ys, 2)
    d2 = 1 - r1 * r1
    phi1 = r1 * (1 - r2) / d2
    phi2 = (r2 - r1 * r1) / d2
    assert out["r1"] == pytest.approx(round(r1, 6), abs=1e-6)
    assert out["phi1"] == pytest.approx(round(phi1, 6), abs=1e-5)
    assert out["phi2"] == pytest.approx(round(phi2, 6), abs=1e-5)
    assert out["sigma2_rel"] == pytest.approx(
        round(1 - phi1 * r1 - phi2 * r2, 6), abs=1e-5
    )
    assert out["stationary"] == (
        phi2 + phi1 < 1 and phi2 - phi1 < 1 and abs(phi2) < 1
    )


def test_yule_walker_short_series_dropped(spark):
    from cernan_spark.operators.temporal import yule_walker_ar2

    df = spark.createDataFrame(
        [("k", 0, 1), ("k", 1, 2)], "k string, x int, y long"
    )
    assert yule_walker_ar2(df, ["k"], "x", "y").count() == 0


# --------------------------------------------------------------- lru


def _lru_ref(xs, cap):
    cache, hits = [], 0
    for x in xs:
        if x in cache:
            hits += 1
            cache.remove(x)
        cache.insert(0, x)
        cache = cache[:cap]
    return hits


def test_lru_hand_stream(spark):
    from cernan_spark.operators.temporal import lru_hit_rate

    xs = ["a", "b", "a", "c", "b", "d", "a"]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, o int, i string"
    )
    out = {
        r["capacity"]: r
        for r in lru_hit_rate(df, ["k"], ["o"], "i", (2, 3)).collect()
    }
    assert out[2]["n_hits"] == _lru_ref(xs, 2)
    assert out[3]["n_hits"] == _lru_ref(xs, 3)
    assert out[3]["n_hits"] >= out[2]["n_hits"]  # monotone in capacity
    assert out[2]["n_accesses"] == 7


def test_lru_capacity_one_vs_unbounded(spark):
    from cernan_spark.operators.temporal import lru_hit_rate

    xs = ["a", "a", "b", "a", "b"]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, o int, i string"
    )
    out = {
        r["capacity"]: r
        for r in lru_hit_rate(df, ["k"], ["o"], "i", (1, 100)).collect()
    }
    # cap 1: only the immediate repeat hits
    assert out[1]["n_hits"] == 1
    # unbounded: every revisit hits (a twice more, b once more)
    assert out[100]["n_hits"] == 3
    assert out[100]["hit_rate"] == pytest.approx(0.6)


def test_lru_eviction_order_is_lru_not_fifo(spark):
    from cernan_spark.operators.temporal import lru_hit_rate

    # a b a c : with cap 2, touching 'a' must keep it resident so the
    # insert of 'c' evicts 'b' (LRU), not 'a' (FIFO) -> final probe
    # of 'a' hits
    xs = ["a", "b", "a", "c", "a"]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, o int, i string"
    )
    out = lru_hit_rate(df, ["k"], ["o"], "i", (2,)).collect()[0]
    assert out["n_hits"] == 2  # the re-touch of a, then the final a


# ------------------------------------------------------------- theil


def test_theil_equal_distribution_zero(spark):
    from cernan_spark.operators.skew import theil_indices

    rows = [("g", u, 50) for u in range(8)]
    df = spark.createDataFrame(rows, "g string, u long, v long")
    out = theil_indices(df, ["g"], "u", "v").collect()[0]
    assert out["theil_t"] == pytest.approx(0.0)
    assert out["theil_l"] == pytest.approx(0.0)
    assert str(out["theil_t"]) != "-0.0"  # sign-normalized


def test_theil_hand_value_and_zero_exclusion(spark):
    from cernan_spark.operators.skew import theil_indices

    rows = [("g", 1, 10), ("g", 2, 30), ("g", 3, 0)]
    df = spark.createDataFrame(rows, "g string, u long, v long")
    out = theil_indices(df, ["g"], "u", "v").collect()[0]
    assert out["n_units"] == 2 and out["n_zero"] == 1
    mu = 20.0
    t = (10 / mu * math.log(10 / mu) + 30 / mu * math.log(30 / mu)) / 2
    l = (math.log(mu / 10) + math.log(mu / 30)) / 2
    assert out["theil_t"] == pytest.approx(round(t, 6), abs=1e-6)
    assert out["theil_l"] == pytest.approx(round(l, 6), abs=1e-6)
    assert out["theil_t"] > 0 and out["theil_l"] > 0


# ------------------------------------------------------ holt-winters


def _hw_ref(ys, m=4):
    m1 = sum(ys[:m]) / m
    m2 = sum(ys[m : 2 * m]) / m
    l, b = m1, (m2 - m1) / m
    s = [y - m1 for y in ys[:m]]
    for y in ys[m:]:
        sold = s[0]
        l_new = ((y - sold) + (l + b)) * 0.5
        b_new = ((l_new - l) + b) * 0.5
        s_new = ((y - l_new) + sold) * 0.5
        s = s[1:] + [s_new]
        l, b = l_new, b_new
    return l, b, s


def test_holt_winters_python_mirror(spark):
    from cernan_spark.operators.temporal import holt_winters

    # season 4, period-4 sawtooth with drift
    ys = [10 + (i % 4) * 5 + i for i in range(20)]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = holt_winters(
        df, ["k"], "x", "y", season=4, horizons=(1, 2)
    ).collect()[0]
    l, b, s = _hw_ref([float(v) for v in ys], 4)
    assert out["level"] == pytest.approx(round(l, 6), abs=1e-6)
    assert out["trend"] == pytest.approx(round(b, 6), abs=1e-6)
    assert out["f_1"] == pytest.approx(round(l + b + s[0], 6), abs=1e-6)
    assert out["f_2"] == pytest.approx(
        round(l + 2 * b + s[1], 6), abs=1e-6
    )


def test_holt_winters_tracks_seasonal_pattern(spark):
    from cernan_spark.operators.temporal import holt_winters

    # pure period-4 pattern, no drift: forecast ≈ the pattern
    pat = [100, 200, 150, 50]
    ys = pat * 10
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = holt_winters(
        df, ["k"], "x", "y", season=4, horizons=(1, 2, 3)
    ).collect()[0]
    # next values would be 100, 200, 150
    assert abs(out["f_1"] - 100) < 10
    assert abs(out["f_2"] - 200) < 10
    assert abs(out["trend"]) < 1.0


def test_holt_winters_short_series_dropped(spark):
    from cernan_spark.operators.temporal import holt_winters

    df = spark.createDataFrame(
        [("k", i, i) for i in range(7)], "k string, x int, y long"
    )
    assert holt_winters(df, ["k"], "x", "y", season=4).count() == 0


# ----------------------------------------------------------- kruskal


def test_kruskal_hand_value(spark):
    from cernan_spark.operators.rankstats import kruskal_wallis

    # textbook: A=[1,2], B=[3,4] no ties -> ranks 1,2 / 3,4
    rows = [("A", 1), ("A", 2), ("B", 3), ("B", 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["grp"]: r for r in kruskal_wallis(df, "g", "v").collect()}
    # H = 12/(4*5) * (3^2/2 + 7^2/2) - 3*5 = 0.6*29 - 15 = 2.4... wait
    # R_A=3, R_B=7 -> 12/20*(9/2+49/2)-15 = 0.6*29-15 = 2.4
    assert out["A"]["mean_rank"] == pytest.approx(1.5)
    assert out["B"]["mean_rank"] == pytest.approx(3.5)
    assert out["A"]["h"] == pytest.approx(
        round(12 / 20 * (9 / 2 + 49 / 2) - 15, 6), abs=1e-6
    )
    # no ties -> correction is 1
    assert out["A"]["h_adj"] == pytest.approx(out["A"]["h"])


def test_kruskal_ties_average_and_correct(spark):
    from cernan_spark.operators.rankstats import kruskal_wallis

    rows = [("A", 5), ("A", 5), ("B", 5), ("B", 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["grp"]: r for r in kruskal_wallis(df, "g", "v").collect()}
    # three 5s tie at avg rank 2 -> doubled 4; 9 has rank 4 -> doubled 8
    assert out["A"]["r2_sum"] == 8
    assert out["B"]["r2_sum"] == 12
    # tie correction: sum(t^3-t)=24, n^3-n=60 -> C=0.6
    h = 3.0 * (64 / 2 + 144 / 2) / 20 - 15
    assert out["A"]["h"] == pytest.approx(round(h, 6), abs=1e-6)
    assert out["A"]["h_adj"] == pytest.approx(round(h / 0.6, 6), abs=1e-6)


# ----------------------------------------------------------- mcnemar


def test_mcnemar_hand_counts(spark):
    from cernan_spark.operators.rankstats import mcnemar_test

    rows = (
        [(True, True)] * 5 + [(True, False)] * 6
        + [(False, True)] * 2 + [(False, False)] * 3
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    out = mcnemar_test(df, "a", "b").collect()[0]
    assert (out["n_both"], out["n_a_only"], out["n_b_only"]) == (5, 6, 2)
    assert out["chi2"] == pytest.approx(round(16 / 8, 6))


def test_mcnemar_no_discordance_null(spark):
    from cernan_spark.operators.rankstats import mcnemar_test

    df = spark.createDataFrame(
        [(True, True), (False, False)], "a boolean, b boolean"
    )
    out = mcnemar_test(df, "a", "b").collect()[0]
    assert out["chi2"] is None


# -------------------------------------------------------------- runs


def test_runs_alternating_vs_clumped(spark):
    from cernan_spark.operators.rankstats import runs_test

    alt = [i % 2 for i in range(20)]
    clump = [0] * 10 + [1] * 10
    rows = [("alt", i, 0, x) for i, x in enumerate(alt)]
    rows += [("clump", i, 0, x) for i, x in enumerate(clump)]
    df = spark.createDataFrame(rows, "k string, t1 int, t2 int, x int")
    out = {r["k"]: r for r in runs_test(df, ["k"], ["t1", "t2"], "x").collect()}
    assert out["alt"]["runs"] == 20
    assert out["clump"]["runs"] == 2
    assert out["alt"]["e_runs"] == pytest.approx(11.0)
    assert out["alt"]["z"] > 3  # way more runs than chance
    assert out["clump"]["z"] < -3  # way fewer


def test_runs_degenerate_one_sided(spark):
    from cernan_spark.operators.rankstats import runs_test

    df = spark.createDataFrame(
        [("k", i, 0, 1) for i in range(5)], "k string, t1 int, t2 int, x int"
    )
    out = runs_test(df, ["k"], ["t1", "t2"], "x").collect()[0]
    assert out["runs"] == 1 and out["n0"] == 0
    assert out["e_runs"] is None and out["z"] is None


# -------------------------------------------------------------- welch


def test_welch_hand_value(spark):
    from cernan_spark.operators.rankstats import welch_t

    rows = [("a", v) for v in [1, 2, 3, 4]] + [("b", v) for v in [10, 30]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = welch_t(df, "g", "v", "a", "b").collect()[0]
    import statistics as st

    m1, m2 = 2.5, 20.0
    var1 = st.variance([1, 2, 3, 4])
    var2 = st.variance([10, 30])
    v1, v2 = var1 / 4, var2 / 2
    t = (m1 - m2) / math.sqrt(v1 + v2)
    dfw = (v1 + v2) ** 2 / (v1 * v1 / 3 + v2 * v2 / 1)
    sp = math.sqrt((3 * var1 + 1 * var2) / 4)
    assert out["mean1"] == pytest.approx(2.5)
    assert out["t"] == pytest.approx(round(t, 6), abs=1e-6)
    assert out["df_welch"] == pytest.approx(round(dfw, 6), abs=1e-5)
    assert out["cohen_d"] == pytest.approx(round((m1 - m2) / sp, 6), abs=1e-6)


def test_welch_degenerate_single_row_group(spark):
    from cernan_spark.operators.rankstats import welch_t

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "g string, v long"
    )
    out = welch_t(df, "g", "v", "a", "b").collect()[0]
    assert out["t"] is None and out["df_welch"] is None


# ---------------------------------------------------- brown-forsythe


def test_brown_forsythe_equal_spreads_f_zero(spark):
    from cernan_spark.operators.rankstats import brown_forsythe

    # both groups have |dev from median| = {1,0,1}
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 11), ("b", 12), ("b", 13)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = brown_forsythe(df, "g", "v").collect()[0]
    assert out["f_stat"] == pytest.approx(0.0)


def test_brown_forsythe_detects_spread_difference(spark):
    from cernan_spark.operators.rankstats import brown_forsythe

    rows = [("tight", v) for v in [100, 100, 100, 101]]
    rows += [("wide", v) for v in [0, 100, 200, 300]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = brown_forsythe(df, "g", "v").collect()[0]
    assert out["f_stat"] > 5.0
    assert out["k"] == 2 and out["n"] == 8


def test_brown_forsythe_even_n_half_integer_median(spark):
    from cernan_spark.operators.rankstats import brown_forsythe

    # median of [1, 2] is 1.5 -> doubled deviations |2v-3| = 1, 1
    rows = [("a", 1), ("a", 2), ("b", 5), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = brown_forsythe(df, "g", "v").collect()[0]
    # group a dev2 = {1,1}; group b dev2 = {0,0} -> SSB = 1, SSW = 0
    assert out["ss_between"] == pytest.approx(1.0)
    assert out["ss_within"] == pytest.approx(0.0)


# --------------------------------------------------------- best split


def test_best_split_obvious_step(spark):
    from cernan_spark.operators.anomaly import best_split

    ys = [10] * 6 + [50] * 6
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(ys)], "k string, x int, y long"
    )
    out = best_split(df, ["k"], "x", "y").collect()[0]
    assert out["split_i"] == 6
    assert out["split_at"] == 5  # last x of the left segment
    assert out["mean_left"] == pytest.approx(10.0)
    assert out["mean_right"] == pytest.approx(50.0)
    # gain = full SSE of the step series (segments are constant)
    assert out["gain"] == pytest.approx(12 * (20.0**2), abs=1e-6)


def test_best_split_tie_takes_earliest(spark):
    from cernan_spark.operators.anomaly import best_split

    # perfectly flat series: every split gains 0 -> earliest candidate
    df = spark.createDataFrame(
        [("k", i, 7) for i in range(8)], "k string, x int, y long"
    )
    out = best_split(df, ["k"], "x", "y").collect()[0]
    assert out["gain"] == pytest.approx(0.0)
    assert out["split_i"] == 2  # first allowed candidate


def test_best_split_short_series_dropped(spark):
    from cernan_spark.operators.anomaly import best_split

    df = spark.createDataFrame(
        [("k", i, i) for i in range(3)], "k string, x int, y long"
    )
    assert best_split(df, ["k"], "x", "y").count() == 0


# --------------------------------------------------------------- pca2


def test_pca2_diagonal_scatter(spark):
    from cernan_spark.operators.experiment import pca2

    # y = x exactly: all variance on the 45-degree axis
    rows = [(v, v) for v in [1, 2, 3, 4, 5]]
    df = spark.createDataFrame(rows, "a long, b long")
    out = pca2(df, "a", "b").collect()[0]
    assert out["evr1"] == pytest.approx(1.0)
    assert out["lambda2"] == pytest.approx(0.0)
    assert out["axis_x"] == pytest.approx(round(1 / math.sqrt(2), 6))
    assert out["axis_y"] == pytest.approx(round(1 / math.sqrt(2), 6))


def test_pca2_axis_aligned_no_covariance(spark):
    from cernan_spark.operators.experiment import pca2

    # x varies, y constant-ish with no covariance
    rows = [(1, 5), (2, 5), (3, 5), (4, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = pca2(df, "a", "b").collect()[0]
    assert out["cov_xy"] == pytest.approx(0.0)
    assert (out["axis_x"], out["axis_y"]) == (1.0, 0.0)
    assert out["evr1"] == pytest.approx(1.0)


def test_pca2_anticorrelated_axis(spark):
    from cernan_spark.operators.experiment import pca2

    rows = [(v, 10 - v) for v in [1, 2, 3, 4, 5]]
    df = spark.createDataFrame(rows, "a long, b long")
    out = pca2(df, "a", "b").collect()[0]
    # principal axis along (1, -1): sign convention vx = b < 0
    assert out["axis_x"] == pytest.approx(-out["axis_y"])
    assert out["evr1"] == pytest.approx(1.0)


# ----------------------------------------------------------- ols diag


def test_ols_diag_flags_planted_outlier(spark):
    from cernan_spark.operators.anomaly import ols_diagnostics

    # clean line y = 10x with one planted outlier at x=7
    rows = [("k", i, 10 * i) for i in range(12)]
    rows[7] = ("k", 7, 10 * 7 + 500)
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = ols_diagnostics(df, ["k"], "x", "y", top_k=1).collect()
    assert len(out) == 1
    assert out[0]["x"] == 7
    assert abs(out[0]["std_resid"]) > 2.0
    # leverage is an interior point's: modest
    assert out[0]["leverage"] < 0.3


def test_ols_diag_leverage_extremes(spark):
    from cernan_spark.operators.anomaly import ols_diagnostics

    rows = [("k", i, i + (1 if i % 2 else 0)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = ols_diagnostics(df, ["k"], "x", "y", top_k=10).collect()
    lev = {r["x"]: r["leverage"] for r in out}
    # endpoints carry the highest leverage; python mirror for x=0
    n, sx = 10, sum(range(10))
    sxx = sum(i * i for i in range(10))
    den = n * sxx - sx * sx
    h0 = 1 / n + (n * 0 - sx) ** 2 / (n * den)
    assert lev[0] == pytest.approx(round(h0, 6), abs=1e-6)
    assert lev[0] > lev[4] and lev[9] > lev[5]


# ------------------------------------------------------------------ dr


def test_dr_perfect_model_matches_dm(spark):
    from cernan_spark.operators.experiment import dr_policy_value

    # rewards depend ONLY on action -> q-hat is exact -> correction 0
    rows = [
        (1, "a", 10, 0.5, "a"),
        (2, "a", 10, 0.5, "b"),
        (3, "b", 20, 0.5, "a"),
        (4, "b", 20, 0.5, "b"),
    ]
    df = spark.createDataFrame(rows, "id long, a string, r long, p double, pi string")
    out = dr_policy_value(df, "id", "a", "r", "p", "pi").collect()[0]
    # q(a)=10, q(b)=20 ; pi targets a,b,a,b -> DM = (10+20+10+20)/4
    assert out["v_dm"] == pytest.approx(15.0)
    assert out["v_dr"] == pytest.approx(15.0)  # zero-residual correction
    assert out["n_match"] == 2


def test_dr_correction_moves_with_residual(spark):
    from cernan_spark.operators.experiment import dr_policy_value

    # one matched row with reward above its action mean
    rows = [
        (1, "a", 30, 0.5, "a"),
        (2, "a", 10, 0.5, "b"),
    ]
    df = spark.createDataFrame(rows, "id long, a string, r long, p double, pi string")
    out = dr_policy_value(df, "id", "a", "r", "p", "pi").collect()[0]
    # q(a) = 20 ; q(b) missing -> 0
    # row1: q_pi=20 + (30-20)/.5 = 40 ; row2: q_pi(b)=0, no match
    assert out["v_dm"] == pytest.approx(10.0)
    assert out["v_dr"] == pytest.approx(20.0)


# --------------------------------------------------------------- power


def test_power_closed_form(spark):
    from cernan_spark.operators.experiment import (
        Z_ALPHA_025,
        Z_BETA_20,
        power_sample_size,
    )

    rows = [("m", v) for v in [90, 100, 110, 100]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["mde_pct"]: r
        for r in power_sample_size(df, "g", "v", (5, 10)).collect()
    }
    import statistics as st

    mu, s2 = 100.0, st.variance([90, 100, 110, 100])
    zz = Z_ALPHA_025 + Z_BETA_20
    for m in (5, 10):
        d = mu * m / 100
        exp = math.ceil(2 * zz * zz * s2 / (d * d))
        assert out[m]["n_required"] == exp
    # smaller effects need more data
    assert out[5]["n_required"] > out[10]["n_required"]


def test_power_degenerate_zero_variance(spark):
    from cernan_spark.operators.experiment import power_sample_size

    df = spark.createDataFrame(
        [("g", 5), ("g", 5)], "g string, v long"
    )
    out = power_sample_size(df, "g", "v", (5,)).collect()[0]
    assert out["n_required"] is None
