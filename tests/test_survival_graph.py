"""Hand-model checks for Kaplan–Meier survival and the whole-graph
statistics (modularity, degree assortativity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cernan_spark.operators.graph import (
    degree_assortativity,
    label_propagation,
    modularity,
)
from cernan_spark.operators.survival import kaplan_meier


def _km_rows(spark, rows):
    df = spark.createDataFrame(rows, "t long, event boolean")
    out = kaplan_meier(df, "t", "event")
    return {r["t"]: r for r in out.collect()}


def test_km_textbook_curve(spark):
    """Classic 5-subject example: S drops only at death times, censored
    subjects leave the risk set after their time."""
    by_t = _km_rows(
        spark,
        [(1, True), (2, False), (3, True), (4, True), (5, False)],
    )
    assert by_t[1]["n_risk"] == 5 and by_t[1]["n_event"] == 1
    assert by_t[1]["survival"] == pytest.approx(0.8)
    assert by_t[2]["survival"] == pytest.approx(0.8)  # censor: no drop
    assert by_t[3]["n_risk"] == 3
    assert by_t[3]["survival"] == pytest.approx(round(0.8 * 2 / 3, 6))
    assert by_t[4]["n_risk"] == 2
    assert by_t[4]["survival"] == pytest.approx(round(0.8 * 2 / 3 / 2, 6))
    assert by_t[5]["n_risk"] == 1 and by_t[5]["n_censored"] == 1
    # Nelson–Aalen: 1/5 + 1/3 + 1/2 at t=4
    assert by_t[4]["cum_hazard"] == pytest.approx(
        round(1 / 5 + 1 / 3 + 1 / 2, 6)
    )


def test_km_tied_death_and_censor(spark):
    """A subject censored at t is still at risk for the death at t."""
    by_t = _km_rows(spark, [(2, True), (2, False), (3, True)])
    assert by_t[2]["n_risk"] == 3
    assert by_t[2]["n_event"] == 1 and by_t[2]["n_censored"] == 1
    assert by_t[2]["survival"] == pytest.approx(round(2 / 3, 6))
    assert by_t[3]["n_risk"] == 1
    assert by_t[3]["survival"] == pytest.approx(0.0)


def _two_cliques(spark):
    """Two K4 cliques {0..3} and {4..7} joined by bridge 3-4 (m=13)."""
    edges = [
        (a, b)
        for grp in ([0, 1, 2, 3], [4, 5, 6, 7])
        for i, a in enumerate(grp)
        for b in grp[i + 1 :]
    ] + [(3, 4)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_modularity_two_cliques_hand_value(spark):
    """Perfect 2-way partition of the bridged-cliques graph:
    Q = 2 * (4*6*13 - 13^2) / (4*13^2) = 143/338."""
    e = _two_cliques(spark)
    labels = spark.createDataFrame(
        [(n, 0 if n < 4 else 1) for n in range(8)], "node long, label long"
    )
    rows = {r["community"]: r for r in modularity(e, labels).collect()}
    assert rows[0]["n_nodes"] == 4 and rows[0]["intra_edges"] == 6
    assert rows[0]["degree_sum"] == 13
    assert rows[0]["contribution"] == pytest.approx(round(143 / 676, 6))
    assert rows[0]["modularity"] == pytest.approx(round(143 / 338, 6))
    assert rows[1]["modularity"] == rows[0]["modularity"]


def test_modularity_lpa_beats_random_split(spark):
    """Composition: the LPA partition of the bridged cliques scores at
    least as high as the parity partition (which cuts both cliques)."""
    e = _two_cliques(spark)
    lpa = label_propagation(e, iters=4, label_space=32).select(
        "node", "label"
    )
    q_lpa = modularity(e, lpa).select("modularity").first()[0]
    parity = spark.createDataFrame(
        [(n, n % 2) for n in range(8)], "node long, label long"
    )
    q_par = modularity(e, parity).select("modularity").first()[0]
    assert q_lpa > q_par


def test_assortativity_star_is_minus_one(spark):
    """K1,3: hubs only connect to leaves -> perfectly disassortative."""
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    row = degree_assortativity(e).first()
    assert row["n_nodes"] == 4 and row["n_edges"] == 3
    assert row["assortativity"] == pytest.approx(-1.0)


def test_assortativity_regular_graph_is_null(spark):
    """4-cycle: every degree equal -> zero variance -> NULL."""
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    row = degree_assortativity(e).first()
    assert row["assortativity"] is None
