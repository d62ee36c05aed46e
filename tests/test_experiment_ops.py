"""Hand-model checks for the experimentation operators (CUPED, Poisson
bootstrap) and deterministic label propagation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cernan_spark.operators.experiment import (
    cuped_adjust,
    poisson_bootstrap_mean,
)
from cernan_spark.operators.graph import label_propagation


def test_cuped_matches_hand_formulas(spark):
    """theta, adjusted diff and rho^2 equal the closed forms computed in
    Python over the same integer sums."""
    rows = [
        ("A", 10, 12), ("A", 20, 25), ("A", 30, 28), ("A", 40, 45),
        ("B", 12, 20), ("B", 22, 33), ("B", 28, 39), ("B", 44, 60),
    ]
    df = spark.createDataFrame(rows, "variant string, x long, y long")
    got = cuped_adjust(df, "variant", "x", "y", "B", "A").first()
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    ya = sum(ys[:4]) / 4
    yb = sum(ys[4:]) / 4
    xa = sum(xs[:4]) / 4
    xb = sum(xs[4:]) / 4
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert got["n_a"] == 4 and got["n_b"] == 4
    assert got["theta"] == pytest.approx(theta, abs=1e-6)
    assert got["diff_raw"] == pytest.approx(yb - ya, abs=1e-6)
    assert got["diff_cuped"] == pytest.approx(
        (yb - ya) - theta * (xb - xa), abs=1e-6
    )
    assert got["var_reduction"] == pytest.approx(rho2, abs=1e-6)
    assert 0.0 < got["var_reduction"] <= 1.0


def test_cuped_uncorrelated_covariate_changes_nothing(spark):
    """A constant covariate cannot be correlated with y... a covariate
    equal across variants with theta applied to a zero x-gap leaves the
    raw diff intact."""
    rows = [("A", v % 3, 10 + v) for v in range(6)] + [
        ("B", v % 3, 20 + v) for v in range(6)
    ]
    df = spark.createDataFrame(rows, "variant string, x long, y long")
    got = cuped_adjust(df, "variant", "x", "y", "B", "A").first()
    # x distribution identical across variants → x̄_B − x̄_A = 0
    assert got["diff_cuped"] == got["diff_raw"]


def test_poisson_bootstrap_deterministic_and_sane(spark):
    """Two runs produce identical CIs (hash-driven, no RNG); the CI
    brackets the point mean; a constant column collapses the CI."""
    rows = [(i, 100 + (i * 37) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = poisson_bootstrap_mean(df, "id", "v").first()
    b = poisson_bootstrap_mean(df, "id", "v").first()
    assert a == b
    assert a["n_rows"] == 300
    assert a["boot_lo"] <= a["mean"] <= a["boot_hi"]
    assert a["boot_lo"] < a["boot_hi"]
    const = spark.createDataFrame(
        [(i, 42) for i in range(200)], "id long, v long"
    )
    c = poisson_bootstrap_mean(const, "id", "v").first()
    assert c["boot_lo"] == 42.0 and c["boot_hi"] == 42.0


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge settle into exactly two
    communities — each clique adopts its own minimum label."""
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a + 10, b + 10) for a, b in c1]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = label_propagation(df, iters=6, label_space=32).collect()
    got = {r["node"]: r["label"] for r in out}
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n + 10] for n in range(4)}) == 1
    assert got[0] != got[10]
    sizes = {r["node"]: r["community_size"] for r in out}
    assert sizes[0] == 4 and sizes[10] == 4


def test_label_propagation_sync_tie_break_smallest(spark):
    """A path 0-1-2: node 1's neighbors tie → smallest label wins;
    fixed synchronous rounds are reproducible run to run."""
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    a = sorted(
        label_propagation(df, iters=3, label_space=32).collect()
    )
    b = sorted(
        label_propagation(df, iters=3, label_space=32).collect()
    )
    assert a == b
    got = {r["node"]: r["label"] for r in a}
    # round1: 0→1, 1→0 (tie {0,2}), 2→1; round2: 0→0, 1→1, 2→0;
    # round3: 0→1, 1→0, 2→1 (period-2 oscillation — deterministic)
    assert got == {0: 1, 1: 0, 2: 1}


def test_ips_policy_value_hand_model(spark):
    """IPS/SNIPS match hand arithmetic on a 4-row log; a policy
    matching nothing yields v_ips 0 and NULL v_snips."""
    from cernan_spark.operators.experiment import ips_policy_value

    rows = [
        # id, action, reward, propensity, target
        (1, "a", 10, 0.5, "a"),   # match: w=20, iw=2
        (2, "b", 8, 0.25, "a"),   # no match
        (3, "a", 6, 0.5, "a"),    # match: w=12, iw=2
        (4, "b", 100, 0.25, "b"), # match: w=400, iw=4
    ]
    df = spark.createDataFrame(
        rows, "id long, a string, r long, p double, pi string"
    )
    got = ips_policy_value(df, "id", "a", "r", "p", "pi").first()
    assert got["n"] == 4 and got["n_matched"] == 3
    assert got["v_logged"] == round(124 / 4, 6)
    assert got["v_ips"] == round((20 + 12 + 400) / 4, 6)
    assert got["v_snips"] == round((20 + 12 + 400) / 8, 6)

    from pyspark.sql import functions as F

    nomatch = df.withColumn("pi", F.lit("z"))
    g2 = ips_policy_value(nomatch, "id", "a", "r", "p", "pi").first()
    assert g2["v_ips"] == 0.0 and g2["v_snips"] is None


def test_ips_identity_policy_recovers_logged_value(spark):
    """Evaluating the LOGGING policy itself (pi = a) with correct
    propensities is unbiased in expectation; with uniform propensities
    it recovers v_logged·(1/p) scaling consistency via SNIPS = mean of
    matched rewards."""
    from cernan_spark.operators.experiment import ips_policy_value
    from pyspark.sql import functions as F

    rows = [(i, "a" if i % 2 else "b", 10 + i, 0.5) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, a string, r long, p double")
    df = df.withColumn("pi", F.col("a"))
    got = ips_policy_value(df, "id", "a", "r", "p", "pi").first()
    # every row matches with constant 1/p → SNIPS = plain mean
    assert got["v_snips"] == got["v_logged"]


def test_conformal_coverage_hand_model(spark):
    """Known residuals: q-hat is the exact ceil((n+1)(1-α)) order
    statistic; coverage counts test residuals ≤ q-hat."""
    from cernan_spark.operators.experiment import conformal_coverage

    cal = [1, 2, 3, 4, 5, 6, 7, 8, 9]           # n_cal = 9
    test = [2, 5, 9, 10, 11]                     # ≤ qhat?
    rows = [("k", True, e) for e in cal] + [("k", False, e) for e in test]
    df = spark.createDataFrame(rows, "k string, cal boolean, e long")
    got = conformal_coverage(df, ["k"], "cal", "e", 1, 10).first()
    # rank = ceil(10 * 0.9) = 9 → qhat = 9
    assert got["n_cal"] == 9 and got["qhat"] == 9
    assert got["n_test"] == 5
    assert got["coverage"] == round(3 / 5, 6)


def test_conformal_rank_caps_at_n_cal(spark):
    """Tiny calibration sets cap the rank at n_cal instead of
    overflowing the order statistic."""
    from cernan_spark.operators.experiment import conformal_coverage

    rows = [("k", True, 4), ("k", True, 7), ("k", False, 5),
            ("k", False, 8)]
    df = spark.createDataFrame(rows, "k string, cal boolean, e long")
    got = conformal_coverage(df, ["k"], "cal", "e", 1, 10).first()
    assert got["qhat"] == 7  # rank ceil(3*0.9)=3 → capped to n_cal=2
    assert got["coverage"] == 0.5


def test_isotonic_pools_violating_bins(spark):
    """Rates (1, 0, 0.5) violate monotonicity -> PAV pools all three
    bins to the global mean 0.5 (checked against the minimax form)."""
    from cernan_spark.operators.experiment import isotonic_calibration

    rows = [(1, 1), (2, 0), (3, 1), (3, 0)]
    df = spark.createDataFrame(rows, "score long, y int")
    got = {r["score"]: r for r in
           isotonic_calibration(df, "score", "y").collect()}
    assert [got[s]["rate_iso"] for s in (1, 2, 3)] == [0.5, 0.5, 0.5]
    assert got[1]["rate_raw"] == 1.0 and got[2]["rate_raw"] == 0.0


def test_isotonic_monotone_and_mass_preserving(spark):
    """On a seeded frame the fit is non-decreasing and preserves the
    total positive mass (sum n_k * iso_k == sum positives)."""
    from cernan_spark.operators.experiment import isotonic_calibration

    rows = [(i % 7, 1 if (i * 13) % 10 < (i % 7) + 2 else 0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "score long, y int")
    out = sorted(isotonic_calibration(df, "score", "y").collect(),
                 key=lambda r: r["score"])
    isos = [r["rate_iso"] for r in out]
    assert isos == sorted(isos)
    mass = sum(r["n"] * r["rate_iso"] for r in out)
    pos = sum(r["n_pos"] for r in out)
    assert abs(mass - pos) < 1e-3


def test_pinball_hand_values(spark):
    """Residuals {+2, -3}: loss(tau=.1)=1.45, (.5)=1.25, (.9)=1.05."""
    from cernan_spark.operators.experiment import pinball_loss

    df = spark.createDataFrame(
        [("m", 12, 10), ("m", 7, 10)], "k string, y long, yhat long"
    )
    got = {r["tau_tenths"]: r["loss"] for r in
           pinball_loss(df, ["k"], "y", "yhat", [1, 5, 9]).collect()}
    assert got[1] == pytest.approx(1.45)
    assert got[5] == pytest.approx(1.25)
    assert got[9] == pytest.approx(1.05)
