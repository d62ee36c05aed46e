"""Hand-model checks for the rank statistics operators: Mann-Whitney U
(pairwise-definition equality, tie correction), Spearman rho (brute-force
tie-averaged ranks) and Theil-Sen (median of pairwise slopes)."""

from __future__ import annotations

import math

import pytest

from cernan_spark.operators.rankstats import (
    mann_whitney,
    spearman_corr,
    theil_sen,
)


def _avg_ranks(vals):
    s = sorted(vals)
    pos = {}
    for i, v in enumerate(s, start=1):
        pos.setdefault(v, []).append(i)
    return [sum(pos[v]) / len(pos[v]) for v in vals]


def test_mann_whitney_matches_pairwise_definition(spark):
    """U_a equals wins + half-ties over all A x B pairs; z matches the
    tie-corrected normal approximation computed by hand."""
    a = [3, 5, 5, 7, 9, 2, 5]
    b = [1, 5, 4, 2, 8, 5, 5, 3]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = mann_whitney(df, "g", "v", "a", "b").first()
    u_a = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["u_a"] == u_a
    assert got["rank_biserial"] == pytest.approx(
        2 * u_a / (len(a) * len(b)) - 1, abs=1e-6
    )
    n, na, nb = len(a) + len(b), len(a), len(b)
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(a + b).values())
    var = (na * nb / 12) * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - na * nb / 2) / math.sqrt(var)
    assert got["z"] == pytest.approx(z, abs=1e-6)


def test_mann_whitney_symmetric_is_zero(spark):
    """Identical samples give U_a = n^2/2, z = 0, effect size 0."""
    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = mann_whitney(df, "g", "v", "a", "b").first()
    assert got["u_a"] == 50.0
    assert got["z"] == 0.0 and got["rank_biserial"] == 0.0


def test_spearman_matches_bruteforce(spark):
    """rho equals Pearson over tie-averaged ranks computed in Python."""
    xs = [10, 20, 20, 5, 7, 7, 30, 1]
    ys = [3, 9, 8, 2, 2, 5, 9, 1]
    df = spark.createDataFrame(
        list(zip(xs, ys)), "xv long, yv long"
    )
    got = spearman_corr(df, "xv", "yv").first()
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    assert got["n"] == n
    assert got["rho"] == pytest.approx(cov / math.sqrt(vx * vy), abs=1e-6)


def test_spearman_perfect_monotone(spark):
    """Any strictly increasing mapping gives rho exactly 1; reversing
    gives -1."""
    xs = [1, 4, 9, 16, 25]
    inc = spark.createDataFrame(
        [(x, x * x + 7) for x in xs], "xv long, yv long"
    )
    dec = spark.createDataFrame(
        [(x, 1000 - x * x) for x in xs], "xv long, yv long"
    )
    assert spearman_corr(inc, "xv", "yv").first()["rho"] == 1.0
    assert spearman_corr(dec, "xv", "yv").first()["rho"] == -1.0


def test_theil_sen_matches_bruteforce_and_resists_outlier(spark):
    """Median pairwise slope on a clean line is the line's slope even
    when one point is wrecked; least squares would move."""
    pts = [(x, 3 * x + 2) for x in range(9)] + [(9, 1000)]
    df = spark.createDataFrame(
        [("s", x, y) for x, y in pts], "k string, x long, y long"
    )
    got = theil_sen(df, ["k"], "x", "y").first()
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for x2, y2 in pts[i + 1 :]
        if x2 != x1
    )
    k = len(slopes)
    med = (slopes[(k - 1) // 2] + slopes[k // 2]) / 2
    assert got["n_points"] == 10 and got["n_pairs"] == k
    assert got["ts_slope"] == pytest.approx(med, abs=1e-6)
    assert got["ts_slope"] == 3.0  # outlier did not move the median


def test_theil_sen_even_pairs_average(spark):
    """Four collinear-except-one points with an even pair count: the
    median averages the two middle slopes (dyadic halving, exact)."""
    pts = [(0, 0), (1, 1), (2, 4), (3, 3)]
    df = spark.createDataFrame(
        [("s", x, y) for x, y in pts], "k string, x long, y long"
    )
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for x2, y2 in pts[i + 1 :]
    )
    med = (slopes[2] + slopes[3]) / 2
    got = theil_sen(df, ["k"], "x", "y").first()
    assert got["n_pairs"] == 6
    assert got["ts_slope"] == pytest.approx(med, abs=1e-6)


def test_kendall_tau_matches_bruteforce(spark):
    """tau-b equals the textbook computation with ties in both
    columns."""
    xs = [1, 2, 2, 3, 5, 5, 7]
    ys = [2, 2, 3, 1, 6, 6, 6]
    from cernan_spark.operators.rankstats import kendall_tau

    df = spark.createDataFrame(list(zip(xs, ys)), "xv long, yv long")
    got = kendall_tau(df, "xv", "yv").first()
    n = len(xs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[j] - xs[i]) * (ys[j] - ys[i])
            c += s > 0
            d += s < 0
    from collections import Counter
    import math

    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(xs).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(ys).values())
    tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    assert got["concordant"] == c and got["discordant"] == d
    assert got["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_kendall_tau_perfect_orders(spark):
    """Strictly increasing → +1; strictly decreasing → −1."""
    from cernan_spark.operators.rankstats import kendall_tau

    inc = spark.createDataFrame(
        [(i, i * i) for i in range(1, 9)], "xv long, yv long"
    )
    dec = spark.createDataFrame(
        [(i, 100 - i) for i in range(1, 9)], "xv long, yv long"
    )
    assert kendall_tau(inc, "xv", "yv").first()["tau_b"] == 1.0
    assert kendall_tau(dec, "xv", "yv").first()["tau_b"] == -1.0


def test_ks_two_sample_matches_bruteforce(spark):
    """D equals the max ECDF gap computed in Python; identical samples
    give D = 0 and no rejection; disjoint samples give D = 1 and
    rejection."""
    from cernan_spark.operators.rankstats import ks_two_sample

    a = [1, 3, 3, 5, 9, 11]
    b = [2, 3, 8, 8, 10, 12, 14]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = ks_two_sample(df, "g", "v", "a", "b").first()
    vals = sorted(set(a + b))
    dmax = max(
        abs(
            sum(x <= v for x in a) / len(a)
            - sum(x <= v for x in b) / len(b)
        )
        for v in vals
    )
    assert got["d_stat"] == pytest.approx(dmax, abs=1e-6)

    same = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in a], "g string, v long"
    )
    g2 = ks_two_sample(same, "g", "v", "a", "b").first()
    assert g2["d_stat"] == 0.0 and bool(g2["reject"]) is False

    disj = spark.createDataFrame(
        [("a", v) for v in range(50)] + [("b", v + 100) for v in range(50)],
        "g string, v long",
    )
    g3 = ks_two_sample(disj, "g", "v", "a", "b").first()
    assert g3["d_stat"] == 1.0 and bool(g3["reject"]) is True
