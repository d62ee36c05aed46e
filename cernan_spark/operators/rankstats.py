"""Rank-based statistics over distributed metric frames.

Three operators an experimentation / telemetry-comparison pipeline needs
next to the parametric ones in :mod:`cernan_spark.operators.anomaly`:

* :func:`mann_whitney` — the rank-sum A/B test (tie-corrected z), the
  nonparametric answer to "did variant B move the latency distribution?"
  where a t-test is wrong for skewed metrics.
* :func:`spearman_corr` — rank correlation between two paired series
  (monotone association without Pearson's linearity assumption).
* :func:`theil_sen` — per-series robust slope: the median of all pairwise
  slopes, immune to the outlier points that wreck the least-squares
  ``anomaly.metric_trend``.

Float discipline (the repo-wide IEEE-exact gate): tie-averaged ranks are
kept as INTEGER doubled ranks (2·rank = 2·|{v' < v}| + |{v' = v}| + 1),
so every rank sum, rank product and tie-correction term is exact BIGINT
arithmetic; the handful of doubles (z, rho, slopes, medians) are divisions
/ multiplications / sqrt of exact integers written in one pinned op order,
all correctly-rounded IEEE ops that DuckDB replays bit-identically. No
fold-order pinning is needed anywhere in this module.

Scale shape: ranking is ONE groupBy on the value (per distinct value, not
per row) plus ONE cumulative window over the distinct-value spine —
shuffle size O(|distinct values|), not O(rows). Theil–Sen is the only
O(n²)-per-key operator and is meant for BOUNDED per-key series (hourly
rollups: n ≈ hundreds → ≤ 10^5 pair rows per key, all distributed); the
docstring contract is the guard, not a silent sample.

Reference analog: cernan has no significance testing; this extends the
aggregation family (/root/reference/src/buckets.rs) the way an SRE
comparing two deploys actually reads the buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _doubled_ranks(df: DataFrame, value_col: str) -> DataFrame:
    """Distinct-value spine with exact doubled tie-averaged ranks:
    2·rank(v) = 2·cnt_less(v) + cnt_eq(v) + 1 (an exact BIGINT).
    One aggregate + one cumulative window over the distinct values."""
    per_v = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt_eq")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    return per_v.select(
        "v",
        "cnt_eq",
        (
            2 * F.coalesce(F.sum("cnt_eq").over(w), F.lit(0))
            + F.col("cnt_eq")
            + 1
        ).alias("rank2"),
    )


def mann_whitney(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann–Whitney U between two labeled samples. Returns ONE row:
    ``n_a, n_b, u_a, z, rank_biserial``.

    * ``u_a`` — U statistic for group A (wins + half-ties over all A×B
      pairs), computed from the exact integer rank sum, emitted as a
      double (it is a multiple of 0.5).
    * ``z`` — normal approximation with the tie correction
      Σ(t³−t) folded into the variance.
    * ``rank_biserial`` — 2·U_a/(n_a·n_b) − 1, the effect size in [−1, 1].
    """
    two = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    per_gv = two.groupBy("v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("na_v"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("nb_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_gv.select(
        "na_v",
        "nb_v",
        (F.col("na_v") + F.col("nb_v")).alias("t"),
        (
            2
            * F.coalesce(
                F.sum(F.col("na_v") + F.col("nb_v")).over(w), F.lit(0)
            )
            + (F.col("na_v") + F.col("nb_v"))
            + 1
        ).alias("rank2"),
    )
    agg = ranked.agg(
        F.sum("na_v").alias("n_a"),
        F.sum("nb_v").alias("n_b"),
        F.sum(F.col("rank2") * F.col("na_v")).alias("r2_a"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_sum"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u2_a = F.col("r2_a") - n_a * (n_a + 1)  # exact 2·U_a (BIGINT)
    num = (u2_a - n_a * n_b).cast("double") / 2.0
    var = (
        (n_a.cast("double") * n_b.cast("double") / 12.0)
        * (
            (n + 1).cast("double")
            - F.col("tie_sum").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    return agg.select(
        n_a,
        n_b,
        (u2_a.cast("double") / 2.0).alias("u_a"),
        F.round(num / F.sqrt(var), 6).alias("z"),
        F.round(
            u2_a.cast("double") / (n_a * n_b).cast("double") - 1.0, 6
        ).alias("rank_biserial"),
    )


def spearman_corr(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation between two paired columns. Returns ONE
    row ``n, rho`` where rho is Pearson over tie-averaged ranks, computed
    from exact BIGINT doubled-rank sums (overflow-safe for series up to
    ~10^4 points — pair this with per-window rollups, not raw rows).
    """
    rx = _doubled_ranks(df, x_col).select(
        F.col("v").alias("xv"), F.col("rank2").alias("rx2")
    )
    ry = _doubled_ranks(df, y_col).select(
        F.col("v").alias("yv"), F.col("rank2").alias("ry2")
    )
    j = (
        df.select(F.col(x_col).alias("xv"), F.col(y_col).alias("yv"))
        .join(rx, "xv")
        .join(ry, "yv")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
    )
    n = F.col("n")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        n, F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("rho")
    )


def theil_sen(
    df: DataFrame, keys: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Per-key Theil–Sen slope: the median over all C(n,2) pairwise
    slopes (y_j−y_i)/(x_j−x_i) with x_i < x_j. Even pair counts average
    the two middle slopes (a dyadic halving — exact). Returns one row per
    key: ``*keys, n_points, n_pairs, ts_slope``.

    x/y must be exact integers (epoch hours, cents); every slope is ONE
    correctly-rounded division, and the median is an order statistic —
    no accumulation at all. O(n²) per key by construction: feed rollup
    series (n ≲ 10³), never raw events.
    """
    a = df.select(
        *keys, F.col(x_col).alias("x1"), F.col(y_col).alias("y1")
    )
    b = df.select(
        *keys, F.col(x_col).alias("x2"), F.col(y_col).alias("y2")
    )
    pairs = a.join(b, keys).filter(F.col("x1") < F.col("x2"))
    slopes = pairs.select(
        *keys,
        (
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("x2") - F.col("x1")).cast("double")
        ).alias("slope"),
    )
    n_points = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_points"))
    agg = slopes.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.array_sort(F.collect_list("slope")).alias("ss"),
    )
    lo = F.expr("element_at(ss, CAST((n_pairs + 1) / 2 AS INT))")
    hi = F.expr("element_at(ss, CAST((n_pairs + 2) / 2 AS INT))")
    return agg.join(n_points, keys).select(
        *keys,
        "n_points",
        "n_pairs",
        F.round((lo + hi) / 2.0, 6).alias("ts_slope"),
    )


def kendall_tau(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Kendall tau-b between two paired columns: concordant minus
    discordant pairs over the tie-corrected pair counts,
    τ_b = (C − D) / sqrt((n0 − n1)(n0 − n2)). EVERY term is an exact
    BIGINT (pair counting, tie triangles); the square root and one
    division are the only doubles.

    O(n²) pair join by construction — feed bounded rollup series
    (hourly grain, n ≲ 10³ → ≤ 10⁶ pair rows, distributed), the same
    contract as :func:`theil_sen`. Rank-based τ degrades gracefully
    where Pearson (``metric_corr``) is wrecked by outliers and detects
    any monotone association like :func:`spearman_corr` — τ's pair
    semantics additionally give it a direct probabilistic reading
    (P(concordant) − P(discordant)).

    Output ONE row: ``n, concordant, discordant, tau_b``.
    """
    a = df.select(F.col(x_col).alias("x1"), F.col(y_col).alias("y1"))
    b = df.select(F.col(x_col).alias("x2"), F.col(y_col).alias("y2"))
    pairs = a.crossJoin(b).filter(
        (F.col("x1") < F.col("x2"))
        | ((F.col("x1") == F.col("x2")) & (F.col("y1") < F.col("y2")))
    )
    sgn = (F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    counts = pairs.agg(
        F.sum((sgn > 0).cast("long")).alias("c"),
        F.sum((sgn < 0).cast("long")).alias("d"),
    )
    n_row = df.agg(F.count(F.lit(1)).alias("n"))
    tx = (
        df.groupBy(F.col(x_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2)
            .cast("long")
            .alias("n1")
        )
    )
    ty = (
        df.groupBy(F.col(y_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2)
            .cast("long")
            .alias("n2")
        )
    )
    j = (
        counts.crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    num = (F.col("c") - F.col("d")).cast("double")
    den = F.sqrt(
        ((n0 - F.col("n1")) * (n0 - F.col("n2"))).cast("double")
    )
    return j.select(
        F.col("n"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.round(num / den, 6).alias("tau_b"),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    alpha_c: float = 1.358,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: the maximum ECDF gap between
    two labeled samples, with the large-sample α=0.05 rejection rule
    D > c(α)·sqrt((n_a+n_b)/(n_a·n_b)) (c(0.05)=1.358, a pinned
    literal). The distribution-shape companion to
    :func:`mann_whitney` — KS sees variance/shape changes a pure
    location test misses.

    Exactness: the ECDF gap numerator |F_a·n_a·n_b − F_b·n_a·n_b| =
    |cum_a·n_b − cum_b·n_a| is an exact BIGINT per distinct value; max
    is order-free; D divides once at emit. Same O(|distinct|) rank
    spine as the other rank statistics.

    Output ONE row: ``n_a, n_b, d_stat, d_crit, reject``.
    """
    two = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    per_v = two.groupBy("v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    totals = per_v.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    agg = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            ).alias("d_num"),
        )
    )
    d = F.col("d_num").cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    crit = F.lit(alpha_c) * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double")
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(d, 6).alias("d_stat"),
        F.round(crit, 6).alias("d_crit"),
        (d > crit).alias("reject"),
    )


def anova_oneway(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way ANOVA F over k groups of an exact-integer metric — the
    omnibus "do ANY of these differ" gate run before the pairwise tests
    in this module (mann_whitney compares two; this screens k):

        SSB = Σ_g S_g²/n_g − S²/n      SSW = ΣΣ y² − Σ_g S_g²/n_g
        F   = (SSB/(k−1)) / (SSW/(n−k))      η² = SSB / SST

    Float discipline: S_g, n_g, S, n and Σy² are exact BIGINTs (values
    must be pre-scaled integers — cents); each S_g²/n_g is one exact
    product over one division, folded in group-sorted order; SSB/SSW/F/
    η² are a fixed chain of IEEE subtract/divide on those terms, so the
    DuckDB replay is bit-identical. S² must fit int64 — fine for cent
    sums ≲ 3·10⁹ (sf ≤ 1); rescale upstream beyond that.

    Plan shape: ONE map-side-combined aggregate to the group grain,
    one fold over the ≤k-row rollup. Returns one row: ``k, n,
    ss_between, ss_within, f_stat, eta_sq`` (round 6; F NULL when a
    degenerate k=1 or n=k leaves a zero df).
    """
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col(value_col).cast("long")).alias("s_g"),
        F.sum(
            F.col(value_col).cast("long") * F.col(value_col).cast("long")
        ).alias("ss_g"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "grp",
                    (
                        (F.col("s_g") * F.col("s_g")).cast("double")
                        / F.col("n_g").cast("double")
                    ).alias("t"),
                )
            )
        ).alias("ts"),
    )
    t_sum = F.aggregate("ts", F.lit(0.0), lambda acc, t: acc + t["t"])
    c = (F.col("s") * F.col("s")).cast("double") / F.col("n").cast("double")
    ssb = t_sum - c
    ssw = F.col("ss").cast("double") - t_sum
    sst = F.col("ss").cast("double") - c
    f_stat = F.when(
        (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw != 0.0),
        (ssb / (F.col("k") - 1).cast("double"))
        / (ssw / (F.col("n") - F.col("k")).cast("double")),
    )
    return tot.select(
        "k",
        "n",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(
            F.when(sst != 0.0, ssb / sst), 6
        ).alias("eta_sq"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test across k treatments in matched blocks — the
    BLOCKED, rank-based omnibus: where :func:`anova_oneway` pools all
    observations, this ranks treatments WITHIN each block (hour), so a
    shared hourly level shift cancels instead of inflating the error
    term. Only COMPLETE blocks (all k treatments present exactly once)
    enter; ties take average ranks via the module's doubled-rank
    arithmetic (2·min_rank + cnt − 1, exact ints).

        χ²_F = 3·Σ_j R2_j² / (n·k·(k+1)) − 3·n·(k+1)

    with R2_j the doubled rank sum of treatment j over n blocks (the
    doubled form folds the usual 12/(nk(k+1))·ΣR_j² constant exactly).

    Float discipline: ranks and R2_j are exact BIGINTs; χ²_F is two
    exact integer products over ONE division minus an exact integer —
    no folds, no sqrt.

    Plan shape: one within-block rank window (partitioned by block —
    parallel across blocks), one treatment-grain aggregate, one
    broadcast of the k-row rollup's exact Σ.

    Output per treatment: ``treatment, n_blocks, r2_sum, mean_rank,
    chi2_f`` (round 6; chi2_f repeated, the whole-result broadcast
    convention).
    """
    k_treat = df.select(treatment_col).distinct().count()
    complete = (
        df.groupBy(block_col)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.countDistinct(treatment_col).alias("ct"),
        )
        .filter((F.col("c") == k_treat) & (F.col("ct") == k_treat))
        .select(block_col)
    )
    obs = df.join(complete, block_col).select(
        F.col(block_col).alias("b"),
        F.col(treatment_col).alias("trt"),
        F.col(value_col).cast("long").alias("v"),
    )
    wb = Window.partitionBy("b").orderBy("v")
    wtie = Window.partitionBy("b", "v")
    ranked = obs.select(
        "b",
        "trt",
        (
            F.lit(2) * F.rank().over(wb)
            + F.count(F.lit(1)).over(wtie)
            - F.lit(1)
        )
        .cast("long")
        .alias("r2"),
    )
    per_trt = ranked.groupBy("trt").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("r2").alias("r2_sum"),
    )
    tot = per_trt.agg(
        F.max("n_blocks").alias("n"),
        F.sum(F.col("r2_sum") * F.col("r2_sum")).alias("s_r2sq"),
    )
    k_lit = F.lit(int(k_treat)).cast("long")
    chi2 = (
        F.lit(3.0)
        * F.col("s_r2sq").cast("double")
        / (F.col("n") * k_lit * (k_lit + 1)).cast("double")
        - (F.lit(3) * F.col("n") * (k_lit + 1)).cast("double")
    )
    return (
        per_trt.crossJoin(F.broadcast(tot.select("n", chi2.alias("chi2_f"))))
        .select(
            F.col("trt").alias("treatment"),
            "n_blocks",
            "r2_sum",
            F.round(
                F.col("r2_sum").cast("double")
                / (F.lit(2) * F.col("n_blocks")).cast("double"),
                6,
            ).alias("mean_rank"),
            F.round("chi2_f", 6).alias("chi2_f"),
        )
        .orderBy("treatment")
    )


def kruskal_wallis(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Kruskal–Wallis H — the rank-based k-group omnibus that completes
    the module's test triangle: :func:`anova_oneway` pools raw values
    (parametric), :func:`friedman_test` ranks within matched blocks;
    this ranks the POOLED sample, so it is the k-group generalization
    of :func:`mann_whitney`:

        H = 12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1)
        H_adj = H / (1 − Σ(t³−t)/(N³−N))     (tie correction)

    Float discipline: pooled doubled tie-averaged ranks (2·min_rank +
    cnt − 1) are exact BIGINTs, as are R2_j, Σ(t³−t) and N³−N; each
    R2_j²/n_j is one exact product over one division folded in group
    order; H is a fixed chain on those (the doubled form folds the /4
    into 3/(N(N+1))).

    Output per group: ``grp, n_g, r2_sum, mean_rank, h, h_adj``
    (round 6; h repeated — the whole-result broadcast convention;
    h_adj NULL when every value ties).
    """
    obs = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
    )
    wall = Window.orderBy("v")
    wtie = Window.partitionBy("v")
    ranked = obs.select(
        "grp",
        "v",
        (
            F.lit(2) * F.rank().over(wall)
            + F.count(F.lit(1)).over(wtie)
            - F.lit(1)
        )
        .cast("long")
        .alias("r2"),
    )
    per_grp = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("r2").alias("r2_sum"),
    )
    ties = obs.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    ).agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_sum"
        )
    )
    tot = per_grp.agg(
        F.sum("n_g").alias("n"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "grp",
                        (
                            (F.col("r2_sum") * F.col("r2_sum")).cast(
                                "double"
                            )
                            / F.col("n_g").cast("double")
                        ).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, t: acc + t["t"],
        ).alias("sr"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n")
    h = (
        F.lit(3.0) * F.col("sr") / (n * (n + 1)).cast("double")
        - (F.lit(3) * (n + 1)).cast("double")
    )
    corr = F.lit(1.0) - F.col("tie_sum").cast("double") / (
        n * n * n - n
    ).cast("double")
    stats = tot.select(
        h.alias("h_raw"),
        F.when(corr != 0.0, h / corr).alias("h_adj_raw"),
    )
    return (
        per_grp.crossJoin(F.broadcast(stats))
        .select(
            "grp",
            "n_g",
            "r2_sum",
            F.round(
                F.col("r2_sum").cast("double")
                / (F.lit(2) * F.col("n_g")).cast("double"),
                6,
            ).alias("mean_rank"),
            F.round("h_raw", 6).alias("h"),
            F.round("h_adj_raw", 6).alias("h_adj"),
        )
        .orderBy("grp")
    )


def mcnemar_test(
    paired: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """McNemar's test on paired binary outcomes — "is classifier A
    right where B is wrong more often than vice versa", the PAIRED
    comparison that a naive two-proportion look gets wrong because
    both run on the SAME items:

        χ² = (n₀₁ − n₁₀)² / (n₀₁ + n₁₀)     (discordant pairs only)

    Float discipline: the 2×2 concordance counts are exact BIGINTs
    from one aggregate; χ² is one exact-integer square over one
    division (NULL when no discordant pairs).

    Output one row: ``n, n_both, n_a_only, n_b_only, n_neither,
    chi2`` (round 6).
    """
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    agg = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((a & b).cast("long")).alias("n_both"),
        F.sum((a & ~b).cast("long")).alias("n_a_only"),
        F.sum((~a & b).cast("long")).alias("n_b_only"),
        F.sum((~a & ~b).cast("long")).alias("n_neither"),
    )
    d = F.col("n_a_only") - F.col("n_b_only")
    s = F.col("n_a_only") + F.col("n_b_only")
    return agg.select(
        "n",
        "n_both",
        "n_a_only",
        "n_b_only",
        "n_neither",
        F.round(
            F.when(s > 0, (d * d).cast("double") / s.cast("double")), 6
        ).alias("chi2"),
    )


def runs_test(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    x_col: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test per key: is a binary stream RANDOM, or
    does it clump (fewer runs) / alternate (more runs) than chance —
    the independence check to run BEFORE trusting :func:`mann_whitney`
    or the SPRT on an ordered stream:

        E[R] = 1 + 2n₁n₀/n
        Var  = 2n₁n₀(2n₁n₀ − n) / (n²(n−1))
        Z    = (R − E[R]) / √Var

    Float discipline: n₁, n₀ and the run count R (1 + Σ transitions,
    one lag window) are exact BIGINTs; E, Var, Z are a fixed chain of
    exact-product divisions and one sqrt (NULL when a side is empty).

    Output per key: ``*key_cols, n, n1, n0, runs, e_runs, z``
    (round 6).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    seq = df.select(
        *key_cols,
        F.col(x_col).cast("int").alias("x"),
        F.lag(F.col(x_col).cast("int")).over(w).alias("xp"),
    )
    agg = seq.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("n1"),
        (
            F.lit(1)
            + F.sum(
                (F.col("xp").isNotNull() & (F.col("x") != F.col("xp")))
                .cast("long")
            )
        ).cast("long").alias("runs"),
    )
    n0 = F.col("n") - F.col("n1")
    two = F.lit(2) * F.col("n1") * n0
    e_runs = F.lit(1.0) + two.cast("double") / F.col("n").cast("double")
    var = (two * (two - F.col("n"))).cast("double") / (
        F.col("n") * F.col("n") * (F.col("n") - 1)
    ).cast("double")
    ok = (F.col("n1") > 0) & (n0 > 0) & (F.col("n") > 1)
    return agg.select(
        *key_cols,
        "n",
        "n1",
        n0.alias("n0"),
        "runs",
        F.round(F.when(ok, e_runs), 6).alias("e_runs"),
        F.round(
            F.when(
                ok & (var > 0.0),
                (F.col("runs").cast("double") - e_runs) / F.sqrt(var),
            ),
            6,
        ).alias("z"),
    ).orderBy(*key_cols)


def welch_t(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance t with Welch–Satterthwaite df and the
    Cohen's d / Hedges-pooled effect size — the parametric two-group
    comparison that doesn't assume equal spread (mann_whitney drops
    the distributional assumption entirely; this keeps means but not
    variances):

        t  = (m₁ − m₂) / √(s₁²/n₁ + s₂²/n₂)
        df = (v₁+v₂)² / (v₁²/(n₁−1) + v₂²/(n₂−1)),  v_i = s_i²/n_i
        d  = (m₁ − m₂) / s_pooled

    Float discipline: n, S, ΣX² are exact BIGINTs; each sample
    variance is the exact rational (n·ΣX² − S²)/(n(n−1)) — ONE
    division; every later step is a fixed chain of IEEE ops incl. two
    correctly-rounded sqrts. S² must fit int64 (cent sums ≲ 3·10⁹).

    Output one row: ``n1, n2, mean1, mean2, t, df_welch, cohen_d``
    (round 6; NULLs when a group has < 2 rows or zero variance makes
    the denominator 0).
    """
    g = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(
            (F.col(group_col) == F.lit(group_a)).alias("is_a")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(value_col).cast("long")).alias("s"),
            F.sum(
                F.col(value_col).cast("long")
                * F.col(value_col).cast("long")
            ).alias("ss"),
        )
    )
    a = g.filter("is_a").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    b = g.filter(~F.col("is_a")).select(
        F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("ss").alias("ss2")
    )
    j = a.crossJoin(b)
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    m2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    # greatest(·,1): a single-row group would make the denominator 0 and
    # ANSI mode faults even under a later when()-guard; the clamped
    # value only flows into outputs that the `ok` guard NULLs anyway
    var1 = (F.col("n1") * F.col("ss1") - F.col("s1") * F.col("s1")).cast(
        "double"
    ) / F.greatest(F.col("n1") * (F.col("n1") - 1), F.lit(1)).cast("double")
    var2 = (F.col("n2") * F.col("ss2") - F.col("s2") * F.col("s2")).cast(
        "double"
    ) / F.greatest(F.col("n2") * (F.col("n2") - 1), F.lit(1)).cast("double")
    v1 = var1 / F.col("n1").cast("double")
    v2 = var2 / F.col("n2").cast("double")
    ok = (F.col("n1") > 1) & (F.col("n2") > 1)
    se = F.sqrt(v1 + v2)
    sp = F.sqrt(
        (
            (F.col("n1") - 1).cast("double") * var1
            + (F.col("n2") - 1).cast("double") * var2
        )
        / (F.col("n1") + F.col("n2") - 2).cast("double")
    )
    return j.select(
        "n1",
        "n2",
        F.round(m1, 6).alias("mean1"),
        F.round(m2, 6).alias("mean2"),
        F.round(
            F.when(ok & (se > 0.0), (m1 - m2) / se), 6
        ).alias("t"),
        F.round(
            F.when(
                ok & (v1 + v2 > 0.0),
                ((v1 + v2) * (v1 + v2))
                / (
                    v1 * v1 / (F.col("n1") - 1).cast("double")
                    + v2 * v2 / (F.col("n2") - 1).cast("double")
                ),
            ),
            6,
        ).alias("df_welch"),
        F.round(
            F.when(ok & (sp > 0.0), (m1 - m2) / sp), 6
        ).alias("cohen_d"),
    )


def brown_forsythe(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test: one-way ANOVA on the
    absolute deviations from each group's MEDIAN — the robust Levene
    variant, and the assumption check :func:`anova_oneway` itself
    needs ("are the group spreads even comparable"). Composes directly
    onto anova_oneway over the doubled deviations |2x − (lo+hi)|
    (lo/hi the two middle order statistics), so every deviation stays
    an exact BIGINT even when the median is a half-integer.

    Output: anova_oneway's one-row frame over the deviations —
    ``k, n, ss_between, ss_within, f_stat, eta_sq``.
    """
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        F.row_number()
        .over(
            Window.partitionBy(group_col).orderBy(
                F.col(value_col).cast("long")
            )
        )
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(group_col))
        .cast("long")
        .alias("cnt"),
    )
    mids = ranked.filter(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    ).groupBy("g").agg(F.sum("v").alias("lohi"), F.count(F.lit(1)).alias("k"))
    # odd n keeps ONE middle row -> double it so lohi is always lo+hi
    med2 = mids.select(
        "g",
        F.when(F.col("k") == 1, F.col("lohi") * 2)
        .otherwise(F.col("lohi"))
        .alias("m2"),
    )
    dev = ranked.join(F.broadcast(med2), "g").select(
        "g", F.abs(F.lit(2) * F.col("v") - F.col("m2")).alias("dev2")
    )
    return anova_oneway(dev, "g", "dev2")
