"""Experimentation statistics: CUPED variance reduction and the Poisson
bootstrap — the two tools an A/B measurement pipeline runs over routed
event streams after :mod:`cernan_spark.operators.rankstats` decides the
comparison is worth making.

* :func:`cuped_adjust` — CUPED (Deng et al., WSDM 2013): shrink the
  treatment-effect variance with a pre-experiment covariate;
  θ = cov(x,y)/var(x) estimated pooled, adjusted effect
  (ȳ_B−ȳ_A) − θ(x̄_B−x̄_A), plus the variance-reduction factor ρ².
* :func:`poisson_bootstrap_mean` — the distributed bootstrap (Chamandy
  et al., Google 2012): per (row, replicate) a DETERMINISTIC Poisson(1)
  multiplicity drawn from the portable 31-bit hash, so B resampled means
  come out of ONE pass and are bit-identical across engines and reruns —
  no RNG state, no driver-side resampling.

Float discipline: both operators reduce to exact BIGINT sums (cents ×
multiplicities) with doubles only at the final divisions; the bootstrap
CI bounds are order statistics of the B replicate means. The Poisson(1)
CDF thresholds are pinned decimal literals shared with the SQL oracle
(no cross-engine exp()).

Reference analog: cernan aggregates (buckets.rs) feed dashboards; these
close the loop from aggregation to decision the way its wavefront
quantiles feed alerting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cernan_spark.functions.porthash import MERSENNE31, portable_hash

#: P(Poisson(1) <= k) for k = 0..5, pinned literals (both engines parse
#: the same decimals; multiplicities are capped at 6, P(>6) ≈ 8e-5).
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]


def cuped_adjust(
    df: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
    treatment: str,
    control: str,
) -> DataFrame:
    """CUPED-adjusted treatment effect from per-unit exact-integer
    (pre, post) metrics. Returns ONE row: ``n_a, n_b, mean_y_a, mean_y_b,
    diff_raw, theta, diff_cuped, var_reduction``.

    θ and ρ² come from pooled exact sums (one map-side-combined
    aggregate); every double is a division of BIGINTs in a pinned op
    order. ``var_reduction`` is ρ² — the fraction of metric variance the
    covariate removes; diff_cuped = diff_raw − θ·(x̄_B − x̄_A).
    """
    g = df.select(
        F.when(F.col(variant_col) == treatment, 1)
        .when(F.col(variant_col) == control, 0)
        .alias("t"),
        F.col(pre_col).alias("x"),
        F.col(post_col).alias("y"),
    ).filter(F.col("t").isNotNull())
    agg = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("t").alias("n_b"),
        F.sum(F.col("t") * F.col("x")).alias("sx_b"),
        F.sum(F.col("t") * F.col("y")).alias("sy_b"),
    )
    n, n_b = F.col("n"), F.col("n_b")
    n_a = n - n_b
    sx_a = F.col("sx") - F.col("sx_b")
    sy_a = F.col("sy") - F.col("sy_b")
    cov_n = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_n = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary_n = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    theta = cov_n / varx_n
    mean_y_a = sy_a.cast("double") / n_a.cast("double")
    mean_y_b = F.col("sy_b").cast("double") / n_b.cast("double")
    mean_x_a = sx_a.cast("double") / n_a.cast("double")
    mean_x_b = F.col("sx_b").cast("double") / n_b.cast("double")
    diff_raw = mean_y_b - mean_y_a
    return agg.select(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        F.round(mean_y_a, 6).alias("mean_y_a"),
        F.round(mean_y_b, 6).alias("mean_y_b"),
        F.round(diff_raw, 6).alias("diff_raw"),
        F.round(theta, 6).alias("theta"),
        F.round(diff_raw - theta * (mean_x_b - mean_x_a), 6).alias(
            "diff_cuped"
        ),
        F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias(
            "var_reduction"
        ),
    )


def _poisson_multiplicity(u: Column) -> Column:
    """Deterministic Poisson(1) draw from a uniform in [0,1): the count
    of CDF thresholds at or below u (capped at 6)."""
    m = F.lit(0)
    for p in POISSON1_CDF:
        m = m + F.when(u >= F.lit(p), 1).otherwise(0)
    return m


def poisson_bootstrap_mean(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_reps: int = 32,
    lo_rank: int = 2,
    hi_rank: int = 31,
) -> DataFrame:
    """Bootstrap CI for the mean of an exact-integer column in ONE
    distributed pass. Each (row, replicate) gets multiplicity
    Poisson(1) from the portable hash of ``id:rep``; replicate means are
    ratios of exact sums; the CI is the (lo_rank, hi_rank) order
    statistics of the ``n_reps`` means (1-indexed — defaults ≈ a 94%
    interval at B=32).

    Scale shape: rows explode ×n_reps but collapse immediately in a
    map-side-combined (rep) aggregate — the shuffle carries n_reps rows
    per map task, and the final frame is n_reps rows sorted once.

    Output ONE row: ``n_rows, mean, boot_lo, boot_hi``.
    """
    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(value_col).alias("v"),
    )
    reps = base.select(
        "id",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("b"),
    )
    # the raw polynomial hash is NOT uniform on short keys (its value is
    # bounded by the key length); the fmix32 avalanche spreads it over
    # the full 32-bit range — same mixer (and SQL twin) as the KMV/HLL
    # sketches.
    from cernan_spark.operators.corpus import fmix32

    u = fmix32(
        portable_hash(
            F.concat(F.col("id"), F.lit(":"), F.col("b").cast("string"))
        )
    ).cast("double") / F.lit(4294967296.0)
    weighted = reps.select(
        "b",
        _poisson_multiplicity(u).alias("m"),
        "v",
    )
    per_rep = weighted.groupBy("b").agg(
        F.sum(F.col("m") * F.col("v")).alias("sv"),
        F.sum("m").alias("sm"),
    )
    means = per_rep.select(
        (F.col("sv").cast("double") / F.col("sm").cast("double")).alias(
            "mb"
        )
    )
    boot = means.agg(F.array_sort(F.collect_list("mb")).alias("ms"))
    stats = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_col).alias("sv_all"),
    )
    return stats.crossJoin(F.broadcast(boot)).select(
        "n_rows",
        F.round(
            F.col("sv_all").cast("double") / F.col("n_rows").cast("double"),
            6,
        ).alias("mean"),
        F.round(F.element_at("ms", lo_rank), 6).alias("boot_lo"),
        F.round(F.element_at("ms", hi_rank), 6).alias("boot_hi"),
    )


def ips_policy_value(
    logs: DataFrame,
    id_col: str,
    action_col: str,
    reward_col: str,
    propensity_col: str,
    target_col: str,
) -> DataFrame:
    """Off-policy evaluation of a candidate routing policy from logged
    (action, reward, propensity) rows — the counterfactual "what would
    the new router have earned" answer WITHOUT an experiment:

    * IPS  V̂ = (1/n) Σ 1[π(x)=a] · r / p   (unbiased, high variance)
    * SNIPS V̂ = Σ 1[π=a]·r/p / Σ 1[π=a]/p  (self-normalized)

    Propensities must be the LOGGING policy's true action probabilities
    (here exact dyadic rationals, so r/p and 1/p are single
    correctly-rounded divisions); both folds run id-sorted (pinned).

    Output ONE row: ``n, n_matched, v_logged, v_ips, v_snips``.
    """
    m = (F.col(action_col) == F.col(target_col)).cast("int")
    staged = logs.select(
        F.col(id_col).alias("id"),
        m.alias("m"),
        F.col(reward_col).alias("r"),
        F.col(propensity_col).alias("p"),
    )
    agg = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("n_matched"),
        F.sum("r").alias("r_sum"),
        F.array_sort(
            F.collect_list(F.struct("id", "m", "r", "p"))
        ).alias("xs"),
    )
    w_sum = F.aggregate(
        "xs",
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(
            x["m"] == 1, x["r"].cast("double") / x["p"]
        ).otherwise(F.lit(0.0)),
    )
    iw_sum = F.aggregate(
        "xs",
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(x["m"] == 1, F.lit(1.0) / x["p"]).otherwise(F.lit(0.0)),
    )
    return agg.select(
        "n",
        "n_matched",
        F.round(
            F.col("r_sum").cast("double") / F.col("n").cast("double"), 6
        ).alias("v_logged"),
        F.round(w_sum / F.col("n").cast("double"), 6).alias("v_ips"),
        F.when(
            F.col("n_matched") > 0, F.round(w_sum / iw_sum, 6)
        ).alias("v_snips"),
    )


def conformal_coverage(
    df: DataFrame,
    key_cols: list[str],
    split_col: str,
    resid_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal interval calibration over integer residuals: the
    calibration half (``split_col`` true) yields q̂ = the
    ⌈(n_cal+1)·(1−α)⌉-th smallest |residual| (a pure order statistic —
    α = alpha_num/alpha_den kept as integers so the rank is exact
    ceiling division); the held-out half reports empirical coverage of
    |resid| ≤ q̂, which should be ≳ 1−α when exchangeability holds —
    the distribution-free forecast-band check for any predictor.

    Integer-only until the final coverage division.

    Output per key: ``*key_cols, n_cal, n_test, qhat, coverage``.
    """
    staged = df.select(
        *key_cols, F.col(split_col).alias("cal"), F.col(resid_col).alias("e")
    )
    cal = staged.filter("cal").groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.array_sort(F.collect_list("e")).alias("es"),
    )
    num = alpha_den - alpha_num  # (1 - alpha) numerator over alpha_den
    qhat = cal.select(
        *key_cols,
        "n_cal",
        F.expr(
            f"element_at(es, CAST(least((n_cal + 1) * {num} + {alpha_den}"
            f" - 1, n_cal * {alpha_den}) / {alpha_den} AS INT))"
        ).alias("qhat"),
    )
    test = staged.filter(~F.col("cal"))
    return (
        test.join(qhat, key_cols)
        .groupBy(*key_cols, "n_cal", "qhat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("e") <= F.col("qhat"), 1).otherwise(0)
            ).alias("n_in"),
        )
        .select(
            *key_cols,
            "n_cal",
            "n_test",
            "qhat",
            F.round(
                F.col("n_in").cast("double") / F.col("n_test").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


def isotonic_calibration(
    df: DataFrame, score_col: str, y_col: str
) -> DataFrame:
    """Isotonic (PAV) calibration of a binary classifier on the
    distinct-score grain, via the minimax characterization of the
    pool-adjacent-violators fit: ŷ_k = max_{i≤k} min_{j≥k} mean(y on
    bins i..j). Raw rows are touched by ONE map-side-combined hash
    aggregate to the ≤B-row score rollup; the B² interval frame, the
    suffix-min window and the final max all run on that bounded rollup
    (B = distinct quantized scores, fixed by the scorer — never grows
    with corpus rows), so every join below broadcasts at any SF.

    Float discipline: prefix counts are exact integer window sums; the
    interval means are single divisions of BIGINTs; min/max over
    doubles are order-insensitive (exact comparisons), so no fold needs
    pinning. One ``round(·, 6)`` at emit.

    Returns one row per distinct score: ``score, n, n_pos, rate_raw,
    rate_iso`` with ``rate_iso`` non-decreasing in ``score``.
    """
    from pyspark.sql.window import Window

    bins = (
        df.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(y_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("p"),
        )
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = bins.select(
        "s",
        "n",
        "p",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("p").over(wcum).alias("cp"),
    )
    lo = pref.select(
        F.col("s").alias("si"),
        (F.col("cn") - F.col("n")).alias("n_lo"),
        (F.col("cp") - F.col("p")).alias("p_lo"),
    )
    hi = pref.select(
        F.col("s").alias("sj"),
        F.col("cn").alias("n_hi"),
        F.col("cp").alias("p_hi"),
    )
    ivl = lo.join(hi, lo["si"] <= hi["sj"]).select(
        "si",
        "sj",
        (
            (F.col("p_hi") - F.col("p_lo")).cast("double")
            / (F.col("n_hi") - F.col("n_lo")).cast("double")
        ).alias("avg"),
    )
    wsuf = (
        Window.partitionBy("si")
        .orderBy("sj")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    sufmin = ivl.select(
        "si", F.col("sj").alias("k"), F.min("avg").over(wsuf).alias("m")
    )
    fit = (
        sufmin.filter(F.col("si") <= F.col("k"))
        .groupBy("k")
        .agg(F.max("m").alias("iso"))
    )
    return (
        pref.join(fit, pref["s"] == fit["k"])
        .select(
            "s",
            "n",
            F.col("p").alias("n_pos"),
            F.round(F.col("p").cast("double") / F.col("n").cast("double"), 6)
            .alias("rate_raw"),
            F.round("iso", 6).alias("rate_iso"),
        )
        .withColumnRenamed("s", "score")
    )


def pinball_loss(
    df: DataFrame,
    key_cols: list[str],
    y_col: str,
    yhat_col: str,
    taus_tenths: list[int] = (1, 5, 9),
) -> DataFrame:
    """Mean pinball (quantile) loss of a forecaster at integer-tenth
    quantile levels τ = t/10: loss = mean(max(τ·e, (τ−1)·e)), e = y−ŷ.
    With integer residuals (cents) and integer tenths the per-row term
    ``max(t·e, (t−10)·e)`` is an exact BIGINT — the whole reduction is
    ONE map-side-combined integer aggregate per (key, τ), with the
    single division (by 10·n) at emit.

    Returns one row per (key, tau_tenths): ``…, tau, n, loss``.
    """
    t = F.explode(
        F.array(*[F.lit(int(x)) for x in taus_tenths])
    ).alias("t")
    e = (F.col(y_col) - F.col(yhat_col)).cast("long")
    rows = df.select(*key_cols, e.alias("e"), t)
    term = F.greatest(
        F.col("t") * F.col("e"), (F.col("t") - 10) * F.col("e")
    )
    return (
        rows.groupBy(*key_cols, "t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(term).cast("long").alias("l10"),
        )
        .select(
            *key_cols,
            F.col("t").alias("tau_tenths"),
            "n",
            F.round(
                F.col("l10").cast("double")
                / (F.lit(10).cast("double") * F.col("n").cast("double")),
                6,
            ).alias("loss"),
        )
    )
