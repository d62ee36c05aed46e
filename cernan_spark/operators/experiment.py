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


def sprt_decision(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    x_col: str,
    p0: float = 0.5,
    p1: float = 0.6,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Wald's sequential probability ratio test per key over an ordered
    Bernoulli stream: H0: p = p0 vs H1: p = p1, stopping at the first
    crossing of the log boundaries A = ln((1−β)/α), B = ln(β/(1−α)) —
    the always-valid sequential sibling of the fixed-horizon tests in
    :mod:`cernan_spark.operators.rankstats` (peeking at those inflates
    α; the SPRT is DESIGNED to be read after every event).

    Float discipline: the log-likelihood ratio after t events with k
    successes is the CLOSED FORM k·ln(p1/p0) + (t−k)·ln((1−p1)/(1−p0))
    — k and t are exact window integers, so each row's llr is two
    int×double products and one add, NOT a sequential float fold; the
    boundary constants are engine-side ln of shared literals. Both
    engines therefore compare identical doubles.

    Plan shape: one window pass for (t, k), one hash aggregate per key —
    min-struct picks the earliest crossing without a second sort.

    Output per key: ``*key_cols, n_total, k_total, decision
    ('accept_h1'|'accept_h0'|'continue'), n_decide, k_decide,
    llr_decide`` (round 6; NULLs when the walk never crosses).

    Reference analog: cernan's DelayFilter accepts/rejects per event on
    a static bound (src/filter/delay_filter.rs:35-60); the SPRT is the
    adaptive version of the same accept/reject walk.
    """
    from pyspark.sql import Window

    lw = F.log(F.lit(p1) / F.lit(p0))
    ll = F.log((F.lit(1.0) - F.lit(p1)) / (F.lit(1.0) - F.lit(p0)))
    ln_a = F.log((F.lit(1.0) - F.lit(beta)) / F.lit(alpha))
    ln_b = F.log(F.lit(beta) / (F.lit(1.0) - F.lit(alpha)))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = stream.select(
        *key_cols,
        F.row_number()
        .over(Window.partitionBy(*key_cols).orderBy(*order_cols))
        .cast("long")
        .alias("__t"),
        F.sum(F.col(x_col).cast("long")).over(w).alias("__k"),
    ).withColumn(
        "__llr",
        F.col("__k").cast("double") * lw
        + (F.col("__t") - F.col("__k")).cast("double") * ll,
    )
    hit = F.when(
        (F.col("__llr") >= ln_a) | (F.col("__llr") <= ln_b),
        F.struct(
            F.col("__t").alias("t"),
            F.col("__k").alias("k"),
            F.col("__llr").alias("llr"),
        ),
    )
    agg = walk.groupBy(*key_cols).agg(
        F.max("__t").alias("n_total"),
        F.max("__k").alias("k_total"),
        F.min(hit).alias("first_hit"),
    )
    fh = F.col("first_hit")
    return agg.select(
        *key_cols,
        "n_total",
        "k_total",
        F.when(fh.isNull(), F.lit("continue"))
        .when(fh["llr"] >= ln_a, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        fh["t"].alias("n_decide"),
        fh["k"].alias("k_decide"),
        F.round(fh["llr"], 6).alias("llr_decide"),
    ).orderBy(*key_cols)


def operating_point(
    scored: DataFrame, score_col: str, y_col: str
) -> DataFrame:
    """Threshold selection for a binary scorer: sweep every distinct
    score as a ≥-threshold, maximize Youden's J = tpr − fpr, and report
    the full confusion + quality summary at the chosen point — the
    operator that turns a ROC curve into a deployable cutoff (compose
    downstream of the roc_curve query; this is its argmax).

    Float discipline: with P positives and N negatives, J has the
    shared denominator P·N, so the argmax runs on the exact BIGINT
    numerator tp·N − fp·P (ties → HIGHER threshold, the conservative
    cut); MCC's numerator tp·tn − fp·fn is exact, its denominator one
    correctly-rounded sqrt of an exact ≤n⁴ product; J, F1, balanced
    accuracy are single divisions at emit.

    Plan shape: ONE hash aggregate to the distinct-score grain, a
    window over that bounded rollup, a 1-row argmax — identical scan
    profile to binary_auc (operators/similarity.py).

    Output: one row ``threshold, tp, fp, tn, fn, youden_j, f1, mcc,
    balanced_acc`` (round 6).
    """
    from pyspark.sql import Window

    g = scored.groupBy(F.col(score_col).alias("threshold")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col(y_col).cast("long")).alias("pos_g"),
    )
    wdesc = (
        Window.orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "threshold",
        F.sum("pos_g").over(wdesc).alias("tp"),
        (F.sum("n_g").over(wdesc) - F.sum("pos_g").over(wdesc)).alias("fp"),
        F.sum("pos_g").over(wall).alias("p_all"),
        (F.sum("n_g").over(wall) - F.sum("pos_g").over(wall)).alias("n_all"),
    ).select(
        "threshold",
        "tp",
        "fp",
        (F.col("p_all") - F.col("tp")).alias("fn"),
        (F.col("n_all") - F.col("fp")).alias("tn"),
        "p_all",
        "n_all",
        (F.col("tp") * F.col("n_all") - F.col("fp") * F.col("p_all")).alias(
            "j_num"
        ),
    )
    best = c.orderBy(
        F.col("j_num").desc(), F.col("threshold").desc()
    ).limit(1)
    mcc_num = F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")
    mcc_den = F.sqrt(
        (
            (F.col("tp") + F.col("fp"))
            * (F.col("tp") + F.col("fn"))
            * (F.col("tn") + F.col("fp"))
            * (F.col("tn") + F.col("fn"))
        ).cast("double")
    )
    return best.select(
        "threshold",
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(
            F.col("j_num").cast("double")
            / (F.col("p_all") * F.col("n_all")).cast("double"),
            6,
        ).alias("youden_j"),
        F.round(
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast(
                "double"
            ),
            6,
        ).alias("f1"),
        F.round(
            F.when(mcc_den != 0.0, mcc_num.cast("double") / mcc_den), 6
        ).alias("mcc"),
        F.round(
            (
                F.col("tp") * F.col("n_all") + F.col("tn") * F.col("p_all")
            ).cast("double")
            / (F.lit(2) * F.col("p_all") * F.col("n_all")).cast("double"),
            6,
        ).alias("balanced_acc"),
    )


def cmh_odds(
    tables: DataFrame,
    stratum_col: str,
    exposed_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran–Mantel–Haenszel pooled odds ratio across strata — the
    confounder-adjusted effect estimate an experimentation pipeline
    reports when a marginal 2×2 table would Simpson-flip (the pooled
    complement of the per-stratum tests in rankstats):

        OR_CMH = Σ_i (a_i·d_i / n_i)  /  Σ_i (b_i·c_i / n_i)

    over per-stratum tables [[a=exposed∧outcome, b=exposed∧¬outcome],
    [c=¬exposed∧outcome, d=¬exposed∧¬outcome]].

    Float discipline: a,b,c,d are exact BIGINTs; each stratum term is
    ONE exact-integer product over one exact-integer division, and both
    CMH sums are LEFT folds over the stratum-sorted term list, so the
    DuckDB replay is bit-identical; per-stratum OR is a single division
    (NULL when b·c = 0).

    Plan shape: ONE hash aggregate to the stratum grain (map-side
    combined booleans→counts), one fold over the bounded stratum list
    broadcast back onto the per-stratum rows.

    Output per stratum: ``stratum, a, b, c, d, or_stratum, or_cmh``
    (round 6; or_cmh repeated on every row, the repo's whole-result
    broadcast convention).
    """
    exp = F.col(exposed_col).cast("boolean")
    out = F.col(outcome_col).cast("boolean")
    g = tables.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum((exp & out).cast("long")).alias("a"),
        F.sum((exp & ~out).cast("long")).alias("b"),
        F.sum((~exp & out).cast("long")).alias("c"),
        F.sum((~exp & ~out).cast("long")).alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = g.select(
        "stratum",
        "a",
        "b",
        "c",
        "d",
        ((F.col("a") * F.col("d")).cast("double") / n.cast("double")).alias(
            "t_num"
        ),
        ((F.col("b") * F.col("c")).cast("double") / n.cast("double")).alias(
            "t_den"
        ),
    )
    pooled = terms.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("stratum", "t_num"))
            ),
            F.lit(0.0),
            lambda acc, t: acc + t["t_num"],
        ).alias("s_num"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("stratum", "t_den"))
            ),
            F.lit(0.0),
            lambda acc, t: acc + t["t_den"],
        ).alias("s_den"),
    )
    return (
        terms.crossJoin(F.broadcast(pooled))
        .select(
            "stratum",
            "a",
            "b",
            "c",
            "d",
            F.round(
                F.when(
                    F.col("b") * F.col("c") != 0,
                    (F.col("a") * F.col("d")).cast("double")
                    / (F.col("b") * F.col("c")).cast("double"),
                ),
                6,
            ).alias("or_stratum"),
            F.round(
                F.when(F.col("s_den") != 0.0, F.col("s_num") / F.col("s_den")),
                6,
            ).alias("or_cmh"),
        )
        .orderBy("stratum")
    )


def brier_decomposition(
    scored: DataFrame,
    score_col: str,
    y_col: str,
    denom: int = 128,
) -> DataFrame:
    """Murphy decomposition of the Brier score at the distinct-score
    grain — Brier = Reliability − Resolution + Uncertainty — the
    diagnostic that says WHY a probabilistic router scores badly
    (miscalibrated vs uninformative), where calibration_report only
    draws the picture:

        REL = Σ_k n_k (p_k − ō_k)² / N      (calibration error mass)
        RES = Σ_k n_k (ō_k − ō)² / N        (discrimination mass)
        UNC = ō (1 − ō)                     (irreducible base rate)

    with p_k = score/denom the exact binary-fraction forecast of bin k,
    ō_k its empirical positive rate, ō the base rate.

    Float discipline: bins are the distinct scores, so p_k is exact;
    n_k, pos_k, P, N are exact BIGINTs; ō_k and ō are single divisions;
    every Σ is a LEFT fold over the score-sorted bin list. The Brier
    score itself is folded from the same list as
    Σ_k [pos_k (p_k−1)² + (n_k−pos_k) p_k²] / N, so the identity
    REL − RES + UNC = Brier holds to float round-off (pytest asserts
    it at 1e-12).

    Plan shape: ONE hash aggregate to the score grain, one fold over
    the bounded bin list — same scan profile as binary_auc.

    Output: one row ``n, base_rate, brier, reliability, resolution,
    uncertainty`` (round 6).
    """
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum(F.col(y_col).cast("long")).alias("pos_k"),
    )
    tot = g.agg(
        F.sum("n_k").alias("n"),
        F.sum("pos_k").alias("p"),
        F.sort_array(
            F.collect_list(F.struct("s", "n_k", "pos_k"))
        ).alias("bins"),
    )
    obar = F.col("p").cast("double") / F.col("n").cast("double")

    def pk(t):
        return t["s"].cast("double") / F.lit(float(denom))

    def ok(t):
        return t["pos_k"].cast("double") / t["n_k"].cast("double")

    rel = F.aggregate(
        "bins",
        F.lit(0.0),
        lambda acc, t: acc
        + t["n_k"].cast("double") * (pk(t) - ok(t)) * (pk(t) - ok(t)),
    ) / F.col("n").cast("double")
    res = F.aggregate(
        "bins",
        F.lit(0.0),
        lambda acc, t: acc
        + t["n_k"].cast("double") * (ok(t) - obar) * (ok(t) - obar),
    ) / F.col("n").cast("double")
    # the bin term's two addends are grouped (A + B) BEFORE adding to
    # the accumulator so the oracle's x + (A + B) lambda is bit-equal
    brier = F.aggregate(
        "bins",
        F.lit(0.0),
        lambda acc, t: acc
        + (
            t["pos_k"].cast("double")
            * (pk(t) - F.lit(1.0))
            * (pk(t) - F.lit(1.0))
            + (t["n_k"] - t["pos_k"]).cast("double") * pk(t) * pk(t)
        ),
    ) / F.col("n").cast("double")
    return tot.select(
        "n",
        F.round(obar, 6).alias("base_rate"),
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(obar * (F.lit(1.0) - obar), 6).alias("uncertainty"),
    )


def poststratified_mean(
    pop: DataFrame,
    stratum_col: str,
    value_col: str,
    sample_col: str,
) -> DataFrame:
    """Post-stratified population-mean estimator from a non-uniform
    sample: reweight per-stratum sample means by POPULATION stratum
    shares — the survey-statistics correction a measurement pipeline
    applies when its measured subset over-represents some shards (the
    estimation sibling of stratified_sample, which CONSTRUCTS balanced
    samples; this repairs estimates from unbalanced ones):

        ŷ_ps = Σ_h N_h·(S_h/n_h) / Σ_h N_h      (h over SAMPLED strata)

    Strata with no sampled rows are excluded from both sums and their
    population share is reported as ``uncovered_share`` — an honest
    coverage disclosure instead of a silent extrapolation.

    Float discipline: N_h, S_h, n_h, N are exact BIGINTs from one
    map-side-combined aggregate; each stratum term N_h·S_h/n_h is one
    exact product over one division, folded in stratum order; the
    naive mean and final estimate are single divisions.

    Output one row: ``n_pop, n_sample, n_strata, n_covered,
    uncovered_share, naive_mean, poststrat_mean`` (round 6).
    """
    g = pop.groupBy(F.col(stratum_col).alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(F.col(sample_col).cast("long")).alias("s_n"),
        F.sum(
            F.when(F.col(sample_col).cast("boolean"), F.col(value_col))
            .otherwise(F.lit(0))
            .cast("long")
        ).alias("s_v"),
    )
    tot = g.agg(
        F.sum("n_h").alias("n_pop"),
        F.sum("s_n").alias("n_sample"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum((F.col("s_n") > 0).cast("long")).alias("n_covered"),
        F.sum(F.when(F.col("s_n") > 0, F.col("n_h")).otherwise(F.lit(0))).alias(
            "n_pop_cov"
        ),
        F.sum("s_v").alias("sv_all"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("s_n") > 0,
                        F.struct(
                            "h",
                            (
                                (F.col("n_h") * F.col("s_v")).cast("double")
                                / F.col("s_n").cast("double")
                            ).alias("t"),
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, t: acc + t["t"],
        ).alias("wsum"),
    )
    return tot.select(
        "n_pop",
        "n_sample",
        "n_strata",
        "n_covered",
        F.round(
            (F.col("n_pop") - F.col("n_pop_cov")).cast("double")
            / F.col("n_pop").cast("double"),
            6,
        ).alias("uncovered_share"),
        F.round(
            F.when(
                F.col("n_sample") > 0,
                F.col("sv_all").cast("double")
                / F.col("n_sample").cast("double"),
            ),
            6,
        ).alias("naive_mean"),
        F.round(
            F.when(
                F.col("n_pop_cov") > 0,
                F.col("wsum") / F.col("n_pop_cov").cast("double"),
            ),
            6,
        ).alias("poststrat_mean"),
    )


def pca2(
    pairs: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Closed-form PCA of a 2-metric scatter (exact-integer inputs):
    eigendecompose the 2×2 covariance analytically —

        λ = (a + c ± √((a−c)² + 4b²)) / 2

    — and emit both eigenvalues, the explained-variance ratio, and the
    FIRST principal axis as the (unnormalized-then-normalized)
    eigenvector (b, λ₁ − a): "which direction do these two metrics
    actually co-move in", the two-variable completion of metric_corr
    (which stops at the correlation scalar).

    Float discipline: a, b, c are the exact rationals
    (n·Σxy − ΣxΣy)/(n(n−1)) etc. — one division each off exact BIGINT
    sums; λ, the ratio, and the axis are a fixed chain with two
    correctly-rounded sqrts. Degenerate b = 0 emits the axis-aligned
    eigenvector by comparing a and c. Σx·Σy must fit int64.

    Output one row: ``n, var_x, var_y, cov_xy, lambda1, lambda2,
    evr1, axis_x, axis_y`` (round 6).
    """
    g = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(x_col).cast("long")).alias("sx"),
        F.sum(F.col(y_col).cast("long")).alias("sy"),
        F.sum(
            F.col(x_col).cast("long") * F.col(x_col).cast("long")
        ).alias("sxx"),
        F.sum(
            F.col(y_col).cast("long") * F.col(y_col).cast("long")
        ).alias("syy"),
        F.sum(
            F.col(x_col).cast("long") * F.col(y_col).cast("long")
        ).alias("sxy"),
    )
    n = F.col("n")
    den = (n * (n - 1)).cast("double")
    a = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / den
    c = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double") / den
    b = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / den
    disc = F.sqrt((a - c) * (a - c) + F.lit(4.0) * b * b)
    l1 = (a + c + disc) * F.lit(0.5)
    l2 = (a + c - disc) * F.lit(0.5)
    vx = F.when(b != 0.0, b).otherwise(
        F.when(a >= c, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    vy = F.when(b != 0.0, l1 - a).otherwise(
        F.when(a >= c, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    norm = F.sqrt(vx * vx + vy * vy)
    # duck_round: the oracle rounds DOUBLE variances at 1e9 magnitude —
    # ×10⁶ approaches 2^53 and DuckDB's lossy-product round differs from
    # Spark's exact round in the last digit (sf0.1 gate finding). The
    # `+ 0.0` on cov_xy/lambda2 mirrors the oracle's −0.0 normalization.
    from cernan_spark.operators.temporal import duck_round

    return g.select(
        "n",
        duck_round(a, 6).alias("var_x"),
        duck_round(c, 6).alias("var_y"),
        (duck_round(b, 6) + F.lit(0.0)).alias("cov_xy"),
        duck_round(l1, 6).alias("lambda1"),
        (duck_round(l2, 6) + F.lit(0.0)).alias("lambda2"),
        duck_round(
            F.when(l1 + l2 != 0.0, l1 / (l1 + l2)), 6
        ).alias("evr1"),
        duck_round(F.when(norm > 0.0, vx / norm), 6).alias("axis_x"),
        duck_round(F.when(norm > 0.0, vy / norm), 6).alias("axis_y"),
    )


def dr_policy_value(
    logs: DataFrame,
    id_col: str,
    action_col: str,
    reward_col: str,
    propensity_col: str,
    target_col: str,
) -> DataFrame:
    """Doubly-robust off-policy value (DR = direct model + IPS
    correction) — the third leg of the OPE family next to
    :func:`ips_policy_value`: unbiased if EITHER the reward model OR
    the propensities are right, with the model soaking up most of the
    IPS variance:

        q̂(a)  = mean logged reward of action a   (the direct model)
        V̂_DM  = (1/n) Σ q̂(π(xᵢ))
        V̂_DR  = (1/n) Σ [ q̂(π(xᵢ)) + 1[aᵢ=π(xᵢ)]·(rᵢ − q̂(aᵢ))/pᵢ ]

    Float discipline: q̂ is one division of exact BIGINT sums per
    action; each row's DR term is a fixed chain (subtract, divide by
    the dyadic-rational propensity, add); both Σ are LEFT folds over
    the id-sorted term list — the ips_policy_value discipline.

    Output one row: ``n, n_match, v_dm, v_dr`` (round 6).
    """
    base = logs.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(action_col).alias("a"),
        F.col(reward_col).cast("long").alias("r"),
        F.col(propensity_col).cast("double").alias("p"),
        F.col(target_col).alias("pi"),
    )
    qhat = base.groupBy("a").agg(
        (
            F.sum("r").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("q")
    )
    joined = (
        base.join(
            F.broadcast(qhat.select(F.col("a").alias("pi"), F.col("q").alias("q_pi"))),
            "pi",
            "left",
        )
        .join(
            F.broadcast(qhat.select("a", F.col("q").alias("q_a"))),
            "a",
        )
        .select(
            "id",
            (F.col("a") == F.col("pi")).alias("m"),
            F.coalesce("q_pi", F.lit(0.0)).alias("q_pi"),
            "q_a",
            "r",
            "p",
        )
    )
    term = F.col("q_pi") + F.when(
        F.col("m"),
        (F.col("r").cast("double") - F.col("q_a")) / F.col("p"),
    ).otherwise(F.lit(0.0))
    rows = joined.select(
        "id",
        F.col("m").cast("long").alias("m"),
        F.col("q_pi").alias("dm_t"),
        term.alias("dr_t"),
    )
    agg = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("m").alias("n_match"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("id", "dm_t"))),
            F.lit(0.0),
            lambda acc, t: acc + t["dm_t"],
        ).alias("s_dm"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("id", "dr_t"))),
            F.lit(0.0),
            lambda acc, t: acc + t["dr_t"],
        ).alias("s_dr"),
    )
    return agg.select(
        "n",
        "n_match",
        F.round(F.col("s_dm") / F.col("n").cast("double"), 6).alias("v_dm"),
        F.round(F.col("s_dr") / F.col("n").cast("double"), 6).alias("v_dr"),
    )


#: z_{0.975} and z_{0.8} as pinned decimal literals shared with the SQL
#: oracle (no cross-engine inverse-normal).
Z_ALPHA_025 = 1.959963984540054
Z_BETA_20 = 0.8416212335729143


def power_sample_size(
    df: DataFrame,
    group_col: str,
    value_col: str,
    mde_pcts: tuple[int, ...] = (1, 5, 10),
) -> DataFrame:
    """A/B sample-size planning per metric (normal approximation,
    α = 0.05 two-sided, power = 0.8): the experiment-DESIGN closure of
    this module — cuped/welch/mann_whitney decide afterwards; this
    says how much data the decision needs up front:

        n_per_arm = ⌈ 2·(z_α/2 + z_β)²·σ² / (μ·MDE)² ⌉

    Float discipline: μ and σ² are single divisions of exact BIGINT
    sums ((nΣX²−S²)/(n(n−1))); the z constants are pinned decimal
    literals; δ, the quotient and the final ceil are a fixed IEEE
    chain, so both engines land on the same integer.

    Output per (group, mde_pct): ``grp, mde_pct, n_obs, mean, sigma2,
    n_required`` (round 6 on the floats; NULL n_required when μ = 0
    or σ² = 0 ... degenerate metrics can't be powered).
    """
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.col(value_col).cast("long")).alias("s"),
        F.sum(
            F.col(value_col).cast("long") * F.col(value_col).cast("long")
        ).alias("ss"),
    ).filter(F.col("n_obs") >= 2)
    mu = F.col("s").cast("double") / F.col("n_obs").cast("double")
    sigma2 = (
        F.col("n_obs") * F.col("ss") - F.col("s") * F.col("s")
    ).cast("double") / (F.col("n_obs") * (F.col("n_obs") - 1)).cast(
        "double"
    )
    zz = F.lit(Z_ALPHA_025) + F.lit(Z_BETA_20)
    withm = g.select(
        "grp", "n_obs", mu.alias("mu"), sigma2.alias("sigma2")
    ).select(
        "grp",
        "n_obs",
        "mu",
        "sigma2",
        F.explode(
            F.array(*[F.lit(int(m)) for m in mde_pcts])
        ).alias("mde_pct"),
    )
    delta = F.col("mu") * F.col("mde_pct").cast("double") / F.lit(100.0)
    n_req = F.ceil(
        F.lit(2.0) * (zz * zz) * F.col("sigma2") / (delta * delta)
    ).cast("long")
    return withm.select(
        "grp",
        "mde_pct",
        "n_obs",
        F.round("mu", 6).alias("mean"),
        F.round("sigma2", 6).alias("sigma2"),
        F.when(
            (F.col("mu") != 0.0) & (F.col("sigma2") > 0.0), n_req
        ).alias("n_required"),
    ).orderBy("grp", "mde_pct")
