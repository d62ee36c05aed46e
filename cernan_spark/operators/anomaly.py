"""Telemetry anomaly detection and heavy-hitter sketching.

Two operators a log/telemetry pipeline runs right after aggregation:

* :func:`rolling_zscore` — per-series rolling-window z-score outlier
  flagging (the classic ops-alerting primitive; the reference leaves this
  to downstream sinks like wavefront, we fold it into the engine).
* :func:`countmin_estimates` — a count-min sketch (Cormode & Muthukrishnan
  2005) over a key column with portable-hash rows, plus exact counts for
  the overestimate-bound comparison.

Cross-engine determinism: every float op used here is IEEE-754
correctly-rounded (+, −, ×, ÷, sqrt) over EXACT integer sums (values are
pre-scaled to integer cents; window sums of longs are exact), so the
DuckDB oracle reproduces z-scores bit-for-bit — no libm (ln/pow/stddev
builtins) whose rounding differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_MERSENNE31 = (1 << 31) - 1

#: (a, b) universal-hash coefficients for the sketch's hash rows — fixed
#: literals shared with the oracle generator
COUNTMIN_COEFFS: tuple[tuple[int, int], ...] = (
    (1103515245, 12345),
    (69069, 362437),
    (214013, 2531011),
    (134775813, 1),
)


def rolling_zscore(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    cents_col: str,
    window: int = 4,
    threshold: float = 2.5,
) -> DataFrame:
    """Flag per-series outliers: z-score of each sample against the
    mean/std of the previous ``window`` samples (trailing frame,
    current row EXCLUDED — the detector must not learn from the point
    it is judging). Rows without a full trailing window emit NULL z.

    Variance uses the exact-sum form E[x²] − E[x]² over integer cents
    (window sums of longs are exact; the divisions, multiply, subtract
    and sqrt are all correctly-rounded IEEE ops), clamped at 0 against
    1-ulp negative rounding on near-constant windows.

    One exchange: the trailing frame, the count and the cut share the
    series partitioning.
    """
    w = (
        W.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    c = F.col(cents_col).cast("double")
    n = F.count(cents_col).over(w)
    s = F.sum(cents_col).over(w).cast("double")
    s2 = F.sum(F.col(cents_col) * F.col(cents_col)).over(w).cast("double")
    nn = n.cast("double")
    mean = s / nn
    var = F.greatest(s2 / nn - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when((n == window) & (std > 0), (c - mean) / std)
    return series.select(
        *key_cols,
        F.col(order_col),
        F.col(cents_col),
        F.round(z, 4).alias("z"),
        (F.abs(z) > threshold).alias("is_anomaly"),
    )


def countmin_estimates(
    df: DataFrame,
    key_hash_col: str,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch over a pre-hashed key column: ``d`` hash rows
    (the fixed :data:`COUNTMIN_COEFFS` streams) × ``width`` buckets of
    long counters, estimate = min over rows of the key's bucket counter.

    Returns one row per distinct key hash with ``est`` (sketch) and
    ``exact`` (true count) — ``est >= exact`` always (the one-sided
    count-min error bound), equality except under bucket collisions.

    Scale shape: the counter table is ``d × width`` rows REGARDLESS of
    corpus size (one map-side-combined aggregate builds it); the
    estimate join broadcasts it. This is the telemetry cardinality
    guard for 100 TB streams — the exact side here exists only for the
    bound check and would be dropped in production.
    """
    m31 = F.lit(_MERSENNE31)
    h = F.pmod(F.col(key_hash_col).cast("long"), m31)
    bucket_cols = [
        F.pmod(F.pmod(F.lit(a) * h + F.lit(b), m31), F.lit(width)).alias(
            f"_b{j}"
        )
        for j, (a, b) in enumerate(COUNTMIN_COEFFS)
    ]
    staged = df.select(F.col(key_hash_col).alias("_kh"), *bucket_cols)
    # counters for ALL d hash rows in ONE corpus pass: posexplode the
    # bucket array (pos IS the hash-row index), then one map-side-combined
    # aggregate over ≤ d×width groups — a per-row union of d aggregates
    # would scan the corpus d times
    counters = (
        staged.select(
            F.posexplode(
                F.array(*[F.col(f"_b{j}") for j in range(len(COUNTMIN_COEFFS))])
            ).alias("row_j", "bucket")
        )
        .groupBy("row_j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    keys = staged.groupBy(
        "_kh", *[f"_b{j}" for j in range(len(COUNTMIN_COEFFS))]
    ).agg(F.count(F.lit(1)).alias("exact"))
    # melt each key's d buckets and join the d×width counter table ONCE
    # (per-row filter+join branches would defeat exchange reuse — the
    # row_j predicate pushes below each branch's aggregate, forcing d
    # separate corpus scans), then min over hash rows = the estimate
    melted = keys.select(
        "_kh",
        "exact",
        F.posexplode(
            F.array(*[F.col(f"_b{j}") for j in range(len(COUNTMIN_COEFFS))])
        ).alias("row_j", "bucket"),
    )
    return (
        melted.join(F.broadcast(counters), ["row_j", "bucket"])
        .groupBy(F.col("_kh").alias("key_hash"), "exact")
        .agg(F.min("cnt").alias("est"))
        .select("key_hash", "est", "exact")
    )


def countmin_oracle_sql(source_cte: str, key_hash_expr: str, width: int = 256) -> str:
    """DuckDB twin of :func:`countmin_estimates`: replays the same hash
    streams, counter build and min-over-rows estimate. ``source_cte``
    is a CTE body yielding the rows; ``key_hash_expr`` the integer key
    hash column within it."""
    d = len(COUNTMIN_COEFFS)
    bucket_exprs = ", ".join(
        f"(({a} * (({key_hash_expr}) % 2147483647) + {b}) % 2147483647) % {width} AS b{j}"
        for j, (a, b) in enumerate(COUNTMIN_COEFFS)
    )
    counter_ctes = ", ".join(
        f"c{j} AS (SELECT b{j} AS bucket, count(*) AS cnt FROM staged GROUP BY 1)"
        for j in range(d)
    )
    joins = " ".join(f"JOIN c{j} ON c{j}.bucket = k.b{j}" for j in range(d))
    least = ", ".join(f"c{j}.cnt" for j in range(d))
    bcols = ", ".join(f"b{j}" for j in range(d))
    return f"""
        WITH src AS ({source_cte}),
        staged AS (
          SELECT ({key_hash_expr}) % 2147483647 AS kh, {bucket_exprs}
          FROM src
        ),
        {counter_ctes},
        k AS (
          SELECT kh, {bcols}, count(*) AS exact
          FROM staged GROUP BY ALL
        )
        SELECT k.kh AS key_hash, least({least}) AS est, k.exact
        FROM k {joins}
    """


def metric_pair_correlation(
    cells: DataFrame,
    metric_cols: list[str],
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """Pearson correlation between telemetry series over aligned cells
    (the incident-analysis primitive: "do errors move with clicks?").

    ``cells`` has one row per aligned cell (e.g. (conv, hour)) with one
    INTEGER column per metric (cents; absent metric = 0 — "no events
    that hour" is data, not a gap). ALL pairs share ONE corpus scan and
    ONE global aggregate: the sufficient statistics (n, Σx, Σxy, Σx²)
    are exact int64 sums, and each pair's
    ``corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²))``
    uses only correctly-rounded IEEE ops on those exact integers — the
    same discipline as :func:`rolling_zscore`, so the oracle reproduces
    it bit-for-bit. (Never ``corr()`` builtins: their accumulation
    order is engine-defined.)

    Output: one row per pair. The aggregate result is ONE row regardless
    of corpus size; the explode to pairs is driver-free and constant.
    """
    sums = [F.sum(c).alias(f"s_{c}") for c in metric_cols]
    sqs = [
        F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}")
        for i, a in enumerate(metric_cols)
        for b in metric_cols[i:]
    ]
    stats = cells.agg(F.count(F.lit(1)).alias("n"), *sums, *sqs)

    def _corr_row(x: str, y: str):
        n = F.col("n").cast("double")
        sx = F.col(f"s_{x}").cast("double")
        sy = F.col(f"s_{y}").cast("double")
        # the Σxy column was emitted under whichever of (x,y) comes first
        # in metric_cols order
        ix, iy = metric_cols.index(x), metric_cols.index(y)
        key = f"s_{x}_{y}" if ix <= iy else f"s_{y}_{x}"
        sxy = F.col(key).cast("double")
        sxx = F.col(f"s_{x}_{x}").cast("double")
        syy = F.col(f"s_{y}_{y}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
        return F.struct(
            F.lit(x).alias("metric_x"),
            F.lit(y).alias("metric_y"),
            F.col("n").alias("n_cells"),
            F.when(den > 0, F.round(num / den, 6)).alias("corr"),
        )

    rows = F.explode(F.array(*[_corr_row(x, y) for x, y in pairs])).alias("r")
    return stats.select(rows).select("r.*")


def sustained_alerts(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    cents_col: str,
    threshold_cents: int,
    min_run: int = 3,
) -> DataFrame:
    """Sustained-threshold alert rules: a series alerts when its value
    stays above ``threshold_cents`` for at least ``min_run`` CONSECUTIVE
    samples — the "for: 5m" clause of a prometheus alerting rule, and the
    duration-gated form of the point alerts cernan defers to its sinks
    (wavefront/prometheus downstream of /root/reference/src/sink/mod.rs).
    One spike never pages; a plateau does.

    Gaps-and-islands with NO self-join: rows are numbered per series,
    breached rows renumbered per series, and the difference is constant
    exactly within a maximal consecutive breached run — groupBy that
    island id. Both windows and the final aggregate share the series
    partitioning, so the whole operator is ONE exchange; series count
    grows with the data, so parallelism scales (never "partition by the
    5 alert names"). Integer cents throughout — the oracle replays the
    island arithmetic exactly.
    """
    w = W.partitionBy(*key_cols).orderBy(order_col)
    numbered = series.withColumn("__rn", F.row_number().over(w)).filter(
        F.col(cents_col) > threshold_cents
    )
    island = (F.col("__rn") - F.row_number().over(w)).alias("__island")
    runs = (
        numbered.withColumn("__island", island)
        .groupBy(*key_cols, "__island")
        .agg(
            F.min(order_col).alias("start_order"),
            F.max(order_col).alias("end_order"),
            F.count(F.lit(1)).alias("n_samples"),
            F.max(cents_col).alias("peak_cents"),
        )
    )
    return runs.filter(F.col("n_samples") >= min_run).select(
        *key_cols, "start_order", "end_order", "n_samples", "peak_cents"
    )


def slo_burn_windows(
    events: DataFrame,
    epoch_col: str,
    err_col: str,
    short_s: int = 3600,
    long_s: int = 21600,
    burn_x10: int = 10,
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the SRE-workbook two-window
    rule): an hour pages only when BOTH its own error ratio and its
    enclosing long window's ratio exceed the burn threshold — a noisy
    hour inside a healthy 6 h never pages, a sustained burn does. The
    long tier re-aggregates the short tier (rollup merge law), so raw is
    scanned once.

    ``burn_x10`` is the paging threshold in error-rate tenths-of-percent
    ×10 disguise: the page predicate is evaluated by integer
    cross-multiplication (``n_err * burn_x10 > n``) so the flag is exact
    in any engine; the float ratios are display columns only.
    """
    ws = (F.floor(F.col(epoch_col) / short_s) * short_s).alias("ws")
    short = events.groupBy(ws).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(err_col).cast("long")).alias("n_err"),
    )
    # materialize the (tiny) short tier once: both the long-tier re-agg
    # and the final join reference it, and Catalyst would re-scan raw
    # for each reference
    short = short.localCheckpoint()
    ws6 = (F.floor(F.col("ws") / long_s) * long_s).alias("ws6")
    longw = short.groupBy(ws6).agg(
        F.sum("n").alias("long_n"), F.sum("n_err").alias("long_err")
    )
    joined = short.join(
        longw,
        (F.floor(F.col("ws") / long_s) * long_s) == F.col("ws6"),
    )
    return joined.select(
        "ws", "n", "n_err",
        F.round(F.col("n_err").cast("double") / F.col("n"), 6).alias(
            "short_ratio"
        ),
        F.round(F.col("long_err").cast("double") / F.col("long_n"), 6).alias(
            "long_ratio"
        ),
        (
            (F.col("n_err") * burn_x10 > F.col("n"))
            & (F.col("long_err") * burn_x10 > F.col("long_n"))
        ).alias("page"),
    )


def seasonal_baseline(
    df: DataFrame,
    key_cols: list[str],
    slot_col: str,
    value_cents_col: str,
) -> DataFrame:
    """Seasonal (slot-of-cycle) baseline with a cross-engine-exact profile.

    Group the series by ``key_cols`` × ``slot_col`` (e.g. metric ×
    hour-of-day) and emit, per slot: the sample count, the slot mean, the
    worst single-sample deviation ratio within the slot, and the
    seasonality index (slot mean ÷ key-wide mean). The operational read:
    an index ≫ 1 marks the hot hours a static alert threshold will
    false-positive on — the same problem cernan's histogram-mask config
    solves per-metric (reference `/root/reference/src/config.rs`
    histogram bounds), lifted to time-of-day.

    Float discipline: ``value_cents_col`` must be an exact-integer column
    (the caller scales doubles to cents); every emitted double is then a
    single division / integer product of exact BIGINTs, so Spark and a SQL
    oracle agree bit-for-bit regardless of fold order.

    Plan: one map-side-combined aggregate to the (key, slot) grain; the
    key-wide totals come from a window over that already-tiny frame
    (|keys|×|slots| rows — the second exchange moves kilobytes at any SF).
    """
    slot = df.groupBy(*key_cols, slot_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_cents_col).alias("sum_c"),
        F.max(value_cents_col).alias("max_c"),
    )
    wk = W.partitionBy(*key_cols)
    return slot.select(
        *key_cols,
        slot_col,
        "n",
        (F.col("sum_c") / (F.lit(100.0) * F.col("n"))).alias("slot_mean"),
        ((F.col("max_c") * F.col("n")) / F.col("sum_c")).alias("max_dev_ratio"),
        (
            (F.col("sum_c") * F.sum("n").over(wk))
            / (F.col("n") * F.sum("sum_c").over(wk))
        ).alias("season_idx"),
    )


def robust_mad_profile(
    df: DataFrame,
    key_cols: list[str],
    cents_col: str,
    order_col: str,
    k_num: int = 3,
    k_den: int = 2,
) -> DataFrame:
    """Median/MAD outlier profile in exact integer arithmetic.

    The mean/stddev z-score (:func:`rolling_zscore`) breaks on the very
    outliers it hunts (one 100× spike drags the mean); the robust form —
    median and median-absolute-deviation — does not. Cross-engine exact
    medians are computed by RANK SELECTION over an exact-integer column
    (``cents_col``): ``med2`` is the sum of the values at 1-based ranks
    ``(n+1)//2`` and ``(n+2)//2`` (twice the interpolated median, kept
    doubled so it stays integral), and ``mad2`` repeats the trick on
    ``|2·c − med2|`` (doubled deviations). A point is an outlier when
    ``2·|2·c − med2| > (k_num/k_den)·2·mad2``, evaluated as the integer
    cross-product ``2·dev2·k_den > k_num·mad2`` — no doubles anywhere
    until the final report columns (single divisions by 2).

    Plan: two rank passes over the data (each ONE exchange on the key)
    plus two key-grain joins of the medians frame (broadcast under AQE —
    one row per key). This is the honest cost of exact medians at scale;
    approximate percentile sketches are the cheaper cousin when exactness
    isn't gate-checked.
    """
    kc = [F.col(c) for c in key_cols]

    def _rank_pick(frame: DataFrame, val: str) -> DataFrame:
        w = W.partitionBy(*kc).orderBy(F.col(val), F.col(order_col))
        ranked = frame.select(
            *key_cols,
            F.col(val),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(W.partitionBy(*kc)).alias("_n"),
        )
        lo = (F.col("_n") + 1) / 2
        hi = (F.col("_n") + 2) / 2
        return ranked.groupBy(*key_cols).agg(
            F.max("_n").alias("n"),
            (
                F.sum(F.when(F.col("_rn") == F.floor(lo), F.col(val)))
                + F.sum(F.when(F.col("_rn") == F.floor(hi), F.col(val)))
            ).alias(f"{val}2"),
        )

    base = df.select(*key_cols, F.col(cents_col).alias("c"), F.col(order_col))
    med = _rank_pick(base, "c").withColumnRenamed("c2", "med2")
    dev = base.join(med.select(*key_cols, "med2"), key_cols).select(
        *key_cols,
        F.abs(2 * F.col("c") - F.col("med2")).alias("d"),
        F.col(order_col),
    )
    mad = _rank_pick(dev, "d").withColumnRenamed("d2", "mad2")
    flagged = dev.join(mad.select(*key_cols, "mad2"), key_cols)
    out = flagged.groupBy(*key_cols).agg(
        F.sum(
            (2 * F.col("d") * F.lit(k_den) > F.lit(k_num) * F.col("mad2")).cast(
                "bigint"
            )
        ).alias("n_outliers")
    )
    return (
        med.select(*key_cols, "n", "med2")
        .join(mad.select(*key_cols, "mad2"), key_cols)
        .join(out, key_cols)
        .select(
            *key_cols,
            "n",
            (F.col("med2") / 200.0).alias("median"),
            (F.col("mad2") / 200.0).alias("mad"),
            "n_outliers",
        )
    )


def cusum_alarms(
    hourly: DataFrame,
    key_cols: list[str],
    rank_col: str,
    value_col: str,
    target_col: str,
    h_mult: int = 4,
) -> DataFrame:
    """CUSUM change-point alarms over a bounded per-group series.

    The one-sided CUSUM recurrence ``S_i = max(0, S_{i-1} + (x_i − k))``
    accumulates persistent upward drift and alarms when ``S > h`` (then
    resets) — the classic "rate crept above target" detector a paging
    pipeline runs beside the instantaneous z-score
    (:func:`rolling_zscore` catches spikes; CUSUM catches slow leaks).

    Like :func:`~cernan_spark.operators.loghygiene.token_bucket_admit`,
    the recurrence is sequential, so the input must be PRE-AGGREGATED to
    a bounded grain — e.g. 24 hourly sums per (metric, day) — which keeps
    the per-group Python loop O(1) at any corpus size; the heavy lifting
    (corpus → hourly sums) is a map-side-combined Spark aggregate before
    this operator. ``target_col`` carries the per-key drift target ``k``
    (integer, derived from corpus totals so both engines agree);
    ``h = h_mult · k``. All-integer state, so the DuckDB recursive-CTE
    oracle replays the alarm sequence bit-for-bit.

    Output: ``key_cols..., n_points, n_alarms, max_s``.
    """
    import pandas as pd

    rc, vc, tc = rank_col, value_col, target_col

    def _scan(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(rc)
        k = int(pdf[tc].iloc[0])
        h = h_mult * k
        s = 0
        alarms = 0
        max_s = 0
        for x in pdf[vc]:
            s = max(0, s + int(x) - k)
            if s > max_s:
                max_s = s
            if s > h:
                alarms += 1
                s = 0
        out = pdf[key_cols].iloc[:1].copy()
        out["n_points"] = len(pdf)
        out["n_alarms"] = alarms
        out["max_s"] = max_s
        return out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in hourly.select(*key_cols).schema.fields
    ) + ", n_points long, n_alarms long, max_s long"
    return hourly.select(*key_cols, rc, vc, tc).groupBy(*key_cols).applyInPandas(
        _scan, schema
    )


def seasonal_naive_error(
    hourly: DataFrame,
    key_cols: list[str],
    day_col: str,
    slot_col: str,
    value_col: str,
) -> DataFrame:
    """Seasonal-naive forecast skill report: predict each (key, day, slot)
    value with the previous observed same-slot value (lag over
    ``(key, slot)`` ordered by day) and report per key the pair count,
    the mean absolute error and the worst error — the baseline any
    fancier forecaster must beat, and the drift monitor's "how surprising
    was today" column. Integer absolute errors summed as BIGINT; the MAE
    is one final division. ONE exchange (the lag window); the per-key
    rollup reuses nothing wide.
    """
    w = W.partitionBy(*key_cols, slot_col).orderBy(day_col)
    err = (
        hourly.withColumn("_prev", F.lag(value_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .withColumn("_err", F.abs(F.col(value_col) - F.col("_prev")))
    )
    return err.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum("_err") / F.count(F.lit(1))).alias("mae"),
        F.max("_err").alias("max_err"),
    )


def burstiness_profile(
    df: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    order_col: str,
    epoch_col: str,
) -> DataFrame:
    """Inter-arrival burstiness per key, exact across engines.

    Over each sequence (``seq_cols``, e.g. one user's event stream),
    take consecutive integer-second gaps; per ``key_cols`` report the gap
    count, mean gap, and the squared coefficient of variation
    ``CV² = n·Σg² / (Σg)²`` — CV² ≈ 1 is Poisson traffic, ≫ 1 is bursty
    (retry storms, thundering herds), ≪ 1 is heartbeat-regular. The
    dispersion statistic is the shape cernan's valve/backpressure sizing
    cares about: a bursty source needs deeper hopper queues at the same
    mean rate. Gaps are BIGINTs, ``Σg`` and ``Σg²`` are exact integer
    sums; the CV² numerator/denominator would overflow int64 at scale
    (Σg·Σg crosses 2⁶³ near 10⁵ sequences), so the exact sums — each
    well under 2⁵³, hence exactly representable — are cast to double
    BEFORE the two products, which are then single correctly-rounded
    IEEE ops in both engines. Fold order still cannot change a bit. One exchange (the lag window); the per-key
    rollup is map-side combined.
    """
    w = W.partitionBy(*seq_cols).orderBy(order_col)
    gaps = df.select(*key_cols, *seq_cols, F.col(order_col), F.col(epoch_col)) \
        .withColumn("_g", F.col(epoch_col) - F.lag(epoch_col).over(w)) \
        .filter(F.col("_g").isNotNull())
    return gaps.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum("_g") / F.count(F.lit(1))).alias("mean_gap_s"),
        (
            (
                F.count(F.lit(1)).cast("double")
                * F.sum(F.col("_g") * F.col("_g")).cast("double")
            )
            / (F.sum("_g").cast("double") * F.sum("_g").cast("double"))
        ).alias("cv2"),
    )


def metric_trend(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    cents_col: str,
) -> DataFrame:
    """Per-series least-squares trend: slope/intercept of value (cents)
    over an integer time index, plus R² — the drift detector that says
    WHICH direction a metric is moving and how much of its variance the
    line explains. The closed form uses ONLY the five integer sums
    (n, Σx, Σy, Σxy, Σx²[, Σy²]), so the slope is ONE division of exact
    int64 products — bit-identical in any engine — and R²'s squared
    term is evaluated in doubles built from those exact sums (int64
    would overflow the square; the double product rounds identically
    everywhere).

    Plan: ONE map-side-combined aggregate over the stream; everything
    after is series-grain arithmetic.
    """
    g = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(x_col)).alias("sx"),
        F.sum(F.col(cents_col)).alias("sy"),
        F.sum(F.col(x_col) * F.col(cents_col)).alias("sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("sxx"),
        F.sum(F.col(cents_col) * F.col(cents_col)).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    deny = (
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    r2 = (num.cast("double") * num.cast("double")) / (
        den.cast("double") * deny
    )
    return g.select(
        *key_cols,
        "n",
        F.round(slope, 6).alias("slope_cents_per_x"),
        F.round(intercept, 6).alias("intercept_cents"),
        F.round(r2, 6).alias("r2"),
    )


def lag_correlation(
    a: DataFrame,
    b: DataFrame,
    max_lag: int = 6,
    h_col: str = "h",
    v_col: str = "cents",
) -> DataFrame:
    """Lead/lag detection between two metric series: Pearson r between
    A(h) and B(h + lag) for lag 0..max_lag — the diagnostic that says
    'errors follow clicks by 2 hours', which a same-bin correlation
    (metric_corr) cannot see. Inputs are hourly integer-cent rollups,
    so the per-lag sums are exact int64; the final r divides a
    double-exact numerator by the correctly-rounded sqrt of a double
    product — bit-identical cross-engine.

    Plan: both series are hours-sized rollups (ONE corpus aggregate
    upstream of this function); the lag explosion and joins run on
    frames of |hours|·lags rows.
    """
    lags = F.explode(
        F.sequence(F.lit(0), F.lit(max_lag))
    ).alias("lag")
    left = a.select(F.col(h_col).alias("ha"), F.col(v_col).alias("va")).select(
        "*", lags
    )
    right = b.select(F.col(h_col).alias("hb"), F.col(v_col).alias("vb"))
    j = left.join(right, F.col("hb") == F.col("ha") + F.col("lag"))
    g = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("va").alias("sa"),
        F.sum("vb").alias("sb"),
        F.sum(F.col("va") * F.col("vb")).alias("sab"),
        F.sum(F.col("va") * F.col("va")).alias("saa"),
        F.sum(F.col("vb") * F.col("vb")).alias("sbb"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sab").cast("double") - F.col("sa").cast(
        "double"
    ) * F.col("sb").cast("double")
    da = n * F.col("saa").cast("double") - F.col("sa").cast(
        "double"
    ) * F.col("sa").cast("double")
    db = n * F.col("sbb").cast("double") - F.col("sb").cast(
        "double"
    ) * F.col("sb").cast("double")
    return g.select(
        "lag",
        F.col("n").alias("n_hours"),
        F.round(num / F.sqrt(da * db), 6).alias("pearson_r"),
    )


def wilson_error_bounds(
    df: DataFrame,
    grp_cols: list[str],
    err_col: str,
    alert_threshold: float = 0.25,
) -> DataFrame:
    """Per-group error rate with the Wilson score interval (z = 1.96)
    and the alert verdict a dashboard actually needs: flag only when
    the interval's LOWER bound clears the threshold — a 2/3 failure
    cohort alerts, a 1/1 fluke does not. The small-n honesty rule naive
    rate dashboards get wrong.

    ONE map-side-combined hash aggregate to the group grain; the Wilson
    formula is a fixed arithmetic tree over exact integer counts
    (divisions, one correctly-rounded sqrt), so the DuckDB twin running
    the same expression matches bit-for-bit.
    """
    e = F.col(err_col).cast("long")
    g = df.groupBy(*grp_cols).agg(
        F.count(F.lit(1)).alias("n"), F.sum(e).alias("n_err")
    )
    nd = F.col("n").cast("double")
    p = F.col("n_err").cast("double") / nd
    z = F.lit(1.96)
    # z² pinned to the double DuckDB computes: its 1.96*1.96 is an EXACT
    # decimal multiply (DECIMAL(6,4) = 3.8416) converted to double —
    # one ULP above the double product 1.96*1.96 (0x1.ebb98c7e28241p+1
    # vs ...240p+1). The frozen oracle embeds that literal expression, so
    # the Spark tree pins the same value (round-6 gate finding).
    z2 = F.lit(float(38416) / 1e4)
    center = p + z2 / (F.lit(2.0) * nd)
    margin = z * F.sqrt(
        p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd)
    )
    denom = F.lit(1.0) + z2 / nd
    return g.select(
        *grp_cols,
        "n",
        "n_err",
        p.alias("rate"),
        ((center - margin) / denom).alias("wilson_lo"),
        ((center + margin) / denom).alias("wilson_hi"),
        (((center - margin) / denom) > F.lit(alert_threshold))
        .cast("int")
        .alias("alert"),
    )


def overdispersion_index(
    hourly: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) of a per-key count
    series — the Poisson-ness check that decides whether rate alerting
    can assume var ≈ mean (index ≈ 1) or the series is bursty
    (index ≫ 1, negative-binomial territory: widen thresholds or the
    pager lies). Sample variance over mean reduces to ONE division of
    exact BIGINTs: D = (n·Σx² − (Σx)²) / ((n−1)·Σx).

    One map-side-combined aggregate; flag at the conventional 1.5.

    Output per key: ``*key_cols, n, mean, dispersion, overdispersed``.
    """
    agg = hourly.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sx"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("sxx"),
    )
    disp = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        / ((F.col("n") - 1) * F.col("sx")).cast("double")
    )
    return agg.select(
        *key_cols,
        "n",
        F.round(
            F.col("sx").cast("double") / F.col("n").cast("double"), 6
        ).alias("mean"),
        F.round(disp, 6).alias("dispersion"),
        (disp > 1.5).alias("overdispersed"),
    )


def alert_flaps(
    hourly: DataFrame,
    key_cols: list[str],
    rank_col: str,
    value_col: str,
    threshold_col: str,
    max_flips: int = 3,
) -> DataFrame:
    """Alert flap detection — the hysteresis audit a paging pipeline
    runs so a metric oscillating around its threshold doesn't page on
    every crossing: per key, the series' above/below state sequence is
    diffed against its lag and the CROSSINGS counted; a series flipping
    more than ``max_flips`` times is marked flappy (route to a digest,
    not a page — compose with :func:`sustained_alerts`, which handles
    the opposite failure of paging too late).

    One lag window over the per-key rollup series + one aggregate; all
    integer. Output per key: ``*key_cols, n_points, n_above, n_flips,
    flappy``.
    """
    from pyspark.sql import Window as W

    state = (F.col(value_col) > F.col(threshold_col)).cast("int")
    w = W.partitionBy(*key_cols).orderBy("r")
    st = hourly.select(
        *key_cols, F.col(rank_col).alias("r"), state.alias("st")
    ).withColumn("prev", F.lag("st").over(w))
    return st.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("st").alias("n_above"),
        F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("st") != F.col("prev")),
                1,
            ).otherwise(0)
        ).alias("n_flips"),
    ).select(
        *key_cols,
        "n_points",
        "n_above",
        "n_flips",
        (F.col("n_flips") > max_flips).alias("flappy"),
    )


def hbos_scores(
    df: DataFrame,
    id_col: str,
    feature_cols: list[str],
    n_bins: int = 16,
    top_k: int = 20,
) -> DataFrame:
    """HBOS (histogram-based outlier score, Goldstein & Dengel 2012) —
    the cheap multivariate outlier ranker: each integer feature bins
    into ``n_bins`` equal-width buckets over its own [min, max], a
    point's score is Σ_f −ln(density of its bin), and the global top-k
    (score desc, id asc — pinned) are emitted. Assumes feature
    independence, which is exactly why it costs one aggregate per
    feature instead of a pairwise pass — the triage stage before an
    expensive detector.

    Bin index is pure integer arithmetic ((v−min)·n_bins div
    (max−min+1)); densities are exact count ratios; ln of an
    exact-division double + additions in feature order (pinned).

    Output: ``id, score`` for the top-k.
    """
    feats = df.select(F.col(id_col).alias("id"), *feature_cols)
    scored = None
    for fcol in feature_cols:
        rng = feats.agg(
            F.min(fcol).alias("mn"),
            F.max(fcol).alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        binned = feats.select("id", F.col(fcol).alias("v")).crossJoin(
            F.broadcast(rng)
        ).select(
            "id",
            (
                (F.col("v") - F.col("mn"))
                * n_bins
                / (F.col("mx") - F.col("mn") + 1)
            )
            .cast("long")
            .alias("b"),
            "n",
        )
        dens = binned.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
        term = (
            binned.join(dens, "b")
            .select(
                "id",
                (
                    -F.log(
                        F.col("c").cast("double") / F.col("n").cast("double")
                    )
                ).alias("t"),
            )
        )
        scored = (
            term.select("id", F.col("t").alias("score"))
            if scored is None
            else scored.join(term, "id").select(
                "id", (F.col("score") + F.col("t")).alias("score")
            )
        )
    return (
        scored.select("id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "id")
        .limit(top_k)
    )


def gumbel_fit(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    block: int = 24,
    return_periods: tuple[int, ...] = (7, 30, 365),
    min_fill: int | None = None,
) -> DataFrame:
    """Extreme-value capacity planning per key: block maxima (daily max
    of the hourly series, ``block`` rows per block) fitted to a Gumbel
    distribution by the method of moments —

        β = s·√6/π,   μ = m − γ·β   (γ = Euler–Mascheroni)

    — then return levels x_T = μ − β·ln(−ln(1 − 1/T)): "the load we
    should see once per T blocks", the statistically-grounded sibling
    of the empirical peak_range_load (which can only report maxima it
    has SEEN; this extrapolates beyond them).

    Float discipline: block maxima are exact integers (order-
    insensitive max); mean and variance are LEFT folds over the
    block-sorted maxima list with single divisions; √6/π, γ and the
    1 − 1/T terms are engine-evaluated from shared literals; ln as in
    the repo's other ln-based fits. Incomplete trailing blocks are
    dropped (the stl complete-window rule).

    Output per key: ``*key_cols, n_blocks, mean_max, sd_max, beta, mu``
    plus one ``rl_<T>`` per return period (round 6).
    """
    blk = series.select(
        *key_cols,
        F.floor(F.col(order_col) / F.lit(block)).cast("long").alias("b"),
        F.col(value_col).cast("long").alias("v"),
    )
    fill = block if min_fill is None else min_fill
    maxima = blk.groupBy(*key_cols, "b").agg(
        F.max("v").alias("mx"), F.count(F.lit(1)).alias("c")
    ).filter(F.col("c") >= F.lit(fill))
    folded = maxima.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sort_array(
            F.collect_list(F.struct("b", F.col("mx").cast("double").alias("m")))
        ).alias("ms"),
    )
    n = F.col("n_blocks").cast("double")
    mean = F.aggregate("ms", F.lit(0.0), lambda acc, t: acc + t["m"]) / n
    with_mean = folded.select(
        *key_cols, "n_blocks", "ms", mean.alias("mean_max")
    )
    var = (
        F.aggregate(
            "ms",
            F.lit(0.0),
            lambda acc, t: acc
            + (t["m"] - F.col("mean_max")) * (t["m"] - F.col("mean_max")),
        )
        / F.col("n_blocks").cast("double")
    )
    sd = F.sqrt(var)
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = F.col("mean_max") - F.lit(0.5772156649015329) * beta
    out = with_mean.select(
        *key_cols,
        "n_blocks",
        F.round("mean_max", 6).alias("mean_max"),
        F.round(sd, 6).alias("sd_max"),
        F.round(beta, 6).alias("beta"),
        F.round(mu, 6).alias("mu"),
        *[
            F.round(
                mu
                - beta
                * F.log(
                    -F.log(F.lit(1.0) - F.lit(1.0) / F.lit(float(t)))
                ),
                6,
            ).alias(f"rl_{t}")
            for t in return_periods
        ],
    )
    return out.orderBy(*key_cols)


def best_split(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single-changepoint detection by binary segmentation per key:
    the split of the ordered series into a left/right segment that
    maximizes the SSE reduction

        gain(i) = SSE_total − (SSE[1..i] + SSE[i+1..n])

    — "WHERE did this metric change level", where CUSUM
    (loghygiene.cusum) only says THAT it drifted from a target. The
    first level of the classic binary-segmentation recursion; recurse
    on the emitted segments for more changepoints.

    Float discipline: per-row cumulative S_i/ΣX²_i are exact BIGINT
    window sums (order-free integer adds); each candidate's SSE parts
    are the exact rationals SS − S²/n with single divisions, so every
    gain is an identical double in both engines; the argmax takes the
    EARLIEST split on ties. ΣX² must fit int64 (cents² × rows ≲ 10¹⁸).

    Plan shape: one window pass for cumulative sums, ONE collect of
    the bounded rollup spine per key, a row-local scan over the ≤n
    candidate splits. Use on rollup series.

    Output per key: ``*key_cols, n, split_i, split_at (last order
    value of the left segment), gain, mean_left, mean_right``
    (round 6; keys with n < 4 are dropped — both segments need ≥ 2
    points to carry a variance).
    """
    w = (
        W.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    v = F.col(value_col).cast("long")
    rows = series.select(
        *key_cols,
        F.col(order_col).alias("o"),
        F.row_number()
        .over(W.partitionBy(*key_cols).orderBy(order_col))
        .cast("long")
        .alias("i"),
        F.sum(v).over(w).alias("cs"),
        F.sum(v * v).over(w).alias("css"),
    )
    per_key = rows.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sort_array(
            F.collect_list(F.struct("i", "o", "cs", "css"))
        ).alias("sp"),
    ).filter(F.col("n") >= 4)
    last = F.element_at("sp", F.col("n").cast("int"))
    s_tot = last["cs"]
    ss_tot = last["css"]
    n_d = F.col("n").cast("double")
    sse_tot = ss_tot.cast("double") - (
        (s_tot * s_tot).cast("double") / n_d
    )

    def gain_of(t):
        i_d = t["i"].cast("double")
        sse_l = t["css"].cast("double") - (
            (t["cs"] * t["cs"]).cast("double") / i_d
        )
        sr = s_tot - t["cs"]
        ssr = ss_tot - t["css"]
        nr = (F.col("n") - t["i"]).cast("double")
        sse_r = ssr.cast("double") - ((sr * sr).cast("double") / nr)
        return sse_tot - (sse_l + sse_r)

    cands = F.filter(
        "sp", lambda t: (t["i"] >= 2) & (t["i"] <= F.col("n") - 2)
    )
    best = F.aggregate(
        cands,
        F.lit(None).cast(
            "struct<gain:double,i:bigint,o:bigint,cs:bigint,css:bigint>"
        ),
        lambda acc, t: F.when(
            acc.isNull() | (gain_of(t) > acc["gain"]),
            F.struct(
                gain_of(t).alias("gain"),
                t["i"].alias("i"),
                t["o"].cast("bigint").alias("o"),
                t["cs"].alias("cs"),
                t["css"].alias("css"),
            ),
        ).otherwise(acc),
    )
    withb = per_key.select(*key_cols, "n", "sp", best.alias("b")).filter(
        F.col("b").isNotNull()
    )
    return withb.select(
        *key_cols,
        "n",
        F.col("b.i").alias("split_i"),
        F.col("b.o").alias("split_at"),
        F.round("b.gain", 6).alias("gain"),
        F.round(
            F.col("b.cs").cast("double") / F.col("b.i").cast("double"), 6
        ).alias("mean_left"),
        F.round(
            (F.element_at("sp", F.col("n").cast("int"))["cs"] - F.col("b.cs"))
            .cast("double")
            / (F.col("n") - F.col("b.i")).cast("double"),
            6,
        ).alias("mean_right"),
    ).orderBy(*key_cols)


def ols_diagnostics(
    series: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    top_k: int = 3,
) -> DataFrame:
    """OLS regression DIAGNOSTICS per key — leverage and standardized
    residuals for the hourly trend fit, surfacing the top_k most
    anomalous observations: metric_trend reports the fit; this reports
    which points the fit should not be trusted around (the classical
    influence screen before believing a slope):

        h_i = 1/n + (n·x_i − Sx)² / (n·(n·Σx² − Sx²))     (leverage)
        r_i = e_i / (s·√(1 − h_i))                        (studentized)

    with e_i the residual and s² = Σe²/(n−2).

    Float discipline: slope/intercept come from exact BIGINT sums
    (one division each); leverages are exact-integer rationals under
    one division; Σe² is a LEFT fold in x order; each residual is a
    fixed IEEE chain. Ranking takes |r| desc with x-asc ties — both
    engines order identical doubles identically. n·Σx² must fit int64
    (epoch-hour x over ≤ ~10³ rows does, with slack).

    Output per (key, picked row): ``*key_cols, x, y, leverage, resid,
    std_resid`` (round 6), top_k rows per key; keys with n < 4 or a
    degenerate x-spread are dropped.
    """
    v = F.col(y_col).cast("long")
    xs = F.col(x_col).cast("long")
    g = series.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xs).alias("sx"),
        F.sum(v).alias("sy"),
        F.sum(xs * xs).alias("sxx"),
        F.sum(xs * v).alias("sxy"),
    ).filter(F.col("n") >= 4)
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / den.cast("double")
    alpha = (
        F.col("sy").cast("double") - beta * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    fitted = (
        series.select(
            *key_cols, xs.alias("x"), v.alias("y")
        )
        .join(
            F.broadcast(
                g.filter(den != 0).select(
                    *key_cols,
                    "n",
                    "sx",
                    den.alias("den"),
                    beta.alias("beta"),
                    alpha.alias("alpha"),
                )
            ),
            key_cols,
        )
        .select(
            *key_cols,
            "x",
            "y",
            "n",
            (
                F.col("y").cast("double")
                - (F.col("alpha") + F.col("beta") * F.col("x").cast("double"))
            ).alias("e"),
            (
                F.lit(1.0) / F.col("n").cast("double")
                + (
                    (F.col("n") * F.col("x") - F.col("sx"))
                    * (F.col("n") * F.col("x") - F.col("sx"))
                ).cast("double")
                / (F.col("n") * F.col("den")).cast("double")
            ).alias("h"),
        )
    )
    sse = fitted.groupBy(*key_cols).agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("x", (F.col("e") * F.col("e")).alias("e2")))
            ),
            F.lit(0.0),
            lambda acc, t: acc + t["e2"],
        ).alias("sse"),
        F.max("n").alias("n2"),
    )
    s = F.sqrt(F.col("sse") / (F.col("n2") - 2).cast("double"))
    scored = fitted.join(
        F.broadcast(sse.select(*key_cols, s.alias("s"))), key_cols
    ).select(
        *key_cols,
        "x",
        "y",
        "h",
        "e",
        F.when(
            (F.col("s") > 0.0) & (F.col("h") < 1.0),
            F.col("e") / (F.col("s") * F.sqrt(F.lit(1.0) - F.col("h"))),
        ).alias("sr"),
    )
    from pyspark.sql import Window as W2

    wk = W2.partitionBy(*key_cols).orderBy(
        F.abs(F.col("sr")).desc(), F.col("x").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= top_k)
        .select(
            *key_cols,
            "x",
            "y",
            F.round("h", 6).alias("leverage"),
            F.round("e", 6).alias("resid"),
            F.round("sr", 6).alias("std_resid"),
        )
        .orderBy(*key_cols, F.col("x"))
    )
