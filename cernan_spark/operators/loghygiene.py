"""Log-hygiene operators: burst collapse and tail-based trace sampling.

Two stream-hygiene primitives every high-volume log pipeline grows:

* **Burst collapse** — the distributed form of syslogd's "last message
  repeated N times": consecutive identical messages on one emitter within
  a small time gap collapse to a single row carrying the repeat count and
  the burst's time extent. cernan faces the same firehose (a crashing
  service re-emitting one line at full speed) and answers it with sink-side
  aggregation windows (reference `/root/reference/src/buckets.rs` bins by
  time); :func:`burst_collapse` is the record-preserving variant — the
  collapsed row still carries first/last timestamps so nothing is lost but
  the duplicates.

* **Tail-based trace sampling** — keep or drop a whole trace *after* it
  completed, based on a predicate over any of its spans (an error anywhere,
  a latency blowout at the root). Head sampling (cernan's statsd ``@rate``
  flag, reference `/root/reference/src/protocols/statsd.rs` sample-rate
  parse) decides per-record; tail sampling must see the full trace first,
  which in batch Spark is a grouped decision broadcast back to every span.

Scale notes (the 100 TB plan):

* ``burst_collapse`` costs exactly ONE exchange: the lag window, the
  running-sum window, and the per-burst aggregate all cluster on a superset
  of the emitter key, so Spark's ``EnsureRequirements`` reuses the first
  hash partitioning for all three (guarded in tests/test_plan_shapes.py).
* ``tail_sample`` is a window-max over the trace key — ONE exchange of the
  span table and no join. The tempting alternative (aggregate trace
  verdicts, semi-join back) either broadcasts a keep-set that grows with
  the data (dies at scale) or shuffles the span table twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def burst_collapse(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    ts_col: str,
    msg_col: str,
    gap_s: int,
) -> DataFrame:
    """Collapse runs of identical consecutive messages into one row.

    A new burst starts at the first row of each emitter, whenever the
    message text changes, or whenever the gap to the previous row exceeds
    ``gap_s`` seconds. Emits one row per burst::

        part_cols..., msg, n_repeats, first_e, last_e, first_order

    with epochs as BIGINT seconds (``first_e == last_e`` for singletons).

    Plan: lag window → running-sum window → hash aggregate, all keyed on
    supersets of ``part_cols`` — one exchange, two sorts, one aggregate.
    """
    w = Window.partitionBy(*part_cols).orderBy(order_col)
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("bigint")
    flagged = df.select(
        *part_cols,
        F.col(order_col),
        F.col(msg_col).alias("msg"),
        epoch.alias("_e"),
    ).withColumn(
        "_new",
        (
            F.lag("msg").over(w).isNull()
            | (F.lag("msg").over(w) != F.col("msg"))
            | ((F.col("_e") - F.lag("_e").over(w)) > F.lit(gap_s))
        ).cast("int"),
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bursts = flagged.withColumn("_burst", F.sum("_new").over(running))
    return bursts.groupBy(*part_cols, "_burst", "msg").agg(
        F.count(F.lit(1)).alias("n_repeats"),
        F.min("_e").alias("first_e"),
        F.max("_e").alias("last_e"),
        F.min(order_col).alias("first_order"),
    )


def tail_sample(
    df: DataFrame, trace_cols: list[str], keep_pred: Column
) -> DataFrame:
    """Keep every span of traces where ANY span satisfies ``keep_pred``.

    The trace-level verdict is a window ``max`` over the trace key — the
    span table shuffles once and filters in place; no second pass, no
    keep-set materialized on the driver, no join. Drop-side accounting
    (how many traces/spans were sampled away) is a cheap aggregate over
    the same partitioning if the caller wants it.
    """
    w = Window.partitionBy(*trace_cols)
    return (
        df.withColumn("_keep", F.max(keep_pred.cast("int")).over(w))
        .filter(F.col("_keep") == 1)
        .drop("_keep")
    )


def token_bucket_admit(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    epoch_col: str,
    burst: int,
    refill_s: int,
) -> DataFrame:
    """Token-bucket admission control — the batch replay of cernan's valve
    (reference `/root/reference/src/source/mod.rs` backpressure valve and
    the hopper queue's bounded intake): each key starts with ``burst``
    tokens, regains ``floor(gap/refill_s)`` whole tokens between
    consecutive records (capped at ``burst``), and a record is admitted
    iff a token is available (admission spends it; drops are free).

    All arithmetic is exact integers, so the DuckDB recursive-CTE oracle
    reproduces the decision bit-for-bit.

    The recurrence ``t_i = min(burst, t_{i-1} + gap_tokens) - admit`` is
    inherently sequential per key, so keys must bound the sequential
    extent — callers pass a composite key like (user, day) whose group
    size is data-independent (a daily quota), exactly how the gauge
    carry-forward bounds its segmented scan (operators/aggregate.py).
    Runs as ONE ``applyInPandas`` over the key partitioning: the Python
    loop touches only one bounded group at a time and the min-plus
    recurrence is associative, so a chunked two-phase scan is available
    if a deployment ever needs unbounded keys.

    Output: ``key_cols..., order_col, admitted`` (int 0/1).
    """
    import pandas as pd

    ordc, ec = order_col, epoch_col

    def _admit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ordc)
        tok = burst
        prev = None
        out = []
        for e in pdf[ec]:
            e = int(e)
            if prev is not None:
                tok = min(burst, tok + (e - prev) // refill_s)
            admit = 1 if tok >= 1 else 0
            tok -= admit
            prev = e
            out.append(admit)
        res = pdf[key_cols + [ordc]].copy()
        res["admitted"] = out
        return res

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*key_cols, ordc).schema.fields
    ) + ", admitted int"
    return df.select(*key_cols, ordc, ec).groupBy(*key_cols).applyInPandas(
        _admit, schema
    )


def purge_accounting(
    df: DataFrame,
    delete_keys: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
) -> DataFrame:
    """Right-to-be-forgotten delete propagation with audit accounting.

    Given a table of deletion-request keys, report per ``group_cols`` how
    many rows a purge removes vs retains — the audit artifact a compliance
    run must emit BEFORE the destructive rewrite (the same
    account-then-act discipline as the route stage's unmatched-drop
    ledger, operators/route.py). One LEFT join against the key table
    (AQE broadcasts it while it is small; at fleet scale it shuffles on
    the key like any equi-join) and one aggregate.
    """
    marked = df.join(
        delete_keys.select(*key_cols, F.lit(1).alias("_del")).distinct(),
        key_cols,
        "left",
    )
    hit = F.col("_del").isNotNull().cast("bigint")
    return marked.groupBy(*group_cols).agg(
        F.sum(hit).alias("n_purged"),
        F.sum(1 - hit).alias("n_retained"),
    )


def k_anonymity_suppress(
    df: DataFrame,
    qi_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """k-anonymity suppression report over a quasi-identifier tuple.

    A (release-ready) group must contain at least ``k`` distinct
    individuals; smaller groups are suppressed. Emits per QI group the
    row count, distinct-individual count and the publish/suppress
    verdict — the privacy gate a transcript-derived dataset passes
    through before export. ONE exchange (hash aggregate on the QI key);
    the exact distinct count is the honest form at gate SF, with the
    HLL sketch (operators/sketch.py) as the scale path when the QI
    cardinality explodes.
    """
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(id_col).alias("n_ids"),
        (F.countDistinct(id_col) >= F.lit(k)).cast("int").alias("published"),
    )


def stitch_multiline(
    lines: DataFrame,
    stream_cols: list[str],
    order_col: str,
    text_col: str = "text",
    cont_prefix: str = "    ",
) -> DataFrame:
    """Stitch multiline log events (stack traces) back together: within
    one emitter stream, a line that does NOT start with ``cont_prefix``
    opens a new event and every following continuation line attaches to
    it — the stateful reassembly cernan's file tailer needs before a
    Java/Python traceback can be parsed as ONE event (the tailer itself
    is strictly line-grained, `/root/reference/src/source/file/
    file_server.rs` emits per-line; stitching is the consumer's job).

    The segment id is a running count of head lines per stream — the
    same flag-segmentation the burst collapse uses — and the stitched
    body is rebuilt in line order with ``array_sort`` over collected
    (order, text) structs, so the output is deterministic regardless of
    collect order. Continuations that precede any head in their stream
    (a tail rotated mid-trace) land in segment 0 under ``_ORPHAN_``
    instead of vanishing — the parser's bad-line accounting applied to
    reassembly.

    Scale: the running-sum window and the per-segment aggregate both
    cluster on the stream key — ONE exchange, same plan-shape family as
    :func:`burst_collapse`. No Python in the hot path.
    """
    is_head = ~F.col(text_col).startswith(cont_prefix)
    w = (
        Window.partitionBy(*stream_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = lines.withColumn("sid", F.sum(is_head.cast("long")).over(w))
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t")))
    )
    return (
        seg.groupBy(*stream_cols, "sid")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((~is_head).cast("long")).alias("n_frames"),
            F.min(order_col).alias("first_line"),
            F.max(F.when(is_head, F.col(text_col))).alias("_head"),
            parts.alias("_parts"),
        )
        .select(
            *stream_cols,
            "sid",
            F.coalesce(F.col("_head"), F.lit("_ORPHAN_")).alias("head"),
            "n_lines",
            "n_frames",
            "first_line",
            F.array_join(F.transform("_parts", lambda s: s["t"]), "\n").alias(
                "stitched"
            ),
        )
    )


def l_diversity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """l-diversity audit — the release gate AFTER k-anonymity: a QI
    group where every member shares one sensitive value leaks that
    value even when the group is large (homogeneity attack). Per QI
    group: row count, distinct sensitive values, the most-common
    sensitive value's share (the attack confidence), and the publish
    verdict ``n_sensitive >= l``.

    Two map-side-combined hash aggregates — (QI, sensitive) grain then
    QI grain, the second reusing the first's partitioning prefix; max
    and sum are order-free so no fold pinning is needed; the only
    division is at emit.
    """
    fine = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("_sens")
    ).agg(F.count(F.lit(1)).alias("c"))
    return fine.groupBy(*qi_cols).agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_sensitive"),
        (
            F.max("c").cast("double") / F.sum("c").cast("double")
        ).alias("max_share"),
        (F.count(F.lit(1)) >= F.lit(l)).cast("int").alias("published"),
    )


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    t: float,
) -> DataFrame:
    """t-closeness audit — the release gate AFTER :func:`l_diversity_audit`:
    a QI group whose sensitive-value MIX differs sharply from the corpus
    mix leaks information even when it is large and diverse (skewness
    attack: "errors are 80% of this group vs 5% overall"). Per QI group
    the ordered-domain Earth Mover's Distance between the group's
    sensitive distribution and the global one, normalized by (m-1);
    publish requires ``emd <= t`` (Li, Li & Venkatasubramanian, ICDE 2007).

    Exactness shape: every cumulative term is kept as the INTEGER
    numerator c_gv·N − C_v·n_g over the common denominator n_g·N, so the
    running prefix sums and |·| fold are pure BIGINT arithmetic — the
    single double division happens once per group at emit, and the DuckDB
    replay is bit-identical with no fold pinning.

    Scale shape: one (QI, sensitive) aggregate, a broadcast of the
    m-row global distribution (m = |sensitive domain|, tiny), a dense
    QI×m spine so absent values still move the cumulative sum, and one
    per-QI fold over the m ordered values. Shuffle grain is |QI|·m rows.

    Output: ``qi_cols..., n, emd, publish``.
    """
    sens = F.col(sensitive_col).alias("_sens")
    fine = df.groupBy(*qi_cols, sens).agg(F.count(F.lit(1)).alias("c"))
    groups = fine.groupBy(*qi_cols).agg(F.sum("c").alias("n_g"))
    glob = df.groupBy(sens).agg(F.count(F.lit(1)).alias("c_all"))
    totals = glob.agg(
        F.sum("c_all").alias("n_all"),
        F.count(F.lit(1)).alias("m"),
    )
    spine = (
        groups.crossJoin(F.broadcast(glob))
        .join(fine, [*qi_cols, "_sens"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            *qi_cols,
            "_sens",
            "n_g",
            "m",
            "n_all",
            (
                F.coalesce("c", F.lit(0)) * F.col("n_all")
                - F.col("c_all") * F.col("n_g")
            ).alias("d"),
        )
    )
    w = (
        Window.partitionBy(*qi_cols)
        .orderBy("_sens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = spine.select(
        *qi_cols,
        "n_g",
        "m",
        F.sum("d").over(w).alias("cum"),
        F.col("n_all"),
    )
    agg = cum.groupBy(*qi_cols).agg(
        F.first("n_g").alias("n"),
        F.sum(F.abs("cum")).alias("abs_sum"),
        F.first("m").alias("m"),
        F.first("n_all").alias("n_all"),
    )
    emd = F.col("abs_sum").cast("double") / (
        F.col("n").cast("double")
        * F.col("n_all").cast("double")
        * (F.col("m") - 1).cast("double")
    )
    return agg.select(
        *qi_cols,
        "n",
        F.round(emd, 6).alias("emd"),
        (emd <= F.lit(t)).alias("publish"),
    )


def cidr_rollup(
    df: DataFrame,
    ip_col: str,
    error_col: Column | None = None,
    prefixes: tuple[int, ...] = (16, 24),
) -> DataFrame:
    """CIDR prefix rollup of client IPs — the "which subnet is hammering
    us / erroring" view an access-log pipeline reads before rate-limiting
    or blocklisting. Dotted quads become uint32 via pure integer
    arithmetic, each requested prefix length masks by integer division
    (no cross-engine bitwise ops), and per (prefix, network): request
    count, distinct addresses, error count + rate.

    Malformed addresses (wrong field count / out-of-range octet) group
    under network '_BAD_' with prefix 0 — the parse-failure accounting
    rule every ingest operator in this repo follows (statsd.rs bad-line
    counters). One aggregate per prefix length over exact BIGINTs; the
    only double is the error-rate division.

    Output: ``prefix_len, network, n_requests, n_ips, n_errors,
    error_rate``.
    """
    parts = F.split(F.col(ip_col), r"\.")
    # F.get (NULL out-of-bounds) + try_cast (NULL on garbage): malformed
    # addresses must route to accounting, not throw under ANSI mode.
    octs = [F.get(parts, i).try_cast("long") for i in range(4)]
    valid = (F.size(parts) == 4) & F.lit(True)
    for o in octs:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    ip32 = (
        octs[0] * 16777216 + octs[1] * 65536 + octs[2] * 256 + octs[3]
    )
    err = (
        error_col.cast("long")
        if error_col is not None
        else F.lit(0).cast("long")
    )
    base = df.select(
        valid.alias("ok"), ip32.alias("ip32"), err.alias("err")
    )
    outs = []
    for p in prefixes:
        block = 1 << (32 - p)
        net32 = (F.col("ip32") - F.col("ip32") % block).alias("net32")
        net_str = F.concat(
            (F.col("net32") / 16777216).cast("long").cast("string"),
            F.lit("."),
            ((F.col("net32") / 65536).cast("long") % 256).cast("string"),
            F.lit("."),
            ((F.col("net32") / 256).cast("long") % 256).cast("string"),
            F.lit("."),
            (F.col("net32") % 256).cast("string"),
            F.lit("/"),
            F.lit(str(p)),
        )
        g = (
            base.filter("ok")
            .select(net32, "ip32", "err")
            .groupBy("net32")
            .agg(
                F.count(F.lit(1)).alias("n_requests"),
                F.countDistinct("ip32").alias("n_ips"),
                F.sum("err").alias("n_errors"),
            )
            .select(
                F.lit(p).alias("prefix_len"),
                net_str.alias("network"),
                "n_requests",
                "n_ips",
                "n_errors",
                F.round(
                    F.col("n_errors").cast("double")
                    / F.col("n_requests").cast("double"),
                    6,
                ).alias("error_rate"),
            )
        )
        outs.append(g)
    bad = (
        base.filter(~F.col("ok"))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum("err").alias("n_errors"),
        )
        .filter(F.col("n_requests") > 0)
        .select(
            F.lit(0).alias("prefix_len"),
            F.lit("_BAD_").alias("network"),
            "n_requests",
            F.lit(0).cast("long").alias("n_ips"),
            "n_errors",
            F.round(
                F.col("n_errors").cast("double")
                / F.col("n_requests").cast("double"),
                6,
            ).alias("error_rate"),
        )
    )
    out = outs[0]
    for g in outs[1:]:
        out = out.unionByName(g)
    return out.unionByName(bad)
