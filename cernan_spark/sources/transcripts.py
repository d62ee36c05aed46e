"""The transcripts input table (conv_id, turn_idx, role, text, tool, ts).

Two deterministic producers:

* :func:`transcripts_from_events` — derives a transcripts table from the
  driver's ``events`` parquet with pure column expressions. The identical
  derivation exists as ANSI SQL (:data:`TRANSCRIPTS_FROM_EVENTS_SQL`) so the
  DuckDB oracle can rebuild byte-identical transcripts — this is what makes
  every downstream pipeline operator oracle-checkable.

* :func:`synthetic_transcripts` — a seeded Spark-native generator (no
  driver-side loops; scales to any row count) embedding the reference's
  statsd/graphite/JSON golden corpora in ``text`` (fixture F1a-F1d,
  mirroring /root/reference/src/protocols/statsd.rs:577-623 and
  graphite.rs:56-92), including a hot conv_id key (~20% of rows) to
  exercise skew handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# events → transcripts derivation (Spark + DuckDB twins)
# ---------------------------------------------------------------------------

# event_type → (metric name, statsd type suffix, role, tool)
_EVENT_MAP = {
    "click": ("clicks", "|c", "user", "grep"),
    "view": ("views", "|g", "user", "read"),
    "purchase": ("purchase_ms", "|ms", "assistant", "search"),
    "signup": ("signups", "|c|@0.5", "system", "none"),
    "error": ("errors", "|h", "tool", "bash"),
}


def _case_map(col: Column, idx: int) -> Column:
    expr = F.lit(None)
    first = True
    for etype, tup in _EVENT_MAP.items():
        branch = F.lit(tup[idx])
        if first:
            expr = F.when(col == etype, branch)
            first = False
        else:
            expr = expr.when(col == etype, branch)
    return expr


def transcripts_from_events(
    spark: SparkSession, sf_dir: str, with_order_key: bool = True
) -> DataFrame:
    """Deterministic transcripts table derived from events.parquet.

    Statsd-style wire lines are synthesized into ``text`` (the metric value
    is printf('%.2f') so Spark and DuckDB agree byte-for-byte). The row_number
    over (user_id, event_id) gives the dense per-conversation ``turn_idx`` —
    the stable order key mandated by the north rule (replaces cernan's
    order-of-receipt, reference src/metric/telemetry.rs:23-24).
    """
    from cernan_spark.sources.tables import spread_scan

    # Distribute the scan (guide §2.5): events.parquet is a single-row-group
    # file locally, so without this every consumer that prunes the turn_idx
    # window (bucket aggregates, routing, grok) runs its whole fused
    # parse chain in ONE task. Hashing on user_id means the turn_idx
    # window's required distribution is already satisfied — consumers that
    # DO use the window pay no extra exchange (verified in plans/r06).
    ev = spread_scan(spark.read.parquet(f"{sf_dir}/events.parquet"), "user_id")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("event_id")
    et = F.col("event_type")
    out = ev.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0")).alias(
            "conv_id"
        ),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        _case_map(et, 2).alias("role"),
        F.concat(
            _case_map(et, 0),
            F.lit(":"),
            F.format_string("%.2f", F.col("value")),
            _case_map(et, 1),
        ).alias("text"),
        _case_map(et, 3).alias("tool"),
        F.col("ts"),
        F.col("event_id").alias("order_key"),
    )
    if not with_order_key:
        out = out.drop("order_key")
    return out


#: DuckDB twin of transcripts_from_events — `{events}` is the registered view.
TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INTEGER) AS turn_idx,
  CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'user'
       WHEN 'purchase' THEN 'assistant' WHEN 'signup' THEN 'system'
       WHEN 'error' THEN 'tool' END AS role,
  CASE event_type
       WHEN 'click'    THEN 'clicks:'      || printf('%.2f', value) || '|c'
       WHEN 'view'     THEN 'views:'       || printf('%.2f', value) || '|g'
       WHEN 'purchase' THEN 'purchase_ms:' || printf('%.2f', value) || '|ms'
       WHEN 'signup'   THEN 'signups:'     || printf('%.2f', value) || '|c|@0.5'
       WHEN 'error'    THEN 'errors:'      || printf('%.2f', value) || '|h'
  END AS text,
  CASE event_type WHEN 'click' THEN 'grep' WHEN 'view' THEN 'read'
       WHEN 'purchase' THEN 'search' WHEN 'signup' THEN 'none'
       WHEN 'error' THEN 'bash' END AS tool,
  ts,
  event_id AS order_key
FROM events
"""

# ---------------------------------------------------------------------------
# fully synthetic transcripts (fixture corpus F1a–F1d)
# ---------------------------------------------------------------------------

# Golden statsd corpus — every kind + edge case from the reference tests
# (src/protocols/statsd.rs:358-420,553-623). %v is a value slot.
STATSD_CORPUS = [
    "zrth:0|g",
    "fst:-1.1|ms",
    "snd:+2.2|g",
    "thd:3.3|h",
    "fth:4|c",
    "fvth:5.5|c|@0.1",
    "sxth:-6.6|g",
    "svth:+7.77|g",
    "a-b:5.2|c@0.2",
    "a=b:1|c",
    "a/b:2|c",
    "load:%v|g",
    "req_ms:%v|ms",
    "hist.bucketed:%v|h",
    "counter:%v|c",
    "counter:%v|c|@0.25",
]

# Invalid lines — must be counted as bad rows, never crash
# (src/protocols/statsd.rs:553-573).
BAD_CORPUS = ["", "metric", "metric|11:", "metric:13|", ":|@", ":1.0|c", "a:b|c"]

GRAPHITE_CORPUS = [
    "fst %i 101",
    "snd -2.0 202",
    "fth@fth %v 404",
    "fv%fv 5 505",
    "s-th %v 606",
]

JSON_CORPUS = [
    '{"good": "do parse", "level": "info", "n": %i}',
    '[123, "not an object"]',
    "this is not json",
    '{"path": "collide", "time": "collide", "dup": %i}',
]

PROSE_CORPUS = [
    "please run the batch job again",
    "the quick brown fox jumps over the lazy dog",
    "ok, rerunning with the larger window now",
    "tool output attached below",
]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "read", "write", "grep", "search", "none"]


def _pick(arr: list[str], h: Column) -> Column:
    """Deterministically pick an element of a literal array by hash."""
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    turns_per_conv: int = 40,
    seed: int = 42,
    hot_frac: float = 0.2,
    base_epoch: int = 1_700_000_000,
) -> DataFrame:
    """Seeded synthetic transcripts, generated distributively via spark.range.

    ~60% statsd lines, 10% graphite, 10% JSON logs, 10% prose, 10% bad lines.
    ``hot_frac`` of all rows collapse onto conv-000000 (the skew fixture).
    Multiple turns land in the same epoch second so aggregation bins merge
    (mirrors reference test src/buckets.rs:739-789).
    """
    n = n_convs * turns_per_conv
    df = spark.range(n).select(
        F.col("id"),
        F.xxhash64(F.lit(seed), F.col("id")).alias("h"),
        F.xxhash64(F.lit(seed + 1), F.col("id")).alias("h2"),
    )

    raw_conv = F.floor(F.col("id") / turns_per_conv)
    hot = F.pmod(F.col("h"), F.lit(1000)) < int(hot_frac * 1000)
    conv = F.when(hot, F.lit(0)).otherwise(raw_conv)

    # value slots: deterministic small floats / ints
    v = (F.pmod(F.col("h2"), F.lit(100000)) / 100.0).cast("double")
    i_ = F.pmod(F.col("h2"), F.lit(1000))
    vs = F.format_string("%.2f", v)

    bucket = F.pmod(F.col("h"), F.lit(10))
    text_statsd = _pick(STATSD_CORPUS, F.col("h2"))
    text_graphite = _pick(GRAPHITE_CORPUS, F.col("h2"))
    text_json = _pick(JSON_CORPUS, F.col("h2"))
    text_prose = _pick(PROSE_CORPUS, F.col("h2"))
    text_bad = _pick(BAD_CORPUS, F.col("h2"))

    text = (
        F.when(bucket <= 5, text_statsd)
        .when(bucket == 6, text_graphite)
        .when(bucket == 7, text_json)
        .when(bucket == 8, text_prose)
        .otherwise(text_bad)
    )
    text = F.replace(text, F.lit("%v"), vs)
    text = F.replace(text, F.lit("%i"), i_.cast("string"))

    # Conversations run concurrently in 24 hour-slots of a simulated day
    # (real telemetry: many series points share each (name, bin) group), and
    # ~4 turns share each epoch second within a conversation → bins merge
    # both within and across conversations.
    ts = F.timestamp_seconds(
        F.lit(base_epoch)
        + F.pmod(raw_conv, F.lit(24)) * 3600
        + F.floor(F.pmod(F.col("id"), turns_per_conv) / 4) * 7
    )

    # turn_idx without a window (a row_number over conv_id would serialize
    # the hot key into one task — the very skew this fixture exists to
    # exercise downstream): normal convs get their dense in-conv position;
    # the hot conv uses the globally-unique id (unique + ordered, sparse).
    turn_idx = (
        F.when(hot, F.col("id")).otherwise(F.pmod(F.col("id"), turns_per_conv))
    ).cast("int")

    return df.select(
        F.concat(F.lit("conv-"), F.lpad(conv.cast("string"), 6, "0")).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        _pick(ROLES, F.col("h")).alias("role"),
        text.alias("text"),
        _pick(TOOLS, F.col("h2")).alias("tool"),
        ts.alias("ts"),
        F.col("id").alias("order_key"),
    )
