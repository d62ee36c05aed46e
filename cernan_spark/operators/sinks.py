"""Sink-side output formatting: each cernan sink's wire format as a
formatted string column over its routed/aggregated table.

At scale each sink is one partitioned write of a routed table; the
formatting expressions are whole-stage-codegen string concat — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cernan_spark.operators.aggregate import cumulative_histogram


def _tags_kv(tags: Column, sep: str = " ", quote: bool = True) -> Column:
    entries = F.array_sort(F.map_entries(tags))
    if quote:
        fmt = lambda e: F.concat(e["key"], F.lit('="'), e["value"], F.lit('"'))
    else:
        fmt = lambda e: F.concat(e["key"], F.lit("="), e["value"])
    return F.array_join(F.transform(entries, fmt), sep)


def wavefront_format(agg: DataFrame, bin_width: int) -> DataFrame:
    """`name value ts tag="v" ...` lines (reference
    src/sink/wavefront.rs:386-457): scalar kinds emit one line; Summarize
    emits one line per quantile plus `.count` and `.mean` companions
    (wavefront.rs:531-573)."""
    ts = (F.col("bin") * bin_width).cast("string")
    tags = F.coalesce(F.col("tags"), F.expr("map()")) if "tags" in agg.columns else F.expr("map()")
    kv = _tags_kv(tags)

    scalar = agg.filter(F.col("kind").isin("SUM", "SET")).select(
        F.concat_ws(" ", F.col("name"), F.col("agg_value").cast("string"), ts, kv).alias("line"),
        F.lit("point").alias("series_kind"),
    )
    summ = agg.filter(F.col("kind") == "SUMMARIZE")
    q = summ.select(
        "name", "bin", "n_points", "mean_value",
        F.explode(F.arrays_zip("quantile_probs", "quantile_values")).alias("qz"),
    ).select(
        F.concat_ws(
            " ",
            F.concat(F.col("name"), F.lit(".q"),
                     F.regexp_replace(F.format_number(F.col("qz.quantile_probs"), 3), r"\.?0+$", "")),
            F.col("qz.quantile_values").cast("string"),
            ts,
            F.lit(""),
        ).alias("line"),
        F.lit("quantile").alias("series_kind"),
    )
    companions = summ.select(
        F.explode(
            F.array(
                F.concat_ws(" ", F.concat(F.col("name"), F.lit(".count")),
                            F.col("n_points").cast("string"), ts),
                F.concat_ws(" ", F.concat(F.col("name"), F.lit(".mean")),
                            F.col("mean_value").cast("string"), ts),
            )
        ).alias("line"),
    ).withColumn("series_kind", F.lit("companion"))
    return scalar.unionByName(q).unionByName(companions)


def prometheus_format(
    cum: DataFrame, summaries: DataFrame | None = None
) -> DataFrame:
    """Exposition text (reference src/sink/prometheus.rs:499-675): counters
    from cumulative sums, gauges from latest Set, histograms as running-sum
    `le` buckets. Names sanitized to [a-zA-Z0-9:_] (prometheus.rs:607-628).
    Input: prometheus_accumulate output restricted to each key's last bin.

    Histogram bucket counts come from ``cum_hist`` (the perpetually
    accumulated counts across ALL bins, prometheus.rs:279-310) when the
    accumulator provides it, falling back to the single-bin ``hist``.
    ``summaries``, when given, feeds the summary section from the
    capacity-windowed operator (prometheus_windowed_summaries — the
    reference's Windowed accumulator) instead of the last bin's sketch."""
    san = F.regexp_replace(F.col("name"), r"[^a-zA-Z0-9:_]", "_")
    scalar = cum.filter(F.col("kind").isin("SUM", "SET")).select(
        F.concat(
            F.lit("# TYPE "), san,
            F.when(F.col("kind") == "SUM", F.lit(" counter\n")).otherwise(F.lit(" gauge\n")),
            san, F.lit(" "), F.col("cum_value").cast("string"),
        ).alias("exposition")
    )
    parts = [scalar]
    if "hist" in cum.columns:
        hsrc = cum.filter(F.col("kind") == "HISTOGRAM")
        if "cum_hist" in cum.columns:
            hsrc = hsrc.withColumn(
                "hist", F.coalesce(F.col("cum_hist"), F.col("hist"))
            )
        hist = cumulative_histogram(hsrc).select(
            F.concat(
                F.lit("# TYPE "), san, F.lit(" histogram\n"),
                F.array_join(
                    F.transform(
                        F.col("hist_cum"),
                        lambda b: F.concat(
                            san, F.lit('_bucket{le="'),
                            F.when(b["le"] == float("inf"), F.lit("+Inf"))
                            .otherwise(b["le"].cast("string")),
                            F.lit('"} '), b["cum_cnt"].cast("string"),
                        ),
                    ),
                    "\n",
                ),
            ).alias("exposition")
        )
        parts.append(hist)
    # summaries: quantile series + _sum/_count companions
    # (prometheus.rs:564-597; quantile list 568). Source: the windowed
    # accumulator when wired, else the input's own Summarize rows. Counts
    # render integer-style, matching Rust's f64 Display of whole numbers.
    summ = (
        summaries
        if summaries is not None
        else (
            cum.filter(F.col("kind") == "SUMMARIZE")
            if "quantile_values" in cum.columns
            else None
        )
    )
    if summ is not None:
        qlines = F.array_join(
            F.transform(
                F.arrays_zip("quantile_probs", "quantile_values"),
                lambda z: F.concat(
                    san, F.lit('{quantile="'),
                    z["quantile_probs"].cast("string"), F.lit('"} '),
                    z["quantile_values"].cast("string"),
                ),
            ),
            "\n",
        )
        summary = summ.select(
            F.concat(
                F.lit("# TYPE "), san, F.lit(" summary\n"),
                qlines, F.lit("\n"),
                san, F.lit("_sum "),
                F.coalesce(F.col("samples_sum"), F.lit(0.0)).cast("string"),
                F.lit("\n"),
                san, F.lit("_count "),
                F.col("n_points").cast("long").cast("string"),
            ).alias("exposition")
        )
        parts.append(summary)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def influxdb_format(points: DataFrame) -> DataFrame:
    """Line protocol `name[,tag=v] value=<v> <ns>` with nanosecond
    timestamps (reference src/sink/influxdb.rs:102-124). InfluxDB buffers
    raw points without merging (influxdb.rs:285-287) → input is the routed
    UNaggregated telemetry."""
    tags = F.coalesce(F.col("tags"), F.expr("map()")) if "tags" in points.columns else F.expr("map()")
    kv = _tags_kv(tags, sep=",", quote=False)
    epoch_ns = (F.unix_timestamp("ts").cast("long") * F.lit(1_000_000_000)).cast("string")
    return points.select(
        F.concat(
            F.col("name"),
            F.when(kv != "", F.concat(F.lit(","), kv)).otherwise(F.lit("")),
            F.lit(" value="), F.col("value").cast("string"), F.lit(" "), epoch_ns,
        ).alias("line")
    )


def elasticsearch_format(logs: DataFrame) -> DataFrame:
    """Bulk-index JSON doc with a deterministic id and date-suffixed index
    (reference src/sink/elasticsearch.rs:126-158): the doc body is the
    base payload (uuid/path/payload/timestamp) with every tag AND every
    parsed field inserted as a top-level key — fields override tags
    override base keys, matching the reference's insert order."""
    from cernan_spark.functions.jsonlog import merge_maps_first_wins

    empty = F.expr("map()")
    tags = F.coalesce(F.col("tags"), empty) if "tags" in logs.columns else empty
    fields = (
        F.coalesce(F.col("fields"), empty) if "fields" in logs.columns else empty
    )
    base = F.create_map(
        F.lit("uuid"),
        F.sha2(F.concat_ws("|", "conv_id", F.col("order_key").cast("string")), 256),
        F.lit("path"), F.col("conv_id"),
        F.lit("payload"), F.col("line"),
        F.lit("timestamp"), F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssXXX"),
    )
    doc = F.to_json(merge_maps_first_wins(fields, tags, base))
    index = F.concat(F.lit("cernan-"), F.date_format("ts", "yyyy.MM.dd"))
    return logs.select(index.alias("index"), doc.alias("doc"))


def kafka_format(logs: DataFrame) -> DataFrame:
    """Kafka record shape: payload bytes keyed by order_by with metadata
    headers (reference src/sink/kafka.rs:271-430; order_by keying keeps
    per-key ordering through partitioned topics). Event tags take
    precedence over the synthesized ``path`` header (the same tags-beat-
    base order as the elasticsearch doc) — a plain map_concat would throw
    under Spark's default mapKeyDedupPolicy=EXCEPTION whenever an event
    carries a tag literally named ``path``."""
    from cernan_spark.functions.jsonlog import merge_maps_first_wins

    empty = F.expr("map()")
    tags = F.coalesce(F.col("tags"), empty) if "tags" in logs.columns else empty
    return logs.select(
        F.col("order_key").cast("string").alias("key"),
        F.col("line").cast("binary").alias("value"),
        merge_maps_first_wins(
            tags, F.create_map(F.lit("path"), F.col("conv_id"))
        ).alias("headers"),
    )


#: console.rs:162-183 Summarize stat lines: (label, quantile)
CONSOLE_STATS = [
    ("min", 0.0), ("max", 1.0), ("50", 0.5), ("90", 0.9),
    ("99", 0.99), ("999", 0.999),
]


def console_sections(agg: DataFrame, bin_width: int) -> DataFrame:
    """Console sink per-kind sections (reference src/sink/console.rs:100-195):

      sums / sets:   ``    name(timestamp): value``
      summaries:     ``    name: <min|max|50|90|99|999> <quantile>``
      histograms:    ``    name_<bound|pos_inf>(timestamp): count``

    Output rows (section, line); values %.4f-formatted (the reference
    prints Rust f64 Display — not reproducible cross-engine, so the wire
    format is pinned to 4 decimals here and in the oracle). Input: the
    wide bucket-aggregate table."""
    ts = (F.col("bin") * bin_width).cast("string")
    v4 = lambda c: F.format_string("%.4f", c)

    def scalar(kind: str, section: str) -> DataFrame:
        return agg.filter(F.col("kind") == kind).select(
            F.lit(section).alias("section"),
            F.concat(
                F.lit("    "), F.col("name"), F.lit("("), ts, F.lit("): "),
                v4(F.col("agg_value")),
            ).alias("line"),
        )

    summ = agg.filter(F.col("kind") == "SUMMARIZE")
    stat_lines = []
    for label, q in CONSOLE_STATS:
        qv = F.element_at(
            "quantile_values",
            F.array_position("quantile_probs", F.lit(q)).cast("int"),
        )
        stat_lines.append(
            F.concat(
                F.lit("    "), F.col("name"), F.lit(": "), F.lit(label),
                F.lit(" "), v4(qv),
            )
        )
    summaries = summ.select(
        F.lit("summaries").alias("section"),
        F.explode(F.array(*stat_lines)).alias("line"),
    )
    hist = agg.filter(F.col("kind") == "HISTOGRAM").select(
        "name", "bin", F.explode("hist").alias("b")
    ).select(
        F.lit("histograms").alias("section"),
        F.concat(
            F.lit("    "), F.col("name"), F.lit("_"),
            F.when(F.col("b.bound") == float("inf"), F.lit("pos_inf"))
            .otherwise(v4(F.col("b.bound"))),
            F.lit("("), ts, F.lit("): "), F.col("b.cnt").cast("string"),
        ).alias("line"),
    )
    return (
        scalar("SUM", "sums")
        .unionByName(scalar("SET", "sets"))
        .unionByName(summaries)
        .unionByName(hist)
    )


def console_format(agg: DataFrame, bin_width: int) -> DataFrame:
    """Human text like the console sink's per-kind sections
    (reference src/sink/console.rs:161-208)."""
    ts = F.from_unixtime(F.col("bin") * bin_width).cast("string")
    val = F.coalesce(
        F.col("agg_value"),
        F.col("samples_sum"),
        F.col("n_points").cast("double"),
    )
    return agg.select(
        F.concat_ws(
            " ", ts, F.col("kind"), F.col("name"), F.lit("="), val.cast("string")
        ).alias("line")
    )
