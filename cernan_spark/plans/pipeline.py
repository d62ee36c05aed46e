"""The flagship DAG: parse → enrich → route → aggregate over transcripts.

Mirrors cernan's statsd-packet lifecycle (SURVEY.md §3.1): ingest/parse
(src/source/statsd.rs:89-205 → protocols/statsd.rs:22-163), fan-out routing
(src/util.rs:28-68), bucket aggregation (src/buckets.rs:146-178), per-sink
flush formatting (src/sink/*.rs) — re-expressed as one declarative Spark
plan per stage. Stage boundaries:

  scan (column-pruned parquet) ─ narrow → explode/classify/parse/enrich
  (single codegen stage) → broadcast route (no shuffle) → per-kind hash
  aggregate (THE shuffle, map-side combined) → sink formatting (narrow).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cernan_spark.functions.classify import explode_lines
from cernan_spark.functions.graphite import parse_graphite_lines
from cernan_spark.functions.jsonlog import parse_json_logs
from cernan_spark.functions.statsd import parse_statsd_lines
from cernan_spark.operators.aggregate import bucket_aggregate, prometheus_accumulate
from cernan_spark.operators.enrich import enrich_tags, enrich_tags_fast
from cernan_spark.operators.route import route, routed_counts, unrouted
from cernan_spark.sources.dimensions import (
    default_histogram_masks,
    default_routes,
    default_tag_dicts,
)


@dataclass
class PipelineConfig:
    bin_width: int = 60
    quantiles: list[float] = field(
        default_factory=lambda: [0.0, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1.0]
    )
    accuracy: int = 1000
    with_tags: bool = True
    #: per-sink late/early-data rejection window in seconds (wavefront
    #: age_threshold, wavefront.rs:643-651; None = accept everything).
    #: Batch 'now' = the input's max event time.
    age_threshold_s: int | None = None


def parse_stage(
    transcripts: DataFrame, masks: DataFrame | None = None
) -> dict[str, DataFrame]:
    """Explode text into lines, classify, parse each wire format.

    Returns {'telemetry', 'logs', 'bad'} DataFrames. Telemetry rows carry
    (name, value, kind, persist[, bounds], event_epoch) + provenance
    (conv_id, turn_idx, order_key, role, tool, ts).
    """
    if "order_key" not in transcripts.columns:
        transcripts = transcripts.withColumn(
            "order_key",
            F.xxhash64("conv_id") * 65536 + F.col("turn_idx").cast("long"),
        )
    # Parse once, classify from parse validity (classifying first and then
    # re-parsing would evaluate the whole statsd string scan twice per line).
    exploded = explode_lines(transcripts)
    parsed_all = parse_statsd_lines(exploded, masks=masks, keep_invalid=True)
    from cernan_spark.functions.classify import (
        CLASS_BAD, CLASS_GRAPHITE, CLASS_JSON, CLASS_LOG, CLASS_STATSD,
    )
    from cernan_spark.functions.graphite import GRAPHITE_LINE_RX

    line = F.col("line")
    lines = parsed_all.withColumn(
        "line_class",
        F.when(F.col("is_valid"), F.lit(CLASS_STATSD))
        .when(line.rlike(GRAPHITE_LINE_RX), F.lit(CLASS_GRAPHITE))
        .when(line.startswith("{"), F.lit(CLASS_JSON))
        .when(
            (line == "")
            | line.contains("|")
            | (line.contains(":") & ~line.contains(" "))
            | ~line.contains(" "),
            F.lit(CLASS_BAD),
        )
        .otherwise(F.lit(CLASS_LOG)),
    )

    # Telemetry = UNION of the statsd and graphite branches, each refiltering
    # the shared subtree. This duplicates the scan+explode in the physical
    # plan (Spark shares no subplans across union arms) — measured and kept
    # anyway: fusing the branches into one projection with CASE-per-column
    # ran 1.4× SLOWER (66 vs 48 s at local[8] on 16M turns) and a single
    # struct-level CASE 3.8× slower, because codegen subexpression
    # elimination only applies to UNCONDITIONAL expressions — any
    # conditional wrapper re-evaluates the full parse per referencing
    # column. The columnar scan the union duplicates costs <0.6 s.
    statsd = lines.filter(F.col("line_class") == "statsd").withColumn(
        "event_epoch", F.lit(None).cast("long")
    )
    graphite = parse_graphite_lines(
        lines.filter(F.col("line_class") == "graphite").drop(
            "name", "value", "kind", "persist", "is_valid", "bounds"
        )
    )
    common = [
        "conv_id", "turn_idx", "order_key", "role", "tool", "ts",
        "name", "value", "kind", "persist", "event_epoch",
    ]
    telemetry = (
        statsd.withColumn("bounds_", F.col("bounds") if "bounds" in statsd.columns
                          else F.lit(None).cast("array<double>"))
        .select(*common, F.col("bounds_").alias("bounds"))
        .unionByName(
            graphite.select(
                *common, F.lit(None).cast("array<double>").alias("bounds")
            )
        )
    )
    logs = parse_json_logs(
        lines.filter(F.col("line_class").isin("json", "log"))
    )
    bad = lines.filter(F.col("line_class") == "bad")
    return {"telemetry": telemetry, "logs": logs, "bad": bad}


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
    routes: DataFrame | None = None,
    tag_dicts: DataFrame | None = None,
    masks: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full parse → enrich → route → aggregate. Returns every materializable
    stage so callers (tests, bench, sinks) pick what they need lazily."""
    cfg = cfg or PipelineConfig()
    routes = routes if routes is not None else default_routes(spark)
    tag_dicts = tag_dicts if tag_dicts is not None else default_tag_dicts(spark)
    masks = masks if masks is not None else default_histogram_masks(spark)

    stages = parse_stage(transcripts, masks=masks)
    telemetry, logs, bad = stages["telemetry"], stages["logs"], stages["bad"]

    telemetry_unfiltered = None
    if cfg.age_threshold_s is not None:
        # wavefront-style age_threshold (wavefront.rs:643-651): reject
        # telemetry older/newer than the window around 'now' (batch now =
        # max event time — a deterministic high-watermark)
        from cernan_spark.operators.filters import delay_filter

        telemetry_unfiltered = telemetry

        now_ref = telemetry.agg(
            F.max(F.coalesce(F.col("event_epoch"), F.unix_timestamp("ts"))).alias(
                "_now"
            )
        )
        # wavefront's bound is inclusive (<=, wavefront.rs:645) while
        # DelayFilter's is strict (<); +1 on integer seconds makes the
        # strict filter inclusive at the configured threshold
        telemetry = delay_filter(
            telemetry.crossJoin(F.broadcast(now_ref)),
            cfg.age_threshold_s + 1,
            F.col("_now"),
        ).drop("_now")

    if cfg.with_tags:
        # transcripts carry no event tags → the precomputed-combo fast path
        # (one broadcast join, no per-row map merging)
        telemetry = enrich_tags_fast(telemetry, tag_dicts)
        logs = enrich_tags_fast(logs, tag_dicts)

    telemetry = telemetry.withColumn("match_kind_value", F.lit("telemetry"))
    logs = logs.withColumn("match_kind_value", F.lit("log")).withColumn(
        "name", F.col("conv_id")
    )

    routed_tel = route(telemetry, routes)
    routed_logs = route(logs, routes)
    dropped = unrouted(telemetry, routes)

    # Aggregate ONCE on the un-fanned telemetry (one scan, one shuffle via
    # bucket_aggregate_onepass), then fan the per-series aggregates out to
    # sinks with a broadcast route join — the fan-out multiplies tiny
    # aggregate rows, not raw events. Valid because sinks share bin_width
    # here; per-sink widths would use _agg_per_sink instead.
    from cernan_spark.functions.statsd import mask_bounds_expr
    from cernan_spark.operators.aggregate import bucket_aggregate_onepass

    agg_once = bucket_aggregate_onepass(
        telemetry, bin_width=cfg.bin_width, quantiles=cfg.quantiles,
        accuracy=cfg.accuracy, bounds_expr=mask_bounds_expr(masks),
    )
    agg = route(
        agg_once.withColumn("match_kind_value", F.lit("telemetry")), routes
    ).drop("match_kind_value", "rule_id")

    prom = prometheus_accumulate(
        agg.filter(F.col("sink") == "prometheus"), ["sink", "name", "kind"]
    )

    result = {
        "telemetry": telemetry,
        "logs": logs,
        "bad": bad,
        "routed_telemetry": routed_tel,
        "routed_logs": routed_logs,
        "dropped": dropped,
        "aggregates": agg,
        "prometheus": prom,
        "sink_counts": routed_counts(
            routed_tel.select("sink").unionByName(routed_logs.select("sink"))
        ),
    }
    if telemetry_unfiltered is not None:
        # pre-delay-filter rows, for the internal accept/reject accounting
        result["telemetry_unfiltered"] = telemetry_unfiltered
    return result


def _agg_per_sink(routed_tel: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Bucket-aggregate with `sink` folded into the group key (one shuffle
    covers all sinks instead of one scan per sink)."""
    keyed = routed_tel.withColumn("name", F.concat_ws("\x1f", "sink", "name"))
    agg = bucket_aggregate(
        keyed, bin_width=cfg.bin_width, quantiles=cfg.quantiles, accuracy=cfg.accuracy
    )
    split = F.split(F.col("name"), "\x1f", 2)
    return agg.withColumn("sink", split.getItem(0)).withColumn(
        "name", split.getItem(1)
    )
