"""Internal self-telemetry: the ``cernan.*`` metrics the Internal source
emits about the pipeline itself (reference src/source/internal.rs:105-455 —
per-source packet counters, per-filter accept/reject, per-sink delivery and
aggregation counters).

Batch form: one tiny union-of-aggregates DataFrame (name, value, kind)
derived lazily from a ``run_pipeline`` output dict. Every branch is a
count over an already-planned stage — Spark reuses the shared subplans; no
extra scan of the raw input is added beyond the counting aggregates
themselves. Metric names match the reference byte-for-byte where the
concept maps (statsd/graphite packet counts, sink delivery totals,
wavefront per-kind aggregation counters)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "name string, value double, kind string"


def _counter(df: DataFrame, name: str) -> DataFrame:
    return df.agg(
        F.lit(name).alias("name"),
        F.count("*").cast("double").alias("value"),
        F.lit("SUM").alias("kind"),
    )


def internal_telemetry(
    spark: SparkSession, out: dict[str, DataFrame]
) -> DataFrame:
    """cernan.* self-metrics for one pipeline run.

    * ``cernan.statsd.packet`` / ``cernan.graphite.telemetry.received`` —
      per-protocol parse counts (internal.rs statsd/graphite blocks);
    * ``cernan.statsd.bad_packet`` — unparseable lines;
    * ``cernan.sinks.<sink>.records.total_delivered`` — routed rows per
      sink (elasticsearch.rs-style delivery totals);
    * ``cernan.sinks.wavefront.aggregation.<kind>`` — per-kind aggregate
      series counts (internal.rs wavefront block).
    """
    tel = out["telemetry"]
    # statsd lines carry no wire timestamp; graphite triples do
    statsd = _counter(
        tel.filter(F.col("event_epoch").isNull()), "cernan.statsd.packet"
    )
    graphite = _counter(
        tel.filter(F.col("event_epoch").isNotNull()),
        "cernan.graphite.telemetry.received",
    )
    bad = _counter(out["bad"], "cernan.statsd.bad_packet")
    delivered = out["sink_counts"].select(
        F.concat(
            F.lit("cernan.sinks."), F.col("sink"), F.lit(".records.total_delivered")
        ).alias("name"),
        F.col("n_rows").cast("double").alias("value"),
        F.lit("SUM").alias("kind"),
    )
    wf_kinds = (
        out["aggregates"]
        .filter(F.col("sink") == "wavefront")
        .groupBy(F.lower("kind").alias("_k"))
        .agg(F.count("*").cast("double").alias("value"))
        .select(
            F.concat(
                F.lit("cernan.sinks.wavefront.aggregation."),
                F.when(F.col("_k") == "histogram", F.lit("histogram")).otherwise(
                    F.col("_k")
                ),
            ).alias("name"),
            "value",
            F.lit("SUM").alias("kind"),
        )
    )
    return (
        statsd.unionByName(graphite)
        .unionByName(bad)
        .unionByName(delivered)
        .unionByName(wf_kinds)
    )
