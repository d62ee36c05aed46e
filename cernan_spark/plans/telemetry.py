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


def _value(df_agg, name: str) -> DataFrame:
    """Wrap a 1-row aggregate (single numeric column) as a named series."""
    col = df_agg.columns[0]
    return df_agg.select(
        F.lit(name).alias("name"),
        F.coalesce(F.col(col).cast("double"), F.lit(0.0)).alias("value"),
        F.lit("SUM").alias("kind"),
    )


def internal_telemetry(
    spark: SparkSession, out: dict[str, DataFrame]
) -> DataFrame:
    """cernan.* self-metrics for one pipeline run — names byte-identical to
    internal.rs:105-455 where the concept maps:

    * per-protocol parse counts: ``cernan.statsd.packet`` /
      ``.bad_packet``, ``cernan.graphite.packet`` /
      ``.telemetry.received``;
    * per-filter accept/reject: ``cernan.filters.delay.telemetry.accept``
      / ``.reject`` (internal.rs:403-418 — reject only differs from zero
      when the pipeline ran with an age_threshold),
      ``cernan.filters.delay.log.accept`` / ``.reject``,
      ``cernan.filters.json_encode.log.processed`` / ``.parsed``
      (internal.rs:424-429);
    * per-sink delivery: ``cernan.sinks.<sink>.records.total_delivered``;
    * wavefront aggregation block (internal.rs:284-309):
      ``…aggregations.total_stored``, ``…aggregation.<kind>``,
      ``…aggregation.summarize.total_percentiles``;
    * prometheus block: ``…aggregation.reportable`` (internal.rs:345) and
      the kind-rejection count (no reference series name — the reference
      drops silently; accounted here as ``…aggregation.kind_rejected``).
    """
    tel = out["telemetry"]
    logs = out["logs"]
    # statsd lines carry no wire timestamp; graphite triples do
    statsd_rows = tel.filter(F.col("event_epoch").isNull())
    graphite_rows = tel.filter(F.col("event_epoch").isNotNull())
    parts = [
        _counter(statsd_rows, "cernan.statsd.packet"),
        _counter(out["bad"], "cernan.statsd.bad_packet"),
        _counter(graphite_rows, "cernan.graphite.packet"),
        _counter(graphite_rows, "cernan.graphite.telemetry.received"),
    ]

    # delay filter accounting: run_pipeline exposes the pre-filter table
    # when an age_threshold is configured; with no threshold everything is
    # accepted (delay_filter.rs:60-74 emits both sides either way)
    pre = out.get("telemetry_unfiltered")
    accept = _counter(tel, "cernan.filters.delay.telemetry.accept")
    if pre is not None:
        n_pre = pre.agg(F.count("*").alias("n"))
        n_post = tel.agg(F.count("*").alias("n"))
        reject = _value(
            n_pre.crossJoin(n_post.withColumnRenamed("n", "n2")).select(
                (F.col("n") - F.col("n2")).alias("n_rej")
            ),
            "cernan.filters.delay.telemetry.reject",
        )
    else:
        reject = _value(
            spark.createDataFrame([(0,)], "n long"),
            "cernan.filters.delay.telemetry.reject",
        )
    parts += [
        accept,
        reject,
        _counter(logs, "cernan.filters.delay.log.accept"),
        _value(
            spark.createDataFrame([(0,)], "n long"),
            "cernan.filters.delay.log.reject",
        ),
        _counter(logs, "cernan.filters.json_encode.log.processed"),
    ]
    if "is_json_object" in logs.columns:
        parts.append(
            _counter(
                logs.filter(F.col("is_json_object")),
                "cernan.filters.json_encode.log.parsed",
            )
        )

    parts.append(
        out["sink_counts"].select(
            F.concat(
                F.lit("cernan.sinks."),
                F.col("sink"),
                F.lit(".records.total_delivered"),
            ).alias("name"),
            F.col("n_rows").cast("double").alias("value"),
            F.lit("SUM").alias("kind"),
        )
    )

    wf = out["aggregates"].filter(F.col("sink") == "wavefront")
    parts += [
        _counter(wf, "cernan.sinks.wavefront.aggregations.total_stored"),
        wf.groupBy(F.lower("kind").alias("_k"))
        .agg(F.count("*").cast("double").alias("value"))
        .select(
            F.concat(
                F.lit("cernan.sinks.wavefront.aggregation."), F.col("_k")
            ).alias("name"),
            "value",
            F.lit("SUM").alias("kind"),
        ),
        _value(
            wf.filter(F.col("kind") == "SUMMARIZE").agg(
                F.sum(F.size("quantile_values")).alias("n")
            ),
            "cernan.sinks.wavefront.aggregation.summarize.total_percentiles",
        ),
    ]

    prom = out["aggregates"].filter(F.col("sink") == "prometheus")
    parts.append(
        _value(
            prom.agg(F.countDistinct("name", "kind").alias("n")),
            "cernan.sinks.prometheus.aggregation.reportable",
        )
    )
    from cernan_spark.operators.aggregate import prometheus_reject_kind_changes

    parts.append(
        _value(
            prometheus_reject_kind_changes(prom, ["name"])
            .filter(F.col("kind_rejected"))
            .agg(F.count("*").alias("n")),
            "cernan.sinks.prometheus.aggregation.kind_rejected",
        )
    )

    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    return result
