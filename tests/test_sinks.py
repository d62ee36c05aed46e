"""Sink wire-format goldens + the end-to-end write_sinks fan-out."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cernan_spark.operators.aggregate import cumulative_histogram, prometheus_accumulate
from cernan_spark.operators.sinks import (
    console_format,
    influxdb_format,
    prometheus_format,
    wavefront_format,
)
from cernan_spark.plans.pipeline import run_pipeline
from cernan_spark.plans.sinks import write_sinks
from cernan_spark.sources.transcripts import synthetic_transcripts

AGG_SCHEMA = (
    "name string, bin long, kind string, agg_value double, n_points long, "
    "persist boolean, quantile_values array<double>, quantile_probs array<double>, "
    "samples_sum double, mean_value double, "
    "hist array<struct<bound:double,cnt:bigint>>"
)


def test_wavefront_line_format(spark):
    agg = spark.createDataFrame(
        [("cpu", 10, "SUM", 3.5, 2, False, None, None, None, None, None)], AGG_SCHEMA
    ).withColumn("tags", F.expr("map('h','a')"))
    lines = {r["line"] for r in wavefront_format(agg, 60).collect()}
    assert 'cpu 3.5 600 h="a"' in lines


def test_wavefront_summarize_emits_quantiles_count_mean(spark):
    agg = spark.createDataFrame(
        [("lat", 10, "SUMMARIZE", None, 4, False, [1.0, 9.0], [0.5, 0.99],
          20.0, 5.0, None)],
        AGG_SCHEMA,
    )
    lines = [r["line"] for r in wavefront_format(agg, 60).collect()]
    joined = "\n".join(lines)
    assert "lat.q0.5 1.0 600" in joined
    assert "lat.q0.99 9.0 600" in joined
    assert "lat.count 4 600" in joined
    assert "lat.mean 5.0 600" in joined


def test_prometheus_exposition(spark):
    agg = spark.createDataFrame(
        [
            ("req-total", 1, "SUM", 2.0, 2, False, None, None, None, None, None),
            ("req-total", 2, "SUM", 3.0, 1, False, None, None, None, None, None),
        ],
        AGG_SCHEMA,
    )
    cum = prometheus_accumulate(agg, ["name", "kind"])
    last = cum.orderBy(F.col("bin").desc()).limit(1)
    text = prometheus_format(last).collect()[0]["exposition"]
    # name sanitized, counter accumulated forever, no timestamps
    assert text == "# TYPE req_total counter\nreq_total 5.0"


def test_cumulative_histogram_le_buckets(spark):
    agg = spark.createDataFrame(
        [("h", 1, "HISTOGRAM", None, 4, False, None, None, None, None,
          [(1.0, 2), (10.0, 1), (float("inf"), 1)])],
        AGG_SCHEMA,
    )
    out = cumulative_histogram(agg).collect()[0]["hist_cum"]
    assert [(e["le"], e["cum_cnt"]) for e in out] == [
        (1.0, 2), (10.0, 3), (float("inf"), 4)
    ]


def test_influx_line_protocol(spark):
    pts = spark.createDataFrame(
        [("cpu", 1.5, "2024-01-01 00:00:01")],
        "name string, value double, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    line = influxdb_format(pts).collect()[0]["line"]
    assert line == "cpu value=1.5 1704067201000000000"


def test_write_sinks_end_to_end(spark):
    d = tempfile.mkdtemp(prefix="sinks_test_")
    try:
        t = synthetic_transcripts(spark, n_convs=20, turns_per_conv=20, seed=7)
        out = run_pipeline(spark, t)
        paths = write_sinks(spark, out, d)
        assert set(paths) == {
            "console", "wavefront", "prometheus", "influxdb",
            "elasticsearch", "kafka",
        }
        for sink, p in paths.items():
            df = spark.read.parquet(p)
            assert df.count() >= 0  # readable, schema materialized
        # console lines look like 'ts KIND name = value'
        con = spark.read.parquet(paths["console"]).limit(5).collect()
        assert all(" = " in r["line"] for r in con)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_prometheus_histogram_accumulates_forever(spark):
    """HISTOGRAM buckets accumulate bin-wise across flushes and never reset
    (prometheus.rs:209-332)."""
    rows = [
        ("lat", 1, "HISTOGRAM", None, 3, False, None, None, None, None,
         [(1.0, 2), (10.0, 1), (float("inf"), 0)]),
        ("lat", 2, "HISTOGRAM", None, 2, False, None, None, None, None,
         [(1.0, 0), (10.0, 1), (float("inf"), 1)]),
    ]
    df = spark.createDataFrame(rows, AGG_SCHEMA)
    cum = prometheus_accumulate(df, ["name"]).orderBy("bin").collect()
    assert [tuple(b["cnt"] for b in r["cum_hist"]) for r in cum] == [
        (2, 1, 0),
        (2, 2, 1),
    ]
    assert [r["cum_count"] for r in cum] == [3, 5]


def test_prometheus_kind_change_rejected(spark):
    """First-seen kind wins; later reports under another kind are rejected,
    never merged (prometheus.rs:279-310)."""
    from cernan_spark.operators.aggregate import prometheus_reject_kind_changes

    rows = [
        ("m", 1, "SUM", 5.0, 1, False, None, None, None, None, None),
        ("m", 2, "SET", 9.0, 1, False, None, None, None, None, None),
        ("m", 3, "SUM", 2.0, 1, False, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, AGG_SCHEMA)
    out = prometheus_reject_kind_changes(df, ["name"]).orderBy("bin").collect()
    assert [r["kind_rejected"] for r in out] == [False, True, False]


def test_wavefront_persist_reinsert_carries_to_last_flush(spark):
    """A persisted gauge re-enters every later window re-timestamped
    (wavefront.rs:423-426): gap and tail bins carry the last value with
    n_points=0; non-persist series are untouched."""
    from cernan_spark.operators.aggregate import wavefront_persist_reinsert

    rows = [
        ("g", 1, "SET", 7.0, 1, True, None, None, None, None, None),
        ("g", 3, "SET", 9.0, 1, True, None, None, None, None, None),
        ("c", 5, "SUM", 1.0, 1, False, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, AGG_SCHEMA)
    out = wavefront_persist_reinsert(df, ["name"])
    got = sorted(
        (r["name"], r["bin"], r["agg_value"], r["n_points"], r["reinserted"])
        for r in out.collect()
    )
    assert got == [
        ("c", 5, 1.0, 1, False),
        ("g", 1, 7.0, 1, False),
        ("g", 2, 7.0, 0, True),   # gap carries 7
        ("g", 3, 9.0, 1, False),
        ("g", 4, 9.0, 0, True),   # tail carries 9 ...
        ("g", 5, 9.0, 0, True),   # ... through the global max bin
    ]


def test_elasticsearch_doc_merges_tags_and_fields(spark):
    """The ES doc body carries every tag AND parsed field as top-level
    keys; fields override tags override base (elasticsearch.rs:126-158)."""
    import json

    from cernan_spark.operators.sinks import elasticsearch_format

    import datetime as dt

    logs = spark.createDataFrame(
        [
            (
                "conv-1", 10, "hello world",
                dt.datetime(2024, 1, 15, 0, 0, 0),
                {"env": "prod", "path": "tag-tries-to-override"},
                {"status": "500", "env": "field-wins"},
            )
        ],
        "conv_id string, order_key long, line string, ts timestamp, "
        "tags map<string,string>, fields map<string,string>",
    )
    row = elasticsearch_format(logs).collect()[0]
    doc = json.loads(row["doc"])
    assert doc["payload"] == "hello world"
    assert doc["status"] == "500"          # parsed field merged in
    assert doc["env"] == "field-wins"      # fields override tags
    # serde_json obj.insert REPLACES: tags overwrite base keys too
    # (elasticsearch.rs:147-155 inserts tags/fields into the base object)
    assert doc["path"] == "tag-tries-to-override"
    assert row["index"].startswith("cernan-2024.01.15")


def test_prometheus_summary_exposition(spark):
    """Summarize kinds expose quantile series + _sum/_count companions
    (prometheus.rs:564-597)."""
    rows = [
        ("lat", 3, "SUMMARIZE", None, 4, False,
         [1.0, 9.0], [0.5, 0.99], 20.0, 5.0, None),
    ]
    df = spark.createDataFrame(rows, AGG_SCHEMA).withColumn(
        "cum_value", F.lit(None).cast("double")
    )
    expo = {r["exposition"] for r in prometheus_format(df).collect()}
    summary = next(e for e in expo if "summary" in e)
    assert '# TYPE lat summary' in summary
    assert 'lat{quantile="0.5"} 1.0' in summary
    assert 'lat{quantile="0.99"} 9.0' in summary
    assert "lat_sum 20.0" in summary
    # integer-style count (Rust f64 Display prints whole numbers bare)
    assert "lat_count 4" in summary and "lat_count 4.0" not in summary


def test_pipeline_age_threshold_rejects_stale(spark):
    """wavefront age_threshold (wavefront.rs:643-651): telemetry outside
    |t - now| <= threshold never reaches the aggregator; bound inclusive."""
    from cernan_spark.plans.pipeline import PipelineConfig, run_pipeline

    rows = [
        ("c1", 0, "user", "m:1|c", "none", "2024-01-01 00:00:00", 1),  # stale
        ("c1", 1, "user", "m:2|c", "none", "2024-01-01 02:59:00", 2),  # inside
        ("c1", 2, "user", "m:4|c", "none", "2024-01-01 03:00:00", 3),  # = now
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts_s string, order_key long",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    out = run_pipeline(
        spark, t, PipelineConfig(bin_width=3600, age_threshold_s=3600)
    )
    total = (
        out["aggregates"]
        .filter((F.col("sink") == "wavefront") & (F.col("kind") == "SUM"))
        .agg(F.sum("agg_value"))
        .collect()[0][0]
    )
    assert total == 6.0  # 2 + 4 kept; the 3h-old point rejected


def test_write_sinks_prometheus_histogram_accumulates_and_windowed_summary(spark):
    """ADVICE r2: the shipped exposition must show PERPETUALLY accumulated
    histogram bucket counts (cum_hist), not the final bin's counts alone;
    and the summary section is fed from the capacity-windowed accumulator
    over raw routed points, with an integer-style _count."""
    import tempfile as _tf, shutil as _sh
    from cernan_spark.plans.pipeline import run_pipeline
    from cernan_spark.plans.sinks import write_sinks
    from cernan_spark.sources.transcripts import synthetic_transcripts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = _tf.mkdtemp(prefix="sinks_prom_")
    try:
        t = synthetic_transcripts(spark, n_convs=40, turns_per_conv=20, seed=11)
        out = run_pipeline(spark, t)
        paths = write_sinks(spark, out, d)
        expo = [r["exposition"] for r in spark.read.parquet(paths["prometheus"]).collect()]
        hists = [e for e in expo if " histogram\n" in e]
        assert hists, "expected a histogram exposition (hist.bucketed routes to prometheus)"
        # total accumulated bucket count at +Inf equals the FULL point count
        # across every bin for that series, not just the last bin's
        agg = out["aggregates"].filter(
            (F.col("sink") == "prometheus") & (F.col("kind") == "HISTOGRAM")
        )
        import re

        total = {
            re.sub(r"[^a-zA-Z0-9:_]", "_", r["name"]): r["n"]
            for r in agg.groupBy("name").agg(F.sum("n_points").alias("n")).collect()
        }
        for e in hists:
            name = e.split(" ")[2]
            inf_count = int(e.rsplit('"} ', 1)[1])
            assert inf_count == total[name]
        summaries = [e for e in expo if " summary\n" in e]
        assert summaries, "expected a summary exposition"
        for e in summaries:
            count_line = [l for l in e.splitlines() if "_count" in l][0]
            assert "." not in count_line.split()[-1]  # integer-style
    finally:
        _sh.rmtree(d, ignore_errors=True)
