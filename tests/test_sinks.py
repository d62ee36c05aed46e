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
