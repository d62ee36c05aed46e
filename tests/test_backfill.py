"""Incremental date-partitioned ingest: changed-partition detection,
skip-before-read, idempotent per-date overwrite, clean-run equivalence."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from cernan_spark.plans.backfill import (
    committed_fingerprints,
    incremental_ingest,
    partition_fingerprints,
)
from tests.conftest import rows_to_tuples


def _landing_zone(spark, root, dates):
    for i, d in enumerate(dates):
        df = spark.createDataFrame(
            [(f"m{j % 5}", float(j + i * 100)) for j in range(50)],
            "name string, value double",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{root}/date={d}")


def _agg(df):
    return df.groupBy("name").agg(
        F.sum("value").alias("sum_value"), F.count("*").alias("n")
    )


def test_incremental_ingest_skips_unchanged(spark, tmp_path):
    in_dir, out_dir, lin = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "lineage"),
    )
    dates = ["2024-01-01", "2024-01-02", "2024-01-03"]
    _landing_zone(spark, in_dir, dates)

    r1 = incremental_ingest(spark, in_dir, out_dir, lin, _agg)
    assert sorted(r1["computed"]) == dates and r1["skipped"] == []

    # steady state: nothing changed -> nothing recomputed, nothing read
    r2 = incremental_ingest(spark, in_dir, out_dir, lin, _agg)
    assert r2["computed"] == [] and sorted(r2["skipped"]) == dates

    # late data rewrites ONE date: only that date recomputes
    late = spark.createDataFrame(
        [("late_metric", 999.0)], "name string, value double"
    )
    time.sleep(0.02)  # ensure a distinct mtime_ns for the new file
    late.coalesce(1).write.mode("append").parquet(f"{in_dir}/date=2024-01-02")
    r3 = incremental_ingest(spark, in_dir, out_dir, lin, _agg)
    assert r3["computed"] == ["2024-01-02"]
    assert sorted(r3["skipped"]) == ["2024-01-01", "2024-01-03"]

    # final output equals a clean full recompute, byte-for-byte values
    clean_dir = str(tmp_path / "clean")
    incremental_ingest(spark, in_dir, clean_dir, str(tmp_path / "lin2"), _agg)
    cols = ["date", "name", "sum_value", "n"]
    got = rows_to_tuples(spark.read.parquet(out_dir).select(cols), cols)
    want = rows_to_tuples(spark.read.parquet(clean_dir).select(cols), cols)
    assert got == want
    assert any(n == "late_metric" for (_, n, _, _) in got)

    # lineage carries per-partition metrics and the latest fingerprint
    # matches the filesystem state
    fps = partition_fingerprints(in_dir)
    assert committed_fingerprints(spark, lin) == fps
    lineage = spark.read.parquet(lin)
    assert lineage.filter(F.col("date") == "2024-01-02").count() == 2
    assert lineage.filter(F.col("n_rows") <= 0).count() == 0


def test_fingerprint_sensitivity(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    _landing_zone(spark, in_dir, ["2024-02-01"])
    fp1 = partition_fingerprints(in_dir)["2024-02-01"]
    # touching a data file's mtime changes the fingerprint
    pdir = f"{in_dir}/date=2024-02-01"
    f = next(
        x for x in os.listdir(pdir) if not x.startswith(("_", "."))
    )
    st = os.stat(os.path.join(pdir, f))
    os.utime(os.path.join(pdir, f), ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    fp2 = partition_fingerprints(in_dir)["2024-02-01"]
    assert fp1 != fp2
    # _SUCCESS / hidden files are excluded from the fingerprint
    open(os.path.join(pdir, "_marker"), "w").close()
    assert partition_fingerprints(in_dir)["2024-02-01"] == fp2


def test_incremental_job_end_to_end(spark, tmp_path):
    """Drive jobs/run_incremental_job.py main() through a first run and a
    late-data second run over a real transcripts landing zone."""
    from jobs.run_incremental_job import main
    from cernan_spark.sources.transcripts import transcripts_from_events

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "agg")
    lin = str(tmp_path / "lin")
    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    dates = [
        r["d"]
        for r in t.select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct().orderBy("d").limit(3).collect()
    ]
    for d in dates:
        t.filter(F.date_format("ts", "yyyy-MM-dd") == d).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{in_dir}/date={d}")

    rc = main(["--input", in_dir, "--output", out_dir, "--lineage", lin])
    assert rc == 0
    first = spark.read.parquet(out_dir)
    assert first.select("date").distinct().count() == 3
    assert first.count() > 0

    # second run with nothing changed: lineage row count stays at 3
    assert main(["--input", in_dir, "--output", out_dir, "--lineage", lin]) == 0
    assert spark.read.parquet(lin).count() == 3

    # late data lands in date[1]: exactly one new lineage row
    time.sleep(0.02)
    t.filter(F.date_format("ts", "yyyy-MM-dd") == dates[0]).limit(5).coalesce(
        1
    ).write.mode("append").parquet(f"{in_dir}/date={dates[1]}")
    assert main(["--input", in_dir, "--output", out_dir, "--lineage", lin]) == 0
    lineage = spark.read.parquet(lin)
    assert lineage.count() == 4
    assert lineage.filter(F.col("date") == dates[1]).count() == 2
