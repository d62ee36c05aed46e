"""Resumable fan-out writes: per-partition checkpointing + lineage/metrics.

Cernan gets at-least-once delivery from disk-backed hopper queues and
flush-index dedup at sinks (reference src/sink/mod.rs:115-141; hopper
config src/config.rs:54-63). The Spark-native equivalent for a batch DAG:

* every sink write is **partitioned by a deterministic bucket** of the
  series key and written with dynamic partition overwrite — re-running a
  failed job overwrites exactly the partitions it re-computes (idempotent,
  so task retries and job restarts are safe);
* a **lineage table** records (run_id, sink, partition, n_rows, wall
  seconds) per completed write — the per-partition metrics the north rule
  asks for;
* on resume, completed (sink, partition) pairs are skipped by an anti-join
  against the lineage table.

At 100 TB the unit of restart is a partition bucket (~1/N of the keyspace),
not the whole job.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, sink string, part int, n_rows long, wall_sec double, "
    "committed_at_epoch long"
)


def with_part_bucket(df: DataFrame, key: str = "name", n_buckets: int = 32) -> DataFrame:
    """Deterministic partition bucket from the series key: pmod(xxhash64).
    Same key → same bucket on every run (resume identity)."""
    return df.withColumn("part", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def completed_parts(spark: SparkSession, lineage_path: str) -> DataFrame:
    """(sink, part) pairs already committed by any previous run."""
    try:
        return spark.read.parquet(lineage_path).select("sink", "part").distinct()
    except Exception:  # noqa: BLE001 — first run: no lineage yet
        return spark.createDataFrame([], "sink string, part int")


def checkpointed_write(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    lineage_path: str,
    sink_col: str = "sink",
    key_col: str = "name",
    n_buckets: int = 32,
    run_id: str | None = None,
) -> DataFrame:
    """Write ``df`` to ``out_path`` partitioned by (sink, part), skipping
    partitions already committed in ``lineage_path``; append lineage rows
    for newly-written partitions. Returns the lineage rows of this run.

    Uses dynamic partition overwrite → retries of the same partitions are
    idempotent (the BASELINE.json "resumable from per-partition
    checkpoints" requirement).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    bucketed = with_part_bucket(df, key_col, n_buckets)
    done = completed_parts(spark, lineage_path)
    todo = bucketed.join(
        F.broadcast(done),
        (bucketed[sink_col] == done["sink"]) & (bucketed["part"] == done["part"]),
        "left_anti",
    )

    # Lineage counts come from ``todo`` itself, NOT from re-reading the sink
    # output: at scale re-scanning out_path reads every partition ever
    # committed on every run — the bookkeeping would cost more than the
    # write. todo is persisted so the count aggregate and the write share
    # one computation of the upstream (the aggregate materializes the cache,
    # the write drains it).
    todo = todo.persist()
    try:
        t0 = time.perf_counter()
        counts = (
            todo.groupBy(F.col(sink_col).alias("sink"), "part")
            .agg(F.count("*").alias("n_rows"))
            .collect()
        )
        (
            todo.write.mode("overwrite")
            .partitionBy(sink_col, "part")
            .parquet(out_path)
        )
        wall = time.perf_counter() - t0
    finally:
        todo.unpersist()

    if not counts:  # nothing new to commit (all partitions already done)
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    now = int(time.time())
    lineage = spark.createDataFrame(
        [(run_id, r["sink"], r["part"], r["n_rows"], wall, now) for r in counts],
        LINEAGE_SCHEMA,
    )
    lineage.write.mode("append").parquet(lineage_path)
    return spark.read.parquet(lineage_path).filter(F.col("run_id") == run_id)


def run_metrics(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Self-telemetry rollup (cernan's Internal source,
    src/source/internal.rs:46-63): rows + wall time + throughput per run."""
    lin = spark.read.parquet(lineage_path)
    return lin.groupBy("run_id").agg(
        F.sum("n_rows").alias("total_rows"),
        F.max("wall_sec").alias("wall_sec"),
        F.count("*").alias("n_partitions"),
        F.round(F.sum("n_rows") / F.max("wall_sec"), 1).alias("rows_per_sec"),
    )
