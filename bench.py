"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...,
   "cpus": ...}

The flagship measurement is end-to-end turns/sec through
parse→enrich→route→aggregate (BASELINE.json metric). Run
scripts/scaling_bench.py for the N vs 4N parallelism comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def time_action(fn, reps: int | None = None):
    """Warm once (codegen/JIT compile + page cache — identical work at any
    data scale, so folding it into per-query time only measures the
    driver), then report the best of ``reps`` timed runs (virtualized-host
    noise is ±2×; the floor is the steady-state number a cluster sees)."""
    reps = reps or int(os.environ.get("BENCH_REPS", "2"))
    fn()  # warmup: plan + whole-stage-codegen compile
    best, n = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth_turns = int(os.environ.get("BENCH_SYNTH_TURNS", "2000000"))

    from cernan_spark.session import get_spark
    from cernan_spark.plans.pipeline import run_pipeline
    from cernan_spark.sources.transcripts import (
        synthetic_transcripts,
        transcripts_from_events,
    )
    import __spark_entry__ as entry

    spark = get_spark(app_name="cernan_spark_bench", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    queries: dict[str, float] = {}

    # warm the JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # 1. flagship: full pipeline over events-derived transcripts at sf
    t = transcripts_from_events(spark, sf_dir)
    n_turns_sf = t.count()
    sec, _ = time_action(
        lambda: run_pipeline(spark, t)["aggregates"].write.format("noop").mode(
            "overwrite"
        ).save()
    )
    queries["pipeline_e2e_sf"] = sec

    # 2. throughput at scale: synthetic transcripts, fixed size
    synth = synthetic_transcripts(
        spark, n_convs=synth_turns // 40, turns_per_conv=40
    )
    sec, _ = time_action(
        lambda: run_pipeline(spark, synth)["aggregates"].write.format("noop").mode(
            "overwrite"
        ).save()
    )
    queries["pipeline_e2e_synth"] = sec
    turns_per_sec = synth_turns / sec

    # 3. individual operators at sf (driver-oracle twins)
    for name in (
        "bucket_sum",
        "bucket_quantiles",
        "gauge_carry_forward",
        "route_fanout",
        "dedup_exact",
        "ann_cosine_topk",
        "minhash_dedup",
    ):
        fn = entry.queries()[name]
        sec, _ = time_action(lambda fn=fn: fn(spark, sf_dir).write.format(
            "noop").mode("overwrite").save())
        queries[name] = sec

    total = sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "end-to-end turns/sec parse→route→aggregate + operator suite",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in queries.items()},
                "sf": sf_dir,
                "cpus": cpus,
                "n_turns_sf": n_turns_sf,
                "synth_turns": synth_turns,
                "turns_per_sec": round(turns_per_sec),
            }
        )
    )


if __name__ == "__main__":
    main()
