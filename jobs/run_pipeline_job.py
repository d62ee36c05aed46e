"""spark-submit entry point: the full parse→enrich→route→aggregate job.

    spark-submit --driver-memory 8g --py-files cernan_spark.zip \
        jobs/run_pipeline_job.py \
        --input /path/to/transcripts_parquet \
        --output /path/to/sinks_out \
        --lineage /path/to/lineage \
        --bin-width 60

(--driver-memory matters: under spark-submit the driver JVM pre-exists,
so the session builder's spark.driver.memory is ignored; the job warns
if the heap came up small.)

Resumable: re-running with the same --lineage path skips partitions that
already committed (plans/checkpoint.py). Per-partition lineage + throughput
metrics land in the lineage table; `--metrics` prints the rollup.
"""

from __future__ import annotations

import argparse
import os
import sys

# plain `python jobs/run_pipeline_job.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit the --py-files zip provides the package and
# this insert is a harmless no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--output", required=True, help="sink output base path")
    ap.add_argument("--lineage", default=None, help="lineage/checkpoint table path")
    ap.add_argument("--bin-width", type=int, default=60)
    ap.add_argument("--cpus", type=int, default=None, help="local[N] (omit on a cluster)")
    ap.add_argument("--metrics", action="store_true", help="print per-run metrics rollup")
    args = ap.parse_args(argv)

    from cernan_spark.session import get_spark
    from cernan_spark.plans.pipeline import PipelineConfig, run_pipeline
    from cernan_spark.plans.sinks import write_sinks

    spark = get_spark(app_name="cernan_spark_pipeline", cpus=args.cpus)

    # under spark-submit the driver JVM already exists, so the session
    # builder's spark.driver.memory is silently ignored — a 1 g default
    # heap OOMs this pipeline in local mode. Fail fast with the fix
    # instead of dying mid-job with java.lang.OutOfMemoryError.
    max_heap = int(spark._jvm.Runtime.getRuntime().maxMemory())
    if max_heap < 2 * 1024**3:
        msg = (
            f"driver heap is {max_heap / 1024**3:.1f} GiB — the session "
            "builder cannot raise it under spark-submit. Pass "
            "--driver-memory 8g (or more) on the spark-submit command "
            "line, or set CERNAN_SPARK_ALLOW_SMALL_HEAP=1 to proceed "
            "anyway."
        )
        if os.environ.get("CERNAN_SPARK_ALLOW_SMALL_HEAP") != "1":
            print(f"ERROR: {msg}", file=sys.stderr)
            return 2
        print(f"WARNING: {msg}", file=sys.stderr)

    # topology validation at job start, like the reference's config check
    # (cernan.rs:406-420: a dangling forward aborts before any work)
    from cernan_spark.operators.route import validate_routes
    from cernan_spark.sources.dimensions import default_routes

    validate_routes(default_routes(spark))

    transcripts = spark.read.parquet(args.input)
    out = run_pipeline(spark, transcripts, PipelineConfig(bin_width=args.bin_width))
    paths = write_sinks(
        spark, out, args.output, bin_width=args.bin_width, lineage_path=args.lineage
    )
    for sink, p in sorted(paths.items()):
        print(f"sink {sink}: {p}")

    if args.metrics and args.lineage:
        from cernan_spark.plans.checkpoint import run_metrics
        from cernan_spark.plans.telemetry import internal_telemetry

        run_metrics(spark, args.lineage).show(truncate=False)
        # cernan.* self-metrics for this run (internal.rs:105-455 analog)
        internal_telemetry(spark, out).show(truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
