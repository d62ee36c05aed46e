"""spark-submit entry point: scheduled incremental ingest over a
date-partitioned landing zone.

    spark-submit --driver-memory 8g --py-files cernan_spark.zip \
        jobs/run_incremental_job.py \
        --input  /landing/transcripts   (contains date=YYYY-MM-DD/ dirs) \
        --output /warehouse/aggregates \
        --lineage /warehouse/ingest_lineage

Run it on a schedule: each run fingerprints every input date partition
(driver-side listing), recomputes ONLY new or changed dates (the daily
steady state touches one partition of input and one of output, however
large the history), rewrites exactly those output date partitions via
dynamic partition overwrite, and appends per-partition lineage/metrics
(plans/backfill.py). Late data that rewrites an old input date triggers
a targeted backfill of just that date on the next run.
"""

from __future__ import annotations

import argparse
import os
import sys

# plain `python jobs/run_incremental_job.py` puts jobs/ (not the repo
# root) on sys.path; under spark-submit the --py-files zip provides the
# package and this insert is a harmless no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="landing zone with date=*/ partitions")
    ap.add_argument("--output", required=True, help="aggregates output base path")
    ap.add_argument("--lineage", required=True, help="ingest lineage table path")
    ap.add_argument("--bin-width", type=int, default=60)
    ap.add_argument("--cpus", type=int, default=None, help="local[N] (omit on a cluster)")
    args = ap.parse_args(argv)

    from cernan_spark.session import get_spark
    from cernan_spark.plans.backfill import incremental_ingest
    from cernan_spark.plans.pipeline import PipelineConfig, run_pipeline

    spark = get_spark(app_name="cernan_spark_incremental", cpus=args.cpus)

    def compute(transcripts):
        out = run_pipeline(
            spark, transcripts, PipelineConfig(bin_width=args.bin_width)
        )
        return out["aggregates"]

    result = incremental_ingest(
        spark, args.input, args.output, args.lineage, compute
    )
    print(
        f"computed={sorted(result['computed'])} "
        f"skipped={sorted(result['skipped'])}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
