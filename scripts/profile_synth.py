"""One-off profiler for the pipeline_e2e_synth bench regression (VERDICT r2 #1).

Times, best-of-N each:
  A. synth generation alone (noop write)
  B. pipeline over lazy synth (= what bench.py times)
  C. pipeline over materialized synth parquet
  D. parse_stage only over lazy synth
  E. agg-only over pre-parsed materialized telemetry
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cernan_spark.session import get_spark
from cernan_spark.plans.pipeline import run_pipeline, parse_stage
from cernan_spark.sources.transcripts import synthetic_transcripts

REPS = int(os.environ.get("BENCH_REPS", "3"))
N = int(os.environ.get("BENCH_SYNTH_TURNS", "2000000"))


def best(fn, reps=REPS):
    fn()
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def noop(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark(app_name="profile_synth", cpus=32, shuffle_partitions=32)
spark.conf.set("spark.sql.session.timeZone", "UTC")

synth = synthetic_transcripts(spark, n_convs=N // 40, turns_per_conv=40)

print("A synth_gen_only:", round(best(lambda: noop(synth)), 2), flush=True)
print("B pipeline_lazy :", round(best(lambda: noop(run_pipeline(spark, synth)["aggregates"])), 2), flush=True)

mat = "/tmp/synth_mat.parquet"
synth.write.mode("overwrite").parquet(mat)
matdf = spark.read.parquet(mat)
print("C pipeline_mat  :", round(best(lambda: noop(run_pipeline(spark, matdf)["aggregates"])), 2), flush=True)
print("D parse_lazy    :", round(best(lambda: noop(parse_stage(synth)["telemetry"])), 2), flush=True)
print("D2 parse_mat    :", round(best(lambda: noop(parse_stage(matdf)["telemetry"])), 2), flush=True)

tel = "/tmp/synth_tel.parquet"
parse_stage(matdf)["telemetry"].write.mode("overwrite").parquet(tel)
teldf = spark.read.parquet(tel)
from cernan_spark.operators.aggregate import bucket_aggregate_onepass
from cernan_spark.functions.statsd import mask_bounds_expr
from cernan_spark.sources.dimensions import default_histogram_masks

masks = default_histogram_masks(spark)
print("E agg_only_mat  :", round(best(lambda: noop(bucket_aggregate_onepass(
    teldf, bin_width=60,
    quantiles=[0.0, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1.0],
    accuracy=1000, bounds_expr=mask_bounds_expr(masks)))), 2), flush=True)
