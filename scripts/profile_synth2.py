"""Incremental localization of the pipeline_e2e_synth cost."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from cernan_spark.session import get_spark
from cernan_spark.plans.pipeline import parse_stage, PipelineConfig
from cernan_spark.sources.transcripts import synthetic_transcripts
from cernan_spark.operators.enrich import enrich_tags_fast
from cernan_spark.operators.route import route
from cernan_spark.operators.aggregate import bucket_aggregate_onepass
from cernan_spark.functions.statsd import mask_bounds_expr
from cernan_spark.sources.dimensions import (
    default_histogram_masks, default_routes, default_tag_dicts)

REPS = int(os.environ.get("BENCH_REPS", "3"))
N = int(os.environ.get("BENCH_SYNTH_TURNS", "2000000"))

def best(fn, reps=REPS):
    fn()
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); b = min(b, time.perf_counter() - t0)
    return b

def noop(df):
    df.write.format("noop").mode("overwrite").save()

spark = get_spark(app_name="profile_synth2", cpus=32, shuffle_partitions=32)
spark.conf.set("spark.sql.session.timeZone", "UTC")
masks = default_histogram_masks(spark)
routes = default_routes(spark)
tag_dicts = default_tag_dicts(spark)
cfg = PipelineConfig()

for label, src in (
    ("lazy", synthetic_transcripts(spark, n_convs=N // 40, turns_per_conv=40)),
    ("mat ", spark.read.parquet("/tmp/synth_mat.parquet")),
):
    tel = parse_stage(src, masks=masks)["telemetry"]
    enr = enrich_tags_fast(tel, tag_dicts)
    agg1 = bucket_aggregate_onepass(enr, bin_width=cfg.bin_width,
        quantiles=cfg.quantiles, accuracy=cfg.accuracy,
        bounds_expr=mask_bounds_expr(masks))
    rt = route(agg1.withColumn("match_kind_value", F.lit("telemetry")), routes
        ).drop("match_kind_value", "rule_id")
    print(f"{label} 1 parse    :", round(best(lambda: noop(tel)), 2), flush=True)
    print(f"{label} 2 +enrich  :", round(best(lambda: noop(enr)), 2), flush=True)
    print(f"{label} 3 +agg     :", round(best(lambda: noop(agg1)), 2), flush=True)
    print(f"{label} 4 +route   :", round(best(lambda: noop(rt)), 2), flush=True)
