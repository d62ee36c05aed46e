"""Fair-share 8→32 experiment: is the 8→32 rung's shortfall a plan
defect or the solo-local[8] idle-silicon subsidy?

A solo local[8] run leaves 24 of 32 cores idle, so its 8 threads
monopolize the host's DRAM bandwidth, turbo headroom and page cache —
exactly what an 8-core NODE in a real 8→32-node step would NOT get.
This script measures the counterfactual:

  1. SOLO   — one local[8] child on a 48M-turn input (best-of-reps);
  2. FAIR   — FOUR local[8] children started simultaneously, each on
     the same 48M-turn input (32 busy threads total: every instance
     gets the fair 8-core share a cluster node would); aggregate
     throughput = 4 × 48M / wall-clock of the slowest child;
  3. LOCAL32 — one local[32] child on a 192M-turn input (the same
     total work as FAIR).

If FAIR aggregate ≈ LOCAL32 throughput, the 32-thread plan scales
without defect when every thread gets a fair share, and
LOCAL32/SOLO-based efficiency is depressed only by the solo subsidy
(= SOLO per-instance throughput / FAIR per-instance throughput).

Appends one JSON line to BENCH_scaling.jsonl (kind=fairshare).

Usage: python scripts/fairshare_bench.py [n_turns_per_instance]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from cernan_spark.session import get_spark
from cernan_spark.plans.pipeline import PipelineConfig, run_pipeline

cpus = int(sys.argv[1]); n_turns = int(sys.argv[2]); path = sys.argv[3]
reps = int(sys.argv[4]); barrier = sys.argv[5] if len(sys.argv) > 5 else ""
spark = get_spark(app_name=f"fairshare_{{cpus}}", cpus=cpus,
                  shuffle_partitions=cpus,
                  extra_conf={{"spark.cleaner.periodicGC.interval": "30min"}})
t = spark.read.parquet(path)
qs = [float(x) for x in os.environ.get("SCALE_QUANTILES", "0.5,0.9,0.99").split(",")]
agg = run_pipeline(spark, t, PipelineConfig(quantiles=qs))["aggregates"]
agg.write.format("noop").mode("overwrite").save()   # warmup (codegen, shuffle)
if barrier:
    # barrier protocol: announce readiness, then spin until the parent
    # releases every child at once — the timed reps of all instances
    # must OVERLAP or the contended measurement silently degenerates to
    # a solo one (exactly what the first draw's 46 s straggler did)
    open(barrier + f".ready.{{os.getpid()}}", "w").close()
    while not os.path.exists(barrier + ".go"):
        time.sleep(0.2)
secs = []
for _ in range(reps):
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    t0 = time.perf_counter()
    agg.write.format("noop").mode("overwrite").save()
    secs.append(time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "sec": min(secs), "all_secs": secs,
                   "turns_per_sec": n_turns / min(secs)}}))
"""

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from cernan_spark.session import get_spark
from cernan_spark.sources.transcripts import synthetic_transcripts
n_turns = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark(app_name="fairshare_gen", cpus=32, shuffle_partitions=32)
t = synthetic_transcripts(spark, n_convs=n_turns // 40, turns_per_conv=40)
t.repartition(64).write.mode("overwrite").parquet(path)
"""


def _gen(n_turns: int, path: str) -> None:
    if not os.path.exists(path + "/_SUCCESS"):
        subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO), str(n_turns), path],
            check=True, capture_output=True, timeout=1800, cwd=REPO,
        )


def _spawn(cpus: int, n_turns: int, path: str, reps: int,
           barrier: str = "", mem: str = ""):
    env = dict(os.environ)
    env.setdefault("SPARK_GC_OPTS", "-XX:+UseParallelGC")
    if mem:
        # 4 concurrent JVMs at the 64g default would overcommit a 125g
        # host (page-cache thrash poisons the measurement); the solo
        # leg gets the SAME cap so GC behavior stays comparable
        env["SPARK_DRIVER_MEM"] = mem
    return subprocess.Popen(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cpus),
         str(n_turns), path, str(reps), barrier],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO, env=env,
    )


def _result(proc) -> dict:
    out, _ = proc.communicate(timeout=1800)
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
    path8 = f"/tmp/scaling_transcripts_{n}"
    path32 = f"/tmp/scaling_transcripts_{n * 4}"
    _gen(n, path8)
    _gen(n * 4, path32)

    # 1. SOLO local[8] (idle-silicon subsidy included), same heap cap as
    # the fair children so only co-tenancy differs between the legs
    solo = _result(_spawn(8, n, path8, reps=3, mem="24g"))

    # 2. FAIR: 4 simultaneous local[8] (32 busy threads). Each child
    # warms up, announces readiness, and the parent releases all four at
    # once so the timed reps OVERLAP by construction.
    import glob

    barrier = f"/tmp/fairshare_barrier_{os.getpid()}"
    for f in glob.glob(barrier + "*"):
        os.remove(f)
    t0 = time.perf_counter()
    procs = [
        _spawn(8, n, path8, reps=2, barrier=barrier, mem="24g")
        for _ in range(4)
    ]
    while len(glob.glob(barrier + ".ready.*")) < 4:
        time.sleep(0.5)
        if any(p.poll() is not None for p in procs):
            raise RuntimeError("fairshare child died before the barrier")
    open(barrier + ".go", "w").close()
    fair_children = [_result(p) for p in procs]
    fair_wall = time.perf_counter() - t0
    # first rep of each child starts at the barrier → guaranteed overlap;
    # use each child's FIRST rep, not its min (later reps drift apart)
    fair_secs = [c["all_secs"][0] for c in fair_children]
    fair_per_instance = n / max(fair_secs)  # slowest child's synced rep
    fair_aggregate = 4 * n / max(fair_secs)

    # 3. LOCAL32 on 4× the input (same total work as FAIR)
    l32 = _result(_spawn(32, 4 * n, path32, reps=3))

    subsidy = solo["turns_per_sec"] / fair_per_instance
    fair_vs_32 = fair_aggregate / l32["turns_per_sec"]
    result = {
        "ts": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%MZ"),
        "kind": "fairshare",
        "n_turns_per_instance": n,
        "solo8": solo,
        "fair8_children": fair_children,
        "fair8_wall_s": round(fair_wall, 2),
        "fair8_per_instance_turns_per_sec": round(fair_per_instance, 1),
        "fair8_aggregate_turns_per_sec": round(fair_aggregate, 1),
        "local32": l32,
        "solo8_subsidy_vs_fairshare": round(subsidy, 3),
        "fair_aggregate_vs_local32": round(fair_vs_32, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_scaling.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
