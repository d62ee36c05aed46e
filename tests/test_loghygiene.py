"""Log-hygiene batch: burst collapse, tail sampling, SCD2 intervals,
preference pairs, seasonal baseline — semantics plus the one-exchange
plan guarantees the docstrings claim."""

from __future__ import annotations

import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from cernan_spark.operators.anomaly import seasonal_baseline
from cernan_spark.operators.conversation import preference_pairs
from cernan_spark.operators.loghygiene import burst_collapse, tail_sample
from cernan_spark.operators.temporal import scd2_intervals


def _exchanges(df) -> int:
    # after an action, AQE's toString appends an "== Initial Plan ==" section
    # that would double-count — keep only the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return len(re.findall(r"Exchange hashpartitioning", plan))


def _ts(e: int):
    return F.to_timestamp(F.lit(e))


def _spans(spark, rows):
    return spark.createDataFrame(
        [Row(host=h, seq=i, ts=e, msg=m) for (h, i, e, m) in rows],
        "host string, seq long, ts long, msg string",
    ).withColumn("ts", F.to_timestamp(F.col("ts")))


def test_burst_collapse_splits_on_msg_change_and_gap(spark):
    df = _spans(
        spark,
        [
            ("a", 1, 100, "x"),
            ("a", 2, 110, "x"),   # same msg, small gap → same burst
            ("a", 3, 120, "y"),   # msg change → new burst
            ("a", 4, 4000, "y"),  # gap > 60 → new burst despite same msg
            ("b", 5, 100, "x"),   # other emitter → own burst
        ],
    )
    out = burst_collapse(df, ["host"], "seq", "ts", "msg", gap_s=60)
    got = {
        (r.host, r.first_order): (r.msg, r.n_repeats, r.first_e, r.last_e)
        for r in out.collect()
    }
    assert got == {
        ("a", 1): ("x", 2, 100, 110),
        ("a", 3): ("y", 1, 120, 120),
        ("a", 4): ("y", 1, 4000, 4000),
        ("b", 5): ("x", 1, 100, 100),
    }


def test_burst_collapse_single_exchange(spark):
    df = _spans(spark, [("a", i, 100 + i, "x") for i in range(10)])
    out = burst_collapse(df, ["host"], "seq", "ts", "msg", gap_s=60)
    assert _exchanges(out) == 1


def test_tail_sample_keeps_whole_trace(spark):
    df = _spans(
        spark,
        [
            ("t1", 1, 100, "ok"),
            ("t1", 2, 110, "error"),
            ("t2", 3, 100, "ok"),
            ("t2", 4, 110, "ok"),
        ],
    )
    kept = tail_sample(df, ["host"], F.col("msg") == "error")
    rows = kept.collect()
    assert sorted(r.seq for r in rows) == [1, 2]  # all of t1, none of t2
    assert _exchanges(kept) == 1
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_scd2_collapses_heartbeats_and_cuts_intervals(spark):
    df = _spans(
        spark,
        [
            ("u", 1, 100, "free"),
            ("u", 2, 200, "free"),   # heartbeat — not a version
            ("u", 3, 300, "paid"),
            ("u", 4, 400, "paid"),
            ("u", 5, 500, "free"),   # back to free IS a new version
        ],
    )
    out = scd2_intervals(df, ["host"], "seq", "ts", "msg")
    rows = sorted(out.collect(), key=lambda r: r.valid_from_e)
    assert [(r.attr, r.valid_from_e, r.valid_to_e, r.is_current) for r in rows] == [
        ("free", 100, 300, 0),
        ("paid", 300, 500, 0),
        ("free", 500, None, 1),
    ]
    assert _exchanges(out) == 1


def test_preference_pairs_margin_ties_and_plan(spark):
    df = spark.createDataFrame(
        [
            ("g1", 1, 1.0), ("g1", 2, 3.0), ("g1", 3, 3.0),  # tie on best
            ("g2", 4, 5.0), ("g2", 5, 4.9),                   # margin too small
            ("g3", 6, 2.0),                                   # single candidate
        ],
        "grp string, cid long, score double",
    )
    out = preference_pairs(df, ["grp"], "cid", "score", min_margin=0.5)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    # tie on 3.0 breaks to the lower cid (2); worst is cid 1
    assert (r.grp, r.chosen, r.rejected, r.margin, r.n_cand) == ("g1", 2, 1, 2.0, 3)
    assert _exchanges(out) == 1


def test_seasonal_baseline_exact_arithmetic(spark):
    df = spark.createDataFrame(
        [("m", 0, 100), ("m", 0, 300), ("m", 1, 600)],
        "name string, slot int, cents long",
    )
    out = seasonal_baseline(df, ["name"], "slot", "cents")
    got = {r.slot: r for r in out.collect()}
    assert got[0].slot_mean == 400 / 200.0          # (100+300)/(100*2)
    assert got[0].max_dev_ratio == 300 * 2 / 400    # max·n / sum
    # season idx: (sum_slot · n_total) / (n_slot · sum_total)
    assert got[0].season_idx == (400 * 3) / (2 * 1000)
    assert got[1].season_idx == (600 * 3) / (1 * 1000)


def test_cidr_rollup_hand_model(spark):
    """Known addresses roll into /16 and /24 networks with exact
    request/ip/error counts; malformed rows land under '_BAD_'."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.loghygiene import cidr_rollup

    rows = [
        ("10.1.2.3", 0), ("10.1.2.4", 1), ("10.1.2.3", 0),
        ("10.1.9.1", 0), ("10.2.0.1", 1),
        ("bad.ip", 1), ("10.1.2.300", 0), ("1.2.3", 0),
    ]
    df = spark.createDataFrame(rows, "ip string, err int")
    out = {
        (r["prefix_len"], r["network"]): r
        for r in cidr_rollup(df, "ip", F.col("err")).collect()
    }
    r16 = out[(16, "10.1.0.0/16")]
    assert r16["n_requests"] == 4 and r16["n_ips"] == 3
    assert r16["n_errors"] == 1 and r16["error_rate"] == 0.25
    r24 = out[(24, "10.1.2.0/24")]
    assert r24["n_requests"] == 3 and r24["n_ips"] == 2
    assert out[(24, "10.1.9.0/24")]["n_requests"] == 1
    assert out[(16, "10.2.0.0/16")]["n_errors"] == 1
    bad = out[(0, "_BAD_")]
    assert bad["n_requests"] == 3 and bad["n_errors"] == 1


def test_cidr_rollup_no_bad_row_when_all_valid(spark):
    """The '_BAD_' accounting row only appears when needed."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.loghygiene import cidr_rollup

    df = spark.createDataFrame(
        [("192.168.0.1", 0), ("192.168.0.2", 0)], "ip string, err int"
    )
    nets = {
        r["network"] for r in cidr_rollup(df, "ip", F.col("err")).collect()
    }
    assert "_BAD_" not in nets
    assert "192.168.0.0/16" in nets and "192.168.0.0/24" in nets
