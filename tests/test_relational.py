"""Relational/star-schema operator tests (operators/relational.py)."""
from __future__ import annotations

import datetime as dt

from cernan_spark.operators.relational import (
    integrity_audit,
    pricing_rollup,
    region_revenue,
    top_customers_per_nation,
)


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )


def test_pricing_rollup_exact_cents(spark):
    t = dt.datetime(1998, 1, 1)
    late = dt.datetime(1999, 1, 1)  # beyond cutoff, must be filtered
    rows = [
        (1, 2.0, 10.00, 0.10, 0.05, "A", "F", t),
        (1, 3.0, 20.00, 0.00, 0.00, "A", "F", t),
        (2, 1.0, 99.99, 0.05, 0.08, "R", "O", t),
        (2, 9.0, 50.00, 0.00, 0.00, "R", "O", late),
    ]
    got = {
        (r.l_returnflag, r.l_linestatus): r
        for r in pricing_rollup(_li(spark, rows), "1998-09-01").collect()
    }
    a = got[("A", "F")]
    assert (a.n_rows, a.sum_qty) == (2, 5)
    assert a.sum_base == 30.00
    # 10*0.9 + 20*1.0 = 29.00 ; charge 10*0.9*1.05 + 20 = 29.45
    assert a.sum_disc_price == 29.00 and a.sum_charge == 29.45
    assert a.avg_qty == 2.5 and a.avg_price == 15.00
    r = got[("R", "O")]
    assert r.n_rows == 1 and r.sum_base == 99.99  # late row filtered


def test_region_revenue_and_top_customers(spark):
    t96 = dt.datetime(1996, 5, 1)
    t97 = dt.datetime(1997, 5, 1)
    region = spark.createDataFrame([(0, "EU")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(10, "FR", 0), (11, "DE", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    cust = spark.createDataFrame(
        [(100, "alice", 10, 0.0, "x"), (101, "bob", 11, 0.0, "x"), (102, "eve", 11, 0.0, "x")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(1, 100, "O", 0.0, t96, "p"), (2, 101, "O", 0.0, t96, "p"),
         (3, 102, "O", 0.0, t96, "p"), (4, 100, "O", 0.0, t97, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = _li(
        spark,
        [
            (1, 1.0, 100.0, 0.0, 0.0, "N", "O", t96),
            (2, 1.0, 200.0, 0.5, 0.0, "N", "O", t96),  # 50% off -> 100
            (3, 1.0, 10.0, 0.0, 0.0, "N", "O", t96),
            (4, 1.0, 999.0, 0.0, 0.0, "N", "O", t97),  # 1997 excluded
        ],
    )
    rev = {
        (r.r_name, r.n_name): r.revenue
        for r in region_revenue(li, orders, cust, nation, region, 1996).collect()
    }
    assert rev == {("EU", "FR"): 100.0, ("EU", "DE"): 110.0}

    top = top_customers_per_nation(li, orders, cust, nation, k=1).collect()
    got = {r.n_name: (r.c_custkey, r.revenue, r.rnk) for r in top}
    # FR: alice 100 + 999 (no year filter here); DE: bob 100 beats eve 10
    assert got["FR"] == (100, 1099.0, 1)
    assert got["DE"] == (101, 100.0, 1)


def test_integrity_audit_rules_fire(spark):
    t = dt.datetime(1996, 1, 1)
    before = dt.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(1, 100, "O", 0.0, t, "p"), (2, 999, "O", 0.0, t, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(100, "a", 1, -5.0, "x")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    li = _li(
        spark,
        [
            (1, 1.0, 1.0, 0.0, 0.0, "N", "O", before),  # shipped before ordered
            (7, 1.0, 1.0, 0.2, 0.0, "N", "O", t),       # orphan + bad discount
            (1, 0.0, 1.0, 0.0, 0.0, "N", "O", t),       # nonpositive qty
        ],
    )
    got = {r.rule: r.n for r in integrity_audit(li, orders, cust).collect()}
    assert got == {
        "lineitem_orphan_orderkey": 1,
        "orders_orphan_custkey": 1,
        "customer_negative_acctbal": 1,
        "lineitem_discount_range": 1,
        "lineitem_nonpositive_qty": 1,
        "shipped_before_ordered": 1,
    }


def test_supplier_share_and_brand_volume(spark):
    t96 = dt.datetime(1996, 3, 1)
    region = spark.createDataFrame([(0, "EU")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(10, "FR", 0), (11, "DE", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    supp = spark.createDataFrame(
        [(1, "s1", 10, 0.0), (2, "s2", 11, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    li = spark.createDataFrame(
        [(1, 1, 1.0, 300.0, 0.0, t96), (1, 2, 1.0, 100.0, 0.0, t96)],
        "l_orderkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    from cernan_spark.operators.relational import supplier_share

    got = {r.n_name: r for r in supplier_share(li, supp, nation, region).collect()}
    assert got["FR"].share == 0.75 and got["DE"].share == 0.25
    assert got["FR"].ship_year == 1996 and got["FR"].r_name == "EU"

    part = spark.createDataFrame(
        [(7, "pn", "B1", "t", 1, 0.0), (8, "pn", "B2", "t", 1, 0.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    li2 = spark.createDataFrame(
        [(1, 7, 2.0, 100.0, 0.0, t96), (1, 8, 3.0, 100.0, 0.5, t96)],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    from cernan_spark.operators.relational import brand_volume

    bv = {r.p_brand: r for r in brand_volume(li2, part).collect()}
    assert bv["B1"].revenue == 100.0 and bv["B2"].revenue == 50.0
    assert abs(bv["B1"].share - 100.0 / 150.0) < 1e-15
    assert bv["B1"].sum_qty == 2 and bv["B2"].sum_qty == 3


def test_priority_skew_semi_join_no_duplication(spark):
    t = dt.datetime(1996, 1, 1)
    before = dt.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(1, 1, "O", 0.0, t, "1-URGENT"), (2, 1, "O", 0.0, t, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    # order 1 has TWO skewed lines -> must still count once
    li = spark.createDataFrame(
        [(1, before), (1, before), (2, t)],
        "l_orderkey long, l_shipdate timestamp",
    )
    from cernan_spark.operators.relational import priority_skew_orders

    got = priority_skew_orders(orders, li).collect()
    assert len(got) == 1 and got[0].n_orders == 1


def test_monthly_return_rate(spark):
    jan, feb = dt.datetime(1996, 1, 15), dt.datetime(1996, 2, 15)
    li = spark.createDataFrame(
        [("R", 100.0, 0.0, jan), ("N", 300.0, 0.0, jan), ("N", 50.0, 0.0, feb)],
        "l_returnflag string, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    from cernan_spark.operators.relational import monthly_return_rate

    got = {r.ship_month: r for r in monthly_return_rate(li).collect()}
    assert got["1996-01"].return_rate == 0.25
    assert got["1996-02"].return_rate == 0.0 and got["1996-02"].revenue == 50.0


def test_revenue_band_concentration_shares(spark):
    t = dt.datetime(1996, 1, 1)
    orders = spark.createDataFrame(
        [(i, i, "O", 0.0, t, "p") for i in (1, 2, 3)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    # customer revenues (cent-pct): 1 -> 40000 (band 16), 2 -> 40000,
    # 3 -> 20000 (band 15): top band holds 80% of revenue
    li = spark.createDataFrame(
        [(1, 4.0, 0.0), (2, 4.0, 0.0), (3, 2.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    from cernan_spark.operators.relational import revenue_band_concentration

    got = {r.band: r for r in revenue_band_concentration(li, orders).collect()}
    assert got[16].n_customers == 2 and got[16].cum_share_top == 0.8
    assert got[15].n_customers == 1 and got[15].cum_share_top == 1.0
    assert got[16].band_floor_c2 == 2**15


def test_analyze_columns_stats_and_top(spark):
    df = spark.createDataFrame(
        [(1, "A"), (2, "A"), (2, "B"), (None, None)],
        "k int, s string",
    )
    from cernan_spark.operators.relational import analyze_columns

    got = {r.col: r for r in analyze_columns(df, ["k", "s"]).collect()}
    k = got["k"]
    assert (k.n_rows, k.n_null, k.ndv) == (4, 1, 2)
    assert (k.min_v, k.max_v) == ("1", "2")
    assert (k.top_v, k.top_cnt) == ("2", 2)
    s = got["s"]
    assert (s.ndv, s.top_v, s.top_cnt) == (2, "A", 2)


def test_partition_checksum_diff_flags_only_changed(spark):
    from cernan_spark.operators.temporal import partition_checksum_diff
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [("d1", 1, "x"), ("d1", 2, "y"), ("d2", 3, "z"), ("d3", 4, "w")],
        "day string, id long, payload string",
    )
    # d1 unchanged but rows REORDERED; d2 payload edited; d3 dropped; d4 added
    new = spark.createDataFrame(
        [("d1", 2, "y"), ("d1", 1, "x"), ("d2", 3, "Z"), ("d4", 5, "v")],
        "day string, id long, payload string",
    )
    canon = F.concat_ws("|", F.col("id").cast("string"), F.col("payload"))
    got = {
        r.part: r for r in partition_checksum_diff(old, new, "day", canon).collect()
    }
    assert got["d1"].changed == 0  # order-independent checksum
    assert got["d2"].changed == 1 and got["d2"].n_old == got["d2"].n_new == 1
    assert got["d3"].changed == 1 and got["d3"].n_new == 0
    assert got["d4"].changed == 1 and got["d4"].n_old == 0


def test_join_cardinality_estimate_exact_fk(spark):
    """On a clean FK (every left key hits, right keys unique) the
    containment estimate |L|x|R|/max(ndv) equals the true join size, so
    err_ratio == 1. Breaking containment (shifting the right key domain
    so only half the keys overlap) leaves the estimate unchanged but
    halves the actual -> the diagnostic flags err_ratio == 2."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.relational import join_cardinality_check

    left = spark.range(100).select(
        F.col("id").alias("pk"), (F.col("id") % 10).alias("fk")
    )
    right = spark.range(10).select(F.col("id").alias("rk"))
    row = join_cardinality_check(left, right, "fk", "rk", "fk_full").collect()[0]
    assert (row["n_left"], row["n_right"]) == (100, 10)
    assert (row["ndv_left"], row["ndv_right"]) == (10, 10)
    assert row["est_rows"] == 100.0 and row["actual_rows"] == 100
    assert row["err_ratio"] == 1.0

    shifted = spark.range(10).select((F.col("id") + 5).alias("rk"))
    row2 = join_cardinality_check(
        left, shifted, "fk", "rk", "fk_shifted"
    ).collect()[0]
    assert row2["est_rows"] == 100.0 and row2["actual_rows"] == 50
    assert row2["err_ratio"] == 2.0


def test_fd_violations_hand_model(spark):
    """key 1 -> {a}, key 2 -> {a, b}, key 3 -> {a, b, c}: 3 keys, 2
    violating, worst fan-out 3."""
    from cernan_spark.operators.relational import fd_violations

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (3, "c")],
        "k long, v string",
    )
    row = fd_violations(df, "k", "v", "kv").collect()[0]
    assert (row["fd"], row["n_keys"], row["n_violating_keys"], row["max_fanout"]) == (
        "kv", 3, 2, 3
    )


def test_schema_null_audit_after_merge_schema_read(spark, tmp_path):
    """Two snapshots, the second adds a column: the mergeSchema read must
    surface the old snapshot's rows as nulls in the new column, and the
    audit counts them exactly."""
    from cernan_spark.operators.relational import schema_null_audit

    s1 = spark.createDataFrame([(1, "x"), (2, "y")], "id long, a string")
    s2 = spark.createDataFrame(
        [(3, "z", 10.0), (4, None, 20.0)], "id long, a string, b double"
    )
    s1.write.parquet(str(tmp_path / "s1"))
    s2.write.parquet(str(tmp_path / "s2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "s1"), str(tmp_path / "s2")
    )
    got = {
        r["column_name"]: (r["n_rows"], r["n_nulls"], r["n_present"])
        for r in schema_null_audit(merged).collect()
    }
    assert got["id"] == (4, 0, 4)
    assert got["a"] == (4, 1, 3)
    assert got["b"] == (4, 2, 2)


def test_field_mutual_information_extremes(spark):
    """Independent uniform 2x2 -> MI 0; a bijective mapping -> MI equals
    the marginal entropy (nmi 1)."""
    import math

    from cernan_spark.operators.relational import field_mutual_information

    indep = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0), ("b", 1)] * 5, "x string, y long"
    )
    r = field_mutual_information(indep, "x", "y", "indep").collect()[0]
    assert r["mi"] == 0.0 and r["n_cells"] == 4
    assert abs(r["h_x"] - round(math.log(2), 6)) < 1e-9

    dep = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2)] * 4, "x string, y long"
    )
    r2 = field_mutual_information(dep, "x", "y", "dep").collect()[0]
    assert abs(r2["mi"] - round(math.log(3), 6)) < 1e-6
    assert r2["nmi"] == 1.0


def test_partition_advisor_verdicts(spark):
    """Constructed extremes hit each verdict: 2 values -> too_few; a 30%
    hot key -> too_skewed; 1000 singleton keys -> too_fine; 10 balanced
    keys x 2000 rows -> good."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.relational import partition_advisor

    df = spark.range(20000).select(F.col("id"))
    out = {
        r["candidate"]: r["verdict"]
        for r in partition_advisor(
            df,
            {
                "binary": (F.col("id") % 2).cast("string"),
                "hot": F.when(F.col("id") < 6000, F.lit("hotkey"))
                .otherwise((F.col("id") % 100).cast("string")),
                "fine": F.col("id").cast("string"),
                "balanced": (F.col("id") % 10).cast("string"),
            },
        ).collect()
    }
    assert out == {
        "binary": "too_few",
        "hot": "too_skewed",
        "fine": "too_fine",
        "balanced": "good",
    }


def test_benford_audit_hand_model(spark):
    """A perfectly Benford-weighted sample (counts proportional to the
    expected shares over 10000) gives a small chi-square; leading digits,
    exclusions (zero) and signs are handled."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.relational import BENFORD_P, benford_audit

    counts = [round(p * 10000) for p in BENFORD_P]
    rows = []
    for d, c in enumerate(counts, start=1):
        # amounts with leading digit d, mixed magnitudes and a sign
        rows += [("k", d * 10 + 1)] * (c // 2)
        rows += [("k", -(d * 100 + 7))] * (c - c // 2)
    rows += [("k", 0)] * 5  # excluded
    df = spark.createDataFrame(rows, "g string, amt long")
    out = {r["digit"]: r for r in benford_audit(df, ["g"], "amt").collect()}
    assert set(out) == set(range(1, 10))
    n = sum(counts)
    assert all(r["n"] == n for r in out.values())
    for d in range(1, 10):
        assert out[d]["n_d"] == counts[d - 1]
        assert out[d]["p_exp"] == BENFORD_P[d - 1]
    # rounding to integer counts keeps every term tiny
    assert out[1]["chi2"] < 0.01


def test_benford_audit_uniform_digits_flagged(spark):
    """Uniform leading digits (fabricated data) blow past the 8-df
    critical value 15.507."""
    from cernan_spark.operators.relational import benford_audit

    rows = [("k", d * 1000 + 13) for d in range(1, 10) for _ in range(200)]
    df = spark.createDataFrame(rows, "g string, amt long")
    chi2 = benford_audit(df, ["g"], "amt").first()["chi2"]
    assert chi2 > 15.507
