"""Relational/star-schema operators over the warehouse tables.

cernan's pipeline ends at sinks; the analytics a metrics warehouse runs
NEXT — star-join rollups, integrity audits, top-k per dimension — are
the query surface this module adds over the TPC-H-shaped tables. The
reference's closest analog is the sink-side aggregation contract
(`/root/reference/src/buckets.rs` bins then sums), generalized here to
multi-table declarative plans Catalyst can reorder.

Design rules (the 100 TB plan):

* **Exact-integer money.** Every price/discount/tax becomes an exact
  integer (cents, percent) at scan time: ``round(x * 100)`` is one IEEE
  multiply + one half-away-from-zero round in BOTH engines, so sums are
  integer sums — associative, partial-aggregable map-side, and
  bit-identical regardless of partitioning. The only doubles emitted
  are single divisions of those exact sums. A float-fold of
  ``sum(price * (1 - disc))`` would be partition-order-dependent — the
  one thing a distributed rollup must never be.
* **Dims broadcast, facts shuffle once.** region/nation/customer are
  broadcast (`F.broadcast`) so the only exchange is the fact-fact join
  (lineitem ⋈ orders on orderkey) and the final (small) rollup.
* **Audits are aggregates, not row dumps.** Data-quality rules emit
  (rule, n_violations) — counts survive 100 TB; violation row dumps do
  not. Anti-join rules keep the join key only (column pruning reaches
  the scan).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cents(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def pricing_rollup(lineitem: DataFrame, ship_cutoff: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: one hash aggregate over
    (returnflag, linestatus) with all money folded as exact integers —
    cents, cent·pct (disc price), cent·pct² (charge) — and divided back
    to doubles only at emit. Filter reaches the parquet scan.

    Output per flag/status: ``n_rows, sum_qty, sum_base, sum_disc_price,
    sum_charge, avg_qty, avg_price``.
    """
    li = lineitem.filter(F.col("l_shipdate") <= ship_cutoff).select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity", 0).cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
        (F.lit(100) - _cents("l_discount")).alias("disc_keep"),
        (F.lit(100) + _cents("l_tax")).alias("tax_mult"),
    )
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").alias("sum_qty"),
        F.sum("price_c").alias("base_c"),
        F.sum(F.col("price_c") * F.col("disc_keep")).alias("disc_c2"),
        F.sum(
            F.col("price_c") * F.col("disc_keep") * F.col("tax_mult")
        ).alias("charge_c3"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        "sum_qty",
        (F.col("base_c").cast("double") / F.lit(100.0)).alias("sum_base"),
        (F.col("disc_c2").cast("double") / F.lit(10000.0)).alias(
            "sum_disc_price"
        ),
        (F.col("charge_c3").cast("double") / F.lit(1000000.0)).alias(
            "sum_charge"
        ),
        (
            F.col("sum_qty").cast("double") / F.col("n_rows").cast("double")
        ).alias("avg_qty"),
        (
            F.col("base_c").cast("double")
            / (F.col("n_rows").cast("double") * F.lit(100.0))
        ).alias("avg_price"),
    )


def region_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    order_year: int,
) -> DataFrame:
    """Star-join revenue rollup (TPC-H-Q5 family): discounted revenue
    per (region, nation) for orders placed in one year. The ONLY big
    exchange is lineitem ⋈ orders on orderkey; customer/nation/region
    are broadcast so the dim joins are map-side. The year filter prunes
    orders BEFORE the fact join (predicate pushdown to the scan), and
    revenue is an exact cent·pct integer until the final division.
    """
    o = orders.filter(F.year("o_orderdate") == order_year).select(
        "o_orderkey", "o_custkey"
    )
    li = lineitem.select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias(
            "rev_c2"
        ),
    )
    dim = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name", "r_name")
    )
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        j.groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_c2").alias("rev_c2"),
        )
        .select(
            "r_name",
            "n_name",
            "n_items",
            (F.col("rev_c2").cast("double") / F.lit(10000.0)).alias("revenue"),
        )
    )


def integrity_audit(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
) -> DataFrame:
    """Data-contract audit → one (rule, n_violations) row per rule, a
    violation count never a row dump. Rules: referential integrity by
    ANTI join (orphan lineitems / orders), domain constraints as
    predicate counts, and the cross-table ordering invariant "shipped
    before ordered" (the audit that catches clock skew between the
    order service and the warehouse). Each rule is an independent
    aggregate; the union is rows-few. The anti joins carry ONLY the
    join key through the shuffle.
    """
    orphan_li = (
        lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("lineitem_orphan_orderkey").alias("rule"), "n")
    )
    orphan_o = (
        orders.select("o_custkey")
        .join(customer.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("orders_orphan_custkey").alias("rule"), "n")
    )
    neg_bal = customer.agg(
        F.sum((F.col("c_acctbal") < 0).cast("long")).alias("n")
    ).select(F.lit("customer_negative_acctbal").alias("rule"), "n")
    domain = lineitem.agg(
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast(
                "long"
            )
        ).alias("disc"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("qty"),
    )
    disc = domain.select(
        F.lit("lineitem_discount_range").alias("rule"), F.col("disc").alias("n")
    )
    qty = domain.select(
        F.lit("lineitem_nonpositive_qty").alias("rule"), F.col("qty").alias("n")
    )
    ship_before = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("long")).alias("n")
        )
        .select(F.lit("shipped_before_ordered").alias("rule"), "n")
    )
    return reduce(DataFrame.unionByName, [orphan_li, orphan_o, neg_bal, disc, qty, ship_before])


def top_customers_per_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Top-k customers by discounted revenue within each nation —
    aggregate FIRST (fact shuffle on orderkey, then one rollup to
    customer grain: ~#customers rows), broadcast-join the dim, window
    rank over the tiny aggregate. Ranking before aggregating (window
    over raw lineitem) would sort 100 TB; this plan windows over the
    customer-grain rollup only. Ties break to the smaller custkey.
    """
    li = lineitem.select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias(
            "rev_c2"
        ),
    )
    per_cust = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("rev_c2").alias("rev_c2"))
    )
    dim = customer.select("c_custkey", "c_name", "c_nationkey").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    j = per_cust.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("n_name").orderBy(
        F.col("rev_c2").desc(), F.col("c_custkey")
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "n_name",
            "rnk",
            "c_custkey",
            "c_name",
            (F.col("rev_c2").cast("double") / F.lit(10000.0)).alias("revenue"),
        )
    )


def supplier_share(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Market share by supplier nation (TPC-H-Q8 family): per ship
    year, each nation's share of total discounted revenue. The fact
    table joins ONE broadcast dim (supplier→nation→region collapsed
    driver-free into a single small relation), one hash aggregate to
    (year, nation) grain, then the per-year total is a window over the
    ~years×nations aggregate — never over raw lineitem. Share is a
    single division of two exact cent·pct integers.
    """
    dim = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "n_name", "r_name")
    )
    li = lineitem.select(
        "l_suppkey",
        F.year("l_shipdate").alias("ship_year"),
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias(
            "rev_c2"
        ),
    )
    g = (
        li.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("ship_year", "r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum("rev_c2").alias("rev_c2"))
    )
    w = Window.partitionBy("ship_year")
    return g.select(
        "ship_year",
        "r_name",
        "n_name",
        "n_items",
        (F.col("rev_c2").cast("double") / F.lit(10000.0)).alias("revenue"),
        (
            F.col("rev_c2").cast("double")
            / F.sum("rev_c2").over(w).cast("double")
        ).alias("share"),
    )


def priority_skew_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Orders having at least one clock-skewed line (shipped before the
    order date), counted per priority — TPC-H Q4's shape with a LEFT
    SEMI join: the fact side is reduced to (orderkey, shipdate) before
    the shuffle, the EXISTS never duplicates an order no matter how
    many lines match, and only the order table's few columns survive.
    """
    skewed = orders.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") < F.col("o_orderdate")),
        "left_semi",
    )
    return skewed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def brand_volume(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand volume and revenue share: lineitem ⋈ broadcast(part)
    — the dim never shuffles the fact — one hash aggregate to brand
    grain, then the share denominator is a window total over the
    ~dozens-of-brands aggregate. Exact integers until the two emit
    divisions.
    """
    li = lineitem.select(
        "l_partkey",
        F.round("l_quantity", 0).cast("long").alias("qty"),
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias(
            "rev_c2"
        ),
    )
    g = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").alias("sum_qty"),
            F.sum("rev_c2").alias("rev_c2"),
        )
    )
    w = Window.partitionBy()
    return g.select(
        "p_brand",
        "n_items",
        "sum_qty",
        (F.col("rev_c2").cast("double") / F.lit(10000.0)).alias("revenue"),
        (
            F.col("rev_c2").cast("double")
            / F.sum("rev_c2").over(w).cast("double")
        ).alias("share"),
    )


def monthly_return_rate(lineitem: DataFrame) -> DataFrame:
    """Returned-revenue rate per ship month — the warehouse-side QA
    time series (a rising 'R' share is the alarm). ONE hash aggregate
    on the month key; the rate is one division of two exact cent·pct
    sums; the month is emitted as a string so the grain survives any
    engine's timestamp dialect.
    """
    li = lineitem.select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias(
            "rev_c2"
        ),
    )
    return (
        li.groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_c2").alias("tot_c2"),
            F.sum(F.when(F.col("ret") == 1, F.col("rev_c2")).otherwise(F.lit(0))).alias(
                "ret_c2"
            ),
        )
        .select(
            "ship_month",
            "n_items",
            (F.col("tot_c2").cast("double") / F.lit(10000.0)).alias("revenue"),
            (F.col("ret_c2").cast("double") / F.lit(10000.0)).alias(
                "returned_revenue"
            ),
            (
                F.col("ret_c2").cast("double") / F.col("tot_c2").cast("double")
            ).alias("return_rate"),
        )
    )


def revenue_band_concentration(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """Revenue concentration WITHOUT a global sort: customers roll up
    to exact cent·pct revenue, each lands in a power-of-two band
    (``length(bin(rev))`` — an exact integer log2, no float boundary),
    and the Pareto curve is a descending cumulative share over the
    ~50-row band frame. The corpus never sorts; only the band histogram
    does — the same histogram-grain-window discipline as
    corpus.length_deciles. Output per band: customer count, revenue,
    the band floor, and the share of total revenue held by this band
    and every richer one.
    """
    li = lineitem.select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias(
            "rev_c2"
        ),
    )
    per_cust = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("rev_c2").alias("rev_c2"))
    )
    bands = per_cust.groupBy(
        F.length(F.bin("rev_c2")).alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_c2").alias("band_c2"),
    )
    w_cum = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    return bands.select(
        F.col("band").cast("int").alias("band"),
        F.pow(F.lit(2.0), F.col("band") - 1).cast("long").alias("band_floor_c2"),
        "n_customers",
        (F.col("band_c2").cast("double") / F.lit(10000.0)).alias("revenue"),
        (
            F.sum("band_c2").over(w_cum).cast("double")
            / F.sum("band_c2").over(w_all).cast("double")
        ).alias("cum_share_top"),
    )


def analyze_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column statistics — the CBO inputs (ndv, null
    fraction, min/max, heavy hitter) Spark's own ``ANALYZE TABLE … FOR
    COLUMNS`` collects, emitted as one row per column: ``n_rows,
    n_null, ndv, min_v, max_v, top_v, top_cnt``. min/max compute on the
    NATIVE type (numeric order, not lexicographic) and stringify only
    at emit. The heavy hitter is a value-grain aggregate reduced by
    struct-min (most frequent, tie → smallest string) — no window, no
    sort. One column-pruned pass per column, exactly the per-column
    scan ANALYZE runs.
    """
    outs = []
    for c in cols:
        base = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            F.countDistinct(c).alias("ndv"),
            F.min(c).cast("string").alias("min_v"),
            F.max(c).cast("string").alias("max_v"),
        )
        vg = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(c).cast("string").alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        top = vg.agg(
            F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("v"))).alias("b")
        ).select(
            F.col("b.v").alias("top_v"), (-F.col("b.neg")).alias("top_cnt")
        )
        outs.append(
            base.crossJoin(F.broadcast(top)).select(
                F.lit(c).alias("col"),
                "n_rows",
                "n_null",
                "ndv",
                "min_v",
                "max_v",
                "top_v",
                "top_cnt",
            )
        )
    return reduce(DataFrame.unionByName, outs)


def price_size_skyline(part: DataFrame) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on (cheaper,
    bigger) — no other part is ≤ price AND ≥ size with one strict. The
    distributed form needs NO pairwise compare: reduce to price grain
    (max size per exact price-cents — dominance within a price level is
    total), then one ascending scan over the PRICE-HISTOGRAM frame
    keeps levels whose size beats every cheaper level's running max —
    the corpus never sorts, only the ~distinct-prices frame does (the
    length_deciles discipline). Ties: equal (price, size) rows all
    survive; the row count per frontier point is emitted.
    """
    p = part.select(
        _cents("p_retailprice").alias("price_c"), F.col("p_size")
    )
    lvl = p.groupBy("price_c").agg(
        F.max("p_size").alias("best_size"),
    )
    w = Window.orderBy("price_c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = lvl.withColumn(
        "prev_best", F.max("best_size").over(w)
    ).filter(
        F.col("prev_best").isNull()
        | (F.col("best_size") > F.col("prev_best"))
    )
    n = p.groupBy("price_c", F.col("p_size").alias("best_size")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    return sky.join(n, ["price_c", "best_size"]).select(
        "price_c",
        (F.col("price_c").cast("double") / F.lit(100.0)).alias("price"),
        F.col("best_size").alias("size"),
        "n_parts",
    )


def join_cardinality_check(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    join_name: str,
) -> DataFrame:
    """CBO sanity row: the textbook equi-join cardinality estimate
    ``|L|·|R| / max(ndv_L, ndv_R)`` next to the ACTUAL join count — the
    diagnostic that tells you whether the optimizer's containment
    assumption holds on this key before you trust its join order at
    100 TB. Inputs: three aggregates (two per-side stats, one count of
    the real join); the only doubles are the estimate's one division
    and the error ratio.
    """
    ls = left.agg(
        F.count(F.lit(1)).alias("n_left"),
        F.countDistinct(left_key).alias("ndv_left"),
    )
    rs = right.agg(
        F.count(F.lit(1)).alias("n_right"),
        F.countDistinct(right_key).alias("ndv_right"),
    )
    actual = (
        left.select(left_key)
        .join(right.select(right_key), F.col(left_key) == F.col(right_key))
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    est = (F.col("n_left") * F.col("n_right")).cast("double") / F.greatest(
        "ndv_left", "ndv_right"
    ).cast("double")
    return (
        ls.crossJoin(rs)
        .crossJoin(actual)
        .select(
            F.lit(join_name).alias("join_name"),
            "n_left",
            "n_right",
            "ndv_left",
            "ndv_right",
            est.alias("est_rows"),
            "actual_rows",
            (est / F.col("actual_rows").cast("double")).alias("err_ratio"),
        )
    )


def fd_violations(
    df: DataFrame, lhs: str, rhs: str, fd_name: str
) -> DataFrame:
    """Functional-dependency audit row: does ``lhs -> rhs`` hold? Emits
    the key count, how many keys map to >1 distinct rhs (violations),
    and the worst key's rhs fan-out — the profiling step that validates
    assumed constraints (star-schema FKs, 'one region per nation')
    before a 100 TB pipeline bakes them into joins. ONE map-side-
    combined aggregate on (lhs, rhs) + one keys-sized rollup."""
    per_key = (
        df.select(lhs, rhs)
        .groupBy(lhs)
        .agg(F.countDistinct(rhs).alias("n_rhs"))
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating_keys"),
        F.max("n_rhs").alias("max_fanout"),
    ).select(
        F.lit(fd_name).alias("fd"), "n_keys", "n_violating_keys", "max_fanout"
    )


def schema_null_audit(df: DataFrame) -> DataFrame:
    """Per-column presence audit for schema-evolved reads: one row per
    column with total/null/present counts. After a mergeSchema read over
    snapshots written months apart, this is the table that says which
    columns the old snapshots lack (all-null there) — the drift report a
    long-lived ingest needs before trusting a new field. ONE aggregate;
    the unpivot happens on a 1-row frame."""
    aggs = []
    for c in df.columns:
        aggs.append(F.count(F.lit(1)).alias(f"__t_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __t_{c}, __n_{c}" for c in df.columns
    )
    return one.select(
        F.expr(
            f"stack({len(df.columns)}, {stack_args}) "
            "AS (column_name, n_rows, n_nulls)"
        )
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        (F.col("n_rows") - F.col("n_nulls")).alias("n_present"),
    )


def field_mutual_information(
    df: DataFrame, x_col: str, y_col: str, pair_name: str
) -> DataFrame:
    """Statistical sibling of :func:`fd_violations`: mutual information
    between two categorical log fields, in nats, with the marginal
    entropies and the normalized MI (mi / min(h_x, h_y) — 1.0 means one
    field determines the other, 0 means independent). The profiling
    signal that finds redundant columns and hidden dependencies before
    a 100 TB layout bakes them into partitioning keys.

    Float discipline: every ln argument is a division of exact integer
    counts in one fixed shape; the three sums fold over lists sorted by
    the cell key, so rounding order is pinned cross-engine.

    Plan: ONE corpus aggregate at (x, y) grain; marginals, joins and
    folds all happen on the cells-sized frame (|X|x|Y| rows).
    """
    cells = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).alias("c_xy"))
    margx = cells.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    margy = cells.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    tot = cells.agg(F.sum("c_xy").alias("n"))
    j = (
        cells.join(F.broadcast(margx), "x")
        .join(F.broadcast(margy), "y")
        .crossJoin(F.broadcast(tot))
    )
    cxy = F.col("c_xy").cast("double")
    cx = F.col("c_x").cast("double")
    cy = F.col("c_y").cast("double")
    n = F.col("n").cast("double")
    mi_term = (cxy / n) * F.log(cxy * n / (cx * cy))
    folded = j.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("x", "y", mi_term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("mi"),
    )
    hx = margx.crossJoin(F.broadcast(tot)).agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "x", (-(cx / n) * F.log(cx / n)).alias("t")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("h_x")
    )
    hy = margy.crossJoin(F.broadcast(tot)).agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "y", (-(cy / n) * F.log(cy / n)).alias("t")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("h_y")
    )
    return (
        folded.crossJoin(hx)
        .crossJoin(hy)
        .select(
            F.lit(pair_name).alias("pair"),
            "n_cells",
            F.round("h_x", 6).alias("h_x"),
            F.round("h_y", 6).alias("h_y"),
            F.round("mi", 6).alias("mi"),
            F.round(
                F.col("mi") / F.least("h_x", "h_y"), 6
            ).alias("nmi"),
        )
    )


def partition_advisor(
    df: DataFrame,
    candidates: dict[str, Column],
    target_rows_per_partition: int = 1000,
    skew_threshold_pct: int = 20,
    min_partitions: int = 8,
) -> DataFrame:
    """Layout advice from data, not folklore: for each candidate
    partition expression, the exact cardinality, the hottest key's
    share, the mean rows per partition — and a verdict: too_few
    (< ``min_partitions`` values: no parallelism), too_skewed (hottest
    key above ``skew_threshold_pct``%: one straggler partition),
    too_fine (mean rows below ``target_rows_per_partition``: the small-
    files problem), else good. The pre-write check that prevents the
    two classic 100 TB layout mistakes in one pass per candidate.

    One (candidate, key) aggregate each — map-side combined; the
    verdict math is integer cross-multiplication (share·100 vs pct·n),
    so no float enters the decision.
    """
    outs = []
    for name, expr in candidates.items():
        per_key = (
            df.select(expr.alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        stats = per_key.agg(
            F.count(F.lit(1)).alias("ndv"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("top_key_rows"),
        )
        verdict = (
            F.when(F.col("ndv") < min_partitions, F.lit("too_few"))
            .when(
                F.col("top_key_rows") * 100
                > F.col("n_rows") * skew_threshold_pct,
                F.lit("too_skewed"),
            )
            .when(
                F.col("n_rows")
                < F.col("ndv") * target_rows_per_partition,
                F.lit("too_fine"),
            )
            .otherwise(F.lit("good"))
        )
        outs.append(
            stats.select(
                F.lit(name).alias("candidate"),
                "ndv",
                "n_rows",
                "top_key_rows",
                (
                    F.col("top_key_rows").cast("double")
                    / F.col("n_rows").cast("double")
                ).alias("top_key_share"),
                (
                    F.col("n_rows").cast("double")
                    / F.col("ndv").cast("double")
                ).alias("mean_rows_per_partition"),
                verdict.alias("verdict"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def record_linkage(
    left: DataFrame,
    right: DataFrame,
    truth_col: str = "truth_id",
    match_threshold: int = 20,
) -> DataFrame:
    """Fellegi–Sunter style blocked record linkage between two customer
    snapshots with precomputed integer agreement weights — the entity
    resolution step a warehouse runs before merging a dirty feed.

    Both sides must carry ``rec_id, truth_id, block, name, segment,
    balance``. Candidates come ONLY from an equi-join on the blocking
    key (never a cross join — the blocking key bounds the pair
    explosion, the linkage analog of LSH banding in
    ``operators/dedup.py``). Each candidate scores the weighted sum of
    field agreements (fixed integer log-odds weights, the shape FS
    produces after EM); pairs at or above ``match_threshold`` link.

    Because the synthetic truth is known, the output is the eval row a
    linkage pipeline reports: ``n_left, n_right, n_candidates,
    n_matched, n_true_pairs, n_true_found, precision, recall`` — exact
    integers with divisions only at emit. Recall < 1 when a true pair's
    blocking keys diverge (the documented blocking trade-off).
    """
    l = left.select(
        F.col("rec_id").alias("l_id"),
        F.col(truth_col).alias("l_truth"),
        F.col("block").alias("l_block"),
        F.col("name").alias("l_name"),
        F.col("segment").alias("l_seg"),
        F.col("balance").alias("l_bal"),
    )
    r = right.select(
        F.col("rec_id").alias("r_id"),
        F.col(truth_col).alias("r_truth"),
        F.col("block").alias("r_block"),
        F.col("name").alias("r_name"),
        F.col("segment").alias("r_seg"),
        F.col("balance").alias("r_bal"),
    )
    cand = l.join(r, l["l_block"] == r["r_block"])
    score = (
        F.when(F.col("l_name") == F.col("r_name"), F.lit(24)).otherwise(F.lit(-8))
        + F.when(F.col("l_seg") == F.col("r_seg"), F.lit(6)).otherwise(F.lit(-2))
        + F.when(
            F.abs(F.col("l_bal") - F.col("r_bal")) < F.lit(0.05), F.lit(8)
        ).otherwise(F.lit(-3))
    )
    scored = cand.select(
        "l_truth", "r_truth", score.alias("score")
    ).withColumn("is_match", (F.col("score") >= F.lit(match_threshold)).cast("long"))
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("is_match").alias("n_matched"),
        F.sum(
            (F.col("is_match") == 1).cast("long")
            * (F.col("l_truth") == F.col("r_truth")).cast("long")
        ).alias("n_true_found"),
    )
    # side totals fold into one-row frames and broadcast back — no
    # driver-side count() rescans the inputs just to mint a literal
    sizes = (
        left.agg(F.count(F.lit(1)).alias("n_left"))
        .crossJoin(F.broadcast(right.agg(F.count(F.lit(1)).alias("n_right"))))
    )
    true_pairs = (
        left.select(F.col(truth_col).alias("t"))
        .join(right.select(F.col(truth_col).alias("t")), "t")
        .agg(F.count(F.lit(1)).alias("n_true_pairs"))
    )
    return (
        agg.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(true_pairs))
        .select(
            "n_left",
            "n_right",
            "n_candidates",
            "n_matched",
            "n_true_pairs",
            "n_true_found",
            (
                F.col("n_true_found").cast("double")
                / F.col("n_matched").cast("double")
            ).alias("precision"),
            (
                F.col("n_true_found").cast("double")
                / F.col("n_true_pairs").cast("double")
            ).alias("recall"),
        )
    )


#: log10(1 + 1/d) for d = 1..9, hardcoded so Spark and any SQL oracle
#: parse the SAME decimal literals to the same doubles (no cross-engine
#: log10 call, whose libm rounding is not pinned by IEEE 754).
BENFORD_P = [
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.045757490560675115,
]


def benford_audit(
    df: DataFrame, key_cols: list[str], amount_col: str
) -> DataFrame:
    """First-digit (Benford's law) audit per key — the classic
    fabricated-numbers detector for financial/metric columns: natural
    multiplicative data leads with digit d with probability
    log10(1+1/d); synthetic or capped data does not. Per (key, digit):
    observed count/share, expected share, and the chi-square
    contribution (o − e)²/e; per key the total chi-square repeats on
    each row (compare against the 5% critical value 15.507 at 8 df).

    Zero amounts carry no leading digit and are excluded; signs are
    stripped. Digits come from the decimal rendering of the exact
    integer amount (cents), so both engines agree byte-for-byte. The
    only doubles are divisions of exact BIGINTs and products with the
    pinned literals above — one hash aggregate at (key, digit) grain,
    then a 9-row-per-key broadcastable rollup.

    Output: ``key_cols..., digit, n_d, n, p_obs, p_exp, chi2_term,
    chi2``.
    """
    digit = F.substring(
        F.abs(F.col(amount_col)).cast("string"), 1, 1
    ).cast("int")
    base = df.filter(F.col(amount_col) != 0).select(
        *key_cols, digit.alias("digit")
    )
    per_d = base.groupBy(*key_cols, "digit").agg(
        F.count(F.lit(1)).alias("n_d")
    )
    totals = per_d.groupBy(*key_cols).agg(F.sum("n_d").alias("n"))
    p_exp = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_P]), F.col("digit")
    )
    terms = per_d.join(totals, key_cols).select(
        *key_cols,
        "digit",
        "n_d",
        "n",
        F.round(
            F.col("n_d").cast("double") / F.col("n").cast("double"), 6
        ).alias("p_obs"),
        p_exp.alias("p_exp"),
        (
            (F.col("n_d").cast("double") - F.col("n").cast("double") * p_exp)
            * (F.col("n_d").cast("double") - F.col("n").cast("double") * p_exp)
            / (F.col("n").cast("double") * p_exp)
        ).alias("t"),
    )
    chi2 = terms.groupBy(*key_cols).agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("digit", "t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["t"],
            ),
            6,
        ).alias("chi2")
    )
    return terms.join(chi2, key_cols).select(
        *key_cols,
        "digit",
        "n_d",
        "n",
        "p_obs",
        "p_exp",
        F.round("t", 6).alias("chi2_term"),
        "chi2",
    )
