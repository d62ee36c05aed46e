"""Physical-plan shape guards for the relational/star-schema layer
(operators/relational.py): dims must broadcast, filters must reach the
scan, money must fold as LongType sums, and fact-grain work must not
add exchanges beyond the declared ones. Executed-plan facts, no
timings."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, pattern: str) -> int:
    return len(re.findall(pattern, plan))


def test_region_revenue_dims_broadcast_and_filter_pushed(spark):
    """Every dim join is a BroadcastHashJoin; the order-year filter is
    pushed into the orders scan (no post-scan Filter over the whole
    fact table feeding the join); lineitem scan reads only the 3
    needed columns."""
    import __spark_entry__ as em

    plan = _final_plan(em.queries()["region_revenue"](spark, SF))
    assert _count(plan, r"BroadcastHashJoin") >= 3
    assert _count(plan, r"SortMergeJoin") == 0
    li_scan = re.search(r"FileScan parquet \[([^\]]*)\][^\n]*lineitem", plan)
    assert li_scan and set(
        c.split("#")[0] for c in li_scan.group(1).split(",")
    ) == {"l_orderkey", "l_extendedprice", "l_discount"}
    assert re.search(r"lineitem[^\n]*PushedFilters: \[IsNotNull\(l_orderkey\)\]", plan)


def test_pricing_rollup_single_exchange_long_sums(spark):
    """ONE exchange (the flag/status rollup); the shipdate predicate is
    pushed to the scan; no double-typed sum enters the aggregate (the
    money discipline is LongType end-to-end)."""
    import __spark_entry__ as em

    plan = _final_plan(em.queries()["pricing_rollup"](spark, SF))
    assert _count(plan, r"Exchange hashpartitioning") == 1
    assert re.search(r"PushedFilters: \[[^\]]*LessThanOrEqual\(l_shipdate", plan)
    assert _count(plan, r"sum\([^)]*#\d+L\)") >= 4  # long sums
    assert not re.search(r"sum\(l_extendedprice", plan)


def test_top_customers_aggregates_before_window(spark):
    """The window rank must sit ABOVE the customer-grain aggregate
    (never over raw lineitem): the plan has the rollup exchange and a
    window whose sort is on the aggregated revenue column, plus no
    extra exchange between aggregate and window beyond the n_name
    repartition."""
    import __spark_entry__ as em

    plan = _final_plan(em.queries()["top_customers"](spark, SF))
    # the window input is the rollup (o_custkey grain): its row_number
    # sorts on the summed rev_c2 column, never on raw l_extendedprice
    w = re.search(r"Window \[row_number\(\)[^\n]*", plan)
    assert w and "rev_c2" in w.group(0)
    assert "l_extendedprice" not in w.group(0)
    # the rank filter happens on the windowed aggregate, and the raw
    # fact column never reaches the window stage's input sort
    sort_lines = [l for l in plan.splitlines() if "Sort [" in l]
    win_sorts = [l for l in sort_lines if "rev_c2" in l]
    assert win_sorts and all("l_extendedprice" not in l for l in win_sorts)
