"""Link-graph analytics over distributed edge lists.

:func:`pagerank` — fixed-iteration power method over a (src, dst) edge
frame, the crawl-prioritization / domain-authority signal a web-corpus
pipeline feeds into per-domain quotas (compose with
``textstats.domain_cap`` / ``domain_rollup``).

Spark-first shape: each iteration is ONE shuffle (groupBy dst over the
edge-carried contributions); the rank frame never leaves the cluster and
the driver loop runs over a *fixed, small* iteration count — it builds
the plan, it never touches data. Dangling mass (nodes with no
out-edges) is folded into a one-row frame and broadcast back, the same
broadcast-scalar pattern as ``plans/pipeline.py``'s flush-epoch join.

Float discipline: per-destination inflow folds over ``array_sort``-ed
(src, contrib) structs and the dangling fold runs over node-sorted
structs, so every double addition has a pinned order and the DuckDB
oracle (``list_reduce(list(x ORDER BY …))``) replays bit-identically —
the repo-wide IEEE-exact gate discipline.

Reference analog: cernan has no graph operator; this extends the
aggregation family (/root/reference/src/buckets.rs) to iterative
fixed-point computation the way a training-data pipeline needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Run ``iters`` PageRank power iterations over distinct (src, dst)
    string edges. Returns one row per node: ``node, out_deg, rank``.

    rank_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_t(u)/deg(u) + dangling_t/N)

    ``N`` is materialized once as a literal (scalar count, the same
    dimension-sized driver action as the IVF centroid load); every
    other step is a distributed join/aggregate. At 100 TB the edge
    frame shuffles once per iteration on dst — there is no all-pairs
    step and no driver-side rank table.
    """
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    nodes = (
        nodes.join(deg, "node", "left")
        .select("node", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    )
    n_nodes = nodes.count()  # scalar: the only driver-side action
    base = (1.0 - damping) / n_nodes

    rank = nodes.select(
        "node", "out_deg", F.lit(1.0 / n_nodes).alias("rank")
    )
    for it in range(iters):
        # dangling mass: pinned fold over node-sorted (node, rank) structs
        dangling = (
            rank.filter(F.col("out_deg") == 0)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("node", "rank"))
                ).alias("xs")
            )
            .select(
                F.aggregate(
                    "xs", F.lit(0.0), lambda acc, x: acc + x["rank"]
                ).alias("dangling_mass")
            )
        )
        contribs = (
            rank.filter(F.col("out_deg") > 0)
            .join(e, rank["node"] == e["src"])
            .select(
                "dst",
                "src",
                (F.col("rank") / F.col("out_deg").cast("double")).alias("c"),
            )
        )
        inflow = contribs.groupBy(F.col("dst").alias("node")).agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("inflow")
        )
        rank = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "out_deg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dangling_mass") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
        # Truncate lineage per iteration (the pointer-doubling CC /
        # thread_paths discipline): the lazy rank frame is referenced
        # TWICE per iteration (dangling fold + contributions), so
        # without this the plan tree doubles every round — 2^iters
        # subtree copies, each recompiled and re-executed. The LAST
        # iteration stays lazy so the caller composes/inspects a real
        # one-iteration plan instead of a checkpoint scan.
        if it < iters - 1:
            rank = rank.localCheckpoint(eager=True)
    return rank.select("node", "out_deg", "rank")
