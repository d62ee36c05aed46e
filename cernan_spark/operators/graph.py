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
from pyspark.sql.window import Window


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
    # (1 − d) via exact decimal, as the oracle's DuckDB DECIMAL
    # arithmetic computes it: 1.0 − 0.85 = 0.15 exactly, then ONE
    # double rounding — the float expression 1.0 - 0.85 lands on
    # 0.15000000000000002 instead and drifts every rank by an ULP
    # (round-6 gate finding).
    from decimal import Decimal

    base = float(Decimal("1.0") - Decimal(str(damping))) / n_nodes

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


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over an
    undirected edge list — the community-density signal a link-graph
    corpus audit reads next to :func:`pagerank` (spam farms are
    triangle-dense, organic link neighborhoods are sparse).

    Scale shape: edges are ORIENTED from the lower-(degree, node) endpoint
    to the higher one before wedge enumeration (the classic node-iterator++
    ordering), so every triangle is produced exactly once and the wedge
    join fans out from LOW-degree vertices — a hub with degree d sits on
    the closing side of the join instead of generating d^2 wedges. Total
    work is O(m^1.5) joins, all distributed; no driver-side adjacency.

    Float discipline: counts and degrees are exact BIGINTs; the clustering
    coefficient is ONE division of exact integers per node, so the DuckDB
    replay (which may enumerate triangles in plain node order — the
    triangle SET is orientation-independent) is bit-identical.

    Reference analog: cernan has no graph operator; like ``pagerank`` this
    extends the aggregation family (/root/reference/src/buckets.rs) to
    graph-shaped corpus analytics.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    # orient a -> b where (deg, node) of a precedes (deg, node) of b
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    e1 = oriented.select(F.col("a"), F.col("b"))
    e2 = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = oriented.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    wedges = e1.join(e2, "b")
    tris = wedges.join(
        e3, (wedges["a"] == e3["ta"]) & (wedges["c"] == e3["tc"])
    ).select("a", "b", "c")
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    (2.0 * F.coalesce("n_tri", F.lit(0)).cast("double"))
                    / (
                        F.col("deg").cast("double")
                        * (F.col("deg") - 1).cast("double")
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def bradley_terry(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 8,
) -> DataFrame:
    """Bradley–Terry strength estimation from pairwise preference
    comparisons — the model-ranking step an RLHF/eval pipeline runs over
    judged response pairs (compose with ``conversation.preference_pairs``).

    Fits P(i beats j) = p_i / (p_i + p_j) by ``iters`` rounds of the
    Hunter (2004) MM update  p_i <- W_i / sum_j n_ij / (p_i + p_j),
    with ONE virtual win added in each direction of every observed pair
    (the standard pseudo-game regularizer: keeps every observed item's
    win count positive and the comparison graph's MM step finite). The
    update is scale-free, so no per-iteration normalization is needed;
    the returned ``strength`` is p_i divided by the pinned-order sum of
    all p (items sorted), rounded to 6 places.

    Scale shape: each iteration is one broadcastable join of the
    (i, j, n_ij) game matrix against the current strength frame plus one
    groupBy-i fold — the strength table never visits the driver, and the
    per-iteration ``localCheckpoint`` keeps the plan linear in ``iters``
    (the ``pagerank`` lineage discipline).

    Float discipline: every double is a division/addition of exact
    integers or prior pinned results; per-i denominators fold over
    j-sorted structs, so a DuckDB recursive replay (one-row list-carried
    p-vector, ``list_filter`` preserving the (i, j)-sorted matrix order)
    is bit-identical.
    """
    wp = comparisons.groupBy(
        F.col(winner_col).alias("i"), F.col(loser_col).alias("j")
    ).agg(F.count(F.lit(1)).alias("n"))
    # symmetrize with the +1 virtual win per direction per observed pair
    pairs = (
        wp.select("i", "j", "n")
        .unionByName(
            wp.select(
                F.col("j").alias("i"), F.col("i").alias("j"), F.lit(0).alias("n")
            )
        )
        .groupBy("i", "j")
        .agg((F.sum("n") + 1).alias("wins_ij"))
    )
    games = (
        pairs.unionByName(
            pairs.select(
                F.col("j").alias("i"),
                F.col("i").alias("j"),
                F.col("wins_ij"),
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("wins_ij").alias("n_ij"))
    )
    wins = pairs.groupBy("i").agg(F.sum("wins_ij").alias("w"))
    stats = games.groupBy("i").agg(F.sum("n_ij").alias("n_games")).join(
        wins, "i"
    )

    p = wins.select("i", F.lit(1.0).alias("p"))
    for it in range(iters):
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        terms = (
            games.join(p, "i")
            .join(pj, "j")
            .select(
                "i",
                "j",
                (
                    F.col("n_ij").cast("double")
                    / (F.col("p") + F.col("p_j"))
                ).alias("t"),
            )
        )
        denom = terms.groupBy("i").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("j", "t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["t"],
            ).alias("denom")
        )
        p = denom.join(wins, "i").select(
            "i", (F.col("w").cast("double") / F.col("denom")).alias("p")
        )
        if it < iters - 1:
            p = p.localCheckpoint(eager=True)
    total = p.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("i", "p"))),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("total_p")
    )
    return (
        p.join(stats, "i")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("i").alias("item"),
            F.col("n_games"),
            F.col("w").alias("n_wins"),
            F.round(F.col("p") / F.col("total_p"), 6).alias("strength"),
        )
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    label_space: int = 1 << 20,
) -> DataFrame:
    """Synchronous label propagation over an undirected simple edge set:
    every node starts as its own label; each round it adopts its
    neighbors' most frequent label, ties broken by SMALLEST label — a
    deterministic LPA variant (fixed ``iters`` synchronous rounds, so the
    result is reproducible regardless of convergence; classic async LPA
    is order-dependent by construction and cannot be gated).

    The argmax is reduced as one integer: priority = cnt·label_space +
    (label_space−1−label), decoded after the max — so the whole round is
    groupBy(node, label) → groupBy(node) over BIGINTs, no window, no
    floats anywhere in the operator. Node labels must be integers in
    [0, label_space).

    Scale shape: per round ONE shuffle on the neighbor endpoint at edge
    grain and one at (node, label) grain; per-iteration localCheckpoint
    keeps the plan linear (the ``pagerank`` discipline).

    Output: ``node, label, community_size``.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )  # (u, v): v is a neighbor of u
    labels = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").cast("long").alias("label"))
    )
    ls = F.lit(label_space)
    for it in range(iters):
        nb = adj.join(
            labels.select(
                F.col("node").alias("v"), F.col("label")
            ),
            "v",
        ).select(F.col("u").alias("node"), "label")
        cnt = nb.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        best = cnt.groupBy("node").agg(
            F.max(
                F.col("cnt") * ls + (ls - 1 - F.col("label"))
            ).alias("p")
        )
        labels = best.select(
            "node", (ls - 1 - F.col("p") % ls).alias("label")
        )
        if it < iters - 1:
            labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(sizes, "label").select(
        "node", "label", "community_size"
    )


def k_core(
    edges: DataFrame, k: int = 3, max_iters: int = 40
) -> DataFrame:
    """The k-core of an undirected simple graph: the maximal subgraph
    where every member keeps degree ≥ k — the dense-nucleus extractor a
    link-corpus audit runs after :func:`triangle_counts` (spam farms and
    citation cliques live in high cores). Synchronous peeling: each
    round drops every node whose degree WITHIN the surviving set is
    below k; the fixed point is unique (the k-core is order-independent),
    so early exit and a fixed-round oracle replay converge to the same
    set whenever rounds ≥ |V| in the worst case.

    Integer-only. Each round is one semi-join of the adjacency against
    the survivor set plus one count aggregate; survivor frames are
    localCheckpointed (the ``pagerank`` lineage rule) and the loop exits
    as soon as a round removes nobody (one scalar count per round — the
    bounded driver action this repo allows, like pagerank's N).

    Output: ``node, core_deg`` for k-core members only.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    alive = adj.select(F.col("u").alias("node")).distinct()
    n_prev = alive.count()
    for _ in range(max_iters):
        au = alive.select(F.col("node").alias("u"))
        av = alive.select(F.col("node").alias("v"))
        deg = (
            adj.join(au, "u")
            .join(av, "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = deg.filter(F.col("deg") >= k).select(
            F.col("u").alias("node")
        )
        alive = alive.localCheckpoint(eager=True)
        n_now = alive.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    au = alive.select(F.col("node").alias("u"))
    av = alive.select(F.col("node").alias("v"))
    return (
        adj.join(au, "u")
        .join(av, "v")
        .groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )


def bfs_hops(
    edges: DataFrame, source, max_iters: int = 100
) -> DataFrame:
    """Unweighted shortest-hop distances from ``source`` over the
    undirected simple graph — the reachability/radius primitive a
    link-corpus audit uses to ask "how far is everything from the seed
    set". Frontier-iterated BFS: each round relaxes the adjacency once
    and keeps min(dist); because the first time BFS reaches a node is
    already optimal, the union-min iteration is monotone and the early
    exit (node count unchanged — one bounded scalar per round, the
    ``k_core`` discipline) stops at the exact distance map.

    Integer-only; one hash equi-join + one min aggregate per round,
    localCheckpoint per round. Output: ``node, hops`` for REACHED nodes.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    dist = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .filter(F.col("node") == source)
        .select("node", F.lit(0).cast("long").alias("hops"))
    )
    n_prev = dist.count()
    for _ in range(max_iters):
        nxt = adj.join(
            dist.select(F.col("node").alias("u"), "hops"), "u"
        ).select(F.col("v").alias("node"), (F.col("hops") + 1).alias("hops"))
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
        dist = dist.localCheckpoint(eager=True)
        n_now = dist.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return dist


def hits_scores(
    edges: DataFrame, iters: int = 3
) -> DataFrame:
    """HITS hubs-and-authorities over a DIRECTED edge list (Kleinberg):
    a ← Aᵀh, h ← Aa, each L2-normalized per half-step — the
    complementary centrality to :func:`pagerank` (a page can be a great
    directory without being an authority; pagerank conflates the two).
    Fixed ``iters`` synchronous rounds from the uniform vector.

    Float discipline: inflow/outflow folds run over sorted (neighbor,
    score) structs, the L2 norm folds squares over node-sorted structs,
    and sqrt/divisions are correctly rounded — the pagerank replay
    discipline, so a list-carried recursive CTE reproduces every bit.
    Per round: two hash-join + fold aggregates; the one-row norm frames
    broadcast back; earlier rounds localCheckpoint.

    Output: ``node, hub, authority`` (round 6).
    """
    e = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    import math

    n_nodes = nodes.count()
    # math.sqrt is correctly rounded (IEEE); x ** 0.5 routes through libm
    # pow, whose rounding is NOT pinned — the oracle replays 1/sqrt(n).
    init = 1.0 / math.sqrt(float(n_nodes))
    h = nodes.select("node", F.lit(init).alias("s"))
    a = nodes.select("node", F.lit(init).alias("s"))

    def _norm(df: DataFrame) -> DataFrame:
        nrm = df.agg(
            F.sqrt(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("node", "s"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["s"] * x["s"],
                )
            ).alias("nrm")
        )
        return df.crossJoin(F.broadcast(nrm)).select(
            "node", (F.col("s") / F.col("nrm")).alias("s")
        )

    for it in range(iters):
        a_in = (
            e.join(h.select(F.col("node").alias("src"), "s"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "s"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["s"],
                ).alias("s")
            )
        )
        a = _norm(
            nodes.join(a_in, "node", "left").select(
                "node", F.coalesce("s", F.lit(0.0)).alias("s")
            )
        )
        h_in = (
            e.join(a.select(F.col("node").alias("dst"), "s"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("dst", "s"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["s"],
                ).alias("s")
            )
        )
        h = _norm(
            nodes.join(h_in, "node", "left").select(
                "node", F.coalesce("s", F.lit(0.0)).alias("s")
            )
        )
        if it < iters - 1:
            a = a.localCheckpoint(eager=True)
            h = h.localCheckpoint(eager=True)
    return (
        h.select("node", F.round("s", 6).alias("hub"))
        .join(
            a.select("node", F.round("s", 6).alias("authority")),
            "node",
        )
    )


def _simple_undirected(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonical simple undirected edge set (u < v, loops dropped,
    duplicates collapsed) — the same normalization every iterative
    operator in this module applies, factored out for the two
    whole-graph statistics below."""
    return (
        edges.select(
            F.least(src, dst).alias("u"),
            F.greatest(src, dst).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient r of the simple undirected
    graph (Newman 2002): the Pearson correlation of the degrees at the
    two ends of every edge, computed over the directed-both view so x
    and y are exchangeable — which collapses the usual sqrt into a pure
    BIGINT rational, (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²), ONE double
    division at emit. Degenerate (regular) graphs emit NULL.

    Scale shape: a degree aggregate at node grain, one broadcast-able
    join of degrees back to edges, one map-side-combined global sum —
    no window, no collect.

    Returns one row: ``n_nodes, n_edges, assortativity``.
    """
    e = _simple_undirected(edges, src, dst)
    adj = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    both = (
        adj.join(deg.select(F.col("u"), F.col("deg").alias("x")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("y")),
            "v",
        )
    )
    g = both.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    num = F.col("m2") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("m2") * F.col("sxx") - F.col("sx") * F.col("sx")
    return g.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        (F.col("m2") / F.lit(2)).cast("long").alias("n_edges"),
        F.round(
            F.when(den != 0, num.cast("double") / den.cast("double")),
            6,
        ).alias("assortativity"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity of a node partition over the simple undirected
    graph: per community c, contribution = L_c/m − (d_c/2m)² where L_c
    is the intra-community edge count and d_c the community degree sum
    — kept as the exact BIGINT rational (4·L_c·m − d_c²) / (4m²) with
    ONE division at emit; ``modularity`` repeats the partition total on
    every row (an exact integer window sum over the ≤|labels|-row
    community rollup).

    Scale shape: two label joins at edge grain (labels broadcast when
    small), then node- and community-grain aggregates; the window runs
    on the community rollup, never on rows.

    Returns one row per community: ``community, n_nodes, degree_sum,
    intra_edges, contribution, modularity``.
    """
    e = _simple_undirected(edges)
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(label_col).cast("long").alias("lab")
    )
    m = e.agg(F.count(F.lit(1)).cast("long").alias("m"))
    adj = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    dc = (
        deg.join(lab.withColumnRenamed("node", "u"), "u")
        .groupBy("lab")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("degree_sum"),
        )
    )
    intra = (
        e.join(lab.select(F.col("node").alias("u"), F.col("lab").alias("lu")), "u")
        .join(lab.select(F.col("node").alias("v"), F.col("lab").alias("lv")), "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("lab"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra_edges"))
    )
    per = (
        dc.join(intra, "lab", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("lab").alias("community"),
            "n_nodes",
            "degree_sum",
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            "m",
        )
        .withColumn(
            "numer",
            F.lit(4) * F.col("intra_edges") * F.col("m")
            - F.col("degree_sum") * F.col("degree_sum"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    denom = (F.lit(4) * F.col("m") * F.col("m")).cast("double")
    return per.select(
        "community",
        "n_nodes",
        "degree_sum",
        "intra_edges",
        F.round(F.col("numer").cast("double") / denom, 6).alias("contribution"),
        F.round(F.sum("numer").over(w).cast("double") / denom, 6).alias(
            "modularity"
        ),
    )


def link_prediction(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg
    2003) over the simple undirected graph: for every NON-adjacent pair
    (u < v) sharing at least one neighbor, emit the three classic
    scores —

    * ``cn``       — |Γ(u) ∩ Γ(v)| (common neighbors, exact BIGINT)
    * ``jaccard``  — cn / |Γ(u) ∪ Γ(v)| = cn / (deg_u + deg_v − cn)
    * ``adamic_adar`` — Σ_{z ∈ Γ(u)∩Γ(v)} 1/ln(deg_z)

    Float discipline: degrees are exact BIGINTs; jaccard is ONE
    division at emit; the Adamic–Adar sum is a LEFT fold over the
    common neighbors sorted by z (1/ln of an exact integer per term),
    so the DuckDB replay is bit-identical. deg_z ≥ 2 holds by
    construction (z touches both u and v), so ln never hits 0.

    Plan shape: ONE self-join of the directed-both adjacency on the
    shared neighbor (the wedge join triangle_counts also uses, here
    without orientation), degree joins that broadcast at dimension
    size, one anti-join against the edge set to drop already-linked
    pairs. No per-node collect; candidate volume is Σ_z deg_z², the
    standard wedge bound — pre-filter high-degree hubs upstream if the
    graph has them (same guidance as triangle_counts).

    Reference analog: cernan's filter topology routes by static config
    (src/filter/programmable_filter.rs); a link predictor is the
    evidence layer for SUGGESTING routes — kept here as the pure graph
    operator.
    """
    e = _simple_undirected(edges, src, dst)
    adj = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    a = adj.select(F.col("u").alias("pu"), F.col("v").alias("z"))
    b = adj.select(F.col("u").alias("pv"), F.col("v").alias("z"))
    wedges = a.join(b, "z").filter(F.col("pu") < F.col("pv"))
    cand = wedges.join(
        e.select(F.col("u").alias("pu"), F.col("v").alias("pv")),
        ["pu", "pv"],
        "left_anti",
    )
    with_degz = cand.join(
        F.broadcast(deg.select(F.col("u").alias("z"), F.col("deg").alias("deg_z"))),
        "z",
    )
    aa_terms = F.sort_array(
        F.collect_list(F.struct(F.col("z"), F.col("deg_z")))
    )
    grouped = with_degz.groupBy("pu", "pv").agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.aggregate(
            aa_terms,
            F.lit(0.0),
            lambda acc, t: acc
            + F.lit(1.0) / F.log(t["deg_z"].cast("double")),
        ).alias("aa"),
    )
    du = deg.select(F.col("u").alias("pu"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("pv"), F.col("deg").alias("deg_v"))
    return (
        grouped.join(F.broadcast(du), "pu")
        .join(F.broadcast(dv), "pv")
        .select(
            F.col("pu").alias("u"),
            F.col("pv").alias("v"),
            "cn",
            "deg_u",
            "deg_v",
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
            F.round("aa", 6).alias("adamic_adar"),
        )
        .orderBy("u", "v")
    )
