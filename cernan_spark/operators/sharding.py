"""Rendezvous (highest-random-weight) sharding.

Stateful sinks need a STABLE record→shard assignment: cernan's hopper
queues and flush-index resume (reference `/root/reference/src/sink/mod.rs`
flush bookkeeping) only dedup correctly if the same series keeps landing
on the same queue across restarts AND across fleet resizes. Naive
``hash(key) % N`` reassigns ~(N-1)/N of all keys when N changes; rendezvous
hashing reassigns only the ~1/(N+1) of keys whose winning shard IS the new
one — the minimal-disruption property consistent hashing is used for,
without a ring or virtual nodes.

``shard(key, N) = argmax over s in 0..N-1 of h(key, s)`` — a pure
projection: no shuffle, no state, no driver-side table. The hash is the
repo's portable 31-bit polynomial (functions/porthash.py), so a SQL oracle
reproduces every assignment bit-for-bit; ties (astronomically rare, but the
gate demands total determinism) break to the LOWEST shard id in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cernan_spark.functions.porthash import portable_hash, portable_hash_sql


def _weights(key: Column, n_shards: int) -> list[Column]:
    return [
        portable_hash(F.concat(key.cast("string"), F.lit(f":{s}")))
        for s in range(n_shards)
    ]


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """Column expression: the winning shard id in ``0..n_shards-1``.

    ``greatest`` over the per-shard weights plus a first-match CASE gives
    the argmax with lowest-id tie-break — the same expression shape the
    SQL twin emits, so both engines agree on every row.
    """
    ws = _weights(key, n_shards)
    top = F.greatest(*ws) if len(ws) > 1 else ws[0]
    expr = F.when(ws[0] == top, F.lit(0))
    for s in range(1, n_shards):
        expr = expr.when(ws[s] == top, F.lit(s))
    return expr


def rendezvous_shard_sql(key_expr: str, n_shards: int) -> str:
    """DuckDB twin of :func:`rendezvous_shard` for oracle generation."""
    hs = [
        portable_hash_sql(f"(CAST({key_expr} AS VARCHAR) || ':{s}')")
        for s in range(n_shards)
    ]
    top = "greatest(" + ", ".join(hs) + ")" if len(hs) > 1 else hs[0]
    cases = " ".join(
        f"WHEN {hs[s]} = {top} THEN {s}" for s in range(n_shards)
    )
    return f"(CASE {cases} END)"


def _argmax_cols(m: int) -> Column:
    top = (
        F.greatest(*[F.col(f"h{s}") for s in range(m)]) if m > 1 else F.col("h0")
    )
    expr = F.when(F.col("h0") == top, F.lit(0))
    for s in range(1, m):
        expr = expr.when(F.col(f"h{s}") == top, F.lit(s))
    return expr


def resize_movement(
    df: DataFrame, key_col: str, n_before: int, n_after: int
) -> DataFrame:
    """Shard-resize impact report: per BEFORE-shard, how many keys stay
    put and how many move when the fleet resizes ``n_before → n_after``.

    With rendezvous hashing and ``n_after = n_before + 1`` every mover's
    destination is the NEW shard (a key only moves if the added weight
    wins), so ``n_moved / n ≈ 1/n_after`` — the property this operator
    exists to demonstrate. The weights are staged ONCE as columns and both
    argmaxes read them, so each per-shard hash is computed a single time
    per row. Pure projection + one tiny aggregate; nothing shuffles but
    the |shards|-row report.
    """
    k = F.col(key_col)
    n = max(n_before, n_after)
    staged = df.select(
        *[
            portable_hash(F.concat(k.cast("string"), F.lit(f":{s}"))).alias(
                f"h{s}"
            )
            for s in range(n)
        ]
    )
    tagged = staged.select(
        _argmax_cols(n_before).alias("shard_before"),
        _argmax_cols(n_after).alias("shard_after"),
    )
    return tagged.groupBy("shard_before").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("shard_after") != F.col("shard_before")).cast("bigint")
        ).alias("n_moved"),
    )


def resize_movement_sql(
    key_expr: str, n_before: int, n_after: int, table: str
) -> str:
    """DuckDB twin of :func:`resize_movement` (same staged-weights shape)."""
    n = max(n_before, n_after)
    hs = ", ".join(
        portable_hash_sql(f"(CAST({key_expr} AS VARCHAR) || ':{s}')")
        + f" AS h{s}"
        for s in range(n)
    )

    def pick(m: int) -> str:
        top = (
            "greatest(" + ", ".join(f"h{s}" for s in range(m)) + ")"
            if m > 1
            else "h0"
        )
        cases = " ".join(f"WHEN h{s} = {top} THEN {s}" for s in range(m))
        return f"(CASE {cases} END)"

    return f"""
        WITH w AS (SELECT {hs} FROM {table}),
        t AS (
          SELECT {pick(n_before)} AS shard_before,
                 {pick(n_after)} AS shard_after
          FROM w
        )
        SELECT shard_before, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN shard_after <> shard_before
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
        FROM t GROUP BY shard_before
    """
