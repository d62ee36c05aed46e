"""Explode computed arrays without re-evaluating their expression.

Catalyst collapses the projection that defines a computed array into the
Generate node, so ``explode(<expensive expression>)`` re-pays the
expression far beyond once-per-row (measured 13× the cost of computing
the array alone for an interpreted HOF chain: exploding a shingle-hash
array took 3.45 s where exploding the same array pre-materialized took
0.03 s — OPTIMIZATION_r06.md, sf1.0). Higher-order functions are
CodegenFallback, which makes the hit worst exactly where arrays are
expensive to build.

:func:`explode_staged` materializes the array ONCE per row behind a
single-element explode (a Generate barrier CollapseProject cannot cross —
the same trick ``parse_statsd_lines`` uses for its slice struct), then
explodes the plain materialized column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_staged(
    df: DataFrame,
    keep: list[str],
    arr: Column,
    out: str,
) -> DataFrame:
    """``df.select(*keep, explode(arr).alias(out))`` with ``arr``
    evaluated exactly once per input row."""
    staged = df.select(
        *keep,
        F.explode(F.array(F.struct(arr.alias("a")))).alias("_eo"),
    )
    return staged.select(*keep, F.explode("_eo.a").alias(out))
