"""Portable (cross-engine) polynomial hashing.

The scale path hashes with ``xxhash64`` (JVM-native, fastest). For the
correctness gate, sketch operators (MinHash, k-min fingerprints) offer a
*portable* mode: a 31-bit polynomial rolling hash over code points,

    h = fold chars c:  (h * 31 + codepoint(c)) mod (2^31 - 1)

which DuckDB computes bit-identically via ``list_reduce`` — so LSH/sketch
outputs can be value-checked against an ANSI-SQL oracle instead of being
rows-only. Verified identical on empty strings, non-ASCII code points and
leading/trailing whitespace (Spark ``split(tok,'')``+``ascii`` ↔ DuckDB
``range``+``unicode``+``substr``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1


def portable_hash(text: Column) -> Column:
    """31-bit polynomial hash of a string column (or lambda variable):
    fold over code points, ``(acc*31 + cp) % (2^31-1)``. Works nested
    inside higher-order functions (the arg may be a lambda variable)."""
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(MERSENNE31),
    )


def portable_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash` for oracle SQL generation.
    ``expr`` is any VARCHAR-typed SQL expression."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({expr})+1), "
        f"j -> CAST(unicode(substr({expr}, CAST(j AS INTEGER), 1)) AS BIGINT))), "
        "(acc, c) -> (acc * 31 + c) % 2147483647)"
    )
