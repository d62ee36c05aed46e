"""Hot-key skew handling: salted repartition + two-phase aggregation.

The transcripts table has conv_id hot keys (one conversation can hold ~20%
of all turns). A plain groupBy/window on conv_id puts that key in one task.
Remedies, in order:

* AQE skew-join splitting is on globally (session.py) — handles skewed
  JOIN sides at runtime;
* groupBy aggregates already do map-side partial aggregation (no salting
  needed for algebraic aggs);
* windows / applyInPandas over conv_id DO need salting — provided here as
  salt → partial → merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the stable order key (never random —
    reruns must route rows identically for resumability)."""
    src = F.col("order_key") if "order_key" in df.columns else F.monotonically_increasing_id()
    return df.withColumn(salt_col, F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"))


def salted_repartition(
    df: DataFrame, key: str, n_partitions: int, n_salts: int = 16
) -> DataFrame:
    """repartition on (key, salt): a hot key spreads over n_salts tasks."""
    return with_salt(df, n_salts).repartition(n_partitions, F.col(key), F.col("_salt"))


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 32) -> DataFrame:
    """Two-phase count per key: (key, salt) partial → key total. The first
    shuffle spreads the hot key across n_salts reducers; the second is tiny."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("n_rows"))
