"""Arrow-vectorized grok parse: the pandas-UDF twin of the column-expression
statsd parser.

The engine's default parse path is pure JVM column expressions
(functions/statsd.py). This module provides the same semantics as ONE
Arrow-batched pandas UDF — the pattern the north star mandates for parses
that outgrow regexp/string expressions ("vectorized pandas/Arrow UDFs, no
per-row Python"). Everything here is pandas Series vector ops
(str.extract / to_numeric) — no Python-level row loop.

tests/test_grok.py asserts exact agreement with the column-expression
parser on the full fixture corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cernan_spark.functions.statsd import STATSD_LINE_RX

GROK_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("kind", T.StringType()),
        T.StructField("persist", T.BooleanType()),
        T.StructField("is_valid", T.BooleanType()),
    ]
)


def grok_statsd_batch(lines: pd.Series) -> pd.DataFrame:
    """Vectorized statsd grok over one Arrow batch (pure pandas ops)."""
    ext = lines.str.extract(STATSD_LINE_RX)
    name, val_str, ty, rate_str = ext[0], ext[1], ext[2], ext[3]
    valid = ty.notna()
    raw = pd.to_numeric(val_str, errors="coerce")
    rate = pd.to_numeric(rate_str, errors="coerce")
    value = raw.where(rate.isna(), raw * (1.0 / rate))
    signed = val_str.str.slice(0, 1).isin(["+", "-"])
    kind = pd.Series(pd.NA, index=lines.index, dtype="object")
    kind = kind.mask(ty == "c", "SUM")
    kind = kind.mask((ty == "g") & signed, "SUM")
    kind = kind.mask((ty == "g") & ~signed, "SET")
    kind = kind.mask(ty.isin(["ms", "h"]), "SUMMARIZE")
    persist = (ty == "g").where(valid)
    return pd.DataFrame(
        {
            "name": name.where(valid),
            "value": value.where(valid),
            "kind": kind.where(valid),
            "persist": persist,
            "is_valid": valid,
        }
    )


@F.pandas_udf(GROK_SCHEMA)
def grok_statsd(lines: pd.Series) -> pd.DataFrame:
    return grok_statsd_batch(lines)


def parse_statsd_lines_grok(
    df: DataFrame, line_col: str = "line", keep_invalid: bool = False
) -> DataFrame:
    """Drop-in equivalent of parse_statsd_lines using the Arrow UDF."""
    out = df.withColumn("_g", grok_statsd(F.col(line_col))).select(
        "*", "_g.name", "_g.value", "_g.kind", "_g.persist", "_g.is_valid"
    ).drop("_g")
    if not keep_invalid:
        out = out.filter(F.col("is_valid"))
    return out
