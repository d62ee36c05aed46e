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


# ---------------------------------------------------------------------------
# Arrow twin of the groklib template extractor
# ---------------------------------------------------------------------------

def grok_template_batch(lines: pd.Series, template: str) -> pd.DataFrame:
    """Vectorized grok template extraction over one Arrow batch: ONE
    ``str.extract`` pass yields every field (the JVM column path runs one
    ``regexp_extract`` per field — N regex matches per row). Fields come
    back as empty-string-for-no-match plus ``grok_matched``, exactly the
    `groklib.grok_extract` contract."""
    from cernan_spark.functions.groklib import grok_compile

    rx, fields = grok_compile(template)
    if not fields:
        raise ValueError("grok template has no named fields to extract")
    ext = lines.str.extract(rx)
    # no-match → NaN; an EMPTY capture on a matched line is '' (not NaN),
    # so group 1 distinguishes the two even for empty-capable patterns
    matched = ext[0].notna()
    out = {}
    for i, name in enumerate(fields):
        out[name] = ext[i].fillna("")
    out["grok_matched"] = matched
    return pd.DataFrame(out)


def grok_extract_arrow(
    df: DataFrame, template: str, line_col: str = "text"
) -> DataFrame:
    """Drop-in equivalent of ``groklib.grok_extract`` as one Arrow-batched
    pandas UDF — a single vectorized regex pass per batch instead of one
    JVM ``regexp_extract`` per field per row. Same output schema; the
    equality test pins them identical on the seeded Apache corpus."""
    from cernan_spark.functions.groklib import grok_compile

    _, fields = grok_compile(template)
    schema = T.StructType(
        [T.StructField(f, T.StringType()) for f in fields]
        + [T.StructField("grok_matched", T.BooleanType())]
    )

    @F.pandas_udf(schema)
    def _g(lines: pd.Series) -> pd.DataFrame:
        return grok_template_batch(lines, template)

    out = df.withColumn("_g", _g(F.col(line_col)))
    return out.select(
        F.col(line_col),
        *[F.col(f"_g.{f}").alias(f) for f in fields],
        F.col("_g.grok_matched").alias("grok_matched"),
    )
