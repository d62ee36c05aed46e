"""JSON log-line handling: parse ``text`` as a JSON object into fields and
merge with precedence parsed ⊳ fields ⊳ metadata (first key wins).

Reference /root/reference/src/filter/json_encode_filter.rs:67-155 —
``value`` parsed as JSON *object* (arrays/scalars do not count) is merged
non-recursively over the LogLine's fields, then over {time, path, tags};
on parse failure the line ships as-is.

Spark-first: `from_json(text, map<string,string>)` + `map_concat`-style
precedence via map_zip_with/coalesce (earlier map wins on key collision).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_maps_first_wins(*maps: Column) -> Column:
    """Left-to-right merge where the FIRST map containing a key wins.

    (`F.map_concat` raises/last-wins on duplicates depending on config, so
    build the precedence explicitly: fold with map_zip_with+coalesce.)
    """
    out = maps[0]
    for m in maps[1:]:
        out = F.map_zip_with(out, m, lambda _k, v1, v2: F.coalesce(v1, v2))
    return out


def parse_json_logs(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Adds ``json_fields: map<string,string>`` (null unless the line is a
    JSON object) and ``is_json_object``."""
    parsed = F.from_json(F.col(line_col), "map<string,string>")
    # from_json maps a JSON array/scalar to null already; objects parse.
    return df.select(
        "*",
        parsed.alias("json_fields"),
        parsed.isNotNull().alias("is_json_object"),
    )


def json_encode(
    df: DataFrame,
    payload_col: str = "line",
    fields_col: str = "fields",
    tags_col: str = "tags",
    path_col: str = "path",
    ts_col: str = "ts",
) -> DataFrame:
    """LogLine → Event::Raw JSON payload with first-wins precedence
    parsed ⊳ fields ⊳ {time, path} (json_encode_filter.rs:101-111,145-155).
    Output column ``raw_json``."""
    parsed = F.from_json(F.col(payload_col), "map<string,string>")
    meta = F.create_map(
        F.lit("time"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
        F.lit("path"),
        F.col(path_col),
    )
    base = F.coalesce(parsed, F.create_map(F.lit("payload"), F.col(payload_col)))
    fields = F.coalesce(F.col(fields_col), F.expr("map()"))
    tags = F.coalesce(F.col(tags_col), F.expr("map()"))
    merged = merge_maps_first_wins(base, fields, tags, meta)
    return df.withColumn("raw_json", F.to_json(merged))


def json_schema_profile(
    df: DataFrame,
    payload_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Schema-drift profile over semi-structured log payloads: per group
    (service, event type, day …), how often each top-level JSON key
    appears — the audit that catches a producer silently adding,
    renaming, or dropping fields (the failure mode
    json_encode_filter.rs:85-120 tolerates per-line; at corpus scale you
    want the aggregate view).

    Output: (group…, key, n_rows, n_group, presence) where ``presence``
    is the single IEEE division n_rows/n_group (bit-stable cross-engine).

    Scale: ``json_object_keys`` + explode is a narrow map (JVM-side, no
    UDF); the two aggregates shuffle only (group, key)-sized frames and
    the per-group totals join is broadcast-able. Malformed JSON yields
    NULL keys and drops out of the profile (counted by the caller's
    bad-line accounting, like the parse stage)."""
    keyed = df.select(
        *group_cols,
        F.explode(F.json_object_keys(F.col(payload_col))).alias("key"),
    )
    per_key = keyed.groupBy(*group_cols, "key").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_group")
    )
    return per_key.join(F.broadcast(totals), list(group_cols)).select(
        *group_cols,
        "key",
        "n_rows",
        "n_group",
        (F.col("n_rows") / F.col("n_group")).alias("presence"),
    )
