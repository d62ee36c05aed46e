"""Grok pattern library: `%{NAME:field}` templates compiled to one Java/RE2
regex + per-field `regexp_extract` columns.

The reference parses wire formats with hand-written nom grammars
(/root/reference/src/protocols/statsd.rs, graphite.rs); the general
log-pipeline form of that is grok — named reusable sub-patterns composed
into a line template. This compiler expands a template into a single
anchored regex whose capture-group indexes map to field names, then emits
one `regexp_extract` column per field — all JVM-side, codegen'd, no UDF.

The pattern subset is chosen to mean the same thing in Java regex and in
DuckDB's RE2 (character classes, bounded repeats, non-capturing groups; no
backrefs, no lookaround), so oracle SQL can run the IDENTICAL compiled
regex via DuckDB `regexp_extract(line, rx, group)`.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: named sub-patterns (logstash-core names, RE2∩Java-safe subset)
GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "USER": r"[a-zA-Z0-9._-]+",
    "URIPATH": r"/[^\s\"]*",
    "HTTPDATE": r"[^\]]+",
    "LOGLEVEL": r"TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
    "GREEDYDATA": r".*",
}

_REF_RX = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_compile(template: str) -> tuple[str, list[str]]:
    """Expand a grok template into ``(regex, field_names)``.

    Named refs ``%{NAME:field}`` become capture groups (1-indexed in
    template order); unnamed refs ``%{NAME}`` become non-capturing
    groups. Literal text between refs is regex-escaped. The result is
    anchored (^...$) so a partial match never half-parses a line.
    """
    fields: list[str] = []
    out: list[str] = ["^"]
    pos = 0
    for m in _REF_RX.finditer(template):
        out.append(re.escape(template[pos : m.start()]))
        pat_name, field = m.group(1), m.group(2)
        if pat_name not in GROK_PATTERNS:
            raise KeyError(f"unknown grok pattern %{{{pat_name}}}")
        body = GROK_PATTERNS[pat_name]
        if field:
            fields.append(field)
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(re.escape(template[pos:]))
    out.append("$")
    return "".join(out), fields


def grok_extract(
    df: DataFrame, template: str, line_col: str = "text", keep: bool = False
) -> DataFrame:
    """Parse ``line_col`` with a grok template: one string column per
    template field (empty string = no match, the `regexp_extract`
    convention), plus ``grok_matched``. Non-matching lines survive with
    all-empty fields — the bad-line accounting shape of the statsd
    parser (bad lines counted, never dropped silently)."""
    rx, fields = grok_compile(template)
    line = F.col(line_col)

    # ONE regex evaluation extracts every field: rewrite the matched line
    # into '\x01'-joined capture groups with a single regexp_replace (the
    # anchored ^...$ template matches at most once), then slice with a
    # plain split. The per-field regexp_extract form re-ran the full
    # regex once per referenced field (+1 rlike) — measured 4 evals/line
    # and ~1.4 s of the 2.0 s grok_apache time at sf1.0
    # (OPTIMIZATION_r06.md; guide §1.2 "per-task work"). The match flag
    # keeps its own rlike so `grok_matched` semantics are exact, and a
    # line whose *captured content* contains the separator itself (none
    # of the driver corpora can) falls back to the per-field extract.
    sep = "\x01"
    repl = sep.join(f"${i}" for i in range(1, len(fields) + 1))
    parts = F.split(F.regexp_replace(line, rx, repl), sep)
    matched = line.rlike(rx)
    base = list(df.columns) if keep else [line_col]

    # (matched, parts) materialize ONCE per row behind a single-element
    # explode (a Generate barrier, same trick as parse_statsd_lines):
    # downstream projections wrap fields in CASE WHEN, and conditional
    # expressions defeat codegen subexpression elimination — without the
    # barrier every referencing column would re-run the regex.
    staged = df.select(
        *base,
        F.explode(
            F.array(F.struct(matched.alias("m"), parts.alias("p")))
        ).alias("_gk"),
    )
    clean = F.col("_gk.m") & ~line.contains(sep)
    cols: list[Column] = [F.col(c) for c in base]
    for i, name in enumerate(fields, start=1):
        cols.append(
            F.when(clean, F.element_at(F.col("_gk.p"), i))
            .when(~F.col("_gk.m"), F.lit(""))  # unmatched: cheap constant
            .otherwise(F.regexp_extract(line, rx, i))  # sep-collision only
            .alias(name)
        )
    cols.append(F.col("_gk.m").alias("grok_matched"))
    return staged.select(*cols)


#: ready-made line templates — literal text is escaped by grok_compile,
#: so brackets/quotes appear raw here
COMMON_APACHE_LOG = (
    '%{IP:client} %{USER:ident} %{USER:auth} [%{HTTPDATE:http_ts}] '
    '"%{WORD:verb} %{URIPATH:path} HTTP/%{NUMBER:httpversion}" '
    "%{INT:status} %{INT:bytes}"
)

SYSLOG_LINE = "<%{INT:pri}>%{NOTSPACE:syslog_ts} %{NOTSPACE:host} %{WORD:prog}: %{GREEDYDATA:msg}"
