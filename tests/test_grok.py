"""The Arrow pandas-UDF grok must agree exactly with the column-expression
statsd parser (same rows, same values)."""

from __future__ import annotations

import pytest

from cernan_spark.functions.grok import parse_statsd_lines_grok
from cernan_spark.functions.statsd import parse_statsd_lines
from tests.test_parse import STATSD_BAD, STATSD_GOLDEN, _random_lines


def test_grok_matches_column_parser(spark):
    lines = (
        [l for l, *_ in STATSD_GOLDEN] + STATSD_BAD + _random_lines(300, seed=99)
    )
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    cols = ["line", "name", "value", "kind", "persist", "is_valid"]
    a = {
        r["line"]: tuple(r[c] for c in cols[1:])
        for r in parse_statsd_lines(df, keep_invalid=True).select(cols).collect()
    }
    b = {
        r["line"]: tuple(r[c] for c in cols[1:])
        for r in parse_statsd_lines_grok(df, keep_invalid=True).select(cols).collect()
    }
    for line in lines:
        av, bv = a[line], b[line]
        assert av[4] == bv[4], f"validity differs for {line!r}: {av} vs {bv}"
        if av[4]:
            assert av[0] == bv[0] and av[2] == bv[2] and av[3] == bv[3], (line, av, bv)
            assert av[1] == pytest.approx(bv[1], rel=1e-12), (line, av, bv)
