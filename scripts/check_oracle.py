"""Local mimic of the driver's correctness gate: run each __spark_entry__
query against its DuckDB oracle at a given SF and compare row count, schema
(column names), and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from cernan_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = sorted(d[0] for d in ores.description)
            orows = ores.fetchall()
            ocolnames = [d[0] for d in ores.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: schema {scols} vs {ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            failures += 1
            continue
        sset = sorted(
            tuple(norm(r[c]) for c in scols) for r in srows
        )
        oset = sorted(
            tuple(norm(v) for _, v in sorted(zip(ocolnames, r))) for r in orows
        )
        if sset != oset:
            ndiff = sum(1 for a, b in zip(sset, oset) if a != b)
            print(f"FAIL  {name}: values differ ({ndiff}/{len(sset)} rows)")
            for a, b in list(zip(sset, oset))[:200]:
                if a != b:
                    print(f"   spark={a}\n   duck ={b}")
                    break
            failures += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
