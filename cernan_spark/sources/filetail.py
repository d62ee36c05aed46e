"""FileServer log tail with rotation/truncation semantics.

The reference's FileWatcher (/root/reference/src/source/file/mod.rs:28-402 —
its densest property suite) tails log files by inode: appends are read from
the stored offset, a rotated file keeps its read offset under its new name,
a truncated or replaced file is re-read from zero, and a partial trailing
line is never consumed until its newline arrives.

Spark-native mapping: files are identified by their *content head bytes* (the
portable stand-in for an inode — rotation moves bytes to a new path but the
head bytes are unchanged), and a tiny **ledger** table records
``(identity, consumed_bytes)``. Each tail run:

1. lists the glob driver-side (file listing is driver work in Spark's own
   sources too), computes each file's identity + new byte range;
2. reads only the new ranges, distributed via ``mapInPandas`` over a range
   table (each task seeks into its file — object stores and DFS support
   ranged reads);
3. the caller commits consumed offsets back to the ledger after its action
   (at-least-once on crash, exactly-once once the ledger write lands —
   same contract as the hopper-backed reference).

Rotation   → same head hash under a new path: consumed offset carries over.
Truncate   → size < consumed or head changed: identity changes → offset 0.
Partial    → bytes after the last ``\\n`` stay unconsumed until complete.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = "identity string, consumed long"
_HEAD_BYTES = 64


def _head_hex(path: str) -> str:
    """Identity = the file's first bytes (≤64), hex-encoded. A ledger entry
    matches a file when the entry's head is a PREFIX of the file's head —
    stable under appends even while the file is still shorter than 64
    bytes (a fixed-length hash would change identity on every append)."""
    with open(path, "rb") as fh:
        return fh.read(_HEAD_BYTES).hex()


def _load_ledger(spark: SparkSession, ledger_path: str) -> dict[str, int]:
    try:
        return {
            r["identity"]: r["consumed"]
            for r in spark.read.parquet(ledger_path).collect()
        }
    except Exception:  # noqa: BLE001 — first run
        return {}


def _match(ledger: dict[str, int], fhead: str) -> tuple[str, int] | None:
    """Longest ledger head that prefixes the file head. A file whose head
    shrank below a stored head is NOT a match (that is a truncation —
    re-read from zero)."""
    best = None
    for k in ledger:
        if fhead.startswith(k) and (best is None or len(k) > len(best)):
            best = k
    return (best, ledger[best]) if best is not None else None


def tail_files(
    spark: SparkSession, pattern: str, ledger_path: str
) -> DataFrame:
    """New complete lines since the last committed tail, as
    (identity, path, end_offset, line). Commit with :func:`commit_tail`."""
    ledger = _load_ledger(spark, ledger_path)
    ranges = []
    for path in sorted(_glob.glob(pattern)):
        size = os.path.getsize(path)
        if size == 0:
            continue
        fhead = _head_hex(path)
        hit = _match(ledger, fhead)
        start = hit[1] if hit else 0
        if size < start:  # truncated in place below the consumed offset
            start = 0
        if size > start:
            ranges.append((fhead, path, start, size))
    if not ranges:
        return spark.createDataFrame(
            [], "identity string, path string, end_offset long, line string"
        )
    rdf = spark.createDataFrame(
        ranges, "identity string, path string, start long, end long"
    )

    def read_ranges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idents, paths, ends, lines = [], [], [], []
            for ident, path, start, end in zip(
                pdf["identity"], pdf["path"], pdf["start"], pdf["end"]
            ):
                with open(path, "rb") as fh:
                    fh.seek(int(start))
                    chunk = fh.read(int(end) - int(start))
                off = int(start)
                while True:
                    nl = chunk.find(b"\n")
                    if nl < 0:
                        break  # partial trailing line: wait for its newline
                    idents.append(ident)
                    paths.append(path)
                    ends.append(off + nl + 1)
                    lines.append(chunk[:nl].decode("utf-8", errors="replace"))
                    chunk = chunk[nl + 1 :]
                    off += nl + 1
            yield pd.DataFrame(
                {"identity": idents, "path": paths, "end_offset": ends,
                 "line": lines}
            )

    return rdf.mapInPandas(
        read_ranges, "identity string, path string, end_offset long, line string"
    )


def commit_tail(
    spark: SparkSession, lines: DataFrame, ledger_path: str
) -> None:
    """Advance the ledger to the end of the last complete line per file
    identity (call after the downstream action succeeds)."""
    prev = _load_ledger(spark, ledger_path)
    new = {
        r["identity"]: r["consumed"]
        for r in lines.groupBy("identity")
        .agg(F.max("end_offset").alias("consumed"))
        .collect()
    }
    merged = dict(prev)
    for k, v in new.items():
        # retire stale shorter heads of the same file (its head grew past
        # them) so they cannot shadow-match unrelated future files
        for old in [o for o in merged if o != k and k.startswith(o)]:
            del merged[old]
        merged[k] = max(v, merged.get(k, 0))
    if not merged:
        return
    spark.createDataFrame(list(merged.items()), LEDGER_SCHEMA).write.mode(
        "overwrite"
    ).parquet(ledger_path)
