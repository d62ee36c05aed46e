"""FileServer log tail with rotation/truncation semantics.

The reference's FileWatcher (/root/reference/src/source/file/mod.rs:28-402 —
its densest property suite) tails log files by inode: appends are read from
the stored offset, a rotated file keeps its read offset under its new name,
a truncated or replaced file is re-read from zero, and a partial trailing
line is never consumed until its newline arrives.

Spark-native mapping: files are identified by ``(device, inode)`` exactly
like the reference (file_watcher.rs:39-185) — rotation renames the path but
keeps the inode, so the read offset carries over; a replaced file has a new
inode and starts at zero. The first ≤64 content bytes are stored alongside
as a *verifier*: if the stored head no longer prefix-matches the file (an
unrelated file reusing a recycled inode, or an in-place rewrite), the entry
is ignored and the file is read fresh. Filesystems without inodes (some
object-store mounts report st_ino=0) fall back to the head bytes as the
identity. A tiny **ledger** table records ``(identity, consumed, head)``.
Each tail run:

1. lists the glob driver-side (file listing is driver work in Spark's own
   sources too), computes each file's identity + new byte range;
2. reads only the new ranges, distributed via ``mapInPandas`` over a range
   table (each task seeks into its file — object stores and DFS support
   ranged reads);
3. the caller commits consumed offsets back to the ledger after its action
   (at-least-once on crash, exactly-once once the ledger write lands —
   same contract as the hopper-backed reference). A commit OVERWRITES the
   offset with what this run actually read (never ``max``): after an
   in-place truncation the ledger must shrink, or every later run would
   re-deliver the whole file from zero until it outgrew the stale offset.

Rotation   → same (dev, ino) under a new path: consumed offset carries over.
Truncate   → size < consumed, or head verifier fails: re-read from zero.
Partial    → bytes after the last ``\\n`` stay unconsumed until complete.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = "identity string, consumed long, head string"
_HEAD_BYTES = 64


def _head_hex(path: str) -> str:
    """First ≤64 content bytes, hex-encoded — the identity *verifier*
    (prefix-stable under appends even while the file is shorter than 64
    bytes; a fixed-length hash would change on every early append)."""
    with open(path, "rb") as fh:
        return fh.read(_HEAD_BYTES).hex()


def _identity(path: str) -> str:
    """(device, inode) — the reference's file identity
    (file_watcher.rs:39-185); survives rename (rotation), changes on
    replace. Falls back to head bytes where the fs reports no inode."""
    st = os.stat(path)
    if st.st_ino:
        return f"{st.st_dev}:{st.st_ino}"
    return "head:" + _head_hex(path)


def _load_ledger(
    spark: SparkSession, ledger_path: str
) -> dict[str, tuple[int, str]]:
    try:
        return {
            r["identity"]: (r["consumed"], r["head"])
            for r in spark.read.parquet(ledger_path).collect()
        }
    except Exception:  # noqa: BLE001 — first run
        return {}


def _heads_agree(stored: str | None, current: str) -> bool:
    """True when one head prefixes the other (the file may have been
    shorter than 64 bytes when the head was stored, or may still be).
    A ``None`` stored head means *unknown* — the verifier must FAIL, not
    vacuously pass: an empty-string fallback would let a recycled inode
    holding an unrelated file inherit the stale offset."""
    if stored is None:
        return False
    return current.startswith(stored) or stored.startswith(current)


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
        ident = _identity(path)
        fhead = _head_hex(path)
        start = 0
        hit = ledger.get(ident)
        if hit is not None:
            consumed, stored_head = hit
            # verifier: a recycled inode holding an unrelated file, or an
            # in-place rewrite, must not inherit the old offset
            if _heads_agree(stored_head, fhead):
                start = consumed
        if size < start:  # truncated in place below the consumed offset
            start = 0
        if size > start:
            ranges.append((ident, path, start, size))
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
    identity (call after the downstream action succeeds). This run's reads
    are authoritative — the stored offset is OVERWRITTEN, so a truncation
    that re-read from zero shrinks the ledger instead of replaying the
    whole file on every subsequent run."""
    prev = _load_ledger(spark, ledger_path)
    new = {
        r["identity"]: (r["consumed"], r["path"])
        for r in lines.groupBy("identity")
        .agg(
            F.max("end_offset").alias("consumed"),
            F.first("path").alias("path"),
        )
        .collect()
    }
    merged = dict(prev)
    for ident, (consumed, path) in new.items():
        try:
            head = _head_hex(path)
        except OSError:  # rotated/removed between read and commit
            # no prior entry → head stays None (unknown): the verifier
            # treats it as a mismatch and the next run reads from zero
            head = prev.get(ident, (0, None))[1]
        merged[ident] = (consumed, head)
    if not merged:
        return
    spark.createDataFrame(
        [(k, c, h) for k, (c, h) in merged.items()], LEDGER_SCHEMA
    ).write.mode("overwrite").parquet(ledger_path)
