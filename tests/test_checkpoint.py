"""Resumable checkpointed writes: idempotence, skip-completed, lineage."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cernan_spark.plans.checkpoint import (
    checkpointed_write,
    completed_parts,
    run_metrics,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ckpt_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _routed(spark, names):
    return spark.createDataFrame(
        [(n, s, float(i)) for i, n in enumerate(names) for s in ("console", "wavefront")],
        "name string, sink string, value double",
    )


def test_checkpointed_write_and_lineage(spark, tmpdir):
    df = _routed(spark, [f"m{i}" for i in range(20)])
    out, lin = f"{tmpdir}/out", f"{tmpdir}/lineage"
    lineage = checkpointed_write(spark, df, out, lin, n_buckets=4)
    rows = lineage.collect()
    assert sum(r["n_rows"] for r in rows) == 40
    assert {r["sink"] for r in rows} == {"console", "wavefront"}
    back = spark.read.parquet(out)
    assert back.count() == 40
    # metrics rollup exists
    m = run_metrics(spark, lin).collect()[0]
    assert m["total_rows"] == 40 and m["n_partitions"] == len(rows)


def test_resume_skips_completed_partitions(spark, tmpdir):
    df = _routed(spark, [f"m{i}" for i in range(20)])
    out, lin = f"{tmpdir}/out", f"{tmpdir}/lineage"
    checkpointed_write(spark, df, out, lin, n_buckets=4)
    n_done = completed_parts(spark, lin).count()
    assert n_done > 0
    # second run: everything already committed → no new lineage rows
    second = checkpointed_write(spark, df, out, lin, n_buckets=4)
    assert second.count() == 0
    # data not duplicated
    assert spark.read.parquet(out).count() == 40


def test_rerun_is_idempotent_after_partial_loss(spark, tmpdir):
    """Wipe lineage (simulate a run that died before committing lineage)
    → rerun overwrites the same partitions dynamically, no duplicates."""
    df = _routed(spark, [f"m{i}" for i in range(10)])
    out, lin = f"{tmpdir}/out", f"{tmpdir}/lineage"
    checkpointed_write(spark, df, out, lin, n_buckets=2)
    shutil.rmtree(lin)
    checkpointed_write(spark, df, out, lin, n_buckets=2)
    assert spark.read.parquet(out).count() == 20  # overwritten, not appended


def test_lineage_never_rescans_committed_output(spark, tmpdir):
    """Lineage counts must come from the new rows, not from re-reading the
    sink output (VERDICT r1: a full out_path re-scan per run costs more
    than the write at scale). Committed files from earlier runs are
    corrupted here — a lineage path that re-read them would blow up or
    miscount; the new-partition counts must still be exact."""
    import glob
    import os

    out, lin = f"{tmpdir}/out", f"{tmpdir}/lineage"
    first = checkpointed_write(spark, _routed(spark, ["alpha"]), out, lin)
    assert first.count() > 0

    # corrupt every committed parquet file (simulates 'unreadably large')
    for f in glob.glob(f"{out}/**/*.parquet", recursive=True):
        with open(f, "wb") as fh:
            fh.write(b"not parquet")
    assert glob.glob(f"{out}/**/*.parquet", recursive=True)

    second = checkpointed_write(spark, _routed(spark, ["alpha", "zeta"]), out, lin)
    got = {(r["sink"], r["part"]): r["n_rows"] for r in second.collect()}
    done1 = {(r["sink"], r["part"]) for r in first.collect()}
    assert got, "new partitions must be committed"
    assert not (set(got) & done1), "already-committed partitions re-recorded"
    assert all(n == 1 for n in got.values())  # one 'zeta' row per sink part

    # os.path sanity: the corrupted run-1 files are still there untouched
    assert any(
        open(f, "rb").read() == b"not parquet"
        for f in glob.glob(f"{out}/**/*.parquet", recursive=True)
    )
