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
