"""Greedy capacity packing: assign ordered records to bounded batches.

Two large-pipeline shapes share one fold:

* **Sink batch assembly** — encoded records are shipped in batches with a
  max-bytes AND max-records cap (the shape of every bulk transport: ES
  ``_bulk`` chunking, Kinesis ``put_record_batch``'s 500-record/4 MiB
  limit, Kafka producer batches). The reference buffers per sink and
  flushes everything each interval (sink/mod.rs:115-141 flush loop);
  at 100 TB the flush itself must be split into capped batches, which is
  this operator.
* **Small-file compaction planning** — bin-pack data files into
  target-sized rewrite tasks (the Iceberg ``rewrite_data_files`` binpack
  strategy). Same greedy fold, sizes are file bytes, groups are table
  partitions.

Semantics (deterministic): within each group, records are taken in a
caller-supplied total order; a record joins the current batch unless
adding it would push the batch over ``max_bytes`` or the batch already
holds ``max_records``; then a new batch starts. A single record larger
than ``max_bytes`` gets a batch of its own (never dropped — matches the
Iceberg binpack and Kinesis "one oversized record is still one request"
behavior). Batch ids are 0-based per group.

Scale notes: ONE shuffle (hash on the group columns); the fold is
inherently sequential per group but vectorized per *batch* (numpy
``searchsorted`` finds each boundary, so a 10M-record group with 4 MiB
batches costs ~#batches Python iterations, not #records). Groups are
(sink, partition)-grained in a real deployment, which bounds per-task
memory; a group must fit in one executor's pandas frame — the same
contract as every ``applyInPandas`` cogroup. The greedy fold is not
expressible as a closed-form window (batch boundaries depend on a
running sum WITH reset), hence the pandas path; the DuckDB oracle
replays it with a recursive CTE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def greedy_pack(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    size_col: str,
    max_bytes: int,
    max_records: int | None = None,
) -> DataFrame:
    """Add a ``batch_id`` column assigning each row to its greedy batch.

    ``order_cols`` must be a total order within each group (ties between
    *identical* rows are harmless — equal sizes give identical batch
    boundaries — but ties between distinct rows make the assignment
    nondeterministic; include a unique key).
    """
    if max_bytes <= 0:
        raise ValueError("max_bytes must be positive")
    mr = int(max_records) if max_records else 1 << 62
    if mr <= 0:
        raise ValueError("max_records must be positive when given")
    out_schema = StructType(
        list(df.schema.fields) + [StructField("batch_id", LongType(), False)]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        sizes = pdf[size_col].to_numpy(dtype="int64")
        if (sizes < 0).any():
            raise ValueError("negative record size")
        cs = np.cumsum(sizes)
        n = len(pdf)
        out = np.empty(n, dtype="int64")
        start, base, bid = 0, 0, 0
        while start < n:
            # furthest j with batch total (cs[j] - base) <= max_bytes;
            # an oversized single record still advances (j >= start)
            j = int(np.searchsorted(cs, base + max_bytes, side="right")) - 1
            j = max(j, start)
            j = min(j, start + mr - 1)
            out[start : j + 1] = bid
            bid += 1
            base = int(cs[j])
            start = j + 1
        pdf["batch_id"] = out
        return pdf

    return df.groupBy(*group_cols).applyInPandas(pack, schema=out_schema)


def pack_summary(
    packed: DataFrame, group_cols: list[str], size_col: str
) -> DataFrame:
    """Per-batch manifest: (group..., batch_id, n_records, batch_bytes).

    This is the flush plan a shipper executes (one request per row) or
    the task list a compaction job schedules."""
    return (
        packed.groupBy(*group_cols, "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.col(size_col).cast("long")).alias("batch_bytes"),
        )
        .orderBy(*group_cols, "batch_id")
    )


def greedy_pack_model(
    rows: list[tuple], max_bytes: int, max_records: int | None = None
) -> list[int]:
    """Pure-python reference fold over (size,) rows IN ORDER — the model
    the Spark operator and the DuckDB recursive CTE must both match."""
    mr = max_records if max_records else 1 << 62
    out, acc, cnt, bid = [], 0, 0, 0
    for (sz,) in rows:
        if cnt > 0 and (acc + sz > max_bytes or cnt >= mr):
            bid += 1
            acc, cnt = 0, 0
        out.append(bid)
        acc += sz
        cnt += 1
    return out


def pack_walk_sql(
    ordered_cte: str,
    max_bytes: int,
    max_records: int | None = None,
) -> str:
    """DuckDB recursive-CTE fragment replaying the greedy fold.

    ``ordered_cte`` must be the name of a CTE with columns
    (grp VARCHAR, rn BIGINT row_number per grp ordered by the operator's
    order, sz BIGINT). Produces CTE ``walk(grp, rn, batch, acc, cnt)``.
    Emit it inside a WITH RECURSIVE block."""
    mr = int(max_records) if max_records else 1 << 62
    new = f"(w.acc + o.sz > {int(max_bytes)} OR w.cnt >= {mr})"
    return f"""walk(grp, rn, batch, acc, cnt) AS (
      SELECT grp, rn, CAST(0 AS BIGINT), sz, CAST(1 AS BIGINT)
      FROM {ordered_cte} WHERE rn = 1
      UNION ALL
      SELECT o.grp, o.rn,
             CASE WHEN {new} THEN w.batch + 1 ELSE w.batch END,
             CASE WHEN {new} THEN o.sz ELSE w.acc + o.sz END,
             CASE WHEN {new} THEN CAST(1 AS BIGINT) ELSE w.cnt + 1 END
      FROM {ordered_cte} o JOIN walk w
        ON o.grp = w.grp AND o.rn = w.rn + 1
    )"""


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` of two non-negative
    ints — the multi-dimensional clustering key Iceberg's
    ``rewrite_data_files(strategy => 'sort', sort_order => zorder(a, b))``
    sorts by (jar absent from this image; the KEY is engine-side math
    either way). Sorting by it co-locates rows close in BOTH dimensions
    into the same file, so min/max file stats prune scans on either
    predicate. Pure integer shifts/masks in a fixed fold order — exact in
    any engine."""
    z = None
    for k in range(bits):
        xb = F.shiftleft(F.shiftright(x, k).bitwiseAND(F.lit(1)), 2 * k)
        yb = F.shiftleft(
            F.shiftright(y, k).bitwiseAND(F.lit(1)), 2 * k + 1
        )
        term = xb + yb
        z = term if z is None else z + term
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — generated from the same bit
    walk so the interleave order can't drift."""
    terms = []
    for k in range(bits):
        terms.append(f"((({x} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({y} >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


def pruning_benefit(
    events: DataFrame,
    probes: list[int],
    cell_shift: int = 8,
    user_col: str = "user_id",
    order_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """WHY Z-order: simulate file-level min/max pruning under two
    layouts of the same rows — arrival order (files = contiguous
    ``order_col`` ranges) vs Z-order (files = coarse z-cells of
    :func:`zorder_key`) — and count, for each point predicate
    ``user = probe``, how many files a min/max-stats reader must scan.
    Arrival files interleave every user, so their [min_user, max_user]
    spans cover everything and nothing prunes; z-cells are narrow in
    BOTH dimensions. Emits one row per (layout, probe): files scanned,
    rows scanned, total files — all exact integers (the same arithmetic
    an Iceberg planner does against its manifest stats; jar absent, the
    math is engine-side either way).

    The probe set is a literal list, so the cells×probes compare is a
    broadcast against the tiny per-cell stats frame — the corpus is
    touched ONCE per layout for the stats rollup.
    """
    mn = events.agg(F.min(F.unix_timestamp(ts_col))).collect()[0][0]
    hours = ((F.unix_timestamp(ts_col) - F.lit(mn)) / 3600).cast("long")
    z = zorder_key(
        F.col(user_col).bitwiseAND(F.lit(0xFFFF)),
        hours.bitwiseAND(F.lit(0xFFFF)),
    )
    keyed = events.select(
        F.col(user_col).alias("u"),
        F.shiftright(z, cell_shift).alias("zcell"),
        F.floor(F.col(order_col) / 256).alias("acell"),
    )

    def stats(cell: str, layout: str) -> DataFrame:
        cells = keyed.groupBy(F.col(cell).alias("cell")).agg(
            F.min("u").alias("u_min"),
            F.max("u").alias("u_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        pr = F.explode(
            F.array(*[F.lit(p) for p in probes])
        ).alias("probe_user")
        hit = (F.col("probe_user") >= F.col("u_min")) & (
            F.col("probe_user") <= F.col("u_max")
        )
        return (
            cells.select("*", pr)
            .groupBy("probe_user")
            .agg(
                F.sum(hit.cast("long")).alias("files_scanned"),
                F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0))).alias(
                    "rows_scanned"
                ),
                F.count(F.lit(1)).alias("files_total"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "probe_user",
                "files_scanned",
                "rows_scanned",
                "files_total",
            )
        )

    return stats("acell", "arrival").unionByName(stats("zcell", "zorder"))


def stratified_kfold(
    df: DataFrame,
    group_col: str,
    stratum_col: str,
    k: int = 5,
) -> DataFrame:
    """Group-aware stratified k-fold assignment — the split builder a
    training pipeline needs when rows share provenance (all turns of a
    conversation must land in ONE fold or eval leaks) and labels are
    imbalanced (each fold should mirror the stratum mix). Every GROUP
    gets fold = fmix32(hash(group)) % k — stateless, rerun- and
    engine-stable, like ``epoch_shuffle``'s ordering hash — and the
    whole assignment is audited in one pass: per (stratum, fold) the
    row/group counts plus the fold's share of the stratum, and
    ``leaked_groups`` (groups straddling folds) which is ZERO by
    construction of the group-grain hash.

    One distinct + one aggregate; the audit's doubles are single
    divisions of exact BIGINTs.

    Output per (stratum, fold): ``stratum, fold, n_groups, n_rows,
    stratum_share, leaked_groups``.
    """
    from cernan_spark.functions.porthash import portable_hash
    from cernan_spark.operators.corpus import fmix32

    fold = (
        fmix32(portable_hash(F.col(group_col).cast("string"))) % k
    ).cast("int")
    tagged = df.select(
        F.col(group_col).alias("g"),
        F.col(stratum_col).alias("stratum"),
        fold.alias("fold"),
    )
    per_group = tagged.groupBy("g", "stratum").agg(
        F.countDistinct("fold").alias("n_folds"),
        F.min("fold").alias("fold"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    audit = per_group.groupBy("stratum", "fold").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_rows").alias("n_rows"),
        F.sum(F.when(F.col("n_folds") > 1, 1).otherwise(0)).alias(
            "leaked_groups"
        ),
    )
    stratum_tot = audit.groupBy("stratum").agg(
        F.sum("n_rows").alias("tot")
    )
    return audit.join(stratum_tot, "stratum").select(
        "stratum",
        "fold",
        "n_groups",
        "n_rows",
        F.round(
            F.col("n_rows").cast("double") / F.col("tot").cast("double"),
            6,
        ).alias("stratum_share"),
        "leaked_groups",
    )
