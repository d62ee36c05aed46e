"""Greedy capacity packing (sink batch assembly / compaction planning)
and edit-distance candidate verification."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cernan_spark.operators.dedup import (
    editdist_blocked_pairs,
    seed_text_near_dups,
)
from cernan_spark.operators.packing import (
    greedy_pack,
    greedy_pack_model,
    pack_summary,
)
from tests.conftest import rows_to_tuples


def _pack_df(spark, rows):
    return spark.createDataFrame(rows, "grp string, k long, sz long")


def test_greedy_pack_matches_python_model_random(spark):
    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(3)}", i, rng.choice([0, 1, 5, 90, 100, 250]))
        for i in range(400)
    ]
    df = _pack_df(spark, rows)
    packed = greedy_pack(
        df, ["grp"], ["k"], "sz", max_bytes=100, max_records=7
    )
    got = {
        (r["grp"], r["k"]): r["batch_id"]
        for r in packed.collect()
    }
    for grp in {g for g, _, _ in rows}:
        grows = sorted((k, sz) for g, k, sz in rows if g == grp)
        want = greedy_pack_model(
            [(sz,) for _, sz in grows], max_bytes=100, max_records=7
        )
        for (k, _), bid in zip(grows, want):
            assert got[(grp, k)] == bid, (grp, k)


def test_greedy_pack_invariants(spark):
    rng = random.Random(11)
    rows = [(f"g{i % 4}", i, rng.randrange(0, 300)) for i in range(300)]
    df = _pack_df(spark, rows)
    packed = greedy_pack(
        df, ["grp"], ["k"], "sz", max_bytes=256, max_records=9
    ).collect()
    by_batch: dict[tuple, list] = {}
    for r in packed:
        by_batch.setdefault((r["grp"], r["batch_id"]), []).append(r)
    for (grp, bid), members in by_batch.items():
        total = sum(m["sz"] for m in members)
        assert len(members) <= 9
        # over max_bytes only as a single oversized record
        assert total <= 256 or len(members) == 1
    # batches within a group tile the order contiguously: the max order
    # key of batch b precedes the min order key of batch b+1
    for grp in {g for g, _, _ in rows}:
        batches = sorted(
            (bid, [m["k"] for m in mem])
            for (g, bid), mem in by_batch.items()
            if g == grp
        )
        assert [b for b, _ in batches] == list(range(len(batches)))
        for (b1, ks1), (b2, ks2) in zip(batches, batches[1:]):
            assert max(ks1) < min(ks2)


def test_greedy_pack_oversized_record_gets_own_batch(spark):
    df = _pack_df(spark, [("g", 1, 10), ("g", 2, 999), ("g", 3, 10)])
    got = rows_to_tuples(
        greedy_pack(df, ["grp"], ["k"], "sz", max_bytes=100),
        ["k", "batch_id"],
    )
    assert got == [(1, 0), (2, 1), (3, 2)]


def test_pack_summary(spark):
    df = _pack_df(
        spark, [("g", 1, 60), ("g", 2, 60), ("g", 3, 60), ("h", 1, 5)]
    )
    packed = greedy_pack(df, ["grp"], ["k"], "sz", max_bytes=100)
    got = rows_to_tuples(
        pack_summary(packed, ["grp"], "sz"),
        ["grp", "batch_id", "n_records", "batch_bytes"],
    )
    assert got == [("g", 0, 1, 60), ("g", 1, 1, 60), ("g", 2, 1, 60), ("h", 0, 1, 5)]
    # 60+60 > 100 → each alone; exact boundary packs together:
    packed2 = greedy_pack(df, ["grp"], ["k"], "sz", max_bytes=120)
    got2 = rows_to_tuples(
        pack_summary(packed2, ["grp"], "sz"),
        ["grp", "batch_id", "n_records", "batch_bytes"],
    )
    assert got2 == [("g", 0, 2, 120), ("g", 1, 1, 60), ("h", 0, 1, 5)]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_editdist_blocked_pairs_finds_seeded_twins(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seeded = seed_text_near_dups(docs, n_seed=10)
    out = editdist_blocked_pairs(seeded, max_dist=4, prefix_len=16)
    got = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in seeded.collect()}
    # every twin whose base text is ≥ prefix long must surface at its
    # true distance (3: the appended " zq")
    for i in range(10):
        if len(texts[i]) >= 16:
            assert got.get((i, i + 1_000_000)) == 3
    # and every reported distance is the true Levenshtein distance
    for (a, b), d in got.items():
        assert d == _lev(texts[a], texts[b])


def test_editdist_respects_length_lower_bound(spark):
    df = spark.createDataFrame(
        [
            (1, "same-prefix-here AAAA"),
            (2, "same-prefix-here AAAA tail that is far too long to match"),
            (3, "same-prefix-here AAAB"),
        ],
        "doc_id long, text string",
    )
    got = rows_to_tuples(
        editdist_blocked_pairs(df, max_dist=4, prefix_len=16),
        ["id_a", "id_b", "edit_dist"],
    )
    assert got == [(1, 3, 1)]


def test_greedy_pack_plan_single_exchange(spark):
    """The pack is ONE hash shuffle on the group key; the fold itself is
    a mapper over each shuffled group (FlatMapGroupsInPandas), never a
    second exchange or a sort-based window over the full data."""
    import re

    from cernan_spark.operators.packing import greedy_pack

    df = spark.range(2000).select(
        (F.col("id") % 7).cast("string").alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") % 100 + 1).alias("sz"),
    )
    packed = greedy_pack(df, ["grp"], ["k"], "sz", max_bytes=500)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "FlatMapGroupsInPandas" in plan


def test_pruning_benefit_model(spark):
    """Synthetic layout where the answer is computable by hand: 256 users
    x 64 hours, arrival order interleaves users (every arrival file
    spans all users -> zero pruning); z-cells at shift 8 isolate
    (user, hour-band) neighborhoods, so a point user predicate prunes
    most z-files. Totals and per-probe scan counts are checked against
    a pure-Python replay of the same min/max arithmetic."""
    from cernan_spark.operators.packing import pruning_benefit

    rows = []
    eid = 0
    for hour in range(64):
        for user in range(256):
            rows.append((eid, user, 1700000000 + hour * 3600))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, epoch long"
    ).select(
        "event_id", "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    got = {
        (r["layout"], r["probe_user"]): (
            r["files_scanned"],
            r["rows_scanned"],
            r["files_total"],
        )
        for r in pruning_benefit(df, [0, 200, 9999], cell_shift=8).collect()
    }

    # python replay of the identical file-stats arithmetic
    def interleave(x, y):
        z = 0
        for k in range(16):
            z |= ((x >> k) & 1) << (2 * k)
            z |= ((y >> k) & 1) << (2 * k + 1)
        return z

    cells = {"arrival": {}, "zorder": {}}
    for eid2, (_, user, _ts) in enumerate(rows):
        hour = (rows[eid2][2] - rows[0][2]) // 3600
        for layout, cell in (
            ("arrival", eid2 // 256),
            ("zorder", interleave(user & 0xFFFF, hour & 0xFFFF) >> 8),
        ):
            lo, hi, n = cells[layout].get(cell, (10**9, -1, 0))
            cells[layout][cell] = (min(lo, user), max(hi, user), n + 1)
    for layout, cc in cells.items():
        for probe in (0, 200, 9999):
            fs = sum(1 for lo, hi, _ in cc.values() if lo <= probe <= hi)
            rs = sum(n for lo, hi, n in cc.values() if lo <= probe <= hi)
            assert got[(layout, probe)] == (fs, rs, len(cc))
    # the headline claim: arrival scans everything, zorder prunes
    assert got[("arrival", 0)][1] == len(rows)
    assert got[("zorder", 0)][1] < len(rows) // 2
