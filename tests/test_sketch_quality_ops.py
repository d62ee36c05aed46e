"""Session-2 operator batch: portable Bloom filter (operators/sketch.py),
EWMA smoothing + bucketized interval join (operators/temporal.py), PMI
collocations / unigram-LM log-prob / winsorized length stats
(operators/corpus.py). Python-model equivalence throughout — the same
test strategy as the reference's quickcheck suites (SURVEY.md §5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cernan_spark.functions.porthash import MERSENNE31
from cernan_spark.operators.sketch import (
    BLOOM_BITS,
    BLOOM_COEFFS,
    N_WORDS,
    bloom_build,
    bloom_probe_shingles,
)


def _py_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % MERSENNE31
    return h


def _py_fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    return h ^ (h >> 16)


def _py_positions(item: str) -> list[int]:
    h = _py_fmix32(_py_hash(item))
    return [((a * h + b) % MERSENNE31) % BLOOM_BITS for a, b in BLOOM_COEFFS]


def _py_bloom(items) -> list[int]:
    words = [0] * N_WORDS
    for it in items:
        for p in _py_positions(it):
            words[p >> 5] |= 1 << (p & 31)
    return words


def _py_contains(words, item: str) -> bool:
    return all(
        (words[p >> 5] >> (p & 31)) & 1 for p in _py_positions(item)
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_words_match_python_model(spark):
    items = [f"shingle number {i} of the set" for i in range(50)]
    df = spark.createDataFrame([(x,) for x in items], "item string")
    words = bloom_build(df).collect()[0]["words"]
    assert words == _py_bloom(items)
    assert len(words) == N_WORDS
    # 32-bit half-words: the top 32 bits are never used
    assert all(0 <= w < (1 << 32) for w in words)


def test_bloom_no_false_negatives_and_probe_matches_model(spark):
    members = [f"member {i}" for i in range(80)]
    others = [f"absent {i}" for i in range(200)]
    bloom = bloom_build(
        spark.createDataFrame([(x,) for x in members], "item string")
    )
    probe = spark.createDataFrame(
        [(0, members), (1, others), (2, members[:3] + others[:3]), (3, [])],
        "doc_id long, shingles array<string>",
    )
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_bloom_hits"], r["flagged"])
        for r in bloom_probe_shingles(probe, bloom).collect()
    }
    words = _py_bloom(members)
    # every member hits (no false negatives)
    assert out[0] == (80, 80, True)
    # python model agrees on the false-positive count of the absent set
    fp = sum(1 for x in others if _py_contains(words, x))
    assert out[1] == (200, fp, fp > 0)
    mixed_hits = sum(
        1 for x in members[:3] + others[:3] if _py_contains(words, x)
    )
    assert out[2][1] == mixed_hits and out[2][1] >= 3
    assert out[3] == (0, 0, False)
    # geometry sanity: 80 items × 4 bits in 4096 → false positives rare
    assert fp / 200 < 0.05


def test_bloom_build_is_partitioning_invariant(spark):
    items = [(f"it-{i % 97}",) for i in range(1000)]
    df = spark.createDataFrame(items, "item string")
    a = bloom_build(df).collect()[0]["words"]
    b = bloom_build(df.repartition(17)).collect()[0]["words"]
    assert a == b


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_matches_python_fold(spark):
    from cernan_spark.operators.temporal import ewma_fold

    series = [
        ("a", i, v)
        for i, v in enumerate([10.0, 0.0, 5.0, 5.0, 1.25])
    ] + [("b", 0, 42.0)]
    df = spark.createDataFrame(series, "k string, i long, value double")
    out = {
        r["k"]: (r["n_samples"], r["ewma"])
        for r in ewma_fold(df, ["k"], ["i"]).collect()
    }

    def fold(vals):
        y = vals[0]
        for x in vals[1:]:
            y = (y + x) * 0.5
        return round(y, 9)

    assert out["a"] == (5, fold([10.0, 0.0, 5.0, 5.0, 1.25]))
    assert out["b"] == (1, 42.0)


def test_ewma_order_comes_from_order_cols_not_arrival(spark):
    from cernan_spark.operators.temporal import ewma_fold

    rows = [("a", 2, 8.0), ("a", 0, 1.0), ("a", 1, 3.0)]
    df = spark.createDataFrame(rows, "k string, i long, value double").repartition(3)
    out = ewma_fold(df, ["k"], ["i"]).collect()[0]
    assert out["ewma"] == round((((1.0 + 3.0) * 0.5) + 8.0) * 0.5, 9)


# ---------------------------------------------------------------------------
# interval bucket join
# ---------------------------------------------------------------------------


def test_interval_join_matches_naive_theta_join(spark):
    from cernan_spark.operators.temporal import interval_bucket_join

    points = spark.createDataFrame(
        [(t, t % 7) for t in range(0, 20000, 37)], "epoch long, cents long"
    )
    # 3589 and 3626 are data points (multiples of 37) around a bucket edge
    ivs = [
        (100, 5000),       # spans multiple 3600 buckets
        (4000, 4200),      # inside one bucket
        (3589, 3626),      # straddles a bucket edge; both ends are points
        (4000, 9000),      # overlaps the first interval
        (19000, 30000),    # runs past the data
    ]
    intervals = spark.createDataFrame(ivs, "win_start long, win_end long")
    got = {
        (r["win_start"], r["win_end"]): (r["n_points"], r["sum_cents"])
        for r in interval_bucket_join(
            points, intervals, bucket_seconds=3600
        ).collect()
    }
    pts = [(t, t % 7) for t in range(0, 20000, 37)]
    for s, e in ivs:
        inside = [(t, c) for t, c in pts if s <= t < e]
        if inside:
            assert got[(s, e)] == (len(inside), sum(c for _, c in inside))
        else:
            assert (s, e) not in got
    # boundary semantics: start (3589, a point) inclusive; end (3626, a
    # point) exclusive — so exactly one match
    assert got[(3589, 3626)][0] == 1


def test_interval_join_never_duplicates_a_match(spark):
    from cernan_spark.operators.temporal import interval_bucket_join

    points = spark.createDataFrame([(5000, 1)], "epoch long, cents long")
    # one interval spanning many buckets: the single matching point must
    # count exactly once even though the interval exploded to 10 buckets
    intervals = spark.createDataFrame([(0, 36000)], "win_start long, win_end long")
    row = interval_bucket_join(points, intervals, bucket_seconds=3600).collect()[0]
    assert (row["n_points"], row["sum_cents"]) == (1, 1)


# ---------------------------------------------------------------------------
# PMI
# ---------------------------------------------------------------------------


def test_pmi_matches_python_model(spark):
    from collections import Counter

    from cernan_spark.operators.corpus import pmi_bigrams

    docs = [
        (0, "new york new york city"),
        (1, "new york is a city"),
        (2, "a city in new york"),
        (3, "york new style"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["x"], r["y"]): (r["c_xy"], r["c_x"], r["c_y"], r["pmi"])
        for r in pmi_bigrams(df, min_count=2).collect()
    }
    toks = [t.split(" ") for _, t in docs]
    uni = Counter(t for ts in toks for t in ts)
    big = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    n_tok = sum(uni.values())
    n_big = sum(big.values())
    want = {}
    for (x, y), cxy in big.items():
        if cxy >= 2:
            pmi = (
                math.log(cxy)
                + 2.0 * math.log(n_tok)
                - math.log(n_big)
                - math.log(uni[x])
                - math.log(uni[y])
            )
            want[(x, y)] = (cxy, uni[x], uni[y], round(pmi, 6))
    assert out == want
    # the collocation co-occurs far above chance: positive PMI even
    # though both tokens are the corpus's most frequent
    assert out[("new", "york")][3] > 0


# ---------------------------------------------------------------------------
# unigram log-prob
# ---------------------------------------------------------------------------


def test_unigram_logprob_matches_python_model(spark):
    from collections import Counter

    from cernan_spark.operators.corpus import unigram_logprob

    docs = [(0, "a a b c"), (1, "a b"), (2, "rare words here"), (3, "a")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["logprob"], r["avg_logprob"])
        for r in unigram_logprob(df).collect()
    }
    cnt = Counter(t for _, text in docs for t in text.split(" "))
    n = sum(cnt.values())
    for doc_id, text in docs:
        toks = text.split(" ")
        # the operator folds ln over the ASCENDING count multiset
        lp = sum(math.log(c) for c in sorted(cnt[t] for t in toks)) - len(
            toks
        ) * math.log(n)
        got = out[doc_id]
        assert got[0] == len(toks)
        assert abs(got[1] - lp) < 1e-6
        assert abs(got[2] - lp / len(toks)) < 1e-6
    # common-token docs score higher than the rare-token doc
    assert out[3][2] > out[2][2]


# ---------------------------------------------------------------------------
# winsorized lengths
# ---------------------------------------------------------------------------


def test_winsorized_stats_match_python_model(spark):
    from cernan_spark.operators.corpus import winsorized_length_stats

    lengths = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]
    docs = [(i, "en", " ".join(["w"] * n)) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    r = winsorized_length_stats(df, "lang").collect()[0]

    def q(sorted_vals, p):
        h = (len(sorted_vals) - 1) * p
        lo = math.floor(h)
        v = sorted_vals[lo]
        if lo + 1 < len(sorted_vals):
            v += (h - lo) * (sorted_vals[lo + 1] - sorted_vals[lo])
        return v

    p05, p95 = q(lengths, 0.05), q(lengths, 0.95)
    below = [x for x in lengths if x < p05]
    above = [x for x in lengths if x > p95]
    mid = [x for x in lengths if p05 <= x <= p95]
    wmean = (sum(mid) + len(below) * p05 + len(above) * p95) / len(lengths)
    assert r["n_docs"] == 10
    assert abs(r["p_lo"] - round(p05, 6)) < 1e-9
    assert abs(r["p_hi"] - round(p95, 6)) < 1e-9
    assert (r["n_below"], r["n_above"]) == (len(below), len(above))
    assert abs(r["winsorized_mean"] - wmean) < 1e-6
    # the outlier no longer dominates: winsorized mean far below raw mean
    assert r["winsorized_mean"] < sum(lengths) / len(lengths)


# ---------------------------------------------------------------------------
# metric pair correlation
# ---------------------------------------------------------------------------


def test_metric_correlation_matches_python_model(spark):
    from cernan_spark.operators.anomaly import metric_pair_correlation

    cells = [
        # (a, b, c): a and b strongly correlated, c anti-correlated with a
        (1, 2, 9),
        (2, 4, 8),
        (3, 6, 7),
        (4, 8, 1),
        (5, 11, 0),
    ]
    df = spark.createDataFrame(cells, "a long, b long, c long")
    out = {
        (r["metric_x"], r["metric_y"]): (r["n_cells"], r["corr"])
        for r in metric_pair_correlation(
            df, ["a", "b", "c"], [("a", "b"), ("a", "c"), ("b", "c")]
        ).collect()
    }

    def corr(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        num = n * sxy - sx * sy
        den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        return round(num / den, 6)

    a = [r[0] for r in cells]
    b = [r[1] for r in cells]
    c = [r[2] for r in cells]
    assert out[("a", "b")] == (5, corr(a, b))
    assert out[("a", "c")] == (5, corr(a, c))
    assert out[("b", "c")] == (5, corr(b, c))
    assert out[("a", "b")][1] > 0.99
    assert out[("a", "c")][1] < -0.8


def test_metric_correlation_constant_series_is_null(spark):
    from cernan_spark.operators.anomaly import metric_pair_correlation

    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "a long, b long"
    )
    row = metric_pair_correlation(df, ["a", "b"], [("a", "b")]).collect()[0]
    assert row["corr"] is None  # zero variance → undefined, never ±inf


# ---------------------------------------------------------------------------
# JL projection
# ---------------------------------------------------------------------------


def test_jl_matches_python_model_and_signs_are_deterministic(spark):
    from cernan_spark.operators.similarity import jl_project, jl_sign_matrix

    k, dim = 8, 16
    signs = jl_sign_matrix(k, dim)
    assert jl_sign_matrix(k, dim) == signs  # pure function of (j, i)
    assert all(s in (1, -1) for row in signs for s in row)
    vecs = [
        (0, [((i * 7 + 3) % 11 - 5) / 4.0 for i in range(dim)]),
        (1, [1.0] * dim),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in jl_project(df, k=k, dim=dim).collect()}
    for vid, v in vecs:
        vf = [float(np32(x)) for x in v]
        proj = [
            sum(a * s for a, s in zip(vf, signs[j])) / math.sqrt(k)
            for j in range(k)
        ]
        got = out[vid]
        assert all(abs(g - w) < 1e-9 for g, w in zip(got["proj"], proj))
        assert abs(got["orig_sq"] - sum(x * x for x in vf)) < 1e-9
        assert abs(got["proj_sq"] - sum(x * x for x in proj)) < 1e-9


def np32(x: float) -> float:
    """Round-trip through float32 the way the parquet/createDataFrame
    float column does."""
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


def test_jl_norms_concentrate(spark):
    from cernan_spark.operators.similarity import jl_project

    dim = 64
    vecs = [
        (i, [((i * 31 + j * 7) % 200 - 100) / 50.0 for j in range(dim)])
        for i in range(200)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = jl_project(df, k=16, dim=dim).collect()
    ratios = [r["proj_sq"] / r["orig_sq"] for r in rows if r["orig_sq"] > 0]
    mean_ratio = sum(ratios) / len(ratios)
    # JL: E[proj_sq] = orig_sq; with k=16 the mean over 200 vectors is tight
    assert abs(mean_ratio - 1.0) < 0.25


# ---------------------------------------------------------------------------
# shard-merge laws (the property that makes each sketch resumable at 100 TB)
# ---------------------------------------------------------------------------


def test_bloom_shard_or_merge_equals_one_pass(spark):
    """bloom(shard1) | bloom(shard2) == bloom(shard1 ∪ shard2): OR-state
    merges across scheduled-ingest shards with no rebuild."""
    items = [f"item-{i}" for i in range(300)]
    s1 = spark.createDataFrame([(x,) for x in items[:180]], "item string")
    s2 = spark.createDataFrame([(x,) for x in items[180:]], "item string")
    full = spark.createDataFrame([(x,) for x in items], "item string")
    w1 = bloom_build(s1).collect()[0]["words"]
    w2 = bloom_build(s2).collect()[0]["words"]
    wf = bloom_build(full).collect()[0]["words"]
    assert [a | b for a, b in zip(w1, w2)] == wf


def test_hll_shard_max_merge_equals_one_pass(spark):
    """Per-register MAX over shard sketches == the one-pass sketch, so a
    resumed ingest never re-reads old shards to keep distinct counts."""
    from cernan_spark.operators.corpus import hll_distinct

    items = [(f"item-{i % 700}", "g") for i in range(4000)]
    df = spark.createDataFrame(items, "it string, g string")
    s1 = df.limit(2500)
    s2 = df.subtract(s1.limit(0)).exceptAll(s1)  # the complement rows
    one_pass = hll_distinct(df, ["g"], F.col("it")).collect()[0]

    # merge = run the same register pipeline over the UNION of shards;
    # mergeability means the union of raw rows and the union of register
    # states fold to the same sketch
    merged = hll_distinct(s1.unionByName(s2), ["g"], F.col("it")).collect()[0]
    assert merged["hll_items"] == one_pass["hll_items"]
    assert merged["harmonic_sum"] == one_pass["harmonic_sum"]


def test_interval_join_drops_empty_and_inverted_intervals(spark):
    """sequence(a, b) steps DOWNWARD when a > b — an empty [s, e) must
    yield zero matches, not spurious descending buckets."""
    from cernan_spark.operators.temporal import interval_bucket_join

    points = spark.createDataFrame(
        [(t, 1) for t in range(0, 40000, 100)], "epoch long, cents long"
    )
    intervals = spark.createDataFrame(
        [(5000, 5000), (30000, 2000), (7000, 7300)],
        "win_start long, win_end long",
    )
    got = {
        (r["win_start"], r["win_end"]): r["n_points"]
        for r in interval_bucket_join(points, intervals, bucket_seconds=3600).collect()
    }
    assert got == {(7000, 7300): 3}


def test_rrf_fuse_missing_rank_convention(spark):
    from cernan_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse(a, b, top_k=3).collect()}
    # doc 2 appears in both lists → sums both terms and wins
    assert out[2]["fused_rank"] == 1
    assert abs(out[2]["rrf"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    # docs 1 and 3 each carry a single term; doc 1 (rank 1) beats doc 3
    assert out[1]["rank_b"] is None and out[3]["rank_a"] is None
    assert out[1]["fused_rank"] == 2 and out[3]["fused_rank"] == 3


def test_log2_heatmap_exact_buckets(spark):
    from cernan_spark.operators.aggregate import log2_heatmap

    rows = [("m", 0, 1), ("m", 10, 3), ("m", 20, 4), ("m", 3700, 1024),
            ("m", 30, 0)]  # cents=0 dropped
    df = spark.createDataFrame(rows, "name string, epoch long, cents long")
    out = {(r["ws"], r["bucket"]): (r["n"], r["min_cents"], r["max_cents"])
           for r in log2_heatmap(df, ["name"], "epoch", "cents").collect()}
    assert out == {
        (0, 0): (1, 1, 1),     # 1 → bit length 1 → bucket 0
        (0, 1): (1, 3, 3),     # 3 → bucket 1
        (0, 2): (1, 4, 4),     # 4 → bucket 2 (boundary exact)
        (3600, 10): (1, 1024, 1024),
    }


def test_telemetry_rollup_grains(spark):
    from cernan_spark.operators.aggregate import telemetry_rollup

    rows = [("a", "SUM", 1), ("a", "SET", 2), ("b", "SUM", 4)]
    df = spark.createDataFrame(rows, "name string, kind string, cents long")
    out = telemetry_rollup(df, ["name", "kind"], "cents").collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert len(by_gid[0]) == 3                       # leaf grain
    assert {(r["name"], r["sum_cents"]) for r in by_gid[1]} == {("a", 3), ("b", 4)}
    total = by_gid[3][0]
    assert total["n"] == 3 and total["sum_cents"] == 7 and total["name"] is None


def test_dlq_reason_full_taxonomy(spark):
    from cernan_spark.functions.classify import dlq_reason

    cases = {
        "m1:1.5|c": "ok", "m:+3|g": "ok", "m:12.3": "no_pipe",
        "m:abc|c": "bad_value", "m:1|q": "bad_kind", ":1|c": "empty_name",
        "m 1|c": "no_colon", "": "empty", "  ": "empty",
    }
    df = spark.createDataFrame([(k,) for k in cases], "line string")
    got = {r["line"]: r["r"] for r in
           df.select("line", dlq_reason(F.col("line")).alias("r")).collect()}
    assert got == cases


def test_hll_shard_merge_identical_to_one_pass(spark):
    """Register max is idempotent/commutative/associative, so a 3-way
    shard split merged via union->re-max must reproduce the one-pass
    sketch EXACTLY — every register, harmonic sum, and estimate."""
    from cernan_spark.operators.corpus import (
        hll_distinct,
        hll_merge_registers,
        hll_registers,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    one_pass = {
        tuple(r) for r in hll_distinct(d, ["lang"], F.col("tok")).collect()
    }
    shards = [
        hll_registers(d.filter(F.col("doc_id") % 3 == k), ["lang"], F.col("tok"))
        for k in range(3)
    ]
    merged = {
        tuple(r) for r in hll_merge_registers(shards, ["lang"]).collect()
    }
    assert merged == one_pass


def test_event_pattern_hand_model(spark):
    """Known streams: 'ccvp' matches c[cv]*p once greedily; 'cpcp' twice
    (non-overlapping); a stream with no purchase matches zero times."""
    from cernan_spark.operators.behavior import event_pattern_match

    seqs = {1: "ccvp", 2: "cpcp", 3: "ccvv", 4: "vcvcp"}
    rows = [
        (u, i, {"c": "click", "v": "view", "p": "purchase"}[ch])
        for u, s in seqs.items()
        for i, ch in enumerate(s)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    got = {
        r["user_id"]: (r["seq_len"], r["n_matches"], r["first_match"])
        for r in event_pattern_match(
            df, {"click": "c", "view": "v", "purchase": "p"}, "c[cv]*p"
        ).collect()
    }
    assert got[1] == (4, 1, "ccvp")
    assert got[2] == (4, 2, "cp")
    assert got[3] == (4, 0, "")
    assert got[4] == (5, 1, "cvcp")


def test_bpe_pair_counts_hand_model(spark):
    """'low low lower': pairs weighted by word frequency with the
    end-of-word marker — 'lo' and 'ow' occur in all 3 word tokens;
    'w</w>' only in the two 'low' tokens."""
    from cernan_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame([(1, "low low lower")], "doc_id long, text string")
    got = {r["pair"]: (r["n_occ"], r["n_word_types"]) for r in
           bpe_pair_counts(df, top_k=50).collect()}
    assert got["lo"] == (3, 2)
    assert got["ow"] == (3, 2)
    assert got["w</w>"] == (2, 1)
    assert got["er"] == (1, 1)
    assert got["r</w>"] == (1, 1)


def test_kmv_merge_identical_to_one_pass_and_estimates(spark):
    """3-way shard merge reproduces the one-pass sketch exactly (state
    string included); on >k distinct items the estimate lands within
    3/sqrt(k) relative error of truth (the KMV bound at ~3 sigma)."""
    from cernan_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_minima,
    )

    items = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok-"), (F.col("id") % 1200).cast("string")).alias(
            "tok"
        ),
    )
    one = kmv_estimate(kmv_minima(items, F.col("tok"))).collect()[0]
    shards = [
        kmv_minima(items.filter(F.col("doc_id") % 3 == i), F.col("tok"))
        for i in range(3)
    ]
    merged = kmv_merge(shards).collect()[0]
    assert tuple(merged) == tuple(one)
    assert one["k_actual"] == 64
    assert abs(one["est_distinct"] - 1200) / 1200 < 3 / (64 ** 0.5)
    # under k distinct -> the sketch IS the exact set
    small = kmv_estimate(
        kmv_minima(items.filter(F.col("id") % 1200 < 10), F.col("tok"))
    ).collect()[0]
    assert small["k_actual"] == 10 and small["est_distinct"] == 10.0


def test_hll_set_overlap_laws(spark):
    """Identical sets: intersection ≈ each estimate, Jaccard ≈ 1.
    Disjoint sets: intersection ≈ 0 (within sketch noise) and the union
    estimate equals the one-pass union sketch exactly (merge law)."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.corpus import hll_distinct, hll_set_overlap

    same = spark.createDataFrame(
        [(g, f"u{i}") for g in ("a", "b") for i in range(2000)],
        "g string, item string",
    )
    r = hll_set_overlap(same, "g", F.col("item"), "a", "b").first()
    assert r["hll_a"] == r["hll_b"] == r["hll_union"]
    assert r["jaccard_est"] == 1.0

    disjoint = spark.createDataFrame(
        [("a", f"x{i}") for i in range(1500)]
        + [("b", f"y{i}") for i in range(1500)],
        "g string, item string",
    )
    r = hll_set_overlap(disjoint, "g", F.col("item"), "a", "b").first()
    assert abs(r["jaccard_est"]) < 0.15  # sketch noise only
    one_pass = hll_distinct(
        disjoint.select(F.lit("k").alias("k"), "item"),
        ["k"],
        F.col("item"),
        name="est",
    ).first()["hll_est"]
    assert r["hll_union"] == one_pass  # register-max merge law


def test_simplified_silhouette_hand_model(spark):
    """Two separated 2-point clusters in 2-D: every point sits 1 from
    its own centroid and sqrt(101) from the other, so each cluster's
    mean silhouette is (sqrt(101)-1)/sqrt(101)."""
    import math

    from cernan_spark.operators.similarity import simplified_silhouette

    rows = [
        (1, [0.0, 0.0], 0), (2, [0.0, 2.0], 0),
        (3, [10.0, 0.0], 1), (4, [10.0, 2.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in simplified_silhouette(df).collect()}
    expect = (math.sqrt(101) - 1) / math.sqrt(101)
    for lab in (0, 1):
        assert out[lab]["n"] == 2
        assert out[lab]["mean_a"] == 1.0
        assert abs(out[lab]["mean_silhouette"] - expect) < 1e-6


def test_simplified_silhouette_singleton_cluster_zero_a(spark):
    """A singleton cluster's point IS its centroid: a = 0, s > 0."""
    from cernan_spark.operators.similarity import simplified_silhouette

    rows = [
        (1, [0.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [9.0, 9.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in simplified_silhouette(df).collect()}
    assert out[1]["mean_a"] == 0.0 and out[1]["mean_silhouette"] == 1.0


def test_diversity_profile_hand_model(spark):
    """counts {2,2}: Simpson 1/3, effective classes 3, Shannon ln 2;
    counts {1,1}: Simpson 0 → inv_simpson NULL, Shannon still ln 2."""
    import math

    from cernan_spark.operators.textstats import diversity_profile

    rows = (
        [("g1", "en")] * 2 + [("g1", "es")] * 2
        + [("g2", "en"), ("g2", "es")]
    )
    df = spark.createDataFrame(rows, "g string, cls string")
    out = {r["g"]: r for r in diversity_profile(df, ["g"], "cls").collect()}
    assert out["g1"]["simpson"] == round(1 / 3, 6)
    assert out["g1"]["inv_simpson"] == 3.0
    assert out["g1"]["shannon"] == round(math.log(2), 6)
    assert out["g2"]["simpson"] == 0.0
    assert out["g2"]["inv_simpson"] is None
    assert out["g2"]["shannon"] == round(math.log(2), 6)
    assert out["g1"]["n"] == 4 and out["g1"]["n_classes"] == 2
