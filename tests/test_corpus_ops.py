"""Corpus-assembly operators (operators/corpus.py): train/val/test split,
token chunking, BM25, unigram familiarity, portable HLL; plus the int8
embedding quantizer (operators/similarity.py) and CDC upsert compaction
(operators/temporal.py). Python-model equivalence throughout — the same
test strategy as the reference's quickcheck suites (SURVEY.md §5)."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from cernan_spark.operators.corpus import (
    HLL_M,
    HLL_REST_BITS,
    bm25_scores,
    doc_token_chunks,
    hll_distinct,
    train_val_split,
    unigram_familiarity,
)

DOCS = [
    (0, "a b c d e f g h"),
    (1, "a a a b the quick fox"),
    (2, "x"),
    (3, "spark join window vector stream spark spark"),
    (4, "join the window stream of spark data now"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % ((1 << 31) - 1)
    return h


# ---------------------------------------------------------------------------
# train/val split
# ---------------------------------------------------------------------------


def test_split_matches_python_model_and_is_stable(spark):
    rows = train_val_split(_docs(spark)).select("doc_id", "split_bucket", "split").collect()
    for r in rows:
        b = _py_hash(f"{r['doc_id']}:split42") % 1000
        assert r["split_bucket"] == b
        want = "train" if b < 800 else ("val" if b < 900 else "test")
        assert r["split"] == want
    # repartitioning must not move any document between splits
    again = {
        r["doc_id"]: r["split"]
        for r in train_val_split(_docs(spark).repartition(7)).collect()
    }
    assert again == {r["doc_id"]: r["split"] for r in rows}


def test_split_fractions_roughly_hold(spark):
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in train_val_split(big)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunks_match_python_model(spark):
    out = doc_token_chunks(_docs(spark), chunk_tokens=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"]) for r in out}
    want = {}
    for doc_id, text in DOCS:
        toks = text.split(" ")
        s = 0
        while s < len(toks):
            want[(doc_id, s // 3)] = (" ".join(toks[s : s + 4]), min(4, len(toks) - s))
            s += 3
    assert got == want


def test_chunks_cover_every_token(spark):
    out = doc_token_chunks(_docs(spark), chunk_tokens=4, stride=3)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.select("doc_id", F.explode(F.split("chunk_text", " ")).alias("t"))
        .groupBy("doc_id")
        .agg(F.count_distinct("t").alias("n"))
        .collect()
    }
    for doc_id, text in DOCS:
        assert per_doc[doc_id] == len(set(text.split(" ")))


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_matches_python_model(spark):
    terms = ["spark", "join", "zzz"]
    out = {
        r["doc_id"]: (r["bm25"], r["n_query_hits"])
        for r in bm25_scores(_docs(spark), terms).collect()
    }
    toks = {d: t.split(" ") for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {t: sum(1 for d in toks.values() if t in d) for t in terms}
    for doc_id, t in toks.items():
        score = 0.0
        hits = 0
        for term in terms:
            tf = t.count(term)
            hits += 1 if tf else 0
            idf = math.log((n - dfs[term] + 0.5) / (dfs[term] + 0.5) + 1.0)
            score += idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(t) / avgdl))
        assert out[doc_id][1] == hits
        assert abs(out[doc_id][0] - score) < 1e-9


def test_bm25_ranks_term_dense_doc_first(spark):
    scored = bm25_scores(_docs(spark), ["spark"]).orderBy(F.desc("bm25")).collect()
    assert scored[0]["doc_id"] == 3  # three 'spark' tokens in a short doc


# ---------------------------------------------------------------------------
# unigram familiarity
# ---------------------------------------------------------------------------


def test_familiarity_matches_python_model(spark):
    out = {
        r["doc_id"]: (r["n_tokens"], r["familiarity"], r["n_oov"])
        for r in unigram_familiarity(_docs(spark), vocab_k=3).collect()
    }
    from collections import Counter

    counts = Counter(t for _, text in DOCS for t in text.split(" "))
    vocab = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    for doc_id, text in DOCS:
        toks = text.split(" ")
        fam = sum(vocab.get(t, 0) for t in toks)
        oov = sum(1 for t in toks if t not in vocab)
        assert out[doc_id] == (len(toks), fam, oov)


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def _py_fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    return h ^ (h >> 16)


def _py_hll(items):
    regs = {}
    for it in items:
        h = _py_fmix32(_py_hash(it))
        reg = h % HLL_M
        rest = h >> 8
        rho = (HLL_REST_BITS + 1) - rest.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    harmonic = sum(2.0 ** -v for v in regs.values()) + (m - len(regs))
    e = alpha * m * m / harmonic
    v = HLL_M - len(regs)
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    return e, v


@pytest.mark.parametrize("n_items", [10, 300, 2000])
def test_hll_matches_python_model_and_is_accurate(spark, n_items):
    items = [f"item-{i}" for i in range(n_items)]
    df = spark.createDataFrame([(x,) for x in items], "it string").withColumn(
        "g", F.lit("g")
    )
    row = hll_distinct(df, ["g"], F.col("it"), name="items").collect()[0]
    e, v = _py_hll(items)
    assert row["n_zero_registers"] == v
    assert abs(row["hll_items"] - round(e, 4)) < 1e-6
    # sketch accuracy: within ~3 standard errors (1.04/sqrt(256) ≈ 6.5%)
    assert abs(row["hll_items"] - n_items) / n_items < 0.2


def test_hll_is_partitioning_invariant(spark):
    items = [(f"item-{i % 700}",) for i in range(5000)]
    df = spark.createDataFrame(items, "it string").withColumn("g", F.lit("g"))
    a = hll_distinct(df, ["g"], F.col("it")).collect()[0]
    b = hll_distinct(df.repartition(13), ["g"], F.col("it")).collect()[0]
    assert a["hll_items"] == b["hll_items"]
    assert a["harmonic_sum"] == b["harmonic_sum"]


# ---------------------------------------------------------------------------
# int8 quantizer
# ---------------------------------------------------------------------------


def test_quantize_int8_matches_python_model(spark):
    from cernan_spark.operators.similarity import quantize_int8

    vecs = [(0, [0.5, -1.0, 0.25, 0.0]), (1, [2.0, 1.0, -2.0, 0.125])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for vid, v in vecs:
        amax = max(abs(x) for x in v)
        scale = max(amax, 1e-12) / 127.0
        q = [math.copysign(math.floor(abs(x) / scale + 0.5), x) if x else 0.0 for x in v]
        mse = sum((x - qi * scale) ** 2 for x, qi in zip(v, q)) / len(v)
        r = out[vid]
        assert r["q"] == [int(x) for x in q]
        assert abs(r["scale"] - scale) < 1e-15
        assert abs(r["mse"] - mse) < 1e-12
        # codes are always representable in a signed byte
        assert all(abs(c) <= 127 for c in r["q"])


def test_quantize_reconstruction_error_is_small(spark):
    e = spark.createDataFrame(
        [(i, [((i * 31 + j * 7) % 200 - 100) / 50.0 for j in range(16)]) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    from cernan_spark.operators.similarity import quantize_int8

    rows = quantize_int8(e).select("vec_id", "mse", "scale").collect()
    for r in rows:
        # quantization noise bound: step^2/4 per component on average
        assert r["mse"] <= (r["scale"] ** 2) / 4 + 1e-12


# ---------------------------------------------------------------------------
# CDC upsert compaction
# ---------------------------------------------------------------------------


def _ts(i):
    return datetime(2024, 1, 1, 0, 0, i, tzinfo=timezone.utc)


def test_cdc_last_writer_wins_and_tombstones(spark):
    from cernan_spark.operators.temporal import cdc_upsert_snapshot

    changes = spark.createDataFrame(
        [
            (1, 10, _ts(1), 1.0, "U"),
            (1, 11, _ts(2), 2.0, "U"),   # key 1 ends at value 2.0
            (2, 20, _ts(1), 5.0, "U"),
            (2, 21, _ts(3), 0.0, "D"),   # key 2 tombstoned
            (3, 30, _ts(5), 7.0, "D"),
            (3, 31, _ts(6), 8.0, "U"),   # delete then re-insert → alive
            (4, 40, _ts(4), 4.0, "U"),
            (4, 41, _ts(4), 9.0, "U"),   # ts tie → higher event_id wins
        ],
        "user_id long, event_id long, ts timestamp, value double, op string",
    )
    snap = {
        r["user_id"]: (r["event_id"], r["value"], r["n_changes"])
        for r in cdc_upsert_snapshot(
            changes, key_cols=["user_id"], order_cols=["ts", "event_id"]
        ).collect()
    }
    assert snap == {1: (11, 2.0, 2), 3: (31, 8.0, 2), 4: (41, 9.0, 2)}
    assert 2 not in snap


def test_alpha_mix_hand_model(spark):
    """4 vs 16 docs: sqrt weights 2 and 4, so the smoothed shares are
    exactly 1/3 and 2/3 — the low-resource language is boosted 5/3x,
    the head damped 5/6x, and the 1000-doc budget splits 333/666."""
    from cernan_spark.operators.textstats import alpha_mix_weights

    rows = [(i, "lo") for i in range(4)] + [(100 + i, "hi") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r["lang"]: r for r in alpha_mix_weights(df, budget_docs=1000).collect()}
    assert got["lo"]["n_docs"] == 4 and got["hi"]["n_docs"] == 16
    assert got["lo"]["share_raw"] == 0.2 and got["hi"]["share_raw"] == 0.8
    assert got["lo"]["share_alpha"] == 1 / 3 and got["hi"]["share_alpha"] == 2 / 3
    assert abs(got["lo"]["boost"] - 5 / 3) < 1e-15
    assert abs(got["hi"]["boost"] - 5 / 6) < 1e-15
    assert got["lo"]["alloc_docs"] == 333 and got["hi"]["alloc_docs"] == 666


def test_fim_transform_reconstructs_and_modes(spark):
    """Every eligible example reassembles to the original text when the
    sentinel-delimited pieces are reordered; short docs pass through as
    mode 'plain'; cut points stay inside the document."""
    from cernan_spark.operators.corpus import FIM_MIN_CHARS, fim_transform

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = fim_transform(docs).collect()
    assert len(out) == len(orig)
    modes = {r["mode"] for r in out}
    for r in out:
        text = orig[r["doc_id"]]
        if r["mode"] == "plain":
            assert len(text) < FIM_MIN_CHARS and r["fim_text"] == text
            continue
        if r["mode"] == "psm":
            body = r["fim_text"].removeprefix("<PRE>")
            prefix, rest = body.split("<SUF>", 1)
            suffix, middle = rest.split("<MID>", 1)
        else:
            body = r["fim_text"].removeprefix("<SUF>")
            suffix, rest = body.split("<PRE>", 1)
            prefix, middle = rest.split("<MID>", 1)
        assert prefix + middle + suffix == text
        assert len(prefix) == r["prefix_len"]
        assert len(middle) == r["middle_len"]
        assert 1 <= r["prefix_len"] <= len(text) // 3 + 1
        assert 1 <= r["middle_len"] <= len(text) // 3 + 1
    assert {"psm", "spm"} <= modes


def test_epoch_shuffle_distinct_and_reproducible(spark):
    """Each epoch is a k-head of a DIFFERENT permutation; re-running
    yields the identical schedule (stateless hash, no RNG)."""
    from cernan_spark.operators.corpus import epoch_shuffle_heads

    d = spark.range(500).select(F.col("id").alias("doc_id"))
    out1 = {
        (r["epoch"], r["pos"]): r["doc_id"]
        for r in epoch_shuffle_heads(d, n_epochs=3, k=15).collect()
    }
    out2 = {
        (r["epoch"], r["pos"]): r["doc_id"]
        for r in epoch_shuffle_heads(d, n_epochs=3, k=15).collect()
    }
    assert out1 == out2
    assert len(out1) == 45
    orders = [
        tuple(out1[(e, p)] for p in range(1, 16)) for e in range(3)
    ]
    assert len(set(orders)) == 3  # three genuinely different permutations


def test_ndcg_hand_model(spark):
    """Perfect ranking -> nDCG 1; swapping the top two graded docs drops
    DCG by exactly (3-1)*(1/ln2 - 1/ln3)."""
    import math

    from cernan_spark.operators.corpus import ndcg_at_k

    perfect = spark.createDataFrame(
        [(1, 30.0, 3), (2, 20.0, 2), (3, 10.0, 1)],
        "doc_id long, bm25r double, rel long",
    )
    r = ndcg_at_k(perfect, k=3).collect()[0]
    assert r["ndcg"] == 1.0 and r["n_ranked"] == 3
    ideal_dcg = 3 / math.log(2) + 2 / math.log(3) + 1 / math.log(4)
    assert abs(r["dcg"] - round(ideal_dcg, 6)) < 1e-9

    swapped = spark.createDataFrame(
        [(1, 20.0, 3), (2, 30.0, 2), (3, 10.0, 1)],
        "doc_id long, bm25r double, rel long",
    )
    r2 = ndcg_at_k(swapped, k=3).collect()[0]
    want_dcg = 2 / math.log(2) + 3 / math.log(3) + 1 / math.log(4)
    assert abs(r2["dcg"] - round(want_dcg, 6)) < 1e-9
    assert r2["idcg"] == r["idcg"] and r2["ndcg"] < 1.0


def test_negative_sampling_smoothing_direction(spark):
    """count^0.75 boosts rare tokens (>1) and damps frequent ones (<1);
    weights equal the exact nested-sqrt arithmetic; alloc sums <= draws."""
    import math

    from cernan_spark.operators.corpus import negative_sampling_weights

    text = " ".join(["common"] * 81 + ["rare"] * 16)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["tok"]: r for r in negative_sampling_weights(df).collect()}
    w_c, w_r = math.sqrt(81 * math.sqrt(81)), math.sqrt(16 * math.sqrt(16))
    tot = w_c + w_r
    assert got["common"]["share_smooth"] == w_c / tot
    assert got["rare"]["share_smooth"] == w_r / tot
    assert got["common"]["boost"] < 1 < got["rare"]["boost"]
    assert (
        got["common"]["alloc_draws"] + got["rare"]["alloc_draws"] <= 10_000
    )


def test_distinctive_terms_seeded_marker_wins(spark):
    """A token appearing ONLY in the target slice tops the z ranking;
    a token appearing only in the rest lands most-negative."""
    from cernan_spark.operators.corpus import distinctive_terms

    rows = [(1, "a", "common words here targetonly"),
            (2, "a", "common words here targetonly"),
            (3, "b", "common words here restonly"),
            (4, "b", "common words here restonly")]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    out = distinctive_terms(df, "split", "a", top_k=10).collect()
    assert out[0]["tok"] in ("targetonly", "restonly")
    by = {r["tok"]: r for r in out}
    assert by["targetonly"]["z"] > 0 > by["restonly"]["z"]
    assert by["targetonly"]["n_target"] == 2 and by["targetonly"]["n_rest"] == 0
    # shared tokens score near zero, strictly between the two extremes
    assert abs(by["common"]["z"]) < by["targetonly"]["z"]


def test_good_turing_hand_model(spark):
    """Known spectrum: types with counts {1,1,1,2,2,3}: N_1=3, N_2=2,
    N_3=1, N=10; r*(1)=2*2/3, r*(2)=3*1/2, r*(3) NULL (N_4=0);
    p_unseen=3/10."""
    from pyspark.sql import functions as F

    from cernan_spark.operators.corpus import good_turing_spectrum

    df = spark.createDataFrame(
        [("a b c d d e e e",), ("f f",)], "text string"
    )
    # counts: a1 b1 c1 d2 e3 f2 → N1=3, N2=2, N3=1, N=10
    out = {r["r"]: r for r in good_turing_spectrum(df).collect()}
    assert out[1]["n_r"] == 3 and out[2]["n_r"] == 2 and out[3]["n_r"] == 1
    assert out[1]["r_star"] == round(2 * 2 / 3, 6)
    assert out[2]["r_star"] == round(3 * 1 / 2, 6)
    assert out[3]["r_star"] is None
    assert all(r["p_unseen"] == 0.3 for r in out.values())


def test_good_turing_spectrum_gap_is_null_not_borrowed(spark):
    """A gap in the spectrum (no type with count r+1) must yield NULL
    r*, not borrow the next populated class."""
    from cernan_spark.operators.corpus import good_turing_spectrum

    # counts: a:1, b:3  → N_1=1, N_3=1, N_2 missing
    df = spark.createDataFrame([("a b b b",)], "text string")
    out = {r["r"]: r for r in good_turing_spectrum(df).collect()}
    assert out[1]["r_star"] is None  # N_2 = 0, nothing borrowed from N_3
    assert out[3]["r_star"] is None


def test_good_turing_doc_scoped_types(spark):
    """type_cols=['doc_id'] counts within documents: the same token in
    two docs is two types."""
    from cernan_spark.operators.corpus import good_turing_spectrum

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z")], "doc_id long, text string"
    )
    # per-doc counts: (1,x)=2 (1,y)=1 (2,x)=1 (2,z)=1 → N1=3, N2=1
    out = {
        r["r"]: r
        for r in good_turing_spectrum(
            df, type_cols=["doc_id"]
        ).collect()
    }
    assert out[1]["n_r"] == 3 and out[2]["n_r"] == 1
    assert out[1]["r_star"] == round(2 * 1 / 3, 6)
    assert all(r["p_unseen"] == 0.6 for r in out.values())


def test_phrase_search_overlaps_and_multiword(spark):
    """'ha ha ha ha' contains the phrase 'ha ha' three times
    (overlap-counting) and 'ha ha ha' twice; a three-token phrase only
    matches true runs."""
    from cernan_spark.operators.corpus import phrase_search

    df = spark.createDataFrame(
        [
            (1, "ha ha ha ha"),
            (2, "ha x ha ha"),
            (3, "no match here ha"),
            (4, "a ha ha trailer"),
        ],
        "doc_id long, text string",
    )
    two = {r["doc"]: r for r in phrase_search(df, ["ha", "ha"]).collect()}
    assert two[1]["n_occurrences"] == 3 and two[1]["first_pos"] == 0
    assert two[2]["n_occurrences"] == 1 and two[2]["first_pos"] == 2
    assert two[4]["n_occurrences"] == 1 and two[4]["first_pos"] == 1
    assert 3 not in two
    three = {
        r["doc"]: r for r in phrase_search(df, ["ha", "ha", "ha"]).collect()
    }
    assert three[1]["n_occurrences"] == 2
    assert set(three) == {1}


def test_retrieval_metrics_hand_model(spark):
    """Two queries with known rankings: q1's first relevant doc at rank
    2 with 2/3 of its relevant docs in top-2; q2 has none relevant →
    rr 0, recall 0; means are exact."""
    from cernan_spark.operators.corpus import retrieval_metrics

    rows = [
        # query 1: ranks by (score desc, doc): d9(.9,rel0) d5(.8,rel1)
        # d7(.7,rel1) d1(.1,rel1)
        (1, 9, 0.9, 0), (1, 5, 0.8, 1), (1, 7, 0.7, 1), (1, 1, 0.1, 1),
        # query 2: no relevant docs at all
        (2, 3, 0.5, 0), (2, 4, 0.4, 0),
    ]
    df = spark.createDataFrame(
        rows, "query_id int, doc_id long, score double, rel int"
    )
    got = retrieval_metrics(df, k=2).first()
    assert got["n_queries"] == 2
    assert got["mrr"] == round((1 / 2 + 0.0) / 2, 6)
    assert got["mean_recall_at_k"] == round((1 / 3 + 0.0) / 2, 6)


def test_retrieval_metrics_tie_break_is_doc_id(spark):
    """Equal scores rank by doc_id ascending — the pinned tie rule."""
    from cernan_spark.operators.corpus import retrieval_metrics

    rows = [(1, 10, 0.5, 1), (1, 2, 0.5, 0)]  # tie: doc 2 ranks first
    df = spark.createDataFrame(
        rows, "query_id int, doc_id long, score double, rel int"
    )
    got = retrieval_metrics(df, k=1).first()
    assert got["mrr"] == 0.5  # relevant doc 10 is rank 2
    assert got["mean_recall_at_k"] == 0.0
