"""Fifth-session operators: Jensen–Shannon token-distribution drift and
distinct-n diversity (operators/corpus.py), quality-argmax cluster
representative selection (operators/dedup.py). Python-model equivalence,
same strategy as the reference's quickcheck suites (SURVEY.md §5)."""

from __future__ import annotations

import math
from collections import Counter

from cernan_spark.operators.corpus import (
    distinct_ngram_profile,
    js_divergence_drift,
)
from cernan_spark.operators.dedup import cluster_representatives, dedup_groups

# ---------------------------------------------------------------------------
# JS divergence
# ---------------------------------------------------------------------------


def _py_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % ((1 << 31) - 1)
    return h


def _bucket(doc_id: int) -> int:
    return _py_hash(f"{doc_id}:split42") % 1000


def _py_jsd(corpus: dict[int, str]):
    """Brute-force model: JSD in nats between train/val token counts,
    folded in the same two-level pinned order as the operator."""
    tr = Counter(
        t for i, x in corpus.items() if _bucket(i) < 800 for t in x.split(" ")
    )
    va = Counter(
        t
        for i, x in corpus.items()
        if 800 <= _bucket(i) < 900
        for t in x.split(" ")
    )
    na, nb = sum(tr.values()), sum(va.values())
    vocab = sorted(set(tr) | set(va))
    buckets: dict[int, list[tuple[str, float]]] = {}
    for tok in vocab:
        a, b = tr[tok], va[tok]
        den = float(a) * float(nb) + float(b) * float(na)
        t = 0.0
        if a > 0:
            t += 0.5 * (a / na) * math.log(2.0 * a * nb / den)
        if b > 0:
            t += 0.5 * (b / nb) * math.log(2.0 * b * na / den)
        buckets.setdefault(_py_hash(tok) % 64, []).append((tok, t))
    parts = []
    for bk in sorted(buckets):
        p = 0.0
        for _, t in sorted(buckets[bk]):
            p += t
        parts.append(p)
    total = 0.0
    for p in parts:
        total += p
    return len(vocab), na, nb, round(total, 6)


def test_jsd_matches_python_model(spark):
    corpus = {
        i: " ".join(
            ["alpha", "beta", "gamma", "delta"][j % 4]
            for j in range(i % 7 + 2)
        )
        + (" valonly" if 800 <= _bucket(i) < 900 else " trainish")
        for i in range(120)
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    r = js_divergence_drift(df).collect()[0]
    vocab, na, nb, jsd = _py_jsd(corpus)
    assert (
        r["vocab_union"],
        r["n_train_tokens"],
        r["n_val_tokens"],
    ) == (vocab, na, nb)
    assert abs(r["jsd_nats"] - jsd) < 1e-9


def test_jsd_identical_distributions_is_zero(spark):
    # same text in every doc -> train and val distributions identical
    docs = [(i, "same words every time") for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = js_divergence_drift(df).collect()[0]
    assert r["jsd_nats"] == 0.0


def test_jsd_disjoint_vocab_is_ln2(spark):
    # fully disjoint vocabularies -> JSD = ln 2 (its maximum)
    docs = [
        (i, "onlytrain" if _bucket(i) < 800 else "onlyval")
        for i in range(400)
        if _bucket(i) < 900
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = js_divergence_drift(df).collect()[0]
    assert abs(r["jsd_nats"] - round(math.log(2.0), 6)) < 1e-6


# ---------------------------------------------------------------------------
# distinct-n diversity
# ---------------------------------------------------------------------------


def test_distinct_ngrams_matches_python_model(spark):
    docs = [
        (0, "a b a b a", "en"),
        (1, "a b c d e", "en"),
        (2, "x x x x", "fr"),
        (3, "y", "fr"),  # too short for n=2,3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        (r["lang"], r["n"]): (
            r["total_ngrams"],
            r["distinct_ngrams"],
            r["distinct_ratio"],
        )
        for r in distinct_ngram_profile(df).collect()
    }
    want = {}
    for lang in ("en", "fr"):
        texts = [t for _, t, lg in docs if lg == lang]
        for n in (1, 2, 3):
            grams = [
                " ".join(toks[i : i + n])
                for t in texts
                for toks in [t.split(" ")]
                for i in range(len(toks) - n + 1)
            ]
            if grams:
                want[(lang, n)] = (
                    len(grams),
                    len(set(grams)),
                    round(len(set(grams)) / len(grams), 6),
                )
    assert got == want
    # fr has no trigram from doc 3, but doc 2 yields 'x x x' twice -> 1 distinct
    assert got[("fr", 3)] == (2, 1, 0.5)


# ---------------------------------------------------------------------------
# cluster representative selection
# ---------------------------------------------------------------------------


def test_cluster_reps_argmax_quality_tie_min_id(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(1, 40), (2, 90), (3, 90), (10, 5), (11, 5), (99, 777)],
        "doc_id long, n_chars long",
    )
    labels = dedup_groups(pairs)
    out = {
        r["doc_id"]: (
            r["canonical_id"],
            r["rep_id"],
            r["n_members"],
            r["is_rep"],
            r["rep_quality"],
        )
        for r in cluster_representatives(labels, docs).collect()
    }
    # cluster {1,2,3}: max quality 90 tied between 2 and 3 -> min id 2 wins
    assert out[1] == (1, 2, 3, 0, 90)
    assert out[2] == (1, 2, 3, 1, 90)
    assert out[3] == (1, 2, 3, 0, 90)
    # cluster {10,11}: tie at 5 -> 10
    assert out[10] == (10, 10, 2, 1, 5)
    assert out[11] == (10, 10, 2, 0, 5)
    # unclustered doc 99 never appears
    assert 99 not in out


def test_jsd_top_drifters_ranking_and_direction(spark):
    from cernan_spark.operators.corpus import jsd_top_drifters

    # 'valburst' appears ONLY in val docs, 'common' everywhere
    corpus = {
        i: ("common common valburst" if 800 <= _bucket(i) < 900
            else "common common steady")
        for i in range(300)
        if _bucket(i) < 900
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    rows = jsd_top_drifters(df, k=3).collect()
    # model: per-token JS terms
    tr = Counter(
        t for i, x in corpus.items() if _bucket(i) < 800 for t in x.split(" ")
    )
    va = Counter(
        t
        for i, x in corpus.items()
        if 800 <= _bucket(i) < 900
        for t in x.split(" ")
    )
    na, nb = sum(tr.values()), sum(va.values())
    terms = {}
    for tok in set(tr) | set(va):
        a, b = tr[tok], va[tok]
        den = float(a) * nb + float(b) * na
        t = 0.0
        if a > 0:
            t += 0.5 * (a / na) * math.log(2.0 * a * nb / den)
        if b > 0:
            t += 0.5 * (b / nb) * math.log(2.0 * b * na / den)
        terms[tok] = t
    want = sorted(terms, key=lambda k_: (-terms[k_], k_))[:3]
    assert [r["tok"] for r in rows] == want
    by_tok = {r["tok"]: r for r in rows}
    assert by_tok["valburst"]["over_in"] == "val"
    assert by_tok["valburst"]["train_count"] == 0
    assert by_tok["steady"]["over_in"] == "train"
    for r in rows:
        assert abs(r["jsd_term"] - round(terms[r["tok"]], 6)) < 1e-9
        assert r["jsd_term"] >= 0.0  # log-sum inequality, per token


# ---------------------------------------------------------------------------
# decontamination span localization + rebuild
# ---------------------------------------------------------------------------


def test_decontam_spans_cuts_exactly_the_leak(spark):
    from cernan_spark.operators.textstats import decontam_token_spans

    bench_text = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    clean_part = " ".join(f"w{j}" for j in range(12))
    docs = [
        # doc 0: clean prefix + the full 10-token benchmark leak
        (0, f"{clean_part} {bench_text}"),
        # doc 1: no contamination
        (1, "totally unrelated words only here nothing shared at all ok"),
        # doc 2: leak in the MIDDLE
        (2, f"pre1 pre2 {bench_text} post1 post2"),
    ]
    training = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame([(99, bench_text)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in decontam_token_spans(training, bench, n=8).collect()
    }
    # only contaminated docs emitted
    assert set(out) == {0, 2}
    # doc 0: positions 13..22 contaminated (3 shingle hits merge to one span)
    r0 = out[0]
    assert r0["n_spans"] == 1 and r0["n_tokens_removed"] == 10
    assert r0["clean_text"] == clean_part
    assert r0["n_tokens_clean"] == 12
    # doc 2: middle span cut, prefix and suffix survive in order
    r2 = out[2]
    assert r2["clean_text"] == "pre1 pre2 post1 post2"
    assert r2["n_spans"] == 1 and r2["n_tokens_removed"] == 10


def test_decontam_spans_whole_doc_leak_empties_text(spark):
    from cernan_spark.operators.textstats import decontam_token_spans

    t = "s1 s2 s3 s4 s5 s6 s7 s8"
    training = spark.createDataFrame([(0, t)], "doc_id long, text string")
    bench = spark.createDataFrame([(9, t)], "doc_id long, text string")
    r = decontam_token_spans(training, bench, n=8).collect()[0]
    assert r["clean_text"] == "" and r["n_tokens_clean"] == 0
    assert r["n_tokens_removed"] == 8 and r["n_spans"] == 1


# ---------------------------------------------------------------------------
# kNN label propagation
# ---------------------------------------------------------------------------


def test_knn_label_propagate_majority_and_tiebreaks(spark):
    from cernan_spark.operators.similarity import knn_label_propagate

    # axis-aligned 4-dim vectors: cosine ordering is hand-checkable
    seeds = [
        (10, [1.0, 0.0, 0.0, 0.0], 1),
        (11, [0.9, 0.1, 0.0, 0.0], 1),
        (12, [0.0, 1.0, 0.0, 0.0], 2),
        (13, [0.0, 0.0, 1.0, 0.0], 3),
    ]
    others = [
        # nearest 3 seeds: 10, 11 (label 1 x2), 12 -> majority 1
        (0, [1.0, 0.2, 0.0, 0.0], 9),
        # equidistant from labels 1,2,3 one vote each -> tie -> min label 1
        (1, [0.0, 0.0, 0.0, 1.0], 9),
    ]
    sdf = spark.createDataFrame(
        seeds, "vec_id long, embedding array<float>, label int"
    )
    odf = spark.createDataFrame(
        others, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["vec_id"]: (r["pred_label"], r["n_votes"])
        for r in knn_label_propagate(sdf, odf, k=3).collect()
    }
    assert out[0] == (1, 2)
    # probe 1 is orthogonal to every seed: all cos = 0, top-3 by sid =
    # seeds 10, 11, 12 -> label 1 has 2 votes
    assert out[1] == (1, 2)


# ---------------------------------------------------------------------------
# curriculum deciles + containment
# ---------------------------------------------------------------------------


def test_length_deciles_value_based_tiles(spark):
    from cernan_spark.operators.corpus import length_deciles

    # 10 docs, lengths 1..10 -> tile k = value k exactly
    docs = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, n_chars long")
    out = {r["doc_id"]: r["tile"] for r in length_deciles(df).collect()}
    assert out == {i: i + 1 for i in range(10)}


def test_length_deciles_equal_values_share_tile(spark):
    from cernan_spark.operators.corpus import length_deciles

    # all equal -> every doc lands in tile 10 (cum*10 >= k*N for all k
    # only at the single value, which is the boundary of every tile;
    # min matching k = 1? No: boundary_k = that value for ALL k, and a
    # doc <= boundary_1 takes tile 1) -- equal values share ONE tile.
    docs = [(i, 7) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, n_chars long")
    tiles = {r["tile"] for r in length_deciles(df).collect()}
    assert tiles == {1}


def test_containment_finds_embedded_fragment_jaccard_misses(spark):
    from cernan_spark.operators.dedup import containment_pairs

    long_toks = [f"w{j}" for j in range(40)]
    frag = " ".join(long_toks[5:17])  # 12 tokens embedded verbatim
    docs = [
        (0, " ".join(long_toks)),
        (1, frag),
        (2, " ".join(f"z{j}" for j in range(40))),  # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = containment_pairs(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert r["containment"] == 1.0  # every fragment shingle is in the base
    assert r["jaccard"] < 0.2  # symmetric resemblance would miss it
    assert r["n_shared"] == 12 - 8 + 1 and r["size_b"] == 5


# ---------------------------------------------------------------------------
# char entropy + vocab OOV
# ---------------------------------------------------------------------------


def test_char_entropy_known_values(spark):
    from cernan_spark.operators.textstats import char_entropy

    docs = [
        (0, "aaaa"),          # single symbol -> H = 0
        (1, "abab"),          # uniform 2 symbols -> H = ln 2
        (2, "abcd"),          # uniform 4 symbols -> H = ln 4
        (3, ""),              # empty -> defined as 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[0]["char_entropy"] == 0.0
    assert abs(out[1]["char_entropy"] - round(math.log(2), 6)) < 1e-9
    assert abs(out[2]["char_entropy"] - round(math.log(4), 6)) < 1e-9
    # split('', '') yields [''] in BOTH engines (Spark and DuckDB agree),
    # so the empty doc reports one "distinct char" and entropy 0
    assert out[3]["char_entropy"] == 0.0 and out[3]["distinct_chars"] == 1
    # gibberish (all-distinct) strictly above repetitive natural-ish text
    assert out[2]["char_entropy"] > out[1]["char_entropy"]


def test_vocab_oov_rate_matches_python_model(spark):
    from cernan_spark.operators.corpus import vocab_oov_rate

    corpus = {
        i: ("common common rare" + str(i % 4) if _bucket(i) < 800
            else "common oovword" + str(i))
        for i in range(80)
        if _bucket(i) < 900
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["split"], r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in vocab_oov_rate(df, top_v=3).collect()
    }
    tr = Counter(
        t for i, x in corpus.items() if _bucket(i) < 800 for t in x.split(" ")
    )
    vocab = set(
        sorted(tr, key=lambda k_: (-tr[k_], k_))[:3]
    )
    for i, text in corpus.items():
        toks = text.split(" ")
        oov = sum(1 for t in toks if t not in vocab)
        split = "train" if _bucket(i) < 800 else "val"
        assert out[i] == (split, len(toks), oov, round(oov / len(toks), 6))
    # every val doc carries its unique oovword
    assert all(out[i][2] >= 1 for i in corpus if 800 <= _bucket(i) < 900)


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from cernan_spark.operators.corpus import psi_length_drift

    # same length everywhere -> one bin, p = q = 1 -> PSI exactly 0
    docs = [(i, 50) for i in range(400) if _bucket(i) < 900]
    df = spark.createDataFrame(docs, "doc_id long, n_chars long")
    r = psi_length_drift(df).collect()[0]
    assert r["psi"] == 0.0 and r["n_zero_bins"] == 0


def test_psi_detects_shift_and_counts_zero_bins(spark):
    from cernan_spark.operators.corpus import psi_length_drift

    # train lengths 1..100 cycling; val ALL at length 1000 (beyond every
    # train boundary -> clamps into the last bin) -> strong shift
    docs = [
        (i, (i % 100) + 1 if _bucket(i) < 800 else 1000)
        for i in range(600)
        if _bucket(i) < 900
    ]
    df = spark.createDataFrame(docs, "doc_id long, n_chars long")
    r = psi_length_drift(df).collect()[0]
    # every bin but the last has b=0 (excluded+counted); the last bin has
    # a small p and q=1 -> a large positive PSI contribution
    assert r["n_zero_bins"] == r["n_bins"] - 1
    assert r["psi"] > 0.25  # the standard "significant shift" bar
