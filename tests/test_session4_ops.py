"""Fourth-session operators: exact duplicated-substring spans
(operators/dedup.py), chat-template rendering with loss-mask spans
(operators/conversation.py), held-out bigram-LM scoring
(operators/corpus.py). Python-model equivalence throughout, same
strategy as the reference's quickcheck suites (SURVEY.md §5)."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime, timezone

from cernan_spark.operators.conversation import render_chat_template
from cernan_spark.operators.corpus import bigram_logprob_holdout
from cernan_spark.operators.dedup import exact_substr_spans

# ---------------------------------------------------------------------------
# exact duplicated-substring spans
# ---------------------------------------------------------------------------

L = 8  # small gram for hand-checkable fixtures


def _py_spans(docs: list[tuple[int, str]], gram_len: int, min_docs: int = 2):
    """Brute-force model of exact_substr_spans."""
    occs: dict[str, set[int]] = {}
    for did, text in docs:
        for p in range(len(text) - gram_len + 1):
            occs.setdefault(text[p : p + gram_len], set()).add(did)
    out = {}
    for did, text in docs:
        pos = [
            p + 1  # operator positions are 1-based
            for p in range(len(text) - gram_len + 1)
            if len(occs[text[p : p + gram_len]]) >= min_docs
        ]
        if not pos:
            continue
        spans = []
        start = prev = pos[0]
        grams = 1
        for p in pos[1:]:
            if p - prev > gram_len:
                spans.append((start, prev + gram_len - 1, grams))
                start, grams = p, 0
            prev = p
            grams += 1
        spans.append((start, prev + gram_len - 1, grams))
        out[did] = (
            len(spans),
            sum(e - s + 1 for s, e, _ in spans),
            max(e - s + 1 for s, e, _ in spans),
            sum(g for _, _, g in spans),
        )
    return out


def _run_spans(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (
            r["n_spans"],
            r["dup_chars"],
            r["longest_span"],
            r["n_dup_grams"],
        )
        for r in exact_substr_spans(df, gram_len=L).collect()
    }


def test_exact_substr_matches_python_model(spark):
    docs = [
        (0, "xxSHARED-BOILERPLATE-SPANxx unique tail zero"),
        (1, "pre SHARED-BOILERPLATE-SPAN and other words"),
        (2, "completely different text with no overlap!"),
        (3, "pre SHARED-BOILERPLATE-SPAN plus more junk"),
    ]
    got = _run_spans(spark, docs)
    want = _py_spans(docs, L)
    assert got == want
    assert 2 not in got  # the no-overlap doc yields no row
    assert set(got) == {0, 1, 3}


def test_exact_substr_within_doc_repeat_does_not_count(spark):
    # the 8-gram 'ABCDEFGH' repeats twice inside doc 0 only
    docs = [(0, "ABCDEFGH..ABCDEFGH"), (1, "nothing in common here")]
    assert _run_spans(spark, docs) == {}


def test_exact_substr_overlapping_grams_merge_to_one_span(spark):
    # a 12-char shared run yields 5 overlapping 8-grams -> ONE span of 12
    shared = "SAMESAMESAME"
    docs = [(0, f"aa{shared}bb"), (1, f"zz{shared}yy")]
    got = _run_spans(spark, docs)
    assert got == _py_spans(docs, L)
    n_spans, dup_chars, longest, grams = got[0]
    assert n_spans == 1 and longest >= len(shared)


def test_exact_substr_short_docs_yield_no_grams(spark):
    docs = [(0, "tiny"), (1, "tiny"), (2, "also-short")]
    # both 'tiny' docs are < gram_len: no grams, no rows, no crash
    assert _run_spans(spark, docs) == {}


# ---------------------------------------------------------------------------
# chat-template render + loss-mask spans
# ---------------------------------------------------------------------------


def _ts(i):
    return datetime(2026, 1, 1, 0, 0, i, tzinfo=timezone.utc)


def _conv(spark, turns):
    rows = [
        ("conv-0", i, role, text, "none", _ts(i))
        for i, (role, text) in enumerate(turns)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def test_chat_render_golden(spark):
    t = _conv(
        spark,
        [("user", "hi"), ("assistant", "hello!"), ("user", "bye"),
         ("assistant", "ok")],
    )
    r = render_chat_template(t).collect()[0]
    want = "<|user|>\nhi\n<|assistant|>\nhello!\n<|user|>\nbye\n<|assistant|>\nok\n"
    assert r["rendered"] == want
    assert r["n_turns"] == 4 and r["n_chars"] == len(want)
    assert r["n_mask_spans"] == 2 and r["mask_chars"] == len("hello!") + len("ok")
    # every mask span must slice exactly the assistant text out of rendered
    spans = [tuple(map(int, s.split(":"))) for s in r["mask_spans"].split(",")]
    assert [want[a:b] for a, b in spans] == ["hello!", "ok"]


def test_chat_render_no_assistant_turns(spark):
    t = _conv(spark, [("user", "a"), ("system", "b")])
    r = render_chat_template(t).collect()[0]
    assert r["n_mask_spans"] == 0 and r["mask_chars"] == 0
    assert r["mask_spans"] == ""


def test_chat_render_order_is_turn_idx_not_input_order(spark):
    rows = [
        ("c", 1, "assistant", "second", "none", _ts(1)),
        ("c", 0, "user", "first", "none", _ts(0)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    ).repartition(4)
    r = render_chat_template(t).collect()[0]
    assert r["rendered"] == "<|user|>\nfirst\n<|assistant|>\nsecond\n"


# ---------------------------------------------------------------------------
# held-out bigram LM
# ---------------------------------------------------------------------------


def _py_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % ((1 << 31) - 1)
    return h


def _bucket(doc_id: int) -> int:
    return _py_hash(f"{doc_id}:split42") % 1000


def test_bigram_logprob_matches_python_model_and_backoff_fires(spark):
    # pick ids landing in train (<800) and val (800..899) deterministically
    train_ids = [i for i in range(200) if _bucket(i) < 800][:4]
    val_ids = [i for i in range(200) if 800 <= _bucket(i) < 900][:2]
    assert len(train_ids) == 4 and len(val_ids) == 2
    corpus = {
        train_ids[0]: "the cat sat on the mat",
        train_ids[1]: "the dog sat on the rug",
        train_ids[2]: "a cat and a dog",
        train_ids[3]: "the mat and the rug",
        # val doc 1: all bigrams seen in train; val doc 2: 'cat flew' and
        # 'flew home' unseen (backoff), 'flew' itself unseen (unigram floor)
        val_ids[0]: "the cat sat on the rug",
        val_ids[1]: "the cat flew home",
    }
    docs = [(i, t) for i, t in corpus.items()]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_scored"], r["logprob"], r["avg_logprob"])
        for r in bigram_logprob_holdout(df).collect()
    }
    assert set(out) == set(val_ids)

    train_toks = [corpus[i].split(" ") for i in train_ids]
    uni = Counter(t for toks in train_toks for t in toks)
    big = Counter(
        (toks[i - 1], toks[i]) for toks in train_toks for i in range(1, len(toks))
    )
    n_train = sum(uni.values())
    backoff_used = 0
    for vid in val_ids:
        toks = corpus[vid].split(" ")
        lps = []
        for i in range(1, len(toks)):
            x, y = toks[i - 1], toks[i]
            if big[(x, y)]:
                lps.append(math.log(big[(x, y)]) - math.log(uni[x]))
            else:
                backoff_used += 1
                lp = (math.log(2.0) - math.log(5.0)) + (
                    math.log(uni[y]) if uni[y] else 0.0
                ) - math.log(n_train)
                lps.append(lp)
        lp_sum = 0.0
        for v in lps:  # ascending-pos fold, same as the operator
            lp_sum += v
        got = out[vid]
        assert got[0] == len(toks) - 1
        assert abs(got[1] - lp_sum) < 1e-6
        assert abs(got[2] - lp_sum / (len(toks) - 1)) < 1e-6
    assert backoff_used >= 2  # the held-out construction exercises backoff
    # the all-seen val doc scores higher per token than the unseen one
    assert out[val_ids[0]][2] > out[val_ids[1]][2]


# ---------------------------------------------------------------------------
# exact duplicated-substring REMOVAL (rebuild)
# ---------------------------------------------------------------------------

from cernan_spark.operators.dedup import exact_substr_remove


def _py_remove(docs, gram_len, min_docs=2):
    """Brute-force model: excise every duplicated merged span, rebuild."""
    occs: dict[str, set[int]] = {}
    for did, text in docs:
        for p in range(len(text) - gram_len + 1):
            occs.setdefault(text[p : p + gram_len], set()).add(did)
    out = {}
    for did, text in docs:
        pos = [
            p + 1
            for p in range(len(text) - gram_len + 1)
            if len(occs[text[p : p + gram_len]]) >= min_docs
        ]
        if not pos:
            out[did] = (text, 0, 0, len(text))
            continue
        spans = []
        start = prev = pos[0]
        for p in pos[1:]:
            if p - prev > gram_len:
                spans.append((start, prev + gram_len - 1))
                start = p
            prev = p
        spans.append((start, prev + gram_len - 1))
        clean, prev_e = "", 0
        for s, e in spans:
            clean += text[prev_e : s - 1]  # 1-based spans
            prev_e = e
        clean += text[prev_e:]
        removed = sum(e - s + 1 for s, e in spans)
        out[did] = (clean, len(spans), removed, len(clean))
    return out


def _run_remove(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (
            r["clean_text"],
            r["n_spans"],
            r["n_chars_removed"],
            r["n_chars_clean"],
        )
        for r in exact_substr_remove(df, gram_len=L).collect()
    }


def test_exact_substr_remove_matches_python_model(spark):
    docs = [
        (0, "xxSHARED-BOILERPLATE-SPANxx unique tail zero"),
        (1, "pre SHARED-BOILERPLATE-SPAN and other words"),
        (2, "completely different text with no overlap!"),
        (3, "pre SHARED-BOILERPLATE-SPAN plus more junk"),
        (4, "ab"),  # shorter than the gram — passes through untouched
    ]
    got = _run_remove(spark, docs)
    want = _py_remove(docs, L)
    assert got == want
    # the untouched docs are byte-identical
    assert got[2][0] == docs[2][1] and got[2][1:] == (0, 0, len(docs[2][1]))
    assert got[4][0] == "ab"
    # removal really removed the shared run from a carrier
    assert "SHARED-B" not in got[1][0] and got[1][2] > 0


def test_exact_substr_remove_whole_doc_duplicated(spark):
    # doc 0 and 1 identical: every position is duplicated -> ONE span
    # covering the whole doc, clean text empty
    t = "ENTIRELY-DUPLICATED-DOCUMENT!"
    docs = [(0, t), (1, t), (2, "some other unrelated words here")]
    got = _run_remove(spark, docs)
    assert got == _py_remove(docs, L)
    assert got[0] == ("", 1, len(t), 0) and got[1] == ("", 1, len(t), 0)


def test_exact_substr_remove_conserves_chars(spark):
    docs = [
        (0, "aaaa COMMON-CHUNK-ONE zzzz COMMON-CHUNK-TWO qq"),
        (1, "bbbb COMMON-CHUNK-ONE yyyy COMMON-CHUNK-TWO rr"),
    ]
    got = _run_remove(spark, docs)
    assert got == _py_remove(docs, L)
    for did, text in docs:
        clean, n_spans, removed, n_clean = got[did]
        assert n_clean + removed == len(text)
        assert n_spans >= 1


# ---------------------------------------------------------------------------
# SFT example packing (render -> bins + re-based mask spans)
# ---------------------------------------------------------------------------

from cernan_spark.operators.conversation import (
    pack_sft_examples,
    render_chat_template,
)


def test_pack_sft_spans_slice_assistant_text_from_packed_buffer(spark):
    rows = []
    for c in range(12):
        rows += [
            (f"conv-{c:03d}", 0, "user", f"question {c} ?", "none", _ts(0)),
            (f"conv-{c:03d}", 1, "assistant", f"answer {c}!" * (c % 3 + 1),
             "none", _ts(1)),
        ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    rendered = {
        r["conv_id"]: r["rendered"] for r in render_chat_template(t).collect()
    }
    out = pack_sft_examples(t, bin_chars=120, n_shards=4).collect()
    assert {r["conv_id"] for r in out} == set(rendered)
    # rebuild each bin's buffer by concatenating members at their offsets
    bins: dict[tuple, list] = {}
    for r in out:
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for members in bins.values():
        members.sort(key=lambda r: r["offset_in_bin"])
        buf, pos = "", 0
        for r in members:
            assert r["offset_in_bin"] == pos  # contiguous, no gaps
            buf += rendered[r["conv_id"]]
            pos += r["n_chars"]
        assert len(buf) <= 120 or len(members) == 1  # cap or oversize-single
        # every shifted span slices an assistant payload out of the buffer
        for r in members:
            if not r["mask_spans"]:
                continue
            for sp in r["mask_spans"].split(","):
                a, b = map(int, sp.split(":"))
                assert buf[a:b].startswith("answer")


def test_pack_sft_greedy_boundaries_match_model(spark):
    from cernan_spark.operators.packing import greedy_pack_model

    rows = []
    for c in range(9):
        rows.append((f"c{c}", 0, "assistant", "x" * (10 * c + 1), "none",
                     _ts(0)))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    out = {
        r["conv_id"]: r
        for r in pack_sft_examples(t, bin_chars=100, n_shards=1).collect()
    }
    # model replay: same order (conv_id asc within the single shard)
    order = sorted(out)
    sizes = [(out[c]["n_chars"],) for c in order]
    want_bins = greedy_pack_model(sizes, max_bytes=100)
    assert [out[c]["bin_id"] for c in order] == want_bins


# ---------------------------------------------------------------------------
# ExactSubstr resume (persisted gram index)
# ---------------------------------------------------------------------------

from cernan_spark.operators.dedup import (
    exact_substr_gram_index,
    exact_substr_resume_spans,
    exact_substr_spans,
)


def test_exact_substr_resume_equals_one_pass(spark):
    docs = [
        (0, "xxSHARED-BOILERPLATE-SPANxx unique tail zero"),
        (1, "pre SHARED-BOILERPLATE-SPAN and other words"),
        (2, "completely different text with no overlap!"),
        (3, "pre SHARED-BOILERPLATE-SPAN plus more junk"),
        # 4 & 5: cross-shard-only twins — the shared run is duplicated
        # ONLY once shard 2 arrives, so the resumed run must emit a span
        # for the shard-1 doc 4 although run 1 saw nothing there
        (4, "CROSS-SHARD-ONLY-RUN!! alpha beta"),
        (5, "CROSS-SHARD-ONLY-RUN!! gamma delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    shard1 = df.filter("doc_id % 2 = 0")
    shard2 = df.filter("doc_id % 2 = 1")
    one_pass = {
        tuple(r) for r in exact_substr_spans(df, gram_len=L).collect()
    }
    resumed = {
        tuple(r)
        for r in exact_substr_resume_spans(
            shard2, exact_substr_gram_index(shard1, gram_len=L), gram_len=L
        ).collect()
    }
    assert resumed == one_pass
    # the cross-shard twin really is re-graded: doc 4 (shard 1) has a span
    assert any(r[0] == 4 for r in resumed)


# ---------------------------------------------------------------------------
# intra-doc repetition spans
# ---------------------------------------------------------------------------

from cernan_spark.operators.dedup import self_repetition_spans


def test_self_repetition_localizes_the_loop(spark):
    loop = "LOOPING-" * 6  # 48 chars of period-8 repetition
    docs = [
        (0, f"clean prefix then {loop} and a clean tail"),
        (1, "no repetition anywhere in this entire doc"),
        # repeated 8-gram ACROSS docs only (1 occurrence each) must NOT
        # count — this operator is strictly within-doc
        (2, "shared SEGMENT-A here"),
        (3, "also shared SEGMENT-A there"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_spans"], r["rep_chars"], r["longest_span"])
        for r in self_repetition_spans(df, gram_len=8).collect()
    }
    assert set(out) == {0}
    n_spans, rep_chars, longest = out[0]
    assert n_spans == 1 and rep_chars >= len(loop) - 8 and longest >= 40


def test_self_repetition_threshold(spark):
    # exactly 2 occurrences clears min_repeats=2, single occurrence never
    docs = [(0, "ABCDEFGH--------ABCDEFGH")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = self_repetition_spans(df, gram_len=8).collect()
    assert len(out) == 1 and out[0]["n_spans"] == 2


def test_sign_split_infogain_perfect_vs_useless_dim(spark):
    """A dimension whose sign exactly matches the label carries full
    entropy as gain; a constant-sign dimension carries exactly zero."""
    from cernan_spark.operators.similarity import sign_split_infogain

    # dim0 sign == label, dim1 always positive (useless)
    rows = [(i, [1.0 if i % 2 else -1.0, 1.0], i % 2) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r.dim: r for r in sign_split_infogain(df, labels=[0, 1]).collect()}
    import math

    assert abs(got[0].info_gain - math.log(2.0)) < 1e-12
    assert got[0].h_pos == 0.0 and got[0].h_neg == 0.0
    assert got[1].info_gain == 0.0
    assert (got[1].n_pos, got[1].n_neg) == (8, 0)


def test_label_noise_knn_flags_the_flipped_point(spark):
    """Three tight clusters; one point sits inside cluster A but carries
    cluster B's label — it (and only it) must be suspect."""
    from cernan_spark.operators.similarity import label_noise_knn

    rows = []
    for i in range(6):
        rows.append((i, [10.0 + 0.01 * i, 0.1 * i, 1.0], 0))  # cluster A
    for i in range(6, 12):
        rows.append((i, [0.1 * i, 10.0 + 0.01 * i, 1.0], 1))  # cluster B
    rows.append((12, [10.0, 0.05, 1.0], 1))  # geometrically A, labeled B
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r.vec_id: r for r in label_noise_knn(df, n_probes=13, k=5).collect()}
    assert len(got) == 13
    assert got[12].suspect == 1 and got[12].pred_label == 0
    assert all(r.suspect == 0 for v, r in got.items() if v != 12)


def test_stitch_multiline_reassembles_and_orphans(spark):
    from cernan_spark.operators.loghygiene import stitch_multiline

    rows = [
        # hostA: orphan frames BEFORE any head (rotated mid-trace)
        ("A", 1, "    at lost_frame_1"),
        ("A", 2, "    at lost_frame_2"),
        ("A", 3, "ERROR boom"),
        ("A", 4, "    at f1"),
        ("A", 5, "    at f2"),
        ("A", 6, "INFO ok"),
        # hostB: single-line events only
        ("B", 1, "INFO one"),
        ("B", 2, "INFO two"),
    ]
    df = spark.createDataFrame(rows, "host string, line_no long, text string")
    got = {
        (r.host, r.sid): r
        for r in stitch_multiline(df, ["host"], "line_no").collect()
    }
    assert got[("A", 0)].head == "_ORPHAN_" and got[("A", 0)].n_frames == 2
    boom = got[("A", 1)]
    assert boom.head == "ERROR boom" and boom.n_frames == 2
    assert boom.stitched == "ERROR boom\n    at f1\n    at f2"
    assert got[("A", 2)].n_lines == 1
    assert got[("B", 1)].n_frames == 0 and got[("B", 2)].n_frames == 0


def test_disorder_profile_counts_late_rows(spark):
    from cernan_spark.operators.temporal import disorder_profile
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # arrival order: t0, t0+100s, then a straggler stamped t0+10s (90s
    # late vs running max) and one stamped t0+70s (30s late)
    rows = [
        ("s", 1, t0),
        ("s", 2, t0 + dt.timedelta(seconds=100)),
        ("s", 3, t0 + dt.timedelta(seconds=10)),
        ("s", 4, t0 + dt.timedelta(seconds=70)),
    ]
    df = spark.createDataFrame(rows, "k string, arrival long, ts timestamp")
    r = disorder_profile(df, ["k"], ["arrival"], "ts", coverage_s=60).collect()[0]
    assert (r.n_rows, r.n_late) == (4, 2)
    assert r.max_lateness_us == 90_000_000
    assert r.sum_lateness_us == 120_000_000
    assert r.coverage == 0.75  # the 90s straggler breaches a 60s watermark


def test_cluster_purity_pure_and_mixed(spark):
    from cernan_spark.operators.similarity import cluster_purity
    import math

    rows = [(i, [1.0, 1.0, 1.0], 7) for i in range(4)]          # pure cluster 7
    rows += [(10 + i, [-1.0, -1.0, -1.0], i % 2) for i in range(4)]  # 50/50
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r.cluster: r for r in cluster_purity(df, labels=list(range(10))).collect()}
    assert got[7].purity == 1.0 and got[7].label_entropy == 0.0
    assert got[7].majority_label == 7
    mixed = got[0]
    assert mixed.purity == 0.5 and mixed.majority_label == 0  # tie -> smallest
    assert abs(mixed.label_entropy - math.log(2.0)) < 1e-12


def test_kappa_agreement_perfect_and_chance(spark):
    from cernan_spark.operators.similarity import kappa_agreement

    # perfect agreement
    df = spark.createDataFrame([(i % 4, i % 4) for i in range(20)], "a int, b int")
    r = kappa_agreement(df, "a", "b", labels=list(range(4))).collect()[0]
    assert r.kappa == 1.0 and r.p_o == 1.0
    # independent annotators (balanced 2x2): kappa == 0
    rows = [(a, b) for a in (0, 1) for b in (0, 1)]
    df2 = spark.createDataFrame(rows, "a int, b int")
    r2 = kappa_agreement(df2, "a", "b", labels=[0, 1]).collect()[0]
    assert r2.p_o == 0.5 and r2.p_e == 0.5 and r2.kappa == 0.0


def test_prefix_filter_join_finds_all_pairs_above_threshold(spark):
    """Brute-force ground truth on a small corpus: the prefix-filtered
    result must EQUAL the all-pairs answer (no false negatives — the
    guarantee MinHash can't give)."""
    from itertools import combinations

    from cernan_spark.operators.dedup import prefix_filter_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base),
        (1, base),                                    # exact dup
        (2, base.replace("kappa", "lambda")),          # near dup
        (3, "one two three four five six seven eight nine ten"),
        (4, "totally different words entirely here now yes indeed truly ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_join(df, t_num=4, t_den=5).collect()
    }

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    want = {}
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        a, b = sh(ta), sh(tb)
        j = len(a & b) / len(a | b)
        if j >= 4 / 5:
            want[(ia, ib)] = j
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-15
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_price_size_skyline_dominance(spark):
    from cernan_spark.operators.relational import price_size_skyline

    rows = [
        (1, "a", "b", "t", 10, 1.00),   # frontier (cheapest)
        (2, "a", "b", "t", 5, 2.00),    # dominated: pricier AND smaller
        (3, "a", "b", "t", 20, 2.00),   # frontier
        (4, "a", "b", "t", 20, 3.00),   # dominated: same size, pricier
        (5, "a", "b", "t", 21, 3.00),   # frontier
        (6, "a", "b", "t", 21, 3.00),   # tie of 5 -> counted together
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    got = {(r.price, r.size): r.n_parts for r in price_size_skyline(df).collect()}
    assert got == {(1.00, 10): 1, (2.00, 20): 1, (3.00, 21): 2}


def test_rfm_scores_hand_model(spark):
    """Quintiles with deterministic tie-breaks; the all-around best user
    scores 555, the worst 111; rfm composes digits."""
    from cernan_spark.operators.behavior import rfm_scores

    rows = []
    for u in range(5):
        # user u: u+1 events, amounts 10*(u+1), last ts day u
        for j in range(u + 1):
            rows.append((u, f"2024-01-0{u + 1} 00:00:00", 10 * (u + 1)))
    df = spark.createDataFrame(rows, "user_id long, ts string, amt long")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = {r["user"]: r for r in rfm_scores(df, "user_id", "ts", "amt").collect()}
    assert out[4]["r"] == 5 and out[4]["f"] == 5 and out[4]["m"] == 5
    assert out[4]["rfm"] == 555
    assert out[0]["rfm"] == 111
    assert out[2]["frequency"] == 3 and out[2]["monetary"] == 90


def test_item_cosine_hand_model(spark):
    """Three items over four users with hand-counted overlaps; repeated
    (user, item) rows dedup; min_common filters rare pairs."""
    import math

    from cernan_spark.operators.behavior import item_cosine

    rows = [
        (1, "a"), (1, "b"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "u long, i string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in item_cosine(df, "u", "i", 2).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_a"] == 3 and ab["n_b"] == 2 and ab["n_common"] == 2
    assert ab["cosine"] == round(2 / math.sqrt(6), 6)
    assert ab["jaccard"] == round(2 / 3, 6)
    assert ("a", "c") not in out  # only 1 common user < min_common


def test_embedding_drift_hand_model(spark):
    """Cohorts with hand-known centroids: shifted label drifts by the
    exact L2 distance; identical cohorts drift 0."""
    from cernan_spark.operators.similarity import embedding_drift
    from pyspark.sql import functions as F

    rows = [
        # label 0: cohort A {(0,0),(2,0)} c=(1,0); B {(4,2),(6,2)} c=(5,2)
        (0, [0.0, 0.0], 0), (2, [2.0, 0.0], 0),
        (1, [4.0, 2.0], 0), (3, [6.0, 2.0], 0),
        # label 1: identical cohorts
        (10, [1.0, 1.0], 1), (11, [1.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["label"]: r
        for r in embedding_drift(df, F.col("vec_id") % 2 == 1).collect()
    }
    assert out[0]["n_a"] == 2 and out[0]["n_b"] == 2
    assert out[0]["drift"] == round((16 + 4) ** 0.5, 6)
    assert out[1]["drift"] == 0.0


def test_hbos_scores_flags_the_planted_outlier(spark):
    """A lone point in otherwise-dense bins gets the top score; scores
    are deterministic across reruns."""
    from cernan_spark.operators.anomaly import hbos_scores

    rows = [(i, 100 + i % 3, 5 + i % 2) for i in range(100)]
    rows.append((999, 5000, 23))  # isolated in BOTH features
    df = spark.createDataFrame(rows, "id long, f1 long, f2 long")
    out = hbos_scores(df, "id", ["f1", "f2"], 16, 5).collect()
    assert out[0]["id"] == 999
    assert out[0]["score"] > out[1]["score"]
    again = hbos_scores(df, "id", ["f1", "f2"], 16, 5).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_stickiness_hand_model(spark):
    """Three days, overlapping users: DAU/MAU per day match hand counts
    with a trailing window shorter than the span."""
    from cernan_spark.operators.behavior import stickiness

    rows = [
        (1, "2024-01-01 05:00:00"), (2, "2024-01-01 06:00:00"),
        (1, "2024-01-02 05:00:00"),
        (3, "2024-01-03 05:00:00"), (1, "2024-01-03 09:00:00"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {str(r["day"]): r for r in stickiness(df, "user_id", "ts", 2).collect()}
    # window = 2 days (today + yesterday)
    assert out["2024-01-01"]["dau"] == 2 and out["2024-01-01"]["mau"] == 2
    assert out["2024-01-02"]["dau"] == 1 and out["2024-01-02"]["mau"] == 2
    # Jan 3 trailing 2 days = {Jan 2, Jan 3} → users {1, 3}
    assert out["2024-01-03"]["dau"] == 2 and out["2024-01-03"]["mau"] == 2
    assert out["2024-01-03"]["stickiness"] == 1.0
    assert out["2024-01-02"]["stickiness"] == 0.5
