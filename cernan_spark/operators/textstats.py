"""Text analysis operators for training-data pipelines: token stats,
quality scoring, n-gram language ID, document fingerprinting.

All pure column expressions (codegen'd); dictionaries (stopwords per
language) are tiny broadcast literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MERSENNE31 = (1 << 31) - 1

#: minimal per-language stopword profiles for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "von"],
}


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per row."""
    toks = F.split(F.col(text_col), r"\s+")
    # BPE-ish: word pieces of ≤4 chars — ceil(len/4) per word, summed
    bpe = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int"),
    )
    return df.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_distinct_tokens", F.size(F.array_distinct(toks))
    ).withColumn("n_bpeish_tokens", bpe)


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword / diversity ratios — the
    standard cheap quality filters for pretraining corpora."""
    t = F.col(text_col)
    toks = F.split(t, r"\s+")
    n_chars = F.length(t)
    stop_en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    return (
        df.withColumn("len_chars", n_chars)
        .withColumn("n_tokens", F.size(toks))
        .withColumn(
            "punct_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")) / F.greatest(n_chars, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                F.length(F.regexp_replace(t, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.size(F.filter(toks, lambda x: F.array_contains(stop_en, F.lower(x))))
                / F.greatest(F.size(toks), F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "distinct_ratio",
            F.round(F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6),
        )
        .withColumn(
            "quality_ok",
            (F.size(toks) >= 5)
            & (F.col("distinct_ratio") >= 0.3)
            & (F.col("punct_ratio") <= 0.3)
            & (F.col("digit_ratio") <= 0.3),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score = fraction of tokens hitting each
    language's stopword list; best score wins, 'und' when nothing hits."""
    toks = F.transform(F.split(F.col(text_col), r"\s+"), F.lower)
    out = df.withColumn("_toks", toks)
    score_cols = []
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        score = F.size(
            F.filter(F.col("_toks"), lambda x: F.array_contains(arr, x))
        ) / F.greatest(F.size(F.col("_toks")), F.lit(1))
        out = out.withColumn(f"_s_{lang}", score)
        score_cols.append(lang)
    best = F.greatest(*[F.col(f"_s_{l}") for l in score_cols])
    pred = F.lit("und")
    for lang in reversed(score_cols):
        pred = F.when(
            (F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    out = out.withColumn("lang_pred", pred).withColumn(
        "lang_score", F.round(best, 6)
    )
    return out.drop("_toks", *[f"_s_{l}" for l in score_cols])


def doc_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    ngram: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Rolling-hash document fingerprint: k smallest hashes of character
    n-grams (a k-min sketch — overlap estimates resemblance, the classic
    winnowing/fingerprint scheme). Character n-grams via substring over a
    staged position sequence; hashes JVM-side. ``portable=True`` swaps
    xxhash64 for the cross-engine polynomial hash (functions/porthash.py)
    so fingerprints are value-checkable against a DuckDB oracle."""
    from cernan_spark.functions.porthash import portable_hash

    t = F.col(text_col)
    gram_hash = (
        (lambda i: portable_hash(F.substring(t, i, ngram)))
        if portable
        else (
            lambda i: F.pmod(
                F.xxhash64(F.substring(t, i, ngram)), F.lit(_MERSENNE31)
            )
        )
    )
    staged = df.withColumn(
        "_grams",
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (ngram - 1), F.lit(1))),
            gram_hash,
        ),
    )
    return staged.withColumn(
        "fingerprint", F.slice(F.array_sort(F.array_distinct(F.col("_grams"))), 1, k)
    ).drop("_grams")


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals for pretraining quality filtering:
    the fraction of tokens that are repeats, and the most frequent word
    bigram's share of all bigrams.

    Scale shape: the bigram mode cannot be a per-row expression without a
    per-row hash table — so bigrams explode to (doc, bigram) rows, ONE
    hash aggregate counts them, a second tiny aggregate takes max/total
    per doc, and the result broadcast-joins back onto the per-doc stats.
    Both aggregates are map-side combined; the explode multiplies rows by
    tokens-per-doc but each row is a (long, string) pair."""
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            1.0
            - F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("dup_token_frac"),
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda x, y: F.concat_ws(" ", x, y),
        ).alias("_bigrams"),
    )
    counts = (
        base.select("doc_id", F.explode("_bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("n"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.max("n").alias("_mx"), F.sum("n").alias("_tot")
    )
    return (
        base.drop("_bigrams")
        .join(per_doc, "doc_id", "left")
        .withColumn(
            "top_bigram_frac",
            F.round(
                F.coalesce(F.col("_mx") / F.col("_tot"), F.lit(0.0)), 4
            ),
        )
        .drop("_mx", "_tot")
    )


def benchmark_ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training docs that share at least
    one distinct word ``n``-gram with any benchmark document (the standard
    13-gram overlap test from published LLM data cards, ``n`` configurable).

    Spark-first: distinct shingles per side, ONE equi-join on the shingle,
    distinct-hit counts per doc. The benchmark side is broadcast — eval
    sets are tiny relative to a 100 TB corpus — so the corpus never
    shuffles; each scan task probes a hash map. At full scale, hash each
    shingle to int64 (``xxhash64``) so the probe key is 8 bytes instead of
    an n-word string; string shingles are kept here for cross-engine
    oracle equality.

    Output: (doc_id, n_hit_shingles, n_benchmarks) — one row per
    CONTAMINATED training doc only.
    """

    def shingles(df: DataFrame, out_id: str) -> DataFrame:
        toks = F.split(F.col(text_col), " ")
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(grams)).alias("shingle"),
        )

    hits = shingles(docs, "doc_id").join(
        F.broadcast(shingles(benchmark, "bench_id")), "shingle"
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_hit_shingles"),
        F.countDistinct("bench_id").alias("n_benchmarks"),
    )


#: (category, pattern, replacement) — patterns restricted to the syntax
#: subset Java regex and RE2 interpret identically (no backrefs/lookaround;
#: non-capturing groups are fine), so a SQL oracle can replay the scrub
#: byte-for-byte. Replacement applies in list order, so earlier categories
#: claim overlapping spans (e.g. plus-prefixed phones before card runs).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ccard", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{3,4}\b", "<CCARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "apikey",
        r"\b(?:sk|pk|rk|api)_(?:live_|test_)?[A-Za-z0-9]{16,}\b",
        "<KEY>",
    ),
]


def luhn_valid(card: Column) -> Column:
    """True when the separator-stripped digit run passes the Luhn checksum
    (the ISO/IEC 7812 card check digit): from the rightmost digit, double
    every second one (subtracting 9 on overflow) and require the sum to be
    divisible by 10. Pure column expressions over the reversed char array —
    replayable in ANSI SQL for the oracle."""
    ds = F.reverse(F.regexp_replace(card, r"[- ]", ""))
    chars = F.split(ds, "")
    terms = F.zip_with(
        chars,
        F.sequence(F.lit(0), F.greatest(F.size(chars) - 1, F.lit(0))),
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(
                (F.ascii(c) - 48) * 2 > 9, (F.ascii(c) - 48) * 2 - 9
            ).otherwise((F.ascii(c) - 48) * 2),
        ).otherwise(F.ascii(c) - 48),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (F.length(ds) >= 13) & (total % 10 == 0)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for pretraining corpora: emails, plus-prefixed phone
    numbers, dotted-quad IPs, card-shaped digit runs, SSN-shaped ids and
    API-key-shaped tokens are replaced with typed placeholder tokens;
    per-category match counts are kept for corpus accounting, plus
    ``n_ccard_luhn`` — how many card-shaped runs actually pass the Luhn
    checksum (shape matches without a valid check digit are usually order
    ids, not cards). Counts are DISJOINT: each category counts on the
    text with all EARLIER categories already replaced, mirroring the
    replacement chain — a '+'-prefixed 15-digit run is one phone, not a
    phone and a card (r4 ADVICE #5: counting every pattern on the
    original text overstated corpus totals). Pure column expressions —
    whole-stage codegen, no Python in the scan; at 100 TB this is a
    narrow map over the text column."""
    out = df
    cur = F.col(text_col)
    for cat, rx, tok in PII_PATTERNS:
        matches = F.regexp_extract_all(cur, F.lit(rx), F.lit(0))
        out = out.withColumn(f"n_{cat}", F.size(matches))
        if cat == "ccard":
            out = out.withColumn(
                "n_ccard_luhn", F.size(F.filter(matches, luhn_valid))
            )
        cur = F.regexp_replace(cur, rx, tok)
    return out.withColumn("redacted", cur)


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization for dedup keys and quality filters:
    lowercase, strip control characters, collapse runs of whitespace,
    trim. Adds ``norm_text``. Pure column expressions (one narrow map);
    the regex subset is shared by Java regex and RE2, so a SQL oracle
    replays the normalization byte-for-byte. Exact-dedup on ``norm_text``
    catches case/whitespace variants that byte-level dedup misses."""
    t = F.col(text_col)
    norm = F.lower(t)
    norm = F.regexp_replace(norm, r"[\x00-\x1f\x7f]", " ")
    norm = F.regexp_replace(norm, r"\s+", " ")
    return df.withColumn("norm_text", F.trim(norm))


#: scheme://host[/path] — the capture group is the host; RE2 ∩ Java syntax
URL_PATTERN = r"https?://([A-Za-z0-9.-]+)[^\s]*"


def url_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document URL accounting for web corpora: how many URLs, how
    many distinct hosts, and the sorted distinct host list (the input to
    domain-level filtering/mixing decisions — blocklists, per-domain
    caps). Column expressions only; a 100 TB pass is a narrow map plus
    nothing — the per-domain rollup is a separate tiny aggregate on the
    exploded hosts."""
    t = F.col(text_col)
    hosts = F.transform(
        F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(1)), F.lower
    )
    return (
        df.withColumn("n_urls", F.size(F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(0))))
        .withColumn("hosts", F.array_sort(F.array_distinct(hosts)))
        .withColumn("n_hosts", F.size("hosts"))
    )


def domain_rollup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(host, n_docs, n_mentions) across the corpus — the table a
    domain-blocklist or per-domain quota joins against. One explode of
    the raw (non-distinct) host matches plus one map-side-combined
    aggregate on the host string."""
    hosts = F.transform(
        F.regexp_extract_all(
            F.col(text_col), F.lit(URL_PATTERN), F.lit(1)
        ),
        F.lower,
    )
    ex = docs.select(F.col(id_col), F.explode(hosts).alias("host"))
    return ex.groupBy("host").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("n_mentions"),
    )


def cap_docs_per_domain(
    docs: DataFrame,
    max_per_host: int,
    host_col: str = "host",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap — the standard crawl-diversity step (no
    single host may dominate the corpus). Keeps a deterministic
    pseudo-random subset of ≤ ``max_per_host`` docs per host: selection
    order is the same portable universal hash the token-budget sampler
    uses (reproducible across reruns AND in the SQL oracle), and the
    ranking runs through :func:`cernan_spark.operators.skew.salted_topk`,
    so a hot host (half the crawl on one domain is normal) never
    serializes into one task. Adds ``rank`` (1-based keep order)."""
    from cernan_spark.operators.skew import salted_topk

    m31 = F.lit(_MERSENNE31)
    order = F.pmod(
        F.lit(1103515245) * F.pmod(F.col(id_col).cast("long"), m31)
        + F.lit(12345),
        m31,
    )
    return salted_topk(
        docs,
        [host_col],
        [order.asc(), F.col(id_col)],
        k=max_per_host,
        salt_src=id_col,
    )


def sample_to_token_budget(
    docs: DataFrame,
    budget: int | dict[str, int],
    lang_col: str = "lang_pred",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    chunks: int = 64,
    default_budget: int = 0,
) -> DataFrame:
    """Per-language token-budget subsampling: keep a deterministic
    pseudo-random prefix of each language's docs whose cumulative token
    count stays within ``budget`` (the standard corpus-mixing step when
    building a pretraining mix with per-language quotas).

    The 'shuffle' order is a portable universal hash of the doc id — both
    deterministic across reruns (resumability) and reproducible in ANSI SQL
    (the DuckDB oracle selects the identical prefix). The id is reduced mod
    2^31-1 *before* the multiply and combined with ``pmod`` so the key never
    overflows BIGINT under ANSI mode and orders negative ids identically to
    the SQL replay.

    Scale shape (two-phase, NOT one window per language — a hot language
    must not serialize into a single task): the hash key is uniform on
    [0, 2^31-1), so ``chunks`` contiguous key ranges per language preserve
    the global order. Phase 1 map-side-aggregates per-(language, chunk)
    token totals and prefix-sums them over the tiny (langs × chunks) table
    to give each chunk its starting offset; chunks whose offset already
    exceeds the budget are pruned before any wide work. Phase 2 runs the
    ordered scan per (language, chunk) — parallel across chunks — and adds
    the offset. Long addition is associative, so the result is
    bit-identical to the single-window form (``chunks=1``).

    ``budget`` may be a single int (one quota for every language) or a
    per-language dict — the real corpus-mixing shape where the mix
    designer sets each language's token share; languages absent from the
    dict get ``default_budget``.
    """
    from pyspark.sql import Window as W

    if isinstance(budget, dict):
        bexpr = F.lit(default_budget).cast("long")
        for lang, b in sorted(budget.items()):
            bexpr = F.when(F.col(lang_col) == lang, F.lit(b)).otherwise(
                bexpr
            )
    else:
        bexpr = F.lit(budget).cast("long")
    m31 = F.lit(_MERSENNE31)
    order = F.pmod(
        F.lit(1103515245) * F.pmod(F.col(id_col).cast("long"), m31)
        + F.lit(12345),
        m31,
    )
    width = _MERSENNE31 // chunks + 1
    staged = docs.withColumn("_ord", order).withColumn(
        "_bkt", F.floor(F.col("_ord") / F.lit(width))
    )
    tok = F.col(tokens_col).cast("long")
    totals = staged.groupBy(lang_col, "_bkt").agg(F.sum(tok).alias("_bt"))
    wb = (
        W.partitionBy(lang_col)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(wb), F.lit(0).cast("long"))
    )
    # a chunk whose starting offset is already past its language's budget
    # cannot contribute a row with cum_tokens <= budget (tokens are
    # non-negative)
    live = offsets.filter(F.col("_off") <= bexpr).select(
        lang_col, "_bkt", "_off"
    )
    w = (
        W.partitionBy(lang_col, "_bkt")
        .orderBy(F.col("_ord").asc(), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = F.col("_off") + F.sum(tok).over(w)
    return (
        staged.join(F.broadcast(live), [lang_col, "_bkt"])
        .withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") <= bexpr)
        .drop("_ord", "_bkt", "_off")
    )


def fuzzy_probe_matches(
    docs: DataFrame,
    probes: DataFrame,
    max_dist: int = 3,
    cmp_len: int = 120,
    block_prefix: int = 6,
    len_bucket: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "probe_text",
    exclude_self: bool = False,
) -> DataFrame:
    """Fuzzy (edit-distance) decontamination: find corpus documents within
    ``max_dist`` Levenshtein edits of any probe — the near-miss leakage
    that exact shingle overlap (``benchmark_ngram_overlap``) cannot see,
    e.g. an eval prompt pasted with a typo or re-wrapped whitespace.

    Blocked-join shape (standard entity-resolution practice): both sides
    compare a normalized prefix (printable-ASCII only — DuckDB's
    ``levenshtein`` is byte-based while Spark's is character-based, so the
    comparison alphabet is pinned to 1-byte chars; first ``cmp_len``
    chars). Candidates must agree on the first ``block_prefix`` characters
    and sit in the same-or-adjacent ``len_bucket`` length bucket; the
    probe side fans out to its 3 eligible buckets and is broadcast, so the
    corpus side is scanned once, never shuffled, and only candidate pairs
    reach the O(cmp_len^2) ``levenshtein`` kernel. Recall is bounded by
    the blocking (an edit inside the block prefix escapes), exactly like
    LSH banding — the trade is documented, deliberate, and replayed
    identically by the SQL oracle.

    Output: one row per (probe_id, doc_id) hit with the edit distance.
    """
    def norm(c: Column) -> Column:
        return F.substring(F.regexp_replace(c, "[^ -~]", ""), 1, cmp_len)

    cand = docs.select(
        F.col(id_col), norm(F.col(text_col)).alias("__cand")
    ).withColumn("__pfx", F.substring("__cand", 1, block_prefix)).withColumn(
        "__bkt", F.floor(F.length("__cand") / F.lit(len_bucket))
    )
    pr = probes.select(
        F.col(probe_id_col), norm(F.col(probe_text_col)).alias("__probe")
    ).withColumn("__pfx", F.substring("__probe", 1, block_prefix))
    pr = pr.withColumn(
        "__bkt",
        F.explode(
            F.array(
                F.floor(F.length("__probe") / F.lit(len_bucket)) - 1,
                F.floor(F.length("__probe") / F.lit(len_bucket)),
                F.floor(F.length("__probe") / F.lit(len_bucket)) + 1,
            )
        ),
    )
    hits = (
        cand.join(F.broadcast(pr), ["__pfx", "__bkt"])
        .withColumn("dist", F.levenshtein("__cand", "__probe"))
        .filter(F.col("dist") <= max_dist)
    )
    if exclude_self:
        hits = hits.filter(F.col(id_col) != F.col(probe_id_col))
    return hits.select(probe_id_col, id_col, "dist").distinct()


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    lang_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum (language) subsampling at exact rates:
    keep a document iff its portable universal hash falls under the
    stratum's threshold — the standard down-sampling step when rebalancing
    a pretraining mix (e.g. keep 20 % of English, all of Swahili).

    Pure narrow column expression: no shuffle, no RNG state, reproducible
    across reruns and engines (the DuckDB oracle replays the same hash),
    and stable under corpus growth — a doc's keep/drop never changes when
    other docs arrive, which is what makes incremental re-ingest append
    only new rows. The same (a*x+b) mod 2^31-1 key orders the
    token-budget sampler, so strata sampled here stay consistent with
    budget prefixes there.
    """
    m31 = F.lit(_MERSENNE31)
    key = F.pmod(
        F.lit(1103515245) * F.pmod(F.col(id_col).cast("long"), m31)
        + F.lit(12345),
        m31,
    )
    thr = F.lit(int(default_rate * _MERSENNE31)).cast("long")
    for lang, r in sorted(rates.items()):
        thr = F.when(
            F.col(lang_col) == lang, F.lit(int(r * _MERSENNE31)).cast("long")
        ).otherwise(thr)
    return docs.withColumn("_key", key).filter(F.col("_key") < thr).drop("_key")


def decontam_token_spans(
    training: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Localize benchmark contamination to exact token spans and cut the
    span, not the document: every token position whose ``n``-token
    shingle occurs in the benchmark set is contaminated; overlapping
    positions merge into maximal spans (gap > ``n`` starts a new one,
    the :func:`~cernan_spark.operators.dedup.exact_substr_spans` island
    rule in token space); the doc is rebuilt WITHOUT the contaminated
    tokens. Emits only contaminated docs — the surgical follow-up to
    :func:`benchmark_ngram_overlap`, which flags whole docs (dropping a
    long doc over a 10-token leak throws away good data).

    Plan: the benchmark shingle set broadcasts (benchmarks are tiny next
    to a 100 TB corpus); the corpus side explodes shingles narrowly and
    only MATCHED (doc, pos) rows — contamination-sized, not corpus-sized
    — shuffle into the per-doc island window; the rebuild joins the
    span list back and filters tokens with one nested higher-order
    expression, all JVM-side.
    """
    from pyspark.sql import Window as W

    toks = F.split(F.col(text_col), " ")
    npos = F.size(toks) - F.lit(n - 1)
    tpos = training.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("pos"),
        toks.alias("__toks"),
    ).select(
        "id",
        "pos",
        F.array_join(F.slice("__toks", F.col("pos"), n), " ").alias("shingle"),
    )
    bsh = (
        bench.select(
            F.explode(
                F.when(
                    F.size(F.split(F.col(text_col), " ")) >= n,
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.size(F.split(F.col(text_col), " ")) - F.lit(n - 1),
                        ),
                        lambda i: F.array_join(
                            F.slice(F.split(F.col(text_col), " "), i, n), " "
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("shingle")
        )
        .distinct()
    )
    hits = tpos.join(F.broadcast(bsh), "shingle").select("id", "pos")
    w = W.partitionBy("id").orderBy("pos")
    spans = (
        hits.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(w) > F.lit(n), 1).otherwise(
                0
            ),
        )
        .withColumn(
            "island", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("id", "island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + F.lit(n - 1)).alias("e"))
    )
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("s", "e")).alias("spans"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias(
            "n_tokens_removed"
        ),
    )
    joined = per_doc.join(
        training.select(F.col(id_col).alias("id"), toks.alias("__toks")), "id"
    )
    idx_toks = F.transform(
        F.sequence(F.lit(1), F.size("__toks")),
        lambda i: F.struct(
            i.alias("idx"), F.element_at("__toks", i).alias("tk")
        ),
    )
    kept = F.filter(
        idx_toks,
        lambda x: ~F.exists(
            F.col("spans"),
            lambda sp: (x["idx"] >= sp["s"]) & (x["idx"] <= sp["e"]),
        ),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.col("n_spans").cast("long").alias("n_spans"),
        "n_tokens_removed",
        F.size(kept).cast("long").alias("n_tokens_clean"),
        F.array_join(F.transform(kept, lambda x: x["tk"]), " ").alias(
            "clean_text"
        ),
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-level Shannon entropy in nats — the cheap
    gibberish/encoding-junk detector (binary blobs and key-mash text sit
    near ln(alphabet); natural language sits well below; single-char
    spam near 0). Computed as ``H = ln N − (1/N) Σ c·ln c`` over the
    doc's char histogram, so every ``ln`` argument is an exact integer
    and the ascending-by-char fold is pinned — the proven cross-engine
    float class. Entirely within-row (distinct chars × one
    occurrence-count via length-difference each), no shuffle at all.
    """
    t = F.col(text_col)
    chars = F.array_sort(F.array_distinct(F.split(t, "")))
    counts = F.transform(
        chars,
        lambda c: F.length(t) - F.length(F.replace(t, c, F.lit(""))),
    )
    n = F.length(t).cast("double")
    sum_clnc = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
    )
    h = F.when(F.length(t) > 0, F.log(n) - sum_clnc / n).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        F.length(t).cast("long").alias("n_chars_text"),
        F.size(chars).cast("int").alias("distinct_chars"),
        F.round(h, 6).alias("char_entropy"),
    )


def char_entropy_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`char_entropy` (same histogram-by-replace
    counts, same ascending fold, same ln-of-integer terms)."""
    return f"""
        WITH per AS (
            SELECT doc_id, len(text) AS n,
                   list_sort(list_distinct(string_split(text, ''))) AS cs,
                   text
            FROM {table}
        ), folded AS (
            SELECT doc_id, n, len(cs) AS distinct_chars,
                   list_reduce(
                     list_prepend(0.0, list_transform(cs,
                       c -> CAST(n - len(replace(text, c, '')) AS DOUBLE)
                            * ln(CAST(n - len(replace(text, c, ''))
                                      AS DOUBLE)))),
                     (a, x) -> a + x) AS sum_clnc
            FROM per
        )
        SELECT doc_id, CAST(n AS BIGINT) AS n_chars_text,
               CAST(distinct_chars AS INTEGER) AS distinct_chars,
               round(CASE WHEN n > 0
                          THEN ln(CAST(n AS DOUBLE))
                               - sum_clnc / CAST(n AS DOUBLE)
                          ELSE 0.0 END, 6) AS char_entropy
        FROM folded
    """


#: masking chain for log-template mining — order matters (composite
#: shapes before bare digit runs); Java∩RE2-safe, shared with the oracle
TEMPLATE_MASKS: list[tuple[str, str]] = [
    (r"0x[0-9a-fA-F]+", "<HEX>"),
    (r"\d+", "<N>"),
]


def mine_templates(
    df: DataFrame, text_col: str = "text", conv_col: str = "conv_id"
) -> DataFrame:
    """Drain-lite log-template mining: mask variable tokens (hex ids,
    digit runs) and group the survivors — the log stream separates into
    its line classes WITHOUT a parser, the discovery step that precedes
    writing grok templates (functions/groklib.py) for each class. One
    narrow map + one map-side-combined aggregate; ``example`` is the
    lexicographic min raw line, so the result is deterministic."""
    t = F.col(text_col)
    for rx, tok in TEMPLATE_MASKS:
        t = F.regexp_replace(t, rx, tok)
    return (
        df.select(t.alias("template"), F.col(text_col), F.col(conv_col))
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(conv_col).alias("n_convs"),
            F.min(text_col).alias("example"),
        )
    )


def mine_templates_sql(text_expr: str, conv_expr: str, rel: str) -> str:
    """DuckDB twin of :func:`mine_templates` over relation ``rel``."""
    t = text_expr
    for rx, tok in TEMPLATE_MASKS:
        t = f"regexp_replace({t}, '{rx}', '{tok}', 'g')"
    return f"""
        SELECT {t} AS template,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT {conv_expr}) AS BIGINT) AS n_convs,
               min({text_expr}) AS example
        FROM {rel} GROUP BY 1
    """


# ---------------------------------------------------------------------------
# temperature-based multilingual mixture weights (mT5/XLM-R alpha sampling)
# ---------------------------------------------------------------------------


def alpha_mix_weights(
    df: DataFrame,
    budget_docs: int = 1000,
    lang_col: str = "lang",
) -> DataFrame:
    """Temperature-smoothed sampling weights across languages — the
    mT5/XLM-R recipe p_l ∝ (n_l/N)^α with α = 1/2, which up-samples
    low-resource languages without letting the head language drown the
    mix. α = 1/2 is chosen deliberately: w_l = sqrt(n_l) and IEEE-754
    sqrt is CORRECTLY ROUNDED, so every weight is bit-identical in any
    compliant engine (no exp/pow whose libm rounding varies).

    Float discipline: Σ_l sqrt(n_l) folds over the weight list sorted
    ascending (collected once — the frame is langs-sized, a handful of
    rows), so the fold order is pinned cross-engine; every other double
    is a division of those exact terms. Emits, per language: raw doc
    count and share, smoothed share, the up/down-sampling boost ratio,
    and the integer document allocation under ``budget_docs``.

    Plan: ONE map-side-combined count aggregate over the corpus; the
    langs-sized frame then self-folds via a broadcast of one total row.
    Nothing corpus-sized ever shuffles twice at 100 TB.
    """
    counts = df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("n_total"),
        F.aggregate(
            F.sort_array(F.collect_list(F.sqrt(F.col("n_docs").cast("double")))),
            F.lit(0.0),
            lambda acc, w: acc + w,
        ).alias("w_total"),
    )
    w = F.sqrt(F.col("n_docs").cast("double"))
    share_raw = F.col("n_docs").cast("double") / F.col("n_total").cast("double")
    share_alpha = w / F.col("w_total")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col(lang_col),
            "n_docs",
            share_raw.alias("share_raw"),
            share_alpha.alias("share_alpha"),
            (share_alpha / share_raw).alias("boost"),
            F.floor(share_alpha * F.lit(float(budget_docs))).cast("long").alias(
                "alloc_docs"
            ),
        )
    )


def alpha_mix_oracle_sql(table: str = "documents", budget_docs: int = 1000) -> str:
    """DuckDB twin of :func:`alpha_mix_weights` (same sorted fold)."""
    return f"""
        WITH counts AS (
            SELECT lang, count(*) AS n_docs FROM {table} GROUP BY 1
        ), tot AS (
            SELECT sum(n_docs) AS n_total,
                   list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                       list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY
                            sqrt(CAST(n_docs AS DOUBLE)))),
                     (acc, w) -> acc + w) AS w_total
            FROM counts
        )
        SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share_raw,
               sqrt(CAST(n_docs AS DOUBLE)) / w_total AS share_alpha,
               (sqrt(CAST(n_docs AS DOUBLE)) / w_total)
                 / (CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)) AS boost,
               CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) / w_total
                          * {float(budget_docs)}) AS BIGINT) AS alloc_docs
        FROM counts CROSS JOIN tot
    """


# ---------------------------------------------------------------------------
# BPE merge-candidate pair counting (tokenizer-training first iteration)
# ---------------------------------------------------------------------------

# end-of-word marker: a control char no corpus token contains, rendered
# as the conventional '</w>' in the output
_BPE_EOW = "\x01"


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """The first iteration of BPE tokenizer training: count adjacent
    character pairs inside words, weighted by word frequency, with the
    classic end-of-word marker so 'e</w>' and a mid-word 'e?' stay
    distinct merges. Emits the top-K merge candidates (count desc, pair
    asc — a total order, so the cut is deterministic).

    The Sennrich trick that makes this 100 TB-safe is counting pairs on
    the DISTINCT-WORD VOCABULARY, not the corpus: one map-side-combined
    word-count aggregate touches the corpus once; pair explosion then
    runs over vocab-sized data (millions of rows, not trillions) and
    every later BPE merge iteration would too.
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )
    marked = words.select(
        F.concat(F.col("w"), F.lit(_BPE_EOW)).alias("mw"), "n_word"
    )
    pairs = marked.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("mw") - 1),
                lambda i: F.col("mw").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "n_word",
    )
    counted = pairs.groupBy("pair").agg(
        F.sum("n_word").alias("n_occ"),
        F.count(F.lit(1)).alias("n_word_types"),
    )
    return (
        counted.orderBy(F.desc("n_occ"), F.asc("pair"))
        .limit(top_k)
        .select(
            F.replace(
                F.col("pair"), F.lit(_BPE_EOW), F.lit("</w>")
            ).alias("pair"),
            "n_occ",
            "n_word_types",
        )
    )


def bpe_pair_oracle_sql(table: str = "documents", top_k: int = 50) -> str:
    """DuckDB twin of :func:`bpe_pair_counts` (same marker, same order).
    The ORDER BY on the raw marker precedes the '</w>' rendering in BOTH
    engines, so ties cut identically."""
    return f"""
        WITH words AS (
            SELECT w, count(*) AS n_word
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {table})
            WHERE length(w) > 0 GROUP BY 1
        ), marked AS (
            SELECT w || chr(1) AS mw, n_word FROM words
        ), pairs AS (
            SELECT unnest(list_transform(range(1, length(mw)),
                          i -> substr(mw, CAST(i AS INTEGER), 2))) AS pair,
                   n_word
            FROM marked
        ), counted AS (
            SELECT pair, CAST(sum(n_word) AS BIGINT) AS n_occ,
                   CAST(count(*) AS BIGINT) AS n_word_types
            FROM pairs GROUP BY 1
        )
        SELECT replace(pair, chr(1), '</w>') AS pair, n_occ, n_word_types
        FROM (SELECT * FROM counted
              ORDER BY n_occ DESC, pair ASC LIMIT {top_k})
    """


# ---------------------------------------------------------------------------
# URL canonicalization (crawl dedup pre-pass)
# ---------------------------------------------------------------------------

_URL_PARTS_RX = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(.*)$"
_TRACKING_RX = r"^(utm_[a-z]+|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL — the dedup key a crawl frontier uses so
    `HTTPS://WWW.Example.COM:443/p/?utm_source=x&b=2&a=1#frag` and
    `https://example.com/p?a=1&b=2` collapse: scheme/host lowercased,
    default ports and `www.` stripped, fragment dropped, tracking params
    (utm_*/fbclid/gclid) removed, remaining query params SORTED, and a
    trailing slash on a non-root path trimmed. Pure column expressions —
    regexp + array_sort stay JVM-side, O(len) per row, no shuffle."""
    scheme = F.lower(F.regexp_extract(url, _URL_PARTS_RX, 1))
    host0 = F.lower(F.regexp_extract(url, _URL_PARTS_RX, 2))
    host = F.regexp_replace(
        F.regexp_replace(host0, r"^www\.", ""), r":(80|443)$", ""
    )
    path0 = F.regexp_extract(url, _URL_PARTS_RX, 3)
    path = F.when(
        (F.length(path0) > 1) & path0.endswith("/"),
        path0.substr(F.lit(1), F.length(path0) - 1),
    ).otherwise(path0)
    tail = F.regexp_extract(url, _URL_PARTS_RX, 4)
    query = F.regexp_extract(tail, r"^\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda prm: (F.length(prm) > 0) & ~prm.rlike(_TRACKING_RX),
    )
    qcanon = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.length(qcanon) > 0, F.concat(F.lit("?"), qcanon)
        ).otherwise(F.lit("")),
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` over VARCHAR ``expr``."""
    parts = "'" + _URL_PARTS_RX.replace("\\", "\\\\") + "'"
    scheme = f"lower(regexp_extract({expr}, {parts}, 1))"
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({expr}, {parts}, 2)),"
        " '^www\\.', ''), ':(80|443)$', '')"
    )
    path0 = f"regexp_extract({expr}, {parts}, 3)"
    path = (
        f"CASE WHEN length({path0}) > 1 AND {path0} LIKE '%/'"
        f" THEN substr({path0}, 1, length({path0}) - 1) ELSE {path0} END"
    )
    query = f"regexp_extract(regexp_extract({expr}, {parts}, 4), '^\\?([^#]*)', 1)"
    kept = (
        f"list_filter(string_split({query}, '&'),"
        f" prm -> length(prm) > 0 AND NOT regexp_matches(prm, '{_TRACKING_RX}'))"
    )
    qcanon = f"list_aggr(list_sort({kept}), 'string_agg', '&')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN length(coalesce({qcanon}, '')) > 0"
        f" THEN '?' || {qcanon} ELSE '' END"
    )


def template_drift(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Template lifecycle monitor: mine templates (same masks as
    :func:`mine_templates`), split the stream at its epoch midpoint, and
    report per template whether it is NEW (late half only — the
    never-seen-before error class an on-call wants paged on), VANISHED
    (early only), or stable, plus the frequency lift for stable ones.
    The Drain-style follow-up to template mining: not what the line
    classes are, but how their mix is moving.

    lift = (n_late/total_late) / (n_early/total_early), computed as ONE
    division of exact integer products, so it is bit-identical across
    engines. Plan: one narrow map + ONE template-grain aggregate; the
    midpoint and totals are 1-row broadcasts.
    """
    t = F.col(text_col)
    for rx, tok in TEMPLATE_MASKS:
        t = F.regexp_replace(t, rx, tok)
    ep = F.unix_timestamp(F.col(ts_col))
    base = df.select(t.alias("template"), ep.alias("ep"))
    bounds = base.agg(
        ((F.min("ep") + F.max("ep")) / 2).cast("long").alias("thr")
    )
    g = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("template")
        .agg(
            F.sum((F.col("ep") <= F.col("thr")).cast("long")).alias("n_early"),
            F.sum((F.col("ep") > F.col("thr")).cast("long")).alias("n_late"),
        )
    )
    totals = g.agg(
        F.sum("n_early").alias("te"), F.sum("n_late").alias("tl")
    )
    status = (
        F.when(F.col("n_early") == 0, F.lit("new"))
        .when(F.col("n_late") == 0, F.lit("vanished"))
        .otherwise(F.lit("stable"))
    )
    lift = F.when(
        (F.col("n_early") > 0) & (F.col("n_late") > 0),
        (F.col("n_late") * F.col("te")).cast("double")
        / (F.col("n_early") * F.col("tl")).cast("double"),
    )
    return g.crossJoin(F.broadcast(totals)).select(
        "template", "n_early", "n_late", status.alias("status"),
        lift.alias("lift"),
    )


def template_drift_sql(text_expr: str, rel: str, ts_expr: str = "ts") -> str:
    """DuckDB twin of :func:`template_drift` over relation ``rel``."""
    t = text_expr
    for rx, tok in TEMPLATE_MASKS:
        t = f"regexp_replace({t}, '{rx}', '{tok}', 'g')"
    return f"""
        WITH base AS (
            SELECT {t} AS template,
                   CAST(floor(epoch({ts_expr})) AS BIGINT) AS ep
            FROM {rel}
        ), bounds AS (
            -- floor, not bare CAST: DuckDB CAST(double AS BIGINT) rounds
            -- while Spark's cast truncates
            SELECT CAST(floor((min(ep) + max(ep)) / 2) AS BIGINT) AS thr
            FROM base
        ), g AS (
            SELECT template,
                   CAST(sum(CASE WHEN ep <= (SELECT thr FROM bounds)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
                   CAST(sum(CASE WHEN ep > (SELECT thr FROM bounds)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM base GROUP BY 1
        ), tot AS (
            SELECT sum(n_early) AS te, sum(n_late) AS tl FROM g
        )
        SELECT template, n_early, n_late,
               CASE WHEN n_early = 0 THEN 'new'
                    WHEN n_late = 0 THEN 'vanished'
                    ELSE 'stable' END AS status,
               CASE WHEN n_early > 0 AND n_late > 0
                    THEN CAST(n_late * (SELECT te FROM tot) AS DOUBLE)
                         / CAST(n_early * (SELECT tl FROM tot) AS DOUBLE)
               END AS lift
        FROM g
    """


def zipf_fit(
    df: DataFrame, text_col: str = "text", vocab_k: int = 100
) -> DataFrame:
    """Zipf's-law fit over the top-K vocabulary: least-squares slope of
    ln(freq) against ln(rank) — natural language sits near −1; a
    synthetic or templated corpus shows up immediately as a flat or
    kinked line, making this a one-row corpus-naturalness gate.

    Float discipline: every ln argument is an exact integer (count,
    rank); the five sums fold over the K-row frame in pinned rank order
    (sort_array + aggregate ↔ list_reduce(ORDER BY rank)); slope and R²
    are divisions of those folded doubles. Plan: ONE corpus token
    count, a K-row TakeOrdered cut, then constant-size arithmetic.
    """
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    vocab = (
        toks.filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(vocab_k)
    )
    from pyspark.sql import Window as W2

    wr = W2.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    ranked = vocab.select(
        "cnt", F.row_number().over(wr).alias("rank")
    )  # K rows: the unpartitioned window sorts K rows, not the corpus
    term = F.struct(
        "rank",
        F.log(F.col("rank").cast("double")).alias("lx"),
        F.log(F.col("cnt").cast("double")).alias("ly"),
    )
    folded = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.aggregate(
            F.sort_array(F.collect_list(term)), F.lit(0.0),
            lambda a, s: a + s["lx"],
        ).alias("sx"),
        F.aggregate(
            F.sort_array(F.collect_list(term)), F.lit(0.0),
            lambda a, s: a + s["ly"],
        ).alias("sy"),
        F.aggregate(
            F.sort_array(F.collect_list(term)), F.lit(0.0),
            lambda a, s: a + s["lx"] * s["ly"],
        ).alias("sxy"),
        F.aggregate(
            F.sort_array(F.collect_list(term)), F.lit(0.0),
            lambda a, s: a + s["lx"] * s["lx"],
        ).alias("sxx"),
        F.aggregate(
            F.sort_array(F.collect_list(term)), F.lit(0.0),
            lambda a, s: a + s["ly"] * s["ly"],
        ).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = n * F.col("syy") - F.col("sy") * F.col("sy")
    return folded.select(
        F.col("n").alias("n_ranks"),
        F.round(num / den, 6).alias("zipf_slope"),
        F.round((num * num) / (den * deny), 6).alias("r2"),
    )


def zipf_fit_oracle_sql(table: str = "documents", vocab_k: int = 100) -> str:
    """DuckDB twin of :func:`zipf_fit` (same fold order, same shapes)."""
    return f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM {table}
        ), vocab AS (
            SELECT tok, count(*) AS cnt FROM toks WHERE length(tok) > 0
            GROUP BY 1 ORDER BY cnt DESC, tok LIMIT {vocab_k}
        ), ranked AS (
            SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
            FROM vocab
        ), folded AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   list_reduce(list_prepend(0.0,
                     list(ln(CAST(rank AS DOUBLE)) ORDER BY rank)),
                     (a, v) -> a + v) AS sx,
                   list_reduce(list_prepend(0.0,
                     list(ln(CAST(cnt AS DOUBLE)) ORDER BY rank)),
                     (a, v) -> a + v) AS sy,
                   list_reduce(list_prepend(0.0,
                     list(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))
                          ORDER BY rank)), (a, v) -> a + v) AS sxy,
                   list_reduce(list_prepend(0.0,
                     list(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
                          ORDER BY rank)), (a, v) -> a + v) AS sxx,
                   list_reduce(list_prepend(0.0,
                     list(ln(CAST(cnt AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))
                          ORDER BY rank)), (a, v) -> a + v) AS syy
            FROM ranked
        )
        SELECT n AS n_ranks,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)
                 AS zipf_slope,
               round(((CAST(n AS DOUBLE) * sxy - sx * sy)
                      * (CAST(n AS DOUBLE) * sxy - sx * sy))
                     / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
        FROM folded
    """


def unigram_overlap_eval(
    docs: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "doc_id",
) -> DataFrame:
    """ROUGE-1 / BLEU-1 style clipped unigram overlap between a candidate
    and a reference text per pair — the n-gram eval a generation
    pipeline runs against golden outputs at corpus scale.

    Clipped overlap = Σ over distinct tokens of min(count_cand,
    count_ref); precision = overlap / |cand|, recall = overlap / |ref|,
    f1 = 2pr/(p+q) — all exact-integer counts with divisions only at
    emit, so the DuckDB twin matches bit-for-bit.

    Plan: both sides explode into ONE frame tagged by side, one
    map-side-combined aggregate to (pair, token) grain, one more to the
    pair grain — two shuffles total, no join. At 100 TB the (pair,
    token) grain is bounded by corpus token count; no all-pairs step.
    """
    toks = F.split(F.col("txt"), " ")
    both = docs.select(
        F.col(id_col).alias("pair_id"),
        F.col(cand_col).alias("txt"),
        F.lit(1).alias("is_cand"),
    ).unionByName(
        docs.select(
            F.col(id_col).alias("pair_id"),
            F.col(ref_col).alias("txt"),
            F.lit(0).alias("is_cand"),
        )
    )
    grain = (
        both.select(
            "pair_id", "is_cand", F.explode(toks).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("pair_id", "tok")
        .agg(
            F.sum("is_cand").alias("c_n"),
            F.sum(1 - F.col("is_cand")).alias("r_n"),
        )
    )
    per_pair = grain.groupBy("pair_id").agg(
        F.sum("c_n").alias("cand_len"),
        F.sum("r_n").alias("ref_len"),
        F.sum(F.least("c_n", "r_n")).alias("overlap"),
    )
    p = F.col("overlap").cast("double") / F.col("cand_len").cast("double")
    r = F.col("overlap").cast("double") / F.col("ref_len").cast("double")
    return per_pair.select(
        "pair_id",
        "cand_len",
        "ref_len",
        "overlap",
        p.alias("precision"),
        r.alias("recall"),
        F.when(
            F.col("overlap") == 0, F.lit(0.0)
        ).otherwise(F.lit(2.0) * p * r / (p + r)).alias("f1"),
    )


def diversity_profile(
    df: DataFrame, group_cols: list[str], class_col: str
) -> DataFrame:
    """Class-diversity indices per slice — the corpus-mix health check a
    data-mixing pipeline reads next to ``domain_cap``/``alpha_mix``:
    Simpson's index D = Σ c(c−1) / (n(n−1)) (the probability two draws
    without replacement share a class), its inverse (effective number of
    classes), and Shannon entropy in nats.

    D is a single division of exact BIGINTs. Entropy folds −(c/n)·ln(c/n)
    over class-sorted terms (pinned order; ln of an exact-division double
    — the repo-wide bm25/idf discipline). ``inv_simpson`` is NULL when
    D = 0 (all classes singleton — no finite effective count).

    Output per group: ``*group_cols, n, n_classes, simpson, inv_simpson,
    shannon``.
    """
    fine = df.groupBy(
        *group_cols, F.col(class_col).alias("_cls")
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = fine.groupBy(*group_cols).agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("pairs"),
        F.array_sort(F.collect_list(F.struct("_cls", "c"))).alias("xs"),
    )
    d = F.col("pairs").cast("double") / (
        F.col("n") * (F.col("n") - 1)
    ).cast("double")
    n_d = F.col("n").cast("double")
    shannon = -F.aggregate(
        "xs",
        F.lit(0.0),
        lambda acc, x: acc
        + (x["c"].cast("double") / n_d)
        * F.log(x["c"].cast("double") / n_d),
    )
    return agg.select(
        *group_cols,
        "n",
        "n_classes",
        F.round(d, 6).alias("simpson"),
        F.when(F.col("pairs") > 0, F.round(1.0 / d, 6)).alias(
            "inv_simpson"
        ),
        F.round(shannon, 6).alias("shannon"),
    )


#: RAKE delimiter words for the synthetic corpus vocabulary — function
#: words that break keyword runs. A real deployment passes its own list.
RAKE_STOPWORDS = ["the", "a"]


def rake_keyphrases(
    df: DataFrame,
    stopwords: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al., 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    deg(w)/freq(w) over the candidate corpus (deg counts co-members,
    phrase length included, with multiplicity); a phrase scores the sum
    of its words' scores in phrase order (pinned fold). Returns the
    global top-k phrases by (score desc, phrase asc) with occurrence
    counts — the cheap unsupervised keyword signal next to bm25/fightin'
    words.

    Shape: posexplode → a cumulative stopword-count window per doc
    (segment ids) → per-(doc, segment) sort-fold into the phrase → ONE
    (word) stats aggregate joined back (word vocab is small — broadcast)
    → phrase-order score fold → top-k. deg/freq are exact BIGINTs; the
    only doubles are those divisions and their pinned-order sum.
    """
    sw = stopwords if stopwords is not None else RAKE_STOPWORDS
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    ).filter(F.length("w") > 0)
    seg_w = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = toks.select(
        "doc",
        "pos",
        "w",
        F.col("w").isin(sw).alias("is_stop"),
        F.sum(F.col("w").isin(sw).cast("int")).over(seg_w).alias("seg"),
    )
    phrases = (
        marked.filter(~F.col("is_stop"))
        .groupBy("doc", "seg")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ).alias("words")
        )
        .select(
            F.col("words"),
            F.array_join("words", " ").alias("phrase"),
            F.size("words").alias("plen"),
        )
    )
    word_stats = (
        phrases.select(F.explode("words").alias("w"), "plen")
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
        .select(
            "w",
            (F.col("deg").cast("double") / F.col("freq").cast("double"))
            .alias("wscore"),
        )
    )
    per_phrase = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.first("words").alias("words"),
    )
    scored = (
        per_phrase.select(
            "phrase", "n_occurrences", F.posexplode("words").alias("wi", "w")
        )
        .join(F.broadcast(word_stats), "w")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("wi", "wscore"))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["wscore"],
                ),
                6,
            ).alias("score")
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "phrase")
        .limit(top_k)
        .select("phrase", "n_occurrences", "score")
    )


def burrows_delta(
    tokens: DataFrame,
    group_col: str,
    tok_col: str = "tok",
    top_k: int = 30,
) -> DataFrame:
    """Burrows' Delta stylometric distance between corpus shards
    (Burrows 2002): z-score each shard's relative frequency of the
    top_k corpus words against the across-shard mean/std, then Delta =
    mean |z₁ − z₂| per shard pair — the authorship/provenance signal a
    corpus pipeline uses to flag shards whose function-word profile
    drifts from the rest (the distributional companion of the log-odds
    ``distinctive_terms``: that ranks words, this scores SHARDS).

    Float discipline: counts/totals exact BIGINTs; relative frequency,
    per-word mean, variance, z and the final /K are single divisions in
    a fixed op order; σ is one correctly-rounded sqrt; EVERY Σ is a
    LEFT fold over an explicitly sorted list (shards by name, words by
    token), so the DuckDB replay is bit-identical. Zero-variance words
    (identical f in every shard) carry no signal and are excluded; the
    divisor is the surviving word count ``n_words``.

    Plan shape: two hash aggregates to the (shard, word) and word
    grains, a dense shard×top_k frame built by cross-joining the
    bounded vocabulary (never the corpus), one self-join at the word
    grain for pairs. Raw tokens are touched exactly once.

    Output per unordered pair: ``g1, g2, n_words, delta`` (round 6).
    """
    base = tokens.select(
        F.col(group_col).alias("g"), F.col(tok_col).alias("w")
    )
    counts = base.groupBy("g", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("tot")
    )
    topw = (
        base.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cw"))
        .orderBy(F.col("cw").desc(), F.col("w"))
        .limit(top_k)
        .select("w")
    )
    dense = (
        totals.crossJoin(F.broadcast(topw))
        .join(counts, ["g", "w"], "left")
        .select(
            "g",
            "w",
            (
                F.coalesce("c", F.lit(0)).cast("double")
                / F.col("tot").cast("double")
            ).alias("f"),
        )
    )
    per_word = dense.groupBy("w").agg(
        F.sort_array(F.collect_list(F.struct("g", "f"))).alias("fs")
    )
    s = F.size("fs").cast("double")
    mu = (
        F.aggregate("fs", F.lit(0.0), lambda acc, t: acc + t["f"]) / s
    )
    with_mu = per_word.select("w", "fs", mu.alias("mu"))
    var = (
        F.aggregate(
            "fs",
            F.lit(0.0),
            lambda acc, t: acc
            + (t["f"] - F.col("mu")) * (t["f"] - F.col("mu")),
        )
        / F.size("fs").cast("double")
    )
    zrows = (
        with_mu.select("w", "mu", F.sqrt(var).alias("sigma"), "fs")
        .filter(F.col("sigma") > 0.0)
        .select("w", "mu", "sigma", F.explode("fs").alias("t"))
        .select(
            "w",
            F.col("t.g").alias("g"),
            ((F.col("t.f") - F.col("mu")) / F.col("sigma")).alias("z"),
        )
    )
    z1 = zrows.select("w", F.col("g").alias("g1"), F.col("z").alias("z1"))
    z2 = zrows.select("w", F.col("g").alias("g2"), F.col("z").alias("z2"))
    pairs = z1.join(z2, "w").filter(F.col("g1") < F.col("g2"))
    agg = pairs.groupBy("g1", "g2").agg(
        F.sort_array(
            F.collect_list(F.struct("w", F.abs(F.col("z1") - F.col("z2")).alias("d")))
        ).alias("ds")
    )
    delta = F.aggregate(
        "ds", F.lit(0.0), lambda acc, t: acc + t["d"]
    ) / F.size("ds").cast("double")
    return agg.select(
        "g1",
        "g2",
        F.size("ds").alias("n_words"),
        F.round(delta, 6).alias("delta"),
    ).orderBy("g1", "g2")


def chrf_score(
    pairs: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    ns: tuple[int, ...] = (2, 3),
    beta2: float = 4.0,
) -> DataFrame:
    """chrF — character n-gram F-score per (candidate, reference) pair
    (Popović 2015, β=2 by default so recall dominates) — the
    tokenization-free eval metric next to the word-level
    ``unigram_overlap_eval``: robust to tokenizer drift and morphology
    because it never segments. Whitespace is stripped first (the
    standard chrF convention); overlap is CLIPPED multiset overlap of
    the character n-grams.

    Float discipline: gram counts, matches (Σ min(c_cand, c_ref)) and
    totals are exact BIGINTs from order-free integer aggregates;
    precision, recall and F_β = (1+β²)PR / (β²P + R) are a fixed chain
    of single divisions (0 when a side has no grams).

    Plan shape: grams materialize as one explode per side (rows ≈
    Σ len(text) · |ns| — linear, no pairwise anything), collapse in ONE
    (id, n, gram) hash aggregate, then an (id, n) rollup.

    Output per (id, n): ``id_col, n, matched, cand_grams, ref_grams,
    prec, rec, fscore`` (round 6).
    """
    base = pairs.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(F.col(cand_col), " ", "").alias("c"),
        F.regexp_replace(F.col(ref_col), " ", "").alias("r"),
    ).select(
        "id",
        "c",
        "r",
        F.explode(F.array(*[F.lit(int(n)) for n in ns])).alias("n"),
    )

    def grams(col: str):
        ln = F.length(col)
        seq = F.sequence(F.lit(1), (ln - F.col("n") + 1).cast("int"))
        return F.when(
            ln >= F.col("n"),
            F.transform(seq, lambda i: F.substring(F.col(col), i, F.col("n"))),
        ).otherwise(F.array().cast("array<string>"))

    cg = base.select(
        "id", "n", F.explode(grams("c")).alias("g"), F.lit(1).alias("cc"),
        F.lit(0).alias("cr"),
    )
    rg = base.select(
        "id", "n", F.explode(grams("r")).alias("g"), F.lit(0).alias("cc"),
        F.lit(1).alias("cr"),
    )
    per_gram = (
        cg.unionAll(rg)
        .groupBy("id", "n", "g")
        .agg(
            F.sum("cc").cast("long").alias("nc"),
            F.sum("cr").cast("long").alias("nr"),
        )
    )
    rollup = per_gram.groupBy("id", "n").agg(
        F.sum(F.least("nc", "nr")).alias("matched"),
        F.sum("nc").alias("cand_grams"),
        F.sum("nr").alias("ref_grams"),
    )
    prec = F.when(
        F.col("cand_grams") > 0,
        F.col("matched").cast("double") / F.col("cand_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("ref_grams") > 0,
        F.col("matched").cast("double") / F.col("ref_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    with_pr = rollup.select(
        F.col("id").alias(id_col),
        "n",
        "matched",
        "cand_grams",
        "ref_grams",
        prec.alias("p"),
        rec.alias("r"),
    )
    fscore = F.when(
        (F.lit(beta2) * F.col("p") + F.col("r")) > 0.0,
        (F.lit(1.0 + beta2) * F.col("p") * F.col("r"))
        / (F.lit(beta2) * F.col("p") + F.col("r")),
    ).otherwise(F.lit(0.0))
    return with_pr.select(
        id_col,
        "n",
        "matched",
        "cand_grams",
        "ref_grams",
        F.round("p", 6).alias("prec"),
        F.round("r", 6).alias("rec"),
        F.round(fscore, 6).alias("fscore"),
    ).orderBy(id_col, "n")
