"""Corpus-assembly operators for training-data pipelines: deterministic
train/val/test splits, overlapping token-window chunking, BM25 retrieval,
unigram-familiarity scoring, and a portable HyperLogLog distinct sketch.

Reference parity note: cernan has no corpus layer (it is a telemetry
daemon); these are the training-data-pipeline extensions the engine needs
at 100 TB. They follow the same portability discipline as the dedup/ANN
family (operators/dedup.py): the scale path would use xxhash64, while the
oracle-gate path uses the 31-bit polynomial hash from functions/porthash.py
that DuckDB replays bit-for-bit, so every operator here is value-checked,
not rows-only.

Scale design (100 TB posture), per operator:
- ``train_val_split``: pure narrow map — a hash of the stable doc key, no
  shuffle, no state. The split is a function of the key alone, so it is
  reproducible across runs, shards and engines (resumable ingest keeps
  assignments stable).
- ``doc_token_chunks``: split + sequence + explode — narrow per-row fan-out
  inside one stage; chunk count is O(len/stride) so output scales with
  input bytes, never with corpus size.
- ``bm25_scores``: term frequencies are computed with ``F.filter`` over the
  token array (NO explode, NO per-term shuffle); the only wide op is one
  corpus-level scalar aggregate (N, avgdl, df per literal term) that
  reduces to a single row, broadcast back into a narrow scoring map.
- ``unigram_familiarity``: two hash aggregates with map-side combine
  (vocab build caps at top-K rows; per-doc rollup emits one row per doc
  per partition pre-shuffle) + one broadcast join of the tiny vocab.
- ``hll_distinct``: explode → per-(group, register) MAX — map-side combine
  collapses each partition to ≤ groups×m rows before the exchange — then a
  second tiny aggregate folds the m registers. Register state is mergeable
  (MAX), which is exactly what makes HLL shard-parallel at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cernan_spark.functions.porthash import MERSENNE31, portable_hash

# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------

SPLIT_SALT = ":split42"


def train_val_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each row to train/val/test by hashing its stable key.

    The assignment is a pure function of the key (portable 31-bit hash of
    ``key || SPLIT_SALT``, mod 1000), so it is stable across runs, shards,
    engines and cluster sizes — the property a resumable 100 TB ingest
    needs so that a re-run never migrates a document between splits.
    """
    h = portable_hash(F.concat(F.col(key_col).cast("string"), F.lit(SPLIT_SALT)))
    bucket = (h % 1000).cast("int")
    split = (
        F.when(bucket < train_pct * 10, F.lit("train"))
        .when(bucket < (train_pct + val_pct) * 10, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split_bucket", bucket).withColumn("split", split)


def train_val_split_sql(
    key_expr: str, train_pct: int = 80, val_pct: int = 10
) -> tuple[str, str]:
    """DuckDB twins of the bucket and split expressions."""
    from cernan_spark.functions.porthash import portable_hash_sql

    h = portable_hash_sql(f"CAST({key_expr} AS VARCHAR) || '{SPLIT_SALT}'")
    bucket = f"CAST(({h}) % 1000 AS INTEGER)"
    split = (
        f"CASE WHEN {bucket} < {train_pct * 10} THEN 'train' "
        f"WHEN {bucket} < {(train_pct + val_pct) * 10} THEN 'val' "
        "ELSE 'test' END"
    )
    return bucket, split


# ---------------------------------------------------------------------------
# overlapping token-window chunking
# ---------------------------------------------------------------------------


def doc_token_chunks(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping token windows (the standard
    pretraining / RAG chunking shape: window=chunk_tokens, hop=stride).

    Chunk starts are 0, stride, 2·stride, … while start < n_tokens; the
    final chunk may be short. Narrow explode, no shuffle.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    out = (
        df.withColumn("__toks", toks)
        .withColumn("__start", F.explode(starts))
        .withColumn("chunk_idx", (F.col("__start") / stride).cast("int"))
        .withColumn(
            "chunk_text",
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens), " "
            ),
        )
        .withColumn(
            "n_chunk_tokens",
            F.least(F.lit(chunk_tokens), F.size(F.col("__toks")) - F.col("__start")),
        )
        .drop("__toks", "__start")
    )
    return out


# ---------------------------------------------------------------------------
# BM25 retrieval against a literal query
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 score of every document against ``query_terms``.

    Plan shape: term frequencies come from ``F.filter`` over the token
    array (a narrow map — the corpus is NEVER exploded or shuffled);
    corpus statistics (N, avgdl, per-term df) reduce to ONE scalar row,
    cross-joined back (broadcast of a single row). The per-doc score sums
    the per-term contributions in the literal order of ``query_terms``,
    so the floating-point fold order is deterministic and cross-engine
    reproducible.
    """
    toks = F.split(F.col(text_col), " ")
    t = df.withColumn("__dl", F.size(toks))
    for i, term in enumerate(query_terms):
        t = t.withColumn(
            f"__tf{i}", F.size(F.filter(toks, lambda x: x == F.lit(term)))
        )
    stats = t.agg(
        F.count("*").alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = t.crossJoin(F.broadcast(stats))
    n = F.col("__n").cast("double")
    avgdl = F.col("__sumdl").cast("double") / n
    score: Column = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"__tf{i}").cast("double")
        dfi = F.col(f"__df{i}").cast("double")
        idf = F.log((n - dfi + 0.5) / (dfi + 0.5) + 1.0)
        denom = tf + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl)
        score = score + idf * (tf * (k1 + 1.0)) / denom
    out = scored.withColumn("bm25", score).withColumn(
        "n_query_hits",
        sum(
            (F.col(f"__tf{i}") > 0).cast("int") for i in range(len(query_terms))
        ),
    )
    drop = (
        ["__dl", "__n", "__sumdl"]
        + [f"__tf{i}" for i in range(len(query_terms))]
        + [f"__df{i}" for i in range(len(query_terms))]
    )
    return out.drop(*drop)


def bm25_oracle_sql(
    query_terms: list[str],
    table: str = "documents",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`bm25_scores` + the entry query's projection
    (docs with ≥1 hit, score rounded, rank by (rounded score desc, doc_id)).
    Same literal fold order for the score sum."""
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(query_terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    parts = []
    for i in range(len(query_terms)):
        idf = f"ln((s.n - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)"
        denom = f"(t.tf{i} + {k1} * (1.0 - {b} + {b} * t.dl / (s.sumdl / s.n)))"
        parts.append(f"{idf} * (t.tf{i} * ({k1} + 1.0)) / {denom}")
    score = "0.0 + " + " + ".join(parts)
    hits = " + ".join(
        f"(CASE WHEN t.tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(query_terms))
    )
    return f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS dl, {tf_cols}
            FROM {table}
        ), s AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(dl) AS DOUBLE) AS sumdl, {df_cols}
            FROM t
        )
        SELECT t.doc_id, round({score}, 6) AS bm25, CAST({hits} AS INTEGER) AS n_query_hits
        FROM t, s
        WHERE {hits} > 0
    """


# ---------------------------------------------------------------------------
# unigram familiarity (corpus-frequency quality signal)
# ---------------------------------------------------------------------------


def unigram_familiarity(
    df: DataFrame,
    text_col: str = "text",
    vocab_k: int = 30,
) -> DataFrame:
    """Score documents by how familiar their tokens are to the corpus:
    total corpus frequency of in-vocab tokens (exact bigint), OOV count vs
    the top-``vocab_k`` vocabulary, and token total. All-integer outputs,
    so the oracle equality is exact by construction.

    Plan: ONE corpus-wide token count (hash agg with map-side combine),
    capped to top-K rows on (count desc, token asc) — deterministic
    tie-break — then a broadcast join against the re-exploded corpus and a
    per-doc rollup. The vocab is dimension-sized by construction (K rows),
    so the corpus-side join never shuffles.
    """
    toks_df = df.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    vocab = (
        toks_df.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(vocab_k)
    )
    joined = toks_df.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("familiarity"),
        F.sum(F.col("cnt").isNull().cast("long")).alias("n_oov"),
    )


# ---------------------------------------------------------------------------
# portable HyperLogLog distinct sketch
# ---------------------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
#: bits of hash left after the register index is consumed (32-bit mixed hash)
HLL_REST_BITS = 32 - HLL_P

_FMIX_C1 = 0x85EBCA6B
_FMIX_C2 = 0xC2B2AE35
_M32 = 0xFFFFFFFF


def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _mulmod32(h: Column, c: int) -> Column:
    """(h · c) mod 2^32 without int64 overflow (h < 2^32, c < 2^32):
    split h into 16-bit halves — both partial products stay < 2^48."""
    lo = (h.bitwiseAND(F.lit(0xFFFF)) * F.lit(c))
    hi = (F.shiftright(h, 16) * F.lit(c)).bitwiseAND(F.lit(0xFFFF))
    return (lo + hi * F.lit(65536)).bitwiseAND(F.lit(_M32))


def fmix32(h: Column) -> Column:
    """Murmur3's 32-bit finalizer over the portable polynomial hash.

    The raw 31-bit polynomial hash has almost no avalanche (sequential
    keys land in clustered registers, which saturates an HLL at ~1.5·m —
    measured), so sketch-grade uses mix it first. Pure integer xor/shift/
    masked-multiply — both engines compute it bit-identically (the
    multiplies use :func:`_mulmod32` to stay inside signed int64).
    """
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = _mulmod32(h, _FMIX_C1)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = _mulmod32(h, _FMIX_C2)
    return h.bitwiseXOR(F.shiftright(h, 16))


def fmix32_sql(expr: str) -> str:
    """DuckDB twin of :func:`fmix32` (xor / >> / & / split multiply)."""

    def mul(e: str, c: int) -> str:
        return (
            f"((({e}) & 65535) * {c} + "
            f"(((({e}) >> 16) * {c}) & 65535) * 65536) & {_M32}"
        )

    s1 = f"xor({expr}, ({expr}) >> 16)"
    s2 = mul(s1, _FMIX_C1)
    s3 = f"xor(({s2}), ({s2}) >> 13)"
    s4 = mul(s3, _FMIX_C2)
    return f"xor(({s4}), ({s4}) >> 16)"


def hll_register_cols(hash_col: Column) -> tuple[Column, Column]:
    """(register index, rho) for a 32-bit mixed hash value.

    register = h mod m; rho = 1 + leading zeros of the remaining
    ``HLL_REST_BITS`` bits = (REST_BITS + 1) - bit_length(rest), with
    bit_length(0) defined as 0 (an all-zero rest gives the max rho).
    bit_length is computed as length(bin(rest)) — both engines print
    binary without leading zeros, and both print '0' for zero (special-
    cased).
    """
    reg = (hash_col % HLL_M).cast("int")
    rest = F.shiftright(hash_col, HLL_P)
    nbits = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    rho = (F.lit(HLL_REST_BITS + 1) - nbits).cast("int")
    return reg, rho


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    item_col: Column,
    name: str = "items",
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``item_col`` per group,
    using the portable 31-bit hash so DuckDB replays the sketch exactly.

    Two aggregates: per-(group, register) MAX(rho) — mergeable state, the
    reason HLL shards cleanly — then the register fold. The standard
    small-range (linear counting) correction applies when E ≤ 2.5·m and
    empty registers exist. Outputs round the estimate to 4 decimals; the
    harmonic sum is a dyadic rational (sum of 256 powers of two ≥ 2^-25),
    exact in binary regardless of summation order.
    """
    regs = hll_registers(df, group_cols, item_col)
    return _hll_fold(regs, group_cols, name)


def hll_registers(
    df: DataFrame, group_cols: list[str], item_col: Column
) -> DataFrame:
    """Per-(group, register) MAX(rho) — the sketch's MERGEABLE state.
    Persist this frame per ingest shard; a later run unions its registers
    with the stored ones and re-maxes, and the merged estimate is
    bit-identical to one pass over the union (max is idempotent,
    commutative, associative — proven by the ``hll_resume`` gate)."""
    h = fmix32(portable_hash(item_col))
    reg, rho = hll_register_cols(h)
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge_registers(
    shards: list[DataFrame], group_cols: list[str], name: str = "items"
) -> DataFrame:
    """Merge persisted register frames from N ingest shards into one
    estimate: union → per-register max → the same fold as one-pass."""
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    regs = merged.groupBy(*group_cols, "reg").agg(
        F.max("max_rho").alias("max_rho")
    )
    return _hll_fold(regs, group_cols, name)


def _hll_fold(
    regs: DataFrame, group_cols: list[str], name: str
) -> DataFrame:
    m = float(HLL_M)
    alpha = _hll_alpha(HLL_M)
    folded = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("present_sum"),
    )
    harmonic = F.col("present_sum") + (F.lit(m) - F.col("n_present"))
    raw_e = F.lit(alpha * m * m) / harmonic
    n_zero = (F.lit(HLL_M) - F.col("n_present")).cast("int")
    corrected = F.when(
        (raw_e <= 2.5 * m) & (n_zero > 0),
        F.lit(m) * F.log(F.lit(m) / n_zero.cast("double")),
    ).otherwise(raw_e)
    return folded.select(
        *group_cols,
        n_zero.alias("n_zero_registers"),
        F.round(harmonic, 6).alias("harmonic_sum"),
        F.round(corrected, 4).alias(f"hll_{name}"),
    )


def hll_oracle_sql(
    group_expr: str,
    item_expr: str,
    from_clause: str,
    name: str = "items",
    group_out: str = "grp",
) -> str:
    """DuckDB twin of :func:`hll_distinct` (group by one expression)."""
    from cernan_spark.functions.porthash import portable_hash_sql

    h = fmix32_sql(portable_hash_sql(item_expr))
    m = float(HLL_M)
    alpha = _hll_alpha(HLL_M)
    return f"""
        WITH hashed AS (
            SELECT {group_expr} AS grp, ({h}) AS h FROM {from_clause}
        ), regs AS (
            SELECT grp, CAST(h % {HLL_M} AS INTEGER) AS reg,
                   max(CASE WHEN (h >> {HLL_P}) = 0
                            THEN {HLL_REST_BITS + 1}
                            ELSE {HLL_REST_BITS + 1}
                                 - length(bin(h >> {HLL_P}))
                       END) AS max_rho
            FROM hashed GROUP BY 1, 2
        ), folded AS (
            SELECT grp, count(*) AS n_present,
                   sum(power(2.0, -max_rho)) AS present_sum
            FROM regs GROUP BY 1
        )
        SELECT grp AS {group_out},
               CAST({HLL_M} - n_present AS INTEGER) AS n_zero_registers,
               round(present_sum + ({m} - n_present), 6) AS harmonic_sum,
               round(CASE WHEN ({alpha * m * m}) / (present_sum + ({m} - n_present))
                               <= {2.5 * m}
                          AND n_present < {HLL_M}
                     THEN {m} * ln({m} / CAST({HLL_M} - n_present AS DOUBLE))
                     ELSE ({alpha * m * m}) / (present_sum + ({m} - n_present))
                     END, 4) AS hll_{name}
        FROM folded
    """


#: the literal retrieval query for the BM25 entry/bench path — terms chosen
#: to span high- and low-df vocabulary in the synthetic corpus
BM25_QUERY = ["spark", "join", "window", "vector", "stream"]


# ---------------------------------------------------------------------------
# PMI bigram collocations
# ---------------------------------------------------------------------------


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    collocation signal a tokenizer-training / phrase-mining pass runs
    over the corpus: pmi = ln(p(x,y) / (p(x)·p(y))) with p(x,y) over
    total bigram count and p(x) over total token count.

    All aggregation is INTEGER (counts); the only floats are five ``ln``
    calls composed in a fixed per-row expression —
    ``ln c_xy + 2·ln N_tok − ln N_big − ln c_x − ln c_y`` — so there is
    no order-sensitive float aggregation anywhere (the direct ratio
    would overflow int64 at corpus scale: c·N² ≈ 10¹⁸ at sf0.1 already).

    Plan: one explode→agg for bigram counts (shuffle keyed by the pair),
    one for token counts (keyed by token), the scalar totals reduce to
    one broadcast row, and the two count joins are dimension-sized
    (vocab) — broadcast here, sort-merge with salting on the hot-token
    side at 100 TB. ``min_count`` bounds the output like every LSH cap
    in operators/dedup.py: disclosed, not silent.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    from cernan_spark.functions.expand import explode_staged

    pairs = explode_staged(
        df,
        [],
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(toks, i).alias("x"),
                F.element_at(toks, i + 1).alias("y"),
            ),
        ),
        "p",
    ).select("p.x", "p.y")
    big = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    totals = uni.agg(
        F.sum("c_tok").alias("n_tok"),
    ).crossJoin(big.agg(F.sum("c_xy").alias("n_big")))
    scored = (
        big.filter(F.col("c_xy") >= min_count)
        .join(F.broadcast(uni.withColumnRenamed("tok", "x")), "x")
        .withColumnRenamed("c_tok", "c_x")
        .join(F.broadcast(uni.withColumnRenamed("tok", "y")), "y")
        .withColumnRenamed("c_tok", "c_y")
        .crossJoin(F.broadcast(totals))
    )
    pmi = (
        F.log(F.col("c_xy").cast("double"))
        + F.lit(2.0) * F.log(F.col("n_tok").cast("double"))
        - F.log(F.col("n_big").cast("double"))
        - F.log(F.col("c_x").cast("double"))
        - F.log(F.col("c_y").cast("double"))
    )
    return scored.select(
        "x", "y", "c_xy", "c_x", "c_y", F.round(pmi, 6).alias("pmi")
    )


def pmi_oracle_sql(table: str = "documents", min_count: int = 3) -> str:
    """DuckDB twin of :func:`pmi_bigrams` (same fixed ln composition)."""
    return f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM {table}
        ), pairs AS (
            SELECT string_split(text, ' ')[i] AS x,
                   string_split(text, ' ')[i + 1] AS y
            FROM {table},
                 unnest(range(1, len(string_split(text, ' ')))) AS u(i)
        ), big AS (
            SELECT x, y, count(*) AS c_xy FROM pairs GROUP BY 1, 2
        ), uni AS (
            SELECT tok, count(*) AS c_tok FROM toks GROUP BY 1
        ), tot AS (
            SELECT (SELECT sum(c_tok) FROM uni) AS n_tok,
                   (SELECT sum(c_xy) FROM big) AS n_big
        )
        SELECT b.x, b.y, b.c_xy, ux.c_tok AS c_x, uy.c_tok AS c_y,
               round(ln(CAST(b.c_xy AS DOUBLE))
                     + 2.0 * ln(CAST(t.n_tok AS DOUBLE))
                     - ln(CAST(t.n_big AS DOUBLE))
                     - ln(CAST(ux.c_tok AS DOUBLE))
                     - ln(CAST(uy.c_tok AS DOUBLE)), 6) AS pmi
        FROM big b
        JOIN uni ux ON ux.tok = b.x
        JOIN uni uy ON uy.tok = b.y
        CROSS JOIN tot t
        WHERE b.c_xy >= {min_count}
    """


# ---------------------------------------------------------------------------
# unigram language-model log-probability (perplexity-style quality score)
# ---------------------------------------------------------------------------


def unigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Score each doc under the corpus's own unigram LM — the CCNet-style
    quality filter: logprob = Σₜ ln(cnt(t)/N) = Σₜ ln cnt(t) − n·ln N,
    avg_logprob = logprob / n (rarer/weirder text scores lower).

    Float discipline: the per-doc Σ ln cnt folds over the doc's count
    multiset SORTED ascending (equal doubles commute exactly), so the
    fold order — hence every rounding — is pinned cross-engine; n·ln N
    is one per-row expression. No order-sensitive float shuffle agg.

    Plan: one token-count aggregate (vocab-sized, broadcast back), one
    per-doc aggregate that collects the count multiset. At 100 TB the
    count join keys on the token (salt hot stopwords); the per-doc
    collect is bounded by doc length.
    """
    toks_df = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    uni = toks_df.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = uni.agg(F.sum("cnt").alias("n_total"))
    joined = toks_df.join(F.broadcast(uni), "tok")
    per_doc = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sort_array(F.collect_list("cnt")).alias("__cnts"),
    )
    sum_ln = F.aggregate(
        F.col("__cnts"),
        F.lit(0.0),
        lambda acc, c: acc + F.log(c.cast("double")),
    )
    out = per_doc.crossJoin(F.broadcast(totals))
    logprob = sum_ln - F.col("n_tokens").cast("double") * F.log(
        F.col("n_total").cast("double")
    )
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(logprob, 6).alias("logprob"),
        F.round(logprob / F.col("n_tokens").cast("double"), 6).alias(
            "avg_logprob"
        ),
    )


def unigram_logprob_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`unigram_logprob` (same sorted fold)."""
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM {table}
        ), uni AS (
            SELECT tok, count(*) AS cnt FROM toks GROUP BY 1
        ), tot AS (SELECT sum(cnt) AS n_total FROM uni),
        per_doc AS (
            SELECT t.doc_id, count(*) AS n_tokens,
                   list(u.cnt ORDER BY u.cnt) AS cnts
            FROM toks t JOIN uni u USING (tok) GROUP BY 1
        ), folded AS (
            SELECT doc_id, n_tokens,
                   list_reduce(
                     list_prepend(0.0,
                       list_transform(cnts, c -> ln(CAST(c AS DOUBLE)))),
                     (a, x) -> a + x)
                   - CAST(n_tokens AS DOUBLE)
                     * ln(CAST((SELECT n_total FROM tot) AS DOUBLE)) AS lp
            FROM per_doc
        )
        SELECT doc_id, n_tokens, round(lp, 6) AS logprob,
               round(lp / CAST(n_tokens AS DOUBLE), 6) AS avg_logprob
        FROM folded
    """


# ---------------------------------------------------------------------------
# winsorized length statistics
# ---------------------------------------------------------------------------


def winsorized_length_stats(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized document-length statistics: exact p05/p95
    token-count percentiles (linear interpolation), tail counts, and the
    winsorized mean (tails clamped to the percentile bounds).

    Float discipline: the winsorized mean is assembled from EXACT parts
    — an integer sum of in-range lengths plus n_below·p05 + n_above·p95
    composed in one per-row expression — never a float sum across rows
    whose shuffle order could vary. Both engines use the same
    ``h = (n−1)·q; v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1] − v[⌊h⌋])`` interpolation
    (Spark ``percentile`` ↔ DuckDB ``quantile_cont``).

    Plan: pass 1 computes the per-group percentiles (group-count-sized
    result, broadcast back); pass 2 is one conditional-sum aggregate.
    At 100 TB pass 1 becomes ``approx_percentile``/t-digest — the exact
    form here is what the oracle can replay.
    """
    lens = df.select(
        F.col(group_col), F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    pcts = lens.groupBy(group_col).agg(
        F.percentile("n_tokens", F.lit(lo)).alias("p_lo"),
        F.percentile("n_tokens", F.lit(hi)).alias("p_hi"),
    )
    j = lens.join(F.broadcast(pcts), group_col)
    x = F.col("n_tokens").cast("double")
    agg = j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(x < F.col("p_lo"), 1).otherwise(0)).alias("n_below"),
        F.sum(F.when(x > F.col("p_hi"), 1).otherwise(0)).alias("n_above"),
        F.sum(
            F.when(
                (x >= F.col("p_lo")) & (x <= F.col("p_hi")), F.col("n_tokens")
            ).otherwise(F.lit(0))
        ).alias("__mid_sum"),
        F.first("p_lo").alias("p_lo"),
        F.first("p_hi").alias("p_hi"),
    )
    wmean = (
        F.col("__mid_sum").cast("double")
        + F.col("n_below").cast("double") * F.col("p_lo")
        + F.col("n_above").cast("double") * F.col("p_hi")
    ) / F.col("n_docs").cast("double")
    return agg.select(
        group_col,
        "n_docs",
        F.round("p_lo", 6).alias("p_lo"),
        F.round("p_hi", 6).alias("p_hi"),
        "n_below",
        "n_above",
        F.round(wmean, 6).alias("winsorized_mean"),
    )


def winsorized_oracle_sql(
    table: str = "documents",
    group_col: str = "lang",
    lo: float = 0.05,
    hi: float = 0.95,
) -> str:
    """DuckDB twin of :func:`winsorized_length_stats`."""
    return f"""
        WITH lens AS (
            SELECT {group_col} AS grp,
                   len(string_split(text, ' ')) AS n_tokens
            FROM {table}
        ), pcts AS (
            SELECT grp, quantile_cont(n_tokens, {lo}) AS p_lo,
                        quantile_cont(n_tokens, {hi}) AS p_hi
            FROM lens GROUP BY 1
        ), agg AS (
            SELECT l.grp, count(*) AS n_docs,
                   sum(CASE WHEN l.n_tokens < p.p_lo THEN 1 ELSE 0 END) AS n_below,
                   sum(CASE WHEN l.n_tokens > p.p_hi THEN 1 ELSE 0 END) AS n_above,
                   sum(CASE WHEN l.n_tokens >= p.p_lo AND l.n_tokens <= p.p_hi
                            THEN l.n_tokens ELSE 0 END) AS mid_sum,
                   any_value(p.p_lo) AS p_lo, any_value(p.p_hi) AS p_hi
            FROM lens l JOIN pcts p USING (grp) GROUP BY 1
        )
        SELECT grp AS {group_col}, n_docs,
               round(p_lo, 6) AS p_lo, round(p_hi, 6) AS p_hi,
               CAST(n_below AS BIGINT) AS n_below,
               CAST(n_above AS BIGINT) AS n_above,
               round((CAST(mid_sum AS DOUBLE)
                      + CAST(n_below AS DOUBLE) * p_lo
                      + CAST(n_above AS DOUBLE) * p_hi)
                     / CAST(n_docs AS DOUBLE), 6) AS winsorized_mean
        FROM agg
    """


# ---------------------------------------------------------------------------
# held-out bigram LM log-probability (stupid backoff)
# ---------------------------------------------------------------------------


def bigram_logprob_holdout(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Score the VAL split under a bigram LM counted on the TRAIN split —
    the contextual generalization of :func:`unigram_logprob` (KenLM-style
    quality filtering, CCNet §4.2). Because the LM is held out, the
    stupid-backoff branch (Brants et al. 2007: ``S(y|x) = c(xy)/c(x)`` if
    seen, else ``0.4·c(y)/N``) genuinely fires on unseen bigrams — scoring
    a corpus under its own counts would never exercise it. Unseen
    unigrams floor at count 1 (``ln 1 = 0``).

    Float discipline: every term is a sum/difference of ``ln`` of INTEGER
    counts (the proven-cross-engine class) — the backoff constant 0.4 is
    expressed as ``ln 2 − ln 5`` so no non-integer double ever enters
    libm; per-doc terms fold ascending by token position from 0.0, so the
    fold order and every intermediate rounding are pinned.

    Plan: two vocab-sized TRAIN aggregates broadcast back onto the VAL
    positions (facts never shuffle for the lookups); ONE per-doc
    aggregate collects the (pos, lp) list. At 100 TB the bigram table may
    outgrow a broadcast — then the (x, y) join keys shuffle once, salted
    on stopword-pair hot keys, and the fold is unchanged. Docs with < 2
    tokens have no bigram positions and drop out (documented).
    """
    s = train_val_split(df, key_col=key_col)
    toks = F.split(F.col(text_col), " ")
    train = s.filter(F.col("split") == "train").withColumn("__toks", toks)
    val = s.filter(F.col("split") == "val").withColumn("__toks", toks)

    t_uni = train.select(
        F.explode("__toks").alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = t_uni.agg(F.sum("cnt").alias("n_train"))
    n = F.size("__toks")
    from cernan_spark.functions.expand import explode_staged

    t_big = explode_staged(
        train,
        [],
        F.transform(
            F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: F.struct(
                F.element_at("__toks", i - 1).alias("x"),
                F.element_at("__toks", i).alias("y"),
            ),
        ),
        "b",
    ).select("b.x", "b.y").groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("c_xy")
    )

    pos = explode_staged(
        val.withColumn("__n", n).filter(F.col("__n") >= 2),
        [key_col],
        F.transform(
            F.sequence(F.lit(2), F.col("__n")),
            lambda i: F.struct(
                i.alias("pos"),
                F.element_at("__toks", i - 1).alias("x"),
                F.element_at("__toks", i).alias("y"),
            ),
        ),
        "p",
    ).select(key_col, "p.pos", "p.x", "p.y")

    ux = t_uni.select(F.col("tok").alias("x"), F.col("cnt").alias("c_x"))
    uy = t_uni.select(F.col("tok").alias("y"), F.col("cnt").alias("c_y"))
    j = (
        pos.join(F.broadcast(t_big), ["x", "y"], "left")
        .join(F.broadcast(ux), "x", "left")
        .join(F.broadcast(uy), "y", "left")
        .crossJoin(F.broadcast(totals))
    )
    ln = F.log
    lp = F.when(
        F.col("c_xy").isNotNull(),
        ln(F.col("c_xy").cast("double")) - ln(F.col("c_x").cast("double")),
    ).otherwise(
        (ln(F.lit(2.0)) - ln(F.lit(5.0)))
        + F.coalesce(ln(F.col("c_y").cast("double")), F.lit(0.0))
        - ln(F.col("n_train").cast("double"))
    )
    scored = j.select(key_col, "pos", lp.alias("lp"))
    folded = scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "lp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["lp"],
        ).alias("__lp"),
    )
    return folded.select(
        key_col,
        "n_scored",
        F.round("__lp", 6).alias("logprob"),
        F.round(F.col("__lp") / F.col("n_scored").cast("double"), 6).alias(
            "avg_logprob"
        ),
    )


def bigram_logprob_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`bigram_logprob_holdout` (same split hash,
    same backoff expression tree, same ascending-pos fold)."""
    _, split = train_val_split_sql("doc_id")
    return f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   {split} AS split
            FROM {table}
        ), t_uni AS (
            SELECT tok, count(*) AS cnt
            FROM (SELECT unnest(toks) AS tok FROM base WHERE split = 'train')
            GROUP BY 1
        ), tot AS (SELECT sum(cnt) AS n_train FROM t_uni),
        t_big AS (
            SELECT x, y, count(*) AS c_xy FROM (
                SELECT toks[i - 1] AS x, toks[i] AS y
                FROM base, unnest(range(2, len(toks) + 1)) AS t(i)
                WHERE split = 'train'
            ) GROUP BY 1, 2
        ), pos AS (
            SELECT doc_id, CAST(i AS INTEGER) AS pos,
                   toks[i - 1] AS x, toks[i] AS y
            FROM base, unnest(range(2, len(toks) + 1)) AS t(i)
            WHERE split = 'val'
        ), scored AS (
            SELECT p.doc_id, p.pos,
                   CASE WHEN b.c_xy IS NOT NULL
                        THEN ln(CAST(b.c_xy AS DOUBLE))
                             - ln(CAST(ux.cnt AS DOUBLE))
                        ELSE ((ln(2.0) - ln(5.0))
                              + COALESCE(ln(CAST(uy.cnt AS DOUBLE)), 0.0))
                             - ln(CAST((SELECT n_train FROM tot) AS DOUBLE))
                   END AS lp
            FROM pos p
            LEFT JOIN t_big b ON b.x = p.x AND b.y = p.y
            LEFT JOIN t_uni ux ON ux.tok = p.x
            LEFT JOIN t_uni uy ON uy.tok = p.y
        ), folded AS (
            SELECT doc_id, count(*) AS n_scored,
                   list_reduce(
                     list_prepend(0.0, list(lp ORDER BY pos)),
                     (a, x) -> a + x) AS lp
            FROM scored GROUP BY 1
        )
        SELECT doc_id, n_scored, round(lp, 6) AS logprob,
               round(lp / CAST(n_scored AS DOUBLE), 6) AS avg_logprob
        FROM folded
    """


# ---------------------------------------------------------------------------
# token-distribution drift: Jensen–Shannon divergence between splits
# ---------------------------------------------------------------------------


def js_divergence_drift(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Jensen–Shannon divergence between the TRAIN and VAL token
    distributions — the distribution-drift monitor a scheduled corpus
    ingest runs between snapshots (Lin 1991; the symmetric, bounded
    cousin of KL). A shard whose JSD against the accepted corpus spikes
    signals a scraper regression or contamination burst before any
    downstream model sees it. Reference analog: cernan's self-telemetry
    counts what flowed (src/metric/telemetry snapshot counters); it has
    no distributional monitor — this is the training-pipeline extension.

    Per union-vocabulary token with train count ``a`` (total NA) and val
    count ``b`` (total NB), the contribution in nats is

        0.5·(a/NA)·ln(2·a·NB / (a·NB + b·NA))   [a > 0]
      + 0.5·(b/NB)·ln(2·b·NA / (a·NB + b·NA))   [b > 0]

    Float discipline: a, b, NA, NB are exact integers cast to double;
    every product/sum/quotient inside ``ln`` is written in one fixed
    left-associative shape so both engines round identically (documented
    pattern: IEEE ops on integer-valued doubles are deterministic; at
    true 100 TB scale the int64 products would overflow but the double
    products — 53-bit mantissa — only lose ulps, identically in both
    engines). The total folds in a PINNED order: tokens fold ascending
    within ``pmod(portable_hash(tok), n_buckets)`` buckets, bucket
    partials fold ascending by bucket id — so no vocabulary-sized list
    ever lands in one task, yet the sum is bit-reproducible.

    Plan: ONE token-grain shuffle (groupBy tok over both splits at once),
    ONE bucket-grain aggregate (n_buckets rows), one 1-row reduce.
    """
    s = train_val_split(df, key_col=key_col).filter(
        F.col("split").isin("train", "val")
    )
    toks = s.select(
        "split", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
        F.sum("a").cast("long").alias("n_train_tokens"),
        F.sum("b").cast("long").alias("n_val_tokens"),
    )
    c = counts.crossJoin(F.broadcast(totals))
    ad, bd = F.col("a").cast("double"), F.col("b").cast("double")
    # den spelled as (a*NB + b*NA), the exact shape the oracle uses
    den = ad * F.col("nb") + bd * F.col("na")
    term = F.when(
        F.col("a") > 0,
        F.lit(0.5)
        * (ad / F.col("na"))
        * F.log(F.lit(2.0) * ad * F.col("nb") / den),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("b") > 0,
        F.lit(0.5)
        * (bd / F.col("nb"))
        * F.log(F.lit(2.0) * bd * F.col("na") / den),
    ).otherwise(F.lit(0.0))
    per_tok = c.select(
        F.pmod(portable_hash(F.col("tok")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        "tok",
        term.alias("term"),
        "n_train_tokens",
        "n_val_tokens",
    )
    per_bucket = per_tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("part"),
        F.first("n_train_tokens").alias("n_train_tokens"),
        F.first("n_val_tokens").alias("n_val_tokens"),
    )
    return per_bucket.groupBy().agg(
        F.sum("vocab").cast("long").alias("vocab_union"),
        F.first("n_train_tokens").alias("n_train_tokens"),
        F.first("n_val_tokens").alias("n_val_tokens"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bucket", "part"))),
                F.lit(0.0),
                lambda acc, x: acc + x["part"],
            ),
            6,
        ).alias("jsd_nats"),
    )


def js_divergence_oracle_sql(
    table: str = "documents", n_buckets: int = 64
) -> str:
    """DuckDB twin of :func:`js_divergence_drift` — same split hash, same
    expression shapes inside ``ln``, same two-level pinned fold."""
    from cernan_spark.functions.porthash import portable_hash_sql

    _, split = train_val_split_sql("doc_id")
    bucket = f"CAST(({portable_hash_sql('tok')}) % {n_buckets} AS INTEGER)"
    return f"""
        WITH toks AS (
            SELECT {split} AS split, unnest(string_split(text, ' ')) AS tok
            FROM {table}
        ), counts AS (
            SELECT tok,
                   sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS a,
                   sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS b
            FROM toks WHERE split IN ('train', 'val') GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(a) AS DOUBLE) AS na, CAST(sum(b) AS DOUBLE) AS nb,
                   CAST(sum(a) AS BIGINT) AS n_train_tokens,
                   CAST(sum(b) AS BIGINT) AS n_val_tokens
            FROM counts
        ), terms AS (
            SELECT {bucket} AS bucket, tok,
                   (CASE WHEN a > 0 THEN
                        0.5 * (CAST(a AS DOUBLE) / na)
                        * ln(2.0 * CAST(a AS DOUBLE) * nb
                             / (CAST(a AS DOUBLE) * nb + CAST(b AS DOUBLE) * na))
                    ELSE 0.0 END)
                 + (CASE WHEN b > 0 THEN
                        0.5 * (CAST(b AS DOUBLE) / nb)
                        * ln(2.0 * CAST(b AS DOUBLE) * na
                             / (CAST(a AS DOUBLE) * nb + CAST(b AS DOUBLE) * na))
                    ELSE 0.0 END) AS term
            FROM counts, tot
        ), per_bucket AS (
            SELECT bucket, count(*) AS vocab,
                   list_reduce(
                     list_prepend(0.0, list(term ORDER BY tok)),
                     (acc, x) -> acc + x) AS part
            FROM terms GROUP BY 1
        )
        SELECT CAST(sum(vocab) AS BIGINT) AS vocab_union,
               (SELECT n_train_tokens FROM tot) AS n_train_tokens,
               (SELECT n_val_tokens FROM tot) AS n_val_tokens,
               round(list_reduce(
                 list_prepend(0.0, list(part ORDER BY bucket)),
                 (acc, x) -> acc + x), 6) AS jsd_nats
        FROM per_bucket
    """


# ---------------------------------------------------------------------------
# distinct-n diversity profile
# ---------------------------------------------------------------------------


def distinct_ngram_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    max_n: int = 3,
) -> DataFrame:
    """Corpus diversity profile: per (group, n) the total and DISTINCT
    n-gram counts and their ratio — distinct-n (Li et al. 2016), the
    standard corpus-level repetitiveness monitor (a generator or scraper
    feeding near-identical text drives distinct-2/3 toward 0). Complements
    :func:`repetition_stats` which is per-document; this is the
    corpus-grain rollup a daily ingest report wants.

    Plan: explode each order's n-grams (narrow), ONE hash aggregate on
    (group, n, gram) — map-side combine kills the duplicate mass before
    the shuffle — then a tiny (group × n)-row rollup. The gram string
    never exceeds n tokens; at 100 TB swap the gram string for
    xxhash64(gram) shuffle keys (distinct counts unchanged modulo hash
    collisions, ~2^-64 per pair).
    """
    toks = F.split(F.col(text_col), " ")
    frames = []
    for n in range(1, max_n + 1):
        npos = F.size(toks) - F.lit(n - 1)
        grams = df.select(
            F.col(group_col).alias("grp"),
            F.lit(n).alias("n"),
            F.explode(
                F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("i"),
            toks.alias("__toks"),
        ).select(
            "grp",
            "n",
            F.array_join(F.slice("__toks", F.col("i"), n), " ").alias("gram"),
        )
        frames.append(grams)
    allg = frames[0]
    for f_ in frames[1:]:
        allg = allg.unionByName(f_)
    per_gram = allg.groupBy("grp", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_gram.groupBy("grp", "n")
        .agg(
            F.sum("cnt").cast("long").alias("total_ngrams"),
            F.count(F.lit(1)).alias("distinct_ngrams"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams").cast("double")
                / F.col("total_ngrams").cast("double"),
                6,
            ).alias("distinct_ratio"),
        )
    )


def distinct_ngram_oracle_sql(
    table: str = "documents", group_col: str = "lang", max_n: int = 3
) -> str:
    """DuckDB twin of :func:`distinct_ngram_profile` (same 1-based slice,
    same space join, same ratio rounding)."""
    arms = []
    for n in range(1, max_n + 1):
        arms.append(f"""
            SELECT {group_col} AS grp, {n} AS n,
                   array_to_string(toks[i:i+{n - 1}], ' ') AS gram
            FROM (SELECT {group_col}, string_split(text, ' ') AS toks
                  FROM {table}),
                 unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1))
                 AS t(i)
        """)
    union = " UNION ALL ".join(arms)
    return f"""
        WITH allg AS ({union}),
        per_gram AS (
            SELECT grp, n, gram, count(*) AS cnt FROM allg GROUP BY 1, 2, 3
        )
        SELECT grp AS {group_col}, n,
               CAST(sum(cnt) AS BIGINT) AS total_ngrams,
               CAST(count(*) AS BIGINT) AS distinct_ngrams,
               round(CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
                 AS distinct_ratio
        FROM per_gram GROUP BY 1, 2
    """


def jsd_top_drifters(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """The actionable view of :func:`js_divergence_drift`: the k tokens
    contributing MOST to the train/val Jensen–Shannon divergence, with
    counts and drift direction — what an ingest operator actually reads
    when the JSD alarm fires ("which tokens moved?"). Per-token JS
    contributions are non-negative (log-sum inequality), so top-k by
    (term DESC, tok ASC) is a deterministic set; the term doubles are
    bit-identical cross-engine (same expression shapes as the total).

    Plan: the same ONE token-grain aggregate as the total; top-k is
    Spark's TakeOrdered (per-partition heads merged on the driver) — no
    global sort of the vocabulary ever shuffles.
    """
    s = train_val_split(df, key_col=key_col).filter(
        F.col("split").isin("train", "val")
    )
    toks = s.select(
        "split", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
    )
    c = counts.crossJoin(F.broadcast(totals))
    ad, bd = F.col("a").cast("double"), F.col("b").cast("double")
    den = ad * F.col("nb") + bd * F.col("na")
    term = F.when(
        F.col("a") > 0,
        F.lit(0.5)
        * (ad / F.col("na"))
        * F.log(F.lit(2.0) * ad * F.col("nb") / den),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("b") > 0,
        F.lit(0.5)
        * (bd / F.col("nb"))
        * F.log(F.lit(2.0) * bd * F.col("na") / den),
    ).otherwise(F.lit(0.0))
    # direction: which split over-represents the token (rate comparison
    # a/NA vs b/NB spelled cross-multiplied in integers: a*NB vs b*NA)
    direction = F.when(
        ad * F.col("nb") > bd * F.col("na"), F.lit("train")
    ).otherwise(F.lit("val"))
    return (
        c.select(
            "tok",
            F.col("a").cast("long").alias("train_count"),
            F.col("b").cast("long").alias("val_count"),
            term.alias("__term"),
            direction.alias("over_in"),
        )
        .orderBy(F.col("__term").desc(), F.col("tok").asc())
        .limit(k)
        .select(
            "tok",
            "train_count",
            "val_count",
            F.round("__term", 6).alias("jsd_term"),
            "over_in",
        )
    )


def jsd_top_drifters_oracle_sql(table: str = "documents", k: int = 20) -> str:
    """DuckDB twin of :func:`jsd_top_drifters` (same term shapes, same
    deterministic (term DESC, tok ASC) cut)."""
    _, split = train_val_split_sql("doc_id")
    return f"""
        WITH toks AS (
            SELECT {split} AS split, unnest(string_split(text, ' ')) AS tok
            FROM {table}
        ), counts AS (
            SELECT tok,
                   sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS a,
                   sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS b
            FROM toks WHERE split IN ('train', 'val') GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(a) AS DOUBLE) AS na, CAST(sum(b) AS DOUBLE) AS nb
            FROM counts
        ), terms AS (
            SELECT tok, a, b,
                   (CASE WHEN a > 0 THEN
                        0.5 * (CAST(a AS DOUBLE) / na)
                        * ln(2.0 * CAST(a AS DOUBLE) * nb
                             / (CAST(a AS DOUBLE) * nb + CAST(b AS DOUBLE) * na))
                    ELSE 0.0 END)
                 + (CASE WHEN b > 0 THEN
                        0.5 * (CAST(b AS DOUBLE) / nb)
                        * ln(2.0 * CAST(b AS DOUBLE) * na
                             / (CAST(a AS DOUBLE) * nb + CAST(b AS DOUBLE) * na))
                    ELSE 0.0 END) AS term,
                   CASE WHEN CAST(a AS DOUBLE) * nb > CAST(b AS DOUBLE) * na
                        THEN 'train' ELSE 'val' END AS over_in
            FROM counts, tot
        )
        SELECT tok, CAST(a AS BIGINT) AS train_count,
               CAST(b AS BIGINT) AS val_count,
               round(term, 6) AS jsd_term, over_in
        FROM terms
        ORDER BY term DESC, tok ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# curriculum deciles without a global sort
# ---------------------------------------------------------------------------


def length_deciles(
    df: DataFrame,
    value_col: str = "n_chars",
    key_col: str = "doc_id",
    n_tiles: int = 10,
) -> DataFrame:
    """Assign each document a difficulty decile by ``value_col`` WITHOUT
    a global sort — the curriculum-ordering step of a training pipeline
    (shortest-first schedules, length-balanced mixing). Semantics are
    value-based tiles: ``tile k`` = docs with value ≤ the smallest value
    whose cumulative count reaches ``k/n_tiles`` of the corpus (equal
    values always share a tile — unlike NTILE, which splits them
    arbitrarily and is therefore not reproducible across engines).

    Plan: ONE map-side-combined histogram aggregate (distinct values,
    tiny next to the corpus), boundary derivation on the histogram frame
    (a histogram-sized window, never the corpus), boundaries broadcast
    back as ONE array literal-sized join — the corpus itself never
    shuffles. Integer arithmetic only (`cum * n_tiles >= k * N` instead
    of a float quantile), so the oracle replays tile edges exactly.
    """
    from pyspark.sql import Window as W

    hist = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wv)).crossJoin(
        F.broadcast(df.agg(F.count(F.lit(1)).alias("n")))
    )
    # boundary_k = min v with cum * n_tiles >= k * N  (k = 1..n_tiles)
    bounds = (
        cum.select(
            F.explode(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(n_tiles)),
                        lambda k: F.when(
                            F.col("cum") * n_tiles >= k * F.col("n"), k
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("k"),
            F.col("v"),
        )
        .groupBy("k")
        .agg(F.min("v").alias("boundary"))
    )
    barr = bounds.agg(
        F.array_sort(F.collect_list(F.struct("k", "boundary"))).alias("bs")
    )
    tile = F.element_at(
        F.filter(
            F.col("bs"), lambda b: F.col(value_col) <= b["boundary"]
        ),
        1,
    )["k"]
    return df.crossJoin(F.broadcast(barr)).select(
        key_col,
        F.col(value_col).cast("long").alias(value_col),
        tile.cast("int").alias("tile"),
    )


def length_deciles_oracle_sql(
    table: str = "documents",
    value_col: str = "n_chars",
    n_tiles: int = 10,
) -> str:
    """DuckDB twin of :func:`length_deciles` (same integer tile edges)."""
    return f"""
        WITH hist AS (
            SELECT {value_col} AS v, count(*) AS cnt
            FROM {table} GROUP BY 1
        ), cum AS (
            SELECT v, sum(cnt) OVER (ORDER BY v
                                     ROWS UNBOUNDED PRECEDING) AS cum,
                   (SELECT count(*) FROM {table}) AS n
            FROM hist
        ), bounds AS (
            SELECT k, min(v) AS boundary
            FROM cum, unnest(range(1, {n_tiles} + 1)) AS t(k)
            WHERE cum * {n_tiles} >= k * n
            GROUP BY 1
        )
        SELECT d.doc_id, CAST(d.{value_col} AS BIGINT) AS {value_col},
               CAST(min(b.k) AS INTEGER) AS tile
        FROM {table} d JOIN bounds b ON d.{value_col} <= b.boundary
        GROUP BY 1, 2
    """


def vocab_oov_rate(
    df: DataFrame,
    top_v: int = 100,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary truncation + out-of-vocabulary rate: the top-``top_v``
    tokens by TRAIN-split frequency (ties → lexicographically smaller
    token, so the cut is a deterministic set) form the vocabulary; every
    document reports its token count and OOV rate under it — the
    tokenizer-prep signal that decides vocab size and flags docs a
    truncated vocab would shred (code, foreign-script, gibberish).

    Plan: ONE token-grain TRAIN aggregate; the top-V cut runs as
    TakeOrdered (per-partition heads merged on the driver — never a
    global sort); the vocab broadcasts; per-doc OOV is one narrow
    explode + map-side-combined aggregate.
    """
    s = train_val_split(df, key_col=key_col)
    counts = (
        s.filter(F.col("split") == "train")
        .select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(top_v)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    toks = s.select(
        key_col,
        "split",
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    j = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        j.groupBy(key_col, "split")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            key_col,
            "split",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round(
                F.col("n_oov") / F.col("n_tokens").cast("double"), 6
            ).alias("oov_rate"),
        )
    )


def vocab_oov_oracle_sql(table: str = "documents", top_v: int = 100) -> str:
    """DuckDB twin of :func:`vocab_oov_rate` (same split, same
    deterministic (cnt DESC, tok ASC) vocabulary cut)."""
    _, split = train_val_split_sql("doc_id")
    return f"""
        WITH base AS (
            SELECT doc_id, {split} AS split,
                   string_split(text, ' ') AS toks
            FROM {table}
        ), counts AS (
            SELECT tok, count(*) AS cnt
            FROM (SELECT unnest(toks) AS tok FROM base
                  WHERE split = 'train')
            GROUP BY 1
        ), vocab AS (
            SELECT tok FROM counts ORDER BY cnt DESC, tok ASC LIMIT {top_v}
        ), flat AS (
            SELECT doc_id, split, unnest(toks) AS tok FROM base
        )
        SELECT f.doc_id, f.split,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS oov_rate
        FROM flat f LEFT JOIN vocab v ON v.tok = f.tok
        GROUP BY 1, 2
    """


def psi_length_drift(
    df: DataFrame,
    value_col: str = "n_chars",
    key_col: str = "doc_id",
    n_tiles: int = 10,
) -> DataFrame:
    """Population Stability Index between the TRAIN and VAL splits over
    TRAIN-derived length deciles — the standard production drift monitor
    for a numeric feature (PSI < 0.1 stable, > 0.25 shifted), the
    feature-distribution complement of the token-level
    :func:`js_divergence_drift`. ``PSI = Σ (p_i − q_i)·ln(p_i/q_i)``
    over bins; bins come from the TRAIN distribution (the
    :func:`length_deciles` integer edges), VAL values above the top
    boundary clamp into the last bin, and bins where either side is
    empty are EXCLUDED from the sum and counted (``n_zero_bins``) — the
    deterministic alternative to an arbitrary epsilon.

    Float discipline: ``ln(p/q)`` is spelled ``ln((a·NB)/(b·NA))`` over
    integer-valued doubles and ``p − q`` as the difference of two IEEE
    divisions; ≤ ``n_tiles`` terms fold ascending by bin.
    """
    s = train_val_split(df, key_col=key_col).filter(
        F.col("split").isin("train", "val")
    )
    train = s.filter(F.col("split") == "train")
    # TRAIN-only decile boundaries (integer cumulative edges)
    hist = train.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    from pyspark.sql import Window as W

    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wv)).crossJoin(
        F.broadcast(train.agg(F.count(F.lit(1)).alias("n")))
    )
    bounds = (
        cum.select(
            F.explode(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(n_tiles)),
                        lambda k: F.when(
                            F.col("cum") * n_tiles >= k * F.col("n"), k
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            ).alias("k"),
            "v",
        )
        .groupBy("k")
        .agg(F.min("v").alias("boundary"))
    )
    barr = bounds.agg(
        F.array_sort(F.collect_list(F.struct("k", "boundary"))).alias("bs")
    )
    # try_element_at: a VAL value above EVERY train boundary filters to an
    # empty array, and ANSI element_at throws on it instead of yielding
    # NULL (caught by the shift test) — try_ gives NULL, coalesce clamps
    tile = F.coalesce(
        F.try_element_at(
            F.filter(F.col("bs"), lambda b: F.col(value_col) <= b["boundary"]),
            F.lit(1),
        )["k"],
        F.lit(n_tiles),
    )
    binned = s.crossJoin(F.broadcast(barr)).select(
        tile.alias("tile"), "split"
    )
    counts = binned.groupBy("tile").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("b"),
    )
    tot = counts.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
    )
    c = counts.crossJoin(F.broadcast(tot))
    ad, bd = F.col("a").cast("double"), F.col("b").cast("double")
    term = F.when(
        (F.col("a") > 0) & (F.col("b") > 0),
        (ad / F.col("na") - bd / F.col("nb"))
        * F.log((ad * F.col("nb")) / (bd * F.col("na"))),
    ).otherwise(F.lit(0.0))
    return c.groupBy().agg(
        F.count(F.lit(1)).cast("int").alias("n_bins"),
        F.sum(
            F.when((F.col("a") == 0) | (F.col("b") == 0), 1).otherwise(0)
        ).cast("int").alias("n_zero_bins"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(F.col("tile"), term.alias("t")))),
                F.lit(0.0),
                lambda acc, x: acc + x["t"],
            ),
            6,
        ).alias("psi"),
    )


def psi_length_oracle_sql(
    table: str = "documents", value_col: str = "n_chars", n_tiles: int = 10
) -> str:
    """DuckDB twin of :func:`psi_length_drift` (same integer tile edges,
    same excluded-zero-bin contract, same ascending fold)."""
    _, split = train_val_split_sql("doc_id")
    return f"""
        WITH base AS (
            SELECT {value_col} AS v, {split} AS split FROM {table}
        ), tr AS (SELECT v FROM base WHERE split = 'train'),
        hist AS (SELECT v, count(*) AS cnt FROM tr GROUP BY 1),
        cum AS (
            SELECT v, sum(cnt) OVER (ORDER BY v
                                     ROWS UNBOUNDED PRECEDING) AS cum,
                   (SELECT count(*) FROM tr) AS n
            FROM hist
        ), bounds AS (
            SELECT k, min(v) AS boundary
            FROM cum, unnest(range(1, {n_tiles} + 1)) AS t(k)
            WHERE cum * {n_tiles} >= k * n
            GROUP BY 1
        ), binned AS (
            SELECT COALESCE((SELECT min(b.k) FROM bounds b
                             WHERE base.v <= b.boundary), {n_tiles}) AS tile,
                   split
            FROM base WHERE split IN ('train', 'val')
        ), counts AS (
            SELECT tile,
                   sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS a,
                   sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS b
            FROM binned GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(a) AS DOUBLE) AS na,
                   CAST(sum(b) AS DOUBLE) AS nb
            FROM counts
        ), terms AS (
            SELECT tile,
                   CASE WHEN a > 0 AND b > 0 THEN
                        (CAST(a AS DOUBLE) / na - CAST(b AS DOUBLE) / nb)
                        * ln((CAST(a AS DOUBLE) * nb)
                             / (CAST(b AS DOUBLE) * na))
                   ELSE 0.0 END AS t,
                   CASE WHEN a = 0 OR b = 0 THEN 1 ELSE 0 END AS z
            FROM counts, tot
        )
        SELECT CAST(count(*) AS INTEGER) AS n_bins,
               CAST(sum(z) AS INTEGER) AS n_zero_bins,
               round(list_reduce(
                 list_prepend(0.0, list(t ORDER BY tile)),
                 (a, x) -> a + x), 6) AS psi
        FROM terms
    """


def rank_normalize(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Quantile (rank) normalization without a global sort — the reward-
    calibration step before cross-prompt scores are comparable: each value
    maps to ``q = rank_before / (N − 1)`` within its partition, where
    ``rank_before`` is the MIN-rank count of strictly-smaller values (ties
    share a quantile — deterministic across engines, unlike NTILE/
    row_number ties), then reports per ``group_cols`` the mean calibrated
    score. The mean stays exact: ``Σ rank_before`` is a BIGINT and the
    single division ``/ ((N−1) · n)`` happens once per output row.

    Plan (the :func:`length_deciles` construction, generalized): ONE
    histogram aggregate to (partition, value) — bounded by the VALUE
    DOMAIN, not the corpus — a histogram-sized cumsum window, and an
    equi-join back on (partition, value) that AQE broadcasts while the
    histogram is small. The corpus is never sorted in one task; the
    window that would have been ``rank() OVER (PARTITION BY part ORDER BY
    value)`` serializes a whole partition through one reducer at 100 TB.
    """
    from pyspark.sql import Window as W

    v = F.col(value_col).alias("_v")
    hist = df.select(*part_cols, v).groupBy(*part_cols, "_v").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wp = W.partitionBy(*part_cols).orderBy("_v")
    cum = hist.select(
        *part_cols,
        "_v",
        F.coalesce(
            F.sum("_cnt").over(wp.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ).alias("_rank_before"),
        F.sum("_cnt").over(wp.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("_n_part"),
    )
    joined = df.select(*part_cols, *group_cols, v).join(
        cum, [*part_cols, "_v"]
    )
    return joined.groupBy(*part_cols, *group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("_rank_before")
            / ((F.max("_n_part") - F.lit(1)) * F.count(F.lit(1)))
        ).alias("mean_q"),
    )


# ---------------------------------------------------------------------------
# fill-in-the-middle transform (PSM/SPM infilling examples)
# ---------------------------------------------------------------------------

FIM_MIN_CHARS = 40


def fim_transform(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fill-in-the-middle training examples (the OpenAI FIM / code-infill
    recipe): each long-enough document is split into (prefix, middle,
    suffix) at two DETERMINISTIC cut points derived from a portable hash
    of the text — no RNG, so a re-run (or the oracle) reproduces every
    example byte-for-byte — and re-serialized in PSM or SPM order (the
    hash's parity picks the mode, giving a ~50/50 mix without state).

    Cut arithmetic, all integer: with L = char length and third = L//3,
    prefix ends at a = 1 + h1 % third, middle spans m = 1 + h2 % third
    chars. Docs under FIM_MIN_CHARS pass through unchanged as mode
    'plain' (the real pipeline trains them as ordinary LM examples).

    Plan: a narrow per-row map — no shuffle, no UDF; substring + concat
    stay inside whole-stage codegen, so this runs at scan speed over
    100 TB.
    """
    from cernan_spark.functions.porthash import portable_hash

    t = F.col(text_col)
    L = F.length(t)
    third = F.floor(L / 3).cast("long")
    h1 = portable_hash(F.concat(t, F.lit("|fim-a")))
    h2 = portable_hash(F.concat(t, F.lit("|fim-b")))
    a = (F.lit(1) + h1 % third).cast("int")
    m = (F.lit(1) + h2 % third).cast("int")
    prefix = t.substr(F.lit(1), a)
    middle = t.substr(a + F.lit(1), m)
    suffix = t.substr(a + m + F.lit(1), L)
    psm = F.concat(
        F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle
    )
    spm = F.concat(
        F.lit("<SUF>"), suffix, F.lit("<PRE>"), prefix, F.lit("<MID>"), middle
    )
    eligible = L >= F.lit(FIM_MIN_CHARS)
    mode = F.when(~eligible, F.lit("plain")).when(
        h1 % 2 == 0, F.lit("psm")
    ).otherwise(F.lit("spm"))
    return df.select(
        "doc_id",
        mode.alias("mode"),
        F.when(~eligible, t).when(h1 % 2 == 0, psm).otherwise(spm).alias(
            "fim_text"
        ),
        F.when(eligible, a.cast("long")).otherwise(F.lit(0)).alias("prefix_len"),
        F.when(eligible, m.cast("long")).otherwise(F.lit(0)).alias("middle_len"),
    )


def fim_transform_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`fim_transform` — same hash, same integer
    cut arithmetic, same substring semantics (both engines are 1-based
    and code-point-addressed on VARCHAR)."""
    from cernan_spark.functions.porthash import portable_hash_sql

    h1 = portable_hash_sql("(text || '|fim-a')")
    h2 = portable_hash_sql("(text || '|fim-b')")
    return f"""
        WITH cuts AS (
            SELECT doc_id, text, length(text) AS L,
                   length(text) // 3 AS third,
                   {h1} AS h1, {h2} AS h2
            FROM {table}
        ), pts AS (
            SELECT doc_id, text, L,
                   CAST(1 + h1 % third AS INTEGER) AS a,
                   CAST(1 + h2 % third AS INTEGER) AS m,
                   h1
            FROM cuts WHERE L >= {FIM_MIN_CHARS}
        ), parts AS (
            SELECT doc_id, a, m, h1,
                   substr(text, 1, a) AS prefix,
                   substr(text, a + 1, m) AS middle,
                   substr(text, a + m + 1, L) AS suffix
            FROM pts
        )
        SELECT doc_id,
               CASE WHEN h1 % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
               CASE WHEN h1 % 2 = 0
                    THEN '<PRE>' || prefix || '<SUF>' || suffix
                         || '<MID>' || middle
                    ELSE '<SUF>' || suffix || '<PRE>' || prefix
                         || '<MID>' || middle
               END AS fim_text,
               CAST(a AS BIGINT) AS prefix_len,
               CAST(m AS BIGINT) AS middle_len
        FROM parts
        UNION ALL
        SELECT doc_id, 'plain', text, 0, 0
        FROM cuts WHERE L < {FIM_MIN_CHARS}
    """


# ---------------------------------------------------------------------------
# deterministic per-epoch shuffle order (multi-epoch training schedule)
# ---------------------------------------------------------------------------


def epoch_shuffle_heads(
    df: DataFrame,
    n_epochs: int,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-epoch training data order, reproducibly: epoch e's shuffle
    key for a document is hash(id || ':' || e) — no RNG state, so any
    worker (or a resumed run, or this oracle) recomputes the exact same
    permutation, which is how a 100 TB trainer re-derives epoch order
    instead of shipping it. Emits each epoch's first ``k`` documents
    with their positions; distinct epochs produce distinct orders (the
    property the pytest asserts).

    Plan: the per-epoch head is a top-K by hash, routed through
    :func:`~cernan_spark.operators.skew.salted_topk` so the (few,
    hot) epoch groups never serialize a full sort into one task —
    TakeOrdered semantics, never a global sort.
    """
    from cernan_spark.functions.porthash import portable_hash
    from cernan_spark.operators.skew import salted_topk

    epochs = df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_epochs - 1))
        ).alias("epoch"),
    )
    h = fmix32(
        portable_hash(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        )
    )
    keyed = epochs.select("epoch", F.col(id_col), h.alias("h"))
    return salted_topk(
        keyed,
        ["epoch"],
        [F.col("h").asc(), F.col(id_col).asc()],
        k,
        rank_col="pos",
    ).select("epoch", "pos", id_col, "h")


def epoch_shuffle_oracle_sql(
    n_epochs: int, k: int, table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`epoch_shuffle_heads` (same hash chain)."""
    from cernan_spark.functions.porthash import portable_hash_sql

    h = fmix32_sql(
        portable_hash_sql(f"(CAST({id_col} AS VARCHAR) || ':' || CAST(epoch AS VARCHAR))")
    )
    return f"""
        WITH epochs AS (
            SELECT {id_col}, unnest(range(0, {n_epochs})) AS epoch
            FROM {table}
        ), keyed AS (
            SELECT CAST(epoch AS INTEGER) AS epoch, {id_col}, {h} AS h
            FROM epochs
        ), ranked AS (
            SELECT epoch, {id_col}, h,
                   row_number() OVER (PARTITION BY epoch
                                      ORDER BY h ASC, {id_col} ASC) AS pos
            FROM keyed
        )
        SELECT epoch, CAST(pos AS INTEGER) AS pos, {id_col}, h
        FROM ranked WHERE pos <= {k}
    """


# ---------------------------------------------------------------------------
# retrieval quality: nDCG@k of a ranking against graded relevance
# ---------------------------------------------------------------------------


def ndcg_at_k(
    scored: DataFrame,
    k: int = 10,
    score_col: str = "bm25r",
    rel_col: str = "rel",
    id_col: str = "doc_id",
) -> DataFrame:
    """nDCG@k of a retriever's ranking against graded relevance — the
    eval that closes the retrieval loop (BM25/RRF build rankings; this
    measures them). DCG folds rel/ln(pos+1) in POSITION order (a pinned
    k-term fold, so the float sum is cross-engine exact); the ideal
    ranking re-sorts by (relevance desc, id) with the same fold. Both
    top-k cuts are TakeOrdered (orderBy.limit) — never a global sort —
    and every downstream frame is k rows.
    """
    from pyspark.sql import Window

    ranked = (
        scored.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col), F.col(rel_col).alias("rel"), F.col(score_col)
        )
    )
    wr = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = ranked.select(
        "rel", F.row_number().over(wr).alias("pos")
    )  # k-row frame: the unpartitioned window is a k-row sort, not a scan
    ideal = (
        scored.filter(F.col(rel_col) > 0)
        .orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(rel_col).alias("rel"), F.col(id_col))
    )
    wi = Window.orderBy(F.col("rel").desc(), F.col(id_col).asc())
    ideal = ideal.select("rel", F.row_number().over(wi).alias("pos"))

    def fold(df: DataFrame, out: str) -> DataFrame:
        term = F.struct(
            F.col("pos"),
            (
                F.col("rel").cast("double")
                / F.log((F.col("pos") + 1).cast("double"))
            ).alias("t"),
        )
        return df.agg(
            F.count(F.lit(1)).alias(f"n_{out}"),
            F.aggregate(
                F.sort_array(F.collect_list(term)),
                F.lit(0.0),
                lambda acc, s: acc + s["t"],
            ).alias(out),
        )

    dcg = fold(ranked, "dcg")
    idcg = fold(ideal, "idcg")
    return dcg.crossJoin(idcg).select(
        F.col("n_dcg").alias("n_ranked"),
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# negative-sampling distribution (word2vec count^0.75 smoothing)
# ---------------------------------------------------------------------------


def negative_sampling_weights(
    df: DataFrame,
    text_col: str = "text",
    vocab_k: int = 100,
    n_draws: int = 10_000,
) -> DataFrame:
    """The word2vec negative-sampling distribution over the top-K
    vocabulary: P(tok) ∝ count^0.75 — the smoothing that keeps frequent
    tokens from dominating the negatives. The 3/4 power is computed as
    ``sqrt(cnt · sqrt(cnt))``: both sqrts are CORRECTLY ROUNDED under
    IEEE-754 and the multiply is one deterministic IEEE op, so every
    weight is bit-identical in any compliant engine — no libm ``pow``
    whose rounding varies. Shares fold in pinned (count desc, token)
    order over the K-row vocab; alloc is the integer draw count under
    ``n_draws`` samples.

    Plan: ONE corpus-grain token count; everything after is K rows.
    """
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    vocab = (
        toks.filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(vocab_k)
    )
    cd = F.col("cnt").cast("double")
    w = F.sqrt(cd * F.sqrt(cd))
    weighted = vocab.select("tok", "cnt", w.alias("w"))
    tot = weighted.agg(
        F.sum("cnt").alias("n_total"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct((-F.col("cnt")).alias("_negc"), "tok", "w"))),
            F.lit(0.0),
            lambda acc, s: acc + s["w"],
        ).alias("w_total"),
    )
    share_raw = F.col("cnt").cast("double") / F.col("n_total").cast("double")
    share = F.col("w") / F.col("w_total")
    return weighted.crossJoin(F.broadcast(tot)).select(
        "tok",
        "cnt",
        share_raw.alias("share_raw"),
        share.alias("share_smooth"),
        (share / share_raw).alias("boost"),
        F.floor(share * F.lit(float(n_draws))).cast("long").alias("alloc_draws"),
    )


def negative_sampling_oracle_sql(
    table: str = "documents", vocab_k: int = 100, n_draws: int = 10_000
) -> str:
    """DuckDB twin of :func:`negative_sampling_weights` (same nested-sqrt
    3/4 power, same pinned fold order)."""
    return f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM {table}
        ), vocab AS (
            SELECT tok, count(*) AS cnt FROM toks WHERE length(tok) > 0
            GROUP BY 1 ORDER BY cnt DESC, tok LIMIT {vocab_k}
        ), weighted AS (
            SELECT tok, cnt,
                   sqrt(CAST(cnt AS DOUBLE) * sqrt(CAST(cnt AS DOUBLE))) AS w
            FROM vocab
        ), tot AS (
            SELECT sum(cnt) AS n_total,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list(w ORDER BY -cnt, tok)), (a, v) -> a + v) AS w_total
            FROM weighted
        )
        SELECT tok, CAST(cnt AS BIGINT) AS cnt,
               CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE) AS share_raw,
               w / w_total AS share_smooth,
               (w / w_total) / (CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))
                 AS boost,
               CAST(floor(w / w_total * {float(n_draws)}) AS BIGINT)
                 AS alloc_draws
        FROM weighted CROSS JOIN tot
    """


# ---------------------------------------------------------------------------
# distinctive terms between corpus slices (log-odds with Dirichlet prior)
# ---------------------------------------------------------------------------


def distinctive_terms(
    df: DataFrame,
    split_col: str,
    target: str,
    text_col: str = "text",
    alpha: float = 0.5,
    top_k: int = 40,
) -> DataFrame:
    """Monroe et al.'s "fightin' words": which tokens distinguish one
    corpus slice (``split_col == target``) from the rest — the log-odds
    ratio with a Dirichlet prior, z-scored by its estimated variance.
    The corpus-curation question ("what is src7 actually full of?")
    answered with smoothing, so rare tokens don't dominate the way raw
    ratios let them.

    delta = ln((c1+a)/(n1+aV-c1-a)) - ln((c2+a)/(n2+aV-c2-a)),
    z = delta / sqrt(1/(c1+a) + 1/(c2+a)) — every term is ln/division/
    sqrt over exact integer counts plus the rational prior, evaluated
    PER TOKEN (no fold anywhere), so cross-engine equality needs no
    order pinning at all. Top-K by (|z| desc, token) is deterministic.

    Plan: ONE (token, side) count aggregate over the corpus; the scoring
    runs on vocab-sized rows and the cut is a TakeOrdered.
    """
    side = (F.col(split_col) == target).cast("int")
    toks = df.select(
        side.alias("s"), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    counts = toks.groupBy("tok").agg(
        F.sum("s").alias("c1"),
        F.sum(1 - F.col("s")).alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("v"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    a = F.lit(alpha)
    av = a * F.col("v").cast("double")
    c1 = F.col("c1").cast("double")
    c2 = F.col("c2").cast("double")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    delta = F.log((c1 + a) / (n1 + av - c1 - a)) - F.log(
        (c2 + a) / (n2 + av - c2 - a)
    )
    z = delta / F.sqrt(1.0 / (c1 + a) + 1.0 / (c2 + a))
    return (
        j.select(
            "tok",
            F.col("c1").alias("n_target"),
            F.col("c2").alias("n_rest"),
            F.round(delta, 6).alias("log_odds"),
            F.round(z, 6).alias("z"),
        )
        .orderBy(F.abs(F.col("z")).desc(), F.col("tok"))
        .limit(top_k)
    )


def distinctive_terms_oracle_sql(
    table: str,
    split_expr: str,
    text_expr: str = "text",
    alpha: float = 0.5,
    top_k: int = 40,
) -> str:
    """DuckDB twin of :func:`distinctive_terms` (same shapes, same cut)."""
    return f"""
        WITH toks AS (
            SELECT CASE WHEN {split_expr} THEN 1 ELSE 0 END AS s,
                   unnest(string_split({text_expr}, ' ')) AS tok
            FROM {table}
        ), counts AS (
            SELECT tok, CAST(sum(s) AS BIGINT) AS c1,
                   CAST(sum(1 - s) AS BIGINT) AS c2
            FROM toks WHERE length(tok) > 0 GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(c1) AS BIGINT) AS n1,
                   CAST(sum(c2) AS BIGINT) AS n2,
                   CAST(count(*) AS BIGINT) AS v
            FROM counts
        ), scored AS (
            SELECT tok, c1 AS n_target, c2 AS n_rest,
                   ln((CAST(c1 AS DOUBLE) + {alpha})
                      / (CAST(n1 AS DOUBLE) + {alpha} * CAST(v AS DOUBLE)
                         - CAST(c1 AS DOUBLE) - {alpha}))
                   - ln((CAST(c2 AS DOUBLE) + {alpha})
                        / (CAST(n2 AS DOUBLE) + {alpha} * CAST(v AS DOUBLE)
                           - CAST(c2 AS DOUBLE) - {alpha})) AS delta,
                   (ln((CAST(c1 AS DOUBLE) + {alpha})
                       / (CAST(n1 AS DOUBLE) + {alpha} * CAST(v AS DOUBLE)
                          - CAST(c1 AS DOUBLE) - {alpha}))
                    - ln((CAST(c2 AS DOUBLE) + {alpha})
                         / (CAST(n2 AS DOUBLE) + {alpha} * CAST(v AS DOUBLE)
                            - CAST(c2 AS DOUBLE) - {alpha})))
                   / sqrt(1.0 / (CAST(c1 AS DOUBLE) + {alpha})
                          + 1.0 / (CAST(c2 AS DOUBLE) + {alpha})) AS z
            FROM counts CROSS JOIN tot
        )
        SELECT tok, n_target, n_rest,
               round(delta, 6) AS log_odds, round(z, 6) AS z
        FROM scored ORDER BY abs(z) DESC, tok LIMIT {top_k}
    """


def posting_lists(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index posting-list build with delta-encoded doc-id gaps —
    the retrieval-infra artifact (Lucene/ES posting shape) a corpus
    pipeline materializes before BM25 serving. Per token: document
    frequency, total term frequency, and the gap-encoded posting list
    (first gap = smallest doc_id, later gaps = id deltas — the form that
    varint-compresses at scale).

    Plan (measured, AQE final): ONE exchange. The static plan carries
    two — (token, doc) for tf, then token for the posting-sort window —
    but ENSURE_REQUIREMENTS collapses them: the tf aggregate completes
    inside the scan stage (globally correct HERE because explode never
    splits a document across partitions, so every (token, doc) pair is
    born co-located), the single shuffle runs on token, and the final
    token-grain aggregate reuses the window's partitioning (subset
    rule). Raw exploded tokens still combine map-side before the wire —
    the win on stopword-heavy corpora. Hot tokens (stopwords) make big
    postings, as in a real index; AQE skew handling splits them.
    Guarded by ``test_posting_lists_two_exchanges_mapside_combine``. Postings emit as a
    comma-joined string so the cross-engine value hash is
    byte-identical (arrays serialize differently per engine).
    """
    from pyspark.sql import Window as W

    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = W.partitionBy("tok").orderBy("doc_id")
    gapped = tf.select(
        "tok",
        "doc_id",
        "tf",
        (
            F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(0))
        ).alias("gap"),
    )
    return gapped.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("doc_id", "gap"))
                ),
                lambda s: s["gap"].cast("string"),
            ),
            ",",
        ).alias("gaps"),
    )


def good_turing_spectrum(
    df: DataFrame,
    text_col: str = "text",
    max_r: int = 10,
    type_cols: list[str] | None = None,
) -> DataFrame:
    """Good–Turing frequency-of-frequencies: per raw count r (1..max_r)
    the number of token types seen exactly r times (N_r), the smoothed
    count r* = (r+1)·N_{r+1}/N_r, and the unseen mass p0 = N_1/N repeated
    on every row — the quantity a language-model pipeline reads to budget
    vocabulary cutoffs and OOV handling (Gale & Sampson's simple GT; r*
    is left NULL when N_{r+1}=0, where the estimator is undefined
    without regression smoothing).

    ``type_cols`` widens the type identity: with ``["doc_id"]`` a type is
    (document, token) and the spectrum profiles WITHIN-document term
    frequencies (burstiness) — the SF-stable variant for corpora whose
    global vocabulary is closed, where every global count is huge and
    the small-r classes are empty.

    Shape: token explode → ONE (type) count aggregate → ONE (r) count
    aggregate (the spectrum is tiny) → a lead() window over the small r
    spine. Every double is one division of exact BIGINTs; N_1 and N are
    single-row aggregates (COALESCEd, so an empty class yields 0, not an
    empty frame).
    """
    keys = list(type_cols or [])
    toks = df.select(
        *keys, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    per_tok = toks.groupBy(*keys, "tok").agg(
        F.count(F.lit(1)).alias("r")
    )
    spectrum = per_tok.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    n1 = spectrum.agg(
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        ).alias("n_1")
    )
    w = Window.orderBy("r")
    # lead() must see the FULL spectrum before the max_r cut, and the
    # successor row counts as N_{r+1} only when its r IS r+1 — a gap in
    # the spectrum means N_{r+1} = 0 (r* undefined), not "borrow the
    # next populated class".
    led = spectrum.withColumn(
        "n_r1",
        F.when(
            F.lead("r").over(w) == F.col("r") + 1, F.lead("n_r").over(w)
        ),
    )
    return (
        led.filter(F.col("r") <= max_r)
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            F.round(
                (F.col("r") + 1).cast("double")
                * F.col("n_r1").cast("double")
                / F.col("n_r").cast("double"),
                6,
            ).alias("r_star"),
            F.round(
                F.col("n_1").cast("double") / F.col("n_total").cast("double"),
                6,
            ).alias("p_unseen"),
        )
    )


def phrase_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional posting rows (token, doc, pos) — the index side of
    :func:`posting_lists` extended with positions, the structure phrase
    and proximity queries join against."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    ).filter(F.length("token") > 0)


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase query over the positional index: documents where
    ``phrase``'s tokens appear at consecutive positions, with the
    (overlap-counting) occurrence count and first hit position.

    Scale shape: the index rows are FILTERED to the phrase's tokens
    before any shuffle (predicate pushdown against the token column of a
    materialized index), then each adjacency is one equi-join on
    (doc, pos+offset) — |phrase|−1 joins over only the matching
    postings, never the corpus. Integer-only output.
    """
    pos = phrase_positions(df, text_col, id_col)
    hits = pos.filter(F.col("token") == phrase[0]).select(
        "doc", F.col("pos").alias("p0")
    )
    for k, term in enumerate(phrase[1:], start=1):
        nxt = pos.filter(F.col("token") == term).select(
            F.col("doc"), (F.col("pos") - k).alias("p0")
        )
        hits = hits.join(nxt, ["doc", "p0"])
    return hits.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("p0").alias("first_pos"),
    )


def retrieval_metrics(
    ranked: DataFrame, k: int = 10
) -> DataFrame:
    """MRR and recall@k over per-query rankings — the binary-relevance
    counterpart of :func:`ndcg_at_k`. ``ranked`` carries
    (query_id, doc_id, score, rel) with rel ∈ {0,1}; ranking order is
    (score DESC, doc_id ASC) so ties are pinned.

    Output ONE row: ``n_queries, mrr, mean_recall_at_k`` — the
    reciprocal rank and per-query recall are exact-integer divisions,
    and the two means fold over query_id-sorted structs (pinned order).
    """
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    r = ranked.select(
        "query_id", "rel", F.row_number().over(w).alias("rank")
    )
    per_q = r.groupBy("query_id").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when((F.col("rel") == 1) & (F.col("rank") <= k), 1).otherwise(0)
        ).alias("rel_in_k"),
        F.sum(F.when(F.col("rel") == 1, 1).otherwise(0)).alias("n_rel"),
    )
    scored = per_q.select(
        "query_id",
        F.when(
            F.col("first_rel").isNotNull(),
            F.lit(1.0) / F.col("first_rel").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
        F.when(
            F.col("n_rel") > 0,
            F.col("rel_in_k").cast("double") / F.col("n_rel").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("recall_k"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.array_sort(
            F.collect_list(F.struct("query_id", "rr", "recall_k"))
        ).alias("xs"),
    )
    return agg.select(
        "n_queries",
        F.round(
            F.aggregate("xs", F.lit(0.0), lambda a, x: a + x["rr"])
            / F.col("n_queries").cast("double"),
            6,
        ).alias("mrr"),
        F.round(
            F.aggregate("xs", F.lit(0.0), lambda a, x: a + x["recall_k"])
            / F.col("n_queries").cast("double"),
            6,
        ).alias("mean_recall_at_k"),
    )


def hll_set_overlap(
    df: DataFrame,
    set_col: str,
    item_col: Column,
    set_a: str,
    set_b: str,
) -> DataFrame:
    """HLL audience overlap: distinct-count estimates for two item sets,
    their union (register-wise max — the HLL merge), and the
    inclusion–exclusion intersection |A|+|B|−|A∪B| with the implied
    Jaccard — the "how many purchasers also clicked" sketch answer that
    needs neither a distinct join nor a second pass over the raw rows.

    The union sketch merges the two sets' registers (max is idempotent/
    commutative — the `hll_resume` law), so all three estimates come from
    ONE register aggregate over the tagged rows. The subtraction happens
    on the UNROUNDED corrected estimates, in the pinned order
    (E_a + E_b) − E_u, then everything rounds to 4 places.

    Output ONE row: ``hll_a, hll_b, hll_union, hll_intersection,
    jaccard_est``.
    """
    tagged = df.filter(F.col(set_col).isin(set_a, set_b)).select(
        F.when(F.col(set_col) == set_a, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("s"),
        item_col.alias("item"),
    )
    regs = hll_registers(tagged, ["s"], F.col("item"))
    union_regs = regs.groupBy("reg").agg(
        F.max("max_rho").alias("max_rho")
    ).select(F.lit("u").alias("s"), "reg", F.col("max_rho"))
    folded = _hll_fold(
        regs.unionByName(union_regs), ["s"], "est"
    ).select("s", F.col("hll_est"))
    one = folded.agg(
        F.max(F.when(F.col("s") == "a", F.col("hll_est"))).alias("ea"),
        F.max(F.when(F.col("s") == "b", F.col("hll_est"))).alias("eb"),
        F.max(F.when(F.col("s") == "u", F.col("hll_est"))).alias("eu"),
    )
    inter = F.col("ea") + F.col("eb") - F.col("eu")
    return one.select(
        F.col("ea").alias("hll_a"),
        F.col("eb").alias("hll_b"),
        F.col("eu").alias("hll_union"),
        F.round(inter, 4).alias("hll_intersection"),
        F.round(inter / F.col("eu"), 4).alias("jaccard_est"),
    )


def hll_overlap_oracle_sql(
    set_expr: str,
    item_expr: str,
    from_clause: str,
    set_a: str,
    set_b: str,
) -> str:
    """DuckDB twin of :func:`hll_set_overlap` — same registers, same
    folds, same correction, same (E_a + E_b) − E_u pinned arithmetic.
    NOTE: the Spark side rounds each per-set estimate to 4 places inside
    `_hll_fold` BEFORE the subtraction, so this twin does too."""
    from cernan_spark.functions.porthash import portable_hash_sql

    h = fmix32_sql(portable_hash_sql(item_expr))
    m = float(HLL_M)
    alpha = _hll_alpha(HLL_M)
    est = (
        f"round(CASE WHEN ({alpha * m * m}) / (present_sum + ({m} - n_present))"
        f" <= {2.5 * m} AND n_present < {HLL_M}"
        f" THEN {m} * ln({m} / CAST({HLL_M} - n_present AS DOUBLE))"
        f" ELSE ({alpha * m * m}) / (present_sum + ({m} - n_present)) END, 4)"
    )
    return f"""
        WITH hashed AS (
            SELECT CASE WHEN ({set_expr}) = '{set_a}' THEN 'a'
                        ELSE 'b' END AS s, ({h}) AS h
            FROM {from_clause}
            WHERE ({set_expr}) IN ('{set_a}', '{set_b}')
        ), regs AS (
            SELECT s, CAST(h % {HLL_M} AS INTEGER) AS reg,
                   max(CASE WHEN (h >> {HLL_P}) = 0
                            THEN {HLL_REST_BITS + 1}
                            ELSE {HLL_REST_BITS + 1}
                                 - length(bin(h >> {HLL_P}))
                       END) AS max_rho
            FROM hashed GROUP BY 1, 2
        ), allregs AS (
            SELECT s, reg, max_rho FROM regs
            UNION ALL
            SELECT 'u' AS s, reg, max(max_rho) AS max_rho
            FROM regs GROUP BY 2
        ), folded AS (
            SELECT s, count(*) AS n_present,
                   sum(power(2.0, -max_rho)) AS present_sum
            FROM allregs GROUP BY 1
        ), ests AS (
            SELECT s, {est} AS e FROM folded
        ), one AS (
            SELECT max(CASE WHEN s = 'a' THEN e END) AS ea,
                   max(CASE WHEN s = 'b' THEN e END) AS eb,
                   max(CASE WHEN s = 'u' THEN e END) AS eu
            FROM ests
        )
        SELECT ea AS hll_a, eb AS hll_b, eu AS hll_union,
               round(ea + eb - eu, 4) AS hll_intersection,
               round((ea + eb - eu) / eu, 4) AS jaccard_est
        FROM one
    """


def heaps_law(
    tokens: DataFrame,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    k_checkpoints: int = 12,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N) ≈ K·N^β over a token
    stream (one row per token occurrence, tagged with its document id)
    from equal-width id-range checkpoints — the tokenizer-budget
    planner's estimate of how vocabulary scales with corpus size.

    Scale shape: NO rank spine — checkpoints are ``k`` equal-width
    slices of the [min(id), max(id)] RANGE, so cumulative token counts
    and vocabulary sizes come from joining doc-grain / token-grain
    rollups against a broadcast k-row cut table (each an ordinary
    map-side-combined aggregate); the per-token first-occurrence is one
    ``min(id)`` groupBy. Nothing windows over raw rows.

    Float discipline: N_c and V_c are exact BIGINTs; the ln–ln OLS runs
    over the ≤k checkpoint rows as LEFT folds of a checkpoint-ordered
    struct list (``F.aggregate`` ≡ ``list_reduce``), β and ln K̂ each
    ONE division; ``k_coef = exp(lnK̂)``; ``+ 0.0`` at emit maps an
    IEEE −0 fit to +0 so both engines print the same zero. Empty
    checkpoints (N or V = 0) are excluded, keeping ln well-defined.

    Returns one row per non-empty checkpoint: ``checkpoint, cut_id,
    n_tokens, vocab, beta, k_coef`` (fit columns repeated).
    """
    stream = tokens.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(tok_col).alias("tok"),
    )
    ids = stream.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    bounds = ids.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    )
    cuts = bounds.select(
        F.explode(F.sequence(F.lit(1), F.lit(k_checkpoints))).alias("c"),
        "lo",
        "hi",
    ).select(
        "c",
        (
            F.col("lo")
            + F.floor(
                ((F.col("hi") - F.col("lo") + 1) * F.col("c"))
                / F.lit(k_checkpoints)
            )
        )
        .cast("long")
        .alias("cut"),
    )
    n_c = (
        ids.join(F.broadcast(cuts), ids["id"] < cuts["cut"])
        .groupBy("c", "cut")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    tok_first = stream.groupBy("tok").agg(F.min("id").alias("fd"))
    v_c = (
        tok_first.join(F.broadcast(cuts), tok_first["fd"] < cuts["cut"])
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    chk = (
        n_c.join(v_c, "c")
        .filter((F.col("n_tokens") > 0) & (F.col("vocab") > 0))
        .select(
            F.col("c").alias("checkpoint"),
            F.col("cut").alias("cut_id"),
            "n_tokens",
            "vocab",
        )
    )
    pts = chk.groupBy().agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "checkpoint",
                    F.log(F.col("n_tokens").cast("double")).alias("x"),
                    F.log(F.col("vocab").cast("double")).alias("y"),
                )
            )
        ).alias("a")
    )

    def _fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda acc, v: acc + v)

    sums = pts.select(
        F.size("a").cast("double").alias("k"),
        _fold(F.transform(F.col("a"), lambda s: s["x"])).alias("sx"),
        _fold(F.transform(F.col("a"), lambda s: s["y"])).alias("sy"),
        _fold(F.transform(F.col("a"), lambda s: s["x"] * s["y"])).alias("sxy"),
        _fold(F.transform(F.col("a"), lambda s: s["x"] * s["x"])).alias("sxx"),
    )
    beta = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = sums.select(
        (F.round(beta, 6) + F.lit(0.0)).alias("beta"),
        F.round(
            F.exp((F.col("sy") - beta * F.col("sx")) / F.col("k")), 6
        ).alias("k_coef"),
    )
    return chk.crossJoin(F.broadcast(fit))


def yule_k(
    tokens: DataFrame,
    group_cols: list[str],
    tok_col: str = "tok",
) -> DataFrame:
    """Yule's characteristic K — vocabulary-richness per group from the
    frequency spectrum, the repetitiveness score a corpus-quality gate
    pairs with :func:`heaps_law` (growth) and the Good–Turing spectrum
    (mass of the unseen):

        K = 10⁴ · (Σ_m m²·V_m − N) / N²

    where V_m counts the types occurring exactly m times and N is the
    total token count. Low K = rich vocabulary; boilerplate-heavy or
    templated text pushes K up, which makes it a cheap dedup-pressure
    signal per source/lang shard.

    Float discipline: Σ m²·V_m ≡ Σ_types m² and N are exact BIGINTs;
    K is ONE division at emit (the 10⁴ scale is exact).

    Plan shape: two hash aggregates — token-freq grain then group grain
    — both map-side combined; no window, no spectrum materialization
    (m² sums directly off the type grain).

    Output per group: ``*group_cols, n_tokens, v_types, yule_k``
    (round 6).
    """
    freq = tokens.groupBy(*group_cols, tok_col).agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    return (
        freq.groupBy(*group_cols)
        .agg(
            F.sum("m").alias("n_tokens"),
            F.count(F.lit(1)).alias("v_types"),
            F.sum(F.col("m") * F.col("m")).alias("s_m2"),
        )
        .select(
            *group_cols,
            "n_tokens",
            "v_types",
            F.round(
                F.lit(10000.0)
                * (F.col("s_m2") - F.col("n_tokens")).cast("double")
                / (F.col("n_tokens") * F.col("n_tokens")).cast("double"),
                6,
            ).alias("yule_k"),
        )
        .orderBy(*group_cols)
    )


def naive_bayes_eval(
    tokens: DataFrame,
    id_col: str,
    label_col: str,
    tok_col: str,
    train_col: str,
) -> DataFrame:
    """Multinomial Naive Bayes with add-1 smoothing, trained on the
    ``train_col`` split and evaluated on the rest — the classic
    bag-of-words router a corpus pipeline trains off routed shards
    (the supervised sibling of lang_id's fixed heuristic), emitted as
    the test-split confusion matrix.

    Scoring per (test doc, class):

        score = ln(n_docs_cls / n_docs) +
                Σ_w tf_w · ln((c_{w,cls} + 1) / (N_cls + V))

    with c the train token counts, N_cls the class token total, V the
    TRAIN vocabulary size; test-only words smooth to c = 0. Prediction
    is argmax (ties → lexicographically first class).

    Float discipline: every count is an exact BIGINT; each term is an
    exact-integer ratio under one ln (the repo's pinned-ln discipline),
    folded per (doc, class) in word order; the prior adds once at the
    end. Identical doubles → identical argmax in both engines.

    Plan shape: train-side aggregates at (class, word) and class
    grains; the test score frame is (test tf rows) × k classes joined
    against the broadcast-sized count tables; ONE fold per (doc,
    class); argmax via a per-doc window over k rows.

    Output per (label_true, label_pred): ``label_true, label_pred, n,
    share`` (round 6; share within the true label).
    """
    base = tokens.select(
        F.col(id_col).alias("doc"),
        F.col(label_col).alias("lbl"),
        F.col(tok_col).alias("w"),
        F.col(train_col).cast("boolean").alias("tr"),
    )
    train = base.filter("tr")
    test = base.filter(~F.col("tr"))
    cls_docs = train.groupBy("lbl").agg(
        F.countDistinct("doc").cast("long").alias("nd"),
        F.count(F.lit(1)).cast("long").alias("ntok"),
    )
    n_docs = train.select(
        F.countDistinct("doc").cast("long").alias("nd_all")
    )
    vocab = train.select("w").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    cw = train.groupBy("lbl", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tf = test.groupBy("doc", "lbl", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).withColumnRenamed("lbl", "label_true")
    classes = cls_docs.select(F.col("lbl").alias("cls"), "nd", "ntok")
    scored_terms = (
        tf.crossJoin(F.broadcast(classes))
        .join(
            F.broadcast(
                cw.select(
                    F.col("lbl").alias("cls"),
                    "w",
                    F.col("c").alias("c_wc"),
                )
            ),
            ["cls", "w"],
            "left",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc",
            "label_true",
            "cls",
            "w",
            (
                F.col("tf").cast("double")
                * F.log(
                    (F.coalesce("c_wc", F.lit(0)) + 1).cast("double")
                    / (F.col("ntok") + F.col("v")).cast("double")
                )
            ).alias("term"),
        )
    )
    folded = scored_terms.groupBy("doc", "label_true", "cls").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("w", "term"))),
            F.lit(0.0),
            lambda acc, t: acc + t["term"],
        ).alias("ll")
    )
    scored = (
        folded.join(F.broadcast(classes), "cls")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "label_true",
            "cls",
            (
                F.log(
                    F.col("nd").cast("double") / F.col("nd_all").cast("double")
                )
                + F.col("ll")
            ).alias("score"),
        )
    )
    from pyspark.sql import Window as W2

    wdoc = W2.partitionBy("doc").orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") == 1)
        .select("doc", "label_true", F.col("cls").alias("label_pred"))
    )
    per_true = pred.groupBy("label_true").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    return (
        pred.groupBy("label_true", "label_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .join(F.broadcast(per_true), "label_true")
        .select(
            "label_true",
            "label_pred",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("n_true").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("label_true", "label_pred")
    )
