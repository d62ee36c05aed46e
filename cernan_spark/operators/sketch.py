"""Portable Bloom-filter membership sketch.

Completes the engine's sketch family (HyperLogLog in operators/corpus.py,
count-min in operators/anomaly.py): a fixed-size bit array that answers
"was this item in the reference set?" with no false negatives — the
100 TB decontamination shape, where the benchmark side compresses to a
few KB of bits that ship to every executor instead of joining against
the corpus.

Reference parity note: cernan has no sketch layer (it is a telemetry
daemon); the analog is its bounded-state posture (bounded histogram bins,
/root/reference/src/buckets.rs) — all three sketches here keep state that
is CONSTANT in corpus size.

Scale design:
- build: explode items → k positions → ONE map-side-combined ``bit_or``
  aggregate over ≤ ``N_WORDS`` groups. OR-state is mergeable, so the
  build shards perfectly (each partition contributes a partial word
  table; the combine is a bitwise OR).
- the finished filter is a SINGLE ROW carrying an ``array<long>`` of
  ``N_WORDS`` 32-bit half-words — broadcast cross-joined onto the probe
  side (never collected to the driver).
- probe: the shingle array is hashed ONCE into an ``array<long>`` by a
  narrow transform (one instance of the hash expression tree — k
  inlined copies would balloon codegen past the 64 KB method limit the
  statsd parser already hit, functions/statsd.py); the k bit tests then
  run over the staged hashes. No explode, no shuffle, no Python.

Portability: positions come from the 31-bit polynomial hash
(functions/porthash.py) put through murmur3's 32-bit finalizer
(operators/corpus.fmix32) and k universal-hash streams — every step is
integer xor/shift/masked-multiply that DuckDB replays bit-for-bit, so the
filter words AND every probe verdict are value-checked by the oracle
gate, not rows-only. Words hold 32 bits each (bit < 32 keeps
``1 << bit`` positive in signed int64 on both engines — 64-bit words
would need ``1 << 63``, whose overflow behavior differs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cernan_spark.functions.porthash import (
    MERSENNE31,
    portable_hash,
    portable_hash_sql,
)
from cernan_spark.operators.corpus import fmix32, fmix32_sql

#: filter geometry: 4096 bits = 128 words × 32 bits
BLOOM_BITS = 4096
WORD_BITS = 32
N_WORDS = BLOOM_BITS // WORD_BITS

#: (a, b) universal-hash coefficients for the k=4 position streams —
#: fixed literals shared with the oracle generator (distinct from the
#: count-min streams so the two sketches never alias)
BLOOM_COEFFS: tuple[tuple[int, int], ...] = (
    (1664525, 1013904223),
    (22695477, 1),
    (1103515245, 54321),
    (48271, 159),
)


def _pow2() -> Column:
    """2^b for b in 0..31 as a literal array column — the bit masks,
    since shiftleft/shiftright take only literal shift counts in PySpark.
    Built lazily: column literals need an active SparkContext."""
    return F.array(*[F.lit(1 << b).cast("long") for b in range(WORD_BITS)])


def _positions(h: Column) -> list[Column]:
    """k bit positions for a mixed 32-bit hash value (h < 2^32, so the
    a·h products stay < 2^62 — inside signed int64)."""
    return [
        F.pmod(
            F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE31)), F.lit(BLOOM_BITS)
        )
        for a, b in BLOOM_COEFFS
    ]


def bloom_build(items: DataFrame, item_col: str = "item") -> DataFrame:
    """Build the filter over a column of strings → ONE row with
    ``words: array<long>`` (length ``N_WORDS``, 32 bits used per word).

    Missing words (no item hashed into them) are densified to 0 via a
    sequence transform — the output shape is fixed regardless of input.
    """
    h = fmix32(portable_hash(F.col(item_col)))
    pos = F.array(*_positions(h))
    per_word = (
        items.select(F.explode(pos).alias("pos"))
        .select(
            F.shiftright(F.col("pos"), 5).cast("int").alias("word"),
            # 1 << (pos & 31) — PySpark's shiftleft only takes a literal
            # shift count, so the bit mask comes from a 32-literal array
            F.element_at(
                _pow2(), (F.col("pos").bitwiseAND(F.lit(31)) + 1).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    dense = per_word.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
    )
    return dense.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_WORDS - 1)),
            lambda i: F.coalesce(
                F.element_at("m", i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("words")
    )


def _contains_h(words: Column, h: Column) -> Column:
    """True iff all k bits for the staged hash ``h`` are set in ``words``
    (mask test — word & 2^bit ≠ 0 — rather than a variable shift)."""
    out = None
    for p in _positions(h):
        word = F.element_at(words, (F.shiftright(p, 5) + 1).cast("int"))
        mask = F.element_at(
            _pow2(), (p.bitwiseAND(F.lit(31)) + 1).cast("int")
        )
        check = word.bitwiseAND(mask) != 0
        out = check if out is None else (out & check)
    return out


def bloom_probe_shingles(
    docs: DataFrame,
    bloom: DataFrame,
    shingles_col: str = "shingles",
) -> DataFrame:
    """Probe each doc's (distinct) shingle array against the filter.

    The 1-row filter broadcast cross-joins onto the probe side; the hash
    is staged once per shingle (see module docstring), then the hit
    count is a narrow ``F.size(F.filter(...))`` — the corpus never
    explodes or shuffles. Emits n_shingles / n_bloom_hits / flagged.
    """
    staged = docs.withColumn(
        "__hs",
        F.transform(F.col(shingles_col), lambda s: fmix32(portable_hash(s))),
    )
    probed = staged.crossJoin(F.broadcast(bloom))
    n_hits = F.size(
        F.filter(F.col("__hs"), lambda h: _contains_h(F.col("words"), h))
    )
    return (
        probed.withColumn("n_shingles", F.size(F.col(shingles_col)))
        .withColumn("n_bloom_hits", n_hits)
        .withColumn("flagged", n_hits > 0)
        .drop("words", "__hs", shingles_col)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def _positions_sql(h: str) -> list[str]:
    return [
        f"((({a} * ({h}) + {b}) % {MERSENNE31}) % {BLOOM_BITS})"
        for a, b in BLOOM_COEFFS
    ]


def bloom_words_cte_sql(items_rel: str, item_expr: str) -> str:
    """CTE chain (no leading WITH) ending in ``__bloom(words)`` — the
    1-row dense words list built from ``items_rel`` / ``item_expr``.
    The hash is staged column-wise (__bh.h) so the finalizer expansion
    happens once, exactly like the Spark plan."""
    h = fmix32_sql(portable_hash_sql(item_expr))
    pos_list = ", ".join(_positions_sql("h"))
    return f"""
        __bh AS (SELECT ({h}) AS h FROM {items_rel}),
        __bpos AS (SELECT unnest([{pos_list}]) AS pos FROM __bh),
        __bw AS (
            SELECT CAST(pos >> 5 AS INTEGER) AS word,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos & 31 AS INTEGER)) AS bits
            FROM __bpos GROUP BY 1
        ),
        __bdense AS (
            SELECT i.i AS word, coalesce(w.bits, 0) AS bits
            FROM range(0, {N_WORDS}) i(i) LEFT JOIN __bw w ON w.word = i.i
        ),
        __bloom AS (SELECT list(bits ORDER BY word) AS words FROM __bdense)
    """


def bloom_contains_h_sql(words: str, h: str) -> str:
    """Boolean SQL: all k bits for staged hash ``h`` set in list
    ``words``. ``h`` should be a short column/lambda reference — the
    position expressions inline it a few times each."""
    checks = [
        f"(list_extract({words}, CAST((({p}) >> 5) AS INTEGER) + 1) "
        f">> CAST((({p}) & 31) AS INTEGER)) & 1 = 1"
        for p in _positions_sql(h)
    ]
    return "(" + " AND ".join(checks) + ")"


def staged_hash_list_sql(shingles_expr: str) -> str:
    """``list_transform(shingles, s -> fmix32(porthash(s)))`` — the
    oracle twin of the probe's hash staging."""
    return (
        f"list_transform({shingles_expr}, s -> "
        + fmix32_sql(portable_hash_sql("s"))
        + ")"
    )


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch — the order-statistics cousin of HLL
# ---------------------------------------------------------------------------

_M32 = 1 << 32


def kmv_minima(df: DataFrame, item_col: Column, k: int = 64) -> DataFrame:
    """The sketch STATE: the k smallest distinct avalanche-mixed hashes
    of the items (fmix32 over the portable polynomial hash — the raw
    poly hash clusters sequential keys, which skews order statistics
    exactly like it saturates HLL registers) — mergeable by
    construction (the k smallest of a union are found inside the union
    of per-shard k smallest), so shards persist k rows each and a
    reader re-mins. orderBy().limit() is TakeOrdered: a per-partition
    heap + driver merge, never a global sort."""
    from cernan_spark.functions.porthash import portable_hash

    return (
        df.select(fmix32(portable_hash(item_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(mins: DataFrame, k: int = 64) -> DataFrame:
    """Fold the state into the KMV estimator: with the k-th smallest of
    n distinct uniform hashes in [0, M), E[h_k] ≈ k·M/(n+1), so
    n̂ = (k-1)·M/h_k (the standard unbiased KMV form). When fewer than
    k distinct hashes exist the sketch IS the exact distinct set. One
    division of exact integers; the joined minima string pins the whole
    state in the gate."""
    agg = mins.agg(
        F.count(F.lit(1)).alias("k_actual"),
        F.max("h").alias("kth_min"),
        F.sort_array(F.collect_list("h")).alias("_mins"),
    )
    est = F.when(
        F.col("k_actual") < k, F.col("k_actual").cast("double")
    ).otherwise(
        ((F.col("k_actual") - 1) * F.lit(_M32)).cast("double")
        / F.col("kth_min").cast("double")
    )
    return agg.select(
        "k_actual",
        "kth_min",
        F.round(est, 4).alias("est_distinct"),
        F.array_join(
            F.transform("_mins", lambda h: h.cast("string")), ","
        ).alias("minima"),
    )


def kmv_merge(shards: list[DataFrame], k: int = 64) -> DataFrame:
    """Union persisted per-shard minima, re-min, estimate — identical to
    one pass over the union BY ALGEBRA (min-k is idempotent,
    commutative, associative on sets)."""
    merged = shards[0]
    for s in shards[1:]:
        merged = merged.unionByName(s)
    return kmv_estimate(
        merged.distinct().orderBy("h").limit(k), k
    )


def chapman_estimate(
    df: DataFrame,
    id_col: str,
    in1_col: str,
    in2_col: str,
) -> DataFrame:
    """Capture–recapture population estimate from two overlapping
    observation channels (Lincoln–Petersen and the bias-corrected
    Chapman form) — "how many users exist, given what two independent
    streams each saw", the closed-population complement of the HLL/KMV
    cardinality sketches in this module (those count what WAS seen;
    this extrapolates what WASN'T):

        N̂_P = n₁·n₂ / m        N̂_C = (n₁+1)(n₂+1)/(m+1) − 1

    with n₁/n₂ the per-channel distinct ids and m the recaptures
    (seen by both).

    Float discipline: n₁, n₂, m, and the observed distinct total are
    exact BIGINTs from ONE aggregate over the id-grain rollup;
    both estimators are single divisions of exact products (Petersen
    NULL when m = 0).

    Output one row: ``n1, n2, m, n_observed, petersen, chapman,
    coverage`` (round 6; coverage = n_observed / chapman).
    """
    per_id = df.groupBy(F.col(id_col).alias("id")).agg(
        F.max(F.col(in1_col).cast("int")).alias("s1"),
        F.max(F.col(in2_col).cast("int")).alias("s2"),
    )
    agg = per_id.agg(
        F.sum("s1").cast("long").alias("n1"),
        F.sum("s2").cast("long").alias("n2"),
        F.sum((F.col("s1") * F.col("s2"))).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_observed"),
    )
    chapman = (
        ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
        / (F.col("m") + 1).cast("double")
        - F.lit(1.0)
    )
    return agg.select(
        "n1",
        "n2",
        "m",
        "n_observed",
        F.round(
            F.when(
                F.col("m") > 0,
                (F.col("n1") * F.col("n2")).cast("double")
                / F.col("m").cast("double"),
            ),
            6,
        ).alias("petersen"),
        F.round(chapman, 6).alias("chapman"),
        F.round(F.col("n_observed").cast("double") / chapman, 6).alias(
            "coverage"
        ),
    )
