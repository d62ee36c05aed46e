"""Similarity search over embedding columns (array<float>).

Two paths:

* :func:`cosine_topk_bruteforce` — exact baseline: broadcast the probe set,
  score every (probe, candidate) pair with JVM-side fold expressions,
  window top-k. Right answer, O(N·Q) — fine for Q small.
* :func:`cosine_topk_lsh` — scale path: random-hyperplane LSH. Each vector
  gets a b-bit sign signature; candidates are restricted to buckets that
  match a probe's signature within one band. Recall < 1.0 by construction;
  bucket size bounds the join. At 100 TB the bucket join shuffles only
  (bucket_key, vec) pairs and AQE handles skewed buckets.

Plus :func:`embedding_near_dup_pairs` — embedding-cosine near-duplicate
detection (LSH buckets → verified cosine ≥ threshold).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )


def with_unit_vector(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Stage a double-typed, L2-normalized copy of the vector (cosine
    becomes plain dot product; staged so downstream refs don't recompute)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = df.withColumn("_v", v)
    n = _norm(F.col("_v"))
    df = df.withColumn("_n", n)
    return df.withColumn(
        "unit", F.transform(F.col("_v"), lambda x: x / F.col("_n"))
    ).drop("_v", "_n")


def cosine_topk_bruteforce(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast probes × all vectors."""
    base = with_unit_vector(vectors, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("unit")
    )
    q = with_unit_vector(probes, vec_col).select(
        F.col(id_col).alias("qid"), F.col("unit").alias("qunit")
    )
    scored = base.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    ).select("qid", "vec_id", _dot(F.col("qunit"), F.col("unit")).alias("cos"))
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)
    ]


#: universal-hash constants for the portable (cross-engine) planes
_PORTABLE_A = 1103515245
_PORTABLE_B = 12345
_PORTABLE_P = (1 << 31) - 1


def _portable_hyperplanes(dim: int, bits: int) -> list[list[float]]:
    """Rademacher ±1 hyperplanes from a universal integer hash — exactly
    reproducible in ANSI SQL (the DuckDB oracle regenerates the identical
    planes), unlike the Gaussian default. sign(i, j) = +1 iff
    ((a·(i·dim+j) + b) mod p) is even. The sign-signature LSH guarantee
    (P[bit collision] = 1 − θ/π) holds for Rademacher projections just as
    for Gaussian ones (±1 entries are a symmetric sub-gaussian draw)."""
    return [
        [
            1.0
            if ((_PORTABLE_A * (i * dim + j) + _PORTABLE_B) % _PORTABLE_P) % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for i in range(bits)
    ]


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """b-bit sign signature of a vector under fixed random hyperplanes —
    pure fold expressions, evaluated JVM-side."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(x) for x in p])
        bits.append((_dot(vec, plane) >= 0).cast("int"))
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out + b.cast("long") * F.lit(1 << i)
    return out


def cosine_topk_lsh(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures split into bands;
    candidates share at least one exact band with the probe. One shuffle on
    (band, band_sig); per-bucket scoring; exact rescoring of candidates.
    ``portable=True`` swaps Gaussian planes for hash-derived ±1 planes so a
    SQL oracle can replay the whole index path bit-for-bit."""
    planes = (
        _portable_hyperplanes(dim, bits) if portable
        else _hyperplanes(dim, bits, seed)
    )
    rows_per_band = bits // bands

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        u = with_unit_vector(df, vec_col).select(
            F.col(id_col).alias(f"{prefix}id"), F.col("unit").alias(f"{prefix}unit")
        )
        u = u.withColumn("_sig", signature_col(F.col(f"{prefix}unit"), planes))
        bands_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(
                        F.col("_sig"), b * rows_per_band
                    ).bitwiseAND(F.lit((1 << rows_per_band) - 1)).alias("bsig"),
                )
                for b in range(bands)
            ]
        )
        return u.select(
            f"{prefix}id", f"{prefix}unit", F.explode(bands_arr).alias("bb")
        ).select(f"{prefix}id", f"{prefix}unit", "bb.band", "bb.bsig")

    cand = banded(vectors, "v")
    qr = banded(probes, "q")
    pairs = (
        cand.join(F.broadcast(qr), ["band", "bsig"])
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid", "qunit", "vunit")
        .dropDuplicates(["qid", "vid"])
    )
    scored = pairs.select(
        "qid",
        F.col("vid").alias("vec_id"),
        _dot(F.col("qunit"), F.col("vunit")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def fit_ivf_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
) -> list[list[float]]:
    """Train the IVF coarse quantizer (MLlib KMeans over unit vectors) and
    return the centroids as plain lists — the persistable index state.
    Centroid-sized, not corpus-sized: n_cells × dim doubles."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = with_unit_vector(vectors, vec_col)
    train = base.select(array_to_vector("unit").alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
    return [c.tolist() for c in model.clusterCenters()]


def save_ivf_centroids(spark, centers: list[list[float]], path: str) -> None:
    """Persist centroids as a tiny (cell, center) table so scheduled runs
    reuse the SAME quantizer: a retrained KMeans drifts cell assignments
    across runs, which breaks an incrementally-maintained cell index."""
    rows = [(i, c) for i, c in enumerate(centers)]
    spark.createDataFrame(rows, "cell int, center array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_ivf_centroids(spark, path: str) -> list[list[float]] | None:
    """Load persisted centroids; None ONLY when the table does not exist
    yet (first run → fit and save). Any other read failure — permissions,
    partial write, corruption — propagates: silently refitting there
    would overwrite the quantizer and drift every cell assignment, the
    exact failure persistence exists to prevent (r4 ADVICE #3)."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(path).orderBy("cell").collect()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    return [list(r["center"]) for r in rows]


def cosine_topk_ivf(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    centroids_path: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    corpus into ``n_cells`` cells; each query scores only the ``n_probe``
    cells whose centroids are nearest — the classic IVF-Flat index shape.

    Spark-first: centroids come from MLlib KMeans (one distributed fit on
    unit vectors); cell assignment and probe-cell selection are pure
    argmax-of-dot expressions over broadcast centroid literals (no Python
    in the scan); the probe is ONE equi-join on cell id — at 100 TB the
    corpus shuffles once at index build (write bucketed by cell), and each
    query touches n_probe/n_cells of the data. Exact rescoring inside the
    probed cells; recall < 1 by construction (asserted vs the brute-force
    twin in pytest).

    Index reuse: pass ``centroids`` directly, or ``centroids_path`` to
    load a persisted quantizer (fit-and-save on first run) — cell
    assignments then stay stable across scheduled runs instead of
    drifting with every KMeans retrain."""
    spark = vectors.sparkSession
    base = with_unit_vector(vectors, vec_col).select(
        F.col(id_col).alias("vid"), F.col("unit")
    )
    centers = centroids
    if centers is None and centroids_path is not None:
        centers = load_ivf_centroids(spark, centroids_path)
    if centers is None:
        centers = fit_ivf_centroids(
            vectors, id_col, vec_col, n_cells, seed
        )
        if centroids_path is not None:
            save_ivf_centroids(spark, centers, centroids_path)
    n_cells = len(centers)

    def dots_to_centers(unit: Column) -> Column:
        return F.array(
            *[_dot(unit, F.array(*[F.lit(x) for x in c])) for c in centers]
        )

    # corpus side: cell = argmax dot (ties broken by first position)
    cd = dots_to_centers(F.col("unit"))
    corpus = base.withColumn("_d", cd).withColumn(
        "cell", F.array_position(F.col("_d"), F.array_max("_d")).cast("int")
    ).drop("_d")

    # probe side: the n_probe best cells per query
    q = with_unit_vector(probes, vec_col).select(
        F.col(id_col).alias("qid"), F.col("unit").alias("qunit")
    )
    qd = dots_to_centers(F.col("qunit"))
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.zip_with(
                    qd,
                    F.sequence(F.lit(1), F.lit(n_cells)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
                )
            )
        ),
        1,
        n_probe,
    )
    qcells = q.withColumn("_pc", ranked).select(
        "qid", "qunit", F.explode(F.col("_pc.cell")).alias("cell")
    ).withColumn("cell", F.col("cell").cast("int"))

    pairs = corpus.join(F.broadcast(qcells), "cell").filter(
        F.col("vid") != F.col("qid")
    )
    scored = pairs.select(
        "qid",
        F.col("vid").alias("vec_id"),
        _dot(F.col("qunit"), F.col("unit")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def seed_near_dups(
    vectors: DataFrame,
    n_seed: int = 50,
    id_offset: int = 1_000_000,
    delta: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Union the corpus with deterministic near-duplicate copies: for
    ``id < n_seed``, add a twin at ``id + id_offset`` whose first component
    is shifted by ``delta`` (cosine vs the original ≈ 0.999). The synthetic
    testdata corpus has no natural near-dups (max pairwise cosine ≈ 0.51),
    so this seeds exactly ``n_seed`` known pairs for the detector to find —
    the perturbation is plain double arithmetic, reproducible in ANSI SQL
    for the oracle. Output: (id_col, vec_col: array<double>)."""
    base = vectors.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias(vec_col),
    )
    seeded = base.filter(F.col(id_col) < n_seed).select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.transform(
            vec_col, lambda x, i: F.when(i == 0, x + F.lit(delta)).otherwise(x)
        ).alias(vec_col),
    )
    return base.unionByName(seeded)


def embedding_banded(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """The hyperplane-LSH banding stage as its own frame —
    (id, unit, band, bsig) — shared by the near-dup pair operator and the
    bucket-drop accounting (dedup.bucket_drop_stats)."""
    planes = _hyperplanes(dim, bits, seed)
    rows_per_band = bits // bands
    u = with_unit_vector(vectors, vec_col).select(
        F.col(id_col).alias("id"), "unit"
    ).withColumn("_sig", signature_col(F.col("unit"), planes))
    return u.select(
        "id",
        "unit",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("_sig"), b * rows_per_band)
                        .bitwiseAND(F.lit((1 << rows_per_band) - 1))
                        .alias("bsig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "unit", "bb.band", "bb.bsig")


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 16,
    bands: int = 4,
    max_bucket: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold)
    via LSH bucketing + exact verification within buckets. Oversize-bucket
    drops are countable with
    :func:`cernan_spark.operators.dedup.bucket_drop_stats` over
    :func:`embedding_banded` (keys ``["band", "bsig"]``)."""
    banded = embedding_banded(
        vectors, id_col, vec_col, dim, bits, bands, seed
    )
    buckets = (
        banded.groupBy("band", "bsig")
        .agg(F.collect_list(F.struct("id", "unit")).alias("m"))
        .filter((F.size("m") > 1) & (F.size("m") <= max_bucket))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("m"),
                            lambda a: F.transform(
                                F.col("m"),
                                lambda b: F.when(
                                    a["id"] < b["id"],
                                    F.struct(
                                        a["id"].alias("id_a"),
                                        b["id"].alias("id_b"),
                                        _dot(a["unit"], b["unit"]).alias("cos"),
                                    ),
                                ),
                            ),
                        )
                    ),
                    lambda p: p.isNotNull(),
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.cos")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.filter(F.col("cos") >= threshold)


def label_centroids(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Per-label centroid of the embedding column — the class-mean /
    drift-monitor primitive (and the statistic an IVF coarse quantizer
    re-fit starts from).

    Float summation order is nondeterministic under parallel aggregation,
    so naive avg() differs run-to-run AND engine-to-engine. Instead each
    component quantizes to integer micro-units (round(x·10⁶) — the
    float·10⁶ product is exact in double, ≤44 mantissa bits), integer
    sums are order-free and exact, and the mean divides back out with two
    correctly-rounded IEEE divisions — bit-identical everywhere, at any
    partitioning.

    Scale shape: posexplode × dim rows feed ONE map-side-combined hash
    aggregate with labels × dim groups; shuffle volume after combine is
    partitions × groups, independent of corpus size.
    """
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e6, 0).cast("long"),
    )
    ex = emb.select("label", F.posexplode(q).alias("i", "qv"))
    return (
        ex.groupBy("label", "i")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "i",
            F.round(
                (F.col("s").cast("double") / F.col("n")) / F.lit(1e6), 6
            ).alias("mean"),
            "n",
        )
    )


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", levels: int = 127
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column — the
    standard 4× compression step before a 100 TB ANN index is materialized
    (each float32 component → one signed byte + one per-vector scale).

    q_i = sign(x_i) · floor(|x_i|/scale + 0.5) with scale = max|x| / levels
    — explicit round-half-away-from-zero, because engine round() tie rules
    differ (Java HALF_UP vs C round-half-even) while floor(+0.5) is IEEE-
    deterministic everywhere. Reconstruction error folds left-to-right
    (F.aggregate ≡ DuckDB list_reduce), so the MSE is bit-identical
    cross-engine. Pure narrow transforms — no shuffle, no Python.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(amax, F.lit(1e-12)) / F.lit(float(levels))
    q = F.transform(
        v,
        lambda x: (
            F.signum(x) * F.floor(F.abs(x) / scale + F.lit(0.5))
        ).cast("long"),
    )
    # (x - q·scale)·(x - q·scale) via multiply, NOT pow(x, 2): pow is a
    # libm call whose rounding is not pinned across engines; a product is.
    sq_err = F.aggregate(
        F.zip_with(
            v,
            q,
            lambda x, qi: (x - qi.cast("double") * scale)
            * (x - qi.cast("double") * scale),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return (
        emb.withColumn("scale", scale)
        .withColumn("q", q)
        .withColumn("q_l1", F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)))
        .withColumn("mse", sq_err / F.size(v))
    )


def _jl_sign(j: int, i: int) -> int:
    """Deterministic ±1 sign for output dim j, input dim i: low bit of
    the murmur3-finalized portable hash of 'jl:j:i'. Pure data — the
    matrix is identical on every engine, executor and run."""
    h = 0
    for c in f"jl:{j}:{i}":
        h = (h * 31 + ord(c)) % ((1 << 31) - 1)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return 1 if h & 1 else -1


def jl_sign_matrix(k: int, dim: int) -> list[list[int]]:
    """The k×dim ±1 Achlioptas/JL projection matrix as plain Python
    literals (data-independent, so it ships inside the plan — no
    broadcast, no state, no randomness at run time)."""
    return [[_jl_sign(j, i) for i in range(dim)] for j in range(k)]


def jl_project(
    emb: DataFrame, k: int = 16, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to k dims with a ±1 sign
    matrix: proj_j = (Σᵢ vᵢ·s_{j,i}) / √k. The 100 TB shape for cheap
    distance-preserving sketches of an embedding column: a pure NARROW
    map (the sign matrix is literal, the fold order is the element
    order, every op is one IEEE multiply/add — bit-identical
    cross-engine).

    Emits the projected array plus the norm-preservation diagnostics
    (orig_sq, proj_sq — JL says proj_sq/orig_sq concentrates near 1).
    """
    signs = jl_sign_matrix(k, dim)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    inv_sqrt_k = 1.0 / math.sqrt(k)

    def comp(j: int):
        srow = F.array(*[F.lit(float(s)) for s in signs[j]])
        return (
            F.aggregate(
                F.zip_with(v, srow, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(inv_sqrt_k)
        )

    proj = F.array(*[comp(j) for j in range(k)])
    sq = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        proj.alias("proj"),
        sq(v).alias("orig_sq"),
        sq(proj).alias("proj_sq"),
    )


def jl_oracle_sql(k: int = 16, dim: int = 64, table: str = "embeddings") -> str:
    """DuckDB twin of :func:`jl_project` + the entry projection (scalar
    diagnostics only — array columns don't hash portably in the gate).
    Same literal matrix, same fold order, same op order."""
    signs = jl_sign_matrix(k, dim)
    inv_sqrt_k = repr(1.0 / math.sqrt(k))

    def comp(j: int) -> str:
        srow = "[" + ", ".join(f"{float(s)!r}" for s in signs[j]) + "]"
        return (
            "(list_reduce(list_prepend(0.0, "
            f"list_transform(range(1, {dim} + 1), "
            f"i -> v[i] * ({srow})[i])), (a, x) -> a + x) * {inv_sqrt_k})"
        )

    comps = ", ".join(comp(j) for j in range(k))
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM {table}
        ), p AS (
            SELECT vec_id, v, [{comps}] AS proj FROM v
        )
        SELECT vec_id,
               round(list_reduce(list_prepend(0.0,
                 list_transform(v, x -> x * x)), (a, x) -> a + x), 9)
                 AS orig_sq,
               round(list_reduce(list_prepend(0.0,
                 list_transform(proj, x -> x * x)), (a, x) -> a + x), 9)
                 AS proj_sq,
               round(proj[1], 9) AS proj_first,
               round(proj[{k}], 9) AS proj_last
        FROM p
    """


def knn_label_propagate(
    seeds: DataFrame,
    others: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation: each unlabeled vector takes the
    majority label of its k nearest SEED vectors by cosine (ties → most
    votes, then smallest label) — the weak-supervision labeling pass a
    training pipeline runs to extend a small hand-labeled set over the
    corpus. Reference analog: none (cernan routes by static masks); this
    extends the broadcast-dimension-join idiom (operators/route.py) to a
    learned dimension table.

    Plan: the labeled seed set broadcasts (it is the small side by
    construction — labels are expensive); the corpus streams through ONE
    narrow scoring pass and shuffles once at (unlabeled-id) grain for
    the top-k window, bounded by |seeds| rows per id. At 100 TB,
    pre-bucket candidates with the LSH/IVF quantizers in this module so
    the per-id candidate set is a bucket, not the full seed set. Dot
    products fold left-to-right in doubles (the ann_cosine_topk
    discipline both engines replay).
    """
    sv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = F.broadcast(
        seeds.select(
            F.col(id_col).alias("sid"),
            sv.alias("svec"),
            F.col(label_col).alias("slabel"),
        )
    )
    q = others.select(
        F.col(id_col).alias("qid"), sv.alias("qvec")
    )
    dot = F.aggregate(
        F.zip_with("qvec", "svec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    scored = q.crossJoin(s).select(
        "qid",
        "sid",
        "slabel",
        (dot / (nrm(F.col("qvec")) * nrm(F.col("svec")))).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("sid"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    votes = top.groupBy("qid", "slabel").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    best = votes.groupBy("qid").agg(
        F.min(
            F.struct((-F.col("n_votes")).alias("neg"), F.col("slabel"))
        ).alias("b")
    )
    return best.select(
        F.col("qid").alias(id_col),
        F.col("b.slabel").alias("pred_label"),
        (-F.col("b.neg")).cast("long").alias("n_votes"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    top_k: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retriever
    rankings: ``rrf = Σ_lists 1/(k + rank)``, summed only over the lists
    that contain the document (the standard missing-rank convention).
    Inputs are ``(id_col, rank)`` frames whose ranks were assigned over
    BOUNDED candidate sets (each retriever caps its list before ranking
    — see the entry query), so the fusion join touches ≤ |A|+|B| rows no
    matter the corpus size. 1/(k+rank) is a division of exact integers
    and the two-term sum has a fixed order, so the fused score is
    cross-engine exact."""
    a = ranked_a.select(id_col, F.col("rank").alias("rank_a"))
    b = ranked_b.select(id_col, F.col("rank").alias("rank_b"))
    fused = a.join(b, id_col, "full_outer").withColumn(
        "rrf",
        F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_a")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_b")), F.lit(0.0)),
    )
    w = W.orderBy(F.round("rrf", 6).desc(), F.col(id_col))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= top_k)
        .select(
            id_col, "rank_a", "rank_b",
            F.round("rrf", 6).alias("rrf"), "fused_rank",
        )
    )


def truncation_recall(
    vectors: DataFrame,
    n_probes: int,
    k: int,
    trunc_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style truncation audit: recall@k of a PREFIX-truncated
    embedding space against the full space. For each probe, rank all
    vectors by cosine in full dimension and again using only the first
    ``trunc_dim`` components; report how many of the full-space top-k the
    truncated space retains — the measurement that decides whether a
    cheaper prefix index (IVF/LSH over fewer dims) is safe to deploy.

    Output: ``qid, n_common, recall`` (``recall = n_common/k``, one exact
    division of integers). Both rankings are the brute-force exact top-k
    (:func:`cosine_topk_bruteforce` — probes broadcast, candidates never
    shuffled); the truncated space re-normalizes over the prefix, as a
    prefix index would.
    """
    probes = vectors.filter(F.col(id_col) < n_probes)
    full = cosine_topk_bruteforce(vectors, probes, k, id_col, vec_col)
    tvec = vectors.select(
        id_col, F.slice(vec_col, 1, trunc_dim).alias(vec_col)
    )
    tprobes = tvec.filter(F.col(id_col) < n_probes)
    trunc = cosine_topk_bruteforce(tvec, tprobes, k, id_col, vec_col)
    hits = trunc.select("qid", "vec_id", F.lit(1).alias("_hit"))
    return (
        full.join(hits, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("n_common"))
        .select(
            "qid",
            "n_common",
            (F.col("n_common") / F.lit(float(k))).alias("recall"),
        )
    )


def _glibc_ln():
    """C-libm ``log`` as a tiny Arrow UDF, for entropy terms evaluated at
    DIMENSION grain (≤ a few hundred rows — never on a fact table).

    JVM ``Math.log`` and glibc ``log`` are both ~0.5-ULP accurate but
    disagree by one ULP on some inputs (observed: log(24/260), JVM
    -0x1.30f9f2a1342eap+1 vs glibc ...e9p+1). The DuckDB oracle uses the
    C libm, so entropy queries that must replay bit-identically route
    their ln through the same library via CPython's ``math.log``.

    The ratio divides INSIDE the UDF (IEEE division is bit-identical in
    CPython and the JVM): Spark extracts UDF arguments into an
    unconditional ArrowEvalPython node, so a CASE cannot shield a
    JVM-side c/n from ANSI divide-by-zero on an empty split, nor
    log(0)."""
    import math

    from pyspark.sql.functions import udf

    return udf(
        lambda c, n: math.log(c / n) if c and n else None,
        "double",
        useArrow=True,
    )


def _entropy_expr(cols: list[Column], n: Column) -> Column:
    """Fixed-order Shannon entropy −Σ (c/n)·ln(c/n) over explicit count
    columns. The term list is folded LEFT-TO-RIGHT in source order — the
    same associativity the SQL twin's literal ``t0 + t1 + …`` carries —
    so the float sum is bit-identical across engines (each term is one
    exact-integer division and one ln). Written ``0.0 − Σ`` rather than
    ``−Σ`` so an all-zero split yields +0.0, never −0.0 — unary negation
    of 0.0 is signed differently across engines and would break a value
    hash."""
    nd = n.cast("double")
    ln = _glibc_ln()
    terms = None
    for c in cols:
        cd = c.cast("double")
        t = F.when(c == 0, F.lit(0.0)).otherwise((cd / nd) * ln(cd, nd))
        terms = t if terms is None else terms + t
    return F.lit(0.0) - terms


def entropy_sql(count_exprs: list[str], n_expr: str) -> str:
    """DuckDB twin of :func:`_entropy_expr` (same term order)."""
    terms = " + ".join(
        f"(CASE WHEN {c} = 0 THEN 0.0 ELSE "
        f"(CAST({c} AS DOUBLE) / CAST({n_expr} AS DOUBLE)) * "
        f"ln(CAST({c} AS DOUBLE) / CAST({n_expr} AS DOUBLE)) END)"
        for c in count_exprs
    )
    return f"(0.0 - ({terms}))"


def sign_split_infogain(
    emb: DataFrame,
    labels: list[int],
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-dimension information gain of the sign split — which embedding
    coordinates carry label signal. For each dimension d, split the
    corpus by ``x_d > 0`` and report ``IG(d) = H(label) −
    (n⁺/N)·H(label|+) − (n⁻/N)·H(label|−)`` — the feature-selection
    ranking that decides which prefix dims a truncated (Matryoshka) or
    quantized index should keep. The label set must be a known literal
    list so entropies are FIXED-ORDER expressions over exact per-label
    counts (no data-dependent float fold).

    Plan: posexplode to (dim, sign) grain — a 64× narrow expansion, no
    corpus shuffle until ONE hash aggregate on (dim, sign) with all label
    counts as CASE-sum arms — then a 128-row reshape. Output: one row per
    dimension.
    """
    ex = emb.select(
        F.col(label_col).alias("_lab"),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    )
    per = ex.groupBy("dim", (F.col("_x") > 0).alias("_pos")).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum((F.col("_lab") == F.lit(l)).cast("long")).alias(f"_c{l}")
            for l in labels
        ],
    )
    pos = lambda c: F.sum(F.when(F.col("_pos"), F.col(c)).otherwise(F.lit(0)))
    neg = lambda c: F.sum(F.when(~F.col("_pos"), F.col(c)).otherwise(F.lit(0)))
    g = per.groupBy("dim").agg(
        pos("_n").alias("n_pos"),
        neg("_n").alias("n_neg"),
        *[pos(f"_c{l}").alias(f"p{l}") for l in labels],
        *[neg(f"_c{l}").alias(f"m{l}") for l in labels],
    )
    n_tot = F.col("n_pos") + F.col("n_neg")
    h_all = _entropy_expr(
        [F.col(f"p{l}") + F.col(f"m{l}") for l in labels], n_tot
    )
    h_pos = _entropy_expr([F.col(f"p{l}") for l in labels], F.col("n_pos"))
    h_neg = _entropy_expr([F.col(f"m{l}") for l in labels], F.col("n_neg"))
    ig = (
        h_all
        - (F.col("n_pos").cast("double") / n_tot.cast("double")) * h_pos
        - (F.col("n_neg").cast("double") / n_tot.cast("double")) * h_neg
    )
    return g.select(
        "dim",
        "n_pos",
        "n_neg",
        h_pos.alias("h_pos"),
        h_neg.alias("h_neg"),
        ig.alias("info_gain"),
    )


def label_noise_knn(
    emb: DataFrame,
    n_probes: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label-noise audit by leave-one-out kNN: a point whose k nearest
    OTHER points vote a different majority label is a relabel/review
    candidate — the training-data QA pass run before fitting anything.
    Probes are the first ``n_probes`` ids (the audit is sampled; at scale
    the LSH/IVF quantizers bound the candidate set instead of the cross
    join). Majority ties break (most votes, smallest label), the exact
    :func:`knn_label_propagate` convention.

    Output: ``vec_id, label, pred_label, n_votes, suspect``.
    """
    sv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cand = F.broadcast(
        emb.select(
            F.col(id_col).alias("sid"),
            sv.alias("svec"),
            F.col(label_col).alias("slabel"),
        )
    )
    probes = emb.filter(F.col(id_col) < n_probes).select(
        F.col(id_col).alias("qid"), sv.alias("qvec"), F.col(label_col).alias("qlabel")
    )
    dot = F.aggregate(
        F.zip_with("qvec", "svec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = (
        probes.crossJoin(cand)
        .filter(F.col("sid") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "sid",
            "slabel",
            (dot / (nrm(F.col("qvec")) * nrm(F.col("svec")))).alias("cos"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("sid"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    votes = top.groupBy("qid", "qlabel", "slabel").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    best = votes.groupBy("qid", "qlabel").agg(
        F.min(F.struct((-F.col("n_votes")).alias("neg"), F.col("slabel"))).alias("b")
    )
    return best.select(
        F.col("qid").alias(id_col),
        F.col("qlabel").alias(label_col),
        F.col("b.slabel").alias("pred_label"),
        (-F.col("b.neg")).cast("long").alias("n_votes"),
        (F.col("b.slabel") != F.col("qlabel")).cast("int").alias("suspect"),
    )


def cluster_purity(
    emb: DataFrame,
    labels: list[int],
    n_sign_dims: int = 3,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster label purity and entropy for the sign-bit quantizer
    (the first ``n_sign_dims`` coordinates' signs form the cluster id —
    the cheapest deterministic coarse quantizer, the same family the
    SimHash band bucketing uses). Reports, per cluster: size, majority
    label, purity = n_majority / n, and the conditional label entropy
    via the fixed-order fold of :func:`_entropy_expr` — the quantizer-QA
    view that says whether a cheap ANN partition respects labels.

    One hash aggregate on the (tiny) cluster id; label counts are
    CASE-sum arms so the literal label list keeps every float a
    fixed-order ln/division of exact integers. Majority ties break to
    the smallest label (struct-min, no second shuffle).
    """
    cid = None
    for d in range(n_sign_dims):
        bit = (F.element_at(F.col(vec_col), d + 1) > 0).cast("int")
        cid = bit if cid is None else cid * 2 + bit
    g = emb.groupBy(cid.alias("cluster")).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col(label_col) == F.lit(l)).cast("long")).alias(f"c{l}")
            for l in labels
        ],
    )
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    (-F.col(f"c{l}")).alias("neg"), F.lit(l).alias("lab")
                )
                for l in labels
            ]
        )
    )
    ent = _entropy_expr([F.col(f"c{l}") for l in labels], F.col("n"))
    return g.select(
        "cluster",
        "n",
        best["lab"].alias("majority_label"),
        (-best["neg"]).cast("long").alias("n_majority"),
        ((-best["neg"]).cast("double") / F.col("n").cast("double")).alias(
            "purity"
        ),
        ent.alias("label_entropy"),
    )


def kappa_agreement(
    df: DataFrame,
    col_a: str,
    col_b: str,
    labels: list[int],
) -> DataFrame:
    """Cohen's kappa between two annotators over a literal label set —
    the inter-rater agreement gate a labeling pipeline runs before
    trusting a batch of annotations (chance-corrected: kappa = (p_o −
    p_e) / (1 − p_e)). ONE aggregate produces n, the agreement count,
    and per-label marginals as CASE-sum arms; p_e folds the label terms
    in literal order, each term an exact-integer product divided by n²,
    so the doubles replay bit-identically in the SQL twin.

    Output: one row — ``n, n_agree, p_o, p_e, kappa``.
    """
    a, b = F.col(col_a), F.col(col_b)
    g = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((a == b).cast("long")).alias("n_agree"),
        *[F.sum((a == F.lit(l)).cast("long")).alias(f"a{l}") for l in labels],
        *[F.sum((b == F.lit(l)).cast("long")).alias(f"b{l}") for l in labels],
    )
    nd = F.col("n").cast("double")
    pe = None
    for l in labels:
        t = (F.col(f"a{l}") * F.col(f"b{l}")).cast("double") / (nd * nd)
        pe = t if pe is None else pe + t
    po = F.col("n_agree").cast("double") / nd
    return g.select(
        "n",
        "n_agree",
        po.alias("p_o"),
        pe.alias("p_e"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC-AUC by the Mann–Whitney rank statistic — the one-pass,
    collect-free classifier eval a quality-filter pipeline runs before
    trusting a model's scores (reference analog: cernan's CKMS quantile
    summaries are the same "rank statistics at scale" discipline,
    /root/reference/src/buckets.rs quantile queries).

    Ties are handled with average ranks computed on the DISTINCT-score
    rollup: one hash aggregate to (score, n, n_pos), a window over that
    tiny table for the cumulative rank offset, then one final aggregate.
    Every intermediate is an exact integer or half-integer (avg rank =
    cum_before + (n+1)/2), so the commutative sums stay bit-exact and
    the only division is at emit. At 100 TB the shuffle carries ONE row
    per distinct score — quantize continuous scores first and the plan
    is unchanged.

    Output: one row — ``n, n_pos, n_neg, rank_sum_pos, auc, gini``.
    """
    y = F.col(label_col).cast("long")
    g = df.groupBy(F.col(score_col).alias("score")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(y).alias("pos_g"),
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    ranked = g.select(
        "n_g",
        "pos_g",
        (
            F.coalesce(F.sum("n_g").over(w), F.lit(0)).cast("double")
            + (F.col("n_g") + 1).cast("double") / F.lit(2.0)
        ).alias("avg_rank"),
    )
    t = ranked.agg(
        F.sum("n_g").alias("n"),
        F.sum("pos_g").alias("n_pos"),
        F.sum(F.col("pos_g").cast("double") * F.col("avg_rank")).alias(
            "rank_sum_pos"
        ),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = (
        F.col("rank_sum_pos")
        - (F.col("n_pos") * (F.col("n_pos") + 1)).cast("double") / F.lit(2.0)
    ) / (F.col("n_pos") * n_neg).cast("double")
    return t.select(
        "n",
        "n_pos",
        n_neg.alias("n_neg"),
        "rank_sum_pos",
        auc.alias("auc"),
        (F.lit(2.0) * auc - F.lit(1.0)).alias("gini"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    denom: int = 128,
    n_bins: int = 8,
) -> DataFrame:
    """Reliability diagram + expected calibration error over an integer
    score in ``[0, denom)``: predicted probability p = score/denom (an
    exact binary fraction when denom is a power of two), equal-width
    bins, per-bin mean prediction vs empirical positive rate, and the
    bin-weighted |gap| folded in bin order into one corpus-level ECE.

    ONE hash aggregate to the bin grain (≤ n_bins rows); the ECE fold
    runs over the sorted bin structs and is broadcast back onto the bin
    rows, so nothing bigger than n_bins ever moves after the aggregate.

    Output: one row per non-empty bin — ``bin, n, mean_pred, frac_pos,
    abs_gap, ece`` (ece repeated on every row).
    """
    width = denom // n_bins
    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    bins = (
        df.groupBy(F.floor(s / F.lit(width)).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).alias("n_pos"),
            F.sum(s).alias("sum_s"),
        )
        .select(
            "bin",
            "n",
            (
                F.col("sum_s").cast("double")
                / (F.col("n") * F.lit(denom)).cast("double")
            ).alias("mean_pred"),
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "frac_pos"
            ),
        )
        .withColumn("abs_gap", F.abs(F.col("mean_pred") - F.col("frac_pos")))
    )
    total = bins.agg(
        F.sum("n").alias("n_total"),
        F.array_sort(
            F.collect_list(F.struct("bin", (F.col("n").cast("double") * F.col("abs_gap")).alias("term")))
        ).alias("terms"),
    ).select(
        (
            F.aggregate(
                "terms", F.lit(0.0), lambda acc, x: acc + x["term"]
            )
            / F.col("n_total").cast("double")
        ).alias("ece")
    )
    return bins.crossJoin(F.broadcast(total)).select(
        "bin", "n", "mean_pred", "frac_pos", "abs_gap", "ece"
    )


def sliced_auc(
    df: DataFrame, grp_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Per-slice exact ROC-AUC plus the cross-slice fairness gap — the
    disaggregated-eval audit (does the quality filter score one
    language/source worse than another?) run the same collect-free way
    as :func:`binary_auc`: one hash aggregate to the (slice, distinct
    score) grain, windows PARTITIONED by slice over that rollup, one
    aggregate per slice, and the max−min AUC gap broadcast back from a
    one-row fold. max/min of deterministic doubles are order-free, so
    no fold pinning is needed anywhere.

    Output: one row per slice — ``grp, n, n_pos, n_neg, auc, auc_gap``
    (gap repeated; slices missing a class emit NULL auc and are
    excluded from the gap).
    """
    y = F.col(label_col).cast("long")
    g = df.groupBy(
        F.col(grp_col).alias("grp"), F.col(score_col).alias("score")
    ).agg(F.count(F.lit(1)).alias("n_g"), F.sum(y).alias("pos_g"))
    w = (
        W.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = g.select(
        "grp",
        "n_g",
        "pos_g",
        (
            F.coalesce(F.sum("n_g").over(w), F.lit(0)).cast("double")
            + (F.col("n_g") + 1).cast("double") / F.lit(2.0)
        ).alias("avg_rank"),
    )
    per = ranked.groupBy("grp").agg(
        F.sum("n_g").alias("n"),
        F.sum("pos_g").alias("n_pos"),
        F.sum(F.col("pos_g").cast("double") * F.col("avg_rank")).alias(
            "rank_sum_pos"
        ),
    )
    n_neg = F.col("n") - F.col("n_pos")
    auc = F.when(
        (F.col("n_pos") > 0) & (n_neg > 0),
        (
            F.col("rank_sum_pos")
            - (F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / F.lit(2.0)
        )
        / (F.col("n_pos") * n_neg).cast("double"),
    )
    per = per.select(
        "grp", "n", "n_pos", n_neg.alias("n_neg"), auc.alias("auc")
    )
    gap = per.agg(
        (F.max("auc") - F.min("auc")).alias("auc_gap")
    )
    return per.crossJoin(F.broadcast(gap)).select(
        "grp", "n", "n_pos", "n_neg", "auc", "auc_gap"
    )


def roc_curve(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """The full ROC/PR operating table: one row per distinct score
    threshold t with the confusion counts and rates for the rule
    "predict positive when score ≥ t". Suffix sums over the
    distinct-score rollup (window ordered by score DESC) — exact
    integers, divisions only at emit; the output is threshold-sized,
    never data-sized, so it plots straight from the cluster.

    Output per threshold: ``threshold, tp, fp, fn, tn, tpr, fpr,
    prec`` (prec = tp/(tp+fp); tp+fp ≥ 1 by construction since the
    threshold itself carries at least one row).
    """
    y = F.col(label_col).cast("long")
    g = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.count(F.lit(1)).alias("n_g"), F.sum(y).alias("pos_g")
    )
    wdesc = W.orderBy(F.col("threshold").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    tot = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = g.select(
        "threshold",
        F.sum("pos_g").over(wdesc).alias("tp"),
        (F.sum("n_g").over(wdesc) - F.sum("pos_g").over(wdesc)).alias("fp"),
        (F.sum("pos_g").over(tot) - F.sum("pos_g").over(wdesc)).alias("fn"),
        (
            F.sum("n_g").over(tot)
            - F.sum("pos_g").over(tot)
            - (F.sum("n_g").over(wdesc) - F.sum("pos_g").over(wdesc))
        ).alias("tn"),
    )
    return c.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double")
        ).alias("tpr"),
        (
            F.col("fp").cast("double")
            / (F.col("fp") + F.col("tn")).cast("double")
        ).alias("fpr"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("prec"),
    )


def simplified_silhouette(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster — the cluster-
    quality score an embedding-clustering pipeline reads after
    :func:`label_centroids`: per point a = distance to its OWN centroid,
    b = distance to the NEAREST OTHER centroid, s = (b−a)/max(a,b); the
    full-pairwise silhouette's O(n²) distance matrix is replaced by
    O(n·k), the standard large-scale variant.

    Float discipline: components quantize to integer micro-units exactly
    like ``label_centroids`` (sums order-free), centroid means are two
    correctly-rounded divisions, every squared distance folds over
    ascending dimension index, sqrt is correctly rounded, and per-cluster
    means fold over id-sorted structs — bit-identical cross-engine.

    Scale shape: ONE (label, dim) centroid aggregate, the k×dim centroid
    table broadcast back (k clusters — dimension-sized), one narrow map
    per point, one mean aggregate. No pairwise joins.

    Output per cluster: ``label, n, mean_a, mean_b, mean_silhouette``.
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1e6, 0).cast("long"),
    )
    pts = emb.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lab"),
        F.transform(q, lambda v: v.cast("double") / F.lit(1e6)).alias("v"),
    )
    cents = (
        emb.select(
            F.col(label_col).alias("clab"), F.posexplode(q).alias("i", "qv")
        )
        .groupBy("clab", "i")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy("clab")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "i",
                            (
                                (F.col("s").cast("double") / F.col("n"))
                                / F.lit(1e6)
                            ).alias("m"),
                        )
                    )
                ),
                lambda st: st["m"],
            ).alias("c")
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("c"), lambda x, c: (x - c) * (x - c)
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    dists = pts.crossJoin(F.broadcast(cents)).select(
        "vid", "lab", "clab", F.sqrt(d2).alias("d")
    )
    per_pt = dists.groupBy("vid", "lab").agg(
        F.max(F.when(F.col("clab") == F.col("lab"), F.col("d"))).alias(
            "a"
        ),
        F.min(F.when(F.col("clab") != F.col("lab"), F.col("d"))).alias(
            "b"
        ),
    )
    s = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(F.lit(0.0))
    scored = per_pt.select("vid", "lab", "a", "b", s.alias("s"))
    agg = scored.groupBy(F.col("lab").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(
            F.collect_list(F.struct("vid", "a", "b", "s"))
        ).alias("xs"),
    )
    fold = lambda field: F.aggregate(  # noqa: E731
        "xs", F.lit(0.0), lambda acc, x: acc + x[field]
    ) / F.col("n").cast("double")
    return agg.select(
        "label",
        "n",
        F.round(fold("a"), 6).alias("mean_a"),
        F.round(fold("b"), 6).alias("mean_b"),
        F.round(fold("s"), 6).alias("mean_silhouette"),
    )


def embedding_drift(
    emb: DataFrame,
    split_col: Column,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding drift between two cohorts (e.g. old vs new
    snapshot, split by a boolean column): the L2 distance between the
    cohorts' label centroids — the retraining tripwire an embedding
    pipeline watches (compose with ``label_centroids``, whose micro-unit
    exact-mean discipline this reuses; the distance folds squared
    component deltas in ascending dimension order, then one sqrt).

    Output per label: ``label, n_a, n_b, drift``.
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1e6, 0).cast("long"),
    )
    ex = emb.select(
        F.col(label_col).alias("label"),
        split_col.alias("in_b"),
        F.posexplode(q).alias("i", "qv"),
    )
    cents = (
        ex.groupBy("label", "in_b", "i")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy("label", "in_b")
        .agg(
            F.max("n").alias("n_vecs_dim"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "i",
                            (
                                (F.col("s").cast("double") / F.col("n"))
                                / F.lit(1e6)
                            ).alias("m"),
                        )
                    )
                ),
                lambda st: st["m"],
            ).alias("c"),
        )
    )
    a = cents.filter(~F.col("in_b")).select(
        "label",
        F.col("n_vecs_dim").alias("n_a"),
        F.col("c").alias("ca"),
    )
    b = cents.filter(F.col("in_b")).select(
        "label",
        F.col("n_vecs_dim").alias("n_b"),
        F.col("c").alias("cb"),
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("ca"), F.col("cb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return a.join(b, "label").select(
        "label", "n_a", "n_b", F.round(F.sqrt(d2), 6).alias("drift")
    )


def grid_dbscan(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.08,
    min_pts: int = 3,
    max_iter: int = 64,
) -> DataFrame:
    """Grid-density clustering of the embedding cloud's first two
    coordinates — the cell-granular cousin of DBSCAN (GriDBSCAN family):
    bucket points into eps-width grid cells, keep cells with ≥ min_pts
    points as DENSE, and merge 8-neighborhood-adjacent dense cells into
    clusters; points in sparse cells are noise. Cell granularity (not
    point granularity) is the deliberate scale trade: density tests and
    merges touch only the bounded CELL rollup, never pairwise points.

    Scale shape: the neighbor relation is an EQUIJOIN on shifted cell
    keys (each dense cell emits its 8 neighbor coordinates and joins
    back on (cx, cy)) — no |Δ|≤1 theta join, so it shuffles on the cell
    key like any other aggregate. Component merge is iterative min-label
    propagation over dense cells with localCheckpoint per round and a
    bounded-count early exit (the repo's iterative-operator pattern —
    pagerank/BFS/LPA). Cluster ids are the component's MIN dense-cell
    id, so labels are deterministic and replayable.

    Float discipline: the ONLY float op is floor(coord / eps) — a
    correctly-rounded division of exactly-converted float32 coordinates
    by a shared literal, then an exact floor — after which everything is
    BIGINT cell arithmetic.

    Output: one row per cluster ``cluster_id, n_cells, n_points`` (by
    min cell id) plus one noise row ``cluster_id = −1`` counting sparse
    cells/points (omitted when there is no noise).
    """
    pts = vectors.select(
        F.col(id_col).alias("pid"),
        F.floor(F.element_at(vec_col, 1).cast("double") / F.lit(eps))
        .cast("long")
        .alias("cx"),
        F.floor(F.element_at(vec_col, 2).cast("double") / F.lit(eps))
        .cast("long")
        .alias("cy"),
    )
    counts = pts.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).cast("long").alias("n_pts")
    )
    cell_id = (F.col("cx") + F.lit(100000)) * F.lit(1000000) + (
        F.col("cy") + F.lit(100000)
    )
    dense = counts.filter(F.col("n_pts") >= F.lit(min_pts)).select(
        cell_id.alias("id"), "cx", "cy", "n_pts"
    )
    sparse = counts.filter(F.col("n_pts") < F.lit(min_pts))
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if (dx, dy) != (0, 0)]
    shifted = dense.select(
        F.col("id").alias("src_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + F.lit(dx)).alias("cx"),
                        (F.col("cy") + F.lit(dy)).alias("cy"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("nb"),
    ).select("src_id", F.col("nb.cx").alias("cx"), F.col("nb.cy").alias("cy"))
    edges = shifted.join(
        dense.select(F.col("id").alias("dst_id"), "cx", "cy"), ["cx", "cy"]
    ).select("src_id", "dst_id")
    labels = dense.select("id", F.col("id").alias("label")).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("src_id"),
                    F.col("label").alias("nbr_label"),
                ),
                "src_id",
            )
            .groupBy(F.col("dst_id").alias("id"))
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        merged = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    "label", F.coalesce("nbr_min", "label")
                ).alias("label"),
                (F.coalesce("nbr_min", "label") < F.col("label")).alias(
                    "chg"
                ),
            )
        ).localCheckpoint()
        changed = merged.filter("chg").limit(1).count()
        labels = merged.select("id", "label")
        if changed == 0:
            break
    clusters = (
        labels.join(dense.select("id", "n_pts"), "id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n_pts").alias("n_points"),
        )
        .select(F.col("label").alias("cluster_id"), "n_cells", "n_points")
    )
    noise = sparse.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.coalesce(F.sum("n_pts"), F.lit(0)).cast("long").alias("n_points"),
    ).select(
        F.lit(-1).cast("long").alias("cluster_id"), "n_cells", "n_points"
    ).filter(F.col("n_cells") > 0)
    return clusters.unionAll(noise).orderBy("cluster_id")
