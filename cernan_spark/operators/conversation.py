"""Conversation-level transcript operators: consecutive-turn dedup,
role-transition stats, tail token trimming, context-window packing and
weighted priority sampling.

These act on the north-rule transcripts shape
``(conv_id, turn_idx, role, text, tool, ts)`` — the multi-turn
conversation / agent-trace table — and cover the transcript-cleaning /
corpus-assembly steps of a training-data pipeline that the reference's
filter stage handles for telemetry (programmable filters,
/root/reference/src/filter/mod.rs:24-49): drop redundant turns, profile
the role structure, trim each conversation to a context budget, pack the
corpus into fixed-size training windows, and sample by quality weight.

Scale notes (10^12 turns):

* Per-conversation windows partition by ``conv_id`` — conversations are
  bounded by context length in practice, so no single task serializes a
  corpus-wide key (unlike a global window).
* The packing prefix sum and the weighted top-k both use the repo's
  two-phase chunked shape (per-chunk aggregate → tiny driver-side prefix
  table → broadcast back), so exactly one wide exchange touches the fact
  table and no global single-partition sort ever materializes.
* All arithmetic that the DuckDB oracle replays is integer or single
  IEEE-754 divisions (correctly rounded, hence bit-identical across
  engines) — no ``ln``/``pow`` libm calls whose rounding differs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_MERSENNE31 = (1 << 31) - 1

#: LCG constants for the priority-sample uniform draw — a different
#: stream from sample_to_token_budget's order key (increment 12345) so
#: sampling and budgeting decisions are independent.
_PRI_MUL = 1103515245
_PRI_INC = 54321


def dedup_consecutive_turns(df: DataFrame) -> DataFrame:
    """Drop turns that repeat the immediately preceding turn's
    ``(role, text)`` within a conversation (retry storms, duplicated
    tool outputs), then re-densify ``turn_idx`` so downstream operators
    keep the stable-order invariant. The original index is preserved in
    ``orig_turn_idx`` for lineage.

    Both windows share the ``conv_id`` partitioning, so Catalyst plans a
    single exchange for the whole operator.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    lagged = df.withColumn("_prole", F.lag("role").over(w)).withColumn(
        "_ptext", F.lag("text").over(w)
    )
    kept = lagged.filter(
        F.col("_prole").isNull()
        | ~((F.col("role") == F.col("_prole")) & (F.col("text") == F.col("_ptext")))
    )
    return kept.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("new_turn_idx"),
        F.col("turn_idx").alias("orig_turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    ).withColumnRenamed("new_turn_idx", "turn_idx")


def role_transitions(df: DataFrame) -> DataFrame:
    """Role-bigram profile of the corpus: for each ``(role, next_role)``
    adjacency (terminal turns transition to the sentinel ``'END'``),
    the number of turn adjacencies and the number of distinct
    conversations containing one.

    One exchange for the lead window, then a map-side-combined hash
    aggregate on the tiny (role × role) key space.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    nxt = F.coalesce(F.lead("role").over(w), F.lit("END"))
    return (
        df.withColumn("next_role", nxt)
        .groupBy("role", "next_role")
        .agg(
            F.count(F.lit(1)).alias("n_adj"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
    )


def trim_to_tail_budget(df: DataFrame, budget: int) -> DataFrame:
    """Keep each conversation's largest SUFFIX of whole turns whose
    total whitespace-token count fits ``budget`` — the context-window
    truncation step for multi-turn training examples (recent turns
    matter most, so trimming drops the oldest first).

    ``rev_cum_tokens`` is the running total counted from the tail
    inclusive of the current turn; a turn survives iff its suffix still
    fits. A single window over ``conv_id`` (descending ``turn_idx``)
    does both the count and the cut.
    """
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = (
        W.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        df.withColumn("rev_cum_tokens", F.sum(n_tok).over(w))
        .filter(F.col("rev_cum_tokens") <= F.lit(budget))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "rev_cum_tokens")
    )


def pack_concat_chop(
    docs: DataFrame,
    bin_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_width: int = 4096,
) -> DataFrame:
    """Concatenate-and-chop context packing: lay the corpus out in
    ``id_col`` order as one token stream and cut it into fixed
    ``bin_tokens`` training windows. Emits, per document, its global
    token offset, the window it starts in and how many windows it spans
    (a document crossing a boundary is chopped, GPT-style, not moved).

    The global prefix sum is the two-phase chunked shape (the same
    construction as ``sample_to_token_budget``): documents bucket by
    contiguous ``id_col`` ranges of ``chunk_width``, phase 1
    map-side-aggregates per-bucket token totals and prefix-sums them on
    the tiny bucket table, phase 2 runs the ordered scan per bucket in
    parallel and adds the broadcast starting offset. Long addition is
    associative, so the result is bit-identical to a single global
    window — which is the DuckDB oracle's form — while never
    serializing the corpus into one task.
    """
    n_tok = F.size(F.split(text_col, " ")).cast("long")
    staged = docs.select(
        F.col(id_col), n_tok.alias("n_tokens")
    ).withColumn("_bkt", F.floor(F.col(id_col) / F.lit(chunk_width)))
    totals = staged.groupBy("_bkt").agg(F.sum("n_tokens").alias("_bt"))
    wb = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    # the bucket table is tiny (n_docs / chunk_width rows), so the
    # single-partition window here is driver-scale work, not corpus-scale
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bt").over(wb), F.lit(0).cast("long"))
    ).select("_bkt", "_off")
    w = (
        W.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.col("_off") + F.coalesce(
        F.sum("n_tokens").over(w), F.lit(0).cast("long")
    )
    out = (
        staged.join(F.broadcast(offsets), "_bkt")
        .withColumn("start_offset", start)
        .withColumn(
            "first_bin", F.expr(f"start_offset DIV {int(bin_tokens)}")
        )
        .withColumn(
            "last_bin",
            F.expr(f"(start_offset + n_tokens - 1) DIV {int(bin_tokens)}"),
        )
    )
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        "first_bin",
        (F.col("last_bin") - F.col("first_bin") + 1).cast("int").alias("n_bins"),
    )


def _priority(id_col: Column, weight: Column) -> tuple[Column, Column]:
    """(u, q) for Duffield–Lund–Thorup priority sampling: ``u`` is a
    deterministic uniform draw in (0, 1] from the portable LCG stream,
    ``q = w / u`` the priority. Both the LCG (integer mod-arithmetic)
    and the two divisions are bit-identical in DuckDB, so the oracle
    selects the exact same sample."""
    m31 = F.lit(_MERSENNE31)
    u_int = F.pmod(
        F.lit(_PRI_MUL) * F.pmod(id_col.cast("long"), m31) + F.lit(_PRI_INC),
        m31,
    )
    u = (u_int + F.lit(1)) / F.lit(float(1 << 31))
    return u, weight.cast("double") / u


def priority_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Weighted-without-replacement sampling of ``k`` documents with
    inclusion probability increasing in ``weight_col`` — priority
    sampling (Duffield, Lund & Thorup, JACM 2007): draw uniform
    ``u_i``, keep the ``k`` largest priorities ``q_i = w_i / u_i``.
    The standard quality-weighted corpus subsampling step, deterministic
    across reruns because ``u`` comes from the portable hash stream.

    Distributed top-k without a global sort: per-bucket rank windows
    (parallel across ``n_buckets`` hash buckets) keep at most ``k``
    rows each, then one tiny ``n_buckets × k`` sort takes the global
    top ``k`` — bit-identical to the single-window form since the
    global top-k is contained in the union of per-bucket top-ks.
    Ties (impossible for distinct ids with this LCG, but cheap to pin)
    break by ascending id.
    """
    u, q = _priority(F.col(id_col), F.col(weight_col))
    staged = (
        docs.select(id_col, weight_col)
        .withColumn("_q", q)
        .withColumn("_bkt", F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets)))
    )
    wloc = W.partitionBy("_bkt").orderBy(F.col("_q").desc(), F.col(id_col))
    local = staged.withColumn("_r", F.row_number().over(wloc)).filter(
        F.col("_r") <= k
    )
    return (
        local.orderBy(F.col("_q").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            F.col(weight_col),
            F.round("_q", 6).alias("priority"),
        )
    )


def thread_paths(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    parent_col: str = "parent_idx",
    max_iters: int = 20,
) -> DataFrame:
    """Thread-tree reconstruction over branching conversations:
    (conv, turn, parent) edges → (conv, turn, depth, root) — the shape
    of forum/chat/agent-trace data where turns fork (tool-call branches,
    regenerated answers) instead of forming one linear chain.

    Spark-first pointer doubling: each round joins every turn's current
    farthest-known ancestor with THAT ancestor's own pointer, doubling
    the resolved distance — O(log depth) rounds, each ONE shuffle of the
    edge-sized frame (node count, not corpus bytes). A per-row parent
    WALK (recursive join per level) would be O(depth) shuffles; a
    collect-based union-find would serialize the corpus on the driver.
    The DuckDB oracle replays reachability with a recursive CTE.

    Rows with NULL ``parent_col`` are roots (depth 0, their own root).
    Cycles or dangling parents exhaust ``max_iters`` and raise.
    """
    base = turns.select(
        F.col(conv_col).alias("conv"),
        F.col(idx_col).alias("node"),
        F.col(parent_col).alias("parent"),
    )
    cur = base.filter(F.col("parent").isNotNull()).select(
        "conv",
        "node",
        F.col("parent").alias("anc"),
        F.lit(1).cast("long").alias("dist"),
    )
    # an anc with no row in `cur` has no parent → it is a root; pointer
    # doubling leaves such rows unchanged (left join misses)
    for _ in range(max_iters):
        x, y = cur.alias("x"), cur.alias("y")
        hopped = x.join(
            y,
            (F.col("x.conv") == F.col("y.conv"))
            & (F.col("x.anc") == F.col("y.node")),
            "left",
        ).select(
            F.col("x.conv").alias("conv"),
            F.col("x.node").alias("node"),
            F.coalesce(F.col("y.anc"), F.col("x.anc")).alias("anc"),
            (
                F.col("x.dist") + F.coalesce(F.col("y.dist"), F.lit(0))
            ).alias("dist"),
        )
        hopped = hopped.localCheckpoint(eager=True)
        unresolved = (
            hopped.alias("h")
            .join(
                cur.select("conv", F.col("node").alias("anc")).distinct(),
                ["conv", "anc"],
                "inner",
            )
            .limit(1)
            .count()
        )
        cur = hopped
        if unresolved == 0:
            break
    else:
        raise ValueError(
            f"thread_paths did not converge in {max_iters} rounds — "
            "cycle or pathological depth in the parent pointers"
        )
    roots = base.filter(F.col("parent").isNull()).select(
        "conv",
        "node",
        F.col("node").alias("root"),
        F.lit(0).cast("long").alias("depth"),
    )
    return (
        cur.select(
            "conv", "node", F.col("anc").alias("root"),
            F.col("dist").alias("depth"),
        )
        .unionByName(roots)
        .select(
            F.col("conv").alias(conv_col),
            F.col("node").alias(idx_col),
            "depth",
            F.col("root").alias("root_idx"),
        )
    )


def render_chat_template(df: DataFrame, mask_role: str = "assistant") -> DataFrame:
    """Render each conversation into ONE training example string plus the
    loss-mask char spans — the transcripts→SFT-example step of a training
    pipeline. Each turn renders as ``<|role|>\\n{text}\\n`` in ``turn_idx``
    order; the mask spans are the [start, end) char offsets (0-based) of
    the ``mask_role`` turns' text payloads, i.e. the only chars the loss
    sees. Reference analog: cernan's sinks serialize buffered telemetry
    into one wire blob per flush in arrival order (sink/mod.rs:115-141);
    here the per-turn text-equality invariant extends to the concatenated
    conversation, which the oracle checks byte-for-byte.

    Plan: ONE shuffle (groupBy conv_id). Per-turn pieces and header
    lengths are narrow expressions; the ordered concat and the span
    arithmetic fold over ONE sorted collect_list per conversation —
    conversations are context-bounded, so per-group state is small no
    matter the corpus size. All offsets are integers (exact cross-engine);
    spans serialize as a canonical ``start:end`` CSV string so the oracle
    compares them as one value.
    """
    piece = F.concat(
        F.lit("<|"), F.col("role"), F.lit("|>\n"), F.col("text"), F.lit("\n")
    )
    per_turn = df.select(
        "conv_id",
        "turn_idx",
        "role",
        piece.alias("piece"),
        F.length(piece).alias("piece_len"),
        (F.length("role") + F.lit(5)).alias("hdr_len"),
        F.length("text").alias("text_len"),
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    offs = per_turn.withColumn(
        "piece_start",
        F.coalesce(
            F.sum("piece_len").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn("text_start", F.col("piece_start") + F.col("hdr_len"))
    rows = offs.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("piece_len").cast("long").alias("n_chars"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", "piece"))
                ),
                lambda s: s["piece"],
            ),
            "",
        ).alias("rendered"),
        F.sum(
            F.when(F.col("role") == mask_role, 1).otherwise(0)
        ).cast("long").alias("n_mask_spans"),
        F.sum(
            F.when(F.col("role") == mask_role, F.col("text_len")).otherwise(0)
        ).cast("long").alias("mask_chars"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "turn_idx",
                                "role",
                                "text_start",
                                (F.col("text_start") + F.col("text_len")).alias(
                                    "text_end"
                                ),
                            )
                        )
                    ),
                    lambda s: s["role"] == mask_role,
                ),
                lambda s: F.concat(
                    s["text_start"].cast("string"),
                    F.lit(":"),
                    s["text_end"].cast("string"),
                ),
            ),
            ",",
        ).alias("mask_spans"),
    )
    return rows.select(
        "conv_id", "n_turns", "n_chars", "rendered",
        "n_mask_spans", "mask_chars", "mask_spans",
    )


def render_chat_oracle_sql(
    transcripts_cte: str = "transcripts", mask_role: str = "assistant"
) -> str:
    """DuckDB twin of :func:`render_chat_template` (same template, same
    0-based offsets, same canonical span serialization). Emitted in
    continuation form (leading comma) so it appends to a WITH clause that
    already defines ``transcripts_cte``."""
    return f"""
        , pieces AS (
            SELECT conv_id, turn_idx, role,
                   '<|' || role || '|>' || chr(10) || text || chr(10) AS piece,
                   len('<|' || role || '|>' || chr(10) || text || chr(10))
                       AS piece_len,
                   len(role) + 5 AS hdr_len,
                   len(text) AS text_len
            FROM {transcripts_cte}
        ), offs AS (
            SELECT *,
                   COALESCE(sum(piece_len) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) + hdr_len AS text_start
            FROM pieces
        )
        SELECT conv_id,
               count(*) AS n_turns,
               CAST(sum(piece_len) AS BIGINT) AS n_chars,
               string_agg(piece, '' ORDER BY turn_idx) AS rendered,
               CAST(sum(CASE WHEN role = '{mask_role}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_mask_spans,
               CAST(sum(CASE WHEN role = '{mask_role}' THEN text_len ELSE 0 END)
                    AS BIGINT) AS mask_chars,
               COALESCE(string_agg(
                   CASE WHEN role = '{mask_role}'
                        THEN CAST(text_start AS VARCHAR) || ':'
                             || CAST(text_start + text_len AS VARCHAR)
                   END, ',' ORDER BY turn_idx), '') AS mask_spans
        FROM offs
        GROUP BY conv_id
    """


def pack_sft_examples(
    df: DataFrame,
    bin_chars: int = 4096,
    n_shards: int = 16,
    mask_role: str = "assistant",
) -> DataFrame:
    """Pack rendered SFT examples (:func:`render_chat_template`) into
    fixed-capacity training bins and RE-BASE every loss-mask span to its
    bin-global offset — the examples→batches step between rendering and
    the trainer. Examples pack greedily (first-fit in conv_id order,
    same fold as ``packing.greedy_pack``) within ``n_shards``
    portable-hash shards; each example lands at the char offset equal to
    the summed lengths of its bin predecessors, and its ``start:end``
    mask spans shift by exactly that offset — so the trainer can slice
    assistant tokens straight out of the packed buffer.

    Plan: render is ONE shuffle; packing is the per-shard Arrow fold
    (shards bound the sequential extent — at 100 TB shards map to
    partitions and the fold never sees more than one shard); offsets are
    ONE window over (shard, bin) whose partitions are bin-bounded; span
    re-basing is a narrow transform over the span CSV. All arithmetic is
    integer, so the oracle replays the packed layout exactly.
    """
    from cernan_spark.functions.porthash import portable_hash
    from cernan_spark.operators.packing import greedy_pack

    r = render_chat_template(df, mask_role=mask_role)
    sized = r.select(
        "conv_id",
        "n_chars",
        "n_mask_spans",
        "mask_spans",
        F.pmod(portable_hash(F.col("conv_id")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )
    packed = greedy_pack(
        sized, ["shard"], ["conv_id"], "n_chars", max_bytes=bin_chars
    )
    w = W.partitionBy("shard", "batch_id").orderBy("conv_id")
    withoff = packed.withColumn(
        "offset_in_bin",
        F.coalesce(
            F.sum("n_chars").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    shift = F.when(F.col("mask_spans") == "", F.lit("")).otherwise(
        F.array_join(
            F.transform(
                F.split("mask_spans", ","),
                lambda s: F.concat(
                    (
                        F.split(s, ":")[0].cast("long")
                        + F.col("offset_in_bin")
                    ).cast("string"),
                    F.lit(":"),
                    (
                        F.split(s, ":")[1].cast("long")
                        + F.col("offset_in_bin")
                    ).cast("string"),
                ),
            ),
            ",",
        )
    )
    return withoff.select(
        "conv_id",
        "shard",
        F.col("batch_id").cast("long").alias("bin_id"),
        "offset_in_bin",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_mask_spans").cast("long").alias("n_mask_spans"),
        shift.alias("mask_spans"),
    )


def pack_sft_oracle_sql(
    bin_chars: int = 4096,
    n_shards: int = 16,
    mask_role: str = "assistant",
    transcripts_cte: str = "transcripts",
) -> str:
    """DuckDB twin of :func:`pack_sft_examples`: the render continuation
    (:func:`render_chat_oracle_sql`'s CTE chain), the recursive greedy
    pack fold, the same window offsets and span re-basing. Emitted in
    continuation form — append to a WITH RECURSIVE block that already
    defines ``transcripts_cte``."""
    from cernan_spark.functions.porthash import portable_hash_sql
    from cernan_spark.operators.packing import pack_walk_sql

    shard = (
        f"CAST(({portable_hash_sql('conv_id')}) % {n_shards} AS INTEGER)"
    )
    # render_chat_oracle_sql emits a continuation (', pieces AS (...)
    # ... SELECT ...'); as the body of the `rendered` CTE it becomes a
    # nested WITH block.
    render = render_chat_oracle_sql(
        transcripts_cte=transcripts_cte, mask_role=mask_role
    ).strip()
    assert render.startswith(","), "render continuation shape changed"
    render_body = "WITH " + render[1:].lstrip()
    return f"""
        , rendered AS MATERIALIZED ({render_body}
        ), sized AS (
            SELECT conv_id, n_chars, n_mask_spans, mask_spans,
                   {shard} AS shard
            FROM rendered
        ), ordered AS MATERIALIZED (
            SELECT CAST(shard AS VARCHAR) AS grp, n_chars AS sz, conv_id,
                   n_mask_spans, mask_spans, shard,
                   row_number() OVER (PARTITION BY shard ORDER BY conv_id)
                     AS rn
            FROM sized
        ), {pack_walk_sql('ordered', max_bytes=bin_chars)}
        , placed AS (
            SELECT o.conv_id, o.shard, w.batch AS bin_id, o.sz AS n_chars,
                   o.n_mask_spans, o.mask_spans,
                   COALESCE(sum(o.sz) OVER (
                       PARTITION BY o.shard, w.batch ORDER BY o.conv_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS offset_in_bin
            FROM ordered o JOIN walk w ON w.grp = o.grp AND w.rn = o.rn
        )
        SELECT conv_id, shard, CAST(bin_id AS BIGINT) AS bin_id,
               CAST(offset_in_bin AS BIGINT) AS offset_in_bin,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_mask_spans AS BIGINT) AS n_mask_spans,
               CASE WHEN mask_spans = '' THEN '' ELSE
                 array_to_string(list_transform(
                   string_split(mask_spans, ','),
                   s -> CAST(CAST(split_part(s, ':', 1) AS BIGINT)
                             + offset_in_bin AS VARCHAR)
                        || ':' ||
                        CAST(CAST(split_part(s, ':', 2) AS BIGINT)
                             + offset_in_bin AS VARCHAR)), ',')
               END AS mask_spans
        FROM placed
    """


def preference_pairs(
    df: DataFrame,
    group_cols: list[str],
    cand_col: str,
    score_col: str,
    min_margin: float,
) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF training-data shape).

    Within each group (a prompt / conversation), pick the highest- and
    lowest-scored candidate as the (chosen, rejected) pair; groups with
    fewer than two candidates, or a margin below ``min_margin``, emit
    nothing. Ties break on ``cand_col`` ascending so the pair is
    deterministic under reruns — the same stable-order discipline the
    transcripts table mandates for turn_idx.

    Output: ``group_cols..., chosen, rejected, chosen_score,
    rejected_score, margin, n_cand``.

    Plan: two ranks over the SAME partitioning (score desc / asc) plus the
    final per-group aggregate all cluster on ``group_cols`` — ONE exchange.
    `max(when(rn=1, struct))` folds each winner out of the ranked frame
    without a self-join (the textbook two-join formulation shuffles the
    candidate table three times).
    """
    wb = W.partitionBy(*group_cols).orderBy(
        F.col("_score").desc(), F.col("_cand").asc()
    )
    ww = W.partitionBy(*group_cols).orderBy(
        F.col("_score").asc(), F.col("_cand").asc()
    )
    ranked = df.select(
        *group_cols, F.col(cand_col).alias("_cand"), F.col(score_col).alias("_score")
    ).select(
        "*",
        F.row_number().over(wb).alias("_rb"),
        F.row_number().over(ww).alias("_rw"),
    )
    best = F.max(F.when(F.col("_rb") == 1, F.struct("_cand", "_score")))
    worst = F.max(F.when(F.col("_rw") == 1, F.struct("_cand", "_score")))
    out = ranked.groupBy(*group_cols).agg(
        best.alias("_b"), worst.alias("_w"), F.count(F.lit(1)).alias("n_cand")
    )
    margin = F.col("_b._score") - F.col("_w._score")
    return (
        out.filter((F.col("n_cand") >= 2) & (margin >= F.lit(min_margin)))
        .select(
            *group_cols,
            F.col("_b._cand").alias("chosen"),
            F.col("_w._cand").alias("rejected"),
            F.col("_b._score").alias("chosen_score"),
            F.col("_w._score").alias("rejected_score"),
            margin.alias("margin"),
            "n_cand",
        )
    )


def trace_signatures(
    df: DataFrame,
    conv_col: str,
    idx_col: str,
    step_col: str,
) -> DataFrame:
    """Behavioral dedup of agent traces: collapse conversations whose
    step sequence (e.g. ``role:tool`` per turn, in turn order) is
    identical. Two traces that ran the same tool pipeline are the same
    *behavior* even when their payload text differs — the signature view
    is what dedup-for-training and trajectory-mining consume (exact-text
    dedup keeps both; this keeps one exemplar and the multiplicity).

    Output: one row per distinct signature with ``sig``, ``n_convs``,
    ``total_turns`` and the lexicographically-first conversation id as
    the exemplar (``rep_conv``).

    Plan: ONE shuffle to the conversation grain (ordered fold via
    ``array_sort(collect_list(struct))`` — conversations are
    context-bounded, so per-group state stays small at any corpus size),
    then a second aggregate over the conv-sized frame keyed by signature.
    The signature string's length is bounded by the context bound, not
    the corpus.
    """
    per_conv = df.groupBy(conv_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(idx_col).alias("i"),
                            F.col(step_col).alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            ">",
        ).alias("sig"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    return per_conv.groupBy("sig").agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.sum("n_turns").alias("total_turns"),
        F.min(conv_col).alias("rep_conv"),
    )


def discounted_return(
    df: DataFrame,
    conv_col: str,
    idx_col: str,
    reward_cents_col: str,
    horizon: int,
) -> DataFrame:
    """Per-conversation discounted return ``G = Σ γ^t · r_t`` with
    γ = 1/2 — the trajectory-scoring step of an RL-from-traces pipeline
    (rank conversations by front-loaded reward before sampling them into
    a training mix).

    Exact across engines by the power-of-two trick: rewards are exact
    integer cents, turns beyond ``horizon`` are ignored, and each term is
    scaled by ``2^horizon`` so the per-conversation sum
    ``Σ cents · 2^(horizon−t)`` is a BIGINT; the single division
    ``/ (100 · 2^horizon)`` at the end is the only float op, so fold
    order cannot change the bits. ONE exchange (the conv aggregate).

    Output: ``conv_col, n_rewards, ret``.
    """
    t = F.col(idx_col)
    scaled = F.col(reward_cents_col) * F.pow(
        F.lit(2.0), (F.lit(horizon) - t)
    ).cast("bigint")
    return (
        df.filter(t < F.lit(horizon))
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("n_rewards"),
            (F.sum(scaled) / F.lit(float(100 * 2**horizon))).alias("ret"),
        )
    )


def preference_length_bias(
    pairs: DataFrame,
    lengths: DataFrame,
    group_col: str = "lang",
    id_col: str = "item_id",
    len_col: str = "item_len",
) -> DataFrame:
    """Length-bias audit for preference data (the classic RLHF failure:
    the reward proxy secretly prefers LONGER responses, and DPO then
    trains verbosity). Joins each pair's chosen/rejected ids to their
    lengths and reports, per group: how often chosen is the longer one,
    the mean length delta, and — the diagnostic that actually separates
    signal from verbosity — the chosen-longer rate among length-CLOSE
    pairs (|delta| within 10% of the longer side), where a real quality
    signal should sit near 50%.

    Plan: two broadcast-sized equi-joins on the id (pairs are group-
    sized, the length frame projects two columns), then one map-side-
    combined aggregate. Exact integers; the two rates are single
    divisions."""
    ln = lengths.select(
        F.col(id_col).alias("__id"), F.col(len_col).alias("__len")
    )
    j = (
        pairs.join(ln, pairs["chosen"] == F.col("__id"))
        .withColumnRenamed("__len", "chosen_len")
        .drop("__id")
        .join(ln, pairs["rejected"] == F.col("__id"))
        .withColumnRenamed("__len", "rejected_len")
        .drop("__id")
    )
    delta = F.col("chosen_len") - F.col("rejected_len")
    longer = F.greatest("chosen_len", "rejected_len")
    close = (F.abs(delta) * 10) <= longer
    agg = j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((delta > 0).cast("long")).alias("n_chosen_longer"),
        F.sum(delta).alias("sum_len_delta"),
        F.sum(close.cast("long")).alias("n_close"),
        F.sum((close & (delta > 0)).cast("long")).alias("n_close_chosen_longer"),
    )
    return agg.select(
        group_col,
        "n_pairs",
        "n_chosen_longer",
        (
            F.col("n_chosen_longer").cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("chosen_longer_rate"),
        (
            F.col("sum_len_delta").cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("avg_len_delta"),
        "n_close",
        "n_close_chosen_longer",
    )


def turn_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
    tool_col: str = "tool",
) -> DataFrame:
    """Assistant response-latency profile: for every assistant turn
    whose immediate predecessor (by ``idx_col``) is a user turn, the
    response delay in exact integer seconds, rolled up per TRIGGER tool
    (the tool of the user turn it answers) as count / mean / exact
    rank-selected median / max. The conversational twin of a service
    latency dashboard — which interaction contexts make the assistant
    slow.

    Plan: ONE conv-grain window (lag over (conv, idx)) then ONE
    tool-grain aggregate pair; the median is an exact rank selection
    (rank window + conditional max), never a sort-based percentile over
    the corpus. Every double is a single division of exact integers.
    """
    w = W.partitionBy(conv_col).orderBy(idx_col)
    ep = F.unix_timestamp(F.col(ts_col))
    base = df.select(
        F.col(conv_col),
        F.col(idx_col),
        F.col(role_col),
        ep.alias("ep"),
        F.lag(F.col(role_col)).over(w).alias("prev_role"),
        F.lag(ep).over(w).alias("prev_ep"),
        F.lag(F.col(tool_col)).over(w).alias("trigger_tool"),
    )
    resp = base.filter(
        (F.col(role_col) == "assistant") & (F.col("prev_role") == "user")
    ).select(
        "trigger_tool", (F.col("ep") - F.col("prev_ep")).alias("delay_s")
    )
    wr = W.partitionBy("trigger_tool").orderBy(
        F.col("delay_s").asc()
    )
    wk = W.partitionBy("trigger_tool")
    ranked = resp.select(
        "trigger_tool",
        "delay_s",
        F.row_number().over(wr).alias("_rn"),
        F.count(F.lit(1)).over(wk).alias("_n"),
    )
    med_rank = F.floor((F.col("_n") + 1) / 2).cast("long")
    return ranked.groupBy("trigger_tool").agg(
        F.max("_n").alias("n_responses"),
        (
            F.sum("delay_s").cast("double") / F.max("_n").cast("double")
        ).alias("mean_delay_s"),
        F.max(F.when(F.col("_rn") == med_rank, F.col("delay_s"))).alias(
            "p50_delay_s"
        ),
        F.max("delay_s").alias("max_delay_s"),
    )


def markov_entropy_rate(df: DataFrame) -> DataFrame:
    """Entropy rate of the conversation role chain — ONE number for "how
    predictable is the turn flow": H = −Σ_i π(i) Σ_j p(j|i) ln p(j|i),
    with π the empirical source distribution of transitions and p(j|i)
    the row-normalized counts from :func:`role_transitions`'s adjacency
    grid (END sentinel included, so terminal behavior counts). A scripted
    bot pipeline approaches 0; organic mixed-role traffic doesn't.

    All probabilities are single divisions of exact BIGINT counts; the
    double fold runs over (role, next_role)-sorted terms — pinned — and
    ln of an exact-division double is the repo-wide bm25/idf discipline.

    Output ONE row: ``n_transitions, n_states, entropy_rate``.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    nxt = F.coalesce(F.lead("role").over(w), F.lit("END"))
    trans = (
        df.withColumn("next_role", nxt)
        .groupBy("role", "next_role")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row_tot = trans.groupBy("role").agg(F.sum("c").alias("rc"))
    tot = trans.agg(
        F.sum("c").alias("n_transitions"),
        F.countDistinct("role").alias("n_states"),
    )
    terms = trans.join(row_tot, "role").crossJoin(F.broadcast(tot))
    folded = terms.groupBy("n_transitions", "n_states").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "role",
                    "next_role",
                    (
                        (
                            F.col("rc").cast("double")
                            / F.col("n_transitions").cast("double")
                        )
                        * (F.col("c").cast("double") / F.col("rc").cast("double"))
                        * F.log(
                            F.col("c").cast("double")
                            / F.col("rc").cast("double")
                        )
                    ).alias("t"),
                )
            )
        ).alias("xs")
    )
    return folded.select(
        "n_transitions",
        "n_states",
        F.round(
            -F.aggregate("xs", F.lit(0.0), lambda acc, x: acc + x["t"]),
            6,
        ).alias("entropy_rate"),
    )


def topic_shifts(
    df: DataFrame,
    jaccard_num: int = 1,
    jaccard_den: int = 5,
) -> DataFrame:
    """Topic-shift segmentation of conversations: adjacent turns whose
    distinct-token Jaccard falls below ``jaccard_num/jaccard_den``
    (default 0.2) start a new segment — the cheap lexical topic
    boundary a context-packing pipeline reads before splitting long
    conversations (compose with ``context_pack``/``doc_chunks``).

    The boundary test is an INTEGER cross-multiplication
    (den·|∩| < num·|∪|, union via |A|+|B|−|∩| over pre-distinct token
    sets — no float compare); mean adjacent Jaccard folds turn-ordered
    divisions of exact ints. One lag window per conversation + one
    aggregate.

    Output per conversation: ``conv_id, n_turns, n_boundaries,
    n_segments, mean_jaccard``.
    """
    toks = F.array_distinct(
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    staged = df.select(
        "conv_id", "turn_idx", toks.alias("tk")
    ).withColumn("prev", F.lag("tk").over(w))
    inter = F.size(F.array_intersect("prev", "tk"))
    union = F.size("prev") + F.size("tk") - inter
    pairs = staged.select(
        "conv_id",
        "turn_idx",
        F.when(F.col("prev").isNotNull(), inter).alias("i"),
        F.when(F.col("prev").isNotNull(), union).alias("u"),
    )
    boundary = (
        F.col("i").isNotNull()
        & (F.lit(jaccard_den) * F.col("i") < F.lit(jaccard_num) * F.col("u"))
    ).cast("int")
    j = F.when(
        F.col("u") > 0, F.col("i").cast("double") / F.col("u").cast("double")
    ).otherwise(F.lit(0.0))
    agg = pairs.select(
        "conv_id", "turn_idx", boundary.alias("b"), "i", "u", j.alias("j")
    ).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("b").alias("n_boundaries"),
        F.array_sort(
            F.collect_list(
                F.struct("turn_idx", F.col("j").alias("jac"))
            )
        ).alias("xs"),
        F.sum(F.when(F.col("i").isNotNull(), 1).otherwise(0)).alias(
            "n_adj"
        ),
    )
    mean_j = F.when(
        F.col("n_adj") > 0,
        F.aggregate("xs", F.lit(0.0), lambda a, x: a + x["jac"])
        / F.col("n_adj").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "conv_id",
        "n_turns",
        "n_boundaries",
        (F.col("n_boundaries") + 1).alias("n_segments"),
        F.round(mean_j, 6).alias("mean_jaccard"),
    )


def turn_hazard(transcripts: DataFrame) -> DataFrame:
    """Discrete termination hazard of the conversation corpus: for each
    observed length t (turns), the probability a conversation that
    REACHED t turns ends there — the life table a context-budget
    planner reads before sizing windows (compose with
    trim_to_tail_budget, which assumes a tail size; this measures how
    long tails actually run). The uncensored batch twin of
    operators/survival.kaplan_meier: every conversation's end is
    observed, so hazard(t) = ends(t) / at_risk(t) with
    at_risk(t) = Σ_{u ≥ t} ends(u).

    Float discipline: ends/at-risk are exact BIGINTs from one
    conversation-grain aggregate + one descending cumulative window
    over the bounded length rollup; hazard and the survival fold
    S(t) = Π (1 − h(u)) run LEFT over the length-sorted list — both
    single divisions / pinned folds.

    Plan shape: conv-grain max() aggregate (map-side combined), length
    rollup, window over ≤max-length rows. Raw turns are never windowed.

    Output per length: ``t_turns, n_end, n_risk, hazard, survival``
    (round 6; survival = P(length > t)).
    """
    lens = transcripts.groupBy("conv_id").agg(
        (F.max("turn_idx") + F.lit(1)).cast("long").alias("t_turns")
    )
    rollup = lens.groupBy("t_turns").agg(
        F.count(F.lit(1)).cast("long").alias("n_end")
    )
    w = (
        W.orderBy(F.col("t_turns").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_risk = rollup.select(
        "t_turns", "n_end", F.sum("n_end").over(w).alias("n_risk")
    )
    # survival via a pinned fold over the length-sorted (t, h) list,
    # broadcast back to the rollup rows
    folded = with_risk.select(
        F.sort_array(
            F.collect_list(F.struct("t_turns", "n_end", "n_risk"))
        ).alias("xs")
    ).select(
        F.transform(
            "xs",
            lambda t: F.struct(
                t["t_turns"].alias("t_turns"),
                (
                    F.lit(1.0)
                    - t["n_end"].cast("double") / t["n_risk"].cast("double")
                ).alias("keep"),
            ),
        ).alias("ks")
    )
    surv = folded.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ks")),
                lambda i: F.struct(
                    F.element_at("ks", i)["t_turns"].alias("t_turns"),
                    F.aggregate(
                        F.slice("ks", F.lit(1), i),
                        F.lit(1.0),
                        lambda acc, k: acc * k["keep"],
                    ).alias("survival"),
                ),
            )
        ).alias("s")
    ).select(F.col("s.t_turns").alias("t_turns"), F.col("s.survival"))
    return (
        with_risk.join(surv, "t_turns")
        .select(
            "t_turns",
            "n_end",
            "n_risk",
            F.round(
                F.col("n_end").cast("double") / F.col("n_risk").cast("double"),
                6,
            ).alias("hazard"),
            F.round("survival", 6).alias("survival"),
        )
        .orderBy("t_turns")
    )
