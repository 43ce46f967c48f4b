"""Trained BPE tokenizer — byte-pair-encoding merge learning and
application as pure Catalyst expression folds (Sennrich et al. 2016,
the algorithm behind GPT/Llama tokenizers; no vocabulary files exist in
this container, so the engine TRAINS its own merges from the corpus).

Design for 100 TB (mirrors how production tokenizer training actually
runs):

- **Train on a bounded deterministic sample** (md5-free doc_id modulus —
  reproducible under re-runs and repartitioning). Real BPE trainers
  never see the full corpus; the sample bound makes each training
  iteration a fixed-size scan no matter the corpus size.
- **One distributed pair-count per merge.** Each Lloyd-style iteration
  re-derives the current symbol representation by replaying already-
  learned merges as expression folds (no materialized intermediate),
  counts adjacent symbol pairs via slice+zip+explode (JVM, no Python),
  and takes the global argmax with a deterministic tie-break
  (count DESC, left ASC, right ASC). The argmax row is driver-sized
  metadata — the same literal-inlining posture as the k-means centroids
  (operators/similarity.py:kmeans_centroids).
- **Apply is a per-row fold, zero shuffle.** A learned merge applies to
  a token exactly as BPE specifies — leftmost non-overlapping,
  left-to-right — which IS a left fold over the symbol array: append
  the symbol, or fuse it with the accumulator's tail when the pair
  matches. ``F.aggregate`` keeps the whole thing inside Catalyst; the
  corpus-wide apply is scan -> project with no exchange at all.

Both training and apply are deterministic, so the DuckDB oracles replay
them (string-encoded list_reduce folds; plans/extensions.py x56/x57) —
the merge CHOICES, not just the counts, are differential-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = "[a-z]+"


def _word_tokens(text_col: str = "text") -> Column:
    """Lowercase alphabetic word tokens (the BPE pre-tokenizer: merges
    never cross word boundaries, exactly as in Sennrich et al.)."""
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def _chars(tok: Column) -> Column:
    return F.split(tok, "")


def apply_merge(
    syms: Column, left: str, right: str, merged: str, guard: Column | None = None
) -> Column:
    """Apply ONE merge to a symbol array: left fold, fusing acc-tail +
    current symbol when they equal (left, right) — leftmost
    non-overlapping application, BPE's exact greedy rule.

    ``guard`` (the token's original STRING) short-circuits the fold: a
    pair (left, right) can only ever be adjacent if the concatenated
    characters ``left+right`` occur as a substring of the token —
    symbols are contiguous character runs, so substring presence is a
    NECESSARY condition at every merge stage. Most tokens fail it for
    most merges, so the O(|token|) fold is skipped for them (measured
    ~2x on the corpus-wide apply); a sufficient-side false positive
    just runs the fold and changes nothing."""
    fold = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    if guard is None:
        return fold
    return F.when(F.contains(guard, F.lit(left + right)), fold).otherwise(syms)


def apply_merges(
    syms: Column, merges: list[tuple[str, str, str]], guard: Column | None = None
) -> Column:
    """Apply learned merges in training order (BPE apply semantics)."""
    for left, right, merged in merges:
        syms = apply_merge(syms, left, right, merged, guard=guard)
    return syms


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    sample_mod: int = 5,
    sample_rem: int = 0,
    text_col: str = "text",
) -> list[tuple[str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the deterministic sample.

    Returns [(left, right, merged, pair_count), ...] in rank order.
    Each iteration is one distributed pair-count over the sample with
    the previous merges replayed as folds; only the single argmax row
    crosses to the driver.
    """
    from video_stream_processing_spark.operators.parallelism import (
        ensure_parallelism,
    )

    sample = ensure_parallelism(
        docs.where(F.col("doc_id") % sample_mod == sample_rem), "doc_id"
    )
    toks = sample.select(
        F.explode_outer(_word_tokens(text_col)).alias("tok")
    ).where(F.col("tok").isNotNull())  # see dedup._minhash_wide's explode note
    # INCREMENTAL state: materialize the (tok, syms) table once and fold
    # only the NEW merge into it each round, instead of replaying all i
    # previous merges over fresh characters at iteration i (O(n_merges)
    # folds per round -> O(1); composition order is identical, so the
    # learned merges — and the x56 oracle replay — are unchanged). The
    # sample is bounded by sample_mod, so the checkpointed state is
    # sample-token-sized at any corpus scale.
    from video_stream_processing_spark.session import (
        release_ids,
        snapshot_persistent_ids,
    )

    spark = docs.sparkSession

    def _persistent_ids() -> set[int]:
        return snapshot_persistent_ids(spark)

    def _unpersist(ids: set[int]) -> None:
        # release the PREVIOUS round's checkpoint blocks promptly: the
        # async ContextCleaner lags, so without this n_merges sample-sized
        # block sets would pile up (at most 2 copies live at any time now)
        release_ids(spark, ids)

    pre_existing = _persistent_ids()
    state = toks.select(
        "tok", _chars(F.col("tok")).alias("syms")
    ).localCheckpoint(eager=True)
    state_ids = _persistent_ids() - pre_existing
    merges: list[tuple[str, str, str, int]] = []
    for it in range(n_merges):
        rep = state
        pairs = rep.select(
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("left_sym"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("right_sym"),
                )
            ).alias("p")
        ).select(F.col("p.left_sym").alias("left_sym"), F.col("p.right_sym").alias("right_sym"))
        top = (
            pairs.groupBy("left_sym", "right_sym")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top:
            break  # sample exhausted of pairs (degenerate corpus)
        row = top[0]
        merges.append(
            (row["left_sym"], row["right_sym"], row["left_sym"] + row["right_sym"], row["cnt"])
        )
        if it < n_merges - 1:  # the final round's state is never counted
            before = _persistent_ids()
            state = state.select(
                "tok",
                apply_merge(
                    F.col("syms"),
                    row["left_sym"],
                    row["right_sym"],
                    row["left_sym"] + row["right_sym"],
                    guard=F.col("tok"),
                ).alias("syms"),
            ).localCheckpoint(eager=True)
            _unpersist(state_ids)
            state_ids = _persistent_ids() - before
    _unpersist(state_ids)
    return merges


def bpe_merge_table(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 3,
    sample_mod: int = 5,
    sample_rem: int = 0,
) -> DataFrame:
    """The learned merge table: (rank, left_sym, right_sym, merged,
    pair_count) — the tokenizer artifact itself, rank = training order."""
    merges = train_bpe_merges(docs, n_merges, sample_mod, sample_rem)
    rows = [
        (k + 1, left, right, merged, int(cnt))
        for k, (left, right, merged, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left_sym string, right_sym string, merged string, pair_count long"
    )


def bpe_piece_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the FULL corpus with the learned merges: per doc, word
    count and post-merge piece count. No explode, no shuffle — the fold
    runs inside transform+aggregate per row, so the plan is a bare
    scan -> project (the 100 TB tokenization pass)."""
    tl = _word_tokens(text_col)
    pieces_per_tok = F.transform(
        tl, lambda tok: F.size(apply_merges(_chars(tok), merges, guard=tok))
    )
    # stays a bare scan -> project (zero exchange, pinned in
    # tests/test_bpe.py); callers that need the one-split test scan
    # spread pass a pre-spread frame (plans/extensions.py x57/x115)
    return docs.select(
        "doc_id",
        F.size(tl).alias("n_tokens"),
        F.aggregate(
            pieces_per_tok, F.lit(0).cast("long"), lambda acc, v: acc + v.cast("long")
        ).alias("n_pieces"),
    )


def bpe_decode(pieces: Column) -> Column:
    """Decode a piece array back to the original token string. BPE
    merges only ever CONCATENATE adjacent symbols, so decode is exact
    concatenation — encode∘decode = identity on every token, by
    construction of the algorithm; THIS function plus the round-trip
    report below is what proves the fold implementation preserves that
    (a fold bug that drops/duplicates a symbol breaks the identity)."""
    return F.concat_ws("", pieces)


def bpe_roundtrip_report(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Per-doc encode∘decode audit over the FULL corpus: token count,
    post-merge piece count, and the number of tokens whose decoded
    pieces do NOT reproduce the token (must be 0 everywhere — the
    column exists so the ORACLE independently recomputes it rather than
    the test asserting a constant). Same zero-shuffle scan -> project
    shape as bpe_piece_counts: both folds run per row inside
    transform/aggregate."""
    tl = _word_tokens(text_col)

    def pieces_of(tok: Column) -> Column:
        return apply_merges(_chars(tok), merges, guard=tok)

    return docs.select(
        "doc_id",
        F.size(tl).alias("n_tokens"),
        F.aggregate(
            F.transform(tl, lambda tok: F.size(pieces_of(tok))),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v.cast("long"),
        ).alias("n_pieces"),
        F.size(
            F.filter(tl, lambda tok: bpe_decode(pieces_of(tok)) != tok)
        ).cast("long").alias("n_mismatch"),
    )


# --------------------------------------------------------------------------
# DuckDB oracle builders — replay training and apply with string-encoded
# list_reduce folds ('|'-joined symbols; safe, alphabet is [a-z]+).
# --------------------------------------------------------------------------


def _fold_sql(list_expr: str, m: str) -> str:
    """One merge applied to a symbol LIST expr, yielding the
    '|'-encoded string; ``m`` is the single-row merge CTE alias."""
    return f"""list_reduce({list_expr}, (acc, x) ->
        CASE WHEN x = {m}.right_sym AND regexp_extract(acc, '[^|]*$') = {m}.left_sym
             THEN substr(acc, 1, length(acc) - length({m}.left_sym)) || {m}.merged
             ELSE acc || '|' || x END)"""


def _training_ctes(n_merges: int, sample_mod: int, sample_rem: int) -> str:
    """CTE chain: toks -> rep0 -> (p_k, m_k, rep_k)*; m_k holds merge k."""
    parts = [
        f"""toks AS (
    SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
    FROM documents WHERE doc_id % {sample_mod} = {sample_rem}
),
rep0 AS (SELECT array_to_string(string_split(tok, ''), '|') AS rep FROM toks)"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"rep{k - 1}"
        joins = " ".join(f"CROSS JOIN m{j}" for j in range(1, k))
        parts.append(
            f"""p{k} AS (
    SELECT l[i + 1] AS left_sym, l[i + 2] AS right_sym
    FROM (SELECT string_split(rep, '|') AS l FROM {prev}),
         unnest(range(len(l) - 1)) AS t(i)
),
m{k} AS (
    SELECT left_sym, right_sym, left_sym || right_sym AS merged, count(*) AS cnt
    FROM p{k} GROUP BY left_sym, right_sym
    ORDER BY cnt DESC, left_sym, right_sym LIMIT 1
),
rep{k} AS (
    SELECT {_fold_sql("string_split(rep, '|')", f"m{k}")} AS rep
    FROM {prev} CROSS JOIN m{k}
)"""
        )
        _ = joins
    return "WITH " + ",\n".join(parts)


def bpe_merges_oracle_sql(
    n_merges: int = 3, sample_mod: int = 5, sample_rem: int = 0
) -> str:
    selects = [
        f"""SELECT CAST({k} AS INT) AS rank, left_sym, right_sym, merged,
       CAST(cnt AS BIGINT) AS pair_count FROM m{k}"""
        for k in range(1, n_merges + 1)
    ]
    return _training_ctes(n_merges, sample_mod, sample_rem) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_counts_oracle_sql(
    n_merges: int = 3, sample_mod: int = 5, sample_rem: int = 0
) -> str:
    # Nested fold: merge k is applied to the split of merge k-1's output.
    folded = "string_split(tok, '')"
    for k in range(1, n_merges + 1):
        folded = f"string_split({_fold_sql(folded, f'm{k}')}, '|')"
    joins = " ".join(f"CROSS JOIN m{k}" for k in range(1, n_merges + 1))
    return (
        _training_ctes(n_merges, sample_mod, sample_rem)
        + f""",
docs_t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS tl FROM documents
)
SELECT doc_id,
       CAST(len(tl) AS INT) AS n_tokens,
       CAST(coalesce(list_sum(list_transform(tl, tok -> len({folded}))), 0) AS BIGINT)
           AS n_pieces
FROM docs_t {joins}
"""
    )


def bpe_roundtrip_oracle_sql(
    n_merges: int = 3, sample_mod: int = 5, sample_rem: int = 0
) -> str:
    """Oracle for bpe_roundtrip_report: training replayed, then per token
    the folded pieces are BOTH counted and decoded (array_to_string '')
    and compared against the token — the identity check recomputed from
    scratch in the second engine."""
    folded = "string_split(tok, '')"
    for k in range(1, n_merges + 1):
        folded = f"string_split({_fold_sql(folded, f'm{k}')}, '|')"
    joins = " ".join(f"CROSS JOIN m{k}" for k in range(1, n_merges + 1))
    return (
        _training_ctes(n_merges, sample_mod, sample_rem)
        + f""",
docs_t AS (
    SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS tl FROM documents
)
SELECT doc_id,
       CAST(len(tl) AS INT) AS n_tokens,
       CAST(coalesce(list_sum(list_transform(tl, tok -> len({folded}))), 0) AS BIGINT)
           AS n_pieces,
       CAST(coalesce(len(list_filter(tl, tok -> array_to_string({folded}, '') <> tok)), 0) AS BIGINT)
           AS n_mismatch
FROM docs_t {joins}
"""
    )
