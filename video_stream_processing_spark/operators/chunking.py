"""Content-defined chunking (CDC) dedup — the LBFS/Venti rolling-hash
chunker (Muthitacharoen et al. 2001) that storage and training-data
pipelines use to dedup near-identical blobs at sub-document granularity:
an insertion shifts byte offsets, but chunk boundaries chosen by CONTENT
(rolling hash of a small trailing window) re-synchronize, so unchanged
regions keep their chunk hashes and dedup across the corpus.

Engine design (the 100 TB posture):

- **Chunking is per-row and shuffle-free**: one Arrow-batched
  mapInPandas computes the rolling hash vectorized (numpy shifts — no
  per-char Python loop) and fans each document out to its chunks in
  place; the document body never crosses an exchange, only fixed-width
  (doc_id, chunk_id, len, md5) rows leave the UDF.
- **Dedup is one fixed-width shuffle**: groupBy(chunk_md5) — identical
  to the exact-dedup posture (operators/dedup.py), applied at chunk
  grain.
- **Deterministic and oracle-replayable**: the rolling hash is a plain
  polynomial over the last 4 Unicode code points with boundary rule
  ``h % modulus == 0`` (position = LAST char of its chunk), a pure
  prefix-sum construction — no min/max-size clamps, so the DuckDB
  oracle can rebuild every boundary with lag windows + a running sum
  and every chunk hash with md5(substr(...)) (plans/extensions.py
  x58/x59). Code points (not bytes) keep char-indexed substr identical
  in both engines under multibyte text.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Polynomial weights for the trailing 4-point window and the boundary
# modulus (expected chunk length ~= modulus chars).
W1, W2, W3 = 31, 31 * 31, 31 * 31 * 31
MODULUS = 61

CHUNK_SCHEMA = "doc_id long, chunk_id int, chunk_len int, chunk_md5 string"


def _boundaries(cp: np.ndarray) -> np.ndarray:
    """Boundary mask: True where position i ends a chunk.

    h_i = cp[i] + 31*cp[i-1] + 961*cp[i-2] + 29791*cp[i-3] with
    zero-fill before the start (the oracle's coalesce(lag, 0))."""
    h = cp.copy()
    h[1:] += W1 * cp[:-1]
    h[2:] += W2 * cp[:-2]
    h[3:] += W3 * cp[:-3]
    return h % MODULUS == 0


def cdc_chunks(
    df: DataFrame, text_col: str = "text", ts_col: str | None = None
) -> DataFrame:
    """Fan each document out to its content-defined chunks:
    (doc_id, chunk_id, chunk_len, chunk_md5). md5 is over the chunk's
    UTF-8 bytes (what DuckDB's md5(substr(..)) hashes too). Empty or
    null text yields no chunks. ``ts_col`` (optional) replicates the
    document's event time onto every chunk — the streaming ingest path
    needs it to watermark the chunk-hash dedup state."""

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, chunk_ids, lens, hashes, tss = [], [], [], [], []
            ts_values = pdf[ts_col] if ts_col else pdf["doc_id"]  # dummy zip
            for doc_id, text, ts in zip(pdf["doc_id"], pdf[text_col], ts_values):
                if text is None or len(text) == 0:
                    continue
                cp = np.fromiter((ord(c) for c in text), dtype=np.int64, count=len(text))
                b = _boundaries(cp)
                # chunk_id of position i = count of boundaries at j < i
                starts = np.flatnonzero(np.concatenate(([True], b[:-1])))
                ends = np.append(starts[1:], len(text))  # exclusive
                for k, (s, e) in enumerate(zip(starts, ends)):
                    piece = text[s:e]
                    doc_ids.append(doc_id)
                    chunk_ids.append(k)
                    lens.append(e - s)
                    hashes.append(hashlib.md5(piece.encode("utf-8")).hexdigest())
                    tss.append(ts)
            out = {
                "doc_id": pd.array(doc_ids, dtype="Int64"),
                "chunk_id": pd.array(chunk_ids, dtype="Int32"),
                "chunk_len": pd.array(lens, dtype="Int32"),
                "chunk_md5": pd.array(hashes, dtype="string"),
            }
            if ts_col:
                out[ts_col] = pd.Series(tss, dtype="datetime64[us]")
            yield pd.DataFrame(out)

    schema = CHUNK_SCHEMA + (f", {ts_col} timestamp" if ts_col else "")
    from video_stream_processing_spark.operators.parallelism import (
        ensure_parallelism,
    )

    # spread the one-split test scan before the per-char rolling hash —
    # per-row Python compute; a no-op at real scale
    return ensure_parallelism(df, "doc_id").mapInPandas(chunk, schema=schema)


# Shared oracle CTE: rebuild boundaries with lag windows + prefix sum,
# then chunk extents with a group-by, then hashes with md5(substr()).
def cdc_chunks_oracle_cte(table: str = "documents", text_col: str = "text") -> str:
    return f"""
WITH pos AS (
    SELECT doc_id, {text_col} AS txt, CAST(i AS BIGINT) AS i,
           unicode(substr({text_col}, CAST(i + 1 AS INT), 1)) AS c
    FROM (SELECT doc_id, {text_col}, unnest(range(length({text_col}))) AS i
          FROM {table} WHERE {text_col} IS NOT NULL AND length({text_col}) > 0)
),
h AS (
    SELECT doc_id, txt, i,
           (c + {W1} * coalesce(lag(c, 1) OVER w, 0)
              + {W2} * coalesce(lag(c, 2) OVER w, 0)
              + {W3} * coalesce(lag(c, 3) OVER w, 0)) % {MODULUS} = 0 AS b
    FROM pos
    WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
cid AS (
    SELECT doc_id, txt, i,
           count(*) FILTER (WHERE b) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS chunk_id
    FROM h
),
chunks AS (
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(count(*) AS INT) AS chunk_len,
           md5(substr(any_value(txt), CAST(min(i) + 1 AS INT), CAST(count(*) AS INT)))
               AS chunk_md5
    FROM cid GROUP BY doc_id, chunk_id
)"""


def cdc_chunks_oracle_sql() -> str:
    return cdc_chunks_oracle_cte() + """
SELECT doc_id, chunk_id, chunk_len, chunk_md5 FROM chunks
"""


def cdc_shared_chunks_oracle_sql(min_copies: int = 2) -> str:
    return cdc_chunks_oracle_cte() + f"""
SELECT chunk_md5,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(chunk_len) AS BIGINT) AS chunk_len,
       CAST((count(*) - 1) * max(chunk_len) AS BIGINT) AS dedup_savings_chars
FROM chunks
GROUP BY chunk_md5
HAVING count(*) >= {min_copies}
"""


def cdc_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    coverage_threshold: float = 0.5,
    max_df: int = 16,
) -> DataFrame:
    """Chunk-overlap near-dup detection — the USE of CDC for document
    dedup: docs sharing enough chunk content are near-duplicates even
    when insertions shifted every byte offset (robust where fixed-size
    blocks break; complementary to MinHash, which samples — this
    measures EXACT shared content).

    overlap = total length of DISTINCT chunk hashes present in both
    docs; coverage = overlap / min(doc lengths); pairs with rounded
    coverage >= threshold survive. Inverted-index join on chunk_md5 —
    the x03 posture — with a stop-chunk document-frequency cap
    (df <= ``max_df``): boilerplate chunks shared by half the corpus
    would otherwise make one reduce task quadratic (the same
    adversarial-skew argument as x39's LSH cap), and they carry no
    near-dup signal, exactly like stopwords."""
    from pyspark.sql import functions as F

    # materialize the chunk table once: the df-cap aggregate and both
    # self-join branches otherwise re-run the Arrow rolling-hash pass
    # per reference (3 chunking passes, plan-audited). Fixed-width
    # (doc_id, md5, len) rows — the chunk index production stores.
    chunks = (
        cdc_chunks(df, text_col)
        .select("doc_id", "chunk_md5", "chunk_len")
        .distinct()
        .localCheckpoint(eager=True)
    )
    keep = (
        chunks.groupBy("chunk_md5")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("chunk_md5")
    )
    cdf = chunks.join(keep, "chunk_md5")
    a = cdf.select(
        F.col("doc_id").alias("doc_a"), "chunk_md5", F.col("chunk_len").alias("len_a")
    )
    b = cdf.select(F.col("doc_id").alias("doc_b"), "chunk_md5")
    ov = (
        a.join(b, "chunk_md5")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("len_a").cast("long").alias("overlap_chars"))
    )
    lens = df.where(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(F.col("doc_id"), F.length(text_col).cast("long").alias("n"))
    la = lens.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    lb = lens.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        ov.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "overlap_chars",
            F.round(
                F.col("overlap_chars") / F.least("n_a", "n_b"), 6
            ).alias("coverage"),
        )
        .where(F.col("coverage") >= coverage_threshold)
    )


def cdc_neardup_oracle_sql(
    coverage_threshold: float = 0.5, max_df: int = 16
) -> str:
    return cdc_chunks_oracle_cte() + f""",
cd AS (SELECT DISTINCT doc_id, chunk_md5, chunk_len FROM chunks),
keep AS (SELECT chunk_md5 FROM cd GROUP BY chunk_md5 HAVING count(*) <= {max_df}),
cdf AS (SELECT cd.* FROM cd JOIN keep USING (chunk_md5)),
ov AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(sum(a.chunk_len) AS BIGINT) AS overlap_chars
    FROM cdf a JOIN cdf b ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
lens AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n FROM documents
         WHERE text IS NOT NULL AND length(text) > 0)
SELECT doc_a, doc_b, overlap_chars,
       round(overlap_chars / least(la.n, lb.n), 6) AS coverage
FROM ov JOIN lens la ON ov.doc_a = la.doc_id
        JOIN lens lb ON ov.doc_b = lb.doc_id
WHERE round(overlap_chars / least(la.n, lb.n), 6) >= {coverage_threshold}
"""
