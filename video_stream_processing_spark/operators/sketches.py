"""From-scratch, oracle-replayable sketches — Count-Min and HyperLogLog
built on md5 so BOTH engines compute identical registers.

Why this module exists: the engine's built-in sketch queries (b08
approx_count_distinct, b44 approx_percentile) are rows-only checked —
Spark's HLL++/GK internals legitimately differ from DuckDB's. These
operators close that asterisk: the sketch CONSTRUCTION itself is
deterministic DataFrame algebra (md5-derived hashes, fixed widths), so
the differential harness verifies registers AND estimates bit-for-bit.

Scale posture (the reason sketches exist at 100 TB):
- CMS (Cormode-Muthukrishnan 2005): a d x w counter grid with map-side
  combine — the shuffle moves <= d*w partial rows per task regardless
  of corpus size; estimates never under-count (min over d rows).
- HLL (Flajolet et al. 2007): m max-registers per group; registers are
  MERGEABLE by element-wise max — the global estimate derives from the
  per-group sketches without re-scanning, which is the whole point
  (proven here: the ALL row is computed by merging per-language
  registers, not by re-hashing the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_bucket(tok: Column, seed: int, width: int = CMS_WIDTH) -> Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), tok)), 1, 8), 16, 10)
    return (h.cast("long") % width).cast("int")


def cms_grid(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The d x w Count-Min counter grid as (seed, b, cnt) rows — the
    MERGEABLE representation: grids built on disjoint corpus shards sum
    element-wise to the full-corpus grid (counts are additive), which
    is what lets shards/micro-batches sketch independently and merge
    (pinned by tests/test_sketches.py::test_cms_merge_equals_direct).

    posexplode of the bucket ARRAY (seed = position): each md5 computes
    exactly once per (token, seed) — the explode-then-reselect shape
    re-evaluated all d hashes per exploded row (measured ~2x slower)."""
    # explode_outer: the inferred size>0 generator filter would re-run
    # the split below the spread exchange (see dedup._minhash_wide);
    # the existing tok != "" predicate already drops the null row
    toks = docs.select(
        F.explode_outer(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    buckets = F.array(*[_cms_bucket(F.col("tok"), s, width) for s in range(depth)])
    return (
        toks.select(F.posexplode(buckets).alias("seed", "b"))
        .groupBy("seed", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitter_estimates(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a d x w Count-Min sketch of word frequencies, then estimate
    the top-k TRUE heavy hitters through the sketch.

    Output: (tok, true_count, cms_estimate, overcount) — CMS never
    under-counts, so overcount >= 0 always (asserted by the oracle
    replay; the bound is the sketch's defining property). The sketch
    build is ONE explode + groupBy((seed, bucket)) with map-side
    combine: at 100 TB the shuffle carries <= d*w rows per task, and
    the final sketch is d*w counters no matter the corpus size. The
    estimate pass joins the k query keys against the broadcast
    d*w-row sketch."""
    from video_stream_processing_spark.operators.parallelism import (
        ensure_parallelism,
    )

    # project to the text column and spread the one-split test scan
    # BEFORE the two tokenize+hash passes (true counts, sketch grid) —
    # per-row md5 work, a no-op at real scale
    docs = ensure_parallelism(docs.select(text_col), text_col)
    # explode_outer: the inferred size>0 generator filter would re-run
    # the split below the spread exchange (see dedup._minhash_wide);
    # the existing tok != "" predicate already drops the null row
    toks = docs.select(
        F.explode_outer(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    true_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    top = true_counts.orderBy(F.desc("true_count"), "tok").limit(top_k)

    buckets = F.array(*[_cms_bucket(F.col("tok"), s, width) for s in range(depth)])
    cms = cms_grid(docs, text_col=text_col, depth=depth, width=width)
    probes = top.select(
        "tok", "true_count", F.posexplode(buckets).alias("seed", "b")
    )
    est = (
        probes.join(F.broadcast(cms), ["seed", "b"])
        .groupBy("tok", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_count")).alias("overcount"),
    )


def cms_oracle_sql(
    top_k: int = 20, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    bucket = (
        "('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || tok), 1, 8))::BIGINT % "
        f"{width}"
    )
    return f"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents
),
toks_f AS (SELECT tok FROM toks WHERE tok != ''),
true_counts AS (SELECT tok, count(*) AS true_count FROM toks_f GROUP BY tok),
top AS (SELECT * FROM true_counts ORDER BY true_count DESC, tok LIMIT {top_k}),
cms AS (
    SELECT s, {bucket} AS b, count(*) AS cnt
    FROM toks_f, unnest(range({depth})) AS t(s)
    GROUP BY 1, 2
),
probes AS (
    SELECT tok, true_count, s, {bucket} AS b
    FROM top, unnest(range({depth})) AS t(s)
)
SELECT p.tok, CAST(p.true_count AS BIGINT) AS true_count,
       CAST(min(c.cnt) AS BIGINT) AS cms_estimate,
       CAST(min(c.cnt) - p.true_count AS BIGINT) AS overcount
FROM probes p JOIN cms c ON p.s = c.s AND p.b = c.b
GROUP BY p.tok, p.true_count
"""


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (b = 6 index bits)
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_parts(key: Column) -> tuple[Column, Column]:
    """(register index, rank) from a 60-bit md5-derived hash.

    rank = 1 + trailing zeros of the remaining 54 bits, computed as
    log2(w & -w) — exact for powers of two in IEEE doubles — with the
    all-zero escape rank 55. Identical arithmetic runs in DuckDB."""
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    idx = (h % HLL_M).cast("int")
    w = F.shiftright(h, 6)
    low = w.bitwiseAND(-w)
    rank = (
        F.when(w == 0, F.lit(55))
        .otherwise(F.round(F.log2(low.cast("double"))).cast("int") + 1)
    )
    return idx, rank


def hll_distinct_by_group(
    docs: DataFrame, group_col: str = "lang", key_col: str = "doc_id"
) -> DataFrame:
    """Per-group HLL distinct-count sketches PLUS a merged 'ALL' row
    derived by element-wise max of the per-group registers — never by
    re-hashing the corpus. Output per group: exact distinct count, the
    HLL estimate (rounded), and the relative error.

    One shuffle builds every per-group register (groupBy(group, idx)
    max(rank), map-side combinable); the merge is a 64-row-per-group
    aggregate. This is the sketch design the 100 TB layer actually
    wants: per-partition/per-day sketches stored small and merged on
    demand (b08's built-in HLL++ does the same thing rows-only; here
    the whole construction is differential-checked)."""
    idx, rank = _hll_parts(F.col(key_col).cast("string"))
    hashed = docs.select(F.col(group_col).alias("grp"), idx.alias("idx"), rank.alias("rank"))
    regs = hashed.groupBy("grp", "idx").agg(F.max("rank").alias("m"))
    merged = regs.groupBy("idx").agg(F.max("m").alias("m")).select(
        F.lit("ALL").alias("grp"), "idx", "m"
    )
    # re-aggregate the union so a DATA group literally named 'ALL'
    # merges registers with the synthetic global row instead of
    # double-counting register indexes (present_n > m would push the
    # zero count negative and poison the small-range correction)
    all_regs = (
        regs.unionByName(merged).groupBy("grp", "idx").agg(F.max("m").alias("m"))
    )

    # estimate per group: alpha * m^2 / sum(2^-M_j) over ALL m registers
    # (missing register index => M_j = 0 => contributes 1.0)
    agg = all_regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("present_sum"),
        F.count(F.lit(1)).alias("present_n"),
        F.sum(F.when(F.col("m") > 0, 0).otherwise(1)).alias("explicit_zeros"),
    )
    m_lit = F.lit(float(HLL_M))
    zeros = (m_lit - F.col("present_n")) + F.col("explicit_zeros")
    denom = F.col("present_sum") + (m_lit - F.col("present_n")) * 1.0
    raw_e = F.lit(_HLL_ALPHA) * m_lit * m_lit / denom
    est = F.when(
        (raw_e <= 2.5 * m_lit) & (zeros > 0), m_lit * F.log(m_lit / zeros)
    ).otherwise(raw_e)

    exact = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    exact_all = docs.agg(F.countDistinct(key_col).alias("n_exact")).select(
        F.lit("ALL").alias("grp"), "n_exact"
    )
    truth = exact.unionByName(exact_all)
    return (
        agg.join(truth, "grp")
        .select(
            "grp",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(est, 4).alias("hll_estimate"),
            F.round((est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_err"),
        )
    )


def hll_oracle_sql(group_col: str = "lang", key_col: str = "doc_id") -> str:
    m = HLL_M
    alpha = repr(_HLL_ALPHA)
    return f"""
WITH hashed AS (
    SELECT {group_col} AS grp,
           CAST(h % {m} AS INT) AS idx,
           CASE WHEN (h // {m}) = 0 THEN 55
                ELSE CAST(round(log2(CAST((h // {m}) & (-(h // {m})) AS DOUBLE))) AS INT) + 1
           END AS rank
    FROM (SELECT {group_col},
                 ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM documents)
),
regs AS (SELECT grp, idx, max(rank) AS m FROM hashed GROUP BY grp, idx),
merged AS (SELECT 'ALL' AS grp, idx, max(m) AS m FROM regs GROUP BY idx),
all_regs AS (
    SELECT grp, idx, max(m) AS m
    FROM (SELECT * FROM regs UNION ALL SELECT * FROM merged)
    GROUP BY grp, idx
),
agg AS (
    SELECT grp,
           sum(power(2.0, -m)) AS present_sum,
           count(*) AS present_n,
           sum(CASE WHEN m > 0 THEN 0 ELSE 1 END) AS explicit_zeros
    FROM all_regs GROUP BY grp
),
est AS (
    SELECT grp,
           ({m}.0 - present_n) + explicit_zeros AS zeros,
           CAST({alpha} AS DOUBLE) * {m}.0 * {m}.0 / (present_sum + ({m}.0 - present_n) * 1.0) AS raw_e
    FROM agg
),
final AS (
    SELECT grp,
           CASE WHEN raw_e <= 2.5 * {m}.0 AND zeros > 0
                THEN {m}.0 * ln({m}.0 / zeros) ELSE raw_e END AS e
    FROM est
),
truth AS (
    SELECT {group_col} AS grp, count(DISTINCT {key_col}) AS n_exact
    FROM documents GROUP BY {group_col}
    UNION ALL
    SELECT 'ALL', count(DISTINCT {key_col}) FROM documents
)
SELECT f.grp, CAST(t.n_exact AS BIGINT) AS n_exact,
       round(f.e, 4) AS hll_estimate,
       round((f.e - t.n_exact) / t.n_exact, 4) AS rel_err
FROM final f JOIN truth t ON f.grp = t.grp
"""


# ---------------------------------------------------------------------------
# Fixed-grid histogram quantiles (mergeable approximate percentiles)
# ---------------------------------------------------------------------------

HIST_BINS = 128


def histogram_quantiles(
    events: DataFrame,
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = HIST_BINS,
    lo: float = 0.0,
    hi: float = 1000.0,
) -> DataFrame:
    """Approximate percentiles from a FIXED-GRID histogram — the
    mergeable quantile sketch (Prometheus-bucket style) that closes
    b44's rows-only asterisk the way x67 closes b08's: bin counts are
    plain additive aggregates, so per-partition histograms merge by
    summation and the construction is deterministic — both engines
    replay bins, cumulative ranks, and the interpolated estimate to the
    same decimals.

    Error bound: one grid cell (hi-lo)/bins, certified against the
    exact percentile in tests. One map-side-combinable shuffle of
    <= bins rows per task at any scale; values outside [lo, hi) clamp
    to the edge bins (counted, never dropped)."""
    width = (hi - lo) / bins
    bin_col = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - lo) / width).cast("int")),
    )
    hist = (
        events.where(F.col(value_col).isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    rows = None
    for q in quantiles:
        # first bin whose cumulative count reaches q*total; estimate =
        # left edge + linear interpolation within the bin
        hit = (
            cum.where(F.col("cum") >= F.lit(q) * F.col("total"))
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(q).alias("q"),
                F.round(
                    F.lit(lo)
                    + F.col("bin") * width
                    + width
                    * (F.lit(q) * F.col("total") - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt"),
                    4,
                ).alias("estimate"),
            )
        )
        rows = hit if rows is None else rows.unionByName(hit)
    return rows


def histogram_quantiles_oracle_sql(
    value_col: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = HIST_BINS,
    lo: float = 0.0,
    hi: float = 1000.0,
    table: str = "events",
) -> str:
    width = (hi - lo) / bins
    per_q = []
    for q in quantiles:
        per_q.append(f"""
SELECT CAST({q} AS DOUBLE) AS q,
       round({lo} + bin * {width} + {width} * ({q} * total - (cum - cnt)) / cnt, 4)
           AS estimate
FROM cum WHERE cum >= {q} * total ORDER BY bin LIMIT 1""")
    union = "\nUNION ALL\n".join(f"({s.strip()})" for s in per_q)
    return f"""
WITH hist AS (
    SELECT least({bins - 1}, greatest(0,
               CAST(floor(({value_col} - {lo}) / {width}) AS INT))) AS bin,
           count(*) AS cnt
    FROM {table} WHERE {value_col} IS NOT NULL
    GROUP BY 1
),
cum AS (
    SELECT bin, cnt,
           sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
           sum(cnt) OVER () AS total
    FROM hist
)
{union}
"""
