"""Graph / sequence / sampling extensions (round 5 continuation).

The co-purchase graph family (x80) generalizes to the classic
graph-mining primitives a training-data platform runs on relational
exhaust: fixed-point PageRank (influence/centrality over the item
graph), degree-oriented triangle counting (community density), plus
three pipeline utilities — vocabulary-level fuzzy dictionary matching
(typo-tolerant entity/brand lookup), weighted sampling without
replacement (Efraimidis–Spirakis A-ES, the corpus-subsampling
primitive), and an interval-concurrency sweep line (peak concurrent
sessions — the capacity-planning query).

Determinism rules (driver contract): PageRank runs in scaled integer
arithmetic (micro-units, floor division) so both engines agree
bit-for-bit with no float-summation-order hazard; A-ES keys round to 10
decimals before the rank (ln() ulp differences are ~1e-20 absolute here,
ten orders below the grid); everything else is integer/exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from video_stream_processing_spark.operators import graph as G
from video_stream_processing_spark.plans.registry import register
from video_stream_processing_spark.tables import load_table

# --------------------------------------------------------------------------
# Shared co-purchase graph (x80's basket pairs, support >= 3)
# --------------------------------------------------------------------------

_GRAPH_SQL = """
baskets AS (
    SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
pairs AS (
    SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_cust
    FROM baskets a JOIN baskets b ON a.cust = b.cust AND a.part < b.part
    GROUP BY a.part, b.part
    HAVING count(*) >= 3
),
edges AS (
    SELECT part_a AS src, part_b AS dst FROM pairs
    UNION ALL
    SELECT part_b AS src, part_a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src)
"""


def _copurchase_edges(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(pairs, symmetric edges, degree, cached baskets) of the
    support>=3 co-purchase graph. The returned ``baskets`` handle is the
    persist()ed base the pair frames still reference lazily — the caller
    must unpersist it once pairs are materialized (r15 ADVICE: repeated
    invocations in one session otherwise accumulate cached baskets until
    the session-level release helpers run). The pair self-join is per-customer (bounded basket — never
    item x item global); the symmetric union is a projection. A
    collect_set + array-combination-explode variant (two shuffles
    fewer) measured 5x SLOWER at sf0.1 — the per-row struct-array
    allocation in the higher-order functions costs more than the
    shuffles it saves — so the codegen'd hash self-join stays.

    r15 plan fixes (profiled at sf0.1, guide §2.4/§2.3):
    - baskets materialize via persist, NOT localCheckpoint: a
      checkpointed RDD comes back with UnknownPartitioning, so the
      self-join re-exchanged AND re-sorted both branches; the cached
      plan keeps hashpartitioning(cust) and the join runs exchange-free
      on the cached blocks.
    - the pair aggregation keys on ONE packed BIGINT
      (part_a << 32 | part_b) instead of two: the pre-HAVING pair
      domain is ~n_pairs-sized (12.7M distinct at sf0.1 — map-side
      combine cannot collapse it), so hashing/serializing one long
      instead of two is a per-row win on the dominant shuffle. Packing
      is applied ONLY when the id bound proves it exact (see below);
      wider ids keep the two-column key. Combined effect: 3.9 -> 2.3 s
      median for the pair base."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    baskets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        # repartition by cust BEFORE distinct: HashPartitioning(cust)
        # satisfies the (cust, part) clustering the aggregate needs AND
        # the self-join's cust clustering, so the wide join output is
        # exchanged once on the narrow key instead of once per grain
        .repartition("cust")
        .distinct()
        # materialize BEFORE the self-join: the two join branches differ
        # only in their alias projection, but Spark does not reuse the
        # exchange across them (audited: 4 parquet scans — the whole
        # lineitem-join-orders-distinct pipeline ran twice).
        .persist()
    )
    # ONE materializing action doubles as the packing guard: ids in
    # [0, 2^31) make (part_a << 32) + part_b exact (part_a < 2^31 keeps
    # the shift in-range, part_b < 2^32 cannot bleed into the high
    # half). BOTH bounds are probed (r15 ADVICE: a negative id would
    # sign-extend and corrupt the pack; only max was checked before).
    # TPC-H partkeys exceed 2^31 only past SF ~10k; a graph with wider
    # ids falls back to the two-column key — same results either way
    # (differentially checked), only the shuffle-key width changes.
    bounds = baskets.agg(F.min("part"), F.max("part")).collect()[0]
    min_part, max_part = bounds[0], bounds[1]
    pack_ok = max_part is not None and 0 <= min_part and max_part < (1 << 31)
    a = baskets.select("cust", F.col("part").alias("part_a"))
    b = baskets.select("cust", F.col("part").alias("part_b"))
    joined = a.join(b, "cust").where(F.col("part_a") < F.col("part_b"))
    if pack_ok:
        # cast BOTH sides to long before the shift (r15 ADVICE): on an
        # IntegerType part column, shiftleft returns int and Java masks
        # the shift count to 5 bits (x << 32 == x), so the pack would
        # silently degenerate to part_a + part_b while the value guard
        # still passed. The cast makes the pack exact for any integral
        # column type in the guarded domain.
        packed = (
            joined.select(
                (
                    F.shiftleft(F.col("part_a").cast("long"), 32)
                    + F.col("part_b").cast("long")
                ).alias("pk")
            )
            .groupBy("pk")
            .agg(F.count(F.lit(1)).alias("n_cust"))
            .where(F.col("n_cust") >= 3)
        )
        pairs = packed.select(
            F.shiftrightunsigned("pk", 32).alias("part_a"),
            F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("part_b"),
            "n_cust",
        )
    else:
        pairs = (
            joined.groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("n_cust"))
            .where(F.col("n_cust") >= 3)
        )
    edges = pairs.select(F.col("part_a").alias("src"), F.col("part_b").alias("dst")).unionAll(
        pairs.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    return pairs, edges, deg, baskets


def _materialized_graph(spark: SparkSession, sf_dir: str):
    """(pairs, edges, deg) with the pair base eagerly checkpointed —
    the shared setup for every query that probes the graph through
    more than one reference (edge union, degree table, final counts):
    without the checkpoint each reference re-runs the whole basket
    pipeline (caught repeatedly in plan audits)."""
    pairs, _, _, baskets = _copurchase_edges(spark, sf_dir)
    pairs = pairs.localCheckpoint(eager=True)
    # the checkpoint above is the last consumer of the cached baskets:
    # release them here instead of leaking the entry until the session
    # release helpers run (r15 ADVICE)
    baskets.unpersist()
    edges = pairs.select(F.col("part_a").alias("src"), F.col("part_b").alias("dst")).unionAll(
        pairs.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    return pairs, edges, deg


# --------------------------------------------------------------------------
# x82 — fixed-point PageRank
# --------------------------------------------------------------------------

_X82_ITERS = 3


def _x82_oracle() -> str:
    # Unroll the iterations as a CTE chain; all arithmetic is BIGINT
    # (// is integer floor division in DuckDB, div in Spark).
    chain = [
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM deg)",
    ]
    for i in range(1, _X82_ITERS + 1):
        chain.append(
            f"""r{i} AS (
    SELECT e.dst AS node,
           CAST(150000 + sum((r.rank * 85) // (100 * d.deg)) AS BIGINT) AS rank
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN deg d ON e.src = d.node
    GROUP BY e.dst
)"""
        )
    return (
        "WITH "
        + _GRAPH_SQL.strip().rstrip()
        + ",\n"
        + ",\n".join(chain)
        + f"\nSELECT node AS part, rank AS pr_mass FROM r{_X82_ITERS}"
    )


@register(
    "x82_pagerank_fixedpoint",
    oracle=_x82_oracle(),
    tags=("extension", "graph", "pagerank"),
)
def x82_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph in fixed-point integer
    arithmetic: each node starts with 1e6 micro-units of mass; every
    iteration a node keeps 0.15e6 restart mass and receives
    floor(rank_u * 85 / (100 * deg_u)) from each in-neighbor — the
    standard damped power iteration (d=0.85) scaled to micro-units with
    floor truncation, which makes the result an order-independent
    integer SUM (no float-summation-order divergence between engines).

    Scale posture: the per-iteration shape is edges JOIN ranks ON src ->
    groupBy dst — the canonical distributed PageRank step; ranks
    co-partition with the once-checkpointed edge base on src, and the
    plan tree stays linear in the iteration count (see
    operators/graph.py and SCALE.md "Graph mining" for the measured
    checkpoint economics)."""
    # _materialized_graph, not _copurchase_edges: the edge union
    # references pairs twice, so an un-checkpointed pairs base runs
    # the pair self-join twice (the x96 ADVICE fix, applied here too)
    _, edges, _ = _materialized_graph(spark, sf_dir)
    return G.pagerank_fixedpoint(edges, iters=_X82_ITERS).select(
        F.col("node").alias("part"), "pr_mass"
    )


# --------------------------------------------------------------------------
# x83 — fuzzy dictionary matching (vocabulary-level edit distance)
# --------------------------------------------------------------------------

_X83_DICT = ("spark", "tabel", "query", "window", "scann", "jon")


@register(
    "x83_fuzzy_dict_match",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents
),
vocab AS (
    SELECT token, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
    FROM toks GROUP BY token
),
dict(term) AS (VALUES {", ".join(f"('{t}')" for t in _X83_DICT)})
SELECT d.term, v.token,
       CAST(levenshtein(d.term, v.token) AS INT) AS dist,
       CAST(v.n_docs AS BIGINT) AS n_docs,
       CAST(v.n_occ AS BIGINT) AS n_occ
FROM dict d
JOIN vocab v
  ON abs(length(d.term) - length(v.token)) <= 1
 AND levenshtein(d.term, v.token) <= 1
""",
    tags=("extension", "text", "fuzzy"),
)
def x83_fuzzy_dict_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant dictionary matching (spell-tolerant entity/brand
    lookup over a corpus): match every corpus token against a small term
    dictionary at Levenshtein distance <= 1.

    Scale posture: the fuzzy work runs on the DISTINCT VOCABULARY, not
    the corpus — tokens aggregate to (token, n_occ, n_docs) first (one
    shuffle, map-side combine), then the vocabulary joins the broadcast
    dictionary with a length-band prefilter + edit-distance predicate
    (a broadcast nested-loop over vocab x dict, which is vocab-sized —
    at 100 TB the vocabulary is millions of rows while the corpus is
    trillions of tokens; the expensive predicate never touches the
    corpus). Occurrence/document counts ride along from the aggregate,
    so no second corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    dictionary = spark.createDataFrame([(t,) for t in _X83_DICT], ["term"])
    dist = F.levenshtein(F.col("term"), F.col("token"))
    return (
        vocab.join(
            F.broadcast(dictionary),
            (F.abs(F.length("term") - F.length("token")) <= 1) & (dist <= 1),
        )
        .select("term", "token", dist.cast("int").alias("dist"), "n_docs", "n_occ")
    )


# --------------------------------------------------------------------------
# x84 — weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------

_X84_K = 50


@register(
    "x84_weighted_sample",
    oracle=f"""
WITH keyed AS (
    SELECT doc_id, n_chars,
           round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                    / 4294967296.0) / n_chars, 10) AS samp_key
    FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, samp_key
FROM keyed
ORDER BY samp_key DESC, doc_id
LIMIT {_X84_K}
""",
    tags=("extension", "sampling"),
)
def x84_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws a deterministic md5-uniform u in (0,1] and gets key
    u^(1/w) with weight w = n_chars; the top-k keys ARE a weighted
    sample without replacement. Computed in log space (ln(u)/w, larger
    is better) and rounded to 10 decimals before the rank so both
    engines agree (libm ln() ulp differences are ~1e-20 absolute at
    this magnitude — ten orders below the rounding grid).

    Scale posture: key assignment is a map-side projection over the
    scan; the top-k is orderBy+limit => TakeOrderedAndProject (per-
    partition heaps + driver merge of k rows), never a global sort.
    This is THE corpus-subsampling primitive (quality-weighted corpus
    draws) and it reads each row exactly once."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id", "n_chars", F.round(F.log(u) / F.col("n_chars"), 10).alias("samp_key")
    )
    return keyed.orderBy(F.desc("samp_key"), F.asc("doc_id")).limit(_X84_K)


# --------------------------------------------------------------------------
# x85 — peak concurrent sessions (distributed sweep line)
# --------------------------------------------------------------------------

@register(
    "x85_session_concurrency",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
    FROM flagged
),
bounds AS (
    SELECT user_id, session_id,
           epoch_ms(min(ts)) AS st, epoch_ms(max(ts)) + 1 AS en
    FROM sessions GROUP BY user_id, session_id
),
deltas AS (
    SELECT st AS ms, 1 AS d FROM bounds
    UNION ALL
    SELECT en AS ms, -1 AS d FROM bounds
),
net AS (SELECT ms, sum(d) AS net FROM deltas GROUP BY ms),
run AS (SELECT ms, sum(net) OVER (ORDER BY ms) AS conc FROM net)
SELECT ms // 3600000 AS hour_bucket, CAST(max(conc) AS BIGINT) AS max_conc
FROM run GROUP BY ms // 3600000
""",
    tags=("extension", "timeseries", "sweepline"),
)
def x85_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour — the capacity-planning sweep
    line: b22's gap sessions become [start, end] intervals, each
    interval contributes +1 at start and -1 just after end, and the
    running sum of deltas ordered by time is the instantaneous
    concurrency; max per hour bucket is the answer.

    Scale posture: a naive sweep line is a GLOBAL ordered running sum —
    a single-partition window at 100 TB. This plan distributes it as a
    two-level prefix sum: deltas aggregate per millisecond (one
    shuffle), the running sum runs WITHIN each hour partition, and the
    cross-hour carry is a running sum over the HOUR-TOTALS table —
    which is calendar-bounded (8.8k rows/year), so its single-partition
    window is a constant-size driver-adjacent step, not a data-scale
    one. Identical integer math to the oracle's global window."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_millis(F.col("ts")) - F.unix_millis(prev_ts) > 1_800_000),
        1,
    ).otherwise(0)
    sessions = e.select("user_id", "ts", "event_id", is_new.alias("is_new")).withColumn(
        "session_id", F.sum("is_new").over(wcum)
    )
    bounds = sessions.groupBy("user_id", "session_id").agg(
        F.unix_millis(F.min("ts")).alias("st"),
        (F.unix_millis(F.max("ts")) + 1).alias("en"),
    )
    deltas = bounds.select(F.col("st").alias("ms"), F.lit(1).alias("d")).unionAll(
        bounds.select(F.col("en").alias("ms"), F.lit(-1).alias("d"))
    )
    # Materialize the per-ms delta aggregate once: the within-hour
    # window, the hour-totals aggregate and their join all probe it.
    net = deltas.groupBy("ms").agg(F.sum("d").alias("net")).localCheckpoint(eager=True)
    hour = F.expr("ms div 3600000")
    within = net.withColumn("hour_bucket", hour).withColumn(
        "run",
        F.sum("net").over(
            Window.partitionBy("hour_bucket")
            .orderBy("ms")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    hour_totals = net.groupBy(hour.alias("hour_bucket")).agg(F.sum("net").alias("htot"))
    carry = hour_totals.withColumn(
        "carry",
        F.coalesce(
            F.sum("htot").over(
                Window.orderBy("hour_bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("hour_bucket", "carry")
    return (
        within.join(carry, "hour_bucket")
        .groupBy("hour_bucket")
        .agg(F.max(F.col("run") + F.col("carry")).cast("long").alias("max_conc"))
    )


# --------------------------------------------------------------------------
# x86 — triangle counting (degree-oriented)
# --------------------------------------------------------------------------

@register(
    "x86_triangle_count",
    oracle="WITH "
    + _GRAPH_SQL.strip()
    + """,
o AS (
    SELECT e.src AS s, e.dst AS d, d2.deg AS dd
    FROM edges e
    JOIN deg d1 ON e.src = d1.node
    JOIN deg d2 ON e.dst = d2.node
    WHERE (d1.deg, e.src) < (d2.deg, e.dst)
),
wedges AS (
    SELECT a.s, a.d AS b, c.d AS c
    FROM o a JOIN o c ON a.s = c.s
    WHERE (a.dd, a.d) < (c.dd, c.d)
),
tri AS (
    SELECT count(*) AS n
    FROM wedges w JOIN o e ON e.s = w.b AND e.d = w.c
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
       (SELECT CAST(n AS BIGINT) FROM tri) AS n_triangles
""",
    tags=("extension", "graph", "triangles"),
)
def x86_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting on the co-purchase graph — the
    community-density statistic. Every undirected edge is oriented from
    its lexicographically-smaller (degree, node) endpoint to the larger,
    turning the graph into a DAG whose max out-degree is O(sqrt(m));
    wedges enumerate ordered out-neighbor pairs and close iff the
    closing oriented edge exists.

    Scale posture: the orientation bounds per-node wedge fan-out at
    O(sqrt(m)) regardless of raw degree skew (the classic answer to the
    celebrity-node problem — a hub's edges point INTO it, so it spawns
    no wedges). Wedge generation is a self-equi-join on src; closure is
    an equi-join on (b, c). Both shuffle on small fixed-width keys;
    total work is the optimal O(m^1.5) bound, never degree-squared."""
    pairs, edges, _ = _materialized_graph(spark, sf_dir)
    tri = G.oriented_triangle_count(edges)
    n_edges = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_edges.crossJoin(tri)


# --------------------------------------------------------------------------
# x89 — bounded-round k-core peeling
# --------------------------------------------------------------------------

_X89_K = 40
_X89_ROUNDS = 5


def _x89_oracle() -> str:
    # Every CTE is MATERIALIZED: each peel round references the previous
    # accepted-set TWICE (src and dst sides), so DuckDB's default
    # inlining makes the expansion tree DOUBLE per round — 2^5 copies of
    # the basket self-join at 5 rounds, which filled 80 GB of spill at
    # sf0.1 before ENOSPC (caught by the r13 full sf0.1 sweep).
    # Materialization makes the replay linear (~8 s at sf0.1); results
    # are identical — it is an evaluation hint, not semantics.
    chain = ["a0 AS MATERIALIZED (SELECT node FROM deg)"]
    for i in range(1, _X89_ROUNDS + 1):
        chain.append(
            f"""e{i} AS MATERIALIZED (
    SELECT e.src, e.dst FROM edges e
    JOIN a{i - 1} x ON e.src = x.node
    JOIN a{i - 1} y ON e.dst = y.node
),
a{i} AS MATERIALIZED (SELECT src AS node FROM e{i} GROUP BY src HAVING count(*) >= {_X89_K})"""
        )
    return (
        "WITH "
        + _GRAPH_SQL.strip().replace(" AS (", " AS MATERIALIZED (")
        + ",\n"
        + ",\n".join(chain)
        + f""",
ef AS (
    SELECT e.src, e.dst FROM edges e
    JOIN a{_X89_ROUNDS} x ON e.src = x.node
    JOIN a{_X89_ROUNDS} y ON e.dst = y.node
)
SELECT src AS part, CAST(count(*) AS BIGINT) AS core_deg
FROM ef GROUP BY src"""
    )


@register(
    "x89_kcore_peel",
    oracle=_x89_oracle(),
    tags=("extension", "graph", "kcore"),
)
def x89_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peeling (k=40) over the co-purchase graph —
    the dense-community extractor: each round drops every node whose
    degree WITHIN the surviving subgraph is below k, then recounts.
    Five rounds are unrolled (deterministic in both engines; the exact
    core is the fixpoint, which bounded peeling approaches
    monotonically from above — x15's probe-bounded loop is the shipped
    pattern for running any such peel to fixpoint).

    Scale posture (r10): round 1 is a plain degree prune over the raw
    edges (no semi-joins at all — a node with raw degree < k can never
    be a core member), and each subsequent round SHRINKS the
    checkpointed edge table to the surviving subgraph before
    recounting, so later rounds join ever-smaller edge sets instead of
    the full graph (8.0 -> ~5.4 s warm at sf0.1). Alive sets per round
    are identical to the unshrunk formulation — dead edges only touch
    dead nodes — so the result hash is unchanged; the fixpoint
    early-exit stops the loop once a round removes nothing."""
    # _materialized_graph, not _copurchase_edges: the edge union
    # references pairs twice, so an un-checkpointed pairs base runs
    # the pair self-join twice (the x96 ADVICE fix, applied here too)
    _, edges, _ = _materialized_graph(spark, sf_dir)
    return G.kcore_peel(edges, k=_X89_K, rounds=_X89_ROUNDS).select(
        F.col("node").alias("part"), "core_deg"
    )


# --------------------------------------------------------------------------
# b63 — recursive-CTE BFS (one SQL text, both engines)
# --------------------------------------------------------------------------

# Sparse high-support graph (>= 5 co-purchasers) so the bounded path
# expansion stays small even on the dense low-SF fixture.
#
# TWO verbatim SQL texts shared by both engines (the r10 fix for the
# r9-diagnosed UnionLoop 5x base re-execution): the expensive
# non-recursive base is materialized ONCE under the name ``b63_base``
# — Spark runs _B63_BASE_SQL through an eager localCheckpoint, DuckDB
# through an ``AS MATERIALIZED`` CTE (the one engine-specific wrapper;
# the query text inside is byte-identical) — and the recursion then
# runs verbatim over the materialized base, so each UnionLoop
# iteration re-reads cached partitions instead of re-running the
# 3.4 s sbaskets/spairs joins. r11 contract fix: the oracle is a
# SINGLE statement (WITH RECURSIVE b63_base AS MATERIALIZED (...),
# reach AS (...)), not a CREATE TEMP TABLE script — wrapping consumers
# (tests/test_entry_contract.py, the driver's harness) put every
# oracle inside SELECT * FROM (<sql>), which a multi-statement script
# breaks.
_B63_PAIRS_SQL = """
WITH sbaskets AS (
    SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
spairs AS (
    SELECT a.part AS part_a, b.part AS part_b
    FROM sbaskets a JOIN sbaskets b ON a.cust = b.cust AND a.part < b.part
    GROUP BY a.part, b.part
    HAVING count(*) >= 5
)
SELECT part_a, part_b FROM spairs
"""

# The symmetric closure over a named pair table. Spark materializes the
# pair half FIRST (r15: without that split, the union's two branches
# each re-read and re-aggregated the full pair exchange — 235 MB of
# shuffle read for a table whose surviving pairs are KBs) and runs this
# text over the checkpointed view; the DuckDB oracle splices the SAME
# two texts back into one base expression, so the engines still share
# the SQL verbatim at each stage.
#
# r16: the symmetric union itself stays LAZY over the checkpointed pair
# view — r15 ran a SECOND eager localCheckpoint on the union, and that
# extra materializing job measured as a regression in both the
# builder's ledger (6.23 -> 7.02 s) and the driver's run (6.45 ->
# 7.77 s, VERDICT r15 item 1): the surviving pairs are KBs, so
# re-projecting the union from cached pair partitions on each UnionLoop
# iteration costs microseconds while the extra eager job cost ~0.8 s.
# One checkpoint (the pair half), zero re-reads of the 235 MB pair
# exchange, no second materialization.
_B63_SYM_SQL_TMPL = """
SELECT part_a AS src, part_b AS dst FROM {pairs}
UNION ALL
SELECT part_b AS src, part_a AS dst FROM {pairs}
"""

_B63_BASE_SQL = _B63_SYM_SQL_TMPL.format(
    pairs=f"({_B63_PAIRS_SQL.strip()}) spairs_m"
)

# The recursion text proper — shared verbatim: Spark prepends
# "WITH RECURSIVE " and reads b63_base as a checkpointed temp view;
# the DuckDB oracle prepends "WITH RECURSIVE b63_base AS MATERIALIZED
# (<_B63_BASE_SQL>)," so the whole oracle is ONE statement.
_B63_REC_BODY = """reach(node, hop) AS (
    SELECT (SELECT min(src) FROM b63_base), 0
    UNION ALL
    SELECT e.dst, r.hop + 1
    FROM reach r JOIN b63_base e ON e.src = r.node
    WHERE r.hop < 2
)
SELECT node AS part, CAST(min(hop) AS INT) AS hops
FROM reach GROUP BY node
"""

_B63_REC_SQL = "WITH RECURSIVE " + _B63_REC_BODY
# min(src) == the old seed min(part_a): sedges is the symmetrized
# closure of spairs (every part_b also appears with some part_a < it),
# so the global min over src equals the min over part_a.


@register(
    "b63_recursive_bfs_reach",
    # SELECT * FROM (...) around the base: inside a WITH RECURSIVE list,
    # DuckDB binds a nested WITH to only the FIRST branch of a top-level
    # UNION ALL body (recursion-anchor parsing), so the base's own CTEs
    # vanish from the second branch unless the union is wrapped.
    oracle=(
        "WITH RECURSIVE b63_base AS MATERIALIZED (SELECT * FROM ("
        + _B63_BASE_SQL
        + ")),\n"
        + _B63_REC_BODY
    ),
    tags=("layer_b", "graph", "recursive_cte"),
)
def b63_recursive_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE BFS ('related products within 2 hops'): from the
    smallest part in the high-support co-purchase graph, expand
    neighbor hops recursively and report each reachable part's minimum
    hop distance. The SAME two SQL texts run verbatim on BOTH engines —
    the base-graph query (_B63_BASE_SQL) and the WITH RECURSIVE
    expansion (_B63_REC_SQL); Spark 4's recursion executes natively
    (bounded by the hop predicate; spark.sql.cteRecursionLevelLimit
    backstops), and the identical strings form the DuckDB oracle, so
    the parity check also pins dialect compatibility of the recursion
    itself.

    r10 fix for the r9-diagnosed cost defect: Spark's UnionLoop
    re-executed the non-recursive CTEs FRESH on every iteration when
    the whole query was one WITH RECURSIVE text — the 3.4 s
    sbaskets/spairs base ran ~5x (seed subquery + loop levels + final),
    ~20 s at sf0.1. Materializing the base ONCE (eager localCheckpoint
    on Spark, a single-statement ``AS MATERIALIZED`` CTE in DuckDB —
    the only engine-specific wrapper) keeps both verbatim texts AND
    kills the multiplier: each iteration now joins cached partitions.
    This is also the shape a 100 TB user should copy — never put an
    expensive base inside the recursive CTE's scope; the shipped
    pattern for unbounded graph reach remains
    checkpoint-the-edges-then-iterate (x92/x82/x15, O(log n) rounds).
    In the bench headline set since r11 (the r10 fix brought it under
    the 10 s bar: 19.7 -> 4.7 s warm at sf0.1).

    r15: the pair half (_B63_PAIRS_SQL) materializes BEFORE the
    symmetric union. In the one-shot base, the union's two branches
    shared the pair exchange but each re-READ and re-aggregated it —
    235 MB of shuffle read at sf0.1 to rebuild a KB-sized pair table
    twice. Both engines still run the same two texts; DuckDB's base
    splices the pair text into the union template
    (_B63_SYM_SQL_TMPL).

    r16 (VERDICT r15 item 1): the union view is LAZY — r15's second
    eager localCheckpoint on it was the round's one both-windows
    regression (the extra materializing job cost more than it saved;
    the union over cached KB pair partitions is a trivial projection
    each UnionLoop iteration re-derives for free)."""
    from video_stream_processing_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    pairs = spark.sql(_B63_PAIRS_SQL).localCheckpoint(eager=True)
    pairs.createOrReplaceTempView("b63_pairs")
    base = spark.sql(_B63_SYM_SQL_TMPL.format(pairs="b63_pairs"))
    base.createOrReplaceTempView("b63_base")
    return spark.sql(_B63_REC_SQL)


# --------------------------------------------------------------------------
# x92 — connected components of the high-support co-purchase graph
# --------------------------------------------------------------------------

_X92_ORACLE = """
WITH RECURSIVE sbaskets AS (
    SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
spairs AS (
    SELECT a.part AS part_a, b.part AS part_b
    FROM sbaskets a JOIN sbaskets b ON a.cust = b.cust AND a.part < b.part
    GROUP BY a.part, b.part
    HAVING count(*) >= 5
),
sedges AS (
    SELECT part_a AS src, part_b AS dst FROM spairs
    UNION
    SELECT part_b AS src, part_a AS dst FROM spairs
),
reach AS (
    SELECT src AS node, src AS r FROM sedges
    UNION
    SELECT reach.node, e.dst AS r FROM reach JOIN sedges e ON reach.r = e.src
)
SELECT node AS part, CAST(min(r) AS BIGINT) AS component_id
FROM reach GROUP BY node
"""


@register(
    "x92_copurchase_components",
    oracle=_X92_ORACLE,
    tags=("extension", "graph", "components"),
)
def x92_copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the high-support (>= 5 co-purchasers)
    co-purchase graph — the product-family discovery step (and the same
    primitive x15 uses to pick canonical docs per duplicate cluster,
    here exposed generically): every part labeled with the smallest
    part id it can reach.

    Scale posture: min-label propagation with pointer jumping
    (operators/graph.connected_components -> the x15 engine) — O(log
    diameter) rounds, each one keyed shuffle join + aggregate with
    checkpointed |V|-sized labels; the oracle computes the same
    fixpoint as a DuckDB reachability-closure RECURSIVE CTE (closure is
    fine on the differential corpus; the iterative form is what
    scales)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    baskets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        # repartition by cust BEFORE distinct: HashPartitioning(cust)
        # satisfies the (cust, part) clustering the aggregate needs AND
        # the self-join's cust clustering, so the wide join output is
        # exchanged once on the narrow key instead of once per grain
        .repartition("cust")
        .distinct()
        # checkpoint BEFORE the self-join: the two join branches differ
        # only in their alias projection, but Spark does not reuse the
        # exchange across them (audited: 4 parquet scans — the whole
        # lineitem-join-orders-distinct pipeline ran twice). One eager
        # materialization of the narrow (cust, part) frame halves the
        # graph-base cost.
        .localCheckpoint(eager=True)
    )
    a = baskets.select("cust", F.col("part").alias("part_a"))
    b = baskets.select("cust", F.col("part").alias("part_b"))
    pairs = (
        a.join(b, "cust")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .where(F.col("n_cust") >= 5)
    )
    edges = pairs.select(F.col("part_a").alias("src"), F.col("part_b").alias("dst")).unionAll(
        pairs.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst"))
    )
    return G.connected_components(edges).select(
        F.col("node").alias("part"), "component_id"
    )


# --------------------------------------------------------------------------
# x93 — recommendation backtest (train/test temporal split)
# --------------------------------------------------------------------------

@register(
    "x93_recommendation_backtest",
    oracle="""
WITH train_b AS (
    SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '2000-01-01'
),
test_b AS (
    SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
),
aff AS (
    SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_cust
    FROM train_b a JOIN train_b b ON a.cust = b.cust AND a.part <> b.part
    GROUP BY part_a, part_b HAVING count(*) >= 3
),
recs AS (
    SELECT part_a AS part, part_b AS rec
    FROM (SELECT *, row_number() OVER (PARTITION BY part_a
                                       ORDER BY n_cust DESC, part_b) AS rn
          FROM aff)
    WHERE rn = 1
),
evals AS (
    SELECT t.cust, t.part, r.rec,
           t2.part IS NOT NULL AS hit
    FROM test_b t
    JOIN recs r ON t.part = r.part
    LEFT JOIN test_b t2 ON t2.cust = t.cust AND t2.part = r.rec
)
SELECT CAST(count(*) AS BIGINT) AS n_evals,
       CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS n_hits,
       round(count(*) FILTER (WHERE hit) * 1.0 / count(*), 6) AS hit_rate
FROM evals
""",
    tags=("extension", "recommendation", "eval"),
)
def x93_recommendation_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommendation backtest — the offline-eval loop every
    recommender ships with: train co-purchase affinity on pre-2000
    orders, pick each part's top-1 'bought together' partner
    (support >= 3, deterministic tiebreak), then measure hit-rate on
    the HELD-OUT post-2000 baskets (did the customer who bought the
    part also buy its recommended partner?). Train/test leakage is
    structurally impossible: the affinity join sees only the train
    split.

    Scale posture: the same bounded per-customer basket self-join as
    x80 builds affinity; recommendations collapse to |parts| rows via
    one window; evaluation is two keyed equi-joins against the test
    baskets (the hit probe joins on (cust, rec) — distinct baskets, so
    no fan-out). The scalar metrics aggregate map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("2000-01-01").cast("timestamp")
    # ONE fact-join pass builds both splits (split-tagged distinct
    # baskets, materialized once) — train_b, test_b and the hit probe
    # all filter this base instead of re-deriving the lineitem x orders
    # join (was 4 scans of each base table in the naive form).
    baskets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
            (F.col("o_orderdate") < cut).alias("is_train"),
        )
        # see _copurchase_edges: partitioning by cust alone satisfies
        # the distinct's clustering and the downstream per-cust joins
        .repartition("cust")
        .distinct()
        .localCheckpoint(eager=True)
    )
    train_b = baskets.where("is_train").select("cust", "part")
    test_b = baskets.where(~F.col("is_train")).select("cust", "part")
    a = train_b.select("cust", F.col("part").alias("part_a"))
    b = train_b.select("cust", F.col("part").alias("part_b"))
    aff = (
        a.join(b, "cust")
        .where(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .where(F.col("n_cust") >= 3)
    )
    recs = (
        aff.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("part_a").orderBy(F.desc("n_cust"), F.asc("part_b"))
            ),
        )
        .where(F.col("rn") == 1)
        .select(F.col("part_a").alias("part"), F.col("part_b").alias("rec"))
    )
    t2 = test_b.select(F.col("cust"), F.col("part").alias("rec_bought"))
    evals = (
        test_b.join(recs, "part")
        .join(
            t2,
            (test_b.cust == t2.cust) & (F.col("rec") == F.col("rec_bought")),
            "left",
        )
        .select((F.col("rec_bought").isNotNull()).alias("hit"))
    )
    return evals.agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.count_if("hit").cast("long").alias("n_hits"),
        F.round(F.count_if("hit") / F.count(F.lit(1)), 6).alias("hit_rate"),
    )


# --------------------------------------------------------------------------
# x96 — personalized PageRank from the top-degree seeds
# --------------------------------------------------------------------------

_X96_ITERS = 3
_X96_SEEDS = 3


def _x96_oracle() -> str:
    chain = [
        f"""seeds AS (
    SELECT node FROM (
        SELECT node, row_number() OVER (ORDER BY deg DESC, node) AS rn FROM deg
    ) WHERE rn <= {_X96_SEEDS}
),
base AS (
    SELECT d.node,
           CASE WHEN s.node IS NOT NULL THEN CAST(150000 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS restart
    FROM deg d LEFT JOIN seeds s ON d.node = s.node
),
r0 AS (SELECT node,
           CASE WHEN restart > 0 THEN CAST(1000000 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS rank
       FROM base)"""
    ]
    for i in range(1, _X96_ITERS + 1):
        chain.append(
            f"""r{i} AS (
    SELECT b.node,
           CAST(b.restart + coalesce(inflow, 0) AS BIGINT) AS rank
    FROM base b LEFT JOIN (
        SELECT e.dst AS node, sum((r.rank * 85) // (100 * d.deg)) AS inflow
        FROM edges e
        JOIN r{i - 1} r ON e.src = r.node
        JOIN deg d ON e.src = d.node
        GROUP BY e.dst
    ) f ON b.node = f.node
)"""
        )
    return (
        "WITH "
        + _GRAPH_SQL.strip()
        + ",\n"
        + ",\n".join(chain)
        + f"\nSELECT node AS part, rank AS pr_mass FROM r{_X96_ITERS}"
    )


@register(
    "x96_personalized_pagerank",
    oracle=_x96_oracle(),
    tags=("extension", "graph", "pagerank", "recommendation"),
)
def x96_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the three highest-degree parts — the
    'related to THESE items' ranking (recommendation/expansion form of
    PageRank): only the seed nodes hold initial mass and receive the
    restart, so scores decay with graph distance from the seeds; the
    same fixed-point integer arithmetic as x82 keeps both engines
    bit-identical.

    Scale posture: identical per-iteration shape to x82 (edges JOIN
    ranks -> groupBy dst) plus one broadcast seed join at setup; the
    restart table is |V|-sized and checkpointed once. Edges and deg
    come from _materialized_graph so the basket pipeline runs once —
    the seed/degree reference and pagerank's edge base share the one
    checkpointed pair table."""
    _, edges, deg = _materialized_graph(spark, sf_dir)
    seeds = (
        deg.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("deg"), F.asc("node")))
        )
        .where(F.col("rn") <= _X96_SEEDS)
        .select("node")
    )
    return G.pagerank_fixedpoint(edges, iters=_X96_ITERS, seeds=seeds).select(
        F.col("node").alias("part"), "pr_mass"
    )


# --------------------------------------------------------------------------
# x97 — modularity of the brand partition (is co-purchase brand-assortative?)
# --------------------------------------------------------------------------

@register(
    "x97_brand_modularity",
    oracle="WITH "
    + _GRAPH_SQL.strip()
    + """,
lbl AS (
    SELECT d.node, p.p_brand AS brand, d.deg
    FROM deg d JOIN part p ON d.node = p.p_partkey
),
within AS (
    SELECT count(*) AS m_within
    FROM pairs pr
    JOIN lbl a ON pr.part_a = a.node
    JOIN lbl b ON pr.part_b = b.node
    WHERE a.brand = b.brand
),
per_brand AS (
    SELECT sum(CAST(dsum AS BIGINT) * CAST(dsum AS BIGINT)) AS sum_d2
    FROM (SELECT brand, sum(deg) AS dsum FROM lbl GROUP BY brand)
),
m AS (SELECT count(*) AS m FROM pairs)
SELECT CAST(m.m AS BIGINT) AS n_edges,
       round((4 * m.m * w.m_within - pb.sum_d2) * 1.0 / (4 * m.m * m.m), 6)
           AS modularity
FROM m, within w, per_brand pb
""",
    tags=("extension", "graph", "community"),
)
def x97_brand_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the BRAND partition of the co-purchase
    graph — 'do customers co-purchase within brands?': Q = sum_c
    [m_c/m - (d_c/2m)^2], computed as ONE integer expression
    (4m*sum(m_c) - sum(d_c^2)) / 4m^2 so both engines agree exactly
    until the single final division (rounded at 6).

    Scale posture: brand labels broadcast onto the degree table
    (|V| rows); within-community edge counting is two broadcast label
    joins over the pair list; the brand aggregate is |brands|-sized.
    No quadratic step anywhere — modularity of ANY labeling costs one
    pass over edges plus a label-sized aggregate."""
    pairs, _, deg = _materialized_graph(spark, sf_dir)
    deg = deg.localCheckpoint(eager=True)
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("brand")
    )
    lbl = deg.join(F.broadcast(p), "node")
    la = lbl.select(F.col("node").alias("part_a"), F.col("brand").alias("brand_a"))
    lb = lbl.select(F.col("node").alias("part_b"), F.col("brand").alias("brand_b"))
    m_within = (
        pairs.join(F.broadcast(la), "part_a")
        .join(F.broadcast(lb), "part_b")
        .where(F.col("brand_a") == F.col("brand_b"))
        .agg(F.count(F.lit(1)).alias("m_within"))
    )
    sum_d2 = (
        lbl.groupBy("brand")
        .agg(F.sum("deg").alias("dsum"))
        .agg(F.sum(F.col("dsum") * F.col("dsum")).alias("sum_d2"))
    )
    m = pairs.agg(F.count(F.lit(1)).alias("m"))
    return (
        m.crossJoin(m_within)
        .crossJoin(sum_d2)
        .select(
            F.col("m").cast("long").alias("n_edges"),
            F.round(
                (4 * F.col("m") * F.col("m_within") - F.col("sum_d2"))
                / (4 * F.col("m") * F.col("m")),
                6,
            ).alias("modularity"),
        )
    )


# --------------------------------------------------------------------------
# x98 — degree assortativity (Pearson correlation of endpoint degrees)
# --------------------------------------------------------------------------

@register(
    "x98_degree_assortativity",
    oracle="WITH "
    + _GRAPH_SQL.strip()
    + """,
dd AS (
    SELECT d1.deg AS x, d2.deg AS y
    FROM edges e
    JOIN deg d1 ON e.src = d1.node
    JOIN deg d2 ON e.dst = d2.node
),
s AS (
    SELECT count(*) AS n,
           sum(CAST(x AS BIGINT)) AS sx, sum(CAST(y AS BIGINT)) AS sy,
           sum(CAST(x AS BIGINT) * CAST(y AS BIGINT)) AS sxy,
           sum(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS sxx,
           sum(CAST(y AS BIGINT) * CAST(y AS BIGINT)) AS syy
    FROM dd
)
SELECT CAST(n AS BIGINT) AS n_directed_edges,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6)
           AS assortativity
FROM s
""",
    tags=("extension", "graph", "stats"),
)
def x98_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — the Pearson
    correlation of endpoint degrees over directed edges (Newman's r):
    positive = hubs link hubs (social-network-like), negative = hubs
    link leaves (technological/star-like). Every sum is an EXACT
    BIGINT (degrees are integers), so both engines agree to the bit
    until the single final sqrt+division, rounded at 6.

    Scale posture: two broadcast degree joins onto the edge stream, one
    map-side-combinable 5-sum aggregate — one pass over the ONCE-
    materialized edge list (pairs checkpoint; edges/deg derive from
    it — the d1/d2/edges references would otherwise re-run the basket
    pipeline each)."""
    _, edges, deg = _materialized_graph(spark, sf_dir)
    deg = deg.localCheckpoint(eager=True)
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("x"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("y"))
    s = (
        edges.join(F.broadcast(d1), "src")
        .join(F.broadcast(d2), "dst")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * 1.0
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# x99 — global clustering coefficient (3 x triangles / wedges)
# --------------------------------------------------------------------------

@register(
    "x99_clustering_coefficient",
    oracle="WITH "
    + _GRAPH_SQL.strip()
    + """,
o AS (
    SELECT e.src AS s, e.dst AS d, d2.deg AS dd
    FROM edges e
    JOIN deg d1 ON e.src = d1.node
    JOIN deg d2 ON e.dst = d2.node
    WHERE (d1.deg, e.src) < (d2.deg, e.dst)
),
w2 AS (
    SELECT a.s, a.d AS b, c.d AS c
    FROM o a JOIN o c ON a.s = c.s
    WHERE (a.dd, a.d) < (c.dd, c.d)
),
tri AS (SELECT count(*) AS n_tri FROM w2 w JOIN o e ON e.s = w.b AND e.d = w.c),
wedges AS (
    SELECT sum(CAST(deg AS BIGINT) * (deg - 1) / 2) AS n_wedges FROM deg
)
SELECT CAST(w.n_wedges AS BIGINT) AS n_wedges,
       CAST(t.n_tri AS BIGINT) AS n_triangles,
       round(3.0 * t.n_tri / w.n_wedges, 6) AS clustering_coeff
FROM wedges w, tri t
""",
    tags=("extension", "graph", "stats"),
)
def x99_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient — the 'how cliquish is this graph'
    transitivity statistic: 3 x triangles / wedges, where wedges =
    sum over nodes of deg*(deg-1)/2 (closed + open length-2 paths) and
    triangles come from the same degree-oriented count as x86. Both
    counts are exact integers; one final division, rounded at 6.

    Scale posture: wedge total is a |V|-sized aggregate over the degree
    table; the triangle count reuses x86's O(m^1.5) oriented closure —
    nothing here exceeds the triangle bound."""
    _, edges, deg = _materialized_graph(spark, sf_dir)
    deg = deg.localCheckpoint(eager=True)
    tri = G.oriented_triangle_count(edges)
    wedges = deg.agg(
        F.sum((F.col("deg").cast("long") * (F.col("deg") - 1) / 2).cast("long")).alias(
            "n_wedges"
        )
    )
    return wedges.crossJoin(tri).select(
        F.col("n_wedges").cast("long"),
        F.col("n_triangles").cast("long"),
        F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
            "clustering_coeff"
        ),
    )


# --------------------------------------------------------------------------
# x100 — time-decayed co-purchase affinity (integer half-life weights)
# --------------------------------------------------------------------------

@register(
    "x100_decayed_affinity",
    oracle="""
WITH dated_baskets AS (
    SELECT o.o_custkey AS cust, l.l_partkey AS part,
           max(o.o_orderdate) AS last_seen
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey, l.l_partkey
),
weighted AS (
    SELECT cust, part,
           1000000 // (1 << least(datediff('day', last_seen,
                                           TIMESTAMP '2002-01-01') // 365, 20))
               AS w
    FROM dated_baskets
),
pairs AS (
    SELECT a.part AS part_a, b.part AS part_b,
           sum(CAST(least(a.w, b.w) AS BIGINT)) AS decayed_support,
           count(*) AS n_cust
    FROM weighted a JOIN weighted b ON a.cust = b.cust AND a.part < b.part
    GROUP BY a.part, b.part
    HAVING sum(CAST(least(a.w, b.w) AS BIGINT)) >= 1500000
)
SELECT part_a, part_b, CAST(decayed_support AS BIGINT) AS decayed_support,
       CAST(n_cust AS BIGINT) AS n_cust
FROM pairs
""",
    tags=("extension", "affinity", "recommendation", "timeseries"),
)
def x100_decayed_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed co-purchase affinity — the freshness-aware variant
    of x80: each (customer, part) association carries a half-life
    weight of 1e6 micro-units halved per year since the customer LAST
    bought the part (integer shift arithmetic — engine-exact, no
    pow()); a pair's decayed support sums min(w_a, w_b) over customers,
    and the support floor keeps only fresh-enough co-purchases. An
    association last seen 4 years ago contributes 1/16th of a recent
    one — stale affinities age out instead of accumulating forever.

    Scale posture: identical bounded per-customer self-join shape to
    x80; the weight is a projection on the (cust, part) aggregate, and
    the decayed sum is an exact BIGINT with map-side combine."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    dated = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .agg(F.max("o_orderdate").alias("last_seen"))
    )
    age_years = F.least(
        F.expr("datediff(timestamp '2002-01-01', last_seen) div 365"), F.lit(20)
    )
    weighted = dated.select(
        "cust", "part", F.expr("1000000").cast("long").alias("_base"), age_years.alias("_ay")
    ).select(
        "cust",
        "part",
        F.expr("_base div shiftleft(1, _ay)").alias("w"),
    )
    a = weighted.select("cust", F.col("part").alias("part_a"), F.col("w").alias("wa"))
    b = weighted.select("cust", F.col("part").alias("part_b"), F.col("w").alias("wb"))
    return (
        a.join(b, "cust")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(
            F.sum(F.least("wa", "wb")).cast("long").alias("decayed_support"),
            F.count(F.lit(1)).cast("long").alias("n_cust"),
        )
        .where(F.col("decayed_support") >= 1500000)
    )


# --------------------------------------------------------------------------
# x101 — degree-distribution power-law slope (decimal-exact OLS)
# --------------------------------------------------------------------------

@register(
    "x101_degree_powerlaw_slope",
    oracle="WITH "
    + _GRAPH_SQL.strip()
    + """,
bins AS (
    SELECT length(bin(deg)) - 1 AS b, count(*) AS n
    FROM deg GROUP BY length(bin(deg)) - 1
),
pts AS (
    SELECT CAST(b AS BIGINT) AS x,
           CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
    FROM bins
),
s AS (
    SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
           sum(y) AS sy, sum(CAST(x AS DECIMAL(18,0)) * y) AS sxy
    FROM pts
)
SELECT CAST(n AS BIGINT) AS n_bins,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS log2_slope
FROM s
""",
    tags=("extension", "graph", "stats"),
)
def x101_degree_powerlaw_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law slope — the scale-free-ness
    diagnostic: bucket node degrees into log2 bins (integer via
    binary-repr length, the x90 trick), fit ln(count) against the bin
    index with closed-form OLS. A slope near -1..-3 on log-log axes is
    the power-law signature; flat means exponential-ish. Float parity:
    each ln(count) rounds to 9 decimals and enters the sums as
    DECIMAL(18,9) — the OLS sums are then EXACT decimals (integer x
    decimal products), with one final double division rounded at 6.

    Scale posture: everything after the degree table is |bins|-sized
    (~40 rows max); the degree table itself is the one |V| aggregate
    (pairs checkpointed so the symmetric-union edge list does not run
    the basket pipeline twice)."""
    _, _, deg = _materialized_graph(spark, sf_dir)
    bins = deg.groupBy(
        (F.length(F.bin(F.col("deg"))) - 1).alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    pts = bins.select(
        F.col("b").cast("long").alias("x"),
        F.round(F.log(F.col("n").cast("double")), 9).cast("decimal(18,9)").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_bins"),
        F.round(num / den, 6).alias("log2_slope"),
    )
