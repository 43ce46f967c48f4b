"""Vector similarity search over ``embeddings`` (ARRAY<FLOAT>, 64-dim) —
the ANN surface of the training-data pipeline (driver north-star).

Three tiers:
- brute-force cosine top-k (the exactness baseline; O(Q*N) dot products,
  all JVM-side higher-order functions — no Python in the loop);
- random-hyperplane LSH buckets (deterministic integer-formula
  hyperplanes => oracle-checkable candidate generation, the hash-bucket
  scale path);
- IVF with label-derived centroids (posexplode + positional avg; probe
  the nearest centroid only).

Ranking parity rule: scores are rounded to 5 decimals FIRST and ranked
on (rounded_score DESC, vec_id) so sub-ulp float differences between
engines cannot flip an ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from video_stream_processing_spark.operators.parallelism import ensure_parallelism

N_HYPERPLANES = 8
SCORE_SCALE = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double (matches list_sum order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm (empty/degenerate) vector yields NULL
    # instead of an ANSI divide-by-zero that would kill the whole query —
    # NULL scores then fail every threshold/rank predicate and drop out.
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def _queries(emb: DataFrame, modulus: int = 50) -> DataFrame:
    """Deterministic query subset: every ``modulus``-th vector."""
    return emb.where(F.col("vec_id") % modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_emb")
    )


def _cos_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with norms precomputed per VECTOR rather than per PAIR —
    identical double arithmetic (same l2_norm expression, evaluated
    once), ~3x less fold work on an N x M pair join. try_divide: see
    cosine() — zero-norm vectors score NULL and drop, never throw."""
    return F.round(F.try_divide(dot(a, b), na * nb), SCORE_SCALE)


def brute_force_topk(emb: DataFrame, k: int = 5, query_modulus: int = 50) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against every
    candidate — the fact side never shuffles; ranking is one window over
    the per-query partitions. Norms are projected once per side before
    the join (pair work = one dot product)."""
    # spread the one-split test scan before the per-row fold work (no-op
    # at real scale; see operators/parallelism.py)
    emb = ensure_parallelism(emb, "vec_id")
    q = _queries(emb, query_modulus).withColumn("qn", l2_norm(F.col("query_emb")))
    cand = emb.select("vec_id", "embedding", l2_norm(F.col("embedding")).alias("cn"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _plane_bits_sql(emb: str, planes: list[int]) -> str:
    """SQL text of the '0'/'1' bucket key for the given plane indices:
    g(i,p) = (((5i + 11p) % 13) - 6)/6 (zero-mean integer lattice), bit =
    1 iff dot(e, g_p) >= 0. One generated string for ALL planes — the
    per-plane py4j HOF construction this replaces dominated build time
    (see the generated-SQL builder note above _sql_arr)."""
    frags = []
    for p in planes:
        fold = (
            f"aggregate(zip_with({emb}, sequence(0, size({emb}) - 1), "
            f"(x, i) -> CAST(x AS DOUBLE) * CAST(((i * 5 + {p * 11}) % 13) - 6 AS DOUBLE) / 6.0D), "
            "0.0D, (acc, x) -> acc + x)"
        )
        frags.append(f"CASE WHEN {fold} >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(frags) + ")"


def hyperplane_bits(emb_sql: str, n_planes: int = N_HYPERPLANES) -> Column:
    """Deterministic random-ish hyperplanes: g(i,j) = (((5i + 11j) % 13) - 6)/6
    (zero-mean integer lattice). Bit j = 1 iff dot(e, g_j) >= 0. Returns
    the n-char '0'/'1' bucket key. ``emb_sql`` is the embedding column's
    SQL text (generated-SQL build)."""
    return F.expr(_plane_bits_sql(emb_sql, list(range(n_planes))))


def lsh_topk(emb: DataFrame, k: int = 3, query_modulus: int = 50) -> DataFrame:
    """ANN via hyperplane-LSH bucketing: candidates limited to the query's
    bucket (expected N/2^planes of the data), then exact cosine rank
    within the bucket. The bucket equi-join replaces the cross join —
    this is the 100 TB shape (shuffle on bucket key, no broadcast of the
    corpus)."""
    bucketed = ensure_parallelism(emb, "vec_id").select(
        "vec_id", "embedding", hyperplane_bits("embedding").alias("bucket")
    )
    q = bucketed.where(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
        F.col("bucket"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    scored = (
        bucketed.withColumn("cn", l2_norm(F.col("embedding")))
        .join(q, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def ivf_centroids(emb: DataFrame) -> DataFrame:
    """Per-label centroids via posexplode + positional mean, re-assembled
    in position order (the k-means-assignment step of IVF; labels stand
    in for trained cluster ids)."""
    pos = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        pos.groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )


def ivf_topk(emb: DataFrame, k: int = 3, query_modulus: int = 50) -> DataFrame:
    """IVF probe-1 search: route each query to its nearest centroid
    (broadcast centroids — tiny), then exact top-k within that one
    inverted list. At scale the inverted lists are the partition layout,
    so the probe touches 1/n_clusters of the corpus."""
    cents = ivf_centroids(emb)
    q = _queries(emb, query_modulus)
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "query_emb",
            "label",
            F.round(cosine(F.col("query_emb"), F.col("centroid")), SCORE_SCALE).alias(
                "csim"
            ),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("csim").desc(), "label")
            ),
        )
        .where(F.col("crank") == 1)
        .select(
            "query_id",
            "query_emb",
            F.col("label").alias("probe_label"),
            l2_norm(F.col("query_emb")).alias("qn"),
        )
    )
    emb = ensure_parallelism(emb, "vec_id")
    scored = (
        emb.withColumn("cn", l2_norm(F.col("embedding")))
        .join(F.broadcast(assigned), emb.label == assigned.probe_label)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "probe_label",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("probe_label").cast("int").alias("probe_label"),
            "vec_id",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_topk_multiprobe(
    emb: DataFrame, k: int = 3, n_probes: int = 2, query_modulus: int = 50
) -> DataFrame:
    """IVF probe-N search — the recall/cost knob over x08's probe-1: each
    query routes to its ``n_probes`` nearest centroids and ranks exactly
    within their union of inverted lists (n_probes/n_clusters of the
    corpus scanned; each vector lives in exactly one list so the union
    is duplicate-free by construction). Same broadcast-centroid /
    broadcast-assignment plan shape as probe-1 — the corpus side still
    never shuffles."""
    cents = ivf_centroids(emb)
    q = _queries(emb, query_modulus)
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "query_emb",
            "label",
            F.round(cosine(F.col("query_emb"), F.col("centroid")), SCORE_SCALE).alias(
                "csim"
            ),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("csim").desc(), "label")
            ),
        )
        .where(F.col("crank") <= n_probes)
        .select(
            "query_id",
            "query_emb",
            F.col("label").alias("probe_label"),
            l2_norm(F.col("query_emb")).alias("qn"),
        )
    )
    emb = ensure_parallelism(emb, "vec_id")
    scored = (
        emb.withColumn("cn", l2_norm(F.col("embedding")))
        .join(F.broadcast(assigned), emb.label == assigned.probe_label)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk_multiprobe_oracle_sql(
    k: int = 3, n_probes: int = 2, query_modulus: int = 50
) -> str:
    cos_qc = cosine_sql("q.embedding", "ct.centroid")
    cos_qv = cosine_sql("q2.query_emb", "e.embedding")
    return f"""
WITH pos AS (
    SELECT label, u.i AS pos, u.x AS v
    FROM embeddings, unnest(list_transform(embedding, (x, i) -> {{'i': i, 'x': x}})) AS t(u)
),
cent AS (
    SELECT label, list(CAST(c AS DOUBLE) ORDER BY pos) AS centroid
    FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS c FROM pos GROUP BY label, pos)
    GROUP BY label
),
assigned AS (
    SELECT query_id, query_emb, probe_label FROM (
        SELECT q.vec_id AS query_id, q.embedding AS query_emb, ct.label AS probe_label,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_qc} DESC, ct.label) AS crank
        FROM embeddings q CROSS JOIN cent ct
        WHERE q.vec_id % {query_modulus} = 0
    ) WHERE crank <= {n_probes}
),
scored AS (
    SELECT q2.query_id, e.vec_id, {cos_qv} AS score
    FROM embeddings e JOIN assigned q2 ON e.label = q2.probe_label
    WHERE e.vec_id != q2.query_id
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Generated-SQL expression builders for the literal-codebook operators.
#
# The k-means assign / PQ encode / ADC-LUT / hyperplane projections build
# expression trees whose size grows with k x dim. Constructing those with
# pyspark Column operators pays one py4j round trip PER NODE — measured
# ~0.35 s just to BUILD one 8-centroid candidate array at 64 dims, which
# dominated the ANN queries' wall-clock at bench scale (the data is
# negligible; the driver-side construction is not). Emitting the SAME
# expression as one SQL string and parsing it with F.expr() is ~350x
# faster to construct and analyzes to the identical tree — the
# differential gate (DuckDB oracle hash-compare) pins that nothing
# drifted. Each _sql_* builder is the exact textual twin of the Column
# helper it replaces (same fold order, same casts, same rounding).
# ---------------------------------------------------------------------------


def _sql_arr(values: list[float]) -> str:
    """array(...) double-literal SQL. ``repr`` emits the shortest
    round-trip decimal and Spark's parser returns the nearest double =
    the exact same bits (pinned in tests/test_extensions.py)."""
    if not values:
        return "CAST(array() AS ARRAY<DOUBLE>)"
    return "array(" + ",".join(repr(float(v)) + "D" for v in values) + ")"


def _sql_dot(a: str, b: str) -> str:
    """SQL twin of dot(): sequential left-fold product-sum in double."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _sql_l2norm(a: str) -> str:
    """SQL twin of l2_norm(): sqrt of the sequential squared-sum fold."""
    return (
        f"sqrt(aggregate({a}, 0.0D, "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def _sql_cosine(a: str, b: str) -> str:
    """SQL twin of cosine() (try_divide: zero-norm -> NULL -> drops)."""
    return f"try_divide({_sql_dot(a, b)}, {_sql_l2norm(a)} * {_sql_l2norm(b)})"


def _sql_sub(col: str, m: int, sub_dim: int) -> str:
    """SQL twin of _sub(): 1-based sub-vector slice m."""
    return f"slice({col}, {m * sub_dim + 1}, {sub_dim})"


def _lit_double_array(values: list[float]) -> Column:
    """LITERAL ARRAY<DOUBLE> built as ONE parsed SQL expression instead
    of ``F.array(*[F.lit(v) ...])``'s per-element py4j round trips —
    measured ~55x faster to CONSTRUCT for 64-dim vectors, which
    dominated k-means/PQ training wall-clock at bench scale (the JVM
    literal is identical either way: ``repr`` emits the shortest
    round-trip decimal and Spark's parser returns the nearest double =
    the exact same bits, pinned in tests/test_extensions.py)."""
    return F.expr(_sql_arr(values))


def _centroid_candidates(emb_sql: str, cents: list[list[float]]) -> Column:
    """ARRAY<STRUCT<csim, neg_cid>> of the vector's rounded cosine to
    each LITERAL centroid. Pure projection — no join, no shuffle; struct
    lexicographic order makes array_max/array_sort implement the
    (csim DESC, cid ASC) round-then-rank rule (cid ASC == neg_cid DESC).
    ``emb_sql`` is the embedding column's SQL text (generated-SQL build:
    one F.expr parse instead of ~k*3 py4j HOF constructions).

    r15: each centroid's L2 norm is a CONSTANT of the training output,
    so it is folded in Python instead of re-deriving it per row with a
    second copy of the centroid literal array — the same left fold
    (acc + x*x in array order) and a correctly-rounded sqrt, so the
    double is bit-identical to the SQL fold the oracle still runs; repr
    round-trips it exactly (pinned with _sql_arr's literals). Halves the
    literal count and removes k 64-element folds per corpus row."""
    import math

    frags = []
    for i, c in enumerate(cents):
        acc = 0.0
        for x in c:
            acc += float(x) * float(x)
        cn = math.sqrt(acc)
        cos = (
            f"try_divide({_sql_dot(emb_sql, _sql_arr(c))}, "
            f"{_sql_l2norm(emb_sql)} * {cn!r}D)"
        )
        frags.append(
            f"named_struct('csim', round({cos}, {SCORE_SCALE}), 'neg_cid', {-i})"
        )
    return F.expr("array(" + ",".join(frags) + ")")


def kmeans_centroids(
    emb: DataFrame, n_clusters: int = 8, n_iters: int = 2, prepared: bool = False
) -> list[list[float]]:
    """TRAINED IVF centroids: ``n_iters`` Lloyd iterations of spherical
    k-means, deterministic so a DuckDB oracle can replay the training
    exactly (VERDICT r4 item 3 — replaces the label-derived stand-in,
    which real unlabeled pipelines don't have).

    - init: the ``n_clusters`` smallest vec_ids (TakeOrderedAndProject —
      top-k merge, no global sort), cid = 0..k-1 in vec_id order;
    - assign: nearest LITERAL centroid by cosine ROUNDED to SCORE_SCALE
      (tie -> lowest cid) — a pure projection, since k x dim doubles are
      driver-sized by definition of k-means (k=8, dim=64 here);
    - update: positional mean per cluster via posexplode + groupBy
      (cid, pos) — map-side combine reduces every task to <= k*dim
      partial rows, so the per-iteration shuffle is centroid-sized, not
      corpus-sized; clusters that lose every member keep their previous
      centroid.

    Plan shape per iteration: ONE corpus scan -> projection -> narrow
    agg. The corpus is never shuffled and never joined during training;
    total cost is n_iters scans + the k-row init job. (The naive
    alternative — carrying centroids as a lazily-composed DataFrame —
    re-derives the whole training lineage inside every downstream
    reference: the audited plan showed 32 scans / 50 exchanges before
    this shape.) Returns the centroids as plain lists for literal
    inlining; jobs run eagerly at call time (k-means is an action, like
    x15's fixpoint probes)."""
    # spread + cache for the training loop: every Lloyd action otherwise
    # re-scans and re-exchanges the corpus (one extra job per action);
    # the cache is training-scoped and released before returning.
    # ``prepared=True`` means the CALLER already spread+persisted emb and
    # owns its release (ivfpq_topk runs both trainers concurrently over
    # one shared cache — two independent persists of the identical plan
    # would share one CacheManager entry, and whichever trainer finished
    # first would unpersist it out from under the other mid-training,
    # r15 ADVICE). The release is in a finally so a failed training
    # action cannot leak the cache.
    if not prepared:
        emb = ensure_parallelism(emb, "vec_id").persist()
    try:
        seeds = emb.select("vec_id", "embedding").orderBy("vec_id").limit(n_clusters).collect()
        cents = [
            [float(x) for x in r["embedding"]]
            for r in sorted(seeds, key=lambda r: r["vec_id"])
        ]
        dim = len(cents[0]) if cents else 0
        for _ in range(n_iters):
            best = F.array_max(_centroid_candidates("embedding", cents))
            # project cid in its OWN select before posexplode: combining the
            # getField with a generator in one projection makes the analyzer
            # rebuild the struct nameless (col1/col2) under the aggregate and
            # the by-name field access fails
            rows = (
                emb.select((-best["neg_cid"]).cast("int").alias("cid"), "embedding")
                .select("cid", F.posexplode("embedding").alias("pos", "v"))
                .groupBy("cid", "pos")
                .agg(F.avg(F.col("v").cast("double")).alias("c"))
                .collect()
            )
            by_cid: dict[int, dict[int, float]] = {}
            for r in rows:
                by_cid.setdefault(r["cid"], {})[r["pos"]] = r["c"]
            cents = [
                [by_cid[i][p] for p in range(dim)] if i in by_cid else cents[i]
                for i in range(len(cents))
            ]
    finally:
        if not prepared:
            emb.unpersist()
    return cents


def ivf_topk_trained(
    emb: DataFrame,
    k: int = 3,
    n_probes: int = 2,
    n_clusters: int = 8,
    n_iters: int = 2,
    query_modulus: int = 50,
) -> DataFrame:
    """IVF ANN over TRAINED (k-means) centroids — self-contained on an
    unlabeled corpus, unlike x08/x41's label-derived lists.

    Plan shape: train (kmeans_centroids — centroids come back as
    literals) -> corpus assignment is a pure PROJECTION (nearest literal
    centroid; the inverted lists ARE this assignment — at scale they'd
    be the partition/bucket layout written once at ingest) -> each query
    takes its n_probes best centroids by reversed array_sort (csim DESC,
    cid ASC — no window, no shuffle) -> exact cosine rank within the
    probed lists only. The corpus is scanned once and never shuffled
    before the final candidate equi-join against the broadcast probes."""
    cents = kmeans_centroids(emb, n_clusters=n_clusters, n_iters=n_iters)
    emb = ensure_parallelism(emb, "vec_id")  # after training (which wraps its own scan)
    best = F.array_max(_centroid_candidates("embedding", cents))
    corpus = emb.select(
        "vec_id",
        "embedding",
        (-best["neg_cid"]).cast("int").alias("cid"),
        l2_norm(F.col("embedding")).alias("cn"),
    )
    # reversed lexicographic sort = (csim DESC, neg_cid DESC == cid ASC):
    # exactly the oracle's ORDER BY cos DESC, cid — top n_probes by slice
    probe_structs = F.slice(
        F.reverse(F.array_sort(_centroid_candidates("embedding", cents))),
        1,
        n_probes,
    )
    probes = (
        emb.where(F.col("vec_id") % query_modulus == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_emb"),
            l2_norm(F.col("embedding")).alias("qn"),
            F.explode(probe_structs).alias("p"),
        )
        .select(
            "query_id", "query_emb", "qn", (-F.col("p.neg_cid")).cast("int").alias("probe_cid")
        )
    )
    scored = (
        corpus.join(F.broadcast(probes), corpus.cid == probes.probe_cid)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _kmeans_training_ctes(n_clusters: int, n_iters: int) -> tuple[list[str], str]:
    """The Lloyd-training CTE chain shared by every trained-centroid
    oracle (x44/x46/x47): seeds -> cent_0 -> (assign_i, cent_i)* — the
    SQL replay of kmeans_centroids, iteration by iteration. Returns
    (ctes, final_centroid_cte_name)."""
    ctes = [
        f"seeds AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {n_clusters})",
        "cent_0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid FROM seeds)",
    ]
    for it in range(1, n_iters + 1):
        prev = f"cent_{it - 1}"
        cos_ec = cosine_sql("e.embedding", "c.centroid")
        ctes.append(
            f"""assign_{it} AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cid) AS arank
        FROM embeddings e CROSS JOIN {prev} c
    ) WHERE arank = 1
)"""
        )
        ctes.append(
            f"""cent_{it} AS (
    SELECT p.cid, coalesce(n.centroid, p.centroid) AS centroid
    FROM {prev} p LEFT JOIN (
        SELECT cid, list(c ORDER BY pos) AS centroid
        FROM (
            SELECT a.cid, u.i AS pos, avg(CAST(u.x AS DOUBLE)) AS c
            FROM assign_{it} a,
                 unnest(list_transform(a.embedding, (x, i) -> {{'i': i, 'x': x}})) AS t(u)
            GROUP BY a.cid, u.i
        ) GROUP BY cid
    ) n ON n.cid = p.cid
)"""
        )
    return ctes, f"cent_{n_iters}"


def ivf_trained_oracle_sql(
    k: int = 3,
    n_probes: int = 2,
    n_clusters: int = 8,
    n_iters: int = 2,
    query_modulus: int = 50,
) -> str:
    """DuckDB replay of kmeans_centroids + ivf_topk_trained: the CTE
    chain is generated per Lloyd iteration, so the TRAINING is
    differential-checked, not just the final search."""
    ctes, final = _kmeans_training_ctes(n_clusters, n_iters)
    cos_corpus = cosine_sql("e.embedding", "c.centroid")
    cos_query = cosine_sql("q.embedding", "c.centroid")
    cos_score = cosine_sql("p.query_emb", "e.embedding")
    ctes.append(
        f"""corpus AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_corpus} DESC, c.cid) AS arank
        FROM embeddings e CROSS JOIN {final} c
    ) WHERE arank = 1
)"""
    )
    ctes.append(
        f"""probes AS (
    SELECT query_id, query_emb, probe_cid FROM (
        SELECT q.vec_id AS query_id, q.embedding AS query_emb, c.cid AS probe_cid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_query} DESC, c.cid) AS crank
        FROM embeddings q CROSS JOIN {final} c
        WHERE q.vec_id % {query_modulus} = 0
    ) WHERE crank <= {n_probes}
)"""
    )
    ctes.append(
        f"""scored AS (
    SELECT p.query_id, e.vec_id, {cos_score} AS score
    FROM corpus e JOIN probes p ON e.cid = p.probe_cid
    WHERE e.vec_id != p.query_id
)"""
    )
    ctes.append(
        """ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM scored
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
    )


def kmeans_cluster_profile(
    emb: DataFrame, n_clusters: int = 8, n_iters: int = 2
) -> DataFrame:
    """Trained-cluster profile: size and mean cohesion (rounded cosine to
    own centroid) per learned cluster — the corpus-curation view of the
    k-means output (cluster balance drives IVF probe cost and SemDeDup
    pair-join bounds). Assignment is the same literal-centroid projection
    as ivf_topk_trained: one corpus scan, one centroid-sized groupBy
    (map-side combine to <= k partials per task), zero joins."""
    cents = kmeans_centroids(emb, n_clusters=n_clusters, n_iters=n_iters)
    best = F.array_max(_centroid_candidates("embedding", cents))
    assigned = emb.select(
        (-best["neg_cid"]).cast("int").alias("cid"), best["csim"].alias("csim")
    )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("csim"), 4).alias("avg_csim"),
    )


def kmeans_profile_oracle_sql(n_clusters: int = 8, n_iters: int = 2) -> str:
    ctes, final = _kmeans_training_ctes(n_clusters, n_iters)
    cos_corpus = cosine_sql("e.embedding", "c.centroid")
    ctes.append(
        f"""corpus AS (
    SELECT vec_id, cid, csim FROM (
        SELECT e.vec_id, c.cid, {cos_corpus} AS csim,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_corpus} DESC, c.cid) AS arank
        FROM embeddings e CROSS JOIN {final} c
    ) WHERE arank = 1
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT cid, count(*) AS n_members, round(avg(csim), 4) AS avg_csim
FROM corpus GROUP BY cid
"""
    )


def semantic_dedup_trained(
    emb: DataFrame, threshold: float = 0.4, n_clusters: int = 8, n_iters: int = 2
) -> DataFrame:
    """SemDeDup over TRAINED clusters — x29's semantic dedup with the
    label-derived routing replaced by the k-means assignment, making the
    whole curation step self-contained on an unlabeled corpus. Same
    single-pass drop rule and dup_of attribution as semantic_dedup
    (lower-id cluster-mate at cosine >= threshold); same scale shape
    (per-cluster equi-join bounds the quadratic term; raise n_clusters
    to keep clusters small at 100 TB)."""
    cents = kmeans_centroids(emb, n_clusters=n_clusters, n_iters=n_iters)
    best = F.array_max(_centroid_candidates("embedding", cents))
    # same materialize-once rationale as semantic_dedup — here the
    # re-derived work is the literal-centroid argmin over every row
    assigned = emb.select(
        "vec_id", "embedding", (-best["neg_cid"]).cast("int").alias("cluster")
    ).localCheckpoint(eager=True)
    a = assigned.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = assigned.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_b",
            "vec_a",
            _cos_prenorm(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
    dropped = pairs.groupBy("vec_b").agg(F.min("vec_a").alias("dup_of"))
    return assigned.join(dropped, assigned.vec_id == dropped.vec_b, "left").select(
        "vec_id",
        "cluster",
        F.col("dup_of").isNull().alias("keep"),
        "dup_of",
    )


def semantic_dedup_trained_oracle_sql(
    threshold: float = 0.4, n_clusters: int = 8, n_iters: int = 2
) -> str:
    ctes, final = _kmeans_training_ctes(n_clusters, n_iters)
    cos_corpus = cosine_sql("e.embedding", "c.centroid")
    cos_ab = cosine_sql("a.embedding", "b.embedding")
    ctes.append(
        f"""corpus AS (
    SELECT vec_id, embedding, cluster FROM (
        SELECT e.vec_id, e.embedding, c.cid AS cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_corpus} DESC, c.cid) AS arank
        FROM embeddings e CROSS JOIN {final} c
    ) WHERE arank = 1
)"""
    )
    ctes.append(
        f"""pairs AS (
    SELECT b.vec_id AS vec_b, a.vec_id AS vec_a, {cos_ab} AS sim
    FROM corpus a JOIN corpus b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {cos_ab} >= {threshold}
)"""
    )
    ctes.append("dropped AS (SELECT vec_b, min(vec_a) AS dup_of FROM pairs GROUP BY vec_b)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT asg.vec_id, asg.cluster, d.vec_b IS NULL AS keep, d.dup_of
FROM corpus asg LEFT JOIN dropped d ON asg.vec_id = d.vec_b
"""
    )


def neardup_pairs(
    emb: DataFrame, threshold: float = 0.4, sample_hex: str | None = None
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    All-pairs here (the exact answer the blocked/LSH variants
    approximate); blocking keys (LSH bucket or IVF list) bound the
    quadratic term at scale. ``sample_hex`` bounds THIS operator the
    same way the exactness role allows: a deterministic md5-prefix slice
    of the corpus (b37 pattern, engine-reproducible, oracle-mirrored in
    neardup_oracle_sql) is paired exhaustively — the quadratic term is
    then (f*n)^2 for fraction f, a fixed budget knob, while the answer
    stays EXACT on the slice (so it still recall-gates the approximate
    variants on that slice). None = the full all-pairs baseline."""
    if sample_hex is not None:
        emb = emb.where(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, len(sample_hex))
            < sample_hex
        )
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            _cos_prenorm(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (identical math: double casts, sequential sums,
# round-then-rank)
# ---------------------------------------------------------------------------

_COS = """
round(
  list_sum(list_transform(range(len({a})), i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))
  / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 5)
"""


def cosine_sql(a: str, b: str) -> str:
    return _COS.format(a=a, b=b)


def brute_force_topk_oracle_sql(k: int = 5, query_modulus: int = 50) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {cos} AS score
    FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
    WHERE q.vec_id % {query_modulus} = 0
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def _bits_sql(emb: str, n_planes: int = N_HYPERPLANES) -> str:
    frags = []
    for j in range(n_planes):
        frags.append(
            "CASE WHEN list_sum(list_transform(range(len(%s)), i -> "
            "CAST(%s[i+1] AS DOUBLE) * (((i * 5 + %d) %% 13) - 6) / 6.0)) >= 0 "
            "THEN '1' ELSE '0' END" % (emb, emb, j * 11)
        )
    return " || ".join(frags)


def lsh_topk_oracle_sql(k: int = 3, query_modulus: int = 50) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
WITH bucketed AS (
    SELECT vec_id, embedding, {_bits_sql('embedding')} AS bucket
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {cos} AS score
    FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
    WHERE q.vec_id % {query_modulus} = 0
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def ivf_topk_oracle_sql(k: int = 3, query_modulus: int = 50) -> str:
    cos_qc = cosine_sql("q.embedding", "ct.centroid")
    cos_qv = cosine_sql("q2.query_emb", "e.embedding")
    return f"""
WITH pos AS (
    SELECT label, u.i AS pos, u.x AS v
    FROM embeddings, unnest(list_transform(embedding, (x, i) -> {{'i': i, 'x': x}})) AS t(u)
),
cent AS (
    SELECT label, list(CAST(c AS DOUBLE) ORDER BY pos) AS centroid
    FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS c FROM pos GROUP BY label, pos)
    GROUP BY label
),
assigned AS (
    SELECT query_id, query_emb, probe_label FROM (
        SELECT q.vec_id AS query_id, q.embedding AS query_emb, ct.label AS probe_label,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_qc} DESC, ct.label) AS crank
        FROM embeddings q CROSS JOIN cent ct
        WHERE q.vec_id % {query_modulus} = 0
    ) WHERE crank = 1
),
scored AS (
    SELECT q2.query_id, q2.probe_label, e.vec_id, {cos_qv} AS score
    FROM embeddings e JOIN assigned q2 ON e.label = q2.probe_label
    WHERE e.vec_id != q2.query_id
),
ranked AS (
    SELECT query_id, probe_label, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, CAST(probe_label AS INT) AS probe_label, vec_id, score,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def neardup_oracle_sql(threshold: float = 0.4, sample_hex: str | None = None) -> str:
    cos = cosine_sql("a.embedding", "b.embedding")
    src = "embeddings"
    if sample_hex is not None:
        src = (
            "(SELECT * FROM embeddings WHERE "
            f"substr(md5(CAST(vec_id AS VARCHAR)), 1, {len(sample_hex)}) < '{sample_hex}')"
        )
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos_sim
FROM {src} a JOIN {src} b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


def _table_bits(emb_sql: str, table: int, bits: int) -> Column:
    """Bucket key for LSH table ``table``: planes (table*bits + j).
    Generated-SQL build (see _plane_bits_sql)."""
    return F.expr(
        _plane_bits_sql(emb_sql, [table * bits + j for j in range(bits)])
    )


def lsh_multitable_topk(
    emb: DataFrame,
    k: int = 3,
    n_tables: int = 4,
    bits: int = 6,
    query_modulus: int = 50,
) -> DataFrame:
    """OR-amplified LSH: L independent hash tables of ``bits`` planes;
    a candidate competes if it shares ANY table's bucket with the query.
    Recall rises with L at linear candidate cost (the standard
    recall-tuning knob; x07 is the single-table AND-only form).

    Plan shape: ONE (table_id, bucket) equi-join — each side posexplodes
    its L buckets into (table_id, bucket) rows, so OR-amplification is a
    single hash join keyed on the composite instead of L joins + union
    (fewer stages, same candidate set), distinct, then exact cosine
    rank — still no cross join anywhere."""
    # with_buckets feeds BOTH explode sides and the exact-scoring join:
    # materialize it once (this IS the stored bucket index production
    # writes at ingest) instead of recomputing the n_tables*bits
    # hyperplane folds + norm per reference (idle A/B at sf0.1:
    # 1.80 -> 1.35s median). NO spread before the fold (r16, VERDICT r15
    # item 2): the r15 ensure_parallelism here was a measured LOSS in
    # both the builder's ledger (1.44 -> 1.80 s) and the driver's run —
    # the per-row bucket fold is too light to pay for a 32-way exchange,
    # and the checkpoint right after already bounds the recompute.
    with_buckets = emb.select(
        "vec_id",
        "embedding",
        l2_norm(F.col("embedding")).alias("cn"),
        *[_table_bits("embedding", t, bits).alias(f"b{t}") for t in range(n_tables)],
    ).localCheckpoint(eager=True)
    bucket_arr = F.array(*[F.col(f"b{t}") for t in range(n_tables)])
    c_exp = with_buckets.select(
        "vec_id", F.posexplode(bucket_arr).alias("t", "bkt")
    )
    q = with_buckets.where(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
        F.col("cn").alias("qn"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(n_tables)],
    )
    q_exp = q.select(
        "query_id",
        F.posexplode(F.array(*[F.col(f"qb{t}") for t in range(n_tables)])).alias(
            "qt", "qbkt"
        ),
    )
    pairs = (
        c_exp.join(
            q_exp, (F.col("t") == F.col("qt")) & (F.col("bkt") == F.col("qbkt"))
        )
        .select("query_id", "vec_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .distinct()
    )
    scored = (
        pairs.join(with_buckets.select("vec_id", "embedding", "cn"), "vec_id")
        .join(q.select("query_id", "query_emb", "qn"), "query_id")
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def lsh_multitable_topk_capped(
    emb: DataFrame,
    k: int = 3,
    n_tables: int = 4,
    bits: int = 6,
    query_modulus: int = 50,
    bucket_cap: int = 16,
) -> DataFrame:
    """x18's OR-amplified bucket join with the ADVERSARIAL-SKEW CAP: each
    (table, bucket) contributes at most ``bucket_cap`` corpus candidates
    (row_number over the bucket window, deterministic vec_id order).

    The same argument as x39's dedup cap applies to the ANN bucket
    equi-join: under the LSH collision model buckets are ~N/2^bits, but
    an adversarial (or merely degenerate — e.g. all-zero embeddings)
    corpus can put a large fraction of vectors in ONE bucket, making one
    join task O(hot * queries_in_bucket). The cap bounds every bucket's
    contribution to O(bucket_cap) candidates per query: the window sort
    is O(B log B) narrow rows — no quadratic join blowup — and the
    OR-amplification over L tables preserves recall for genuinely
    near-dup structure since hot-bucket members that get truncated in
    one table still collide in their other L-1 (less crowded) buckets.
    Recall under the cap is gated in tests/test_extensions.py; the cap
    itself is oracle-checked (x45)."""
    # with_buckets feeds BOTH explode sides and the exact-scoring join:
    # materialize it once (this IS the stored bucket index production
    # writes at ingest) instead of recomputing the n_tables*bits
    # hyperplane folds + norm per reference (idle A/B at sf0.1:
    # 1.80 -> 1.35s median). NO spread before the fold (r16, VERDICT r15
    # item 2): see lsh_multitable_topk — the r15 spread here measured as
    # a loss in both windows.
    with_buckets = emb.select(
        "vec_id",
        "embedding",
        l2_norm(F.col("embedding")).alias("cn"),
        *[_table_bits("embedding", t, bits).alias(f"b{t}") for t in range(n_tables)],
    ).localCheckpoint(eager=True)
    bucket_arr = F.array(*[F.col(f"b{t}") for t in range(n_tables)])
    wb = Window.partitionBy("t", "bkt").orderBy("vec_id")
    c_exp = (
        with_buckets.select("vec_id", F.posexplode(bucket_arr).alias("t", "bkt"))
        .withColumn("brank", F.row_number().over(wb))
        .where(F.col("brank") <= bucket_cap)
        .drop("brank")
    )
    q = with_buckets.where(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
        F.col("cn").alias("qn"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(n_tables)],
    )
    q_exp = q.select(
        "query_id",
        F.posexplode(F.array(*[F.col(f"qb{t}") for t in range(n_tables)])).alias(
            "qt", "qbkt"
        ),
    )
    pairs = (
        c_exp.join(q_exp, (F.col("t") == F.col("qt")) & (F.col("bkt") == F.col("qbkt")))
        .select("query_id", "vec_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .distinct()
    )
    scored = (
        pairs.join(with_buckets.select("vec_id", "embedding", "cn"), "vec_id")
        .join(q.select("query_id", "query_emb", "qn"), "query_id")
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _bits_sql_offset(emb: str, table: int, bits: int) -> str:
    frags = []
    for j in range(bits):
        frags.append(
            "CASE WHEN list_sum(list_transform(range(len(%s)), i -> "
            "CAST(%s[i+1] AS DOUBLE) * (((i * 5 + %d) %% 13) - 6) / 6.0)) >= 0 "
            "THEN '1' ELSE '0' END" % (emb, emb, (table * bits + j) * 11)
        )
    return " || ".join(frags)


def lsh_multitable_oracle_sql(
    k: int = 3, n_tables: int = 4, bits: int = 6, query_modulus: int = 50
) -> str:
    bucket_cols = ", ".join(
        f"{_bits_sql_offset('embedding', t, bits)} AS b{t}" for t in range(n_tables)
    )
    unions = "\nUNION\n".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS vec_id\n"
        f"    FROM bucketed q JOIN bucketed c ON q.b{t} = c.b{t} AND c.vec_id != q.vec_id\n"
        f"    WHERE q.vec_id % {query_modulus} = 0"
        for t in range(n_tables)
    )
    cos = cosine_sql("q2.embedding", "c2.embedding")
    return f"""
WITH bucketed AS (
    SELECT vec_id, embedding, {bucket_cols}
    FROM embeddings
),
pairs AS (
{unions}
),
scored AS (
    SELECT p.query_id, p.vec_id, {cos} AS score
    FROM pairs p
    JOIN bucketed q2 ON q2.vec_id = p.query_id
    JOIN bucketed c2 ON c2.vec_id = p.vec_id
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def lsh_multitable_capped_oracle_sql(
    k: int = 3,
    n_tables: int = 4,
    bits: int = 6,
    query_modulus: int = 50,
    bucket_cap: int = 16,
) -> str:
    """x18's oracle with the per-(table, bucket) corpus cap replayed as a
    row_number window — the cap itself is differential-checked."""
    bucket_cols = ", ".join(
        f"{_bits_sql_offset('embedding', t, bits)} AS b{t}" for t in range(n_tables)
    )
    unions = "\nUNION\n".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS vec_id\n"
        f"    FROM bucketed q JOIN (\n"
        f"        SELECT vec_id, b{t} FROM (\n"
        f"            SELECT vec_id, b{t},\n"
        f"                   row_number() OVER (PARTITION BY b{t} ORDER BY vec_id) AS brank\n"
        f"            FROM bucketed\n"
        f"        ) WHERE brank <= {bucket_cap}\n"
        f"    ) c ON q.b{t} = c.b{t} AND c.vec_id != q.vec_id\n"
        f"    WHERE q.vec_id % {query_modulus} = 0"
        for t in range(n_tables)
    )
    cos = cosine_sql("q2.embedding", "c2.embedding")
    return f"""
WITH bucketed AS (
    SELECT vec_id, embedding, {bucket_cols}
    FROM embeddings
),
pairs AS (
{unions}
),
scored AS (
    SELECT p.query_id, p.vec_id, {cos} AS score
    FROM pairs p
    JOIN bucketed q2 ON q2.vec_id = p.query_id
    JOIN bucketed c2 ON c2.vec_id = p.vec_id
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): cluster -> within-cluster near-dup drop
# ---------------------------------------------------------------------------


def assign_clusters(emb: DataFrame) -> DataFrame:
    """Assign every vector to its nearest (label-derived) centroid —
    broadcast the tiny centroid table, one narrow pass over the corpus.
    Round-then-rank on (csim DESC, label) keeps the argmax engine-stable."""
    cents = ivf_centroids(emb).select(F.col("label").alias("c_label"), "centroid")
    return (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "c_label",
            F.round(cosine(F.col("embedding"), F.col("centroid")), SCORE_SCALE).alias(
                "csim"
            ),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "c_label")
            ),
        )
        .where(F.col("crank") == 1)
        .select("vec_id", "embedding", F.col("c_label").alias("cluster"))
    )


def semantic_dedup(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """SemDeDup-style semantic deduplication: route vectors to clusters
    (assign_clusters), then drop any vector with a LOWER-id cluster-mate
    whose cosine >= threshold (keepers = vectors with no lower-id
    near-dup; `dup_of` = the smallest such mate, NULL for keepers).

    `dup_of` is an attribution hint, not a cluster representative: when
    similarity is non-transitive (a~b, b~c, a!~c), c is dropped with
    dup_of=b even though b itself was dropped (toward a). This single-pass
    rule is deliberate — resolving chains to a keeper would be an
    iterative fixpoint (that path exists: dedup_clusters' connected
    components). Pinned by tests/test_extensions.py (non-transitive
    chain).

    Scale shape: the pair join is an equi-join on `cluster`, so the
    quadratic term is bounded per cluster — at 100 TB you raise the
    centroid count so clusters stay small; the corpus is never
    cross-joined globally."""
    # assigned feeds both pair-join sides and the final attribution
    # join: materialize the (cluster, vec_id, embedding) routing once
    # instead of re-running the assignment per reference
    assigned = assign_clusters(emb).localCheckpoint(eager=True)
    a = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_b",
            "vec_a",
            _cos_prenorm(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias(
                "sim"
            ),
        )
        .where(F.col("sim") >= threshold)
    )
    dropped = pairs.groupBy("vec_b").agg(F.min("vec_a").alias("dup_of"))
    return (
        assigned.join(dropped, assigned.vec_id == dropped.vec_b, "left")
        .select(
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def semantic_dedup_oracle_sql(threshold: float = 0.4) -> str:
    cos_ec = cosine_sql("e.embedding", "ct.centroid")
    cos_ab = cosine_sql("a.embedding", "b.embedding")
    return f"""
WITH pos AS (
    SELECT label, u.i AS pos, u.x AS v
    FROM embeddings, unnest(list_transform(embedding, (x, i) -> {{'i': i, 'x': x}})) AS t(u)
),
cent AS (
    SELECT label, list(CAST(c AS DOUBLE) ORDER BY pos) AS centroid
    FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS c FROM pos GROUP BY label, pos)
    GROUP BY label
),
assigned AS (
    SELECT vec_id, embedding, cluster FROM (
        SELECT e.vec_id, e.embedding, ct.label AS cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, ct.label) AS crank
        FROM embeddings e CROSS JOIN cent ct
    ) WHERE crank = 1
),
pairs AS (
    SELECT b.vec_id AS vec_b, a.vec_id AS vec_a, {cos_ab} AS sim
    FROM assigned a JOIN assigned b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {cos_ab} >= {threshold}
),
dropped AS (SELECT vec_b, min(vec_a) AS dup_of FROM pairs GROUP BY vec_b)
SELECT asg.vec_id, CAST(asg.cluster AS INT) AS cluster,
       d.vec_b IS NULL AS keep, d.dup_of
FROM assigned asg LEFT JOIN dropped d ON asg.vec_id = d.vec_b
"""


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ) — the canonical 100 TB ANN layout
# (Jegou et al. 2011, "Product Quantization for Nearest Neighbor Search";
# the FAISS IVFPQ index structure). Coarse k-means routes vectors to
# inverted lists; within a list, candidates are scored by Asymmetric
# Distance Computation (ADC) against M per-subspace codebooks — M table
# lookups per pair instead of a D-dim dot product — then the survivors
# are reranked with the exact metric.
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces (64-dim embedding -> 4 x 16-dim sub-vectors)
PQ_K = 8  # codes per subspace codebook


def _sub(col: Column, m: int, sub_dim: int) -> Column:
    """Sub-vector m of an embedding column (1-based slice, length sub_dim)."""
    return F.slice(col, m * sub_dim + 1, sub_dim)


def _sql_l2sq(sub: str, code_vec: list[float]) -> str:
    """Squared L2 distance of a sub-vector to a LITERAL code vector —
    sequential left fold in double, mirroring the oracle's list_sum
    (SQL-text twin of the former _l2sq_lit Column builder)."""
    return (
        f"aggregate(zip_with({sub}, {_sql_arr(code_vec)}, "
        "(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _pq_code_for(sub_sql: str, codebook: list[list[float]]) -> Column:
    """Nearest code id in a LITERAL codebook by ROUNDED squared-L2
    (tie -> lowest code id): array_max over (-round(d2), -code) structs —
    the same projection-only argmin trick as _centroid_candidates.
    ``sub_sql`` is the sub-vector's SQL text (generated-SQL build)."""
    structs = ",".join(
        f"named_struct('nd2', -round({_sql_l2sq(sub_sql, c)}, {SCORE_SCALE}), "
        f"'neg_code', {-j})"
        for j, c in enumerate(codebook)
    )
    return F.expr(f"CAST(-(array_max(array({structs})).neg_code) AS INT)")


def pq_codebooks(
    emb: DataFrame,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    n_iters: int = 1,
    prepared: bool = False,
) -> list[list[list[float]]]:
    """Train M per-subspace PQ codebooks with ``n_iters`` deterministic
    Lloyd iterations (init = sub-vectors of the k_codes smallest vec_ids;
    assignment by rounded squared-L2, tie -> lowest code; empty codes
    keep their previous vector) — the product-quantizer half of IVF-PQ.

    Scale shape: ALL M subspaces train in ONE corpus scan per iteration —
    each row projects its per-subspace code (literal-codebook argmin, no
    join), flattens M sub-vectors into (m, code, pos, v) structs, and one
    explode + groupBy(m, code, pos) computes every positional mean with
    map-side combine (<= M*K*sub_dim partial rows per task). Codebooks
    are M*K*sub_dim doubles = driver-sized by definition, so they inline
    as literals, exactly like kmeans_centroids. At 100 TB you would train
    on a sample; the full-corpus pass here keeps the DuckDB oracle an
    exact replay. Returns books[m][code] = list of sub_dim floats."""
    # training-scoped spread+cache, caller-owned when prepared=True and
    # released in a finally (see kmeans_centroids for the full rationale)
    if not prepared:
        emb = ensure_parallelism(emb, "vec_id").persist()
    try:
        books = _pq_codebooks_loop(emb, m_sub, k_codes, n_iters)
    finally:
        if not prepared:
            emb.unpersist()
    return books


def _pq_codebooks_loop(
    emb: DataFrame, m_sub: int, k_codes: int, n_iters: int
) -> list[list[list[float]]]:
    seeds = emb.select("vec_id", "embedding").orderBy("vec_id").limit(k_codes).collect()
    vecs = [
        [float(x) for x in r["embedding"]]
        for r in sorted(seeds, key=lambda r: r["vec_id"])
    ]
    dim = len(vecs[0]) if vecs else 0
    sub_dim = dim // m_sub
    books = [
        [v[m * sub_dim : (m + 1) * sub_dim] for v in vecs] for m in range(m_sub)
    ]
    for _ in range(n_iters):
        # codes in their OWN select before the generator (see the analyzer
        # caveat in kmeans_centroids)
        coded = emb.select(
            "embedding",
            *[
                _pq_code_for(_sql_sub("embedding", m, sub_dim), books[m]).alias(
                    f"code_{m}"
                )
                for m in range(m_sub)
            ],
        )
        def _part_structs(m: int) -> Column:
            # closure factory, NOT a default-arg lambda: pyspark introspects
            # the lambda's parameter count, and a bound default would make
            # the 2-arg (x, i) transform look 3-ary
            return F.transform(
                _sub(F.col("embedding"), m, sub_dim),
                lambda x, i: F.struct(
                    F.lit(m).alias("m"),
                    F.col(f"code_{m}").alias("code"),
                    i.alias("pos"),
                    x.cast("double").alias("v"),
                ),
            )

        parts = F.flatten(F.array(*[_part_structs(m) for m in range(m_sub)]))
        rows = (
            coded.select(F.explode(parts).alias("t"))
            .groupBy(
                F.col("t.m").alias("m"),
                F.col("t.code").alias("code"),
                F.col("t.pos").alias("pos"),
            )
            .agg(F.avg("t.v").alias("c"))
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            by_key.setdefault((r["m"], r["code"]), {})[r["pos"]] = r["c"]
        books = [
            [
                [by_key[(m, j)][p] for p in range(sub_dim)]
                if (m, j) in by_key
                else books[m][j]
                for j in range(k_codes)
            ]
            for m in range(m_sub)
        ]
    return books


def ivfpq_topk(
    emb: DataFrame,
    k: int = 3,
    n_probes: int = 2,
    n_clusters: int = 8,
    n_iters: int = 2,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    pq_iters: int = 1,
    rerank: int = 20,
    query_modulus: int = 50,
) -> DataFrame:
    """IVF-PQ ANN: coarse k-means routing (x44's trained inverted lists)
    + per-list ADC scoring against trained PQ codebooks + exact rerank of
    the top ``rerank`` ADC candidates.

    Plan shape — the part that matters at 100 TB:
    - encode: ONE corpus projection adds the coarse cid and the M code
      ids (all literal-codebook argmins — no join, no shuffle). At scale
      this projection is written once at ingest; the stored index is
      (cid, M bytes) per vector, a ~64x compression of the scan the ANN
      pays, and the original embedding is only fetched for the rerank
      shortlist.
    - search: each query precomputes its M x K lookup table ONCE on the
      broadcast probe side; per (query, candidate) pair the ADC score is
      M element_at lookups + 3 adds — no D-dim arithmetic touches the
      corpus rows until the <= ``rerank``-per-query exact pass.
    - both windows partition by query_id, so the only corpus-side
      shuffle is candidate-sized (probed lists), never corpus-sized.

    Deterministic end to end (rounded scores, vec_id tiebreaks), so the
    DuckDB oracle replays coarse training, PQ training, encoding, ADC
    and rerank exactly (ivfpq_oracle_sql)."""
    # coarse k-means and PQ codebook training are INDEPENDENT reads of
    # the same input — run their action chains concurrently (Spark
    # schedules concurrent jobs fine; ~2x faster wall-clock training at
    # bench scale, same deterministic results since neither mutates
    # shared state). ONE shared spread+persist, prepared here and
    # released here (r15 ADVICE: per-trainer persists of the identical
    # plan share a single CacheManager entry, so the first trainer to
    # finish would unpersist it mid-training for the other).
    from concurrent.futures import ThreadPoolExecutor

    spread = ensure_parallelism(emb, "vec_id")
    train_emb = spread.persist()
    try:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_cents = pool.submit(
                kmeans_centroids,
                train_emb,
                n_clusters=n_clusters,
                n_iters=n_iters,
                prepared=True,
            )
            f_books = pool.submit(
                pq_codebooks,
                train_emb,
                m_sub=m_sub,
                k_codes=k_codes,
                n_iters=pq_iters,
                prepared=True,
            )
            cents, books = f_cents.result(), f_books.result()
    finally:
        train_emb.unpersist()
    emb = spread  # keep the spread for encode; the cache itself is released
    corpus = ivfpq_encode(emb, cents, books)
    return ivfpq_search(
        corpus, emb, cents, books, k=k, n_probes=n_probes,
        rerank=rerank, query_modulus=query_modulus,
    )


def ivfpq_encode(
    emb: DataFrame, cents: list[list[float]], books: list[list[list[float]]]
) -> DataFrame:
    """The write-once-at-ingest half of IVF-PQ: project each vector's
    coarse cid and M code ids against LITERAL codebooks — no join, no
    shuffle. Persist this partitioned BY cid and the probe filter prunes
    whole inverted-list partitions at the scan
    (tests/test_extensions.py::test_ivfpq_encoded_index_partition_pruning
    proves the pruning and that a search over the stored index equals
    the recomputed plan)."""
    m_sub = len(books)
    sub_dim = len(books[0][0])
    best = F.array_max(_centroid_candidates("embedding", cents))
    return emb.select(
        "vec_id",
        "embedding",
        (-best["neg_cid"]).cast("int").alias("cid"),
        *[
            _pq_code_for(_sql_sub("embedding", m, sub_dim), books[m]).alias(
                f"code_{m}"
            )
            for m in range(m_sub)
        ],
    )


def ivfpq_search(
    corpus: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    books: list[list[list[float]]],
    k: int = 3,
    n_probes: int = 2,
    rerank: int = 20,
    query_modulus: int = 50,
) -> DataFrame:
    """The query half of IVF-PQ over an (optionally persisted) encoded
    corpus: probe selection, per-query LUT build on the broadcast side,
    ADC shortlist, exact rerank. ``corpus`` needs (vec_id, embedding,
    cid, code_0..code_{M-1}) — the ivfpq_encode layout, live or read
    back from storage."""
    m_sub = len(books)
    k_codes = len(books[0])
    sub_dim = len(books[0][0])
    corpus = corpus.withColumn("cn", l2_norm(F.col("embedding")))
    probe_structs = F.slice(
        F.reverse(F.array_sort(_centroid_candidates("embedding", cents))),
        1,
        n_probes,
    )
    # one parsed SQL expression for the whole M x K ADC lookup table —
    # see the generated-SQL builder note above _sql_arr
    lut = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                f"round({_sql_dot(_sql_sub('embedding', m, sub_dim), _sql_arr(books[m][j]))}, "
                f"{SCORE_SCALE})"
                for j in range(k_codes)
            )
            + ")"
            for m in range(m_sub)
        )
        + ")"
    )
    probes = (
        queries.where(F.col("vec_id") % query_modulus == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_emb"),
            l2_norm(F.col("embedding")).alias("qn"),
            lut.alias("lut"),
            F.explode(probe_structs).alias("p"),
        )
        .select(
            "query_id",
            "query_emb",
            "qn",
            "lut",
            (-F.col("p.neg_cid")).cast("int").alias("probe_cid"),
        )
    )
    adc = F.round(
        sum(
            (
                F.element_at(F.element_at(F.col("lut"), m + 1), F.col(f"code_{m}") + 1)
                for m in range(1, m_sub)
            ),
            F.element_at(F.element_at(F.col("lut"), 1), F.col("code_0") + 1),
        ),
        SCORE_SCALE,
    )
    cands = (
        corpus.join(F.broadcast(probes), corpus.cid == probes.probe_cid)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            "cn",
            "query_emb",
            "qn",
            adc.alias("adc"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("vec_id"))
    shortlist = (
        cands.withColumn("crank", F.row_number().over(w1))
        .where(F.col("crank") <= rerank)
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        shortlist.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _pq_training_ctes(
    m_sub: int, k_codes: int, n_iters: int, sub_dim: int
) -> tuple[list[str], str]:
    """The PQ-training CTE chain: pq_seeds -> cb_0 -> (pq_assign_i, cb_i)*
    — the SQL replay of pq_codebooks, iteration by iteration."""
    sd = sub_dim
    ms = f"(SELECT CAST(unnest(range({m_sub})) AS INT) AS m) ms"
    ctes = [
        f"pq_seeds AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k_codes})",
        f"""cb_0 AS (
    SELECT ms.m,
           CAST(row_number() OVER (PARTITION BY ms.m ORDER BY s.vec_id) - 1 AS INT) AS code,
           list_transform(list_slice(s.embedding, ms.m*{sd}+1, ms.m*{sd}+{sd}),
                          x -> CAST(x AS DOUBLE)) AS cvec
    FROM pq_seeds s CROSS JOIN {ms}
)""",
    ]
    d2 = (
        f"round(list_sum(list_transform(range({sd}), "
        f"j -> (s.sub[j+1] - c.cvec[j+1]) * (s.sub[j+1] - c.cvec[j+1]))), {SCORE_SCALE})"
    )
    for it in range(1, n_iters + 1):
        prev = f"cb_{it - 1}"
        ctes.append(
            f"""pq_assign_{it} AS (
    SELECT vec_id, m, code, sub FROM (
        SELECT s.vec_id, s.m, c.code, s.sub,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY {d2}, c.code) AS arank
        FROM (
            SELECT e.vec_id, ms.m,
                   list_transform(list_slice(e.embedding, ms.m*{sd}+1, ms.m*{sd}+{sd}),
                                  x -> CAST(x AS DOUBLE)) AS sub
            FROM embeddings e CROSS JOIN {ms}
        ) s JOIN {prev} c ON c.m = s.m
    ) WHERE arank = 1
)"""
        )
        ctes.append(
            f"""cb_{it} AS (
    SELECT p.m, p.code, coalesce(n.cvec, p.cvec) AS cvec
    FROM {prev} p LEFT JOIN (
        SELECT m, code, list(c ORDER BY pos) AS cvec
        FROM (
            SELECT a.m, a.code, u.i AS pos, avg(u.x) AS c
            FROM pq_assign_{it} a,
                 unnest(list_transform(a.sub, (x, i) -> {{'i': i, 'x': x}})) AS t(u)
            GROUP BY a.m, a.code, u.i
        ) GROUP BY m, code
    ) n ON n.m = p.m AND n.code = p.code
)"""
        )
    return ctes, f"cb_{n_iters}"


def ivfpq_oracle_sql(
    k: int = 3,
    n_probes: int = 2,
    n_clusters: int = 8,
    n_iters: int = 2,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    pq_iters: int = 1,
    rerank: int = 20,
    query_modulus: int = 50,
    dim: int = 64,
) -> str:
    """DuckDB replay of the ENTIRE IVF-PQ pipeline: coarse k-means
    training, PQ codebook training, corpus encoding, probe selection,
    LUT build, ADC scoring, shortlist and exact rerank — so every stage
    of the index, not just the final ranking, is differential-checked."""
    sd = dim // m_sub
    ms = f"(SELECT CAST(unnest(range({m_sub})) AS INT) AS m) ms"
    ctes, cent_final = _kmeans_training_ctes(n_clusters, n_iters)
    pq_ctes, cb_final = _pq_training_ctes(m_sub, k_codes, pq_iters, sd)
    ctes.extend(pq_ctes)
    d2 = (
        f"round(list_sum(list_transform(range({sd}), "
        f"j -> (s.sub[j+1] - c.cvec[j+1]) * (s.sub[j+1] - c.cvec[j+1]))), {SCORE_SCALE})"
    )
    ctes.append(
        f"""pq_codes AS MATERIALIZED (
    SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, c.code,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY {d2}, c.code) AS arank
        FROM (
            SELECT e.vec_id, ms.m,
                   list_transform(list_slice(e.embedding, ms.m*{sd}+1, ms.m*{sd}+{sd}),
                                  x -> CAST(x AS DOUBLE)) AS sub
            FROM embeddings e CROSS JOIN {ms}
        ) s JOIN {cb_final} c ON c.m = s.m
    ) WHERE arank = 1
)"""
    )
    cos_corpus = cosine_sql("e.embedding", "c.centroid")
    cos_query = cosine_sql("q.embedding", "c.centroid")
    ctes.append(
        f"""corpus AS MATERIALIZED (
    SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_corpus} DESC, c.cid) AS arank
        FROM embeddings e CROSS JOIN {cent_final} c
    ) WHERE arank = 1
)"""
    )
    ctes.append(
        f"""probes AS MATERIALIZED (
    SELECT query_id, probe_cid FROM (
        SELECT q.vec_id AS query_id, c.cid AS probe_cid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos_query} DESC, c.cid) AS crank
        FROM embeddings q CROSS JOIN {cent_final} c
        WHERE q.vec_id % {query_modulus} = 0
    ) WHERE crank <= {n_probes}
)"""
    )
    ctes.append(
        f"""lut AS MATERIALIZED (
    SELECT q.vec_id AS query_id, c.m, c.code,
           round(list_sum(list_transform(range({sd}),
               j -> CAST(list_slice(q.embedding, c.m*{sd}+1, c.m*{sd}+{sd})[j+1] AS DOUBLE)
                    * c.cvec[j+1])), {SCORE_SCALE}) AS v
    FROM embeddings q CROSS JOIN {cb_final} c
    WHERE q.vec_id % {query_modulus} = 0
)"""
    )
    code_joins = "\n    ".join(
        f"JOIN pq_codes c{m} ON c{m}.vec_id = e.vec_id AND c{m}.m = {m}\n"
        f"    JOIN lut l{m} ON l{m}.query_id = p.query_id AND l{m}.m = {m} AND l{m}.code = c{m}.code"
        for m in range(m_sub)
    )
    adc_sum = " + ".join(f"l{m}.v" for m in range(m_sub))
    ctes.append(
        f"""adc_scored AS (
    SELECT p.query_id, e.vec_id, e.embedding, round({adc_sum}, {SCORE_SCALE}) AS adc
    FROM corpus e
    JOIN probes p ON e.cid = p.probe_cid AND e.vec_id != p.query_id
    {code_joins}
)"""
    )
    ctes.append(
        f"""shortlist AS (
    SELECT query_id, vec_id, embedding FROM (
        SELECT query_id, vec_id, embedding,
               row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS crank
        FROM adc_scored
    ) WHERE crank <= {rerank}
)"""
    )
    cos_rerank = cosine_sql("q.embedding", "s.embedding")
    ctes.append(
        f"""rescored AS (
    SELECT s.query_id, s.vec_id, {cos_rerank} AS score
    FROM shortlist s JOIN embeddings q ON q.vec_id = s.query_id
)"""
    )
    ctes.append(
        """ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM rescored
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
    )


# ---------------------------------------------------------------------------
# Random-projection (Johnson-Lindenstrauss) dimensionality reduction —
# Achlioptas 2003 "Database-friendly random projections": a +/-1 sign
# matrix preserves pairwise distances in expectation, needs no floats to
# store, and (with a deterministic integer sign formula) is exactly
# replayable in SQL. The 100 TB use: project 64-dim embeddings to 16
# dims ONCE at ingest (4x smaller ANN scan + 4x cheaper pair dot
# products), shortlist in projected space, rerank survivors exactly.
# ---------------------------------------------------------------------------

RP_OUT_DIM = 16


def rp_project(emb_sql: str, out_dim: int = RP_OUT_DIM) -> Column:
    """Project an embedding onto ``out_dim`` +/-1 sign rows — a pure
    per-row projection (no join, no shuffle, input dim discovered at
    runtime). Sign(i, j) is a quadratic integer hash mod 103 (full-rank,
    near-balanced — numerically validated in tests against
    column-correlation degeneracy). JL scaling constants are dropped:
    cosine is scale-invariant. Generated-SQL build (one F.expr parse
    instead of out_dim*2 py4j HOF constructions — see _sql_arr note)."""
    dims = []
    for j in range(out_dim):
        sign = (
            f"CASE WHEN (i * i * 3 + {j * j * 7} + i * {j * 5} + i * 11 + {j * 13}) "
            "% 103 < 51 THEN 1.0D ELSE -1.0D END"
        )
        dims.append(
            f"aggregate(zip_with({emb_sql}, sequence(0, size({emb_sql}) - 1), "
            f"(x, i) -> CAST(x AS DOUBLE) * ({sign})), 0.0D, (acc, x) -> acc + x)"
        )
    return F.expr("array(" + ", ".join(dims) + ")")


def rp_ann_topk(
    emb: DataFrame,
    k: int = 3,
    out_dim: int = RP_OUT_DIM,
    shortlist: int = 20,
    query_modulus: int = 50,
) -> DataFrame:
    """ANN via random-projection shortlist + exact rerank: pairs are
    scored with the ``out_dim``-dim projected cosine (4x cheaper than
    the 64-dim dot, and at scale the scan reads the 4x-smaller
    projected column instead of the original), the top ``shortlist``
    per query advance, and only those pay the exact cosine. Like x06
    this baseline still enumerates O(Q*N) pairs — the projection cuts
    the per-pair and scan cost, not the pair count; compose with
    IVF/LSH routing (x48/x18) for the full 100 TB path. Deterministic
    sign matrix => the DuckDB oracle replays projection, shortlist and
    rerank exactly."""
    corpus = emb.select(
        "vec_id",
        "embedding",
        l2_norm(F.col("embedding")).alias("cn"),
        rp_project("embedding", out_dim).alias("rp"),
    ).withColumn("rpn", l2_norm(F.col("rp")))
    q = corpus.where(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
        F.col("cn").alias("qn"),
        F.col("rp").alias("qrp"),
        F.col("rpn").alias("qrpn"),
    )
    pairs = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "embedding",
            "cn",
            "query_emb",
            "qn",
            _cos_prenorm(
                F.col("qrp"), F.col("rp"), F.col("qrpn"), F.col("rpn")
            ).alias("rp_score"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("rp_score").desc(), F.col("vec_id"))
    shortlisted = (
        pairs.withColumn("crank", F.row_number().over(w1))
        .where(F.col("crank") <= shortlist)
        .select(
            "query_id",
            "vec_id",
            _cos_prenorm(
                F.col("query_emb"), F.col("embedding"), F.col("qn"), F.col("cn")
            ).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        shortlisted.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def _rp_sql(emb: str, out_dim: int = RP_OUT_DIM) -> str:
    """SQL replay of rp_project: one summed sign-weighted fold per
    output dim."""
    dims = []
    for j in range(out_dim):
        sign = (
            f"(CASE WHEN ((i*i*3 + {j*j*7} + i*{j*5} + i*11 + {j*13}) % 103) < 51 "
            "THEN 1.0 ELSE -1.0 END)"
        )
        dims.append(
            f"list_sum(list_transform(range(len({emb})), "
            f"i -> CAST({emb}[i+1] AS DOUBLE) * {sign}))"
        )
    return "list_value(" + ", ".join(dims) + ")"


def rp_ann_oracle_sql(
    k: int = 3,
    out_dim: int = RP_OUT_DIM,
    shortlist: int = 20,
    query_modulus: int = 50,
) -> str:
    cos_rp = cosine_sql("q.rp", "c.rp")
    cos_exact = cosine_sql("qe.embedding", "s.embedding")
    return f"""
WITH proj AS MATERIALIZED (
    SELECT vec_id, embedding, {_rp_sql('embedding', out_dim)} AS rp FROM embeddings
),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.embedding, {cos_rp} AS rp_score
    FROM proj q JOIN proj c ON c.vec_id != q.vec_id
    WHERE q.vec_id % {query_modulus} = 0
),
shortlisted AS (
    SELECT query_id, vec_id, embedding FROM (
        SELECT query_id, vec_id, embedding,
               row_number() OVER (PARTITION BY query_id ORDER BY rp_score DESC, vec_id) AS crank
        FROM pairs
    ) WHERE crank <= {shortlist}
),
rescored AS (
    SELECT s.query_id, s.vec_id, {cos_exact} AS score
    FROM shortlisted s JOIN embeddings qe ON qe.vec_id = s.query_id
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
    FROM rescored
)
SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# INT8 embedding quantization (x123) — the embedding-storage compression
# path: symmetric per-vector scale quantization + reconstruction report
# ---------------------------------------------------------------------------


def embedding_quantization(
    embeddings: DataFrame, emb_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector INT8 quantization report — the standard
    4x embedding-storage compression (scale = max|v|/127,
    q = floor(v/scale + 0.5) clamped to [-127, 127]) with its
    reconstruction-error audit: per vector the scale, the L2 and max
    reconstruction errors, and the count of saturated lanes. This is
    the decide-before-you-compress query a 100 TB embedding store runs
    (PQ — x48 — is the aggressive follow-on; INT8 is the lossless-ish
    first step).

    Parity: rounding is written as floor(x + 0.5) in BOTH engines —
    Spark's HALF_UP and DuckDB's nearest-even disagree on exact .5
    lanes, floor does not; element folds run in identical array order
    (F.aggregate == list_sum over list_transform, both sequential), so
    errors are bit-identical before the final 6-dp round. Vectors with
    any non-finite lane are skipped (the x109 validity discipline);
    all-zero vectors quantize to zeros with error 0.

    One scan, zero exchanges — pure per-row array math, codegen'd."""
    v = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    finite = F.forall(
        F.col(emb_col),
        lambda x: x.isNotNull()
        & ~F.isnan(x.cast("double"))
        & (F.abs(x.cast("double")) != F.lit(float("inf"))),
    )
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0.0)).otherwise(
            F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0), F.floor(x / scale + F.lit(0.5)).cast("double")),
            )
        ),
    )
    err = F.zip_with(v, q, lambda a, b: a - b * scale)
    l2_err = F.sqrt(
        F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e)
    )
    max_abs_err = F.array_max(F.transform(err, F.abs))
    n_sat = F.size(F.filter(q, lambda x: F.abs(x) == 127.0))
    return (
        embeddings.where(F.col(emb_col).isNotNull() & finite)
        .select(
            "vec_id",
            F.size(F.col(emb_col)).cast("long").alias("dim"),
            F.round(scale, 6).alias("scale"),
            F.round(l2_err, 6).alias("l2_err"),
            F.round(max_abs_err, 6).alias("max_abs_err"),
            n_sat.cast("long").alias("n_saturated"),
        )
    )


def embedding_quantization_oracle_sql(emb_col: str = "embedding") -> str:
    """DuckDB replay of embedding_quantization: identical floor(x+0.5)
    rounding, identical sequential array folds, same 6-dp rounds."""
    return f"""
WITH base AS (
    SELECT vec_id,
           list_transform({emb_col}, x -> x::DOUBLE) AS v
    FROM embeddings
    WHERE {emb_col} IS NOT NULL
      AND len(list_filter({emb_col}, x -> x IS NULL OR isnan(x::DOUBLE) OR isinf(x::DOUBLE))) = 0
),
s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM base
),
qd AS (
    SELECT vec_id, v, scale,
           list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
               ELSE greatest(-127.0, least(127.0, floor(x / scale + 0.5)))
               END) AS q
    FROM s
),
e AS (
    SELECT vec_id, scale, q,
           list_transform(list_zip(v, q),
                          p -> p[1] - p[2] * scale) AS err,
           len(v) AS dim
    FROM qd
)
SELECT vec_id, CAST(dim AS BIGINT) AS dim,
       round(scale, 6) AS scale,
       round(sqrt(list_sum(list_transform(err, x -> x * x))), 6) AS l2_err,
       round(list_max(list_transform(err, x -> abs(x))), 6) AS max_abs_err,
       CAST(len(list_filter(q, x -> abs(x) = 127.0)) AS BIGINT) AS n_saturated
FROM e
"""
