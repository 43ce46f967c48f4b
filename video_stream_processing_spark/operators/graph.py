"""Reusable graph algorithms over edge-list DataFrames.

Each operator takes a SYMMETRIC edge list — a DataFrame with (src, dst)
columns containing both directions of every undirected edge — so a user
can run them on any graph (co-purchase, citation, near-dup adjacency),
not just the built-in query fixtures. All algorithms follow the
iterative-lineage discipline proven on x15: materialize the edge base
ONCE with an eager localCheckpoint, keep per-iteration work a keyed
equi-join + aggregate, and keep the per-round frames |V|-sized.

Determinism: PageRank uses fixed-point integer micro-units with floor
division (order-independent sums — engine- and run-exact); triangle and
k-core arithmetic is integer throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pagerank_fixedpoint",
    "oriented_triangle_count",
    "kcore_peel",
    "connected_components",
]


def pagerank_fixedpoint(
    edges: DataFrame, iters: int = 3, seeds: DataFrame | None = None
) -> DataFrame:
    """Damped PageRank (d=0.85) in scaled integer arithmetic.

    Uniform mode (seeds=None): every node starts with 1e6 micro-units
    and keeps 0.15e6 restart mass per iteration. Personalized mode
    (``seeds`` = DataFrame with a ``node`` column): only seed nodes
    start with mass and receive the restart — the result ranks the
    graph BY PROXIMITY TO THE SEEDS (the related-items/recommendation
    form of PageRank). Either way each node also receives
    floor(rank_u * 85 / (100 * deg_u)) from each in-neighbor.
    Returns (node, pr_mass).

    The degree is a count-over-src window on the edge list (one
    shuffle, no join), checkpointed once; iterations stay lazy on that
    flat base — the plan tree grows linearly with ``iters``. Measured
    at sf0.1: one eager checkpoint beats per-round checkpointing 2x
    (SCALE.md "Graph mining")."""
    e2 = edges.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).localCheckpoint(eager=True)
    if seeds is None:
        # Uniform restart: every node receives inflow in a symmetric
        # graph, so the iteration needs NO node-table join at all.
        r = e2.select(F.col("src").alias("node")).distinct().withColumn(
            "rank", F.lit(1000000).cast("long")
        )
        for _ in range(iters):
            r = (
                e2.join(r, e2.src == r.node)
                .select("dst", F.expr("(rank * 85) div (100 * deg)").alias("contrib"))
                .groupBy("dst")
                .agg((F.lit(150000) + F.sum("contrib")).cast("long").alias("rank"))
                .select(F.col("dst").alias("node"), "rank")
            )
        return r.select("node", F.col("rank").alias("pr_mass"))
    # Personalized: nodes with zero inflow must still surface with their
    # (zero) restart, so iterations right-join the checkpointed node
    # table carrying each node's restart mass.
    seed_flag = seeds.select(F.col("node"), F.lit(True).alias("is_seed")).distinct()
    nodes = (
        e2.select(F.col("src").alias("node"))
        .distinct()
        .join(F.broadcast(seed_flag), "node", "left")
        .select(
            "node",
            F.when(F.col("is_seed"), 150000).otherwise(0).cast("long").alias("restart"),
        )
        .localCheckpoint(eager=True)
    )
    r = nodes.select(
        "node",
        F.when(F.col("restart") > 0, 1000000).otherwise(0).cast("long").alias("rank"),
    )
    for _ in range(iters):
        r = (
            e2.join(r, e2.src == r.node)
            .select("dst", F.expr("(rank * 85) div (100 * deg)").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
            .join(nodes, F.col("dst") == nodes.node, "right")
            .select(
                "node",
                (F.col("restart") + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
    return r.select("node", F.col("rank").alias("pr_mass"))


def oriented_triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count via degree orientation; returns one row
    (n_triangles).

    Each undirected edge is oriented from its lexicographically-smaller
    (degree, node) endpoint to the larger, so per-node wedge fan-out is
    O(sqrt(m)) regardless of degree skew (a hub's edges point INTO it —
    it spawns no wedges); wedges close iff the oriented (b, c) edge
    exists. Total work is the optimal O(m^1.5), all keyed hash joins."""
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    d1 = deg.select(F.col("node").alias("src"), F.col("deg").alias("ds"))
    d2 = deg.select(F.col("node").alias("dst"), F.col("deg").alias("dd"))
    o = (
        edges.join(d1, "src")
        .join(d2, "dst")
        .where(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("s"), F.col("dst").alias("d"), "dd")
        .localCheckpoint(eager=True)
    )
    a = o.select(F.col("s"), F.col("d").alias("b"), F.col("dd").alias("db"))
    c = o.select(F.col("s"), F.col("d").alias("c"), F.col("dd").alias("dc"))
    wedges = a.join(c, "s").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("s").alias("b"), F.col("d").alias("c"))
    return wedges.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def kcore_peel(
    edges: DataFrame, k: int, rounds: int, return_rounds: bool = False
):
    """Bounded-round k-core peeling; returns (node, core_deg) for nodes
    surviving ``rounds`` peels, with their degree inside the surviving
    subgraph. ``edges`` must be a SYMMETRIZED edge list (every (a, b)
    also present as (b, a), as connected_components requires) — round 1
    counts raw per-src degrees with no dst semi-join, which equals the
    alive-subgraph degree only when every dst also appears as a src.

    Each round drops every node whose degree within the alive subgraph
    is below k, then SHRINKS the materialized edge table to the
    surviving subgraph (r10: a peeled node can never re-enter, so
    carrying its edges into later rounds only inflates every subsequent
    join — round 1 is a plain degree prune over the raw edges, no
    semi-joins at all). Alive sets per round are IDENTICAL to the
    unshrunk formulation on symmetric input — dead edges can only touch
    dead nodes — so results are unchanged; only the work per round
    drops. The exact core is the fixpoint, approached monotonically
    from above — wrap with x15's probe-bounded loop to run to
    convergence.

    r15 round shape (profiled): the alive set is never materialized —
    each round annotates the edge table with BOTH endpoint degrees via
    two count-over-key windows and filters in place. That is 2 |E|-keyed
    exchanges per round versus the former groupBy + two semi-joins
    (3 exchanges, an extra |V| table, and an extra materializing action
    per round); "endpoint degree >= k" is exactly "endpoint alive", so
    the surviving edge set per round is unchanged. An unchanged EDGE
    count now signals the fixpoint (a dying node always loses >= 1
    surviving edge on symmetric input, so alive shrinks iff the edge
    set shrinks)."""
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    w_src = Window.partitionBy("src")
    w_dst = Window.partitionBy("dst")
    executed = 0
    for _ in range(rounds):
        executed += 1
        shrunk = (
            edges.withColumn("__ds", F.count(F.lit(1)).over(w_src))
            .withColumn("__dd", F.count(F.lit(1)).over(w_dst))
            .where((F.col("__ds") >= k) & (F.col("__dd") >= k))
            .select("src", "dst")
            .localCheckpoint(eager=True)  # cut lineage per round
        )
        # count is near-free on the just-materialized checkpoint; an
        # unchanged count on a subset means an unchanged set — fixpoint,
        # and the remaining rounds are result-identical no-ops
        n_new = shrunk.count()
        edges = shrunk
        if n_new == n_edges:
            break
        n_edges = n_new
    out = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    )
    return (out, executed) if return_rounds else out


def connected_components(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Connected components over a symmetric edge list; returns
    (node, component_id) with component_id = min node id reachable.

    Delegates to the x15 engine (operators/dedup.cc_star): the
    large-star/small-star MapReduce algorithm (Kiveris et al. 2014) —
    O(log n) alternations on ANY graph shape, including the chain
    graphs where the r5 min-label propagation needed ~diameter/2
    rounds (convergence pinned on a 256-chain in
    tests/test_graph_property.py). Two exchanges per phase, edge count
    never grows past the input, per-round checkpoints cut lineage."""
    from video_stream_processing_spark.operators.dedup import dedup_clusters

    # Materialize the caller's edge pipeline ONCE: pairs, nodes AND the
    # engine's symmetrized edge table below all derive from it, and for
    # a derived graph (x92's co-purchase self-join) the upstream is far
    # more expensive than the |E|-sized checkpoint (measured 10.4 ->
    # ~6 s at sf0.1; the iteration itself is 2 rounds on that graph).
    edges = edges.localCheckpoint(eager=True)
    pairs = (
        edges.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    return dedup_clusters(nodes, pairs, max_rounds=max_rounds).select(
        F.col("doc_id").alias("node"), F.col("cluster_id").alias("component_id")
    )
