"""Property tests for operators/graph.py: on random small undirected
graphs, every operator must match a pure-python brute-force
implementation exactly (the algorithms are integer-deterministic, so
equality is exact, not approximate).

Example counts are kept small — each case runs real Spark jobs (the
operators checkpoint eagerly by design).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def undirected_graphs(draw):
    n = draw(st.integers(min_value=3, max_value=8))
    possible = [(i, j) for i in range(n) for j in range(i + 1, n)]
    und = draw(
        st.lists(
            st.sampled_from(possible),
            min_size=1,
            max_size=len(possible),
            unique=True,
        )
    )
    return und


def _sym(und):
    return und + [(b, a) for a, b in und]


_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(und=undirected_graphs())
@_SETTINGS
def test_triangle_count_matches_brute_force(spark, und):
    from video_stream_processing_spark.operators.graph import oriented_triangle_count

    nodes = sorted({x for e in und for x in e})
    eset = set(und)
    brute = sum(
        1
        for i in nodes
        for j in nodes
        for k in nodes
        if i < j < k
        and (i, j) in eset
        and (j, k) in eset
        and (i, k) in eset
    )
    df = spark.createDataFrame(_sym(und), ["src", "dst"])
    got = oriented_triangle_count(df).collect()[0]["n_triangles"]
    assert got == brute


@given(und=undirected_graphs(), k=st.integers(min_value=1, max_value=4))
@_SETTINGS
def test_kcore_matches_brute_force(spark, und, k):
    from video_stream_processing_spark.operators.graph import kcore_peel

    edges = _sym(und)
    rounds = 4
    alive = {x for e in edges for x in e}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for s, d in edges:
            if s in alive and d in alive:
                deg[s] = deg.get(s, 0) + 1
        alive = {n for n, dg in deg.items() if dg >= k}
    expect: dict[int, int] = {}
    for s, d in edges:
        if s in alive and d in alive:
            expect[s] = expect.get(s, 0) + 1
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["core_deg"] for r in kcore_peel(df, k=k, rounds=rounds).collect()
    }
    assert got == expect


@given(und=undirected_graphs(), iters=st.integers(min_value=1, max_value=3))
@_SETTINGS
def test_pagerank_matches_brute_force(spark, und, iters):
    from video_stream_processing_spark.operators.graph import pagerank_fixedpoint

    edges = _sym(und)
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: 1_000_000 for n in deg}
    for _ in range(iters):
        nxt = {n: 150_000 for n in deg}
        for u, v in edges:
            nxt[v] += (r[u] * 85) // (100 * deg[u])
        r = nxt
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        row["node"]: row["pr_mass"]
        for row in pagerank_fixedpoint(df, iters=iters).collect()
    }
    assert got == r


@given(und=undirected_graphs())
@_SETTINGS
def test_connected_components_match_union_find(spark, und):
    from video_stream_processing_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    df = spark.createDataFrame(_sym(und), ["src", "dst"])
    got = {
        r["node"]: r["component_id"] for r in connected_components(df).collect()
    }
    assert got == expect


@given(und=undirected_graphs())
@_SETTINGS
def test_personalized_pagerank_matches_brute_force(spark, und):
    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.graph import pagerank_fixedpoint

    edges = _sym(und)
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    seeds = sorted(deg)[:2]
    r = {n: (1_000_000 if n in seeds else 0) for n in deg}
    for _ in range(3):
        nxt = {n: (150_000 if n in seeds else 0) for n in deg}
        for u, v in edges:
            nxt[v] += (r[u] * 85) // (100 * deg[u])
        r = nxt
    df = spark.createDataFrame(edges, ["src", "dst"])
    seed_df = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {
        row["node"]: row["pr_mass"]
        for row in pagerank_fixedpoint(df, iters=3, seeds=seed_df).collect()
    }
    assert got == r
    # non-seed mass is strictly inflow: seeds always hold >= restart
    for s in seeds:
        assert got[s] >= 150_000


def test_cc_star_logarithmic_on_chain(spark):
    """Round-9 convergence bound (VERDICT r8 task 7): the large-star/
    small-star engine resolves a 256-node CHAIN — the adversarial shape
    for min-label propagation, which needed ~diameter/2 = 128 rounds —
    in O(log n) alternations, with the correct single component."""
    from video_stream_processing_spark.operators.dedup import cc_star
    from pyspark.sql import functions as F

    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    labels, rounds = cc_star(nodes, pairs, max_rounds=25)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # 2*log2(256) = 16 is the generous bound; propagation needed ~128
    assert rounds <= 16, rounds


def test_cc_star_isolated_and_multi_component(spark):
    from video_stream_processing_spark.operators.dedup import cc_star
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21)], ["doc_a", "doc_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in [3, 5, 9, 20, 21, 42]], ["doc_id"])
    labels, rounds = cc_star(nodes, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 42: 42}
    assert rounds <= 4


@given(und=undirected_graphs())
@_SETTINGS
def test_cc_star_rounds_logarithmic(spark, und):
    """cc_star's O(log n) alternation bound holds on arbitrary graphs,
    not just the chain fixture: rounds <= 2*ceil(log2(n)) + 2."""
    import math

    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.dedup import cc_star

    nodes = sorted({v for e in und for v in e})
    pairs = spark.createDataFrame(und, ["doc_a", "doc_b"])
    ndf = spark.createDataFrame([(v,) for v in nodes], ["doc_id"])
    labels, rounds = cc_star(ndf, pairs, max_rounds=25)
    assert rounds <= 2 * math.ceil(math.log2(max(len(nodes), 2))) + 2
    # and the labels are a valid CC labeling: same count as union-find
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {v: find(v) for v in nodes}
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == expect


def test_cc_star_cap_exhausted_warns_and_stays_consistent(spark):
    """ADVICE r9 (medium): when max_rounds is exhausted before the star
    forest stabilizes, cc_star must NOT silently emit duplicate doc_id
    rows with conflicting cluster_ids — it warns (RuntimeWarning) and
    collapses remaining multi-parent nodes to min(parent), so the
    labeling is one row per node with every cluster_id a real member of
    the node's component."""
    import warnings

    from pyspark.sql import functions as F

    from video_stream_processing_spark.operators.dedup import cc_star

    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels, rounds = cc_star(nodes, pairs, max_rounds=2)
        rows = labels.collect()
    assert rounds == 2
    assert any(
        issubclass(w.category, RuntimeWarning) and "cc_star" in str(w.message)
        for w in caught
    ), [str(w.message) for w in caught]
    # exactly one row per node — the defect was duplicate doc_id rows
    ids = [r["doc_id"] for r in rows]
    assert sorted(ids) == list(range(n))
    # every label points at a node in the same (single) component and
    # is never larger than the node itself (min-parent collapse)
    for r in rows:
        assert 0 <= r["cluster_id"] <= r["doc_id"]
