"""Property-based checks for the graph + sketch operators: random small
graphs (dense alphabets force parallel edges, self-loops, sinks and
triangles) against pure-Python references, and random corpus slicings
against the sketch monoid laws. Few examples, one Spark job per example."""

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_pipeline_spark.operators.graph import (
    pagerank, triangle_stats,
)
from entity_resolution_pipeline_spark.operators.scoring import (
    release_persisted,
)

NODES = [f"n{i}" for i in range(7)]

edge_strategy = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=1, max_size=40,
)


def _py_pagerank(edges, n_iter, d=85, scale=10**12):
    from collections import Counter
    w = Counter((s, t) for s, t in edges)
    out_w = Counter()
    for (s, _), n in w.items():
        out_w[s] += n
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    r0 = scale // n
    rank = {v: r0 for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for (s, t), wn in w.items():
            inflow[t] += (rank[s] * wn) // out_w[s]
        dang = sum(rank[v] for v in nodes if out_w[v] == 0)
        rank = {v: ((100 - d) * r0 + d * (inflow[v] + dang // n)) // 100
                for v in nodes}
    return rank


@settings(max_examples=6, deadline=None)
@given(edge_strategy)
def test_pagerank_matches_reference_on_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank(df, n_iter=3)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}
    release_persisted(out)
    assert got == _py_pagerank(edges, n_iter=3)


@settings(max_examples=6, deadline=None)
@given(edge_strategy)
def test_triangle_stats_matches_reference_on_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = triangle_stats(df)
    got = {r["node"]: (r["n_neighbors"], r["n_triangles"], r["n_wedges"])
           for r in out.collect()}
    release_persisted(out)
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(got) == set(adj)
    for node, nbs in adj.items():
        tri = sum(1 for x, y in combinations(sorted(nbs), 2)
                  if tuple(sorted((x, y))) in und)
        deg = len(nbs)
        assert got[node] == (deg, tri, deg * (deg - 1) // 2), node


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2", "s3"]),
                          st.integers(min_value=0, max_value=400)),
                min_size=1, max_size=120),
       st.integers(min_value=2, max_value=5))
def test_hll_merge_monoid_on_random_slicings(spark, items, n_slices):
    """Register tables over ANY slicing of the items, merged, equal the
    whole-input register table — the law 1000-executor roll-ups rely on."""
    from entity_resolution_pipeline_spark.operators.sketches import (
        hll_merge, hll_register_table,
    )

    rows = [(g, f"item-{x}") for g, x in items]
    df = spark.createDataFrame(rows, "grp string, item string")
    whole = {tuple(r) for r in
             hll_register_table(df, "grp", "item").collect()}
    from pyspark.sql import functions as F
    parts = [
        hll_register_table(
            df.where(F.crc32(F.col("item")) % n_slices == i), "grp", "item")
        for i in range(n_slices)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = {tuple(r) for r in hll_merge(u).collect()}
    assert merged == whole
