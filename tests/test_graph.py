"""Fixed-point PageRank: exactness vs a scalar Python reference (incl.
dangling mass), repartition invariance, and sanity of the ranking order."""

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.graph import (
    PR_SCALE, pagerank,
)
from entity_resolution_pipeline_spark.operators.scoring import (
    release_persisted,
)

# a -> b, a -> c, b -> c, and d is a pure sink reached from c
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("a", "b")]


def _reference(edges, n_iter=3, d=85):
    from collections import Counter
    w = Counter(edges)
    out_w = Counter()
    for (s, _), n in w.items():
        out_w[s] += n
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    r0 = PR_SCALE // n
    rank = {v: r0 for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for (s, t), wn in w.items():
            inflow[t] += (rank[s] * wn) // out_w[s]
        dang = sum(rank[v] for v in nodes if out_w[v] == 0)
        rank = {v: ((100 - d) * r0 + d * (inflow[v] + dang // n)) // 100
                for v in nodes}
    return rank


def test_pagerank_matches_scalar_reference_with_dangling(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = pagerank(df, n_iter=3)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}
    release_persisted(out)
    assert got == _reference(EDGES, n_iter=3)
    # the sink (d) collects the most mass; the source (a) only teleport
    assert got["d"] == max(got.values())
    assert got["a"] == min(got.values())


def test_pagerank_repartition_invariant(spark):
    df = spark.createDataFrame(EDGES * 7, "src string, dst string")
    a = pagerank(df, n_iter=4)
    ra = sorted((r["node"], r["rank_micro"]) for r in a.collect())
    release_persisted(a)
    b = pagerank(df.repartition(13), n_iter=4)
    rb = sorted((r["node"], r["rank_micro"]) for r in b.collect())
    release_persisted(b)
    assert ra == rb


def test_pagerank_mass_approximately_conserved(spark):
    """Integer floors only ever LOSE micro-rank; total stays within
    n_nodes * n_iter * 100 micro-units of PR_SCALE."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    out = pagerank(df, n_iter=5)
    rows = out.collect()
    release_persisted(out)
    total = sum(r["rank_micro"] for r in rows)
    assert 0 < PR_SCALE - total < 4 * 5 * 200 + 400
    # doubles mirror the fixed-point values
    for r in rows:
        assert abs(r["rank"] - r["rank_micro"] / PR_SCALE) < 1e-9


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    out = pagerank(df, n_iter=2)
    assert out.count() == 0
    assert out.columns == ["node", "rank_micro", "rank"]
