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


def _exact_truncated_harmonic(edges, n_iter=3):
    """Σ 1/d(v→u) over u reachable within n_iter hops, exact BFS."""
    adj = {}
    nodes = set()
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
        nodes.update((s, t))
    out = {}
    for v in sorted(nodes):
        dist = {v: 0}
        frontier = [v]
        for d in range(1, n_iter + 1):
            nxt = []
            for x in frontier:
                for y in adj.get(x, ()):
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        out[v] = sum(1.0 / d for u, d in dist.items() if d > 0)
    return out


def test_hyperball_harmonic_structure_on_toy_graph(spark):
    """Structural properties the sketch noise cannot break: a node with
    no out-edges scores exactly 0, the hub outranks the chain, and every
    node's score is bounded by its exact truncated harmonic plus the
    worst-case sketch slack."""
    from entity_resolution_pipeline_spark.operators.graph import (
        hyperball_harmonic,
    )

    # a hub (h -> many), a chain, and an isolate-ish tail
    edges = ([("h", f"x{i}") for i in range(8)]
             + [(f"x{i}", f"x{i+1}") for i in range(7)]
             + [("a", "b"), ("b", "c")])
    df = spark.createDataFrame(edges, "src string, dst string")
    out = hyperball_harmonic(df, n_iter=3)
    got = {r["node"]: r["harmonic"] for r in out.collect()}
    release_persisted(out)
    want = _exact_truncated_harmonic(edges, n_iter=3)
    assert set(got) == set(want)
    # sink: empty shells at every t, exactly zero by construction
    assert got["x7"] == 0.0
    # the hub reaches the most mass at these separations
    assert got["h"] == max(got.values())
    # at ball sizes ≤ 9 over 64 registers, per-node collision quanta are
    # ~1 unit each — generous absolute slack, still catches real breaks
    for v in want:
        assert abs(got[v] - want[v]) <= 3.0, (v, got[v], want[v])


def test_hyperball_harmonic_tracks_exact_bfs_at_size(spark):
    """On a 300-node expander (5 out-edges per node, balls of ~150 at
    t=3) the estimator leaves the linear-counting quanta behind and the
    per-node relative error obeys the HLL m=64 bound; the mean is much
    tighter."""
    from entity_resolution_pipeline_spark.operators.graph import (
        hyperball_harmonic,
    )

    n = 300
    edges = [(f"n{i}", f"n{(i * k + b) % n}")
             for i in range(n) for k, b in
             ((7, 1), (13, 5), (29, 11), (41, 17), (53, 23))
             if (i * k + b) % n != i]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = hyperball_harmonic(df, n_iter=3)
    got = {r["node"]: r["harmonic"] for r in out.collect()}
    release_persisted(out)
    want = _exact_truncated_harmonic(edges, n_iter=3)
    rels = [abs(got[v] - want[v]) / want[v] for v in want if want[v] > 0]
    # vanilla Flajolet (no HLL++ bias tables) has its documented bias
    # spike in the 2.5m crossover region the t=2 balls sit in — allow a
    # fat per-node tail, gate on the mean
    assert max(rels) <= 0.7, max(rels)
    assert sum(rels) / len(rels) <= 0.18, sum(rels) / len(rels)


def test_hyperball_balls_monotone_and_repartition_invariant(spark):
    from entity_resolution_pipeline_spark.operators.graph import (
        hyperball_harmonic,
    )

    edges = [(f"n{i}", f"n{(3 * i + 1) % 11}") for i in range(11)] * 5
    df = spark.createDataFrame(edges, "src string, dst string")
    a = hyperball_harmonic(df, n_iter=3)
    rows_a = sorted(tuple(r) for r in a.collect())
    release_persisted(a)
    for r in rows_a:
        node, b0, b1, b2, b3, micro, h = r
        assert b0 <= b1 <= b2 <= b3  # balls only grow
        assert h >= 0
    b = hyperball_harmonic(df.repartition(13), n_iter=3)
    rows_b = sorted(tuple(r) for r in b.collect())
    release_persisted(b)
    assert rows_a == rows_b


def test_triangle_stats_matches_brute_force(spark):
    from itertools import combinations

    from entity_resolution_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    # deterministic pseudo-random multigraph with self-loops + both
    # directions (all must collapse to the simple undirected graph)
    edges = [(f"n{(i * 7) % 13}", f"n{(i * i + 3) % 13}")
             for i in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = triangle_stats(df)
    got = {r["node"]: (r["n_neighbors"], r["n_triangles"], r["n_wedges"],
                       r["clustering"]) for r in out.collect()}
    release_persisted(out)

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node, nbs in adj.items():
        tri = sum(1 for x, y in combinations(sorted(nbs), 2)
                  if tuple(sorted((x, y))) in und)
        deg = len(nbs)
        wedges = deg * (deg - 1) // 2
        want = (deg, tri, wedges, tri / wedges if wedges else 0.0)
        assert got[node] == want, (node, got[node], want)
    assert set(got) == set(adj)


def test_triangle_stats_repartition_invariant(spark):
    from entity_resolution_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    edges = [(f"n{(i * 5) % 9}", f"n{(i + 2) % 9}") for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = triangle_stats(df)
    ra = sorted(tuple(r) for r in a.collect())
    release_persisted(a)
    b = triangle_stats(df.repartition(13))
    rb = sorted(tuple(r) for r in b.collect())
    release_persisted(b)
    assert ra == rb


def test_trustrank_spam_island_gets_zero_trust(spark):
    """The defining TrustRank property: a densely self-linked component
    with NO in-link from the trusted side holds exactly zero trust at
    every iteration, while trust flows down the seeded path."""
    from entity_resolution_pipeline_spark.operators.graph import trustrank

    edges = [("s", "a"), ("a", "b"),              # trusted path
             ("f1", "f2"), ("f2", "f3"), ("f3", "f1"),  # spam ring
             ("f1", "f3"), ("f2", "f1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = trustrank(df, ["s"], n_iter=4)
    got = {r["node"]: r["trust_micro"] for r in out.collect()}
    release_persisted(out)
    assert got["f1"] == got["f2"] == got["f3"] == 0
    assert got["a"] > 0 and got["b"] > 0 and got["s"] > 0


def test_trustrank_matches_scalar_reference(spark):
    from entity_resolution_pipeline_spark.operators.graph import trustrank

    edges = [("s", "a"), ("a", "b"), ("b", "spam"), ("spam", "spam2"),
             ("spam2", "spam"), ("s", "b"), ("t", "a"), ("b", "t")]
    seeds = ["s", "t"]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = trustrank(df, seeds, n_iter=3)
    got = {r["node"]: r["trust_micro"] for r in out.collect()}
    release_persisted(out)

    from collections import Counter
    w = Counter(edges)
    out_w = Counter()
    for (s, _), n in w.items():
        out_w[s] += n
    nodes = sorted({x for e in edges for x in e})
    ns = len(seeds)
    r0 = PR_SCALE // ns
    rank = {v: (r0 if v in seeds else 0) for v in nodes}
    for _ in range(3):
        inflow = {v: 0 for v in nodes}
        for (s, t), wn in w.items():
            inflow[t] += (rank[s] * wn) // out_w[s]
        dang = sum(rank[v] for v in nodes if out_w[v] == 0)
        rank = {v: ((15 * r0 + 85 * (dang // ns) if v in seeds else 0)
                    + 85 * inflow[v]) // 100 for v in nodes}
    assert got == rank
