"""Connected components vs an independent union-find oracle (T2b)."""

import random

import pytest

from entity_resolution_pipeline_spark.operators.clustering import (
    assign_clusters, connected_components,
)


def union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("n_nodes,n_edges,seed", [
    (50, 40, 1), (200, 150, 2), (100, 300, 3),
])
def test_cc_matches_union_find(spark, n_nodes, n_edges, seed):
    rng = random.Random(seed)
    edges = [(f"n{rng.randrange(n_nodes):04d}", f"n{rng.randrange(n_nodes):04d}")
             for _ in range(n_edges)]
    edges = [(a, b) for a, b in edges if a != b]
    oracle = union_find_oracle(edges)
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {r["url"]: r["cluster_id"] for r in connected_components(df).collect()}
    # oracle roots are min-ids because union always keeps the smaller root
    assert got == oracle


def test_cc_chain_and_singleton(spark):
    # a long path exercises the iterative contraction (diameter >> 1)
    chain = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(60)]
    nodes = spark.createDataFrame(
        [(f"c{i:03d}",) for i in range(61)] + [("lonely",)], "url: string")
    edges = spark.createDataFrame(chain, "src: string, dst: string")
    labels = {r["url"]: r["cluster_id"] for r in assign_clusters(nodes, edges).collect()}
    assert all(labels[f"c{i:03d}"] == "c000" for i in range(61))
    assert labels["lonely"] == "lonely"


def test_cc_self_loops_and_duplicates(spark):
    edges = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")], "src: string, dst: string")
    got = {r["url"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a"}


def test_cc_kill_after_iteration_k_resumes_to_identical_clusters(spark, tmp_path):
    """Mid-stage resume (SURVEY §7.4 risk 4): kill the star iteration after
    round 1, then resume from the committed frontier — final labels must be
    identical to an uninterrupted run, and the resumed run must start from
    the recorded iteration (audit rows prove per-round commits)."""
    from entity_resolution_pipeline_spark.sources.tableio import TableIO

    # 60-node path: diameter forces several large/small-star rounds
    chain = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(60)]
    edges = spark.createDataFrame(chain, "src: string, dst: string")
    full = {r["url"]: r["cluster_id"]
            for r in connected_components(edges).collect()}

    io = TableIO(spark, str(tmp_path / "cc_ckpt"))
    # "killed" run: only 1 round executes, frontier committed at iteration 1
    connected_components(edges, max_iter=1, checkpoint_io=io).collect()
    assert io.is_committed("cc_frontier")
    assert io.committed_meta("cc_frontier")["iteration"] == 1

    resumed = {r["url"]: r["cluster_id"]
               for r in connected_components(edges, checkpoint_io=io).collect()}
    assert resumed == full

    audit = io.read_audit()
    iters = [a["cc_iteration"] for a in audit if "cc_iteration" in a]
    assert iters and iters[0] == 1 and iters == sorted(iters)
    # resumed run continued from iteration 2, never re-ran round 1
    assert iters.count(1) == 1


@pytest.mark.parametrize("n_nodes,n_edges,seed", [(120, 90, 7), (80, 200, 8)])
def test_update_clusters_equals_full_recompute(spark, n_nodes, n_edges, seed):
    """update_clusters(cluster(E1), E2) == cluster(E1 ∪ E2), including
    brand-new nodes that only appear in the delta."""
    from entity_resolution_pipeline_spark.operators.clustering import (
        update_clusters,
    )

    rng = random.Random(seed)
    edges = [(f"n{rng.randrange(n_nodes):04d}", f"n{rng.randrange(n_nodes):04d}")
             for _ in range(n_edges)]
    edges = [(a, b) for a, b in edges if a != b]
    cut = len(edges) * 2 // 3
    e1, e2 = edges[:cut], edges[cut:]
    # delta also introduces nodes the prior run never saw
    e2 += [(f"x{i:02d}", f"n{rng.randrange(n_nodes):04d}") for i in range(5)]
    nodes = sorted({x for ab in (e1 + e2) for x in ab} | {"lonely"})

    nodes_df = spark.createDataFrame([(n,) for n in nodes], "url: string")
    e1_df = spark.createDataFrame(e1, "src: string, dst: string")
    e2_df = spark.createDataFrame(e2, "src: string, dst: string")

    prior = assign_clusters(nodes_df, e1_df)
    got = {r["url"]: r["cluster_id"]
           for r in update_clusters(prior, e2_df,
                                    new_nodes=nodes_df).collect()}
    full = spark.createDataFrame(e1 + e2, "src: string, dst: string")
    want = {r["url"]: r["cluster_id"]
            for r in assign_clusters(nodes_df, full).collect()}
    assert got == want
    assert got["lonely"] == "lonely"  # untouched singleton survives


def test_update_clusters_chain_merge_across_priors(spark):
    """A delta edge chain that threads several prior clusters merges them
    all to the global min id."""
    from entity_resolution_pipeline_spark.operators.clustering import (
        update_clusters,
    )

    e1 = [("a1", "a2"), ("b1", "b2"), ("c1", "c2")]
    nodes = spark.createDataFrame(
        [(n,) for n in ["a1", "a2", "b1", "b2", "c1", "c2"]], "url: string")
    prior = assign_clusters(
        nodes, spark.createDataFrame(e1, "src: string, dst: string"))
    delta = spark.createDataFrame(
        [("a2", "b1"), ("b2", "c1")], "src: string, dst: string")
    got = {r["url"]: r["cluster_id"]
           for r in update_clusters(prior, delta).collect()}
    assert set(got.values()) == {"a1"} and len(got) == 6
