"""Link-graph centrality over a (src, dst) edge DataFrame: fixed-point
PageRank and HyperBall harmonic centrality.

Web-corpus curation uses link centrality as a document-quality prior:
Common Crawl publishes per-domain harmonic-centrality/PageRank ranks, and
crawl frontier scheduling + quality weighting both consume them (OPIC /
PageRank-prioritized crawling, Cho et al. 1998). The reference pipeline
has no graph stage (its web-page inputs arrive pre-crawled), so this is
an LLM-pipeline extension operator: domains in, centrality out, feeding
the same gate machinery as `domain_stats`.

Design decisions, in scale order:

* **Power iteration as repeated DataFrame joins.** Each iteration is
  `edges ⋈ ranks` (shuffle on src) → map-side-combined `sum` per dst →
  rebase against the node table. On a cluster, `edges` is repartitioned
  by src ONCE and reused every iteration, so only the slim (node, rank)
  table moves per round — the classic Pregel-free distributed PageRank
  shape. No `collect()` of anything data-sized: the only driver scalars
  are the node count and per-iteration cache bookkeeping.
* **FIXED-POINT integer arithmetic (micro-ranks).** Double summation is
  order-dependent across engines; instead ranks live in units of
  1e-12 (`PR_SCALE`), damping is an integer percent, and every division
  is integral (`div`), so the whole iteration is exact bigint math —
  reproducible bit-for-bit in any SQL engine at any partitioning. This
  is the same trick the BM25 row uses (integer micro-scores) and what
  makes an ITERATIVE approximate algorithm full-plan oracle-checkable.
* **Dangling mass stays in-plan.** The rank mass of sink nodes is a
  1-row aggregate cross-joined (broadcast) back in — no per-iteration
  driver round-trip.

Overflow headroom: rank ≤ PR_SCALE = 1e12 and `rank * w` must stay under
2^63 ≈ 9.2e18, so per-edge weights up to ~9e6 are safe; beyond that,
pre-normalize weights (divide the edge table by a constant) before
calling.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # 1.0 of rank mass, in micro-rank units
PR_DAMPING = 85    # damping as integer percent (0.85)


def hyperball_harmonic(edges: DataFrame, src_col: str = "src",
                       dst_col: str = "dst", n_iter: int = 3) -> DataFrame:
    """HyperBall harmonic centrality (Boldi & Vigna 2013) — the
    algorithm behind Common Crawl's published per-domain harmonic
    centrality ranks — on the repo's SQL-replayable HLL registers.

    Per node, maintain an HLL sketch of its distance-t ball
    B_t(v) = B_{t-1}(v) ∪ ⋃_{(v,w)∈E} B_{t-1}(w); the t-th shell size is
    |B_t| − |B_{t-1}| and harmonic centrality is Σ_t shell_t / t
    truncated at ``n_iter`` hops. Distances here follow OUT-edges from
    ``v`` (reachability FROM v); pass reversed edges for the classic
    Σ 1/d(u→v) formulation — the battery row does exactly that.

    Scale shape: state is nodes × 64 integer registers FOREVER (the
    whole point of HyperBall — exact neighborhood sets are quadratic);
    each iteration is one edges ⋈ registers join (shuffle on dst)
    followed by a map-side-combined per-register max. Cross-engine
    determinism is inherited from the sketch module: register updates
    are integer max-merges and every ball-size estimate is the
    integer-harmonic-sum estimator rounded to 4dp, so the whole
    APPROXIMATE centrality replays bit-for-bit in SQL. The shell sum
    itself runs in INTEGER micro-units (4dp ball sizes ×10⁴ are exact
    integers; 1/t becomes the lcm(1..T)/t coefficient), so no float
    addition order or half-way rounding can diverge between engines —
    ``harmonic_micro`` is the hash anchor and ``harmonic`` is one
    unrounded IEEE division of it (identical bits on any engine).

    Returns (node, n_ball_0..n_ball_T, harmonic_micro, harmonic) —
    ball sizes ride along so the oracle pins every iteration, not just
    the final score.
    """
    from .sketches import hll_estimate, hll_merge, hll_register_table

    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().persist())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    # B_0(v) = {v}: sketch the node id itself
    regs = hll_register_table(
        nodes.withColumn("item", F.col("node")), "node", "item").persist()
    own = [e, regs]
    ests = [hll_estimate(regs, "node")
            .withColumnRenamed("n_est", "n_ball_0")]
    for t in range(1, n_iter + 1):
        neigh = (
            e.join(regs.withColumnRenamed("grp", "dst_node"),
                   e["dst"] == F.col("dst_node"))
            .select(F.col("src").alias("grp"), "j", "m_j")
        )
        regs = hll_merge(neigh.unionByName(regs.select("grp", "j", "m_j"))) \
            .persist()
        own.append(regs)
        ests.append(hll_estimate(regs, "node")
                    .withColumnRenamed("n_est", f"n_ball_{t}"))
    out = ests[0]
    for est in ests[1:]:
        out = out.join(est, "node")
    lcm = math.lcm(*range(1, n_iter + 1))
    micro = None
    for t in range(1, n_iter + 1):
        diff = (F.round(F.col(f"n_ball_{t}") * 10000).cast("long")
                - F.round(F.col(f"n_ball_{t-1}") * 10000).cast("long"))
        term = F.lit(lcm // t).cast("long") * diff
        micro = term if micro is None else micro + term
    out = (out.withColumn("harmonic_micro", micro)
           .withColumn("harmonic",
                       F.col("harmonic_micro")
                       / F.lit(float(lcm * 10000))))
    out._erps_persisted = own
    return out


def trustrank(edges: DataFrame, seeds: list[str],
              src_col: str = "src", dst_col: str = "dst",
              n_iter: int = 3, damping: int = PR_DAMPING) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank
    with teleport (and dangling mass) restricted to a TRUSTED seed set —
    the classic web-spam demotion signal. Good domains inherit trust
    through links from seeds; spam farms, however densely self-linked,
    receive none unless a trusted domain links in.

    Same fixed-point micro-rank machinery as :func:`pagerank` (exact
    bigint math, oracle-replayable at any partitioning); the only
    changes are the initial/teleport vector — ``PR_SCALE div |S|`` on
    seeds, 0 elsewhere — and dangling mass returning to seeds. The seed
    set is driver-state (a literal `isin`), exactly like the pinned ANN
    centroids: at web scale it's the few-hundred-domain human-audited
    whitelist the paper prescribes, trivially broadcastable.

    Returns (node, trust_micro, trust)."""
    e = (edges.groupBy(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .agg(F.count("*").alias("w")))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = e.join(out_w, "src").persist()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n_seeds = len(set(seeds))
    if n_seeds == 0:
        raise ValueError("trustrank requires a non-empty seed set")
    r0 = PR_SCALE // n_seeds
    is_seed = F.col("node").isin(list(set(seeds)))

    ranks = nodes.withColumn(
        "rank", F.when(is_seed, F.lit(r0)).otherwise(F.lit(0)).cast("long"))
    own = [e, nodes]
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    F.expr("(rank * w) div out_w").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("inflow"))
        )
        dang = (
            ranks.join(out_w.select(F.col("src").alias("node")),
                       "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dang"))
        )
        teleport = (F.when(is_seed,
                           F.lit((100 - damping) * r0).cast("long")
                           + F.lit(damping)
                           * F.expr(f"dang div {n_seeds}L"))
                    .otherwise(F.lit(0).cast("long")))
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .withColumn("tp", teleport)
            .select(
                "node",
                F.expr(f"(tp + {damping} * coalesce(inflow, 0L)) div 100")
                .cast("long").alias("rank"),
            )
            .persist()
        )
        own.append(ranks)
    out = ranks.select(
        "node", F.col("rank").alias("trust_micro"),
        F.round(F.col("rank") / F.lit(float(PR_SCALE)), 9).alias("trust"))
    out._erps_persisted = own
    return out


def triangle_stats(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simple graph of the edge rows (direction and
    multiplicity dropped; self-loops ignored) — the classic link-farm /
    spam-cluster signal: organically linked domains close triangles,
    spray-linked spam farms don't.

    Exact and integer-valued: n_neighbors, n_triangles (triangles
    through the node), n_wedges = C(deg, 2); ``clustering`` is the one
    IEEE division n_tri/n_wedges (unrounded — identical bits on any
    engine), 0.0 when deg < 2.

    Plan: normalize to canonical (u < v) edges, build the symmetric
    adjacency, one adjacency self-join on the center node (the Σdeg²
    wedge enumeration — per-NODE counts need every closed wedge, unlike
    a global count which would orient edges by degree to halve work),
    then one semi-join-shaped edge probe closes wedges. Joins shuffle on
    node / canonical pair keys; no driver-side anything. At web scale
    the wedge join is the documented cost center and is exactly the
    shape AQE skew-handles (celebrity domains = hot center keys)."""
    u, v = F.col(src_col), F.col(dst_col)
    und = (edges.where(u != v)
           .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
           .distinct().persist())
    adj = (und.select(F.col("u").alias("node"), F.col("v").alias("nb"))
           .unionByName(
               und.select(F.col("v").alias("node"), F.col("u").alias("nb"))))
    deg = adj.groupBy("node").agg(F.count("*").alias("n_neighbors"))
    a = adj.select("node", F.col("nb").alias("a"))
    b = adj.select("node", F.col("nb").alias("b"))
    wedges = a.join(b, "node").where(F.col("a") < F.col("b"))
    closed = wedges.join(
        und, (wedges["a"] == und["u"]) & (wedges["b"] == und["v"]),
        "left_semi")
    tri = closed.groupBy("node").agg(F.count("*").alias("n_triangles"))
    out = (deg.join(tri, "node", "left")
           .select(
               "node", "n_neighbors",
               F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
               (F.col("n_neighbors") * (F.col("n_neighbors") - 1) / 2)
               .cast("long").alias("n_wedges"))
           .withColumn(
               "clustering",
               F.when(F.col("n_wedges") > 0,
                      F.col("n_triangles") / F.col("n_wedges")
                      .cast("double")).otherwise(F.lit(0.0))))
    out._erps_persisted = [und]
    return out


def pagerank(edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
             n_iter: int = 3, damping: int = PR_DAMPING,
             weight_col: str | None = None) -> DataFrame:
    """PageRank over (src, dst) edge rows (parallel edges = weight; or
    pass ``weight_col`` for a pre-aggregated weighted edge table, e.g.
    the incremental link-graph state of ``stream_update_linkgraph`` —
    summing weights of duplicate (src, dst) rows either way, so the two
    input shapes are equivalent).

    Returns (node, rank_micro, rank): `rank_micro` is the exact bigint
    fixed-point value after `n_iter` iterations (hash-checkable);
    `rank` is the same value as a rounded double for human use.

    Update rule (all integer ops)::

        r0            = PR_SCALE div N
        contrib(e)    = (rank[src] * w) div out_w[src]
        dangling      = Σ rank over nodes with no out-edges
        rank'[v]      = ((100-d)·r0 + d·(Σ contrib(e: dst=v)
                                         + dangling div N)) div 100
    """
    w_agg = (F.sum(F.col(weight_col)).cast("long") if weight_col
             else F.count("*"))
    e = (edges.groupBy(F.col(src_col).alias("src"),
                       F.col(dst_col).alias("dst"))
         .agg(w_agg.alias("w")))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = e.join(out_w, "src").persist()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n_nodes = nodes.count()  # scalar aggregate — sanctioned collect
    if n_nodes == 0:  # empty graph: no nodes, no ranks
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank_micro bigint, rank double")
    r0 = PR_SCALE // n_nodes

    ranks = nodes.withColumn("rank", F.lit(r0).cast("long"))
    own = [e, nodes]
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    F.expr("(rank * w) div out_w").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("inflow"))
        )
        dang = (
            ranks.join(out_w.select(F.col("src").alias("node")),
                       "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dang"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"({100 - damping} * {r0}L"
                    f" + {damping} * (coalesce(inflow, 0L)"
                    f"                + dang div {n_nodes}L)) div 100"
                ).cast("long").alias("rank"),
            )
            .persist()
        )
        own.append(ranks)
    out = ranks.select(
        "node", F.col("rank").alias("rank_micro"),
        F.round(F.col("rank") / F.lit(float(PR_SCALE)), 9).alias("rank"))
    # forward every iteration cache for release_persisted (the last one
    # backs `out` itself and unpersists harmlessly after materialization)
    out._erps_persisted = own
    return out
