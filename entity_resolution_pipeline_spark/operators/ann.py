"""Approximate-nearest-neighbor search over an embedding column.

Replaces the reference's FAISS flat/IVF index files
(/root/reference/src/embeddings.py:258-334, src/blocking.py:438-517) with
DataFrame-native strategies:

* brute-force cosine top-k — the exact baseline: query⋈corpus join (broadcast
  the query side, stream the corpus), native cosine fold, per-query window
  top-k. Correct at any corpus size as long as the *query* side broadcasts;
  cost is one corpus scan per batch of queries (exactly FAISS IndexFlat
  semantics, distributed).
* IVF-style coarse quantization — assign every vector to its nearest of C
  deterministic centroids (the IVF "coarse quantizer"), search only within
  the probe cell(s): corpus scan is pruned by the cell partition, the join
  shuffles on cell id. Centroids here are seeded vectors drawn from the
  corpus by hash order (deterministic; a production system would k-means on
  a sample — the operator contract is identical).

Top-k ties are broken by id so results are deterministic under parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_col


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Queries are broadcast (small side); the corpus streams through one scan.
    Self-matches (same id) are excluded.
    """
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec"))
    joined = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id", "neighbor_id",
        F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_assign_cells(vectors: DataFrame, n_cells: int = 16,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Pick C deterministic centroids and assign every vector to its cell.

    Centroids = the C corpus vectors with smallest md5(id||seed) (a seeded
    uniform draw, reproducible anywhere). They are collected to the driver
    (C rows — the IVF coarse quantizer is driver-state in FAISS too) and
    embedded as a literal array, so assignment is a single NARROW projection:
    per-row argmax via array_max over (cosine, -cell_id) structs. No
    crossJoin row blow-up, no per-id window shuffle — at 10^12 rows the
    corpus is touched exactly once, map-side. Returns (centroids, assigned).
    """
    ranked = vectors.select(
        F.col(id_col), F.col(vec_col),
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))).alias("_h"),
    ).orderBy("_h").limit(n_cells)
    centroids = ranked.select(
        F.row_number().over(Window.orderBy("_h")).alias("cell_id"),
        F.col(vec_col).alias("centroid"),
    )
    cent_rows = centroids.collect()  # C rows: tiny, sanctioned driver state
    cent_lit = F.array(*[
        F.struct(
            F.lit(int(r["cell_id"])).alias("cell_id"),
            F.array(*[F.lit(float(x)) for x in r["centroid"]]).alias("c"),
        )
        for r in cent_rows
    ])
    # max of (sim, -cell_id) == highest cosine, smallest cell_id on ties —
    # identical tie-break to the former desc(sim), asc(cell_id) window
    scored = F.transform(
        cent_lit,
        lambda ct: F.struct(
            cosine_col(F.col(vec_col), ct["c"]).alias("sim"),
            (-ct["cell_id"]).alias("neg_cell"),
        ),
    )
    best_cell = (-F.array_max(scored)["neg_cell"]).cast("int")
    assigned = vectors.select(F.col(id_col), F.col(vec_col),
                              best_cell.alias("cell_id"))
    return centroids, assigned


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", seed: int = 42) -> DataFrame:
    """IVF search: score only vectors in the query's n_probe nearest cells.

    The corpus-side join key is cell_id, so a 100 TB corpus shuffles once to
    co-locate by cell and each query touches n_probe/n_cells of it.
    """
    centroids, assigned = ivf_assign_cells(corpus, n_cells, id_col, vec_col, seed)
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    qc = q.crossJoin(F.broadcast(centroids))
    sim = cosine_col(F.col("q_vec"), F.col("centroid"))
    w = Window.partitionBy("query_id").orderBy(F.desc(sim), F.asc("cell_id"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "q_vec", "cell_id")
    )
    c = assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("c_vec"), "cell_id")
    joined = c.join(probes, "cell_id").where(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id", "neighbor_id",
        F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)
