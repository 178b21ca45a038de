"""Candidate-pair generation (J1/J10 + A1 + W1).

Within-block self-join with ``url_a < url_b`` (never a cross join —
blocking bounds the pair space, /root/reference/docs/METHODOLOGY.md:103-113),
then the reference's group-aggregate of per-source scores
(src/blocking.py:380-385) and top-N-per-query window cap (:389-392).

The self-join shuffles on ``join_key`` (salt-aware, so hot blocks are
already split before the shuffle); AQE coalesces the small partitions.

Salt-replica dedup is a FILTER, not an aggregation: under triangular
salting a pair (a, b) inside one hot block appears in every bucket both
members share — exactly one bucket (min(gₐ,g_b), max(gₐ,g_b)) when their
salts differ, but all n_salts buckets (g, p) when gₐ = g_b = g. Keeping a
hit only in its *canonical* bucket (the one whose salt-pair suffix equals
(min(gₐ,g_b), max(gₐ,g_b))) makes every (pair, block_key) hit unique by
construction, so per-pair scoring is a plain map-side-combinable SUM of
source weights instead of the round-1 ``collect_set(struct(block_key,
source))`` — whose per-group object sets (tens of entries × ~50-byte keys
× 10⁸ pre-agg rows at 64-member clusters) forced sort-based fallback and
spill, flat-lining the stage from 8 to 32 cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .blocking import SOURCE_SCORES
from ..functions.hashing import salt_fast_col


def candidate_pairs(salted_blocks: DataFrame, top_n: int | None = 300,
                    n_salts: int = 8) -> DataFrame:
    """(join_key, block_key, source, url) → (url_a, url_b, blocking_score, sources).

    Each distinct shared key contributes its source weight exactly once
    (canonical-bucket filter above); a pair sharing many MinHash bands
    (strong similarity evidence) outranks pairs co-occurring only under one
    weak mega-key, or top-N would starve true duplicates. ``n_salts`` must
    match the value used by ``salted_blocking_table`` (the salt is
    recomputed from the url, not carried through the table).

    All score weights have ≤1 fractional bit (3.0 / 2.5 / 1.0), so the sum
    is exact in IEEE double regardless of aggregation order — the output is
    deterministic under any partitioning.
    """
    score_map = F.create_map(*[
        x for s, v in SOURCE_SCORES.items() for x in (F.lit(s), F.lit(v))
    ])
    a = salted_blocks.select(
        "join_key", "block_key", "source",
        F.col("url").alias("url_a"),
    )
    b = salted_blocks.select(
        "join_key",
        F.col("url").alias("url_b"),
    )
    g_a = salt_fast_col(F.col("url_a"), n_salts)
    g_b = salt_fast_col(F.col("url_b"), n_salts)
    canonical = F.concat_ws(
        "#", "block_key",
        F.least(g_a, g_b).cast("string"), F.greatest(g_a, g_b).cast("string"))
    pairs = (
        a.join(b, "join_key")
        .where(F.col("url_a") < F.col("url_b"))
        # cold rows: join_key == block_key (single bucket, nothing to dedup);
        # hot rows: keep only the canonical salt-pair bucket
        .where((F.col("join_key") == F.col("block_key"))
               | (F.col("join_key") == canonical))
        .groupBy("url_a", "url_b")
        .agg(
            F.sum(score_map[F.col("source")]).alias("blocking_score"),
            F.array_join(F.array_sort(F.collect_set("source")), "|")
            .alias("sources"),
        )
    )
    if top_n is not None:
        w = Window.partitionBy("url_a").orderBy(
            F.desc("blocking_score"), F.asc("url_b")  # deterministic tie-break
        )
        pairs = pairs.withColumn("rn", F.row_number().over(w)) \
                     .where(F.col("rn") <= top_n).drop("rn")
    return pairs
