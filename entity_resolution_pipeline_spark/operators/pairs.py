"""Candidate-pair generation (J1/J10 + A1 + W1).

Within-block self-join with ``url_a < url_b`` (never a cross join —
blocking bounds the pair space, /root/reference/docs/METHODOLOGY.md:103-113),
then the reference's group-aggregate of per-source scores
(src/blocking.py:380-385) and top-N-per-query window cap (:389-392).

The self-join shuffles on ``join_key`` (salt-aware, so hot blocks are
already split before the shuffle); AQE coalesces the small partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .blocking import SOURCE_SCORES


def candidate_pairs(salted_blocks: DataFrame, top_n: int | None = 300) -> DataFrame:
    """(join_key, block_key, source, url) → (url_a, url_b, blocking_score, sources).

    Dedup across keys AND across salt-pair replicas happens in the same
    group-aggregate (a pair found under k keys scores the sum of distinct
    source scores, matching the reference's per-source sum).
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
    pairs = (
        a.join(b, "join_key")
        .where(F.col("url_a") < F.col("url_b"))
        # ONE shuffle for dedup + scoring: collect_set collapses salt-pair
        # replicas of the same shared key inside the group-aggregate (with
        # map-side partial aggregation), instead of a separate distinct()
        .groupBy("url_a", "url_b")
        .agg(F.collect_set(F.struct("block_key", "source")).alias("keys"))
        .select(
            "url_a", "url_b",
            # each shared key scores once: a pair sharing many MinHash bands
            # (strong similarity evidence) must outrank pairs co-occurring
            # only under one weak mega-key, or top-N starves true duplicates
            F.aggregate(
                F.transform(F.col("keys"), lambda k: score_map[k.getField("source")]),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("blocking_score"),
            F.array_join(
                F.array_sort(F.array_distinct(
                    F.transform(F.col("keys"), lambda k: k.getField("source")))), "|",
            ).alias("sources"),
        )
    )
    if top_n is not None:
        w = Window.partitionBy("url_a").orderBy(
            F.desc("blocking_score"), F.asc("url_b")  # deterministic tie-break
        )
        pairs = pairs.withColumn("rn", F.row_number().over(w)) \
                     .where(F.col("rn") <= top_n).drop("rn")
    return pairs
