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

Two constant-factor rules enforced here, both measured at the 320k-page /
75M-hit-row bench scale where this stage dominates end-to-end wall clock:

* the canonical filter compares the INT salt columns carried by
  ``salted_blocking_table`` (g/sp/sq) — recomputing xxhash64 salts and
  building a concat'd key string per joined row costs ~2 hashes + a
  string alloc × 10⁸;
* the ``sources`` provenance string is an ordered concat of per-source
  max-flags, not ``collect_set`` — set-aggregation buffers force
  ObjectHashAggregate (sort-based fallback under pressure), while
  sum+max aggregates keep the whole pair aggregation inside
  whole-stage-codegen HashAggregate with map-side partial combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .blocking import SOURCE_SCORES
from ..functions.hashing import salt_fast_col


def candidate_pairs(salted_blocks: DataFrame, top_n: int | None = 300,
                    n_salts: int = 8,
                    compact_shuffle_keys: bool = True,
                    url_dim: DataFrame | None = None) -> DataFrame:
    """(join_key, block_key, source, url[, g, sp, sq]) → (url_a, url_b,
    blocking_score, sources).

    Each distinct shared key contributes its source weight exactly once
    (canonical-bucket filter above); a pair sharing many MinHash bands
    (strong similarity evidence) outranks pairs co-occurring only under one
    weak mega-key, or top-N would starve true duplicates. ``n_salts`` is
    only used by the legacy fallback for tables without salt columns (it
    must then match the value used by ``salted_blocking_table``).

    All score weights have ≤1 fractional bit (3.0 / 2.5 / 1.0), so the sum
    is exact in IEEE double regardless of aggregation order — the output is
    deterministic under any partitioning.

    ``compact_shuffle_keys``: the pair aggregation's shuffle and hash-map
    working set is dominated by the two url STRINGS on every pre-agg row
    (~10⁸ rows × 2×40-80 bytes at production corpus scale); with it on,
    the orientation/canonical filters still run on the real urls map-side,
    but the rows entering the exchange carry a 128-bit url digest per side
    (two independently-seeded xxhash64 longs); the aggregation AND the
    top-N cap run on digests, and the strings are joined back from a
    distinct-url dim only for the capped output rows (10.8M instead of
    75M pre-agg at the bench corpus; broadcast at small scale,
    AQE-planned shuffle join at large). Uncapped output is byte-identical
    to the string path; with a cap, score TIES at the cap boundary break
    on the url_b digest instead of the url_b string — both arbitrary
    deterministic orders (the cap bounds skew; it does not prefer
    particular tied candidates). Collision risk of the 128-bit key:
    P ≈ n²/2¹²⁹ — at 10¹⁰ documents ≈ 1.5e-19, i.e. never. Measured at
    320k pages / 75M hit rows, 16 cores: 68.7s → ~25s for the stage.

    ``url_dim``: an already-distinct (url) table (e.g. the extracted pages
    table) for the post-cap string map-back. Without it the dim is derived
    by scanning + distinct-ing the salted blocks table — ~17M rows and a
    shuffle that the pages table answers for free (measured 2× join-back
    cost at the 320k-page bench).
    """
    has_salt_cols = {"g", "sp", "sq"} <= set(salted_blocks.columns)
    score_map = F.create_map(*[
        x for s, v in SOURCE_SCORES.items() for x in (F.lit(s), F.lit(v))
    ])
    a_cols = ["join_key", "block_key", "source", F.col("url").alias("url_a")]
    b_cols = ["join_key", F.col("url").alias("url_b")]
    if has_salt_cols:
        a_cols += [F.col("g").alias("g_a"), "sp", "sq"]
        b_cols += [F.col("g").alias("g_b")]
    a = salted_blocks.select(*a_cols)
    b = salted_blocks.select(*b_cols)

    if has_salt_cols:
        # cold rows: sp is null (single bucket, nothing to dedup); hot rows:
        # keep only the canonical salt-pair bucket — three int comparisons
        canonical_keep = F.col("sp").isNull() | (
            (F.col("sp") == F.least("g_a", "g_b"))
            & (F.col("sq") == F.greatest("g_a", "g_b")))
    else:  # legacy tables (pre-salt-column parquet): recompute from urls
        g_a = salt_fast_col(F.col("url_a"), n_salts)
        g_b = salt_fast_col(F.col("url_b"), n_salts)
        canonical = F.concat_ws(
            "#", "block_key",
            F.least(g_a, g_b).cast("string"),
            F.greatest(g_a, g_b).cast("string"))
        canonical_keep = ((F.col("join_key") == F.col("block_key"))
                          | (F.col("join_key") == canonical))

    sources_sorted = sorted(SOURCE_SCORES)
    # shuffle_hash hint: the self-join sides have equal cardinality, and a
    # blocks table big enough to matter can NEVER be broadcast at real scale
    # — but a bench-scale corpus of templated urls parquet-compresses under
    # autoBroadcastJoinThreshold, and the resulting BroadcastHashJoin is a
    # scaling cliff: one serial 10⁷-entry HashedRelation build, every probe
    # task contending for a multi-GB on-heap table (measured: enumeration
    # 16.3s @ 4 cores → 14.0s @ 16, i.e. no scaling at all). The shuffled
    # hash join partitions both sides on the salted join_key — per-task
    # build ≈ |blocks|/partitions rows — and is the plan a 100-TB corpus
    # would get anyway. Not sort-merge: the per-partition sort of the
    # replicated hot-bucket rows costs more than the bounded hash build.
    hits = (
        a.join(b.hint("shuffle_hash"), "join_key")
        .where(F.col("url_a") < F.col("url_b"))
        .where(canonical_keep)
    )
    flag_aggs = [F.max((F.col("source") == s).cast("int")).alias(f"_has_{s}")
                 for s in sources_sorted]
    # concat_ws skips nulls; sources_sorted is alphabetical, so the result
    # is byte-identical to array_join(array_sort(collect_set))
    sources_expr = F.concat_ws("|", *[
        F.when(F.col(f"_has_{s}") == 1, F.lit(s)) for s in sources_sorted
    ]).alias("sources")

    if compact_shuffle_keys:
        def _digest(col: str) -> list:
            return [F.xxhash64(F.col(col)).alias(f"_h1_{col}"),
                    F.xxhash64(F.lit("uid2"), F.col(col)).alias(f"_h2_{col}")]

        key_cols = ["_h1_url_a", "_h2_url_a", "_h1_url_b", "_h2_url_b"]
        agg = (
            hits.select(*_digest("url_a"), *_digest("url_b"),
                        score_map[F.col("source")].alias("_w"), "source")
            .groupBy(*key_cols)
            .agg(F.sum("_w").alias("blocking_score"), *flag_aggs)
            .select(*key_cols, "blocking_score", sources_expr)
        )
        if top_n is not None:
            # cap BEFORE the url map-back so only kept rows pay the joins;
            # grouping by the digest == grouping by url_a. Score ties break
            # on the url_b DIGEST here (string path: on url_b) — both are
            # arbitrary deterministic choices; the cap exists to bound
            # skew, not to prefer particular tied candidates.
            w = Window.partitionBy("_h1_url_a", "_h2_url_a").orderBy(
                F.desc("blocking_score"), F.asc("_h1_url_b"),
                F.asc("_h2_url_b"))
            agg = agg.withColumn("rn", F.row_number().over(w)) \
                     .where(F.col("rn") <= top_n).drop("rn")
        url_src = (url_dim.select("url") if url_dim is not None
                   else salted_blocks.select("url").distinct())
        urls = url_src.select(
            F.xxhash64("url").alias("_h1"),
            F.xxhash64(F.lit("uid2"), "url").alias("_h2"), "url")
        return (
            agg.join(urls.select(F.col("_h1").alias("_h1_url_a"),
                                 F.col("_h2").alias("_h2_url_a"),
                                 F.col("url").alias("url_a")),
                     ["_h1_url_a", "_h2_url_a"])
            .join(urls.select(F.col("_h1").alias("_h1_url_b"),
                              F.col("_h2").alias("_h2_url_b"),
                              F.col("url").alias("url_b")),
                  ["_h1_url_b", "_h2_url_b"])
            .select("url_a", "url_b", "blocking_score", "sources")
        )

    pairs = (
        hits.groupBy("url_a", "url_b")
        .agg(F.sum(score_map[F.col("source")]).alias("blocking_score"),
             *flag_aggs)
        .select("url_a", "url_b", "blocking_score", sources_expr)
    )
    if top_n is not None:
        w = Window.partitionBy("url_a").orderBy(
            F.desc("blocking_score"), F.asc("url_b")  # deterministic tie-break
        )
        pairs = pairs.withColumn("rn", F.row_number().over(w)) \
                     .where(F.col("rn") <= top_n).drop("rn")
    return pairs
