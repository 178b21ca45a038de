"""Blocking — inverted indexes as DataFrames, with explicit skew handling.

The reference builds three dict-based inverted indexes (domain,
country+prefix, rare-token: /root/reference/src/blocking.py:114-247) and
probes them by merge (:254-396). Here an index IS a DataFrame
``(block_key, source, url)``; probing is an equi-join, so Catalyst/AQE pick
the physical join and the blocking table can be written/partitioned/reused.

Skew (the north-rule centerpiece): per-key counts are computed first
(word-count A2); keys above ``hot_threshold`` get triangular salting — a
member with salt g is replicated to every salt-pair bucket (min(g,p),
max(g,p)), bounding any single join task at ~(2·|block|/n_salts)² pairs
while losing no cross-salt pair. Stop-keys above ``stop_threshold`` are
dropped entirely (the reference's rare-token frequency cutoff,
src/blocking.py:169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.domains import hostname_col
from ..functions.hashing import minhash_band_fast_col, salt_fast_col
from ..functions.normalize import fingerprint_col, prefix_col, tokens_col

# Per-source blocking scores (summed at pair aggregation, as in the
# reference, src/blocking.py:380-385) — content-similarity keys (fp8, mh)
# must outrank the domain-composite prior so that under the top-N cap true
# duplicates outrank pages that merely share a host and a content prefix.
SOURCE_SCORES = {"fp8": 3.0, "mh": 2.5, "dom": 1.0}


def blocking_table(pages: DataFrame, n_bands: int = 12, prefix_k: int = 8,
                   min_token_len: int = 2, dom_prefix_k: int = 4) -> DataFrame:
    """pages(url, text_norm) → (block_key, source, url).

    Three key families, one narrow projection each, unioned (no shuffle
    until pair-gen):

    * ``dom``: host **composite with the fingerprint prefix** — the
      reference's country+name-prefix composite index
      (/root/reference/src/blocking.py:349-360) transplanted: a bare host
      key makes every big site a quadratic block of unrelated pages, while
      host+content-prefix only co-blocks same-site pages that could
      actually match. Full hostname, not eTLD+1 (an eTLD+1 block is a
      hosting platform = useless mega-block).
    * ``fp8``: global fingerprint prefix (finds cross-domain mirrors).
    * ``mh``: MinHash bands over the token set (reorder-invariant;
      xxhash64-seeded, deterministic).
    """
    toks = tokens_col(F.col("text_norm"), min_token_len)
    fp_full = fingerprint_col(F.col("text_norm"), min_token_len)
    dom = pages.select(
        F.concat(F.lit("dom:"), hostname_col(F.col("url")), F.lit(":"),
                 prefix_col(fp_full, dom_prefix_k)).alias("block_key"),
        F.lit("dom").alias("source"),
        "url",
    )
    fp = pages.select(
        F.concat(F.lit("fp8:"), prefix_col(fp_full, prefix_k)).alias("block_key"),
        F.lit("fp8").alias("source"),
        "url",
    ).where(F.length("block_key") > 4)
    mh = pages.select("url", toks.alias("toks")).where(F.size("toks") > 0)
    bands = mh.select(
        "url",
        F.explode(F.array(*[
            F.concat(F.lit(f"mh:{b}:"),
                     minhash_band_fast_col(F.col("toks"), b).cast("string"))
            for b in range(n_bands)
        ])).alias("block_key"),
    ).select("block_key", F.lit("mh").alias("source"), "url")
    return dom.unionByName(fp).unionByName(bands)


def key_stats(blocks: DataFrame) -> DataFrame:
    """Distributed word-count over keys — drives salting + lineage."""
    return blocks.groupBy("block_key").agg(F.count("*").alias("block_size"))


def salted_blocking_table(
    blocks: DataFrame,
    hot_threshold: int = 64,
    stop_threshold: int = 4096,
    n_salts: int = 8,
    n_docs: int | None = None,
    stop_frac: float = 0.1,
) -> DataFrame:
    """Apply stop-key drop + triangular hot-key salting.

    Output: (join_key, block_key, source, url, g, sp, sq) where join_key
    embeds the salt-pair for hot keys and ``g``/``sp``/``sq`` carry the
    member's own salt and the bucket's salt-pair as INTS (null on cold
    rows, where join_key=block_key). Carrying them lets the pair
    generator's canonical-bucket dedup filter compare three ints per
    joined row instead of recomputing two xxhash64 salts and building a
    concat'd key string per PAIR — at production scale that filter sees
    ~10⁸ pre-agg rows, so the per-row expression cost is the stage's
    constant factor.

    Stop keys: a key covering more than ``stop_frac`` of the corpus (e.g. a
    MinHash band whose minimum lands on a ubiquitous token) carries no
    similarity signal and would contribute O(n²) pairs — dropped, exactly as
    the reference excludes over-frequent rare-token buckets
    (src/blocking.py:169). ``stop_threshold`` is the absolute ceiling.

    The input ``blocks`` plan is persisted here: it feeds BOTH the key-stats
    aggregate and the main join, and the blocking projection (tokenize +
    fingerprint + n_bands MinHash folds + explode) is the dominant per-row
    cost — unpersisted it executes twice (the same recompute anti-pattern
    that made round-1 `dedup_lsh_pairs` 46% of the bench suite). The cache
    is attached to the result as ``_erps_persisted`` for
    ``operators.scoring.release_persisted`` once the caller materializes.
    """
    from pyspark import StorageLevel

    blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)
    eff_stop = stop_threshold
    if n_docs is not None:
        # floor at 4×hot so tiny corpora never stop-drop their (still
        # meaningful) hot blocks; at scale the corpus fraction dominates —
        # a key covering stop_frac of 10^12 docs carries no signal and
        # would contribute O((n·frac)²) pairs
        eff_stop = min(stop_threshold,
                       max(int(n_docs * stop_frac), 4 * hot_threshold))
    stats = key_stats(blocks)
    b = blocks.join(F.broadcast(stats.where(F.col("block_size") >= hot_threshold)),
                    "block_key", "left")
    b = b.where(F.coalesce(F.col("block_size"), F.lit(0)) < eff_stop)

    null_int = F.lit(None).cast("int")
    cold = b.where(F.col("block_size").isNull()).select(
        F.col("block_key").alias("join_key"), "block_key", "source", "url",
        null_int.alias("g"), null_int.alias("sp"), null_int.alias("sq"))

    # Adaptive salt width: replication through the self-join shuffle is
    # s×n rows per block while the per-bucket task bound is (2s/n)², so a
    # block just over hot_threshold needs 2 salts, not n_salts. n_k =
    # clamp(ceil(s/hot_threshold), 2, n_salts) keeps every bucket at
    # ≈2·hot_threshold members with minimal replication — measured at the
    # 320k-page bench this cuts hot replica rows 16.7M → ~4M (most hot
    # blocks sit just above the threshold) without changing the pair set:
    # triangular salting is lossless for ANY per-block width, and both
    # members of a block derive the same n_k from the shared block_size.
    n_k = F.least(
        F.lit(n_salts),
        F.greatest(F.lit(2), F.ceil(F.col("block_size") / F.lit(hot_threshold))
                   .cast("int")),
    )
    hot = b.where(F.col("block_size").isNotNull()) \
        .withColumn("nk", n_k) \
        .withColumn("g", salt_fast_col(F.col("url"), F.col("nk")))
    hot = hot.select(
        "block_key", "source", "url", "g",
        F.explode(F.sequence(F.lit(0), F.col("nk") - 1)).alias("p"),
    ).select(
        F.concat_ws(
            "#", "block_key",
            F.least("g", "p").cast("string"), F.greatest("g", "p").cast("string"),
        ).alias("join_key"),
        "block_key", "source", "url", "g",
        F.least("g", "p").cast("int").alias("sp"),
        F.greatest("g", "p").cast("int").alias("sq"),
    )
    out = cold.unionByName(hot)
    out._erps_persisted = blocks  # released by release_persisted() post-write
    return out
