"""Deduplication operators for web-scale training-data pipelines.

The reference dedups only exactly (`drop_duplicates`,
/root/reference/src/data_io.py:372) and near-dups implicitly through the ER
scorer. A 100 TB corpus pipeline needs dedup as a first-class operator
family, so this module provides:

* exact dedup            — md5 content hash → hash-groupBy (one shuffle)
* MinHash + LSH near-dup — shingle → per-band MinHash → band-bucket
                           self-join → verified n-gram Jaccard
* SimHash near-dup       — 32-bit native SimHash, band join on the upper
                           bits, verified by Hamming distance
* n-gram Jaccard         — exact verification metric over shingle arrays
* embedding-cosine       — near-dup over an `array<float>` column via an
                           LSH-free all-pairs join (small side) or
                           sign-random-projection buckets (scale path)

Everything is native Column expressions (md5-based hashing so DuckDB and any
SQL oracle reproduce the signatures bit-for-bit; see functions/hashing.py).
At 100 TB the band self-joins shuffle on the band key, so hot bands are
subject to the same stop-key guard as blocking (a band whose minimum lands on
a ubiquitous shingle is dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import minhash_band_col, shingles_col, simhash_col
from ..functions.similarity import cosine_col


# --- exact dedup ---------------------------------------------------------------


def exact_duplicate_groups(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_dups, keeper, ids).

    One hash-aggregate; map-side partial aggregation makes this a single
    cheap shuffle even at 10^12 rows. ``keeper`` is the minimum id
    (deterministic, not file-order like the reference's keep='first').
    """
    return (
        docs.select(F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_hash"),
                    F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper"),
            F.array_sort(F.collect_list(id_col)).alias("ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the min-id row per distinct content hash (all rows pass through)."""
    w = Window.partitionBy(F.md5(F.coalesce(F.col(text_col), F.lit(""))))
    return (
        docs.withColumn("_keep", F.min(id_col).over(w) == F.col(id_col))
        .where("_keep").drop("_keep")
    )


# --- MinHash + LSH near-dup ------------------------------------------------------


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       n_bands: int = 8) -> DataFrame:
    """(id, mh_0..mh_{B-1}) — per-band MinHash over word k-shingles."""
    sh = shingles_col(F.lower(F.col(text_col)), k)
    return docs.select(
        F.col(id_col),
        *[minhash_band_col(sh, b).alias(f"mh_{b}") for b in range(n_bands)],
    )


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        n_bands: int = 8,
                        stop_threshold: int | None = None) -> DataFrame:
    """Near-dup candidates: ids sharing ≥1 MinHash band bucket.

    explode(bands) → self-join on (band, value) → distinct pair. The join
    shuffles on the band bucket; ``stop_threshold`` drops degenerate buckets
    (same guard as blocking stop-keys) so no task goes quadratic.
    """
    sigs = minhash_signatures(docs, id_col, text_col, k, n_bands)
    buckets = sigs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*[
            F.concat(F.lit(f"{b}:"), F.col(f"mh_{b}")) for b in range(n_bands)
        ])).alias("bucket"),
    )
    if stop_threshold is not None:
        sizes = buckets.groupBy("bucket").agg(F.count("*").alias("n"))
        buckets = buckets.join(
            F.broadcast(sizes.where(F.col("n") > stop_threshold)), "bucket", "left_anti")
    a = buckets.select("bucket", F.col("id").alias("id_a"))
    b = buckets.select("bucket", F.col("id").alias("id_b"))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs: (id_a, id_b, jaccard).

    Two equi-joins to co-locate both shingle arrays on the pair row, then
    pure array arithmetic (no Python).
    """
    sh = docs.select(F.col(id_col).alias("id"),
                     shingles_col(F.lower(F.col(text_col)), k).alias("sh"))
    j = (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "id_a", "id_b",
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6).alias("jaccard"),
    )


def minhash_near_duplicates(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 3,
                            n_bands: int = 8, threshold: float = 0.7,
                            stop_threshold: int | None = None) -> DataFrame:
    """LSH recall + exact Jaccard precision: the classic two-phase near-dup."""
    cands = lsh_candidate_pairs(docs, id_col, text_col, k, n_bands, stop_threshold)
    verified = ngram_jaccard_pairs(docs, cands, id_col, text_col, k)
    return verified.where(F.col("jaccard") >= threshold)


# --- SimHash near-dup -------------------------------------------------------------


def simhash_table(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", bits: int = 32) -> DataFrame:
    """(id, simhash) — native 32-bit SimHash over lowercase word 1-grams."""
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    )
    return docs.select(F.col(id_col), simhash_col(toks, bits).alias("simhash"))


def simhash_near_duplicates(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", bits: int = 32,
                            band_bits: int = 8, max_hamming: int = 3) -> DataFrame:
    """Pairs within ``max_hamming`` bits, found via band join.

    The signature is split into ``bits/band_bits`` bands; by pigeonhole any
    pair within max_hamming < n_bands differing bits shares ≥1 exact band.
    Band equality is the shuffle key — same partitioning story as LSH.
    """
    sigs = simhash_table(docs, id_col, text_col, bits)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    bands = sigs.select(
        F.col(id_col).alias("id"), "simhash",
        F.explode(F.array(*[
            F.concat(F.lit(f"{i}:"),
                     F.shiftright("simhash", i * band_bits).bitwiseAND(F.lit(mask))
                     .cast("string"))
            for i in range(n_bands)
        ])).alias("band"),
    )
    a = bands.select("band", F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = bands.select("band", F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"))
    pairs = (
        a.join(b, "band")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")) \
                .where(F.col("hamming") <= max_hamming)


# --- embedding-cosine near-dup ------------------------------------------------------


def embedding_near_duplicates(emb: DataFrame, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95,
                              n_planes: int = 0) -> DataFrame:
    """Pairs with cosine ≥ threshold over an array<float> column.

    ``n_planes=0``: all-pairs join (correct baseline; only for corpora that
    fit a shuffle — tests/bench). ``n_planes>0``: sign-random-projection
    bucketing — deterministic pseudo-planes derived from md5 of the dimension
    index, bucket key = sign bits; near-identical vectors almost surely share
    the bucket, cutting the join from O(n²) to per-bucket. The scale path
    loses recall near the threshold boundary (documented LSH trade-off).
    """
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if n_planes > 0:
        sig = _srp_signature(F.col("v"), n_planes)
        base = base.withColumn("bucket", sig)
        a = base.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
        b = base.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
        pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    else:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = cosine_col(F.col("v_a"), F.col("v_b"))
    return pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")) \
                .where(F.col("cosine") >= threshold)


def _srp_signature(vec, n_planes: int):
    """Sign-random-projection bucket key from deterministic pseudo-planes.

    Plane p's weight for dimension i = (md5-derived int of "p:i") mapped to
    ±1; the projection sign bit concatenation is the bucket. All native.
    """
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = []
    for p in range(n_planes):
        w = F.zip_with(
            vec.cast("array<double>"),
            dim_idx,
            lambda x, i: x * (
                F.when(
                    F.pmod(
                        F.conv(F.substring(F.md5(F.concat(F.lit(f"{p}:"),
                                                          i.cast("string"))), 1, 8),
                               16, 10).cast("long"),
                        F.lit(2)) == 0,
                    F.lit(1.0)).otherwise(F.lit(-1.0))
            ),
        )
        proj = F.aggregate(w, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
