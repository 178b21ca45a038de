"""Deterministic hashing primitives for blocking / dedup — all native.

MinHash and SimHash are built from ``md5`` (a cross-engine standard: Spark,
DuckDB, and any SQL oracle produce identical hex digests), not from Spark's
murmur ``hash()``, so every signature is reproducible outside Spark for
correctness checking. Hex-string minima are totally ordered and
engine-independent.

These replace the reference's FAISS index files and dict-based inverted
indexes (/root/reference/src/blocking.py:37-107, src/embeddings.py:258-334):
a "blocking index" here is just a DataFrame of (block_key, id) — lookup is an
equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles of normalized text as an array<string>.

    sequence/transform over the token array — native, no UDF.
    """
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    n = F.size(toks)
    return F.when(n >= k, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )).otherwise(F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array()))


def minhash_band_col(items: Column, band: int) -> Column:
    """MinHash for one band: min over items of md5(band || ':' || item).

    A family of independent hash functions indexed by the band salt; the
    minimum of a uniform hash over a set is the classic MinHash statistic.
    Returned as the 32-hex-char digest string (lexicographic min == numeric
    min on the uniform hex encoding).
    """
    hashed = F.transform(items, lambda s: F.md5(F.concat(F.lit(f"{band}:"), s)))
    return F.array_min(hashed)


def minhash_bands(items: Column, n_bands: int) -> list[Column]:
    return [minhash_band_col(items, b).alias(f"mh_{b}") for b in range(n_bands)]


def minhash_band_fast_col(items: Column, band: int) -> Column:
    """Pipeline-internal MinHash band via native ``xxhash64`` (seeded by the
    band id folded into the hash input). ~20× cheaper than the md5 variant;
    used where cross-engine (DuckDB-oracle) reproducibility is NOT required
    — the ER pipeline's own blocking. Deterministic across runs/cluster
    sizes (xxhash64 has a fixed spec)."""
    hashed = F.transform(items, lambda s: F.xxhash64(F.lit(band), s))
    return F.array_min(hashed)


def salt_fast_col(id_col: Column, n_salts: int) -> Column:
    """Deterministic salt bucket via xxhash64 (pipeline-internal)."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_salts)).cast("int")


def simhash_col(items: Column, bits: int = 32) -> Column:
    """SimHash over an item array, native expressions only.

    Each item hashes to `bits` bits (from its md5); the signature bit_i is 1
    iff more items have bit_i set than unset. Implemented as a fold over the
    bit positions of per-item integer hashes:

        per-item int h = first 8 hex chars of md5 → conv to long (32 bits)
        bit_i vote = sum over items of (2*((h >> i) & 1) - 1)
        signature = Σ_i (vote_i > 0) << i
    """
    ints = F.transform(
        items, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    def bit_vote(i: int) -> Column:
        votes = F.aggregate(
            ints,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
        )
        return F.when(votes > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))

    sig = bit_vote(0)
    for i in range(1, bits):
        sig = sig + bit_vote(i)
    return sig


def hamming64_col(a: Column, b: Column) -> Column:
    """Hamming distance between two long signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def token_hash64_col(item: Column) -> Column:
    """Engine-portable 60-bit integer hash: first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("long")


def salt_col(id_col: Column, n_salts: int) -> Column:
    """Deterministic salt bucket for hot-key splitting: pmod(md5-int, k)."""
    return F.pmod(token_hash64_col(id_col), F.lit(n_salts)).cast("int")


def with_block_stats(blocks: DataFrame, key: str = "block_key") -> DataFrame:
    """Per-key member counts — the skew statistic that drives salting
    (analog of max_bucket_size stats, /root/reference/src/blocking.py:62-72)."""
    return blocks.groupBy(key).agg(F.count("*").alias("block_size"))
