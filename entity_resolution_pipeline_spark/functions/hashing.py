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


def _bind(value: Column, fn) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``fn`` as a bound lambda
    variable (single-element transform — same idiom as textstats._bind).
    Interpreted HOF lambdas have no common-subexpression elimination, so
    an unbound subtree referenced per element re-executes per element."""
    return F.transform(F.array(value), fn)[0]


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles of normalized text as an array<string>.

    sequence/transform over the token array — native, no UDF. The token
    array is BOUND once: the per-shingle lambda previously closed over the
    raw ``filter(split(text))`` subtree, re-tokenizing the document once
    per shingle (no CSE in interpreted lambdas) — measured 12× on the
    shingle+explode pass at sf0.1 (8.9s → 0.74s warm), identical output.
    """

    def _with_toks(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(n >= k, F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        )).otherwise(
            F.when(n > 0, F.array(F.concat_ws(" ", toks)))
            .otherwise(F.array().cast("array<string>")))

    return _bind(F.filter(F.split(text, r"\s+"), lambda t: t != ""),
                 _with_toks)


def winnow_fingerprints_col(text: Column, k: int = 4,
                            w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every word k-shingle to 32 bits, slide a
    window of ``w`` consecutive hashes, keep each window's MINIMUM, and
    return the sorted distinct selections — position-robust fingerprints
    with a guaranteed match window (any shared run of k+w-1 words shares
    at least one fingerprint), at ~1/w the density of full shingle sets.

    Zero-shuffle per-row expression (bound token + hash arrays, no CSE
    re-evaluation); the 32-bit hash is the md5-prefix integer used by
    the stratified sampler, so a DuckDB oracle reproduces it exactly.
    Docs shorter than ``k`` words degrade to one whole-doc fingerprint;
    empty docs yield an empty array."""

    def _with_hashes(hs: Column) -> Column:
        npos = F.size(hs)
        nw = F.greatest(npos - (w - 1), F.lit(1))
        wins = F.transform(
            F.sequence(F.lit(1), nw),
            lambda j: F.array_min(F.slice(hs, j, w)),
        )
        return F.array_sort(F.array_distinct(wins))

    def _with_toks(toks: Column) -> Column:
        n = F.size(toks)
        npos = F.when(n >= k, n - (k - 1)).otherwise(
            F.when(n > 0, F.lit(1)).otherwise(F.lit(0)))
        hashes = F.transform(
            F.sequence(F.lit(1), npos),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 8),
                16, 10).cast("long"),
        )
        return F.when(npos > 0, _bind(hashes, _with_hashes))                 .otherwise(F.array().cast("array<bigint>"))

    return _bind(F.filter(F.split(F.lower(text), r"\s+"),
                          lambda t: t != ""),
                 _with_toks)


def minhash_sig_col(items: Column, n_bands: int) -> Column:
    """All ``n_bands`` MinHash band minima in ONE pass: array<string> of
    8-hex-char values (lexicographic min == numeric min on uniform hex).

    One md5 digest per item yields FOUR independent 32-bit band hashes
    (non-overlapping 8-hex slices of the 32-hex digest); digest group g ≥ 1
    salts the input (``"g{g}:" || item``) for bands beyond 4. The per-group
    fold is a single ``aggregate`` over a materialized digest array, so the
    md5 cost is ceil(n_bands/4) per item — vs one md5 *per band per item*
    in the naive scheme — and every band minimum is computed in the same
    traversal. (Higher-order-function lambdas are interpreted per element
    with no common-subexpression elimination, so structuring the fold this
    way, not expression-level dedup, is what bounds the hash count.)

    Empty item arrays yield all-NULL band values: no bucket, no pairs —
    matching ``list_min([]) IS NULL`` on the SQL-oracle side.
    """
    def _digest_fn(g: int):
        if g == 0:
            return lambda s: F.md5(s)
        return lambda s: F.md5(F.concat(F.lit(f"g{g}:"), s))

    def _merge_fn(width: int):
        return lambda acc, d: F.zip_with(
            acc,
            F.array(*[F.substring(d, 1 + 8 * o, 8) for o in range(width)]),
            lambda a, x: F.least(a, x),
        )

    n_groups = (n_bands + 3) // 4
    groups: list[Column] = []
    for g in range(n_groups):
        width = min(4, n_bands - 4 * g)
        digests = F.transform(items, _digest_fn(g))
        # "g" sorts after every hex char, so it is an identity for least()
        init = F.array_repeat(F.lit("g"), width)
        groups.append(F.aggregate(digests, init, _merge_fn(width)))
    sig = F.concat(*groups) if len(groups) > 1 else groups[0]
    return F.transform(sig, lambda x: F.nullif(x, F.lit("g")))


def minhash_bands(items: Column, n_bands: int) -> list[Column]:
    """Per-band alias list (battery-facing). NOTE: referencing the shared
    signature more than once re-evaluates it under projection collapse;
    prefer :func:`minhash_sig_col` + a materialization barrier on hot paths.
    """
    sig = minhash_sig_col(items, n_bands)
    return [F.element_at(sig, b + 1).alias(f"mh_{b}") for b in range(n_bands)]


def minhash_band_fast_col(items: Column, band: int) -> Column:
    """Pipeline-internal MinHash band via native ``xxhash64`` (seeded by the
    band id folded into the hash input). ~20× cheaper than the md5 variant;
    used where cross-engine (DuckDB-oracle) reproducibility is NOT required
    — the ER pipeline's own blocking. Deterministic across runs/cluster
    sizes (xxhash64 has a fixed spec)."""
    hashed = F.transform(items, lambda s: F.xxhash64(F.lit(band), s))
    return F.array_min(hashed)


def salt_fast_col(id_col: Column, n_salts: int | Column) -> Column:
    """Deterministic salt bucket via xxhash64 (pipeline-internal).
    ``n_salts`` may be a Column (per-row adaptive width)."""
    n = n_salts if isinstance(n_salts, Column) else F.lit(n_salts)
    return F.pmod(F.xxhash64(id_col), n).cast("int")


def simhash_col(items: Column, bits: int = 32) -> Column:
    """SimHash over an item array, native expressions only.

    Each item hashes to `bits` bits (from its md5); the signature bit_i is 1
    iff more items have bit_i set than unset:

        per-item int h = first 8 hex chars of md5 → conv to long (32 bits)
        bit_i vote = sum over items of (2*((h >> i) & 1) - 1)
        signature = Σ_i (vote_i > 0) << i

    Evaluated as ONE fold carrying the full vote vector (array<long> of
    ``bits``): per-bit aggregates would each inline and re-evaluate the
    md5 transform (HOF lambdas are interpreted, no CSE), costing bits× the
    hashing — the single-fold shape does one md5 per item total.
    """
    ints = F.transform(
        items, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    idx = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        ints,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            # (h >> i) & 1 via exact double arithmetic (h < 2^32 « 2^53)
            F.transform(idx, lambda i: F.pmod(
                F.floor(h / F.pow(F.lit(2.0), i)).cast("long"), F.lit(2))),
            lambda a, b: a + (b * 2 - 1),
        ),
    )
    weighted = F.zip_with(
        votes, idx,
        lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i)).otherwise(F.lit(0.0)),
    )
    return F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x).cast("long")


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
