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

from pyspark import StorageLevel

from ..functions.hashing import minhash_sig_col, shingles_col, simhash_col



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


def shingle_table(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, sh) — word k-shingle arrays, the shared input of the whole
    MinHash family. Persist this once and feed it to both
    :func:`lsh_candidate_pairs` and :func:`ngram_jaccard_pairs`: shingling +
    hashing is the dominant per-row cost of near-dup, and every extra
    consumer of an unpersisted plan re-runs it (the round-1 bench paid that
    ~4× on `dedup_lsh_pairs`).
    """
    return docs.select(F.col(id_col).alias("id"),
                       shingles_col(F.lower(F.col(text_col)), k).alias("sh"))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       n_bands: int = 8) -> DataFrame:
    """(id, mh_0..mh_{B-1}) — per-band MinHash over word k-shingles.

    The shared signature array is aliased in an inner projection so the
    per-band split does not duplicate the fold (CollapseProject keeps
    non-cheap aliases referenced more than once out-of-line).
    """
    sig = minhash_sig_col(shingles_col(F.lower(F.col(text_col)), k), n_bands)
    inner = docs.select(F.col(id_col), sig.alias("_sig"))
    return inner.select(
        F.col(id_col),
        *[F.element_at("_sig", b + 1).alias(f"mh_{b}") for b in range(n_bands)],
    )


def lsh_candidate_pairs(docs: DataFrame | None = None, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        n_bands: int = 8,
                        stop_threshold: int | None = None,
                        shingles: DataFrame | None = None) -> DataFrame:
    """Near-dup candidates: ids sharing ≥1 MinHash band bucket.

    signature fold (one pass) → posexplode(bands) → self-join on the band
    bucket → distinct pair. The signature table is persisted: it feeds the
    bucket-size stats guard AND both self-join sides, and recomputing the
    shingle→md5 chain per consumer was 46% of the round-1 bench suite.
    ``stop_threshold`` drops degenerate buckets (same guard as blocking
    stop-keys) so no task goes quadratic. Pass a precomputed ``shingles``
    table (see :func:`shingle_table`) to share the shingling cost with the
    Jaccard verify stage.
    """
    if shingles is None:
        shingles = shingle_table(docs, id_col, text_col, k)
    sigs = (
        shingles.select("id", minhash_sig_col(F.col("sh"), n_bands).alias("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    buckets = (
        sigs.select("id", F.posexplode("sig").alias("band", "v"))
        .where(F.col("v").isNotNull())
        .select("id", F.concat(F.col("band").cast("string"), F.lit(":"),
                               F.col("v")).alias("bucket"))
    )
    if stop_threshold is not None:
        sizes = buckets.groupBy("bucket").agg(F.count("*").alias("n"))
        buckets = buckets.join(
            F.broadcast(sizes.where(F.col("n") > stop_threshold)), "bucket", "left_anti")
    a = buckets.select("bucket", F.col("id").alias("id_a"))
    b = buckets.select("bucket", F.col("id").alias("id_b"))
    out = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # deterministic release: callers unpersist via scoring.release_persisted
    # once materialized, instead of waiting on ContextCleaner GC timing
    out._erps_persisted = [sigs]
    return out


def ngram_jaccard_pairs(docs: DataFrame | None = None, pairs: DataFrame = None,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3,
                        shingles: DataFrame | None = None) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs: (id_a, id_b, jaccard).

    Two equi-joins to co-locate both shingle arrays on the pair row, then
    pure array arithmetic (no Python). Pass the same persisted ``shingles``
    table used for candidate generation so shingling runs once end-to-end.
    """
    j, inter, union = _pair_shingle_frame(docs, pairs, id_col, text_col,
                                          k, shingles)
    out = j.select(
        "id_a", "id_b",
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6).alias("jaccard"),
    )
    # forward the candidate table's persisted signature handle — dropping
    # it here silently leaked the sigs cache into the rest of the session
    # (found by tools/audit_cache_bleed.py)
    out._erps_persisted = list(getattr(pairs, "_erps_persisted", None) or [])
    return out


def _pair_shingle_frame(docs, pairs, id_col, text_col, k, shingles):
    """Shared scaffold of the pair verifiers: co-locate both shingle
    arrays on the pair row (two equi-joins against ONE shingle table) and
    hand back the frame plus the intersection/union size expressions —
    Jaccard and containment must stay on the same join contract and
    rounding policy or batch/oracle parity diverges."""
    sh = shingles if shingles is not None else shingle_table(docs, id_col, text_col, k)
    j = (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j, inter, union


def ngram_containment_pairs(docs: DataFrame | None = None,
                            pairs: DataFrame = None,
                            id_col: str = "doc_id", text_col: str = "text",
                            k: int = 3,
                            shingles: DataFrame | None = None) -> DataFrame:
    """One-sided shingle CONTAINMENT for candidate pairs:
    (id_a, id_b, jaccard, containment_a, containment_b) with
    containment_x = |A∩B| / |X| — the partial-copy signal real curation
    pipelines add to Jaccard: a short document fully embedded in a long
    one has low Jaccard (the union is large) but containment ≈ 1 on the
    short side. Same two co-locating equi-joins + pure array arithmetic
    as :func:`ngram_jaccard_pairs`; pass the shared persisted
    ``shingles`` table so the corpus is shingled once end-to-end.
    """
    j, inter, union = _pair_shingle_frame(docs, pairs, id_col, text_col,
                                          k, shingles)
    na = F.size("sh_a").cast("double")
    nb = F.size("sh_b").cast("double")
    out = j.select(
        "id_a", "id_b",
        F.round(F.when(union > 0, inter / union)
                .otherwise(F.lit(0.0)), 6).alias("jaccard"),
        F.round(F.when(na > 0, inter / na)
                .otherwise(F.lit(0.0)), 6).alias("containment_a"),
        F.round(F.when(nb > 0, inter / nb)
                .otherwise(F.lit(0.0)), 6).alias("containment_b"),
    )
    # same handle-forwarding rule as ngram_jaccard_pairs
    out._erps_persisted = list(getattr(pairs, "_erps_persisted", None) or [])
    return out


def winnow_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 4, w: int = 4,
                           stop_threshold: int | None = None) -> DataFrame:
    """Near-dup candidates from a winnowing index: ids sharing at least
    one winnow fingerprint (the MOSS index shape — documents sharing any
    k+w-1-word run are guaranteed to collide). Same scale discipline as
    the LSH band join: explode to (id, fingerprint), drop degenerate
    fingerprint buckets above ``stop_threshold`` (they carry no
    similarity signal and would fan out quadratically), bucketed
    self-join with ``id_a < id_b``, distinct — never a cross join, and
    the index is ~1/w the size of a full shingle index.
    """
    from ..functions.hashing import winnow_fingerprints_col

    fps = docs.select(
        F.col(id_col).alias("id"),
        F.explode(winnow_fingerprints_col(F.col(text_col), k, w))
        .alias("fp"),
    )
    if stop_threshold is not None:
        sizes = fps.groupBy("fp").agg(F.count("*").alias("n"))
        fps = fps.join(
            F.broadcast(sizes.where(F.col("n") > stop_threshold)),
            "fp", "left_anti")
    a = fps.select(F.col("fp"), F.col("id").alias("id_a"))
    b = fps.select(F.col("fp"), F.col("id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 3,
                            n_bands: int = 8, threshold: float = 0.7,
                            stop_threshold: int | None = None,
                            shingles: DataFrame | None = None) -> DataFrame:
    """LSH recall + exact Jaccard precision: the classic two-phase near-dup.

    One persisted shingle table serves both phases; the LSH stage persists
    its signature table internally. Both caches are attached to the result
    as ``_erps_persisted`` — call ``scoring.release_persisted`` after
    materializing (long-lived sessions running many dedups must not depend
    on ContextCleaner timing). Pass a precomputed persisted ``shingles``
    table (same ``k``!) when another stage in the same job also consumes
    corpus shingles — e.g. decontamination — so the corpus is tokenized
    and shingled exactly once; ownership (persist + release) then stays
    with the caller.
    """
    if shingles is not None:
        sh, own = shingles, []
    else:
        sh = shingle_table(docs, id_col, text_col, k) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        own = [sh]
    cands = lsh_candidate_pairs(n_bands=n_bands, stop_threshold=stop_threshold,
                                shingles=sh)
    verified = ngram_jaccard_pairs(pairs=cands, k=k, shingles=sh)
    out = verified.where(F.col("jaccard") >= threshold)
    out._erps_persisted = [*own, *getattr(cands, "_erps_persisted", [])]
    return out


def fuzzy_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", k: int = 3, n_bands: int = 8,
                threshold: float = 0.7,
                stop_threshold: int | None = None,
                shingles: DataFrame | None = None) -> DataFrame:
    """End-to-end fuzzy dedup: every row labeled (id, dup_group, is_keeper).

    The capstone of the near-dup family — what a 100 TB training-data
    pipeline actually runs: two-phase MinHash-LSH + exact-Jaccard edges
    (:func:`minhash_near_duplicates`), transitive closure over the verified
    edges (near-duplication is not transitive, but dedup groups must be —
    A≈B≈C means keep one of {A,B,C}), then a deterministic min-id keeper
    per group. Downstream keeps ``WHERE is_keeper``.

    Ids travel as strings through the closure (url semantics of
    operators/clustering.py), so group minima are lexicographic; singletons
    are their own group and keeper. Cost = the two-phase near-dup (bucketed
    band join, stop-key guarded) + CC rounds over the *verified edge set*,
    which is tiny relative to the corpus — the same shape that clusters the
    ER match edges.
    """
    from .clustering import assign_clusters

    edges = minhash_near_duplicates(docs, id_col, text_col, k=k,
                                    n_bands=n_bands, threshold=threshold,
                                    stop_threshold=stop_threshold,
                                    shingles=shingles)
    nodes = docs.select(F.col(id_col).cast("string").alias("url"))
    labeled = assign_clusters(
        nodes,
        edges.select(F.col("id_a").cast("string").alias("src"),
                     F.col("id_b").cast("string").alias("dst")))
    out = labeled.select(
        F.col("url").alias("id"),
        F.col("cluster_id").alias("dup_group"),
        (F.col("cluster_id") == F.col("url")).alias("is_keeper"),
    )
    out._erps_persisted = [
        *(getattr(edges, "_erps_persisted", None) or []),
        *(getattr(labeled, "_erps_persisted", None) or []),
    ]
    return out


def fuzzy_dedup_quality_keeper(docs: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text",
                               quality_col: str | None = None,
                               k: int = 3, n_bands: int = 8,
                               threshold: float = 0.7,
                               stop_threshold: int | None = None,
                               shingles: DataFrame | None = None
                               ) -> DataFrame:
    """:func:`fuzzy_dedup` with a QUALITY-AWARE keeper: instead of the
    arbitrary min-id, each dup group keeps its best document — highest
    ``quality_col`` (default: text length in characters), ties broken by
    ascending id. This is what production pipelines actually do once a
    quality signal exists (keep the longest / cleanest member of a
    near-dup cluster, drop its shards and boilerplate-padded variants).

    Output: (id, dup_group, quality, is_keeper). Group membership and
    ids are IDENTICAL to :func:`fuzzy_dedup` (same edges, same closure,
    same lexicographic-min group label) — only the keeper bit moves, via
    one top-1 window per dup group (WindowGroupLimit shape; groups are
    edge-bounded and tiny relative to the corpus) after one id-keyed
    join fetching the quality signal. Singletons keep themselves.
    """
    labeled = fuzzy_dedup(docs, id_col, text_col, k=k, n_bands=n_bands,
                          threshold=threshold,
                          stop_threshold=stop_threshold, shingles=shingles)
    q = (F.col(quality_col).cast("double") if quality_col
         else F.length(F.coalesce(F.col(text_col), F.lit("")))
         .cast("double"))
    quality = docs.select(F.col(id_col).cast("string").alias("id"),
                          q.alias("quality"))
    scored = labeled.join(quality, "id")
    w = Window.partitionBy("dup_group").orderBy(F.desc("quality"),
                                                F.asc("id"))
    out = scored.select(
        "id", "dup_group", "quality",
        (F.row_number().over(w) == 1).alias("is_keeper"))
    out._erps_persisted = list(getattr(labeled, "_erps_persisted",
                                       None) or [])
    return out


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


def srp_plane_matrix(dim: int, n_tables: int, n_planes: int,
                     seed: int = 42) -> list[list[list[float]]]:
    """Deterministic ±1 hyperplane matrix, built ONCE on the driver.

    ``matrix[t][p][i]`` is plane p of hash table t, dimension i — the sign
    of md5(f"{seed}:{t}:{p}:{i}"). Hashing happens at plan-build time (a few
    thousand digests total), never per row — the round-1 design paid
    dim × planes md5 calls per ROW, which is a scale-killer.
    """
    import hashlib

    return [
        [
            [
                1.0 if int(hashlib.md5(f"{seed}:{t}:{p}:{i}".encode())
                           .hexdigest()[:8], 16) % 2 == 0 else -1.0
                for i in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def srp_bucket_table(base: DataFrame, matrix: list[list[list[float]]],
                     n_tables: int, n_planes: int) -> DataFrame:
    """(id, bucket) — one row per (vector, hash table).

    Projections run as ONE Arrow-batched numpy matmul per batch
    (functions/similarity.srp_projection_udf): per-element HOF folds are
    interpreted (no codegen, ~seconds for 10^5 rows), and a per-plane
    expression tree makes Catalyst analysis the bottleneck — measured 18 s
    cold / 9 s warm for the HOF shape vs sub-second for BLAS. Bucket keys
    (sign-bit strings per table) derive natively from the projection array
    with cheap element_at references.
    """
    from ..functions.similarity import srp_projection_udf

    flat = [row for planes in matrix for row in planes]
    proj = srp_projection_udf(flat)
    projs = base.select("id", proj("v").alias("_p"))
    bucket_exprs = [
        F.concat(F.lit(f"{t}:"), *[
            F.when(F.element_at("_p", t * n_planes + p + 1) >= 0, F.lit("1"))
            .otherwise(F.lit("0"))
            for p in range(n_planes)
        ])
        for t in range(n_tables)
    ]
    return projs.select(
        "id", F.explode(F.array(*bucket_exprs)).alias("bucket"))


def embedding_near_duplicates(emb: DataFrame, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95,
                              n_tables: int = 0, n_planes: int = 3,
                              dim: int | None = None, seed: int = 42,
                              stop_threshold: int | None = None) -> DataFrame:
    """Pairs with cosine ≥ threshold over an array<float> column.

    ``n_tables=0``: all-pairs join (correct baseline; only for corpora that
    fit a shuffle — tests/bench). ``n_tables>0``: banded sign-random-
    projection LSH — L=n_tables hash tables of b=n_planes sign bits each;
    candidates share ≥1 table bucket (recall 1-(1-p^b)^L per pair, p =
    1-θ/π), then exact cosine verification. The join shuffles on bucket
    keys with the same stop-key guard as MinHash-LSH, so the 100 TB shape
    is bucketed, never quadratic. Plane weights are a driver-built literal
    matrix (:func:`srp_plane_matrix`) — zero per-row hashing.
    """
    # per-vector norms are computed ONCE here (2 folds per ROW) so pair
    # verification needs a single dot-product fold per PAIR instead of the
    # three folds of cosine_col — at millions of candidate pairs the
    # interpreted higher-order-function arithmetic is the bottleneck
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(
        F.col(id_col).alias("id"), vd.alias("v"),
        F.sqrt(F.aggregate(F.transform(vd, lambda x: x * x),
                           F.lit(0.0), lambda a, x: a + x)).alias("nrm"),
    )
    if n_tables > 0:
        if dim is None:
            dim = int(base.select(F.size("v")).first()[0])
        matrix = srp_plane_matrix(dim, n_tables, n_planes, seed)
        # buckets carry IDS ONLY: the self-join + distinct then shuffles two
        # longs per row instead of two dim-width float arrays (the arrays
        # made the candidate shuffle ~dim× wider and dominated wall time);
        # vectors re-attach AFTER dedup via two id equi-joins.
        buckets = buckets_persisted = (
            srp_bucket_table(base, matrix, n_tables, n_planes)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if stop_threshold is not None:
            sizes = buckets.groupBy("bucket").agg(F.count("*").alias("n"))
            buckets = buckets.join(
                F.broadcast(sizes.where(F.col("n") > stop_threshold)),
                "bucket", "left_anti")
        a = buckets.select("bucket", F.col("id").alias("id_a"))
        b = buckets.select("bucket", F.col("id").alias("id_b"))
        cand = (
            a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct()
        )
        pairs = (
            cand.join(base.select(F.col("id").alias("id_a"),
                                  F.col("v").alias("v_a"),
                                  F.col("nrm").alias("n_a")), "id_a")
            .join(base.select(F.col("id").alias("id_b"),
                              F.col("v").alias("v_b"),
                              F.col("nrm").alias("n_b")), "id_b")
        )
    else:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                        F.col("nrm").alias("n_a"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        F.col("nrm").alias("n_b"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(F.zip_with(F.col("v_a"), F.col("v_b"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                 dot / (F.col("n_a") * F.col("n_b"))).otherwise(F.lit(0.0))
    out = pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")) \
               .where(F.col("cosine") >= threshold)
    if n_tables > 0:
        # the SRP bucket table is persisted above; hand the release handle
        # to the caller (unattached, it leaked for the whole session —
        # found by tools/audit_cache_bleed.py)
        out._erps_persisted = [buckets_persisted]
    return out


def semantic_dedup(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", n_cells: int = 16,
                   threshold: float = 0.95, seed: int = 42) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, compare pairs ONLY within a cluster, and drop every
    vector that has a higher-cosine-than-threshold neighbor with a
    smaller id — semantic near-dup pruning, the embedding-space sibling
    of MinHash dedup (no reference analog; LLM-pipeline extension).

    Returns every row labeled: (id, cell_id, is_keeper). A row is dropped
    iff SOME smaller-id vector in the same cell has cosine ≥ threshold
    (deterministic greedy min-id keeper — the same keeper rule as
    :func:`exact_dedup`, so downstream keeps ``WHERE is_keeper``).

    DELIBERATE DEVIATION from Abbas et al.'s keep-one-per-duplicate-group
    reading: the smaller-id neighbor that triggers a drop may itself have
    been dropped, and cosine is not transitive, so a chain a~b, b~c with
    a≁c drops BOTH b and c where a group-keeper rule would keep c. This
    one-pass rule was chosen because it is a single self-join (no
    iteration) and errs toward MORE pruning — acceptable for dedup, where
    over-dropping costs a little data and under-dropping costs duplicate
    training mass. The group semantics are available by feeding the
    thresholded within-cell pairs to
    :func:`~..operators.clustering.connected_components` and keeping each
    component's min id; the oracle and the incremental stream both mirror
    THIS operator's one-pass rule exactly.

    Scale shape: the coarse quantizer is the IVF cell assignment
    (operators/ann.py:ivf_assign_cells — one narrow corpus pass against
    driver-state centroids), and the pairwise stage shuffles BOTH sides on
    cell_id, so the quadratic term is Σ|cell|², never |corpus|² — at
    100 TB you raise ``n_cells`` so cells stay bounded (the paper runs
    k-means with k ≈ 10⁵ for exactly this reason; the operator contract
    is identical, the centroid draw is the deterministic seeded one).
    Cosines are rounded to 6dp BEFORE thresholding on both engines so the
    keep/drop boundary cannot drift across float summation orders.
    """
    from .ann import ivf_assign_cells

    _, assigned = ivf_assign_cells(emb, n_cells, id_col, vec_col, seed)
    # persist the assignment WITH per-row double casts and norms: it feeds
    # BOTH self-join sides and the final labeled output, and precomputing
    # the norms here means pair verification is a SINGLE dot-product fold
    # per pair instead of cosine_col's three (at Σ|cell|² pairs the
    # interpreted HOF arithmetic dominates — same measured rationale as
    # embedding_near_duplicates; the arithmetic and fold order are
    # identical, so oracle doubles are unchanged bit-for-bit)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = assigned.select(
        F.col(id_col).alias("id"), "cell_id", vd.alias("v"),
        F.sqrt(F.aggregate(F.transform(vd, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x)).alias("nrm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = base.select("cell_id", F.col("id").alias("id_a"),
                    F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = base.select("cell_id", F.col("id").alias("id_b"),
                    F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    dot = F.aggregate(F.zip_with(F.col("v_a"), F.col("v_b"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                 dot / (F.col("n_a") * F.col("n_b"))).otherwise(F.lit(0.0))
    dropped = (
        a.join(b, "cell_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(cos, 6) >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    out = (
        base.join(dropped, "id", "left")
        .select(
            F.col("id").alias(id_col), "cell_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("is_keeper"),
        )
    )
    out._erps_persisted = [base]
    return out


def semantic_dedup_cc(emb: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", n_cells: int = 16,
                      threshold: float = 0.95, seed: int = 42) -> DataFrame:
    """SemDeDup with the CONNECTED-COMPONENT keeper rule (the
    "keep one per duplicate group" reading of Abbas et al. 2023): the
    thresholded within-cell cosine pairs form an edge set, transitive
    closure groups them, and exactly ONE vector per component survives —
    the round-4 advisor's suggested alternative to
    :func:`semantic_dedup`'s one-pass greedy rule.

    Semantics triangle, explicitly: (1) one-pass greedy (semantic_dedup)
    drops x if ANY smaller-id in-cell neighbor is ≥ τ, even a dropped
    one — cheapest, one self-join, may cascade-drop; (2) THIS operator
    keeps exactly one representative per cosine-connected component —
    most aggressive pruning with a group-count guarantee, costs the
    iterative closure; (3) the paper's sequential greedy (keep x iff no
    KEPT smaller neighbor — a lexicographic maximal independent set) is
    inherently order-sequential and implemented by neither. Keepers here
    are a SUBSET of (1)'s: a component's representative has no smaller
    neighbor at all, so greedy keeps it too.

    Component LABELS come from the CC operator's string-keyed closure
    (operators/clustering.py url semantics), but the REPRESENTATIVE is
    the component's NUMERIC minimum id (one extra component-sized
    aggregation) — string-min would pick "10" over "2" and silently break
    the keeper⊆greedy containment (caught by the pytest). Scale shape:
    same cell-bounded Σ|cell|² pair scan as semantic_dedup, then
    large-star/small-star over the (tiny) above-threshold edge set; the
    closure iterates over edges only, never vectors.
    """
    from .ann import ivf_assign_cells
    from .clustering import assign_clusters

    _, assigned = ivf_assign_cells(emb, n_cells, id_col, vec_col, seed)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = assigned.select(
        F.col(id_col).alias("id"), "cell_id", vd.alias("v"),
        F.sqrt(F.aggregate(F.transform(vd, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x)).alias("nrm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = base.select("cell_id", F.col("id").alias("id_a"),
                    F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = base.select("cell_id", F.col("id").alias("id_b"),
                    F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    dot = F.aggregate(F.zip_with(F.col("v_a"), F.col("v_b"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                 dot / (F.col("n_a") * F.col("n_b"))).otherwise(F.lit(0.0))
    edges = (
        a.join(b, "cell_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(cos, 6) >= threshold)
        .select(F.col("id_a").cast("string").alias("src"),
                F.col("id_b").cast("string").alias("dst"))
    )
    labels = assign_clusters(
        base.select(F.col("id").cast("string").alias("url")), edges)
    lbl = (
        base.select("id", "cell_id")
        .join(labels.select(F.col("url"), F.col("cluster_id")),
              base["id"].cast("string") == F.col("url"))
        .select("id", "cell_id", "cluster_id")
    )
    kmin = lbl.groupBy("cluster_id").agg(F.min("id").alias("_kid"))
    out = (
        lbl.join(kmin, "cluster_id")
        .select(
            F.col("id").alias(id_col), "cell_id",
            (F.col("id") == F.col("_kid")).alias("is_keeper"),
        )
    )
    out._erps_persisted = [
        base, *(getattr(labels, "_erps_persisted", None) or [])]
    return out


# --- Benchmark decontamination ---------------------------------------------------


def contamination_flags(train: DataFrame, eval_docs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, min_overlap: int = 2,
                        shingles: DataFrame | None = None) -> DataFrame:
    """Flag training docs sharing ≥ ``min_overlap`` distinct word
    k-shingles with ANY eval-set doc — the decontamination stage every
    LLM training pipeline runs before a benchmark release (no reference
    analog; LLM-pipeline extension).

    100 TB shape: the eval set is tiny relative to the corpus, so its
    distinct shingle set is broadcast; the train side streams through one
    broadcast hash join and only (id, hit) pairs — never text — reach the
    per-doc aggregation. The corpus is read once, shuffled once (on id,
    post-join, hits only). Pass a precomputed ``shingles`` table (id, sh;
    same ``k``!) to share the corpus shingling with a dedup stage running
    in the same job.
    """
    ev = (
        shingle_table(eval_docs, id_col, text_col, k)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    tr_sh = shingles if shingles is not None \
        else shingle_table(train, id_col, text_col, k)
    tr = tr_sh.select("id", F.explode("sh").alias("shingle"))
    # shingles_col is per-doc distinct, so count(*) == distinct overlaps
    hits = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
    )
    # join on the INPUT id column's own type — a hardcoded long cast
    # would silently null out (and un-flag) every row for string ids
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
            .alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap)
            .alias("contaminated"),
        )
    )


def fuzzy_contamination_flags(train: DataFrame, eval_docs: DataFrame,
                              id_col: str = "doc_id",
                              text_col: str = "text", k: int = 3,
                              n_bands: int = 4, threshold: float = 0.5,
                              stop_threshold: int | None = None,
                              shingles: DataFrame | None = None) -> DataFrame:
    """FUZZY benchmark decontamination: flag training docs that NEAR-match
    an eval-set doc — MinHash-LSH candidates between corpus and eval set,
    verified by one-sided shingle containment on the EVAL side
    (|train∩eval| / |eval|), so a benchmark item embedded verbatim-ish
    inside a longer page is caught even when whole-doc Jaccard is low and
    the exact-shingle counter (:func:`contamination_flags`) under-counts a
    lightly paraphrased copy. This is the GPT-3/PaLM-style 13-gram-fuzzy
    decontamination stage, as an operator.

    Returns every training row: (id, n_eval_matches, max_containment,
    contaminated). Containment is rounded to 6dp BEFORE thresholding on
    both engines.

    100 TB shape: the eval side is tiny, so its band buckets AND its
    shingle arrays broadcast; the corpus makes ONE pass to band buckets
    (same per-band MinHash fold as dedup), one broadcast join produces
    (train_id, eval_id) candidates, and only candidates fetch shingle
    arrays for verification — the corpus text never shuffles.
    ``stop_threshold`` drops degenerate corpus buckets exactly like
    :func:`lsh_candidate_pairs` (a stopword-dominated band value would
    otherwise fan every page out against the eval set). Pass a
    precomputed ``shingles`` table (id, sh; same ``k``!) to share the
    corpus shingling with a dedup stage in the same job.
    """
    from ..functions.hashing import minhash_sig_col

    def _buckets(sh: DataFrame) -> DataFrame:
        return (
            sh.select("id", F.posexplode(minhash_sig_col(F.col("sh"),
                                                         n_bands))
              .alias("band", "v"))
            .where(F.col("v").isNotNull())
            .select("id", F.concat(F.col("band").cast("string"), F.lit(":"),
                                   F.col("v")).alias("bucket"))
        )

    if shingles is not None:
        tr_sh, own = shingles, []
    else:
        # corpus shingles feed BOTH the bucket pass and the verify join —
        # persist so the corpus is tokenized+shingled once (the same
        # sharing rule as minhash_near_duplicates)
        tr_sh = shingle_table(train, id_col, text_col, k) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        own = [tr_sh]
    ev_sh = shingle_table(eval_docs, id_col, text_col, k)
    tr_b = _buckets(tr_sh)
    if stop_threshold is not None:
        sizes = tr_b.groupBy("bucket").agg(F.count("*").alias("n"))
        tr_b = tr_b.join(
            F.broadcast(sizes.where(F.col("n") > stop_threshold)),
            "bucket", "left_anti")
    ev_b = _buckets(ev_sh).select("bucket", F.col("id").alias("eval_id")) \
                          .distinct()
    cand = (
        tr_b.join(F.broadcast(ev_b), "bucket")
        .select("id", "eval_id")
        .distinct()
    )
    verified = (
        cand.join(tr_sh.select(F.col("id"), F.col("sh").alias("sh_t")), "id")
        .join(F.broadcast(ev_sh.select(F.col("id").alias("eval_id"),
                                       F.col("sh").alias("sh_e"))),
              "eval_id")
        .select(
            "id", "eval_id",
            F.round(
                F.when(F.size("sh_e") > 0,
                       F.size(F.array_intersect("sh_t", "sh_e"))
                       .cast("double") / F.size("sh_e"))
                .otherwise(F.lit(0.0)), 6).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )
    hits = verified.groupBy("id").agg(
        F.count("*").alias("n_eval_matches"),
        F.max("containment").alias("max_containment"),
    )
    out = (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_eval_matches"), F.lit(0)).cast("long")
            .alias("n_eval_matches"),
            F.round(F.coalesce(F.col("max_containment"), F.lit(0.0)), 6)
            .alias("max_containment"),
            (F.coalesce(F.col("n_eval_matches"), F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )
    out._erps_persisted = own
    return out
