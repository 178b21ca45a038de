"""Incremental delta-vs-corpus near-dup / candidate scoring as a stream.

The 100 TB operational shape this covers: a crawl snapshot lands daily as a
~1% delta of the corpus. Re-running corpus-wide dedup/ER re-pairs the whole
corpus (O(corpus²) worst case through the band joins) to learn about rows
that didn't change. The incremental operator instead treats the corpus as
STATIC state — shingle table + stop-guarded LSH band buckets, built once and
persisted — and streams the delta through it: each micro-batch shingles only
its own rows, probes the static bucket index with an equi-join, and verifies
candidates with exact n-gram Jaccard. Per-batch cost is
O(|delta| × bands × bounded-bucket-size), independent of corpus pair count.

The reference has no incremental path at all (its chunk loop re-reads
everything, /root/reference/src/data_io.py:708-778). On Spark the idiomatic
composition is Structured Streaming ``foreachBatch``: the pipeline needs a
join + distinct + second join per batch, which exceeds a single continuous
streaming query's one-aggregation budget, and ``foreachBatch`` is the
documented escape hatch that keeps the source checkpointed (each batch is
replayed-or-skipped as a unit on restart). Output is written per batch to
``sink_dir/batch=<id>`` with ``overwrite`` mode, so a replayed batch
overwrites its own output instead of duplicating it — checkpoint + idempotent
sink = effectively exactly-once.

Stop-key rule: bucket degeneracy is judged on CORPUS bucket sizes only. That
makes the candidate set a pure function of (corpus, delta-row) — independent
of how the delta is split into micro-batches — which is what makes the
incremental result equal to the one-shot batch result (asserted in pytest
both ways: one batch, and file-at-a-time batches).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ..functions.hashing import minhash_sig_col
from ..operators.dedup import shingle_table

# delta files carry the documents-table shape (readStream needs an explicit
# schema; extra columns in the files are fine, missing ones are an error)
DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])

# crawl-delta shape for the incremental ER path (= sources/pages.PAGES_SCHEMA,
# restated because readStream requires the schema at plan time)
from pyspark.sql.types import BinaryType, TimestampType  # noqa: E402

PAGES_STREAM_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def _tmp_sink_dir(prefix: str) -> str:
    """Allocate a per-run sink/checkpoint dir (tmpfs when available — the
    sandbox's single virtual disk serializes the per-batch sink commits
    that per-executor NVMe absorbs on a real cluster) and register its
    removal at interpreter exit: the returned result DataFrame reads the
    sink lazily, so the dir must outlive the call but not the process.
    Caller-supplied sink dirs are never touched."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") \
        and os.access("/dev/shm", os.W_OK) else None
    d = tempfile.mkdtemp(prefix=prefix, dir=base)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _drain(q, timeout_s: int, what: str, persisted=()) -> None:
    """Shared availableNow drain guard for all four incremental streams:
    await the backlog, stop + raise on timeout, and ALWAYS release the
    static corpus state — one code path so the exactly-once pattern stays
    uniform (round-3 verdict asked for exactly this alignment)."""
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(f"{what} stream did not drain in {timeout_s}s")
    finally:
        for df in persisted:
            df.unpersist()


def _band_buckets(shingles: DataFrame, n_bands: int) -> DataFrame:
    """(id, bucket) — one row per (doc, MinHash band); same key scheme as
    operators/dedup.lsh_candidate_pairs so batch and stream agree."""
    sigs = shingles.select(
        "id", minhash_sig_col(F.col("sh"), n_bands).alias("sig"))
    return (
        sigs.select("id", F.posexplode("sig").alias("band", "v"))
        .where(F.col("v").isNotNull())
        .select("id", F.concat(F.col("band").cast("string"), F.lit(":"),
                               F.col("v")).alias("bucket"))
    )


def corpus_near_dup_state(corpus_docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 3,
                          n_bands: int = 4,
                          stop_threshold: int | None = None
                          ) -> tuple[DataFrame, DataFrame]:
    """Build the static corpus state probed by every micro-batch.

    Returns (shingles, buckets), both persisted MEMORY_AND_DISK — they are
    consumed once per micro-batch, and recomputing the shingle→md5 chain per
    batch would repay the round-1 recompute bug with interest. At production
    scale this state is a pair of bucketed tables written once per corpus
    snapshot and read by every delta job; here it stays a persisted plan.

    ``stop_threshold`` drops buckets with more than that many CORPUS members
    (degenerate bands carry no similarity signal and would fan every delta
    row out quadratically) — corpus-only so the rule is batching-invariant.
    """
    sh = shingle_table(corpus_docs, id_col, text_col, k) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    buckets = _band_buckets(sh, n_bands)
    if stop_threshold is not None:
        sizes = buckets.groupBy("bucket").agg(F.count("*").alias("n"))
        buckets = buckets.join(
            F.broadcast(sizes.where(F.col("n") > stop_threshold)),
            "bucket", "left_anti")
    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    return sh, buckets


def score_delta_batch(batch: DataFrame, corpus_sh: DataFrame,
                      corpus_buckets: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3, n_bands: int = 4,
                      threshold: float = 0.0) -> DataFrame:
    """One delta batch → (delta_id, corpus_id, jaccard) vs the static corpus.

    Pure batch DataFrame logic (also the body of the foreachBatch sink):
    shingle the batch, derive its band buckets, equi-join the corpus bucket
    index, distinct the (delta, corpus) candidates, then verify with exact
    shingle Jaccard — delta shingles from the batch, corpus shingles from
    the persisted state. Nothing here touches corpus×corpus pairs.
    """
    sh_d = shingle_table(batch, id_col, text_col, k) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    cand = (
        _band_buckets(sh_d, n_bands)
        .withColumnRenamed("id", "delta_id")
        .join(corpus_buckets.withColumnRenamed("id", "corpus_id"), "bucket")
        .select("delta_id", "corpus_id")
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (
        cand.join(sh_d.select(F.col("id").alias("delta_id"),
                              F.col("sh").alias("sh_a")), "delta_id")
        .join(corpus_sh.select(F.col("id").alias("corpus_id"),
                               F.col("sh").alias("sh_b")), "corpus_id")
        .select(
            "delta_id", "corpus_id",
            F.round(F.when(union > 0, inter / union)
                    .otherwise(F.lit(0.0)), 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    out._erps_persisted = [sh_d]
    return out


def stream_delta_near_dups(
    spark: SparkSession,
    delta_path: str,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_bands: int = 4,
    stop_threshold: int | None = None,
    threshold: float = 0.0,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Stream a delta directory against a static corpus; return all scored
    (delta_id, corpus_id, jaccard) rows after an availableNow drain.

    ``max_files_per_trigger`` splits the backlog into one-file micro-batches
    (the pytest uses it to prove batching-invariance); production leaves it
    unset and lets availableNow/live triggers size batches. The checkpoint
    lives next to the sink so a restarted job resumes from the last
    committed batch and overwrites — not duplicates — a replayed one.
    """
    from ..operators.scoring import release_persisted

    corpus_sh, corpus_buckets = corpus_near_dup_state(
        corpus_docs, id_col, text_col, k, n_bands, stop_threshold)

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_neardup_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "scores")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        scored = score_delta_batch(batch, corpus_sh, corpus_buckets,
                                   id_col, text_col, k, n_bands, threshold)
        scored.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))
        release_persisted(scored)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental near-dup",
           persisted=(corpus_sh, corpus_buckets))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "delta_id bigint, corpus_id bigint, jaccard double")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("delta_id", "corpus_id", "jaccard")


# --- incremental ER: delta pages scored against the static corpus ------------


def corpus_er_state(corpus_pages: DataFrame,
                    n_bands: int = 12,
                    stop_threshold: int = 4096,
                    n_docs: int | None = None,
                    stop_frac: float = 0.1
                    ) -> tuple[DataFrame, DataFrame]:
    """Static ER state: (blocking table, page attrs) of the extracted corpus.

    ``corpus_pages`` must carry (url, text_norm) — i.e. post
    ``stage_extract`` — because at production scale the extracted corpus IS
    the stage table the batch pipeline already committed; the delta job
    reuses it instead of re-extracting 10^12 pages. Both outputs are
    persisted; at scale they are bucketed tables written once per snapshot.

    The blocking table is UNSALTED: salting exists for the corpus×corpus
    self-join's skew, while the delta probe join's per-key fan-out is
    bounded by the corpus-side stop rule (a key covering > stop_frac of the
    corpus carries no identity signal), with AQE skew-split as the second
    line of defense. Stop keys are judged on CORPUS counts only, so a delta
    row's candidates are independent of micro-batch boundaries.
    """
    from ..operators.blocking import blocking_table, key_stats
    from ..operators.scoring import page_attrs

    blocks = blocking_table(corpus_pages.select("url", "text_norm"),
                            n_bands=n_bands)
    eff_stop = stop_threshold
    if n_docs is not None:
        eff_stop = min(stop_threshold, max(int(n_docs * stop_frac), 64))
    sizes = key_stats(blocks)
    blocks = blocks.join(
        F.broadcast(sizes.where(F.col("block_size") >= eff_stop)),
        "block_key", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
    attrs = page_attrs(corpus_pages).persist(StorageLevel.MEMORY_AND_DISK)
    return blocks, attrs


def score_delta_pages_batch(batch_pages: DataFrame, corpus_blocks: DataFrame,
                            corpus_attrs: DataFrame, top_n: int | None = 300,
                            n_bands: int = 12) -> DataFrame:
    """One delta batch of raw pages → scored (url_a=delta, url_b=corpus)
    candidate pairs; also the foreachBatch body of
    :func:`stream_score_delta_pages`.

    Extract → blocking keys for the batch only → equi-join the static
    corpus blocking table on block_key → per-pair sum of source weights
    (each distinct shared key counts once, exactly the batch
    ``candidate_pairs`` semantics — (block_key, delta, corpus) hits are
    unique by construction here, no salting and therefore no canonical
    filter needed) → top-N cap per DELTA url (batching-invariant: every
    candidate of a delta url lives in that url's own batch) → two-phase
    scoring against corpus attrs ∪ batch attrs.
    """
    from ..operators.blocking import SOURCE_SCORES, blocking_table
    from ..operators.scoring import page_attrs, score_pairs_two_phase
    from ..plans.pipeline import stage_extract
    from pyspark.sql import Window

    extracted = stage_extract(batch_pages) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    d_blocks = blocking_table(extracted.select("url", "text_norm"),
                              n_bands=n_bands)
    score_map = F.create_map(*[
        x for s, v in SOURCE_SCORES.items() for x in (F.lit(s), F.lit(v))
    ])
    sources_sorted = sorted(SOURCE_SCORES)
    hits = (
        d_blocks.select("block_key", "source", F.col("url").alias("url_a"))
        .join(corpus_blocks.select("block_key", F.col("url").alias("url_b")),
              "block_key")
    )
    flag_aggs = [F.max((F.col("source") == s).cast("int")).alias(f"_has_{s}")
                 for s in sources_sorted]
    sources_expr = F.concat_ws("|", *[
        F.when(F.col(f"_has_{s}") == 1, F.lit(s)) for s in sources_sorted
    ]).alias("sources")
    pairs = (
        hits.groupBy("url_a", "url_b")
        .agg(F.sum(score_map[F.col("source")]).alias("blocking_score"),
             *flag_aggs)
        .select("url_a", "url_b", "blocking_score", sources_expr)
    )
    if top_n is not None:
        w = Window.partitionBy("url_a").orderBy(
            F.desc("blocking_score"), F.asc("url_b"))
        pairs = pairs.withColumn("rn", F.row_number().over(w)) \
                     .where(F.col("rn") <= top_n).drop("rn")
    attrs = corpus_attrs.unionByName(page_attrs(extracted))
    out = score_pairs_two_phase(pairs, attrs)
    out._erps_persisted = [extracted]
    return out


def stream_score_delta_pages(
    spark: SparkSession,
    delta_path: str,
    corpus_pages: DataFrame,
    top_n: int | None = 300,
    n_bands: int = 12,
    stop_threshold: int = 4096,
    n_docs: int | None = None,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 600,
) -> DataFrame:
    """The flagship pipeline's incremental path: stream a directory of new
    crawl pages against the already-extracted corpus and return every scored
    (url_a=delta, url_b=corpus) pair after an availableNow drain.

    This is what a daily 10^12-page deployment runs between full rebuilds:
    the corpus blocking table and attrs are the batch pipeline's committed
    stage tables (static state), and each micro-batch pays extraction +
    blocking for ITS pages only plus one probe join — never the
    corpus×corpus self-join. Checkpoint + batch=<id> overwrite sink give
    the same effectively-exactly-once story as the near-dup stream.
    """
    from ..operators.scoring import release_persisted

    corpus_blocks, corpus_attrs = corpus_er_state(
        corpus_pages, n_bands=n_bands, stop_threshold=stop_threshold,
        n_docs=n_docs)

    reader = spark.readStream.schema(PAGES_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_er_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "scores")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        scored = score_delta_pages_batch(batch, corpus_blocks, corpus_attrs,
                                         top_n=top_n, n_bands=n_bands)
        scored.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))
        release_persisted(scored)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental ER",
           persisted=(corpus_blocks, corpus_attrs))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame([], ", ".join(
            f"{c} {'string' if c.startswith('url_') else 'double'}"
            for c in ["url_a", "url_b", "blocking_score", "token_jaccard",
                      "jw_fingerprint", "token_sort_ratio",
                      "lev_ratio_prefix", "domain_exact", "prefix_match",
                      "size_ratio", "num_conflict", "country_match",
                      "city_similarity", "p_match"]))
    res = spark.read.option("basePath", out_dir).parquet(out_dir)
    return res.select(*[c for c in res.columns if c != "batch"])


# --- incremental curation: gate + chunk new documents as they land -----------


def curate_batch(batch: DataFrame) -> DataFrame:
    """Gate + chunk one micro-batch (also the foreachBatch body of
    :func:`stream_curate_documents`). Pure per-document function — no
    corpus state — so the stream is batching-invariant by construction."""
    from ..operators.curation import chunk_documents, curation_flags

    kept = batch.join(
        curation_flags(batch).where("keep").select("doc_id"), "doc_id")
    return chunk_documents(kept, carry=("source",))


def stream_curate_documents(
    spark: SparkSession,
    delta_path: str,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Stream newly landed documents through the curation gate + overlap
    chunker; return all training chunks after an availableNow drain.

    The ingest-side half of the curation family: dedup/decontamination
    need corpus state (the incremental near-dup stream above), but the
    per-document gate and the chunk fan-out are pure map work — the
    earliest place a 100 TB pipeline can drop garbage is the ingest
    stream itself, before a byte of it reaches the corpus store. Same
    exactly-once contract as the other streams: checkpointed file source
    + ``batch=<id>`` overwrite sinks.
    """
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_curate_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "chunks")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        curate_batch(batch).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "curation")
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "doc_id bigint, source string, chunk_id int, "
                "chunk_text string, n_words bigint")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("doc_id", "source", "chunk_id", "chunk_text", "n_words")


# --- incremental ANN: delta vectors probe the static IVF index ---------------

from pyspark.sql.types import ArrayType, FloatType  # noqa: E402

EMB_STREAM_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def corpus_ann_state(corpus_vecs: DataFrame, n_cells: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Static ANN state: the IVF coarse index (centroids, cell-assigned
    corpus), built once per corpus snapshot and persisted — the embedding
    analog of the near-dup stream's shingle/bucket state. At production
    scale ``assigned`` is a cell-bucketed table written once; every delta
    batch probes it with a cell-key join instead of re-indexing 10^12
    vectors."""
    from ..operators.ann import ivf_assign_cells

    centroids, assigned = ivf_assign_cells(corpus_vecs, n_cells,
                                           id_col, vec_col, seed)
    assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    return centroids, assigned


def stream_delta_ann(
    spark: SparkSession,
    delta_path: str,
    corpus_vecs: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Incremental similarity search: newly landed embedding vectors
    stream against a STATIC IVF-indexed corpus and receive their cosine
    top-k neighbors — the daily-delta shape for embedding stores (new
    documents get neighbors; the corpus is not re-indexed or re-scanned
    per vector). Each micro-batch selects its probe cells against the
    driver-state centroids and joins the persisted cell-assigned corpus
    on cell_id, so per-batch cost is O(|delta| × probed-cell sizes).

    A delta vector's result depends only on (corpus state, its own row) —
    batching-invariant by construction, equal to the one-shot batch
    ``ivf_topk`` (pytest-asserted both ways). Checkpoint + ``batch=<id>``
    overwrite sinks give the same effectively-exactly-once contract as
    the other three incremental streams.
    """
    from ..operators.ann import ivf_topk

    state = corpus_ann_state(corpus_vecs, n_cells, id_col, vec_col, seed)

    reader = spark.readStream.schema(EMB_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_ann_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "topk")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        q = batch.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        scored = ivf_topk(None, q, k=k, n_cells=n_cells, n_probe=n_probe,
                          id_col=id_col, vec_col=vec_col, seed=seed,
                          state=state)
        scored.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental ANN", persisted=(state[1],))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, cosine double, "
                "rank int")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("query_id", "neighbor_id", "cosine", "rank")


def stream_semantic_dedup(
    spark: SparkSession,
    delta_path: str,
    corpus_vecs: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Incremental SemDeDup: newly landed embedding vectors stream against
    the STATIC cell-indexed corpus and are flagged as semantic duplicates
    — the admission-control shape for an embedding-deduplicated corpus
    (new vectors are checked against what is already kept; the corpus is
    never re-paired against itself).

    Per micro-batch: assign the batch to cells with the SAME driver-state
    centroid literals the corpus index used (operators/ann.py:
    assign_cells_with — a delta vector lands in exactly the cell the
    corpus build would have given it), join the persisted cell-assigned
    corpus on cell_id, count corpus neighbors with cosine ≥ threshold
    (rounded to 6dp, the batch operator's boundary rule). Output per
    delta vector: (vec_id, cell_id, n_corpus_dups, is_keeper).

    Contract difference vs the batch :func:`~...operators.dedup.
    semantic_dedup` (which resolves intra-set ordering by min-id): the
    stream rule is delta-vs-CORPUS only — intra-delta pairs would make
    the result depend on how the delta splits into micro-batches. With
    corpus-only comparisons a vector's flag is a pure function of
    (corpus state, its own row): batching-invariant, equal to the
    one-shot batch computation (pytest-asserted single-batch AND
    file-at-a-time). Checkpoint + ``batch=<id>`` overwrite sinks give
    the same effectively-exactly-once contract as the other streams.
    """
    from ..operators.ann import assign_cells_with

    centroids, assigned = corpus_ann_state(corpus_vecs, n_cells,
                                           id_col, vec_col, seed)
    cent_rows = centroids.collect()

    def _with_norm(df, out_vec: str, out_nrm: str):
        # double-cast + norm bound per row so pair verification is a
        # single dot fold (same rationale as the batch semantic_dedup)
        vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.withColumn(out_vec, vd).withColumn(
            out_nrm,
            F.sqrt(F.aggregate(F.transform(F.col(out_vec),
                                           lambda x: x * x),
                               F.lit(0.0), lambda acc, x: acc + x)))

    corpus_side = _with_norm(assigned, "_cv", "_cn") \
        .select("cell_id", "_cv", "_cn")

    reader = spark.readStream.schema(EMB_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_semdedup_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "flags")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        d = _with_norm(assign_cells_with(batch, cent_rows, id_col, vec_col),
                       "_dv", "_dn")
        dot = F.aggregate(F.zip_with(F.col("_dv"), F.col("_cv"),
                                     lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        cos = F.when((F.col("_dn") > 0) & (F.col("_cn") > 0),
                     dot / (F.col("_dn") * F.col("_cn"))) \
            .otherwise(F.lit(0.0))
        hits = (
            d.join(corpus_side, "cell_id")
            .where(F.round(cos, 6) >= threshold)
            .groupBy(id_col)
            .agg(F.count("*").alias("n_corpus_dups"))
        )
        out = (
            d.join(hits, id_col, "left")
            .select(
                F.col(id_col), F.col("cell_id"),
                F.coalesce(F.col("n_corpus_dups"), F.lit(0)).cast("long")
                .alias("n_corpus_dups"),
                (F.coalesce(F.col("n_corpus_dups"), F.lit(0)) == 0)
                .alias("is_keeper"),
            )
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental semantic dedup", persisted=(assigned,))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], f"{id_col} bigint, cell_id int, n_corpus_dups bigint, "
                "is_keeper boolean")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select(id_col, "cell_id", "n_corpus_dups", "is_keeper")


def stream_line_dedup(
    spark: SparkSession,
    delta_path: str,
    corpus_docs: DataFrame,
    min_count: int = 3,
    min_words: int = 4,
    line_sep: str = "\n",
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Incremental C4 line dedup: newly landed documents stream against
    the STATIC frequent-line set of the corpus (lines occurring
    ``min_count``+ times corpus-wide — nav bars, cookie banners) and are
    scrubbed of corpus boilerplate plus their own short lines. The
    ingest-time shape of operators/curation.line_dedup: the corpus is
    line-counted ONCE into persisted state; each micro-batch pays one
    anti-join against it (O(|delta lines|)).

    Contract: frequency is judged on the CORPUS alone — delta lines do
    not count toward it (intra-delta frequencies would depend on how the
    delta splits into micro-batches), so a document's output is a pure
    function of (corpus state, its own row): batching-invariant, equal
    to the one-shot batch computation (pytest-asserted single-batch AND
    file-at-a-time). Same checkpoint + batch=<id> overwrite sinks.
    Output per delta doc: (doc_id, n_lines, n_kept, text_clean).
    """
    frequent = (
        corpus_docs.select(
            F.explode(F.split(F.coalesce(F.col("text"), F.lit("")),
                              line_sep)).alias("line"))
        .groupBy("line").agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .select("line")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frequent.count()

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_linededup_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "clean")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        lines = batch.select(
            F.col("doc_id").alias("id"),
            F.posexplode(F.split(F.coalesce(F.col("text"), F.lit("")),
                                 line_sep)).alias("pos", "line"),
        )
        kept = (
            lines
            .where(F.size(F.filter(F.split(F.col("line"), r"\s+"),
                                   lambda t: t != "")) >= min_words)
            .join(frequent, "line", "left_anti")
        )
        rebuilt = kept.groupBy("id").agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                line_sep,
            ).alias("text_clean"),
        )
        totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
        out = (
            totals.join(rebuilt, "id", "left")
            .select(
                F.col("id").alias("doc_id"), "n_lines",
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
                .alias("n_kept"),
                F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            )
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental line dedup", persisted=(frequent,))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "doc_id bigint, n_lines bigint, n_kept bigint, "
                "text_clean string")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("doc_id", "n_lines", "n_kept", "text_clean")


# --- incremental span removal: delta docs stripped of corpus boilerplate -----


def stream_strip_spans(
    spark: SparkSession,
    delta_path: str,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Ingest-time exact-substring removal: newly landed documents are
    stripped of every span the corpus has already seen (the
    RefinedWeb-style boilerplate cut applied where it is cheapest — before
    the new page enters the corpus store). The corpus's distinct
    positional k-shingles are static persisted state; each micro-batch
    pays its own positional fan-out plus ONE semi-join on the shingle
    key. Covered spans are a pure function of (corpus state, delta row),
    so the stream is batching-invariant and equal to the one-shot
    :func:`..operators.curation.strip_spans_vs_corpus` (pytest-asserted).
    Same checkpoint + ``batch=<id>`` overwrite exactly-once contract as
    the other incremental streams.
    """
    from ..operators.curation import corpus_span_shingles, strip_spans_vs_corpus

    corpus_sh = corpus_span_shingles(corpus_docs, id_col, text_col, k,
                                     min_df) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    corpus_sh.count()

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_spans_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "stripped")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        strip_spans_vs_corpus(batch, corpus_sh, id_col, text_col, k) \
            .write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "span removal", persisted=(corpus_sh,))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], f"{id_col} bigint, n_words bigint, n_removed bigint, "
                "text_clean string")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select(id_col, "n_words", "n_removed", "text_clean")


# --- incremental corpus statistics: mergeable vocab counts -------------------


def stream_update_vocab(
    spark: SparkSession,
    delta_path: str,
    text_col: str = "text",
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Incremental vocabulary/token accounting: maintain cumulative corpus
    word counts as document deltas land — the statistics a training-data
    pipeline keeps current between snapshots (token budgets, tokenizer
    coverage) without ever recounting the corpus.

    Counts form a MONOID (merge = per-word sum), so each micro-batch pays
    O(|batch| + |vocab|): count the batch (map-side-combined wordcount),
    full-outer-merge with the predecessor snapshot, write snapshot
    ``v=<batch_id>``. Replay safety is by construction: snapshot ids are
    the checkpointed batch ids, each snapshot derives only from the
    newest snapshot with a SMALLER id, and a replayed batch overwrites
    its own snapshot — so crash/restart cannot double-count (the same
    versioned-compaction discipline a 100 TB stats store runs). Returns
    the final (word, n) counts.
    """
    from ..operators.curation import _tokens

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_vocab_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "versions")

    def _versions() -> list[int]:
        if not os.path.isdir(out_dir):
            return []
        return sorted(int(d.split("=", 1)[1]) for d in os.listdir(out_dir)
                      if d.startswith("v="))

    def _sink(batch: DataFrame, batch_id: int) -> None:
        counts = (
            batch.select(F.explode(_tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("n"))
        )
        prior = [v for v in _versions() if v < batch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(out_dir, f"v={prior[-1]}"))
            counts = (
                counts.withColumnRenamed("n", "n_new")
                .join(prev.withColumnRenamed("n", "n_old"), "word", "full")
                .select(
                    "word",
                    (F.coalesce("n_new", F.lit(0))
                     + F.coalesce("n_old", F.lit(0))).alias("n"),
                )
            )
        counts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"v={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "vocab counts")
    vs = _versions()
    if not vs:  # empty delta: no batch ever fired
        return spark.createDataFrame([], "word string, n bigint")
    return spark.read.parquet(os.path.join(out_dir, f"v={vs[-1]}")) \
        .select("word", F.col("n").cast("long").alias("n"))


def stream_update_hll(
    spark: SparkSession,
    delta_path: str,
    group_col: str = "source",
    text_col: str = "text",
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Incremental per-group distinct-shingle estimates via HyperLogLog
    register state: document deltas land as a stream, each micro-batch
    sketches ONLY its own rows and monoid-merges (per-register max,
    operators/sketches.py:hll_merge) with the predecessor snapshot —
    O(|batch| + groups×64) per batch, state bounded at 64 integer
    registers per group FOREVER, however much corpus has streamed by.
    This is the always-current cardinality dashboard of an ingest
    pipeline (vocab coverage, dedup-rate monitors) that never recounts
    history. Same versioned-snapshot replay discipline as
    :func:`stream_update_vocab` (snapshot v=<batch_id> derives only from
    the newest smaller id; a replayed batch overwrites its own snapshot).
    Because the merge is the HLL monoid, the final registers — and thus
    the estimates — equal the one-shot batch sketch bit-for-bit, which
    is what the (shared batch) oracle expresses. Returns (group, n_est).
    """
    from ..functions.hashing import shingles_col
    from ..operators.sketches import hll_estimate, hll_merge

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_hll_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "versions")

    def _versions() -> list[int]:
        if not os.path.isdir(out_dir):
            return []
        return sorted(int(d.split("=", 1)[1]) for d in os.listdir(out_dir)
                      if d.startswith("v="))

    def _sink(batch: DataFrame, batch_id: int) -> None:
        from ..operators.sketches import hll_register_table

        items = batch.select(
            F.col(group_col),
            F.explode(shingles_col(F.lower(F.col(text_col)), 3))
            .alias("shingle"))
        regs = hll_register_table(items, group_col, "shingle")
        prior = [v for v in _versions() if v < batch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(out_dir, f"v={prior[-1]}"))
            regs = hll_merge(regs.unionByName(prev))
        regs.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"v={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "hll registers")
    vs = _versions()
    if not vs:
        return spark.createDataFrame([], f"{group_col} string, n_est double")
    regs = spark.read.parquet(os.path.join(out_dir, f"v={vs[-1]}"))
    return hll_estimate(regs, group_col)


def stream_update_linkgraph(
    spark: SparkSession,
    delta_path: str,
    edge_fn,
    n_iter: int = 3,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Incremental link-graph centrality: document deltas land as a
    stream, each micro-batch derives its (src, dst) edges (``edge_fn``:
    batch DataFrame → edge DataFrame) and monoid-merges weighted edge
    counts with the predecessor snapshot — per-batch cost
    O(|batch| + |graph|), the same versioned-snapshot replay discipline
    as :func:`stream_update_vocab`. PageRank then runs ONCE over the
    final accreted edge table (ranks are a deterministic function of
    the edge multiset and edge-count merge is exact, so the result
    equals the one-shot batch run bit-for-bit — the battery row shares
    the batch oracle). This is how a crawl keeps its domain quality
    prior current: the graph accretes per ingest batch; the cheap
    re-rank runs on the bounded domain-level table, never re-deriving
    edges from history. Returns (node, rank_micro, rank).
    """
    from ..operators.graph import pagerank

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_linkgraph_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "versions")

    def _versions() -> list[int]:
        if not os.path.isdir(out_dir):
            return []
        return sorted(int(d.split("=", 1)[1]) for d in os.listdir(out_dir)
                      if d.startswith("v="))

    def _sink(batch: DataFrame, batch_id: int) -> None:
        ew = (edge_fn(batch)
              .groupBy("src", "dst").agg(F.count("*").cast("long").alias("w")))
        prior = [v for v in _versions() if v < batch_id]
        if prior:
            prev = spark.read.parquet(os.path.join(out_dir, f"v={prior[-1]}"))
            ew = (ew.unionByName(prev)
                  .groupBy("src", "dst")
                  .agg(F.sum("w").cast("long").alias("w")))
        ew.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"v={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "link graph")
    vs = _versions()
    if not vs:
        return spark.createDataFrame(
            [], "node string, rank_micro bigint, rank double")
    edges = spark.read.parquet(os.path.join(out_dir, f"v={vs[-1]}"))
    return pagerank(edges, n_iter=n_iter, weight_col="w")


# --- incremental decontamination: new benchmarks probe the static corpus -----


def stream_decontaminate_corpus(
    spark: SparkSession,
    eval_delta_path: str,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 2,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Benchmark-release-day decontamination: NEW eval/benchmark documents
    land as a stream, and the question is which TRAINING docs are now
    contaminated — without rescanning the corpus per release.

    The corpus shingle table is static persisted state (built once); each
    micro-batch broadcasts ITS OWN distinct shingle set (eval batches are
    tiny by definition) and probes the corpus table, committing distinct
    ``(doc_id, shingle)`` hit pairs to a batch-keyed idempotent sink. The
    final read distinct-unions hits across batches — set union is
    associative, so the result is independent of how releases were
    batched — and aggregates per corpus doc, matching the one-shot
    :func:`..operators.dedup.contamination_flags` exactly (asserted in
    pytest). At 100 TB the sink would carry ``xxhash64(shingle)`` instead
    of the string (the count only needs distinctness); the string is kept
    here so the DuckDB oracle can mirror the plan verbatim.
    """
    corpus_sh = (
        shingle_table(corpus_docs, id_col, text_col, k)
        .select("id", F.explode("sh").alias("shingle"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    corpus_sh.count()

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(eval_delta_path):
        parent, fname = os.path.split(eval_delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(eval_delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_decon_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "hits")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        ev = (
            shingle_table(batch, id_col, text_col, k)
            .select(F.explode("sh").alias("shingle"))
            .distinct()
        )
        hits = corpus_sh.join(F.broadcast(ev), "shingle") \
                        .select("id", "shingle").distinct()
        hits.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "decontamination", persisted=(corpus_sh,))

    ids = corpus_docs.select(F.col(id_col).cast("long").alias(id_col))
    if not os.path.isdir(out_dir):  # empty delta: nothing contaminated
        return ids.select(
            id_col, F.lit(0).cast("long").alias("n_overlap"),
            F.lit(False).alias("contaminated"))
    per_doc = (
        spark.read.option("basePath", out_dir).parquet(out_dir)
        .select("id", "shingle").distinct()
        .groupBy("id").agg(F.count("*").alias("n_overlap"))
    )
    return ids.join(per_doc, ids[id_col] == per_doc["id"], "left").select(
        id_col,
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
        .alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap)
        .alias("contaminated"),
    )


def stream_fuzzy_decontaminate(
    spark: SparkSession,
    eval_delta_path: str,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_bands: int = 4,
    threshold: float = 0.5,
    stop_threshold: int | None = None,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """FUZZY benchmark-release-day decontamination: new eval documents
    stream in and the question is which training docs NEAR-match them
    (MinHash-LSH candidates verified by eval-side containment — the
    streaming sibling of ``fuzzy_contamination_flags``, completing the
    exact/fuzzy × batch/stream matrix next to
    :func:`stream_decontaminate_corpus`).

    Static state, built once and persisted: the corpus shingle table AND
    its stop-guarded band-bucket index (the guard is judged on CORPUS
    bucket sizes only — a pure function of the corpus, so results are
    batching-invariant). Each micro-batch broadcasts its own band
    buckets and shingle arrays (eval batches are tiny), probes the
    bucket index, verifies containment, and commits distinct verified
    ``(train_id, eval_id, containment)`` hits to a batch-keyed
    idempotent sink; the final read distinct-unions hits (set union is
    associative) and aggregates per training doc — equal to the one-shot
    batch operator (pytest-asserted single-batch AND file-at-a-time).
    """
    corpus_sh = shingle_table(corpus_docs, id_col, text_col, k) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    tr_b = _band_buckets(corpus_sh, n_bands)
    if stop_threshold is not None:
        sizes = tr_b.groupBy("bucket").agg(F.count("*").alias("n"))
        tr_b = tr_b.join(
            F.broadcast(sizes.where(F.col("n") > stop_threshold)),
            "bucket", "left_anti")
    tr_b = tr_b.persist(StorageLevel.MEMORY_AND_DISK)
    tr_b.count()

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(eval_delta_path):
        parent, fname = os.path.split(eval_delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(eval_delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_fdecon_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "hits")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        ev_sh = shingle_table(batch, id_col, text_col, k)
        ev_b = _band_buckets(ev_sh, n_bands) \
            .select("bucket", F.col("id").alias("eval_id")).distinct()
        cand = (
            tr_b.join(F.broadcast(ev_b), "bucket")
            .select("id", "eval_id").distinct()
        )
        ver = (
            cand.join(corpus_sh.select("id", F.col("sh").alias("sh_t")),
                      "id")
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
        ver.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "fuzzy decontamination",
           persisted=(corpus_sh, tr_b))

    ids = corpus_docs.select(F.col(id_col).alias("_cid"))
    if not os.path.isdir(out_dir):  # empty delta: nothing contaminated
        return ids.select(
            F.col("_cid").alias(id_col),
            F.lit(0).cast("long").alias("n_eval_matches"),
            F.lit(0.0).alias("max_containment"),
            F.lit(False).alias("contaminated"))
    hits = (
        spark.read.option("basePath", out_dir).parquet(out_dir)
        .select("id", "eval_id", "containment").distinct()
        .groupBy("id")
        .agg(F.count("*").alias("n_eval_matches"),
             F.max("containment").alias("max_containment"))
    )
    return ids.join(hits, ids["_cid"] == hits["id"], "left").select(
        F.col("_cid").alias(id_col),
        F.coalesce(F.col("n_eval_matches"), F.lit(0)).cast("long")
        .alias("n_eval_matches"),
        F.round(F.coalesce(F.col("max_containment"), F.lit(0.0)), 6)
        .alias("max_containment"),
        (F.coalesce(F.col("n_eval_matches"), F.lit(0)) > 0)
        .alias("contaminated"),
    )


# --- incremental retrieval: delta queries probe a static lexical index ------


def stream_bm25(
    spark: SparkSession,
    delta_path: str,
    corpus_docs: DataFrame,
    k: int = 10,
    n_query_terms: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_self: bool = True,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Incremental lexical retrieval: newly landed documents stream
    against a STATIC BM25 index of the corpus and receive their top-k
    lexical neighbors — the daily-delta shape for decontamination sweeps
    and near-dup triage (every new page gets its closest corpus docs;
    the corpus is tokenized/indexed exactly once). Each micro-batch
    issues its first ``n_query_terms`` distinct tokens as the query and
    broadcast-probes the persisted postings index, so per-batch cost is
    O(|delta| × matching postings), never a corpus re-scan.

    A delta row's ranklist depends only on (corpus state, its own row) —
    batching-invariant by construction, equal to the one-shot batch
    ``bm25_topk`` (pytest-asserted single-batch and file-at-a-time).
    Checkpoint + ``batch=<id>`` overwrite sinks give the same
    effectively-exactly-once contract as the other incremental streams.
    """
    from ..operators.curation import _tokens
    from ..operators.retrieval import bm25_topk, corpus_bm25_state
    from ..operators.scoring import release_persisted

    state = corpus_bm25_state(corpus_docs, id_col, text_col)

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_bm25_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "topk")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        q = batch.select(
            F.col(id_col).alias("query_id"),
            F.slice(_tokens(F.col(text_col)), 1, n_query_terms)
            .alias("terms"),
        )
        scored = bm25_topk(None, q, k=k, exclude_self=exclude_self,
                           state=state)
        scored.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))
        release_persisted(scored)  # per-batch probe caches, not the index

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental BM25", persisted=(state[0],))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "query_id bigint, doc_id bigint, bm25 double, rank int")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("query_id", "doc_id", "bm25", "rank")


def stream_quality_filter(
    spark: SparkSession,
    delta_path: str,
    artifact_path: str | None = None,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Ingest-time model-based quality filtering: newly landed documents
    stream through the PINNED quality scorer (the committed S12 artifact
    — a JSON coefficient vector any job can broadcast), emitting
    (doc_id, logit, keep, gate_keep) exactly like the batch
    ``quality_filter`` row. Completes the batch/stream matrix for the
    quality model the way decontamination/SemDeDup/BM25 already did.

    Per-document scoring is a pure map (native feature folds + a literal
    dot product — zero shuffle, zero state), so the stream is
    batching-invariant BY CONSTRUCTION and the battery row reuses the
    batch full-plan oracle. ``artifact_path`` loads coefficients from a
    :func:`~..operators.quality_model.save_pinned_quality_filter`
    artifact; None uses the committed PINNED constants directly. Same
    exactly-once contract as every other incremental stream
    (checkpointed file source + ``batch=<id>`` overwrite sinks).
    """
    from ..operators.curation import curation_flags
    from ..operators.quality_model import (
        doc_quality_features, load_pinned_quality_filter,
        score_quality_pinned,
    )

    if artifact_path is not None:
        coeffs, intercept, thr = load_pinned_quality_filter(artifact_path)
    else:
        coeffs, intercept, thr = None, None, 0.0

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_qf_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "scored")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        scored = score_quality_pinned(
            doc_quality_features(batch), coeffs, intercept,
            logit_threshold=thr)
        gate = curation_flags(batch).select(
            "doc_id", F.col("keep").alias("gate_keep"))
        out = scored.select("doc_id", "logit", "keep").join(gate, "doc_id")
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental quality filter")
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "doc_id bigint, logit double, keep boolean, "
                "gate_keep boolean")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("doc_id", "logit", "keep", "gate_keep")


def stream_dsir_select(
    spark: SparkSession,
    delta_path: str,
    log_ratio: DataFrame,
    threshold_micro: int = 0,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Ingest-time DSIR admission (Xie et al. 2023): newly landed
    documents are scored against a PINNED log-importance-ratio table
    (the n_buckets-row model :func:`~..operators.selection.dsir_log_ratio`
    fitted once on the existing corpus + target set — broadcast state,
    the DSIR analog of the ANN codebooks) and admitted iff their
    exact-integer weight clears ``threshold_micro``. Emits
    (doc_id, weight_micro, keep).

    The batch operator's global top-k is NOT batching-invariant (rank
    depends on who else arrived), so the streaming analog gates on the
    pinned threshold instead — per-document weight depends only on the
    document's own n-grams and the static table, making the stream
    batching-invariant BY CONSTRUCTION; the battery row shares the batch
    weight oracle. Per batch: one broadcast join + one doc-id
    aggregation; the corpus model is never refit at ingest. Same
    exactly-once contract as every other incremental stream
    (checkpointed file source + ``batch=<id>`` overwrite sinks).
    """
    from ..operators.selection import dsir_weights

    # materialize the model ONCE as driver state (n_buckets rows — the
    # IVF-centroid pattern): the lazy plan would re-run the two corpus
    # aggregation passes in EVERY micro-batch join. The row count is the
    # hash width, so it travels WITH the model — a delta job can never
    # score against a mismatched bucketing.
    lr_rows = log_ratio.collect()
    n_buckets = len(lr_rows)
    log_ratio = spark.createDataFrame(lr_rows, schema=log_ratio.schema)

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_dsir_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "scored")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        w = dsir_weights(batch, log_ratio, n_buckets=n_buckets)
        out = w.select(
            "doc_id", "weight_micro",
            (F.col("weight_micro") > F.lit(int(threshold_micro)))
            .alias("keep"))
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental DSIR admission")
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "doc_id bigint, weight_micro bigint, keep boolean")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("doc_id", "weight_micro", "keep")


def stream_strip_long_repeats(
    spark: SparkSession,
    delta_path: str,
    corpus_docs: DataFrame,
    min_len: int = 20,
    sink_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Ingest-time min-length-L exact-substring removal: the corpus's
    distinct L-window fingerprints (O(n·log L) doubling construction)
    become static persisted state; delta documents stream in and each
    micro-batch strips every token covered by a corpus-seen window —
    the Lee et al. arbitrary-length analog of ``stream_strip_spans``
    (which guards fixed k=5 shingles). Batching-invariant by
    construction: a delta row's output is a pure function of (corpus
    window set, its own text). Same exactly-once contract as every
    other incremental stream (checkpointed file source + ``batch=<id>``
    overwrite sinks)."""
    from ..operators.curation import (
        corpus_window_fingerprints, strip_long_repeats_vs_corpus,
    )

    state = corpus_window_fingerprints(corpus_docs, min_len=min_len) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    state.count()  # materialize once, before the first batch

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(delta_path):
        parent, fname = os.path.split(delta_path)
        stream = reader.option("pathGlobFilter", fname).parquet(parent)
    else:
        stream = reader.parquet(delta_path)

    if sink_dir is None:
        sink_dir = _tmp_sink_dir("inc_lrep_sink_")
    ckpt = os.path.join(sink_dir, "_checkpoint")
    out_dir = os.path.join(sink_dir, "stripped")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        strip_long_repeats_vs_corpus(batch, state, min_len=min_len) \
            .write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, timeout_s, "incremental long-repeat strip", persisted=(state,))
    if not os.path.isdir(out_dir):  # empty delta: no batch ever fired
        return spark.createDataFrame(
            [], "doc_id bigint, n_words bigint, n_removed bigint, "
                "text_clean string")
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("doc_id", "n_words", "n_removed", "text_clean")
