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

import os
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
        # tmpfs when available — same rationale as the bench stage tables:
        # the sandbox's single virtual disk serializes the per-batch sink
        # commits that per-executor NVMe absorbs on a real cluster
        base = "/dev/shm" if os.path.isdir("/dev/shm") \
            and os.access("/dev/shm", os.W_OK) else None
        sink_dir = tempfile.mkdtemp(prefix="inc_neardup_sink_", dir=base)
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
    try:
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise TimeoutError(
                f"incremental near-dup stream did not drain in {timeout_s}s")
    finally:
        for df in (corpus_sh, corpus_buckets):
            df.unpersist()
    return spark.read.option("basePath", out_dir).parquet(out_dir) \
        .select("delta_id", "corpus_id", "jaccard")
