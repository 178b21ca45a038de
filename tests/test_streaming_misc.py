"""Streaming ingest (exactly-once, resume), CSV sink, match-type, list
overlap, stratified sampling, correlation — §2 long-tail coverage."""

import os

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.operators.rerank import (
    classify_match_type, list_overlap_features,
)
from entity_resolution_pipeline_spark.sources.tableio import TableIO
from entity_resolution_pipeline_spark.streaming.ingest import (
    stream_ingest_available_now,
)


def test_streaming_extract_incremental(spark, fixtures, tmp_root):
    """availableNow ingest: first drain extracts everything; new files are
    picked up on the next run; already-seen files are NOT reprocessed."""
    src = os.path.join(tmp_root, "stream_src")
    out = os.path.join(tmp_root, "stream_out")
    ckpt = os.path.join(tmp_root, "stream_ckpt")
    pages = fixtures["pages"]
    first = pages.limit(50)
    first.write.mode("overwrite").parquet(src)
    n_first = first.count()

    got1 = stream_ingest_available_now(spark, src, out, ckpt)
    assert got1.count() == n_first
    assert "text_norm" in got1.columns
    # extraction invariant holds on the streaming path too
    row = got1.where(F.col("text").isNotNull()).select("text", "text_norm").first()
    assert row["text_norm"] == row["text"]

    # append a second batch of files; only the delta is processed
    pages.write.mode("append").parquet(src)
    got2 = stream_ingest_available_now(spark, src, out, ckpt)
    assert got2.count() == n_first + pages.count()


def test_stream_windowed_counts_matches_batch(spark):
    """Watermarked window agg drained availableNow == batch hourly rollup."""
    from entity_resolution_pipeline_spark.streaming.analytics import (
        stream_windowed_event_stats,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    got = stream_windowed_event_stats(spark, path, query_name="t_winstats")
    batch = (
        spark.read.parquet(path)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0


def test_stream_sessionize_stateful_matches_batch(spark):
    """applyInPandasWithState sessionizer == batch lag-window sessionizer,
    including state carried across micro-batches (two drains)."""
    from entity_resolution_pipeline_spark.plans.benchqueries import (
        q_events_sessionize,
    )
    from entity_resolution_pipeline_spark.streaming.analytics import (
        stream_sessionize_stateful,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = stream_sessionize_stateful(spark, f"{sf_dir}/events.parquet",
                                     query_name="t_sessions")
    batch = q_events_sessionize(spark, sf_dir)
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0


def test_csv_sink_roundtrip(spark, tmp_root):
    io = TableIO(spark, os.path.join(tmp_root, "csvio"))
    df = spark.createDataFrame(
        [("u1", "C", 0.8), ("u2", "A", 0.99)], ["url", "tier", "p_match"])
    io.write_csv("review_queue", df.coalesce(1))
    back = io.read_csv("review_queue")
    assert back.count() == 2
    assert set(back.columns) == {"url", "tier", "p_match"}


def test_match_type_classification(spark):
    df = spark.createDataFrame(
        [("a", "GUO"), ("b", "branch"), ("c", "SUB"), ("d", None)],
        ["id", "role"])
    got = {r.id: r.match_type for r in classify_match_type(df).collect()}
    assert got == {"a": "GUO", "b": "BRANCH", "c": "SUBSIDIARY", "d": "LEGAL_ENTITY"}


def test_list_overlap_features(spark):
    df = spark.createDataFrame(
        [("Sequoia, Accel and Index", "accel | sequoia | benchmark")],
        ["inv_a", "inv_b"])
    r = list_overlap_features(df, "inv_a", "inv_b").collect()[0]
    assert r["overlap_count"] == 2           # sequoia, accel
    assert abs(r["overlap_jaccard"] - 0.5) < 1e-6   # 2 / 4
    assert abs(r["overlap_coverage"] - 2 / 3) < 1e-6


def test_stratified_sampling_seeded(spark, fixtures):
    """E3: sampleBy with fixed seed is deterministic and respects strata."""
    pages = fixtures["pages"].withColumn(
        "stratum", F.when(F.col("lang") == "en", "en").otherwise("other"))
    fr = {"en": 0.5, "other": 1.0}
    s1 = pages.sampleBy("stratum", fr, seed=42)
    s2 = pages.sampleBy("stratum", fr, seed=42)
    assert s1.count() == s2.count()
    assert s1.exceptAll(s2).count() == 0
    n_other = pages.where("stratum = 'other'").count()
    assert s1.where("stratum = 'other'").count() == n_other  # fraction 1.0 = all


def test_feature_correlation(spark):
    """M6: df.stat.corr over feature columns (driver-side selection logic)."""
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2 + 1).cast("double").alias("y"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(97))).cast("double").alias("z"),
    )
    assert abs(df.stat.corr("x", "y") - 1.0) < 1e-9
    assert abs(df.stat.corr("x", "z")) < 0.3


def test_stream_curation_matches_batch_and_batching_invariant(spark, tmp_root):
    """The curation ingest stream equals the one-shot batch plan, and the
    result is identical whether the backlog drains as one micro-batch or
    file-at-a-time (pure per-doc function: no corpus state to desync)."""
    import os

    from entity_resolution_pipeline_spark.streaming.incremental import (
        curate_batch, stream_curate_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    delta_dir = os.path.join(tmp_root, "curate_delta")
    docs.repartition(3).write.mode("overwrite").parquet(delta_dir)

    def key(rows):
        return sorted((r["doc_id"], r["chunk_id"], r["chunk_text"],
                       r["n_words"], r["source"]) for r in rows)

    expected = key(curate_batch(
        spark.read.parquet(delta_dir)).collect())
    assert expected, "gate kept nothing at sf0.001"

    one = key(stream_curate_documents(
        spark, delta_dir,
        sink_dir=os.path.join(tmp_root, "curate_sink_one")).collect())
    per_file = key(stream_curate_documents(
        spark, delta_dir, max_files_per_trigger=1,
        sink_dir=os.path.join(tmp_root, "curate_sink_split")).collect())
    assert one == expected
    assert per_file == expected


def test_stream_curation_restart_does_not_duplicate(spark, tmp_root):
    """Re-running the curation stream over the same checkpoint + sink
    (no new files) must not change the committed chunks."""
    import os

    from entity_resolution_pipeline_spark.streaming.incremental import (
        stream_curate_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    delta_dir = os.path.join(tmp_root, "curate_delta_r")
    docs.coalesce(1).write.mode("overwrite").parquet(delta_dir)
    sink = os.path.join(tmp_root, "curate_sink_r")

    first = stream_curate_documents(spark, delta_dir, sink_dir=sink)
    n_first = first.count()
    assert n_first > 0
    again = stream_curate_documents(spark, delta_dir, sink_dir=sink)
    assert again.count() == n_first


def test_stream_decontaminate_matches_batch_and_batching_invariant(
        spark, tmp_root):
    """The streamed benchmark-release decontamination equals the one-shot
    contamination_flags, whether eval docs land in one batch or
    file-at-a-time (distinct hit-pair union is associative)."""
    import os

    from entity_resolution_pipeline_spark.operators.dedup import (
        contamination_flags,
    )
    from entity_resolution_pipeline_spark.streaming.incremental import (
        stream_decontaminate_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_docs = docs.where("doc_id % 11 = 0")
    delta_dir = os.path.join(tmp_root, "decon_delta")
    eval_docs.repartition(3).write.mode("overwrite").parquet(delta_dir)

    def key(rows):
        return sorted((r["doc_id"], r["n_overlap"], r["contaminated"])
                      for r in rows)

    expected = key(contamination_flags(docs, eval_docs).collect())
    assert any(c for _d, _n, c in expected), "nothing contaminated"
    assert not all(c for _d, _n, c in expected), "everything contaminated"

    one = key(stream_decontaminate_corpus(
        spark, delta_dir, docs,
        sink_dir=os.path.join(tmp_root, "decon_sink_one")).collect())
    per_file = key(stream_decontaminate_corpus(
        spark, delta_dir, docs, max_files_per_trigger=1,
        sink_dir=os.path.join(tmp_root, "decon_sink_split")).collect())
    assert one == expected
    assert per_file == expected


def test_stream_quality_filter_matches_batch_and_batching_invariant(
        spark, tmp_root):
    """The quality-filter ingest stream (pinned-artifact scoring) equals
    the one-shot batch projection, drained as one micro-batch or
    file-at-a-time, and the JSON artifact round-trip feeds the same
    coefficients the committed constants hold."""
    import os

    import pyspark.sql.functions as F

    from entity_resolution_pipeline_spark.operators.curation import (
        curation_flags,
    )
    from entity_resolution_pipeline_spark.operators.quality_model import (
        PINNED_QUALITY_COEFFS, PINNED_QUALITY_INTERCEPT,
        doc_quality_features, load_pinned_quality_filter,
        save_pinned_quality_filter, score_quality_pinned,
    )
    from entity_resolution_pipeline_spark.streaming.incremental import (
        stream_quality_filter,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    delta_dir = os.path.join(tmp_root, "qf_delta")
    docs.repartition(3).write.mode("overwrite").parquet(delta_dir)
    art = os.path.join(tmp_root, "qf_artifact")
    save_pinned_quality_filter(art)
    coeffs, intercept, thr = load_pinned_quality_filter(art)
    assert coeffs == PINNED_QUALITY_COEFFS
    assert intercept == PINNED_QUALITY_INTERCEPT and thr == 0.0

    scored = score_quality_pinned(doc_quality_features(docs))
    gate = curation_flags(docs).select(
        "doc_id", F.col("keep").alias("gate_keep"))
    expected = sorted(
        (r["doc_id"], r["logit"], r["keep"], r["gate_keep"])
        for r in scored.select("doc_id", "logit", "keep")
        .join(gate, "doc_id").collect())
    assert expected and any(not k for (_, _, k, _) in expected) \
        and any(k for (_, _, k, _) in expected)

    def run(sink, **kw):
        rows = stream_quality_filter(
            spark, delta_dir, artifact_path=art,
            sink_dir=os.path.join(tmp_root, sink), **kw).collect()
        return sorted((r["doc_id"], r["logit"], r["keep"], r["gate_keep"])
                      for r in rows)

    assert run("qf_sink_one") == expected
    assert run("qf_sink_split", max_files_per_trigger=1) == expected


def test_stream_strip_long_repeats_matches_batch_and_invariant(
        spark, tmp_root):
    """The long-repeat ingest stream equals the one-shot delta-vs-corpus
    operator, drained as one micro-batch or file-at-a-time; planted
    corpus-known boilerplate vanishes from every delta doc, and
    delta-only long runs survive (corpus state, not corpus-wide count,
    decides)."""
    import os

    import pyspark.sql.functions as F

    from entity_resolution_pipeline_spark.operators.curation import (
        corpus_window_fingerprints, strip_long_repeats_vs_corpus,
    )
    from entity_resolution_pipeline_spark.streaming.incremental import (
        stream_strip_long_repeats,
    )

    boiler = " ".join(f"legal w{i}" for i in range(12))  # 24 words
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    salted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 <= 1,
               F.concat(F.col("text"), F.lit(" " + boiler)))
        .otherwise(F.col("text")).alias("text"),
        "lang", "source", "n_chars")
    corpus = salted.where(F.col("doc_id") % 4 != 0)
    delta = salted.where(F.col("doc_id") % 4 == 0)
    delta_dir = os.path.join(tmp_root, "lrep_delta")
    delta.repartition(3).write.mode("overwrite").parquet(delta_dir)

    state = corpus_window_fingerprints(corpus, min_len=20)
    expected = sorted(
        (r["doc_id"], r["n_words"], r["n_removed"], r["text_clean"])
        for r in strip_long_repeats_vs_corpus(
            spark.read.parquet(delta_dir), state, min_len=20).collect())
    n_delta = len(expected)
    assert n_delta > 0
    # every delta doc lost at least the 24 boilerplate words
    assert all(rm >= 24 for (_, _, rm, _) in expected)
    assert all("legal" not in tc for (_, _, _, tc) in expected)

    def run(sink, **kw):
        rows = stream_strip_long_repeats(
            spark, delta_dir, corpus, min_len=20,
            sink_dir=os.path.join(tmp_root, sink), **kw).collect()
        return sorted((r["doc_id"], r["n_words"], r["n_removed"],
                       r["text_clean"]) for r in rows)

    assert run("lrep_one") == expected
    assert run("lrep_split", max_files_per_trigger=1) == expected

    # delta-only repeats are NOT stripped (corpus state decides): a delta
    # doc pair sharing a 20-word run absent from the corpus keeps it
    run20 = " ".join(f"only w{i}" for i in range(10))
    d2 = spark.createDataFrame(
        [(1, "alpha " + run20), (2, "beta " + run20)],
        "doc_id long, text string")
    out = {r["doc_id"]: r["n_removed"] for r in
           strip_long_repeats_vs_corpus(d2, state, min_len=20).collect()}
    assert out == {1: 0, 2: 0}
