"""Retrieval-library tests: BM25 against a scalar Python reference, RRF
fusion arithmetic, temperature mixing rates/budget, and split stability
(battery rows ``bm25_topk`` / ``hybrid_rrf`` / ``corpus_mix_temperature``
/ ``corpus_split`` are the oracle-checked twins; these pin the library
semantics against closed forms and partitioning changes)."""

import math

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.curation import (
    sample_corpus_temperature, split_corpus,
)
from entity_resolution_pipeline_spark.operators.retrieval import (
    bm25_topk, rrf_fuse,
)

SF_TINY = "/root/testdata/sf0.001"


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown cat sleeps all day long"),
        (3, "a fox and a dog share a den in the woods"),
        (4, "numerical linear algebra for large sparse systems"),
        (5, "the the the the repeated token document"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_bm25(corpus, query_terms, k1=1.2, b=0.75):
    """Scalar reference: same tokenization, micro-rounded integer sums."""
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(query_terms))
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        sm = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
            # mirror the engine contract: per-term micro-rounding, int sum
            sm += int(round(idf * tfn * 1e6))
        if sm:
            out[i] = sm
    return out


def test_bm25_matches_scalar_reference(spark):
    corpus = _corpus(spark)
    rows = [(100, ["quick", "fox", "dog"])]
    queries = spark.createDataFrame(rows, ["query_id", "terms"])
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(corpus, queries, k=10).collect()}
    raw = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    want = {i: round(sm / 1e6, 6)
            for i, sm in _py_bm25(raw, ["quick", "fox", "dog"]).items()}
    assert got == want
    # doc 1 holds all three terms — it must rank first
    top = bm25_topk(corpus, queries, k=1).collect()[0]
    assert top["doc_id"] == 1 and top["rank"] == 1


def test_bm25_distinct_terms_and_exclude_self(spark):
    corpus = _corpus(spark)
    # duplicated query terms count once (Lucene convention)
    q1 = spark.createDataFrame([(9, ["fox", "fox", "dog"])],
                               ["query_id", "terms"])
    q2 = spark.createDataFrame([(9, ["fox", "dog"])], ["query_id", "terms"])
    a = sorted(map(tuple, bm25_topk(corpus, q1, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(corpus, q2, k=10).collect()))
    assert a == b
    # exclude_self drops the query's own doc when ids share a domain
    q3 = spark.createDataFrame([(1, ["quick", "fox"])], ["query_id", "terms"])
    ids = {r["doc_id"]
           for r in bm25_topk(corpus, q3, k=10, exclude_self=True).collect()}
    assert 1 not in ids and ids


def test_rrf_fusion_arithmetic(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], ["query_id", "doc_id", "rank"])
    got = {r["doc_id"]: (r["rrf"], r["rank"])
           for r in rrf_fuse([a, b], k=10, c=60).collect()}
    m = lambda r: int(round(1e6 / (60.0 + r)))
    want = {
        11: round((m(2) + m(1)) / 1e6, 6),  # in both lists — wins
        10: round(m(1) / 1e6, 6),
        12: round(m(2) / 1e6, 6),
    }
    assert {d: v[0] for d, v in got.items()} == want
    assert got[11][1] == 1  # fused winner
    # ranks are dense 1..3 with deterministic tie order
    assert sorted(v[1] for v in got.values()) == [1, 2, 3]


def test_temperature_mixing_rates_and_budget(spark):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    out = sample_corpus_temperature(docs, alpha=0.5, budget_frac=0.5)
    rows = out.collect()
    n = docs.count()
    # rates follow the closed form
    counts = {r["source"]: r["cnt"] for r in
              docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    s_norm = sum(math.sqrt(counts[s]) for s in sorted(counts))
    for r in rows:
        want = round(min(1.0, 0.5 * n * math.sqrt(counts[r["source"]])
                         / s_norm / counts[r["source"]]), 6)
        assert r["rate"] == want
    # kept volume lands near the budget (md5 buckets are uniform)
    kept = sum(1 for r in rows if r["kept"])
    assert abs(kept / n - 0.5) < 0.1
    # alpha<1 flattens: on a skewed corpus the small source keeps a
    # strictly higher rate than the firehose (testdata sources are
    # near-uniform, so pin this on a synthetic 9:1 skew)
    skew = spark.createDataFrame(
        [(i, "web" if i < 90 else "books") for i in range(100)],
        ["doc_id", "source"])
    srates = {r["source"]: r["rate"]
              for r in sample_corpus_temperature(
                  skew, alpha=0.5, budget_frac=0.5).collect()}
    assert srates["books"] > srates["web"]
    # deterministic under repartitioning
    again = {(r["doc_id"], r["kept"]) for r in
             sample_corpus_temperature(
                 docs.repartition(7), alpha=0.5, budget_frac=0.5).collect()}
    assert again == {(r["doc_id"], r["kept"]) for r in rows}


def test_split_corpus_stability_and_positions(spark):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    out = split_corpus(docs).collect()
    n = len(out)
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], []).append(r)
    # ~90/5/5 proportions
    assert abs(len(by_split["train"]) / n - 0.9) < 0.08
    assert set(by_split) == {"train", "val", "test"}
    # positions are contiguous 1..m inside every (split, shard)
    shards = {}
    for r in out:
        shards.setdefault((r["split"], r["shard"]), []).append(r["pos"])
    for key, ps in shards.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), key
    # split/shard assignment is a pure function of the id: recomputing on
    # HALF the corpus must not move any shared doc (release stability)
    half = split_corpus(docs.where(F.col("doc_id") % 2 == 0)).collect()
    full = {r["doc_id"]: (r["split"], r["shard"]) for r in out}
    for r in half:
        assert (r["split"], r["shard"]) == full[r["doc_id"]]


def test_stream_bm25_equals_batch_and_batching_invariant(spark, tmp_path):
    """The incremental retrieval stream equals the one-shot batch, both
    as a single batch and file-at-a-time (batching invariance: a delta
    row's ranklist is a pure function of corpus state + its own row)."""
    from entity_resolution_pipeline_spark.operators.curation import _tokens
    from entity_resolution_pipeline_spark.streaming.incremental import (
        stream_bm25,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    delta = docs.where(F.col("doc_id") % 7 == 0)
    queries = delta.select(
        F.col("doc_id").alias("query_id"),
        F.slice(_tokens(F.col("text")), 1, 8).alias("terms"),
    )
    want = sorted(map(tuple, bm25_topk(
        docs, queries, k=5, exclude_self=True).collect()))
    assert want, "batch reference is empty — test corpus too small"

    one = str(tmp_path / "one")
    delta.coalesce(1).write.mode("overwrite").parquet(one)
    got = sorted(map(tuple, stream_bm25(
        spark, one, docs, k=5, n_query_terms=8,
        sink_dir=str(tmp_path / "s1"), timeout_s=240).collect()))
    assert got == want

    many = str(tmp_path / "many")
    delta.repartition(3).write.mode("overwrite").parquet(many)
    got2 = sorted(map(tuple, stream_bm25(
        spark, many, docs, k=5, n_query_terms=8,
        max_files_per_trigger=1,
        sink_dir=str(tmp_path / "s2"), timeout_s=240).collect()))
    assert got2 == want
