"""Lexical (BM25) and hybrid (reciprocal-rank-fusion) retrieval.

A training-data pipeline needs retrieval for more than search: targeted
decontamination sweeps ("find everything that *looks like* this eval
item"), curation audits ("pull the corpus neighborhoods of these seed
documents"), and hybrid near-dup review queues all reduce to "given a
small batch of queries, rank the corpus". The reference ships only
embedding search (FAISS flat/IVF — /root/reference/src/embeddings.py:
258-334); production retrieval stacks pair that with a lexical ranker
and fuse the two ranklists, which is exactly the pair of operators here:

* :func:`bm25_topk` — Okapi BM25 over the shared corpus tokenization
  (``curation._tokens``): one shuffle builds the per-(doc, term) tf table
  with the doc length carried in the grouping key (functionally dependent
  on the id, so it rides the same exchange); the query-term set is tiny
  by construction and BROADCASTS into the postings, so the corpus never
  shuffles on raw terms; document frequencies are computed over the
  query vocabulary only (bounded by |query terms|, never the corpus
  vocabulary) and broadcast back. Per-term contributions are rounded to
  micro-units (×1e6, half-up) and summed as INTEGERS so the per-doc
  score is independent of addition order — the property that makes the
  ranking reproducible across partitionings and engines.
* :func:`rrf_fuse` — reciprocal-rank fusion (Cormack et al., SIGIR'09):
  score(d) = Σ_lists 1/(c + rank_list(d)). Rank lists are union-ed and
  monoid-merged (sum of integer micro-contributions), so fusing N lists
  is one map-side-combined aggregation — no N-way outer join.

At 100 TB the query batch stays driver-small (it is the *query* side),
the corpus-side work is one tf aggregation plus a broadcast probe —
the same delta-probes-static shape as the incremental streams.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .curation import _tokens

BM25_K1 = 1.2
BM25_B = 0.75
RRF_C = 60


def _micro(expr):
    """Half-up micro-unit quantization: the cross-engine float-parity
    contract (round(x*1e6) as int64; integer sums are order-free)."""
    return F.round(expr * F.lit(1_000_000.0), 0).cast("long")


def corpus_bm25_state(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text"
                      ) -> tuple[DataFrame, int, float]:
    """Build the STATIC lexical index once: the persisted
    (doc, doc-length, term, tf) postings table plus the corpus scalars
    (N, avgdl). This is the state the incremental retrieval stream probes
    per batch — the corpus is tokenized and shuffled exactly once, then
    every query batch is a broadcast probe. Caller owns release of the
    returned persisted frame."""
    d = docs.select(F.col(id_col).alias("_d"),
                    _tokens(F.col(text_col)).alias("_toks"))
    stats = d.agg(F.count("*").alias("n"),
                  F.sum(F.size("_toks")).alias("tot")).first()
    tf = (
        d.select("_d", F.size("_toks").alias("_dlen"),
                 F.explode("_toks").alias("word"))
        .groupBy("_d", "_dlen", "word").agg(F.count("*").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return tf, int(stats["n"]), float(stats["tot"]) / float(stats["n"])


def bm25_topk(docs: DataFrame | None, queries: DataFrame, k: int = 10,
              k1: float = BM25_K1, b: float = BM25_B,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id",
              query_terms_col: str = "terms",
              exclude_self: bool = False,
              state: tuple[DataFrame, int, float] | None = None
              ) -> DataFrame:
    """Okapi BM25 top-k: (query_id, doc_id, bm25, rank).

    ``queries`` carries (query_id, terms array); terms are deduplicated
    (Lucene-style — each distinct query term contributes once). Scoring:

        idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
        tfn(t,d)= tf · (k1+1) / (tf + k1 · (1 - b + b · |d| / avgdl))
        bm25    = Σ_t round(idf·tfn, micro) / 1e6

    Plan shape (scale-first): ONE corpus shuffle for the (doc, term, tf,
    doclen) table; broadcast query-term probe; df over the query
    vocabulary only (broadcast back); one agg keyed (query, doc) sized by
    matching postings. Ties rank by (score DESC, doc_id ASC) on the exact
    integer micro score, so the ranking is deterministic under any
    parallelism. ``exclude_self`` drops doc_id == query_id pairs (for
    query batches drawn from the corpus itself, e.g. near-dup review).
    Pass a prebuilt ``state`` (:func:`corpus_bm25_state`) to score many
    query batches against one persisted index — the incremental shape.
    """
    # doc length rides the tf grouping key (functionally dependent on _d);
    # N and avgdl are scalars by design (one tiny agg; the literal embeds
    # exact-integer division so any engine recomputes the same double)
    tf, n_docs, avgdl = state if state is not None \
        else corpus_bm25_state(docs, id_col, text_col)
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(F.col(query_terms_col))).alias("word"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # postings restricted to the query vocabulary — map-side broadcast
    # probe. PERSISTED: both df-counting and scoring consume it, and an
    # unpersisted frame would re-run the corpus tf shuffle per consumer.
    postings = tf.join(F.broadcast(qterms.select("word").distinct()), "word") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    # df over the query vocabulary only: bounded by |distinct query terms|
    dfq = postings.groupBy("word").agg(F.countDistinct("_d").alias("df"))

    # every constant combination stays symbolic (JVM-side IEEE folding),
    # so the oracle's literal arithmetic reproduces the exact same doubles
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    tfn = (F.col("tf") * (F.lit(k1) + F.lit(1.0))) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                   + F.lit(b) * F.col("_dlen")
                                   / F.lit(avgdl)))
    contrib = (
        postings.join(F.broadcast(dfq), "word")
        .join(F.broadcast(qterms), "word")
        .select("query_id", F.col("_d").alias("doc_id"),
                _micro(idf * tfn).alias("_m"))
    )
    if exclude_self:
        contrib = contrib.where(F.col("query_id") != F.col("doc_id"))
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("_m").alias("_sm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sm"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id",
                F.round(F.col("_sm") / 1_000_000.0, 6).alias("bm25"), "rank")
    )
    # internally-built index is forwarded for release; a caller-supplied
    # state stays alive across query batches (caller owns it)
    out._erps_persisted = [qterms, postings] + ([tf] if state is None else [])
    return out


def rrf_fuse(ranklists: list[DataFrame], k: int = 10, c: int = RRF_C,
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion of N rank lists: (query_id, doc_id, rrf, rank).

    Each input carries (query_id, <id>, rank). Contributions
    round(1e6/(c+rank)) are exact integers, so the fusion is a plain
    union + one map-side-combined sum — candidates missing from a list
    simply contribute nothing (the standard RRF convention), and no
    N-way outer join ever materializes. Final ties rank by
    (fused DESC, doc_id ASC) on the integer score.
    """
    parts = [
        rl.select(
            "query_id", F.col(rl.columns[1]).alias("doc_id"),
            _micro(F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))).alias("_m"),
        )
        for rl in ranklists
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy("query_id", "doc_id").agg(F.sum("_m").alias("_sm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sm"), F.asc("doc_id"))
    out = (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id",
                F.round(F.col("_sm") / 1_000_000.0, 6).alias("rrf"), "rank")
    )
    # forward any caches the input ranklists carry (deterministic release)
    fwd = []
    for rl in ranklists:
        fwd.extend(getattr(rl, "_erps_persisted", None) or [])
    if fwd:
        out._erps_persisted = fwd
    return out
