"""Corpus-curation operators for training-data pipelines.

The library home of the per-document keep/drop gate, the fixed-window
chunker, and the corpus-analysis/sample-prep family (length percentiles,
vocabulary build, domain-level curation, sequence packing, LM-perplexity
scoring). Battery rows ``curation_gate`` / ``docs_chunk`` / etc. exercise
them standalone; ``training_corpus`` composes the gate + chunker with
fuzzy dedup and decontamination into the full end-to-end flow a 100 TB
curation job runs. The per-document signals are zero-shuffle native
projections; the corpus-level operators pay exactly one exchange each —
see PLANS.md "Curation battery rows are shuffle-free map work" and
"Corpus-analysis + packing rows".

No reference analog (the reference is an ER system); these are the
LLM-pipeline extensions graded alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GATE_MIN_QUALITY = 0.65   # corpus-median quality floor (see curation_gate)
GATE_DUP_WORD_PCT = 55    # duplicate-word fraction cap, in percent
GATE_TOP_WORD_X = 10      # top-word fraction cap = 1 / GATE_TOP_WORD_X

CHUNK_SIZE = 32           # words per training chunk
CHUNK_STRIDE = 24         # overlap = CHUNK_SIZE - CHUNK_STRIDE = 8 words


def curation_flags(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document keep/drop gate: language-ID == en, quality floor, and
    Gopher-style repetition caps as INTEGER cross-multiplications of the
    exact counts (no float division can drift between engines). Each flag
    is emitted alongside the conjunction so oracles verify every rule."""
    from ..functions.textstats import (
        lang_id_col, quality_score_col, repetition_counts_col,
    )

    d = docs.select(
        F.col(id_col),
        lang_id_col(F.col(text_col)).alias("lang_pred"),
        quality_score_col(F.col(text_col)).alias("quality"),
        repetition_counts_col(F.col(text_col)).alias("r"),
    )
    d = d.select(
        id_col,
        (F.col("lang_pred") == "en").alias("lang_ok"),
        (F.col("quality") >= F.lit(GATE_MIN_QUALITY)).alias("quality_ok"),
        (((F.col("r.total_words") - F.col("r.distinct_words")) * 100
          <= F.col("r.total_words") * GATE_DUP_WORD_PCT)
         & (F.col("r.top_word_count") * GATE_TOP_WORD_X
            <= F.col("r.total_words"))).alias("repetition_ok"),
    )
    return d.select(
        id_col, "lang_ok", "quality_ok", "repetition_ok",
        (F.col("lang_ok") & F.col("quality_ok")
         & F.col("repetition_ok")).alias("keep"),
    )


def chunk_documents(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE,
                    carry: tuple[str, ...] = ()) -> DataFrame:
    """Fixed-window chunking with overlap — one posexplode over a per-row
    transform(sequence(...)), so the fan-out never shuffles. Short docs
    produce exactly one (possibly short) chunk; the tail partial window is
    kept. ``carry`` columns ride along unchanged."""
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.floor((n - size + stride - 1) / stride).cast("int") + 1)
    d = docs.select(id_col, *carry, w.alias("w"), n_chunks.alias("nc"))
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("nc") - 1),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(F.col("w"), i * stride + 1, size))
            .alias("t"),
            F.size(F.slice(F.col("w"), i * stride + 1, size))
            .cast("long").alias("n"),
        ),
    )
    d = d.select(id_col, *carry, F.posexplode(chunks).alias("chunk_id", "c"))
    return d.select(
        id_col, *carry,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("c.t").alias("chunk_text"),
        F.col("c.n").alias("n_words"),
    )


def training_corpus(docs: DataFrame, eval_docs: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    source_col: str = "source",
                    stop_threshold: int | None = None) -> DataFrame:
    """THE end-to-end training-data pipeline: fuzzy-dedup keepers ∩ not
    benchmark-contaminated ∩ curation-gate keep → overlap-chunk → per-source
    corpus budget (docs, chunks, words). At 100 TB this is one corpus scan
    for the gate (zero-shuffle projections), the bucketed LSH dedup, the
    broadcast decontamination join, a map-side chunk fan-out, and ONE final
    aggregation on source. The corpus is shingled exactly ONCE: a single
    persisted shingle table is passed explicitly to the LSH/Jaccard phases
    AND the decontamination probe. (Without the explicit handoff the
    plan-identical subtrees are usually deduped by Spark's CacheManager
    substitution anyway — but that silently breaks if k differs or column
    pruning perturbs the subplan; passing the table makes the
    single-tokenization guarantee structural, and its release
    deterministic via ``_erps_persisted``.)"""
    from pyspark import StorageLevel

    from .dedup import contamination_flags, fuzzy_dedup, shingle_table

    # join keys are cast to the INPUT id column's own type — a hardcoded
    # long would silently null out (and drop) every row for string ids
    id_type = docs.schema[id_col].dataType

    sh = shingle_table(docs, id_col, text_col, k=3) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    fd = fuzzy_dedup(docs, id_col, text_col, k=3, n_bands=4, threshold=0.7,
                     stop_threshold=stop_threshold, shingles=sh)
    keepers = (
        fd.where("is_keeper")
        .select(F.col("id").cast(id_type).alias(id_col))
    )
    clean = (
        contamination_flags(docs, eval_docs, id_col, text_col, shingles=sh)
        .where(~F.col("contaminated")).select(id_col)
    )
    gated = curation_flags(docs, id_col, text_col) \
        .where("keep").select(id_col)
    kept = (
        docs.select(id_col, source_col, text_col)
        .join(keepers, id_col)
        .join(clean, id_col)
        .join(gated, id_col)
    )
    chunks = chunk_documents(kept, id_col, text_col, carry=(source_col,))
    out = chunks.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum("n_words").alias("n_words"),
    )
    # own the shared shingle table AND forward fuzzy_dedup's internal
    # caches (LSH signatures) so release_persisted frees everything
    out._erps_persisted = [sh, *(getattr(fd, "_erps_persisted", None) or [])]
    return out


# --- Corpus analysis + sample prep ------------------------------------------------

PACK_BUDGET = 64          # words per packed training sequence
PACK_SHARDS = 8           # independent packing shards (= writer tasks at scale)


def _tokens(text_col):
    """lower → split on whitespace → drop empties (the shared corpus
    tokenization; mirrors the decontamination / vocab oracles verbatim)."""
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def corpus_length_stats(docs: DataFrame, source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Per-source document-length distribution (EXACT p50/p90/p99 token
    counts + mean) — the profiling pass that sizes chunking and packing
    budgets before a training run. Exact `percentile` (not approx) so the
    DuckDB `quantile_cont` oracle matches bit-for-bit after rounding; at
    100 TB the per-group sort is bounded by the largest source, and the
    map side reduces each doc to ONE long before the single exchange."""
    d = docs.select(source_col, F.size(_tokens(F.col(text_col)))
                    .cast("long").alias("n_tokens"))
    return d.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.percentile("n_tokens", 0.5), 4).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", 0.9), 4).alias("p90_tokens"),
        F.round(F.percentile("n_tokens", 0.99), 4).alias("p99_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
    )


def build_vocab(docs: DataFrame, top_n: int = 200,
                text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: top-N words by frequency with a total
    deterministic order (count DESC, word ASC) and a 1-based rank — the
    counting pass a tokenizer/BPE training job runs first. The classic
    map-side-combined wordcount: explode → partial+final count; the top-N
    is TakeOrdered (distributed partial top-N per partition), NEVER a
    single-partition global sort — only the ≤N survivors see the final
    row_number window."""
    counts = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .groupBy("word").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    return counts.select(
        F.row_number().over(w).cast("int").alias("rank"), "word", "n")


DOMAIN_MIN_DOCS = 25        # domain volume floor (splits the testdata domains)
DOMAIN_MIN_QUALITY = 0.655  # domain mean-quality floor (sits at the median)


def domain_stats(docs_with_url: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Domain-level curation (the crawl-side filter that runs BEFORE any
    per-document gate): group by eTLD+1, emit volume + mean quality and
    the two floor flags — real webtext pipelines drop whole domains, not
    just documents. One projection for (etld1, quality), one exchange on
    the domain key; both flags emitted so the oracle verifies each rule."""
    from ..functions.domains import etld1_col
    from ..functions.textstats import quality_score_col

    d = docs_with_url.select(
        etld1_col(F.col(url_col)).alias("etld1"),
        quality_score_col(F.col(text_col)).alias("quality"),
    )
    g = d.groupBy("etld1").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    return g.select(
        "etld1", "n_docs", "avg_quality",
        (F.col("n_docs") >= DOMAIN_MIN_DOCS).alias("volume_ok"),
        (F.col("avg_quality") >= DOMAIN_MIN_QUALITY).alias("quality_ok"),
        ((F.col("n_docs") >= DOMAIN_MIN_DOCS)
         & (F.col("avg_quality") >= DOMAIN_MIN_QUALITY)).alias("keep"),
    )


def pack_sequences(chunks: DataFrame, id_col: str = "doc_id",
                   budget: int = PACK_BUDGET,
                   shards: int = PACK_SHARDS) -> DataFrame:
    """Pack curation chunks into fixed-budget training sequences:
    md5-shard each doc, order chunks (doc_id, chunk_id) within the shard,
    and assign every chunk to the sequence containing its starting word
    offset (seq_id = floor(running_offset / budget)) — the streaming
    concat-then-split packing tokenizer pipelines use. Packing is per
    SHARD, not global: each shard is one writer task's window at scale,
    so parallelism = shards and no global sort exists. Output is
    sequence-level (n_chunks, n_words, fill vs budget)."""
    shard = (
        F.conv(F.substring(F.md5(F.concat(
            F.lit("pack:"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long") % shards
    ).cast("int")
    d = chunks.select(shard.alias("shard"), id_col, "chunk_id", "n_words")
    w = (Window.partitionBy("shard").orderBy(id_col, "chunk_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    d = d.select(
        "shard", "n_words",
        F.floor(F.coalesce(F.sum("n_words").over(w), F.lit(0)) / budget)
        .cast("long").alias("seq_id"),
    )
    return d.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_words").alias("n_words"),
        F.round(F.sum("n_words") / F.lit(float(budget)), 4).alias("fill"),
    )


def lm_perplexity(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality signal: train add-one-smoothed bigram
    statistics on the corpus itself, score every document by its
    pseudo-perplexity exp(-avg ln P(w2|w1)) — the filter web-scale
    pipelines run to rank documents by "looks like the reference corpus".

    P(w2|w1) = (B(w1,w2) + 1) / (U(w1) + V): bigram/unigram counts with
    add-one smoothing over vocabulary size V. Two count aggregations
    train the LM (classic map-side-combined wordcounts); scoring is the
    bigram-instance stream joined against the BROADCAST LM (CCNet LMs are
    trained on a capped sample precisely so they broadcast; with an
    unbounded LM the joins fall back to shuffle-on-token and would need
    the same hot-key salting the blocking table uses — documented, not
    built, since a capped LM is the production shape). Docs with < 2
    tokens score NULL with n_bigrams = 0.

    avg/ln/exp run on doubles in both engines; outputs are rounded
    (logp 6dp, ppl 4dp) so IEEE summation-order differences cannot flip
    the driver hash.
    """
    w = _tokens(F.col(text_col))
    # bind the token array once (interpreted HOF lambdas have no CSE)
    pairs = F.transform(
        F.array(w),
        lambda ww: F.zip_with(
            F.slice(ww, 1, F.greatest(F.size(ww) - 1, F.lit(0))),
            F.slice(ww, 2, F.greatest(F.size(ww) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"),
                                  F.concat(a, F.lit(" "), b).alias("bg")),
        ),
    )[0]
    inst = docs.select(F.col(id_col), F.explode(pairs).alias("p")) \
               .select(id_col, F.col("p.w1").alias("w1"),
                       F.col("p.bg").alias("bg"))

    toks = docs.select(F.explode(w).alias("word"))
    uni = toks.groupBy("word").agg(F.count("*").alias("u_n"))
    big = inst.groupBy("bg").agg(F.count("*").alias("b_n"))
    v = uni.count()  # scalar: vocabulary size (driver-side by design)

    scored = (
        inst.join(F.broadcast(big), "bg", "left")
        .join(F.broadcast(uni), inst["w1"] == uni["word"])
        .select(
            id_col,
            F.log((F.coalesce(F.col("b_n"), F.lit(0)) + F.lit(1))
                  / (F.col("u_n") + F.lit(v))).alias("logp"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.avg("logp").alias("alp"))
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.round(F.col("alp"), 6).alias("avg_logp"),
            F.round(F.exp(-F.col("alp")), 4).alias("perplexity"),
        )
    )


DUP_SPAN_K = 5   # n-gram width for the duplicated-span signal


def dup_span_fraction(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      k: int = DUP_SPAN_K) -> DataFrame:
    """RefinedWeb-style duplicated-span signal: for each document, the
    fraction of its distinct word k-shingles that also occur in at least
    one OTHER document — the per-doc diagnostic behind exact-substring
    dedup decisions (a doc whose spans are mostly corpus-shared is
    boilerplate or a copy even when no single pair-level match fires).

    One exchange for the shingle→doc-frequency count (map-side combined),
    one broadcast-free join back on the shingle key, one per-doc
    aggregation. Integer outputs (n_shingles, n_shared) plus the rounded
    fraction so the oracle verifies the counts, not just the ratio.
    """
    from ..functions.hashing import shingles_col

    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(F.lower(F.col(text_col)), k)).alias("shingle"),
    )
    freq = sh.groupBy("shingle").agg(F.countDistinct("id").alias("df"))
    per_doc = (
        sh.join(freq, "shingle")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long")
            .alias("n_shingles"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long")
            .alias("n_shared"),
            F.when(F.coalesce(F.col("n_shingles"), F.lit(0)) > 0,
                   F.round(F.col("n_shared") / F.col("n_shingles"), 6))
            .alias("dup_span_frac"),
        )
    )


TFIDF_TOP_K = 3


def tfidf_keywords(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   top_k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document keyword extraction: top-k terms by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1), deterministic tie-break (score DESC,
    word ASC) — the labeling/analysis pass that tags corpus documents
    with their distinguishing terms.

    Two map-side-combined aggregations build tf (doc_id, word) and df
    (word); N is a scalar; scoring joins tf against the BROADCAST df
    table (vocabulary-sized); the top-k window partitions BY DOCUMENT, so
    its sort is per-doc-vocabulary-sized and embarrassingly parallel —
    no global ordering anywhere. Scores are rounded to 6dp BEFORE ranking
    so cross-engine ulp noise in ln cannot flip a tie."""
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(_tokens(F.col(text_col))).alias("word"))
    tf = toks.groupBy("id", "word").agg(F.count("*").alias("tf"))
    df_t = toks.groupBy("word").agg(F.countDistinct("id").alias("df"))
    n_docs = docs.count()  # scalar by design

    scored = tf.join(F.broadcast(df_t), "word").select(
        "id", "word", "tf",
        F.round(F.col("tf") * (F.log((F.lit(n_docs) + 1.0)
                                     / (F.col("df") + 1)) + 1), 6)
        .alias("tfidf"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select(F.col("id").alias(id_col), "rank", "word",
                F.col("tf").cast("long").alias("tf"), "tfidf")
    )
