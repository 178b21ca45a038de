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

GATE_MAX_DUP_SPAN = 0.5   # extended gate: duplicated-span fraction cap
GATE_MAX_PPL = 30.65      # extended gate: LM pseudo-perplexity cap (≈ corpus p75)

# Per-language gate configuration (lang, min_quality, dup_word_pct cap,
# top-word 1/x cap) — real curation gates tune thresholds per language
# because the numeric signals are language-shifted (stopword-ratio terms
# reward en; morphology inflates German distinct-word counts, so its
# repetition caps loosen while its quality floor tightens). This is the
# DEFAULT config the multilang gate broadcasts; callers override with
# their own rows. Values straddle the corpus quality quartiles
# (0.60-0.85) so languages genuinely gate differently at sf0.01.
LANG_GATE_CONFIG: list[tuple[str, float, int, int]] = [
    ("en", 0.65, 55, 10),
    ("de", 0.68, 60, 8),
    ("fr", 0.62, 60, 10),
    ("es", 0.62, 55, 10),
    ("it", 0.65, 55, 10),
    ("pt", 0.60, 60, 10),
    ("nl", 0.60, 60, 10),
    ("sv", 0.60, 60, 10),
    ("pl", 0.60, 60, 10),
    ("tr", 0.60, 60, 10),
]


def curation_flags(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", extended: bool = False,
                   max_dup_span: float = GATE_MAX_DUP_SPAN,
                   max_perplexity: float = GATE_MAX_PPL) -> DataFrame:
    """Per-document keep/drop gate: language-ID == en, quality floor, and
    Gopher-style repetition caps as INTEGER cross-multiplications of the
    exact counts (no float division can drift between engines). Each flag
    is emitted alongside the conjunction so oracles verify every rule.

    ``extended=True`` stacks the two corpus-level signals real gates add
    on top of the per-document rules (they were previously computed but
    consumed by nothing): the RefinedWeb duplicated-span fraction
    (:func:`dup_span_fraction` ≤ ``max_dup_span``) and the CCNet LM
    pseudo-perplexity (:func:`lm_perplexity` ≤ ``max_perplexity``), each
    emitted as its own flag and ANDed into ``keep``. Docs the signals
    cannot score (no shingles / < 2 tokens) pass their cap — absence of
    evidence is not garbage. The base gate stays zero-shuffle; the
    extended gate pays the two signals' aggregations, which a 100 TB run
    schedules anyway when it computes the signals at all."""
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
    base = d.select(
        id_col, "lang_ok", "quality_ok", "repetition_ok",
        (F.col("lang_ok") & F.col("quality_ok")
         & F.col("repetition_ok")).alias("keep"),
    )
    if not extended:
        return base
    spans = dup_span_fraction(docs, id_col, text_col).select(
        id_col,
        (F.coalesce(F.col("dup_span_frac"), F.lit(0.0))
         <= F.lit(max_dup_span)).alias("dup_span_ok"),
    )
    ppl = lm_perplexity(docs, id_col, text_col)
    ppl_ok = ppl.select(
        id_col,
        (F.col("perplexity").isNull()
         | (F.col("perplexity") <= F.lit(max_perplexity)))
        .alias("perplexity_ok"),
    )
    out = (
        base.drop("keep")
        .join(spans, id_col)
        .join(ppl_ok, id_col)
        .select(
            id_col, "lang_ok", "quality_ok", "repetition_ok",
            "dup_span_ok", "perplexity_ok",
            (F.col("lang_ok") & F.col("quality_ok")
             & F.col("repetition_ok") & F.col("dup_span_ok")
             & F.col("perplexity_ok")).alias("keep"),
        )
    )
    out._erps_persisted = list(getattr(ppl, "_erps_persisted", None) or [])
    return out


def curation_flags_multilang(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             config: list[tuple] | None = None) -> DataFrame:
    """Per-LANGUAGE keep/drop gate: language ID over the 10-language
    extended stopword table, then thresholds looked up from a BROADCAST
    config dimension (not literals) — the same numeric quality /
    repetition signals gate differently per language, which is how
    production multilingual curation actually runs (per-language
    configured thresholds over shared signal extractors).

    Output: (id, lang_pred, lang_ok, quality_ok, repetition_ok, keep).
    ``lang_ok`` = the predicted language appears in the config (an
    allowed-language whitelist — 'und' and unlisted languages fail);
    quality/repetition rules evaluate with the language's thresholds, or
    the global defaults when the language is unlisted, so every flag is
    defined for every row. Repetition caps stay INTEGER
    cross-multiplications (per-language integer caps, no float division).

    Scale shape: the signal extraction is the same zero-shuffle
    projection as :func:`curation_flags`; the config join is an O(10)-row
    broadcast hash join — at 100 TB the config rides the task closure and
    the gate still never shuffles."""
    from ..functions.textstats import (
        LANG_STOPWORDS_EXT, lang_id_col, quality_score_col,
        repetition_counts_col,
    )

    rows = LANG_GATE_CONFIG if config is None else config
    cfg = docs.sparkSession.createDataFrame(
        rows, "lang_pred string, min_quality double, dup_pct int, top_x int")
    d = docs.select(
        F.col(id_col),
        lang_id_col(F.col(text_col), LANG_STOPWORDS_EXT).alias("lang_pred"),
        quality_score_col(F.col(text_col)).alias("quality"),
        repetition_counts_col(F.col(text_col)).alias("r"),
    )
    j = d.join(F.broadcast(cfg), "lang_pred", "left")
    dup_pct = F.coalesce(F.col("dup_pct"), F.lit(GATE_DUP_WORD_PCT))
    top_x = F.coalesce(F.col("top_x"), F.lit(GATE_TOP_WORD_X))
    flags = j.select(
        F.col(id_col), "lang_pred",
        F.col("min_quality").isNotNull().alias("lang_ok"),
        (F.col("quality")
         >= F.coalesce(F.col("min_quality"), F.lit(GATE_MIN_QUALITY)))
        .alias("quality_ok"),
        (((F.col("r.total_words") - F.col("r.distinct_words")) * 100
          <= F.col("r.total_words") * dup_pct)
         & (F.col("r.top_word_count") * top_x
            <= F.col("r.total_words"))).alias("repetition_ok"),
    )
    return flags.select(
        id_col, "lang_pred", "lang_ok", "quality_ok", "repetition_ok",
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
                    stop_threshold: int | None = None,
                    extended_gate: bool = False,
                    remove_spans: bool = False,
                    semantic_keepers: DataFrame | None = None) -> DataFrame:
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
    deterministic via ``_erps_persisted``.)

    ``extended_gate=True`` swaps in :func:`curation_flags`'s extended
    variant (dup-span + perplexity caps stacked on the base rules).
    ``remove_spans=True`` additionally runs
    :func:`remove_duplicate_spans` over the surviving documents BEFORE
    chunking — the RefinedWeb exact-substring removal step — so the
    chunk/word budgets reflect the span-stripped texts (documents whose
    every word was corpus-shared drop out entirely).

    ``semantic_keepers`` intersects a caller-provided keeper id set —
    typically ``semantic_dedup(embeddings).where("is_keeper")`` — so the
    budget also excludes embedding-space near-duplicates (the SemDeDup
    stage of a modern pipeline); one extra id-keyed semi-join, nothing
    else changes."""
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
    gate = curation_flags(docs, id_col, text_col, extended=extended_gate)
    gated = gate.where("keep").select(id_col)
    kept = (
        docs.select(id_col, source_col, text_col)
        .join(keepers, id_col)
        .join(clean, id_col)
        .join(gated, id_col)
    )
    if semantic_keepers is not None:
        sem = semantic_keepers.select(
            F.col(semantic_keepers.columns[0]).cast(id_type).alias(id_col))
        kept = kept.join(sem, id_col, "left_semi")
    extra_persisted = list(getattr(gate, "_erps_persisted", None) or [])
    if remove_spans:
        # the kept lineage (3-way join over dedup + decontamination +
        # gate) feeds the stripper's base/positions/rebuild AND the
        # rejoin below — persist it or each consumer re-runs the pipeline
        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        extra_persisted.append(kept)
        stripped = remove_duplicate_spans(kept, id_col, text_col)
        kept = (
            kept.select(id_col, source_col)
            .join(stripped.where(F.col("n_removed") < F.col("n_words"))
                  .select(id_col, F.col("text_clean").alias(text_col)),
                  id_col)
        )
    chunks = chunk_documents(kept, id_col, text_col, carry=(source_col,))
    out = chunks.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum("n_words").alias("n_words"),
    )
    # own the shared shingle table AND forward fuzzy_dedup's internal
    # caches (LSH signatures) + any extended-gate LM tables + whatever the
    # caller's semantic_keepers frame carried (semantic_dedup persists its
    # embeddings+norms base) so release_persisted frees everything
    out._erps_persisted = [sh, *(getattr(fd, "_erps_persisted", None) or []),
                           *extra_persisted,
                           *(getattr(semantic_keepers, "_erps_persisted",
                                     None) or [])]
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


# Defaults for url_blocklist_gate — a stand-in for the UT1/production
# blocklist feeds; real deployments swap in a million-domain dim table.
URL_BADWORD_TOKENS = ["casino", "xxx", "porn", "viagra", "warez"]


def url_blocklist_gate(docs_with_url: DataFrame,
                       blocked_domains: list[str],
                       badword_tokens: list[str] | None = None,
                       url_col: str = "url",
                       id_col: str = "doc_id") -> DataFrame:
    """URL-level filtering (C4 / FineWeb / RefinedWeb stage zero): drop
    documents whose eTLD+1 is on a domain blocklist (UT1-style) or whose
    URL contains an adult/spam token. Runs BEFORE any content is parsed —
    at 100 TB this is the cheapest gate in the pipeline, so its plan must
    stay that way: the blocklist is a broadcast dim (BHJ, no shuffle of
    the corpus), the token rule is one codegen'd regex over the url
    column, and the output is a zero-exchange projection of the input.
    Both rule flags are emitted separately so the oracle verifies each.
    """
    from ..functions.domains import etld1_col

    if badword_tokens is None:
        badword_tokens = URL_BADWORD_TOKENS
    spark = docs_with_url.sparkSession
    dim = F.broadcast(
        spark.createDataFrame([(d,) for d in blocked_domains],
                              "etld1: string")
        .withColumn("_blk", F.lit(True)))
    pat = "(" + "|".join(badword_tokens) + ")"
    d = docs_with_url.withColumn("etld1", etld1_col(F.col(url_col)))
    out = d.join(dim, "etld1", "left")
    domain_blocked = F.coalesce(F.col("_blk"), F.lit(False))
    token_hit = F.lower(F.col(url_col)).rlike(pat)
    return out.select(
        F.col(id_col), "etld1",
        domain_blocked.alias("domain_blocked"),
        token_hit.alias("url_token_hit"),
        (~domain_blocked & ~token_hit).alias("keep"),
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


LM_BROADCAST_LIMIT = 2_000_000   # count-table rows; above this, shuffle join
SALT_N = 8                       # salt width for hot-key replication
HOT_N = 64                       # how many hottest tokens get salted


def _count_table_join(inst: DataFrame, counts: DataFrame, inst_key,
                      counts_key: str, count_col: str, how: str,
                      salt_cols: tuple[str, ...], n_rows: int,
                      broadcast_limit: int | None,
                      n_salts: int | None = None,
                      hot_n: int | None = None) -> DataFrame:
    """Join a token stream against a (token, count) table.

    Below ``broadcast_limit`` rows the count table rides a broadcast hash
    join (the capped-LM production shape). Above it — the unbounded-
    vocabulary case that would OOM the driver under a forced broadcast —
    the join falls back to shuffle-on-token with HOT-KEY SALTING, the same
    skew treatment the blocking table uses: the ``hot_n`` most frequent
    tokens (a TakeOrdered over the count table — bounded driver state,
    like the ANN centroids) are replicated across ``n_salts`` salts on the
    count side, and each instance row picks its replica with a
    deterministic xxhash64 over ``salt_cols``; every other token joins
    unsalted. Join OUTPUT is identical either way (each instance row still
    meets exactly one count row), which is what the bit-equality pytest
    asserts."""
    # module-level knobs resolved at CALL time so tests can vary them
    n_salts = SALT_N if n_salts is None else n_salts
    hot_n = HOT_N if hot_n is None else hot_n
    cts = counts.withColumnRenamed(counts_key, "_ck")
    if broadcast_limit is None or n_rows <= broadcast_limit:
        return inst.join(F.broadcast(cts),
                         inst[inst_key] == F.col("_ck"), how).drop("_ck")
    hot = [r[0] for r in counts
           .orderBy(F.desc(count_col), F.asc(counts_key))
           .limit(hot_n).collect()]
    salt_i = F.when(
        F.col(inst_key).isin(hot),
        F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)),
    ).otherwise(F.lit(0)).cast("int")
    replicas = F.when(
        F.col("_ck").isin(hot),
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    salted = cts.withColumn("_salt", F.explode(replicas)) \
                .withColumn("_salt", F.col("_salt").cast("int"))
    out = (
        inst.withColumn("_s", salt_i)
        .join(salted, (inst[inst_key] == salted["_ck"])
              & (F.col("_s") == F.col("_salt")), how)
    )
    return out.drop("_s", "_salt", "_ck")


def lm_perplexity(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  broadcast_limit: int | None = LM_BROADCAST_LIMIT
                  ) -> DataFrame:
    """CCNet-style LM quality signal: train add-one-smoothed bigram
    statistics on the corpus itself, score every document by its
    pseudo-perplexity exp(-avg ln P(w2|w1)) — the filter web-scale
    pipelines run to rank documents by "looks like the reference corpus".

    P(w2|w1) = (B(w1,w2) + 1) / (U(w1) + V): bigram/unigram counts with
    add-one smoothing over vocabulary size V. Two count aggregations
    train the LM (classic map-side-combined wordcounts); scoring joins the
    bigram-instance stream against each LM table via
    :func:`_count_table_join` — broadcast while the table is below
    ``broadcast_limit`` rows (CCNet LMs are trained on a capped sample
    precisely so they broadcast), salted shuffle-on-token beyond it, so an
    unbounded vocabulary degrades to a shuffle join instead of failing on
    the 8 GB broadcast ceiling. Both LM tables are persisted (each feeds
    its row count, the possible hot-key draw, and the join) and forwarded
    on ``_erps_persisted`` for deterministic release. Docs with < 2
    tokens score NULL with n_bigrams = 0.

    avg/ln/exp run on doubles in both engines; outputs are rounded
    (logp 6dp, ppl 4dp) so IEEE summation-order differences cannot flip
    the driver hash.
    """
    from pyspark import StorageLevel

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
    uni = toks.groupBy("word").agg(F.count("*").alias("u_n")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    big = inst.groupBy("bg").agg(F.count("*").alias("b_n")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    v = uni.count()   # scalar: vocabulary size (driver-side by design)
    nb = big.count()  # scalar: bigram-table rows (guards its broadcast)

    step1 = _count_table_join(inst, big, "bg", "bg", "b_n", "left",
                              (id_col, "bg"), nb, broadcast_limit)
    step2 = _count_table_join(step1, uni, "w1", "word", "u_n", "inner",
                              (id_col, "bg"), v, broadcast_limit)
    scored = (
        step2.select(
            id_col,
            F.log((F.coalesce(F.col("b_n"), F.lit(0)) + F.lit(1))
                  / (F.col("u_n") + F.lit(v))).alias("logp"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.avg("logp").alias("alp"))
    )
    out = (
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
    out._erps_persisted = [uni, big]
    return out


def ccnet_quality_buckets(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          group_col: str = "source") -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020 §4):
    score every document with the corpus bigram LM
    (:func:`lm_perplexity`), then split each group (CCNet buckets per
    language; ``group_col`` generalizes) into perplexity terciles —
    ``head`` = cleanest third (lowest perplexity), ``middle``, ``tail``.
    Downstream pipelines train on head+middle and sample tail sparingly.

    Output: (id, group, perplexity, bucket) for every document;
    unscorable docs (< 2 tokens, NULL perplexity) land in ``tail``.

    The tercile cuts are EXACT percentiles (linear interpolation — the
    same in Spark's ``percentile`` and DuckDB's ``quantile_cont``, so
    the bucket edges are oracle-checkable), rounded to 6dp; one
    group-agg collapses the corpus to 2 cuts per group, which broadcast
    back — on top of the audited LM-scoring plan that is ONE extra
    exchange and a broadcast join, regardless of corpus size.
    """
    ppl = lm_perplexity(docs, id_col, text_col)
    j = ppl.join(docs.select(id_col, group_col), id_col)
    cuts = (j.where(F.col("perplexity").isNotNull())
            .groupBy(group_col)
            .agg(F.round(F.percentile("perplexity", F.lit(1 / 3)), 6)
                 .alias("p33"),
                 F.round(F.percentile("perplexity", F.lit(2 / 3)), 6)
                 .alias("p66")))
    out = (j.join(F.broadcast(cuts), group_col, "left")
           .select(
               F.col(id_col), F.col(group_col), F.col("perplexity"),
               F.when(F.col("perplexity").isNull(), F.lit("tail"))
               .when(F.col("perplexity") <= F.col("p33"), F.lit("head"))
               .when(F.col("perplexity") <= F.col("p66"), F.lit("middle"))
               .otherwise(F.lit("tail")).alias("bucket")))
    out._erps_persisted = list(getattr(ppl, "_erps_persisted", None) or [])
    return out


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


def remove_duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = DUP_SPAN_K,
                           min_df: int = 2) -> DataFrame:
    """Exact-substring span REMOVAL — the operation behind
    :func:`dup_span_fraction`'s diagnostic (RefinedWeb/Gopher pipelines
    don't just measure duplicated spans, they strip them from the kept
    documents). Every word covered by at least one k-shingle that occurs
    in ``min_df``-or-more documents is dropped; the survivors are
    reassembled in order. Output: (id, n_words, n_removed, text_clean).

    Matching is case-insensitive (shingles over lowered words — the same
    tokenization as the dup-span diagnostic); output words keep their
    original form. Docs shorter than ``k`` words degrade to a single
    whole-doc shingle, so short exact duplicates are removed entirely.

    Plan shape at 100 TB: positional shingles are a map-side ×~1 fan-out
    (one row per word position); the shingle document-frequency count is
    one map-side-combined exchange; covered word indices come from an
    equi-join on the shingle key plus a ×k map-side expansion; the
    reassembly is one per-doc aggregation whose sort is bounded by the
    longest document. Two shuffles total (shingle key, doc id) — the same
    exchanges the diagnostic already pays, plus the per-doc rebuild.
    """
    base, sh_pos = _positional_spans(docs, id_col, text_col, k)
    freq = sh_pos.groupBy("shingle").agg(F.countDistinct("id").alias("df"))
    covered = (
        sh_pos.join(freq.where(F.col("df") >= min_df), "shingle")
        .select("id", F.explode(F.sequence("pos", "endp")).alias("widx"))
        .distinct()
    )
    return _rebuild_without(base, covered, id_col)


def _positional_spans(docs: DataFrame, id_col: str, text_col: str,
                      k: int) -> tuple[DataFrame, DataFrame]:
    """(base=(id, w), positional spans=(id, pos, endp, shingle)) — the
    shared front half of exact-substring removal: original-case word
    arrays plus one lowered k-shingle per word position (whole-doc
    shingle for docs shorter than k)."""
    w = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(F.col(id_col).alias("id"), w.alias("w"))
    n = F.size("w")
    npos = F.when(n >= k, n - (k - 1)).otherwise(
        F.when(n > 0, F.lit(1)).otherwise(F.lit(0)))
    spans = F.transform(
        F.sequence(F.lit(1), npos),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.least(i + (k - 1), n).cast("int").alias("endp"),
            F.lower(F.concat_ws(" ", F.slice(F.col("w"), i, k)))
            .alias("shingle"),
        ),
    )
    sh_pos = (
        base.where(npos > 0)
        .select("id", F.explode(spans).alias("p"))
        .select("id", "p.pos", "p.endp", "p.shingle")
    )
    return base, sh_pos


def _rebuild_without(base: DataFrame, covered: DataFrame,
                     id_col: str) -> DataFrame:
    """Drop covered word indices and reassemble each doc in order — the
    shared back half of exact-substring removal (one per-doc aggregation
    whose sort is bounded by the longest document)."""
    words = base.select(
        "id", F.posexplode("w").alias("j", "word")
    ).select("id", (F.col("j") + 1).alias("widx"), "word")
    kept = words.join(covered, ["id", "widx"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "word"))),
            lambda s: s["word"],
        )).alias("text_clean"),
    )
    return (
        base.select("id", F.size("w").cast("long").alias("n_words"))
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_words",
            (F.col("n_words") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def corpus_span_shingles(corpus_docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = DUP_SPAN_K,
                         min_df: int = 1) -> DataFrame:
    """The static state for incremental span removal: the corpus's
    distinct positional k-shingles (optionally only those occurring in
    ≥ ``min_df`` corpus docs). At production scale this is one bucketed
    table written per corpus snapshot."""
    _, sh_pos = _positional_spans(corpus_docs, id_col, text_col, k)
    if min_df <= 1:
        return sh_pos.select("shingle").distinct()
    return (
        sh_pos.groupBy("shingle").agg(F.countDistinct("id").alias("df"))
        .where(F.col("df") >= min_df).select("shingle")
    )


def strip_spans_vs_corpus(delta_docs: DataFrame, corpus_shingles: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          k: int = DUP_SPAN_K) -> DataFrame:
    """Delta-vs-corpus exact-substring removal: strip from each DELTA
    document every word covered by a k-shingle that exists in the CORPUS
    shingle state — the ingest-time form of :func:`remove_duplicate_spans`
    (a new page's boilerplate is whatever the corpus has already seen; a
    pure function of (corpus state, delta row), so the streaming wrapper
    is batching-invariant by construction). One semi-join on the shingle
    key + the shared rebuild aggregation."""
    base, sh_pos = _positional_spans(delta_docs, id_col, text_col, k)
    covered = (
        sh_pos.join(corpus_shingles.select("shingle"), "shingle", "left_semi")
        .select("id", F.explode(F.sequence("pos", "endp")).alias("widx"))
        .distinct()
    )
    return _rebuild_without(base, covered, id_col)


def _window_fingerprints(w, min_len: int):
    """Column of md5 fingerprints for every ``min_len``-word window of the
    (lowered) token-array Column ``w``, built by ITERATIVE DOUBLING
    (sparse-table fingerprints): level-0 hashes each word; level j hashes
    the concat of two level-(j-1) hashes 2^(j-1) apart; the final
    arbitrary-length window combines two overlapping level-p blocks
    (p = floor(log2 L)). O(n·log L) hash ops per document instead of the
    O(n·L) of hashing each window's text directly — at L = 50 that is a
    12× map-side saving, and it is what makes min-length-L exact-substring
    dedup a pure projection at 100 TB. Fixed-width hex inputs at every
    combine step, so no concat ambiguity. fingerprints[i] covers words
    [i, i+L-1]; docs shorter than L produce an empty array (a sub-L doc
    cannot contain a length-≥L repeat)."""
    p = 0
    while (1 << (p + 1)) <= min_len:
        p += 1
    pw = 1 << p

    def _level(prev, half: int):
        # new length = len(prev) - half; sequence() is DESCENDING when
        # stop < start, so guard the short-array case to an empty array
        return _hof_bind(prev, lambda a: F.when(
            F.size(a) > half,
            F.transform(
                F.sequence(F.lit(1), F.size(a) - half),
                lambda i: F.md5(F.concat(F.element_at(a, i),
                                         F.element_at(a, i + half))),
            )).otherwise(F.array().cast("array<string>")))

    lvl = F.transform(w, lambda t: F.md5(t))
    for j in range(p):
        lvl = _level(lvl, 1 << j)
    if min_len == pw:
        return lvl
    off = min_len - pw  # overlapping combine: [i, i+pw-1] + [i+off, i+L-1]
    return _hof_bind(lvl, lambda a: F.when(
        F.size(a) > off,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - off),
            lambda i: F.md5(F.concat(F.element_at(a, i),
                                     F.element_at(a, i + off))),
        )).otherwise(F.array().cast("array<string>")))


def _hof_bind(value, fn):
    """Bind ``value`` once as a lambda variable (interpreted HOF lambdas
    have no CSE — same idiom as functions/textstats.py:_bind). Essential
    here: each doubling level references the previous level many times;
    without binding, Project collapse would inline level j-1 into every
    element_at of level j and the expression tree would grow ~2^p."""
    return F.transform(F.array(value), fn)[0]


def remove_long_repeats(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", min_len: int = 20,
                        min_count: int = 2) -> DataFrame:
    """Arbitrary-length exact-substring dedup (Lee et al. 2022,
    arXiv:2107.06499 §ExactSubstr): remove every token that lies inside a
    word sequence of ≥ ``min_len`` tokens occurring ≥ ``min_count`` times
    corpus-wide (occurrences, not documents — a within-document repeat
    counts, exactly as a suffix array would see it). Output:
    (id, n_words, n_removed, text_clean), same contract as
    :func:`remove_duplicate_spans`.

    Correctness reduction — why no suffix array is needed: a token lies
    in some repeated substring of length ≥ L **iff** it is covered by
    some EXACTLY-L-token window whose fingerprint occurs ≥ 2 times. (⇐ a
    duplicated L-window is itself a length-L repeat. ⇒ any repeat of
    length M ≥ L contains, around each of its tokens, at least one
    L-sub-window, and every L-sub-window of a repeated substring is
    repeated.) So min-length-L semantics collapse to a window-frequency
    count — embarrassingly parallel, unlike the paper's single-node
    suffix-array build.

    DEVIATION from the paper, shared with :func:`remove_duplicate_spans`:
    ALL occurrences are removed (the paper keeps one copy). Remove-all is
    order-free and deterministic under any partitioning; keep-one needs a
    globally-agreed survivor per maximal repeat, which the paper itself
    resolves arbitrarily. Err-toward-more-pruning is the cheap side for
    training data.

    Plan shape at 100 TB: the doubling fingerprints are a zero-shuffle
    projection (O(n log L) per doc, see :func:`_window_fingerprints`);
    one map-side-combined exchange counts window-hash occurrences; the
    duplicated-window set is tiny so its joins broadcast (AQE-verified at
    sf0.01: shuffles land only on the hash count and the two id-keyed
    rebuild exchanges — the same exchange family as
    :func:`remove_duplicate_spans`); the ×L coverage expansion is
    map-side and bounded by actual duplication. Crucially the exchange
    structure is INDEPENDENT of L — raising the 50-token threshold costs
    only log-factor map work, where a naive L-gram shingle table would
    ship L× the corpus.
    """
    base, wins = _long_repeat_windows(docs, id_col, text_col, min_len)
    freq = wins.groupBy("h").agg(F.count("*").alias("cnt"))
    covered = (
        wins.join(freq.where(F.col("cnt") >= min_count), "h")
        .select("id", F.explode(
            F.sequence(F.col("pos"),
                       F.col("pos") + F.lit(min_len - 1))).alias("widx"))
        .distinct()
    )
    return _rebuild_without(base, covered, id_col)


def _long_repeat_windows(docs: DataFrame, id_col: str, text_col: str,
                         min_len: int) -> tuple[DataFrame, DataFrame]:
    """(base=(id, w), windows=(id, pos, h)) — the shared front half of
    min-length-L exact-substring removal (doubling window fingerprints,
    one row per L-word window)."""
    wr = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(F.col(id_col).alias("id"), wr.alias("w"))
    fps = _window_fingerprints(
        F.transform(F.col("w"), lambda t: F.lower(t)), min_len)
    wins = (
        base.select("id", F.posexplode(fps).alias("pos0", "h"))
        .select("id", (F.col("pos0") + 1).alias("pos"), "h")
    )
    return base, wins


def corpus_window_fingerprints(corpus_docs: DataFrame,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               min_len: int = 20) -> DataFrame:
    """Static state for incremental long-repeat removal: the corpus's
    DISTINCT L-window fingerprints — the long-repeat analog of
    :func:`corpus_span_shingles` (at production scale: one bucketed table
    per corpus snapshot, ~1/L the rows of a positional shingle table)."""
    _, wins = _long_repeat_windows(corpus_docs, id_col, text_col, min_len)
    return wins.select("h").distinct()


def strip_long_repeats_vs_corpus(delta_docs: DataFrame,
                                 corpus_windows: DataFrame,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 min_len: int = 20) -> DataFrame:
    """Delta-vs-corpus min-length-L exact-substring removal: strip from
    each DELTA document every token covered by an L-word window the
    CORPUS has already seen — the ingest-time form of
    :func:`remove_long_repeats` (a new page's ≥L-token boilerplate is
    whatever the corpus contains; a pure function of (corpus state,
    delta row), so the streaming wrapper is batching-invariant by
    construction). One semi-join on the window-hash key + the shared
    rebuild aggregation — per-batch cost O(|delta|·n log L) map work
    plus the semi-join, never a corpus re-scan."""
    base, wins = _long_repeat_windows(delta_docs, id_col, text_col, min_len)
    covered = (
        wins.join(corpus_windows.select("h"), "h", "left_semi")
        .select("id", F.explode(
            F.sequence(F.col("pos"),
                       F.col("pos") + F.lit(min_len - 1))).alias("widx"))
        .distinct()
    )
    return _rebuild_without(base, covered, id_col)


TFIDF_TOP_K = 3


def tfidf_keywords(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   top_k: int = TFIDF_TOP_K,
                   broadcast_limit: int | None = LM_BROADCAST_LIMIT
                   ) -> DataFrame:
    """Per-document keyword extraction: top-k terms by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1), deterministic tie-break (score DESC,
    word ASC) — the labeling/analysis pass that tags corpus documents
    with their distinguishing terms.

    Two map-side-combined aggregations build tf (doc_id, word) and df
    (word); N is a scalar; scoring joins tf against the df table via
    :func:`_count_table_join` — broadcast while the vocabulary is below
    ``broadcast_limit`` rows, salted shuffle-on-word beyond it (unbounded
    webtext vocabularies must not ride a forced broadcast). The top-k
    window partitions BY DOCUMENT, so its sort is per-doc-vocabulary-sized
    and embarrassingly parallel — no global ordering anywhere. Scores are
    rounded to 6dp BEFORE ranking so cross-engine ulp noise in ln cannot
    flip a tie."""
    from pyspark import StorageLevel

    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(_tokens(F.col(text_col))).alias("word"))
    tf = toks.groupBy("id", "word").agg(F.count("*").alias("tf"))
    df_t = toks.groupBy("word").agg(F.countDistinct("id").alias("df")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = docs.count()  # scalar by design
    n_vocab = df_t.count()

    scored = _count_table_join(
        tf, df_t, "word", "word", "df", "inner",
        ("id", "word"), n_vocab, broadcast_limit,
    ).select(
        "id", "word", "tf",
        F.round(F.col("tf") * (F.log((F.lit(n_docs) + 1.0)
                                     / (F.col("df") + 1)) + 1), 6)
        .alias("tfidf"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("word"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select(F.col("id").alias(id_col), "rank", "word",
                F.col("tf").cast("long").alias("tf"), "tfidf")
    )
    out._erps_persisted = [df_t]
    return out


def sample_corpus_temperature(docs: DataFrame, alpha: float = 0.5,
                              budget_frac: float = 0.5,
                              id_col: str = "doc_id",
                              source_col: str = "source") -> DataFrame:
    """Temperature-weighted corpus mixing: (doc_id, source, rate, kept).

    LLM training mixtures up-weight small high-quality sources and
    down-weight the web firehose by sampling source s at a rate
    proportional to n_s^alpha (alpha<1 flattens the mixture — the
    GPT-3 / multilingual-LM "temperature" convention). Per-source rates:

        w_s    = n_s^alpha / Σ_s n_s^alpha
        rate_s = min(1, budget_frac · N · w_s / n_s)

    so the expected kept size is ≈ budget_frac · N with the source
    shares re-balanced toward exponent alpha. The keep decision is a
    deterministic md5 bucket (reproducible across engines, runs, and
    partitionings — a rand() sample would not survive re-execution of a
    lost partition, an md5 bucket does): kept ⇔ bucket < round(rate·2^32).

    Scale shape: one map-side-combined per-source count (bounded by the
    number of sources), a one-row normalizer, and a broadcast rate join
    back to the corpus — the corpus itself is touched exactly once,
    map-side. Σ n_s^alpha folds over the sources in SOURCE ORDER so the
    double sum is addition-order-reproducible. alpha=0.5 rides sqrt
    (IEEE-correctly-rounded, so bit-identical in any engine — the
    oracle-pinned configuration); other alphas use pow, where
    cross-engine parity is typically-but-not-guaranteed 1-ulp safe.
    """
    counts = docs.groupBy(F.col(source_col).alias("source")) \
        .agg(F.count("*").alias("n_s"))
    wexpr = F.sqrt(F.col("n_s")) if alpha == 0.5 \
        else F.pow(F.col("n_s"), F.lit(alpha))
    weighted = counts.select("source", "n_s", wexpr.alias("w"))
    norm = weighted.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "w"))),
            F.lit(0.0), lambda acc, x: acc + x["w"],
        ).alias("s_norm"),
        F.sum("n_s").alias("n_total"),
    )
    rates = weighted.crossJoin(F.broadcast(norm)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac) * F.col("n_total").cast("double")
                * F.col("w") / F.col("s_norm") / F.col("n_s"),
            ), 6,
        ).alias("rate"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
            1, 8),
        16, 10,
    ).cast("long")
    thr = F.round(F.col("rate") * F.lit(4294967296.0), 0).cast("long")
    return (
        docs.select(id_col, F.col(source_col).alias("source"),
                    bucket.alias("_b"))
        .join(F.broadcast(rates), "source")
        .select(id_col, "source", "rate", (F.col("_b") < thr).alias("kept"))
    )


def split_corpus(docs: DataFrame, id_col: str = "doc_id",
                 train_per_10k: int = 9000, val_per_10k: int = 500,
                 n_shards: int = 8) -> DataFrame:
    """Deterministic train/val/test split + shard-shuffle:
    (doc_id, bucket, split, shard, pos).

    The last pre-training step: every document lands in a split by md5
    bucket (0..9999 — train below ``train_per_10k``, then ``val_per_10k``
    buckets of validation, test above), a shard by an independent hash,
    and a POSITION inside its (split, shard) from a third hash — the
    "global shuffle" that decorrelates batch composition without any
    global sort: the position window partitions by (split, shard), so
    the sort is per-shard-sized and embarrassingly parallel. All three
    assignments are pure functions of the id — adding documents never
    reassigns existing ones (splits stay stable release-over-release,
    the property eval-set discipline needs), and re-running on any
    partitioning emits identical rows.
    """
    def _h(tag: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col(id_col).cast("string"))),
                1, 8),
            16, 10,
        ).cast("long")

    bucket = _h("split:") % 10000
    d = docs.select(
        id_col, bucket.alias("bucket"),
        (_h("shard:") % n_shards).cast("int").alias("shard"),
        _h("pos:").alias("_p"),
    ).withColumn(
        "split",
        F.when(F.col("bucket") < train_per_10k, F.lit("train"))
        .when(F.col("bucket") < train_per_10k + val_per_10k, F.lit("val"))
        .otherwise(F.lit("test")),
    )
    w = Window.partitionBy("split", "shard").orderBy("_p", id_col)
    return d.select(
        id_col, "bucket", "split", "shard",
        F.row_number().over(w).cast("int").alias("pos"),
    )


LINE_DEDUP_MIN_COUNT = 3   # C4: drop any line occurring >= 3x corpus-wide
LINE_DEDUP_MIN_WORDS = 4   # C4-ish: drop degenerate short lines


def line_dedup(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               min_count: int = LINE_DEDUP_MIN_COUNT,
               min_words: int = LINE_DEDUP_MIN_WORDS,
               line_sep: str = "\n") -> DataFrame:
    """C4-style line-level boilerplate removal (Raffel et al. 2020 §2.2,
    the rule "discarded any line that occurred more than [twice] in the
    data set", plus the short-line floor): split each document into
    lines, drop every line whose EXACT form occurs ``min_count``+ times
    corpus-wide or that has fewer than ``min_words`` words, and
    reassemble the survivors in order. Catches nav bars, cookie
    banners, footers — the cross-document boilerplate whole-doc dedup
    can't see (no reference analog; LLM-pipeline extension).

    Returns every input row: (id, n_lines, n_kept, text_clean) — docs
    whose lines all drop stay present with ``text_clean = ''`` so a
    downstream gate (not this operator) decides their fate.

    100 TB shape: one map-side line fan-out; ONE map-side-combined
    count shuffle on the line key; the frequent-line set comes back as
    a plain left-anti equi-join (NOT a forced broadcast — boilerplate
    line sets at web scale run to billions of rows; AQE may still
    choose BHJ when small); one reassembly aggregation on id with the
    order carried by the exploded position, sorted per GROUP (never a
    global sort). Line counting keys on the raw line string — at web
    scale substitute a 128-bit hash key to narrow the exchange; the
    string key is kept here so SQL oracles replicate the plan
    bit-for-bit.
    """
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             line_sep)).alias("pos", "line"),
    )
    frequent = (
        lines.groupBy("line").agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .select("line")
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
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
            .alias("n_kept"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Snapshot-over-snapshot corpus diff — the dataset-versioning audit a
    release pipeline runs between corpus N and N+1: every id labeled
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, text
    content hash differs) or ``unchanged``. Returns (id, status,
    old_hash, new_hash); hashes are md5 so any SQL engine reproduces the
    comparison (no reference analog; LLM-pipeline extension).

    100 TB shape: each side collapses to (id, md5) in ONE narrow map pass
    — the diff join moves two 32-hex strings per row, never text — and a
    single full-outer equi-join on id classifies everything. At equal
    snapshot sizes the join shuffles both id columns once; for the daily
    append-mostly case bucket both snapshot tables by id at write time
    and the exchange disappears entirely.
    """
    from ..functions.textstats import content_hash_col

    o = old.select(F.col(id_col).alias("id"),
                   content_hash_col(F.col(text_col)).alias("old_hash"))
    n = new.select(F.col(id_col).alias("id"),
                   content_hash_col(F.col(text_col)).alias("new_hash"))
    return (
        o.join(n, "id", "full_outer")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("old_hash").isNull(), F.lit("added"))
            .when(F.col("new_hash").isNull(), F.lit("removed"))
            .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
            .otherwise(F.lit("unchanged")).alias("status"),
            "old_hash", "new_hash",
        )
    )
