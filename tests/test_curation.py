"""Curation-library tests: gate conjunction, chunk carry columns, and the
training_corpus end-to-end accounting (battery row ``training_corpus`` is
the oracle-checked twin; these pin the library seams it composes)."""

from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.curation import (
    chunk_documents, curation_flags, training_corpus,
)

SF_TINY = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_TINY}/documents.parquet")


def test_curation_flags_conjunction_and_split(spark):
    """keep is exactly the AND of the three flags, and at sf0.001 every
    flag genuinely splits the corpus (thresholds sit at corpus medians —
    a gate that keeps or drops everything tests nothing)."""
    rows = curation_flags(_docs(spark)).collect()
    assert rows, "gate produced no rows"
    for r in rows:
        assert r["keep"] == (
            r["lang_ok"] and r["quality_ok"] and r["repetition_ok"])
    for flag in ("lang_ok", "quality_ok", "repetition_ok", "keep"):
        vals = {r[flag] for r in rows}
        assert vals == {True, False}, f"{flag} does not split: {vals}"


def test_chunk_documents_carry_columns(spark):
    """carry columns ride along unchanged on every chunk of a doc."""
    docs = _docs(spark).limit(50)
    out = chunk_documents(docs, carry=("source", "lang"))
    src = {r["doc_id"]: (r["source"], r["lang"])
           for r in docs.select("doc_id", "source", "lang").collect()}
    chunks = out.collect()
    assert chunks
    for r in chunks:
        assert (r["source"], r["lang"]) == src[r["doc_id"]]
    # every input doc produced >= 1 chunk
    assert {r["doc_id"] for r in chunks} == set(src)


def test_training_corpus_accounting(spark):
    """Per-source budgets equal a driver-side recomposition over the kept
    set: the join chain admits exactly keepers ∩ clean ∩ gated, and the
    chunk/word sums aggregate the same chunk rows."""
    from entity_resolution_pipeline_spark.operators.dedup import (
        contamination_flags, fuzzy_dedup,
    )

    docs = _docs(spark)
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)

    out = {r["source"]: (r["n_docs"], r["n_chunks"], r["n_words"])
           for r in training_corpus(docs, eval_docs).collect()}
    assert out, "empty corpus budget"

    keepers = {int(r["id"]) for r in
               fuzzy_dedup(docs, "doc_id", "text", k=3, n_bands=4,
                           threshold=0.7).where("is_keeper")
               .select("id").collect()}
    clean = {r["doc_id"] for r in
             contamination_flags(docs, eval_docs)
             .where(~F.col("contaminated")).select("doc_id").collect()}
    gated = {r["doc_id"] for r in
             curation_flags(docs).where("keep").select("doc_id").collect()}
    kept = keepers & clean & gated
    assert kept, "composition admitted nothing at sf0.001"
    # something must be dropped by each gate for the test to mean anything
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert keepers < all_ids and clean < all_ids and gated < all_ids

    chunks = chunk_documents(
        docs.where(F.col("doc_id").isin(list(kept))), carry=("source",)
    ).collect()
    expect = {}
    for r in chunks:
        d, c, w = expect.setdefault(r["source"], [set(), 0, 0])
        d.add(r["doc_id"])
        expect[r["source"]][1] = c + 1
        expect[r["source"]][2] = w + r["n_words"]
    assert out == {s: (len(d), c, w) for s, (d, c, w) in expect.items()}


def test_build_vocab_order_and_counts(spark):
    """Vocabulary is totally ordered (count DESC, word ASC), ranks are
    1..N, and counts reconcile with an independent token count."""
    from entity_resolution_pipeline_spark.operators.curation import build_vocab

    docs = _docs(spark)
    rows = build_vocab(docs, top_n=10).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r["n"], r["word"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert keys == sorted(keys)
    total_tokens = docs.selectExpr(
        "sum(size(filter(split(lower(text), '\\\\s+'), x -> x != ''))) s"
    ).collect()[0]["s"]
    assert 0 < sum(r["n"] for r in rows) <= total_tokens


def test_pack_sequences_invariants(spark):
    """Packing conserves words, fills sequences near budget, and never
    skips a seq_id within a shard; the assignment is deterministic."""
    from entity_resolution_pipeline_spark.operators.curation import (
        PACK_BUDGET, chunk_documents, pack_sequences,
    )

    chunks = chunk_documents(_docs(spark))
    total = chunks.groupBy().sum("n_words").collect()[0][0]
    rows = pack_sequences(chunks).collect()
    assert sum(r["n_words"] for r in rows) == total
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1, "sharding degenerate"
    for shard, rs in by_shard.items():
        seqs = sorted(r["seq_id"] for r in rs)
        assert seqs == list(range(len(seqs))), f"shard {shard} gaps: {seqs}"
        # every non-final sequence ends at/past the budget boundary: its
        # last chunk STARTS inside the window, so only the tail may be short
        for r in rs:
            assert r["n_words"] < PACK_BUDGET + 32  # budget + max chunk size
    again = {(r["shard"], r["seq_id"]): (r["n_chunks"], r["n_words"])
             for r in pack_sequences(chunks).collect()}
    assert again == {(r["shard"], r["seq_id"]): (r["n_chunks"], r["n_words"])
                     for r in rows}


def test_lm_perplexity_closed_form(spark):
    """Hand-computed add-one bigram LM on a 3-doc corpus:
    unigrams a:2 b:3 solo:1 (V=3); bigram instances 'a b','b a' (doc 1)
    and 'b b' (doc 2), each with count 1."""
    import math

    from entity_resolution_pipeline_spark.operators.curation import lm_perplexity

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b b"), (3, "solo")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in lm_perplexity(df).collect()}
    # doc 1: P(a b)=(1+1)/(2+3)=0.4, P(b a)=(1+1)/(3+3)=1/3
    alp1 = (math.log(0.4) + math.log(1 / 3)) / 2
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["avg_logp"] == round(alp1, 6)
    assert rows[1]["perplexity"] == round(math.exp(-alp1), 4)
    # doc 2: P(b b)=(1+1)/(3+3)=1/3 -> ppl 3.0
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["perplexity"] == 3.0
    # doc 3: single token -> no bigrams, null score
    assert rows[3]["n_bigrams"] == 0
    assert rows[3]["avg_logp"] is None and rows[3]["perplexity"] is None


def test_dup_span_fraction_closed_form(spark):
    """k=5 shingles: docs 1/2 share exactly 'a b c d e' (1 of 2 shingles
    each -> frac 0.5); a short doc degrades to its whole-token shingle."""
    from entity_resolution_pipeline_spark.operators.curation import (
        dup_span_fraction,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dup_span_fraction(df, k=5).collect()}
    assert (rows[1]["n_shingles"], rows[1]["n_shared"]) == (2, 1)
    assert rows[1]["dup_span_frac"] == 0.5
    assert (rows[2]["n_shingles"], rows[2]["n_shared"]) == (2, 1)
    assert (rows[3]["n_shingles"], rows[3]["n_shared"]) == (1, 0)
    assert rows[3]["dup_span_frac"] == 0.0


def test_training_corpus_caches_release_deterministically(spark):
    """training_corpus owns the shared shingle table and forwards
    fuzzy_dedup's internal caches; after materialize + release_persisted
    no NEW cached RDDs remain (same contract as the dedup family)."""
    from entity_resolution_pipeline_spark.operators.curation import (
        training_corpus,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    def cached_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    docs = _docs(spark)
    before = cached_ids()
    out = training_corpus(docs, docs.where(F.col("doc_id") % 97 == 0))
    out.count()
    assert len(getattr(out, "_erps_persisted", [])) >= 2  # shingles + sigs
    release_persisted(out)
    assert cached_ids() <= before


# --- round-4 additions: span removal, extended gate, unbounded-vocab fallback


def _py_remove_spans(texts: dict, k: int = 5, min_df: int = 2) -> dict:
    """Pure-Python reference for remove_duplicate_spans."""
    toks = {i: [w for w in t.split() if w] for i, t in texts.items()}

    def spans(ws):
        if not ws:
            return []
        if len(ws) < k:
            return [(1, len(ws), " ".join(ws).lower())]
        return [(i, i + k - 1, " ".join(ws[i - 1:i + k - 1]).lower())
                for i in range(1, len(ws) - k + 2)]

    df: dict = {}
    for i, ws in toks.items():
        for sh in {s for _, _, s in spans(ws)}:
            df[sh] = df.get(sh, 0) + 1
    out = {}
    for i, ws in toks.items():
        covered = set()
        for a, b, sh in spans(ws):
            if df[sh] >= min_df:
                covered.update(range(a, b + 1))
        kept = [w for j, w in enumerate(ws, 1) if j not in covered]
        out[i] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def test_remove_duplicate_spans_vs_python(spark):
    """Constructed corpus with a known shared 5-span, a whole shared short
    doc, and unique text: Spark output matches the scalar reference
    row-for-row (counts AND reassembled text)."""
    from entity_resolution_pipeline_spark.operators.curation import (
        remove_duplicate_spans,
    )

    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "intro words alpha beta gamma delta epsilon closing run here",
        3: "totally unique text with no shared spans at all present",
        4: "short shared doc",
        5: "short shared doc",
        6: "Alpha Beta GAMMA delta epsilon different tail words here now",
        7: "",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_removed"], r["text_clean"])
           for r in remove_duplicate_spans(docs).collect()}
    want = _py_remove_spans(texts)
    want[7] = (0, 0, "")
    assert got == want
    # the case-insensitive match fired: doc 6 lost its Alpha..epsilon span
    assert got[6][1] >= 5
    # the fully-shared short docs were removed entirely
    assert got[4] == (3, 3, "") and got[5] == (3, 3, "")


def test_training_corpus_remove_spans_budget(spark):
    """remove_spans=True budgets equal the manual composition: strip spans
    from the surviving docs, drop the fully-stripped, chunk, aggregate —
    i.e. the budgets shrink exactly by the removed spans."""
    from entity_resolution_pipeline_spark.operators.curation import (
        remove_duplicate_spans, training_corpus,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    docs = _docs(spark)
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)

    base = training_corpus(docs, eval_docs)
    plain = {r["source"]: (r["n_docs"], r["n_chunks"], r["n_words"])
             for r in base.collect()}
    out_df = training_corpus(docs, eval_docs, remove_spans=True)
    out = {r["source"]: (r["n_docs"], r["n_chunks"], r["n_words"])
           for r in out_df.collect()}
    release_persisted(base)
    release_persisted(out_df)

    # manual composition over the same kept set
    from entity_resolution_pipeline_spark.operators.curation import (
        chunk_documents, curation_flags,
    )
    from entity_resolution_pipeline_spark.operators.dedup import (
        contamination_flags, fuzzy_dedup,
    )
    keepers = fuzzy_dedup(docs, k=3, n_bands=4, threshold=0.7) \
        .where("is_keeper").select(F.col("id").cast("long").alias("doc_id"))
    clean = contamination_flags(docs, eval_docs) \
        .where(~F.col("contaminated")).select("doc_id")
    gated = curation_flags(docs).where("keep").select("doc_id")
    kept = docs.select("doc_id", "source", "text") \
        .join(keepers, "doc_id").join(clean, "doc_id").join(gated, "doc_id")
    stripped = remove_duplicate_spans(kept)
    kept2 = kept.select("doc_id", "source").join(
        stripped.where(F.col("n_removed") < F.col("n_words"))
        .select("doc_id", F.col("text_clean").alias("text")), "doc_id")
    manual = {
        r["source"]: (r["n_docs"], r["n_chunks"], r["n_words"])
        for r in chunk_documents(kept2, carry=("source",))
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n_docs"),
             F.count("*").alias("n_chunks"),
             F.sum("n_words").alias("n_words")).collect()
    }
    assert out == manual
    # the kept set is already fuzzy-deduplicated, so at sf0.001 there may
    # be nothing left to strip — budgets can only ever shrink, though
    assert sum(v[2] for v in out.values()) <= sum(v[2] for v in plain.values())

    # inject corpus-wide boilerplate (the case remove_spans exists for):
    # every doc shares a >=5-word tail span, so the stripped pipeline's
    # word budget MUST shrink strictly vs the plain one on the same corpus
    boiler = docs.withColumn(
        "text", F.concat(F.col("text"),
                         F.lit(" standard footer boilerplate sentence"
                               " repeated on every page")))
    plain_b_df = training_corpus(boiler, eval_docs)
    strip_b_df = training_corpus(boiler, eval_docs, remove_spans=True)
    plain_b = sum(r["n_words"] for r in plain_b_df.collect())
    strip_b = sum(r["n_words"] for r in strip_b_df.collect())
    release_persisted(plain_b_df)
    release_persisted(strip_b_df)
    assert strip_b < plain_b


def test_lm_and_tfidf_fallback_bit_equal(spark):
    """broadcast_limit=0 forces the salted shuffle-on-token path for BOTH
    LM tables and the tfidf df table; results match the broadcast path
    bit-for-bit (the salting replicates counts, never changes them)."""
    from entity_resolution_pipeline_spark.operators.curation import (
        lm_perplexity, tfidf_keywords,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    docs = _docs(spark)
    for fn in (lm_perplexity, tfidf_keywords):
        bc = fn(docs)
        sh = fn(docs, broadcast_limit=0)
        a = sorted(map(tuple, bc.collect()))
        b = sorted(map(tuple, sh.collect()))
        release_persisted(bc)
        release_persisted(sh)
        assert a == b and a


def test_curation_flags_extended(spark):
    """extended keep == base keep AND dup_span cap AND perplexity cap,
    recomputed independently from the two signal operators; both new
    flags genuinely split the sf0.001 corpus."""
    from entity_resolution_pipeline_spark.operators.curation import (
        GATE_MAX_DUP_SPAN, GATE_MAX_PPL, dup_span_fraction, lm_perplexity,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    docs = _docs(spark)
    ext_df = curation_flags(docs, extended=True)
    ext = {r["doc_id"]: r for r in ext_df.collect()}
    release_persisted(ext_df)
    base = {r["doc_id"]: r["keep"] for r in curation_flags(docs).collect()}
    spans = {r["doc_id"]: (r["dup_span_frac"] or 0.0) <= GATE_MAX_DUP_SPAN
             for r in dup_span_fraction(docs).collect()}
    ppl_df = lm_perplexity(docs)
    ppl = {r["doc_id"]: r["perplexity"] is None
           or r["perplexity"] <= GATE_MAX_PPL for r in ppl_df.collect()}
    release_persisted(ppl_df)
    assert set(ext) == set(base)
    for i, r in ext.items():
        assert r["dup_span_ok"] == spans[i]
        assert r["perplexity_ok"] == ppl[i]
        assert r["keep"] == (base[i] and spans[i] and ppl[i])
    for flag in ("dup_span_ok", "perplexity_ok"):
        assert {r[flag] for r in ext.values()} == {True, False}, flag


def test_training_corpus_extended_gate_is_stricter(spark):
    """extended_gate=True admits a subset of the base pipeline's docs
    (the stacked caps only remove), and its per-source budgets equal the
    manual composition with the extended gate."""
    from entity_resolution_pipeline_spark.operators.curation import (
        training_corpus,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    docs = _docs(spark)
    eval_docs = docs.where(F.col("doc_id") % 97 == 0)
    base_df = training_corpus(docs, eval_docs)
    ext_df = training_corpus(docs, eval_docs, extended_gate=True)
    base = {r["source"]: r["n_docs"] for r in base_df.collect()}
    ext = {r["source"]: r["n_docs"] for r in ext_df.collect()}
    release_persisted(base_df)
    release_persisted(ext_df)
    assert ext, "extended gate dropped everything"
    for src, n in ext.items():
        assert n <= base.get(src, 0), (src, n, base.get(src))
    assert sum(ext.values()) < sum(base.values())


def test_training_corpus_string_ids(spark):
    """String doc ids flow through the whole composition (dedup ∩
    decontamination ∩ gate → chunk → budget) without being nulled out by
    a hardcoded cast — the round-4 review found contamination_flags
    dropping every row for non-numeric ids."""
    from entity_resolution_pipeline_spark.operators.curation import (
        training_corpus,
    )
    from entity_resolution_pipeline_spark.operators.dedup import (
        contamination_flags,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    docs = _docs(spark).withColumn(
        "doc_id", F.concat(F.lit("doc-"), F.col("doc_id").cast("string")))
    eval_docs = docs.where(F.substring("doc_id", 5, 10).cast("long") % 97 == 0)

    flags = contamination_flags(docs, eval_docs).collect()
    assert len(flags) == docs.count()
    assert any(r["contaminated"] for r in flags)

    out_df = training_corpus(docs, eval_docs)
    out = out_df.collect()
    release_persisted(out_df)
    assert out and sum(r["n_docs"] for r in out) > 0


def test_line_dedup_c4_rules(spark):
    from entity_resolution_pipeline_spark.operators.curation import line_dedup

    banner = "accept our cookie policy to continue browsing"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique first body line of doc one\nok"),
            (2, f"{banner}\nunique second body line of doc two"),
            (3, f"{banner}\nunique third body line of doc three"),
            (4, banner),  # all lines drop -> present with empty text
        ],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(docs, min_count=3, min_words=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    # the banner occurs 4x >= 3 -> dropped everywhere; 'ok' < 4 words -> dropped
    assert out[1]["text_clean"] == "unique first body line of doc one"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
    assert out[2]["text_clean"] == "unique second body line of doc two"
    assert out[4]["n_kept"] == 0 and out[4]["text_clean"] == ""


def test_line_dedup_preserves_order(spark):
    from entity_resolution_pipeline_spark.operators.curation import line_dedup

    text = "\n".join(f"body line number {i} with several words" for i in range(10))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = line_dedup(docs, min_count=3, min_words=4).collect()[0]
    assert out["text_clean"] == text and out["n_kept"] == 10


def test_quality_filter_distills_gate(spark):
    """The distilled classifier must agree with the heuristic gate on the
    HELD-OUT half (odd ids) well above chance: accuracy >= 0.85 and
    AUC >= 0.9 — the 'train on a slice, deploy corpus-wide' contract."""
    import bisect

    from entity_resolution_pipeline_spark.operators.quality_model import (
        distill_curation_gate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = distill_curation_gate(docs).collect()
    assert len(rows) == docs.count()  # every document scored
    held = [r for r in rows if r["doc_id"] % 2 == 1]
    acc = sum(r["keep"] == r["gate_keep"] for r in held) / len(held)
    assert acc >= 0.85, acc
    pos = sorted(r["p_quality"] for r in held if r["gate_keep"])
    neg = sorted(r["p_quality"] for r in held if not r["gate_keep"])
    assert pos and neg  # both classes occur or the test is vacuous
    auc = sum(
        bisect.bisect_left(neg, p)
        + 0.5 * (bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p))
        for p in pos) / (len(pos) * len(neg))
    assert auc >= 0.9, auc


def test_pinned_quality_artifact_matches_fresh_training(spark):
    """The committed PINNED_QUALITY_MODEL (the battery's oracle-checked
    deployment artifact) must stay faithful to what training produces
    TODAY: retrain on the same slice/seed and require >= 0.98 keep-decision
    agreement corpus-wide between the fresh model (p >= 0.5) and the
    pinned native scorer (logit >= 0) — guards the constants against code
    drift in the feature folds or the training recipe."""
    from entity_resolution_pipeline_spark.operators.curation import (
        curation_flags,
    )
    from entity_resolution_pipeline_spark.operators.quality_model import (
        apply_quality_filter, doc_quality_features, score_quality_pinned,
        train_quality_filter,
    )
    from pyspark.sql import functions as FF

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    feats = doc_quality_features(docs)
    labeled = feats.join(
        curation_flags(docs).select(
            "doc_id", FF.col("keep").cast("double").alias("label")),
        "doc_id")
    asm, model = train_quality_filter(
        labeled.where(FF.col("doc_id") % 2 == 0))
    fresh = {r["doc_id"]: r["keep"] for r in
             apply_quality_filter(feats, asm, model).collect()}
    pinned = {r["doc_id"]: r["keep"] for r in
              score_quality_pinned(feats).collect()}
    assert set(fresh) == set(pinned)
    agree = sum(fresh[i] == pinned[i] for i in fresh) / len(fresh)
    assert agree >= 0.98, agree


def test_corpus_diff_statuses(spark):
    from entity_resolution_pipeline_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma CHANGED"), (4, "delta")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_semantic_keepers_shrink_training_corpus(spark):
    """Intersecting the SemDeDup keeper set can only REMOVE budget: every
    (source) row of the full run is bounded by the base run, and at the
    battery threshold the intersection genuinely bites."""
    from entity_resolution_pipeline_spark.operators.curation import (
        training_corpus,
    )
    from entity_resolution_pipeline_spark.operators.dedup import semantic_dedup
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )
    from pyspark.sql import functions as FF

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .repartition(8)
    ev = docs.where(FF.col("doc_id") % 97 == 0)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    sem = semantic_dedup(emb, n_cells=8, threshold=0.35) \
        .where("is_keeper").select("vec_id")
    base_df = training_corpus(docs, ev, stop_threshold=200)
    base = {r["source"]: r for r in base_df.collect()}
    release_persisted(base_df)
    full_df = training_corpus(docs, ev, stop_threshold=200,
                              semantic_keepers=sem)
    full = {r["source"]: r for r in full_df.collect()}
    release_persisted(full_df)
    assert set(full) <= set(base)
    for s, r in full.items():
        b = base[s]
        assert r["n_docs"] <= b["n_docs"]
        assert r["n_chunks"] <= b["n_chunks"]
        assert r["n_words"] <= b["n_words"]
    total_full = sum(r["n_docs"] for r in full.values())
    total_base = sum(r["n_docs"] for r in base.values())
    assert total_full < total_base  # the semantic stage genuinely bites


def test_quality_filter_artifact_roundtrip(spark, tmp_path):
    """save -> load -> re-score must reproduce p_quality byte-for-byte
    on a fresh feature frame (the deployment contract)."""
    from entity_resolution_pipeline_spark.operators.quality_model import (
        apply_quality_filter, doc_quality_features, load_quality_filter,
        save_quality_filter, train_quality_filter,
    )
    from entity_resolution_pipeline_spark.operators.curation import (
        curation_flags,
    )
    from pyspark.sql import functions as FF

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = doc_quality_features(docs)
    labeled = feats.join(
        curation_flags(docs).select("doc_id",
                                    FF.col("keep").cast("double")
                                    .alias("label")), "doc_id")
    asm, model = train_quality_filter(labeled)
    before = {r["doc_id"]: r["p_quality"] for r in
              apply_quality_filter(feats, asm, model).collect()}
    save_quality_filter(str(tmp_path / "qf"), asm, model)
    asm2, model2, manifest = load_quality_filter(str(tmp_path / "qf"))
    after = {r["doc_id"]: r["p_quality"] for r in
             apply_quality_filter(feats, asm2, model2).collect()}
    assert before == after
    assert manifest["feature_cols"][0] == "n_tokens"


def test_hashed_tf_embedding_scalar_reference(spark):
    """Feature-hashing vectors match a pure-python reference bit-for-bit
    (md5 slots, tf scatter, L2 norm, 6dp); empty docs are zero vectors;
    the vectors compose with the embedding stack (semantic_dedup runs)."""
    import hashlib
    import math

    from entity_resolution_pipeline_spark.functions.textstats import (
        hashed_tf_embedding,
    )
    from entity_resolution_pipeline_spark.operators.dedup import semantic_dedup

    texts = {1: "the cat sat on the mat", 2: "spark shuffles all day",
             3: "", 4: "the the the"}
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string")
    got = {r["doc_id"]: list(r["embedding"]) for r in
           hashed_tf_embedding(docs, dim=16).collect()}

    def ref(text):
        from collections import Counter
        c = Counter(int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 16
                    for t in text.lower().split())
        v = [float(c.get(i, 0)) for i in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        return [round(x / n, 6) if n > 0 else x for x in v]

    for d, text in texts.items():
        assert got[d] == ref(text), d
    assert got[3] == [0.0] * 16

    # composes with the embedding operators (vec_id/embedding contract)
    emb = hashed_tf_embedding(docs, dim=16).select(
        F.col("doc_id").alias("vec_id"), "embedding")
    out = semantic_dedup(emb, n_cells=2, threshold=0.99)
    assert out.count() == 4


def test_multilang_gate_differential_decisions(spark):
    """Per-language thresholds must make the SAME numeric signal gate
    differently by language: on the battery fixture there is a quality
    region where en passes (floor 0.65) and de fails (floor 0.68); the
    extended lang-ID recognizes all ten languages; unlisted languages
    fail lang_ok but still receive default-threshold signal flags."""
    import pyspark.sql.functions as FF

    from entity_resolution_pipeline_spark.functions.textstats import (
        LANG_STOPWORDS_EXT, lang_id_col, quality_score_col,
    )
    from entity_resolution_pipeline_spark.operators.curation import (
        curation_flags_multilang,
    )
    from entity_resolution_pipeline_spark.plans.benchqueries import (
        _lang_salt, q_curation_gate_multilang,
    )

    # 1. the extended table identifies every new language from its markers
    probe = spark.createDataFrame(
        [(i, f"filler words {_lang_salt(lang)}")
         for i, lang in enumerate(["pt", "nl", "sv", "pl", "tr"])],
        "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in probe.select(
        "doc_id", lang_id_col(FF.col("text"), LANG_STOPWORDS_EXT)
        .alias("lang_pred")).collect()}
    assert got == {0: "pt", 1: "nl", 2: "sv", 3: "pl", 4: "tr"}

    # 2. overlapping-quality differential on the battery frame
    flags = q_curation_gate_multilang(spark, "/root/testdata/sf0.01")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    salted = docs.select(
        "doc_id",
        FF.when(FF.col("lang").isin("de", "fr", "es"),
                FF.concat(FF.col("text"), FF.lit(" "),
                          FF.when(FF.col("lang") == "de",
                                  FF.lit(_lang_salt("de")))
                          .when(FF.col("lang") == "fr",
                                FF.lit(_lang_salt("fr")))
                          .otherwise(FF.lit(_lang_salt("es")))))
        .otherwise(FF.col("text")).alias("text"))
    q = salted.select(
        "doc_id", quality_score_col(FF.col("text")).alias("quality"))
    j = flags.join(q, "doc_id")
    en_pass = [r["quality"] for r in
               j.where("lang_pred = 'en' AND quality_ok").collect()]
    de_fail = [r["quality"] for r in
               j.where("lang_pred = 'de' AND NOT quality_ok").collect()]
    assert en_pass and de_fail
    assert min(en_pass) <= max(de_fail), (
        "no overlapping quality region — per-language floors vacuous")
    # the en docs inside the overlap PASS while de docs there FAIL
    overlap_en = [v for v in en_pass if v <= max(de_fail)]
    assert overlap_en, "differential never fires on identical signals"

    # 3. unlisted language: lang_ok false, default-threshold flags defined
    und = flags.where("lang_pred = 'und'")
    n_und = und.count()
    assert n_und > 0
    assert und.where("lang_ok").count() == 0
    assert und.where("quality_ok IS NULL OR repetition_ok IS NULL").count() == 0

    # 4. config is data, not literals: loosening de's floor flips keeps
    from entity_resolution_pipeline_spark.operators.curation import (
        LANG_GATE_CONFIG,
    )
    loose = [("de", 0.0, dup, topx) if lang == "de" else
             (lang, mq, dup, topx)
             for lang, mq, dup, topx in LANG_GATE_CONFIG]
    relaxed = curation_flags_multilang(salted, config=loose)
    strict_keep = flags.where("lang_pred='de' AND keep").count()
    loose_keep = relaxed.where("lang_pred='de' AND keep").count()
    assert loose_keep > strict_keep


def test_ccnet_buckets_terciles(spark):
    """Head/middle/tail are perplexity terciles per source: ~n/3 each,
    ordered head ≤ middle ≤ tail on perplexity, nulls in tail."""
    from entity_resolution_pipeline_spark.operators.curation import (
        ccnet_quality_buckets,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    docs = _docs(spark)
    out = ccnet_quality_buckets(docs)
    rows = out.collect()
    release_persisted(out)
    assert len(rows) == docs.count()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, members in by_src.items():
        scored = [m for m in members if m.perplexity is not None]
        counts = {"head": 0, "middle": 0, "tail": 0}
        for m in members:
            counts[m.bucket] += 1
            if m.perplexity is None:
                assert m.bucket == "tail"
        n = len(scored)
        # terciles within rounding of n/3 (interpolated cuts)
        assert abs(counts["head"] - n / 3) <= 1, (src, counts)
        # ordering: every head ppl <= every middle ppl <= every tail ppl
        h = [m.perplexity for m in scored if m.bucket == "head"]
        mid = [m.perplexity for m in scored if m.bucket == "middle"]
        t = [m.perplexity for m in scored if m.bucket == "tail"]
        if h and mid:
            assert max(h) <= min(mid)
        if mid and t:
            assert max(mid) <= min(t)
