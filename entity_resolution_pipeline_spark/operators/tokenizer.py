"""Distributed BPE tokenizer training — merge-table induction over a corpus.

No reference analog (the reference tokenizes with a fixed regex,
/root/reference/src/extraction.py; LLM-pipeline extension): training a
byte-pair-encoding vocabulary is the canonical tokenizer-induction job a
pre-training pipeline runs over its corpus before anything else, and its
distributed shape is textbook Spark:

* ONE corpus pass builds the distinct-word frequency table (the classic
  Sennrich trick — BPE statistics depend only on (word, count), so a
  10^12-token corpus collapses to a vocabulary-sized table after a single
  map-side-combined wordcount shuffle);
* each merge iteration is then an aggregation over that *small* table
  (adjacent-pair counts weighted by word frequency) plus a 1-row argmax
  collect — the chosen pair is driver state exactly like the PQ codebooks
  (operators/ann.py) — and a NARROW left-fold re-segmentation;
* applying the trained tokenizer back to the corpus is a dictionary-encode:
  explode words, hash-join the final word→segmentation table, aggregate —
  never a per-document re-derivation of the merge loop.

Greedy application semantics are the standard left-to-right non-overlapping
scan (so ``l l l`` under merge (l,l) becomes ``[ll, l]``), implemented as a
single ``aggregate`` fold per word; ties in pair selection break by
(count DESC, left ASC, right ASC) so training is reproducible anywhere —
the battery oracle replays the full iterative loop in SQL with a
gaps-and-islands formulation of the same greedy scan.

Symbols start as single characters (no end-of-word marker: segmentation is
per word by construction, and the marker only disambiguates word-final
merges — documented deviation from Sennrich '16 kept for cross-engine
string parity).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark import StorageLevel


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, wc) — lowercase whitespace words, one shuffle with map-side
    combine. The ONLY corpus-width pass of training."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                                    F.lit(""))), r"\s+"),
                         lambda t: t != "")
            ).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _char_seq(word) -> F.Column:
    """Initial symbol sequence: the word's characters, 1 per element."""
    return F.transform(F.sequence(F.lit(1), F.length(word)),
                       lambda i: F.substring(word, i, 1))


def _apply_merge(seq, left: str, right: str, merged: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of adjacent (left, right)
    into ``merged`` — a single left fold; after a merge the accumulator's
    tail is ``merged`` (≠ ``left``, since ``right`` is non-empty), so an
    element can never participate in two merges, which is exactly the
    non-overlap rule (``l l l`` → ``[ll, l]``)."""
    return F.aggregate(
        seq,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


_MERGE_SCHEMA = T.StructType([
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("lft", T.StringType(), False),
    T.StructField("rgt", T.StringType(), False),
    T.StructField("merged", T.StringType(), False),
    T.StructField("pair_count", T.LongType(), False),
])


def _train_states(docs: DataFrame, n_merges: int, text_col: str
                  ) -> tuple[list, DataFrame]:
    """Run the merge loop; return (merge rows, final persisted vocab
    DataFrame (word, wc, seq)). Caller owns the returned persist."""
    vocab = (
        _word_counts(docs, text_col)
        .select("word", "wc", _char_seq(F.col("word")).alias("seq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merges: list = []
    for it in range(1, n_merges + 1):
        pairs = (
            vocab.where(F.size("seq") >= 2)
            .select(
                "wc",
                F.explode(F.transform(
                    F.sequence(F.lit(1), F.size("seq") - 1),
                    lambda i: F.struct(
                        F.element_at("seq", i).alias("l"),
                        F.element_at("seq", i + F.lit(1)).alias("r")),
                )).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("n"))
        )
        win = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1) \
                   .collect()
        if not win:
            break  # vocabulary fully merged before the budget ran out
        l, r, n = win[0]["l"], win[0]["r"], int(win[0]["n"])
        merged = l + r
        merges.append((it, l, r, merged, n))
        nxt = vocab.select(
            "word", "wc", _apply_merge(F.col("seq"), l, r, merged).alias("seq")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        nxt.count()  # materialize before releasing the parent
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (rank, lft, rgt, merged, pair_count) in training order.

    Per iteration cost is one aggregation over the vocabulary table +
    a 1-row collect; the corpus itself is read exactly once. Output is a
    driver-built local relation (the merge table IS tokenizer driver
    state, like FAISS codebooks)."""
    merges, vocab = _train_states(docs, n_merges, text_col)
    vocab.unpersist()
    return docs.sparkSession.createDataFrame(merges, schema=_MERGE_SCHEMA)


def bpe_token_stats(docs: DataFrame, n_merges: int = 8,
                    text_col: str = "text",
                    group_col: str = "source") -> DataFrame:
    """Apply a freshly-trained BPE vocabulary back to the corpus:
    per-``group_col`` (n_words, n_bpe_tokens, avg_tokens_per_word).

    The encode is a dictionary join — explode corpus words, hash-join the
    final word→|segmentation| table on the word key, aggregate — NOT a
    per-document replay of the merge loop: at 10^12 tokens the vocabulary
    table is millions of rows while the corpus is billions, so the join
    (broadcast when the vocabulary allows, shuffle otherwise) is the only
    scale-correct shape."""
    merges, vocab = _train_states(docs, n_merges, text_col)
    sizes = vocab.select("word", F.size("seq").alias("n_sub"))
    words = docs.select(
        F.col(group_col),
        F.explode(
            F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                             r"\s+"),
                     lambda t: t != "")).alias("word"))
    out = (
        words.join(sizes, "word")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
            F.round(F.avg("n_sub"), 6).alias("avg_tokens_per_word"),
        )
    )
    out._erps_persisted = [vocab]
    return out


def save_tokenizer(path: str, merges: list[tuple] | DataFrame) -> None:
    """Persist the merge table as a JSON artifact (S12-style, the
    tokenizer.json analog): the merge list IS the whole tokenizer —
    tiny driver state, readable by any runtime."""
    import json
    import os

    if isinstance(merges, DataFrame):
        merges = [tuple(r) for r in merges.orderBy("rank").collect()]
    os.makedirs(path, exist_ok=True)
    doc = {"version": 1, "algorithm": "bpe-words-chars",
           "merges": [{"rank": int(rk), "left": l, "right": r,
                       "merged": m, "pair_count": int(n)}
                      for rk, l, r, m, n in merges]}
    with open(os.path.join(path, "tokenizer.json"), "w") as f:
        json.dump(doc, f, sort_keys=True)


def load_tokenizer(path: str) -> list[tuple]:
    """Load the merge list back: [(rank, left, right, merged, count)]."""
    import json
    import os

    with open(os.path.join(path, "tokenizer.json")) as f:
        doc = json.load(f)
    return [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in sorted(doc["merges"], key=lambda m: m["rank"])]


def bpe_segment_with(docs: DataFrame, merges: list[tuple],
                     text_col: str = "text",
                     group_col: str = "source",
                     engine: str = "auto") -> DataFrame:
    """Apply a LOADED merge table to a new corpus (no retraining): derive
    the corpus's word table, segment it (:func:`bpe_segment_sizes` —
    narrow folds for small merge tables, Arrow-batched vocabulary-sized
    Python for production 30-50k-merge tokenizers), then dictionary-join
    exactly like :func:`bpe_token_stats`. This is the inference path:
    the tokenizer artifact travels, the corpus is never re-counted for
    training."""
    sizes = bpe_segment_sizes(docs, merges, text_col, engine)
    words = docs.select(
        F.col(group_col),
        F.explode(
            F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                             r"\s+"),
                     lambda t: t != "")).alias("word"))
    return (
        words.join(sizes, "word")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
            F.round(F.avg("n_sub"), 6).alias("avg_tokens_per_word"),
        )
    )


def _merge_fold_expr(merges: list[tuple]):
    """Chained narrow folds applying ``merges`` in rank order — exact and
    codegen-free but O(n_merges) expression depth: fine for tens of
    merges, NOT for a production 30-50k-merge table (Catalyst analysis
    time and stack depth both blow up)."""
    seq = _char_seq(F.col("word"))
    for _rk, l, r, m, _n in merges:
        seq = _apply_merge(seq, l, r, m)
    return seq


def _merge_pandas_udf(merges: list[tuple]):
    """Arrow-batched segmentation of WORDS (not documents): the merge
    list is a closure constant, each batch applies all merges per word
    in plain Python. This is the production path for large merge tables
    — the UDF runs over the DISTINCT-WORD table (vocabulary-sized, ~10⁷
    rows at 100 TB), never the corpus, so the Python cost is bounded by
    the vocabulary; the corpus only pays the dictionary join. Same
    greedy left-to-right non-overlapping semantics as the fold
    (pytest-pinned equal)."""
    from pyspark.sql.functions import pandas_udf

    ms = [(l, r, m) for _rk, l, r, m, _n in merges]

    @pandas_udf("int")
    def n_subtokens(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            s = list(w)
            for l, r, m in ms:
                if l not in s:  # cheap reject: most merges touch few words
                    continue
                res = []
                for x in s:
                    if res and res[-1] == l and x == r:
                        res[-1] = m
                    else:
                        res.append(x)
                s = res
            out.append(len(s))
        return pd.Series(out)

    return n_subtokens


def bpe_segment_sizes(docs: DataFrame, merges: list[tuple],
                      text_col: str = "text",
                      engine: str = "auto") -> DataFrame:
    """(word, n_sub) — the word→|segmentation| dictionary for a LOADED
    merge table over this corpus's vocabulary. ``engine``: "fold" builds
    chained narrow Column folds (exact, zero Python, but O(n_merges)
    expression depth — the default for small merge tables); "pandas"
    applies the merge list in an Arrow-batched UDF over the
    vocabulary-sized word table (the production path for 30-50k-merge
    tokenizers, where a 50k-deep expression tree is not analyzable);
    "auto" switches at 64 merges. Both engines are pytest-pinned equal.
    """
    vocab = _word_counts(docs, text_col)
    if engine == "auto":
        engine = "fold" if len(merges) <= 64 else "pandas"
    if engine == "fold":
        return vocab.select(
            "word", F.size(_merge_fold_expr(merges)).alias("n_sub"))
    return vocab.select(
        "word", _merge_pandas_udf(merges)(F.col("word")).alias("n_sub"))


# --- Unigram-LM (SentencePiece-style) tokenizer ------------------------------
#
# Kudo 2018 (arXiv:1804.10959), simplified to stay deterministic and
# SQL-replayable (documented deviations):
#   * hard-EM (Viterbi counts) instead of full forward-backward expected
#     counts — the E-step segments each word with the current piece
#     log-probs and counts the pieces of the single best segmentation;
#   * a FIXED seed vocabulary (all single chars + the top frequent
#     substrings up to UNIGRAM_MAXP chars) with add-one smoothing at every
#     M-step, instead of the paper's seed-then-prune schedule — no piece
#     ever reaches probability zero, so the DP is total and the iteration
#     count is the only schedule knob.
# Distributed shape mirrors BPE above: ONE corpus pass builds the word
# frequency table; every EM iteration is a vocabulary-sized aggregation
# (Viterbi fold over the word table + a weighted piece count) plus a
# vocab-sized collect — piece probabilities are driver state exactly like
# the BPE merge table / PQ codebooks. Applying the tokenizer to a corpus
# is a dictionary join on the word key, never a per-document DP replay.

UNIGRAM_MAXP = 4      # max piece length in chars
UNIGRAM_VOCAB = 60    # seed vocabulary budget (chars are always kept)


def _viterbi_state_col(word, logp: dict[str, float],
                       max_len: int = UNIGRAM_MAXP) -> F.Column:
    """struct(s, seg): best log-prob segmentation of ``word`` under the
    driver-state piece log-probs, as ONE left fold (dp over prefix
    lengths; candidates are the ≤``max_len`` trailing pieces; ties break
    to the LONGER piece via struct-max on (score, k) — the identical rule
    the DuckDB recursive replica applies, so segmentations are
    bit-identical cross-engine). Every single character of the corpus is
    in the vocabulary by construction, so the DP is always feasible."""
    m = F.create_map(*[x for p, lp in sorted(logp.items())
                       for x in (F.lit(p), F.lit(float(lp)))])
    n = F.length(word)
    init = F.array(F.struct(
        F.lit(0.0).alias("s"), F.array().cast("array<string>").alias("seg")))

    def step(acc, j):
        cands = F.filter(
            F.transform(
                F.sequence(F.lit(1), F.least(j, F.lit(max_len))),
                lambda k: F.transform(  # bind piece + prev dp entry once
                    F.array(F.struct(
                        F.substring(word, j - k + 1, k).alias("piece"),
                        F.element_at(acc, j - k + 1).alias("prev"))),
                    lambda b: F.when(
                        m[b["piece"]].isNotNull(),
                        F.struct(
                            (b["prev"]["s"] + m[b["piece"]]).alias("s"),
                            k.cast("int").alias("k"),
                            F.concat(b["prev"]["seg"],
                                     F.array(b["piece"])).alias("seg"),
                        )),
                )[0]),
            lambda c: c.isNotNull())
        best = F.array_max(cands)
        return F.concat(acc, F.array(F.struct(
            best["s"].alias("s"), best["seg"].alias("seg"))))

    return F.element_at(F.aggregate(F.sequence(F.lit(1), n), init, step), -1)


def _unigram_logp(counts: dict[str, int]) -> dict[str, float]:
    """Add-one-smoothed piece log-probs, rounded to 6dp so the literals
    the Spark DP adds are the exact doubles the oracle's round(ln(...), 6)
    produces."""
    import math

    total = sum(counts.values())
    v = len(counts)
    return {p: round(math.log((c + 1) / (total + v)), 6)
            for p, c in counts.items()}


def unigram_train_states(docs: DataFrame, vocab_size: int = UNIGRAM_VOCAB,
                         n_em: int = 2, max_len: int = UNIGRAM_MAXP,
                         text_col: str = "text"
                         ) -> tuple[list, dict, DataFrame]:
    """Run seed + ``n_em`` hard-EM iterations; returns
    (final [(piece, cnt)] in (cnt DESC, piece ASC) order, final logp map,
    persisted word table). Caller owns the persist."""
    words = _word_counts(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)

    # seed: all substrings up to max_len, weighted by word frequency,
    # overlapping occurrences counted (what a suffix-array seeder sees)
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.least(F.length("word"), F.lit(max_len))),
        lambda k: F.transform(
            F.sequence(F.lit(1), F.length("word") - k + 1),
            lambda i: F.substring(F.col("word"), i, k)),
    ))
    counts_df = (
        words.select("wc", F.explode(subs).alias("piece"))
        .groupBy("piece").agg(F.sum("wc").alias("cnt"))
    )
    chars = counts_df.where(F.length("piece") == 1).collect()
    assert len(chars) < vocab_size, "vocab budget below character coverage"
    multi = (
        counts_df.where(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(vocab_size - len(chars)).collect()
    )
    counts = {r["piece"]: int(r["cnt"]) for r in [*chars, *multi]}

    for _ in range(n_em):
        lp = _unigram_logp(counts)
        seg = words.select(
            "wc", _viterbi_state_col(F.col("word"), lp, max_len)["seg"]
            .alias("seg"))
        got = {
            r["piece"]: int(r["n"]) for r in
            seg.select("wc", F.explode("seg").alias("piece"))
            .groupBy("piece").agg(F.sum("wc").alias("n")).collect()
        }
        counts = {p: got.get(p, 0) for p in counts}  # fixed vocab, 0 ok

    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered, _unigram_logp(counts), words


_PIECE_SCHEMA = T.StructType([
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("piece", T.StringType(), False),
    T.StructField("cnt", T.LongType(), False),
    T.StructField("logp", T.DoubleType(), False),
])


def unigram_train(docs: DataFrame, vocab_size: int = UNIGRAM_VOCAB,
                  n_em: int = 2, max_len: int = UNIGRAM_MAXP,
                  text_col: str = "text") -> DataFrame:
    """Train the unigram-LM tokenizer; returns the piece table
    (rank, piece, cnt, logp) ranked by (cnt DESC, piece ASC) — tokenizer
    driver state, like the BPE merge table."""
    ordered, lp, words = unigram_train_states(
        docs, vocab_size, n_em, max_len, text_col)
    words.unpersist()
    rows = [(i + 1, p, c, lp[p]) for i, (p, c) in enumerate(ordered)]
    return docs.sparkSession.createDataFrame(rows, schema=_PIECE_SCHEMA)


def unigram_token_stats(docs: DataFrame, vocab_size: int = UNIGRAM_VOCAB,
                        n_em: int = 2, max_len: int = UNIGRAM_MAXP,
                        text_col: str = "text",
                        group_col: str = "source") -> DataFrame:
    """Apply the freshly trained unigram tokenizer back to the corpus:
    per-``group_col`` (n_words, n_pieces, avg_pieces_per_word). The word
    table is Viterbi-segmented ONCE with the final probabilities and the
    corpus dictionary-joins the word→|segmentation| sizes — the same
    scale-correct encode shape as :func:`bpe_token_stats`."""
    _, lp, words = unigram_train_states(
        docs, vocab_size, n_em, max_len, text_col)
    sizes = words.select(
        "word",
        F.size(_viterbi_state_col(F.col("word"), lp, max_len)["seg"])
        .alias("n_sub"))
    corpus = docs.select(
        F.col(group_col),
        F.explode(
            F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                             r"\s+"),
                     lambda t: t != "")).alias("word"))
    out = (
        corpus.join(sizes, "word")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_pieces"),
            F.round(F.avg("n_sub"), 6).alias("avg_pieces_per_word"),
        )
    )
    out._erps_persisted = [words]
    return out


def save_unigram_tokenizer(path: str, pieces: list[tuple] | DataFrame) -> None:
    """Persist the piece table as a JSON artifact (S12-style, the
    sentencepiece .model analog — the (piece, logp) list IS the whole
    tokenizer)."""
    import json
    import os

    if isinstance(pieces, DataFrame):
        pieces = [tuple(r) for r in pieces.orderBy("rank").collect()]
    os.makedirs(path, exist_ok=True)
    doc = {"version": 1, "algorithm": "unigram-viterbi-em",
           "pieces": [{"rank": int(rk), "piece": p, "count": int(c),
                       "logp": float(lp)}
                      for rk, p, c, lp in pieces]}
    with open(os.path.join(path, "unigram.json"), "w") as f:
        json.dump(doc, f, sort_keys=True)


def load_unigram_tokenizer(path: str) -> list[tuple]:
    """Load the piece list back: [(rank, piece, count, logp)]."""
    import json
    import os

    with open(os.path.join(path, "unigram.json")) as f:
        doc = json.load(f)
    return [(pc["rank"], pc["piece"], pc["count"], pc["logp"])
            for pc in sorted(doc["pieces"], key=lambda pc: pc["rank"])]


def unigram_segment_with(docs: DataFrame, pieces: list[tuple],
                         text_col: str = "text",
                         group_col: str = "source",
                         max_len: int = UNIGRAM_MAXP) -> DataFrame:
    """Apply a LOADED unigram artifact to a new corpus (no retraining):
    derive the corpus's word table, Viterbi-segment it with the
    artifact's log-probs, dictionary-join the sizes — the inference path,
    mirroring :func:`bpe_segment_with`."""
    lp = {p: float(l) for _, p, _, l in pieces}
    words = _word_counts(docs, text_col)
    sizes = words.select(
        "word",
        F.size(_viterbi_state_col(F.col("word"), lp, max_len)["seg"])
        .alias("n_sub"))
    corpus = docs.select(
        F.col(group_col),
        F.explode(
            F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                             r"\s+"),
                     lambda t: t != "")).alias("word"))
    return (
        corpus.join(sizes, "word")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_pieces"),
            F.round(F.avg("n_sub"), 6).alias("avg_pieces_per_word"),
        )
    )
