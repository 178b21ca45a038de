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
