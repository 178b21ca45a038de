"""remove_long_repeats (Lee et al. 2022 ExactSubstr semantics) vs a
brute-force Python reference: every token inside a word sequence of
≥ min_len tokens occurring ≥ 2 times corpus-wide is removed (all
occurrences — the documented remove-all deviation), everything else
survives in order."""

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.operators.curation import (
    remove_long_repeats,
)


def _reference(docs: dict[int, str], min_len: int) -> dict[int, tuple]:
    """Brute force: enumerate EVERY exactly-min_len lowered word window,
    count occurrences (multiset, within-doc repeats included), mark all
    covered positions. Equivalent to 'inside some ≥min_len repeat' (see
    operator docstring for the reduction proof)."""
    toks = {i: [w for w in t.split() if w] for i, t in docs.items()}
    counts: dict[tuple, int] = {}
    for ws in toks.values():
        low = [w.lower() for w in ws]
        for p in range(len(low) - min_len + 1):
            key = tuple(low[p:p + min_len])
            counts[key] = counts.get(key, 0) + 1
    out = {}
    for i, ws in toks.items():
        low = [w.lower() for w in ws]
        covered = set()
        for p in range(len(low) - min_len + 1):
            if counts[tuple(low[p:p + min_len])] >= 2:
                covered.update(range(p, p + min_len))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        out[i] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


BOILER = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def _check(spark, docs: dict[int, str], min_len: int):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["text_clean"])
        for r in remove_long_repeats(sdf, min_len=min_len).collect()
    }
    assert got == _reference(docs, min_len)
    return got


def test_cross_doc_repeat_stripped_short_docs_untouched(spark):
    docs = {
        1: "intro one two three " + BOILER + " tail xyz",
        2: "different opening words here " + BOILER + " closing",
        3: "no repeats at all in this document whatsoever today",
        4: "tiny doc",          # shorter than min_len: never touched
        5: "",                  # empty doc: n_words 0
    }
    got = _check(spark, docs, min_len=10)
    assert got[1][1] == 10 and "alpha" not in got[1][2]
    assert got[1][2] == "intro one two three tail xyz"
    assert got[3] == (9, 0, docs[3])
    assert got[4] == (2, 0, "tiny doc")
    assert got[5] == (0, 0, "")


def test_within_doc_repeat_counts_like_suffix_array(spark):
    # the repeated block occurs twice in ONE document — a suffix array
    # sees it, a per-document-distinct shingle df would not
    docs = {
        1: BOILER + " middle words between " + BOILER,
        2: "unrelated second document with plenty of distinct words",
    }
    got = _check(spark, docs, min_len=10)
    assert got[1][1] == 20
    assert got[1][2] == "middle words between"
    assert got[2][1] == 0


def test_length_threshold_is_exact(spark):
    nine = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = {  # shared run of EXACTLY 9 words; min_len=10 must keep it
        1: nine + " uniquetail1",
        2: nine + " uniquetail2",
    }
    got = _check(spark, docs, min_len=10)
    assert got[1][1] == 0 and got[2][1] == 0
    # at min_len=9 the same corpus loses the shared run everywhere
    got9 = _check(spark, docs, min_len=9)
    assert got9[1] == (10, 9, "uniquetail1")
    assert got9[2] == (10, 9, "uniquetail2")


def test_longer_than_min_repeat_fully_covered_case_insensitive(spark):
    long_block = BOILER + " kilo lima mike november oscar"  # 15 words
    docs = {  # repeat longer than min_len, differing case across docs
        1: "head " + long_block.upper() + " tail",
        2: "other " + long_block + " ending words",
    }
    got = _check(spark, docs, min_len=10)
    assert got[1] == (17, 15, "head tail")
    assert got[2] == (18, 15, "other ending words")


def test_non_power_of_two_and_power_of_two_lengths(spark):
    # exercises both _window_fingerprints paths: L=16 (pure doubling)
    # and L=20 (overlapping final combine)
    words = [f"w{i}" for i in range(30)]
    block = " ".join(words[:22])
    docs = {
        1: block + " one extra unique suffix",
        2: block + " entirely different continuation here",
        3: " ".join(words[5:21]),  # 16-word sub-block, third occurrence
    }
    for L in (16, 20):
        _check(spark, docs, min_len=L)


def test_planted_battery_fixture_matches_operator(spark):
    # the battery row's fixture at sf0.001: boilerplate planted on two id
    # slices must vanish from every planted doc
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from entity_resolution_pipeline_spark.plans.benchqueries import (
        _BOILER_A, _BOILER_B, LONG_REPEAT_LEN,
    )
    salted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.col("text"), F.lit(" " + _BOILER_A)))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.col("text"), F.lit(" " + _BOILER_B)))
        .otherwise(F.col("text")).alias("text"),
    )
    out = remove_long_repeats(salted, min_len=LONG_REPEAT_LEN)
    planted = out.where(F.col("doc_id") % 4 <= 1)
    n_planted = planted.count()
    assert n_planted > 0
    assert planted.where(
        F.col("n_removed") >= len(_BOILER_B.split())).count() == n_planted
    # boilerplate words are gone from the cleaned text
    leak = planted.where(
        F.col("text_clean").contains("cookies")
        | F.col("text_clean").contains("prohibited")).count()
    assert leak == 0
