"""BPE tokenizer training vs a scalar pure-Python reference, plus the
greedy-application edge cases (left==right overlap chains) and the
semantic-dedup / fuzzy-decontamination operators added alongside it."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.operators.tokenizer import (
    bpe_token_stats, bpe_train,
)


def _ref_bpe(corpus: list[str], n_merges: int):
    """Scalar reference: Sennrich-style merge loop, greedy left-to-right
    non-overlapping application, (count DESC, left ASC, right ASC) ties."""
    words = Counter(w for t in corpus for w in t.lower().split())
    vocab = {w: list(w) for w in words}
    merges = []
    for it in range(1, n_merges + 1):
        pc = Counter()
        for w, c in words.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((it, l, r, l + r, n))
        for w in vocab:
            out = []
            for x in vocab[w]:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low lower lowest",
    "new newer newest low",
    "aaa aaaa aa banana bananas",
    "the the the band banana",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(CORPUS)],
        "doc_id long, text string, source string")
    got = [tuple(r) for r in bpe_train(df, n_merges=10).collect()]
    ref, _ = _ref_bpe(CORPUS, 10)
    assert got == ref


def test_bpe_greedy_overlap_chain(spark):
    # 'aaa' under merge (a,a) must become [aa, a], never [aa, aa] — the
    # non-overlap rule; 'aaaa' becomes [aa, aa]
    df = spark.createDataFrame([(1, "aaa aaaa", "s")],
                               "doc_id long, text string, source string")
    merges = bpe_train(df, n_merges=1).collect()
    assert (merges[0]["lft"], merges[0]["rgt"]) == ("a", "a")
    # pair count: 'aaa' has 2 adjacent (a,a), 'aaaa' has 3 → 5 weighted by 1
    assert merges[0]["pair_count"] == 5
    stats = bpe_token_stats(df, n_merges=1).collect()[0]
    # greedy: aaa → [aa, a] (2), aaaa → [aa, aa] (2)
    assert stats["n_words"] == 2 and stats["n_bpe_tokens"] == 4


def test_bpe_token_stats_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(CORPUS)],
        "doc_id long, text string, source string")
    got = {r["source"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_token_stats(df, n_merges=6).collect()}
    _, vocab = _ref_bpe(CORPUS, 6)
    want: dict = {}
    for i, t in enumerate(CORPUS):
        src = f"s{i % 2}"
        ws = t.lower().split()
        nw, nt = want.get(src, (0, 0))
        want[src] = (nw + len(ws), nt + sum(len(vocab[w]) for w in ws))
    assert got == want


def test_bpe_stops_when_fully_merged(spark):
    # single repeated 2-char word: after ~1-2 merges nothing is left to
    # merge; asking for 10 must return the short table, not loop/fail
    df = spark.createDataFrame([(1, "ab ab ab", "s")],
                               "doc_id long, text string, source string")
    rows = bpe_train(df, n_merges=10).collect()
    assert [(r["lft"], r["rgt"]) for r in rows] == [("a", "b")]


# --- semantic dedup (SemDeDup) ------------------------------------------------------


def test_semantic_dedup_keeper_rule(spark):
    from entity_resolution_pipeline_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, n_cells=4, threshold=0.35).collect()
    rows = {r["vec_id"]: (r["cell_id"], r["is_keeper"]) for r in out}
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    assert set(rows) == set(vecs)  # every row labeled

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    by_cell: dict = {}
    for vid, (cell, _) in rows.items():
        by_cell.setdefault(cell, []).append(vid)
    for vid, (cell, keeper) in rows.items():
        has_smaller_dup = any(
            o < vid and round(cos(vecs[o], vecs[vid]), 6) >= 0.35
            for o in by_cell[cell])
        assert keeper == (not has_smaller_dup), vid
    # min id of every cell is definitionally a keeper
    for cell, ids in by_cell.items():
        assert rows[min(ids)][1]
    # both label states occur on the fixture, or the test is vacuous
    assert {k for _, k in rows.values()} == {True, False}


def test_semantic_dedup_cc_component_keeper(spark):
    """The component-keeper variant: exactly ONE keeper per
    cosine-connected component (the component's NUMERIC min id), its
    keeper set is a SUBSET of the greedy rule's (a numeric-min
    representative has no smaller neighbor at all — the very property a
    string-min representative violated, which this test caught), and
    isolated vectors are keepers under both rules."""
    from entity_resolution_pipeline_spark.operators.dedup import (
        semantic_dedup, semantic_dedup_cc,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cc_df = semantic_dedup_cc(emb, n_cells=4, threshold=0.35)
    cc = {r["vec_id"]: (r["cell_id"], r["is_keeper"])
          for r in cc_df.collect()}
    release_persisted(cc_df)
    gr_df = semantic_dedup(emb, n_cells=4, threshold=0.35)
    greedy = {r["vec_id"]: r["is_keeper"] for r in gr_df.collect()}
    release_persisted(gr_df)
    assert set(cc) == set(greedy)

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    # rebuild components with a scalar union-find over the same pairs
    parent = {v: v for v in cc}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    by_cell: dict = {}
    for vid, (cell, _) in cc.items():
        by_cell.setdefault(cell, []).append(vid)
    for cell, ids in by_cell.items():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if round(cos(vecs[a], vecs[b]), 6) >= 0.35:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[ra] = rb
    comps: dict = {}
    for v in cc:
        comps.setdefault(find(v), []).append(v)
    for members in comps.values():
        keepers = [v for v in members if cc[v][1]]
        rep = min(members)  # numeric-min, the operator's keeper rule
        assert keepers == [rep] if len(members) > 1 else [members[0]]
    # subset relation vs the greedy rule + non-vacuity
    assert all(greedy[v] for v, (_, k) in cc.items() if k)
    assert any(len(m) > 1 for m in comps.values())
    dropped_by_cc_only = [v for v in cc if greedy[v] and not cc[v][1]]
    assert dropped_by_cc_only or all(
        len(m) <= 2 for m in comps.values())  # triangle case if chains exist


# --- fuzzy decontamination ------------------------------------------------------------


def test_fuzzy_decontamination_catches_embedded_eval(spark):
    from entity_resolution_pipeline_spark.operators.dedup import (
        contamination_flags, fuzzy_contamination_flags,
    )

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"tok{i}" for i in range(60))
    train = spark.createDataFrame(
        [
            (1, f"{filler} {eval_text} {filler}"),    # eval embedded verbatim
            (2, "completely unrelated page about spark shuffles and joins "
                + filler),
            (3, eval_text),                            # the eval doc itself
        ],
        "doc_id long, text string")
    ev = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in fuzzy_contamination_flags(
        train, ev, k=3, n_bands=4, threshold=0.5).collect()}
    assert out[1]["contaminated"] and out[3]["contaminated"]
    assert not out[2]["contaminated"]
    # containment on the eval side is 1.0 for the verbatim embed
    assert out[1]["max_containment"] == pytest.approx(1.0)
    # whole-doc Jaccard-style EXACT flag also fires here, but the fuzzy
    # signal is strictly stronger on the embedded case: low Jaccard, high
    # containment
    exact = {r["doc_id"]: r for r in contamination_flags(
        train, ev, k=3, min_overlap=2).collect()}
    assert exact[1]["contaminated"]


def test_fuzzy_decontamination_misses_nothing_on_self(spark):
    # every eval doc, used as its own training corpus, must flag itself
    from entity_resolution_pipeline_spark.operators.dedup import (
        fuzzy_contamination_flags,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(20)
    fuzzy_rows = fuzzy_contamination_flags(
        docs, docs, k=3, n_bands=4, threshold=0.99).collect()
    out = [r for r in fuzzy_rows if not r["contaminated"]]
    assert out == []


def test_tokenizer_artifact_roundtrip(spark, tmp_path):
    """save -> load -> apply to a NEW corpus reproduces the counts the
    in-session vocab state gives; the artifact is the whole tokenizer."""
    from entity_resolution_pipeline_spark.operators.tokenizer import (
        bpe_segment_with, load_tokenizer, save_tokenizer,
    )

    train_df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(CORPUS)],
        "doc_id long, text string, source string")
    merges_df = bpe_train(train_df, n_merges=6)
    save_tokenizer(str(tmp_path / "tok"), merges_df)
    merges = load_tokenizer(str(tmp_path / "tok"))
    assert merges == [tuple(r) for r in merges_df.collect()]

    new_docs = spark.createDataFrame(
        [(1, "lowest newest bananas low", "x")],
        "doc_id long, text string, source string")
    got = {r["source"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_segment_with(new_docs, merges).collect()}
    _, vocab = _ref_bpe(CORPUS, 6)

    # apply the reference merges to the new words scalar-side
    def seg(word):
        s = list(word)
        for _rk, l, r, m, _n in merges:
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = m
                else:
                    out.append(x)
            s = out
        return s

    ws = "lowest newest bananas low".split()
    assert got == {"x": (len(ws), sum(len(seg(w)) for w in ws))}


def test_bpe_segment_engines_agree(spark):
    """The fold engine (chained Column folds) and the pandas engine
    (Arrow-batched vocabulary-sized Python — the production path for
    30-50k-merge tables) must segment identically."""
    from entity_resolution_pipeline_spark.operators.tokenizer import (
        bpe_segment_sizes, bpe_train,
    )

    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(CORPUS)],
        "doc_id long, text string, source string")
    merges = [tuple(r) for r in bpe_train(df, n_merges=8).collect()]
    fold = {r["word"]: r["n_sub"] for r in
            bpe_segment_sizes(df, merges, engine="fold").collect()}
    pandas_ = {r["word"]: r["n_sub"] for r in
               bpe_segment_sizes(df, merges, engine="pandas").collect()}
    assert fold == pandas_
    assert len(fold) > 0
