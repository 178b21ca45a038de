"""Unigram-LM tokenizer (Kudo 2018, hard-EM variant) vs a pure-Python
scalar reference: seed selection, add-one smoothing, the Viterbi DP with
its longer-piece tie-break, EM recounting, and the save/load artifact."""

import math

from entity_resolution_pipeline_spark.operators.tokenizer import (
    UNIGRAM_MAXP, load_unigram_tokenizer, save_unigram_tokenizer,
    unigram_segment_with, unigram_token_stats, unigram_train,
)


def _ref_word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_seed(wc, vocab_size, max_len):
    cnt = {}
    for w, c in wc.items():
        for k in range(1, min(len(w), max_len) + 1):
            for i in range(len(w) - k + 1):
                p = w[i:i + k]
                cnt[p] = cnt.get(p, 0) + c
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in cnt.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    budget = vocab_size - len(chars)
    out = dict(chars)
    out.update(dict(multi[:budget]))
    return out


def _ref_logp(counts):
    total, v = sum(counts.values()), len(counts)
    return {p: round(math.log((c + 1) / (total + v)), 6)
            for p, c in counts.items()}


def _ref_viterbi(word, logp, max_len):
    # dp[j] = (score, seg); ties prefer LONGER last piece (iterate k
    # ascending, replace on >=) — mirrors the struct-max rule
    dp = [(0.0, [])]
    for j in range(1, len(word) + 1):
        best = None
        for k in range(1, min(j, max_len) + 1):
            piece = word[j - k:j]
            if piece in logp:
                cand = (dp[j - k][0] + logp[piece], dp[j - k][1] + [piece])
                if best is None or cand[0] >= best[0]:
                    best = cand
        dp.append(best)
    return dp[-1][1]


def _ref_train(texts, vocab_size, n_em, max_len):
    wc = _ref_word_counts(texts)
    counts = _ref_seed(wc, vocab_size, max_len)
    for _ in range(n_em):
        lp = _ref_logp(counts)
        got = {}
        for w, c in wc.items():
            for p in _ref_viterbi(w, lp, max_len):
                got[p] = got.get(p, 0) + c
        counts = {p: got.get(p, 0) for p in counts}
    return counts, _ref_logp(counts), wc


TEXTS = [
    "the theme of the anthem is the north",
    "another anthem on the theme the north remembers",
    "thesis on theme theory and other things",
    "north north north by northwest",
]


def test_unigram_train_matches_scalar_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    vocab_size, n_em = 40, 2
    counts, lp, _ = _ref_train(TEXTS, vocab_size, n_em, UNIGRAM_MAXP)
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = unigram_train(docs, vocab_size=vocab_size, n_em=n_em).collect()
    assert [(r["piece"], r["cnt"]) for r in
            sorted(got, key=lambda r: r["rank"])] == expected
    for r in got:
        assert r["logp"] == lp[r["piece"]]
    # EM genuinely reshapes mass: some seed pieces die, survivors exist
    assert any(r["cnt"] == 0 for r in got)
    assert any(r["cnt"] > 0 and len(r["piece"]) > 1 for r in got)


def test_unigram_segment_stats_match_reference(spark):
    docs = spark.createDataFrame(
        [(i, t, "src%d" % (i % 2)) for i, t in enumerate(TEXTS)],
        "doc_id long, text string, source string")
    vocab_size, n_em = 40, 2
    counts, lp, wc = _ref_train(TEXTS, vocab_size, n_em, UNIGRAM_MAXP)
    sizes = {w: len(_ref_viterbi(w, lp, UNIGRAM_MAXP)) for w in wc}
    expect = {}
    for i, t in enumerate(TEXTS):
        src = "src%d" % (i % 2)
        nw, np_ = expect.get(src, (0, 0))
        ws = [w for w in t.lower().split() if w]
        expect[src] = (nw + len(ws), np_ + sum(sizes[w] for w in ws))
    rows = unigram_token_stats(docs, vocab_size=vocab_size,
                               n_em=n_em).collect()
    got = {r["source"]: (r["n_words"], r["n_pieces"]) for r in rows}
    assert got == expect
    for r in rows:
        assert r["avg_pieces_per_word"] == round(
            expect[r["source"]][1] / expect[r["source"]][0], 6)


def test_unigram_artifact_roundtrip_and_inference(spark, tmp_path):
    """save → load → segment a NEW corpus must equal segmenting with the
    in-memory pieces (the tokenizer artifact travels; no retraining)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    trained = unigram_train(docs, vocab_size=40, n_em=2)
    save_unigram_tokenizer(str(tmp_path / "uni"), trained)
    pieces = load_unigram_tokenizer(str(tmp_path / "uni"))
    assert pieces == [tuple(r) for r in trained.orderBy("rank").collect()]

    new_docs = spark.createDataFrame(
        [(1, "the northern theme thesis", "a"),
         (2, "other anthem words north", "b")],
        "doc_id long, text string, source string")
    got = {r["source"]: (r["n_words"], r["n_pieces"])
           for r in unigram_segment_with(new_docs, pieces).collect()}
    lp = {p: l for _, p, _, l in pieces}
    expect = {}
    for src, t in (("a", "the northern theme thesis"),
                   ("b", "other anthem words north")):
        ws = t.split()
        expect[src] = (len(ws),
                       sum(len(_ref_viterbi(w, lp, UNIGRAM_MAXP))
                           for w in ws))
    assert got == expect
