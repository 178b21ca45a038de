"""Property-based checks for the curation primitives: each Spark operator
is compared against an independent pure-Python reference on
hypothesis-generated corpora (small alphabets force collisions — dup
spans, repeated bigrams, shared vocab — the regimes where an off-by-one
hides). Few examples, many rows per example: one Spark job per example."""

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_pipeline_spark.operators.curation import (
    CHUNK_SIZE, CHUNK_STRIDE, chunk_documents, lm_perplexity, pack_sequences,
)

WORDS = ["a", "b", "c", "dd", "eee"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=90),
    min_size=3, max_size=12,
)


def _py_chunks(tokens: list[str]) -> list[tuple[int, str, int]]:
    n = len(tokens)
    nc = 1 if n <= CHUNK_SIZE else (n - CHUNK_SIZE + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
    out = []
    for i in range(nc):
        w = tokens[i * CHUNK_STRIDE: i * CHUNK_STRIDE + CHUNK_SIZE]
        out.append((i, " ".join(w), len(w)))
    return out


@settings(max_examples=5, deadline=None)
@given(doc_strategy)
def test_chunk_documents_matches_python_reference(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["n_words"]))
    for i, toks in enumerate(docs):
        assert sorted(got[i]) == _py_chunks(toks), (i, toks)


@settings(max_examples=5, deadline=None)
@given(doc_strategy)
def test_pack_sequences_conserves_and_orders(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(df)
    total = sum(len(_py_chunks(t)[j][1].split(" "))
                for t in docs for j in range(len(_py_chunks(t))))
    packed = pack_sequences(chunks).collect()
    assert sum(r["n_words"] for r in packed) == total
    import math
    for r in packed:
        assert 0 < r["n_chunks"] and 0 < r["n_words"]
        # Spark/DuckDB round HALF_UP; Python's round is banker's —
        # mirror HALF_UP here (n/64 hits exact .xxxx5 boundaries)
        half_up = math.floor(r["n_words"] / 64.0 * 10000 + 0.5) / 10000
        assert r["fill"] == half_up


def _py_lm(docs: list[list[str]]) -> dict[int, tuple[int, float]]:
    import math
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for toks in docs:
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    v = len(uni)
    out = {}
    for i, toks in enumerate(docs):
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[i] = (0, None)
            continue
        alp = sum(math.log((big[p] + 1) / (uni[p[0]] + v))
                  for p in pairs) / len(pairs)
        out[i] = (len(pairs), alp)
    return out


@settings(max_examples=5, deadline=None)
@given(doc_strategy)
def test_lm_perplexity_matches_python_reference(spark, docs):
    import math

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_perplexity(df).collect()}
    ref = _py_lm(docs)
    for i, (n_bigrams, alp) in ref.items():
        assert got[i]["n_bigrams"] == n_bigrams, i
        if alp is None:
            assert got[i]["avg_logp"] is None
        else:
            assert got[i]["avg_logp"] == round(alp, 6), (i, alp)
            assert got[i]["perplexity"] == round(math.exp(-alp), 4)


def _py_remove_spans(texts: dict[int, str], k: int = 5,
                     min_df: int = 2) -> dict:
    toks = {i: [w for w in t.split() if w] for i, t in texts.items()}

    def spans(ws):
        if not ws:
            return []
        if len(ws) < k:
            return [(1, len(ws), " ".join(ws).lower())]
        return [(i, i + k - 1, " ".join(ws[i - 1:i + k - 1]).lower())
                for i in range(1, len(ws) - k + 2)]

    df: dict = {}
    for ws in toks.values():
        for sh in {s for _, _, s in spans(ws)}:
            df[sh] = df.get(sh, 0) + 1
    out = {}
    for i, ws in toks.items():
        covered: set = set()
        for a, b, sh in spans(ws):
            if df[sh] >= min_df:
                covered.update(range(a, b + 1))
        kept = [w for j, w in enumerate(ws, 1) if j not in covered]
        out[i] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


@settings(max_examples=5, deadline=None)
@given(doc_strategy)
def test_remove_duplicate_spans_matches_python_reference(spark, docs):
    """Span removal equals the scalar reference on hypothesis corpora —
    the tiny alphabet forces shared 5-shingles, degenerate short docs,
    and fully-removed docs."""
    from entity_resolution_pipeline_spark.operators.curation import (
        remove_duplicate_spans,
    )

    texts = {i: " ".join(toks) for i, toks in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_removed"], r["text_clean"])
           for r in remove_duplicate_spans(df).collect()}
    assert got == _py_remove_spans(texts)


@settings(max_examples=3, deadline=None)
@given(doc_strategy, st.integers(min_value=1, max_value=6))
def test_count_join_fallback_any_salt_width(spark, docs, n_salts):
    """The salted shuffle fallback equals the broadcast path for ANY salt
    width / hot-list size on hypothesis corpora (replication never
    changes join output)."""
    from entity_resolution_pipeline_spark.operators.curation import (
        lm_perplexity,
    )
    from entity_resolution_pipeline_spark.operators.scoring import (
        release_persisted,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    bc = lm_perplexity(df)
    import entity_resolution_pipeline_spark.operators.curation as cur
    old_salt, old_hot = cur.SALT_N, cur.HOT_N
    try:
        cur.SALT_N, cur.HOT_N = n_salts, 2
        sh = lm_perplexity(df, broadcast_limit=0)
        a = sorted(map(tuple, bc.collect()))
        b = sorted(map(tuple, sh.collect()))
    finally:
        cur.SALT_N, cur.HOT_N = old_salt, old_hot
    release_persisted(bc)
    release_persisted(sh)
    assert a == b
