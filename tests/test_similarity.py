"""Similarity function parity tests — cross-checked against DuckDB
(independent engine) and numpy."""

import duckdb
import numpy as np
import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_pipeline_spark.functions.similarity import (
    cosine_col, jaro_winkler_py, levenshtein_ratio_col, token_jaccard_col,
    token_sort_ratio_py,
)

WORDS = st.text(alphabet="abcdef ", min_size=0, max_size=24)


@settings(max_examples=200, deadline=None)
@given(WORDS, WORDS)
def test_jaro_winkler_matches_duckdb(a, b):
    got = jaro_winkler_py(a, b)
    if not a or not b:
        assert got == 0.0
        return
    exp = duckdb.sql(
        "select jaro_winkler_similarity(?, ?)", params=[a, b]).fetchone()[0]
    assert got == pytest.approx(exp, abs=1e-9)


def test_token_sort_ratio_basics():
    assert token_sort_ratio_py("world hello", "hello world") == 1.0
    assert token_sort_ratio_py("", "x") == 0.0
    assert 0.0 < token_sort_ratio_py("abc def", "abc xyz") < 1.0


def test_levenshtein_ratio_matches_duckdb(spark):
    cases = [("kitten", "sitting"), ("abc", "abc"), ("", "abc"), ("a", "b")]
    df = spark.createDataFrame(cases, "a: string, b: string")
    got = df.select("a", "b", levenshtein_ratio_col(F.col("a"), F.col("b")).alias("r")).collect()
    for row in got:
        la, lb = len(row["a"]), len(row["b"])
        exp = 1.0 if max(la, lb) == 0 else \
            1.0 - duckdb.sql("select levenshtein(?, ?)", params=[row["a"], row["b"]]
                             ).fetchone()[0] / max(la, lb)
        assert row["r"] == pytest.approx(exp)


def test_token_jaccard(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"]), (["x"], ["y"]), ([], [])],
        "ta: array<string>, tb: array<string>")
    got = [r["j"] for r in df.select(
        token_jaccard_col(F.col("ta"), F.col("tb")).alias("j")).collect()]
    assert got[0] == pytest.approx(2 / 4)
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_cosine_matches_numpy(spark):
    rng = np.random.RandomState(7)
    a = rng.rand(16).astype("float32")
    b = rng.rand(16).astype("float32")
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "va: array<float>, vb: array<float>")
    got = df.select(cosine_col(F.col("va"), F.col("vb")).alias("c")).collect()[0]["c"]
    exp = float(np.dot(a.astype("float64"), b.astype("float64"))
                / (np.linalg.norm(a.astype("float64")) * np.linalg.norm(b.astype("float64"))))
    assert got == pytest.approx(exp, rel=1e-6)
