"""T1 golden tests for the canonical normalization spec (SURVEY.md §5).

Cases mirror the reference's inline smoke cases
(/root/reference/src/normalize.py:350-372) as real assertions, plus
adversarial unicode.
"""

import pyspark.sql.functions as F
import pytest

from entity_resolution_pipeline_spark.functions.normalize import (
    acronym_col, fingerprint_col, is_generic_col, normalize_ascii_col,
    normalize_text_py, normalize_udf, prefix_col, tokens_col,
)

CASES = [
    ("Société Générale", "societe generale"),
    ("Müller & Söhne GmbH", "muller sohne gmbh"),
    ("  Acme,   Corp.  ", "acme corp"),
    ("ÅNGSTRÖM café", "angstrom cafe"),
    ("naïve—résumé", "naive resume"),
    ("Tab\tand\nnewline", "tab and newline"),
    # non-Latin digits do NOT decompose to ASCII under NFKD → stripped as
    # punctuation by the pinned spec
    ("१२३ numbers ١٢٣", "numbers"),
    ("", ""),
    (None, ""),
    ("ABC-123/XYZ", "abc 123 xyz"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_py_golden(raw, expected):
    assert normalize_text_py(raw) == expected


def test_normalize_udf_matches_oracle(spark):
    rows = [(r,) for r, _ in CASES]
    df = spark.createDataFrame(rows, "s: string")
    got = df.select("s", normalize_udf(F.col("s")).alias("n")).collect()
    for row in got:
        assert row["n"] == normalize_text_py(row["s"]), row["s"]


def test_native_ascii_path_matches_oracle(spark):
    ascii_inputs = ["Hello,   World!", "a-b_c d", "UPPER lower 42", "", "x"]
    df = spark.createDataFrame([(s,) for s in ascii_inputs], "s: string")
    got = df.select("s", normalize_ascii_col(F.col("s")).alias("n")).collect()
    for row in got:
        # note: '_' is punctuation under the pinned spec ([^a-zA-Z0-9\s])
        assert row["n"] == normalize_text_py(row["s"]), row["s"]


def test_derived_views(spark):
    df = spark.createDataFrame([("delta alpha delta beta xx",)], "s: string")
    row = df.select(
        tokens_col(F.col("s"), 2).alias("toks"),
        fingerprint_col(F.col("s"), 2).alias("fp"),
        prefix_col(F.col("s"), 8).alias("p8"),
        acronym_col(F.col("s")).alias("ac"),
        is_generic_col(F.col("s")).alias("gen"),
    ).collect()[0]
    assert row["toks"] == ["delta", "alpha", "delta", "beta", "xx"]
    assert row["fp"] == "alpha beta delta xx"
    assert row["p8"] == "deltaalp"
    assert row["ac"] == "DADBX"
    assert row["gen"] is False


def test_generic_flag(spark):
    df = spark.createDataFrame(
        [("global tech solutions",), ("zephyr dynamics",)], "s: string")
    got = [r["g"] for r in df.select(is_generic_col(F.col("s")).alias("g")).collect()]
    assert got == [True, False]
