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


# golden outputs captured from the reference implementation
# (src/normalize.py:104-127 strip_legal_suffix run on name_norm)
LEGAL_STRIP_CASES = [
    ("kjell group ab", "kjell"),                      # 2 passes: ab, group
    ("delivery hero se", "delivery hero se"),          # 'se' is NOT a suffix
    ("societe generale s a", "societe generale s a"),  # 's a' not in the set
    ("muller gmbh co kg", "muller"),                   # kg, co, gmbh
    ("global services international holdings ltd", "global services"),
    ("acme holding group international ltd", "acme"),  # 4 passes
    ("acme co", "acme"),
    ("beta s p a", "beta"),
    ("gamma sp z o o", "gamma"),
    ("x a s", "x"),                                    # via 'a s' (a/s norm'd)
    ("a", "a"),
    ("", ""),
    ("ltd", "ltd"),                                    # full strip → fallback
]


def test_strip_legal_suffix_golden(spark):
    from entity_resolution_pipeline_spark.functions.normalize import (
        strip_legal_suffix_col,
    )

    df = spark.createDataFrame([(s,) for s, _ in LEGAL_STRIP_CASES], "s: string")
    got = {r["s"]: r["o"] for r in
           df.select("s", strip_legal_suffix_col(F.col("s")).alias("o")).collect()}
    for s, want in LEGAL_STRIP_CASES:
        assert got[s] == want, (s, got[s], want)


def test_extract_legal_name_prose(spark):
    from entity_resolution_pipeline_spark.functions.normalize import (
        extract_legal_name_col,
    )

    # golden outputs captured from the reference implementation — NOTE its
    # docstring examples are aspirational; pattern 1 runs IGNORECASE so a
    # prose prefix ending in a suffix is captured whole. We pin behavior,
    # not the docstring.
    cases = [
        ("WOODFLOW TECHNOLOGIES S.L., registered in Madrid",
         "WOODFLOW TECHNOLOGIES S.L."),
        ("The legal entity is SoCyber Ltd., a limited liability company",
         "The legal entity is SoCyber Ltd."),
        ("our company is Acme Widgets GmbH and we make widgets",
         "our company is Acme Widgets GmbH"),
        ("no legal name here at all", None),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s: string")
    got = {r["s"]: r["o"] for r in
           df.select("s", extract_legal_name_col(F.col("s")).alias("o")).collect()}
    for s, want in cases:
        assert got[s] == want, (s, got[s], want)
