"""T5: static lint — no per-row Python on the hot path.

The engine's hard constraint (BASELINE.json north_star): all hot paths are
DataFrame ops or Arrow-vectorized pandas UDFs. This test greps the package
for the forbidden constructs.
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "entity_resolution_pipeline_spark"

FORBIDDEN = [
    (re.compile(r"\bF\.udf\("), "row-at-a-time F.udf"),
    (re.compile(r"(?<!pandas_)\budf\(\s*lambda"), "row-at-a-time udf(lambda)"),
    (re.compile(r"\.rdd\b"), "RDD access"),
    (re.compile(r"\.iterrows\("), "pandas iterrows"),
    (re.compile(r"\.itertuples\("), "pandas itertuples"),
    (re.compile(r"\bmapPartitions\("), "imperative mapPartitions"),
]


def test_no_forbidden_constructs():
    offenders = []
    for path in PKG.rglob("*.py"):
        text = path.read_text()
        for rx, label in FORBIDDEN:
            for m in rx.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line} {label}")
    assert not offenders, offenders


def test_only_sanctioned_pandas_udfs():
    """pandas_udf definitions are confined to functions/ (extractor,
    similarity) — the sanctioned touchpoints of SURVEY.md §2.14."""
    locations = []
    for path in PKG.rglob("*.py"):
        if "@pandas_udf" in path.read_text():
            locations.append(path.relative_to(PKG).as_posix())
    assert set(locations) <= {
        "functions/normalize.py", "functions/similarity.py",
        "operators/multimodal.py",  # stubbed decode plumbing, mapInPandas
        # vocabulary-sized BPE application for 30-50k-merge tables: the
        # UDF runs over the DISTINCT-WORD table, never the corpus (the
        # corpus pays only the dictionary join) — see bpe_segment_sizes
        "operators/tokenizer.py",
    }, locations
