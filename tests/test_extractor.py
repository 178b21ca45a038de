"""Extractor byte-equality golden tests (FIXTURES.md §4, north-rule
per-row invariant: byte-identical extracted text per url)."""

import hashlib

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.functions.normalize import (
    extract_text_py, extract_text_udf,
)


def test_extract_py_strips_boilerplate():
    html = (b"<html><head><script>var x='SECRET';</script>"
            b"<style>.a{}</style></head><body><h1>Caf\xc3\xa9 &amp; Bar</h1>"
            b"<p>hello <b>world</b></p></body></html>")
    assert extract_text_py(html) == "cafe bar hello world"


def test_extract_handles_none_and_invalid_utf8():
    assert extract_text_py(None) == ""
    assert extract_text_py(b"\xff\xfe<p>ok</p>") == "ok"


def test_udf_byte_identical_to_golden(spark, fixtures, fixtures_pd):
    out = fixtures["pages"].select(
        "url", extract_text_udf(F.col("html")).alias("ext"), "text"
    ).collect()
    golden = dict(zip(fixtures_pd["golden_text"]["url"],
                      fixtures_pd["golden_text"]["text_sha256"]))
    assert len(out) > 0
    for r in out:
        assert r["ext"] == r["text"], r["url"]  # column equals extractor output
        sha = hashlib.sha256(r["ext"].encode("utf-8")).hexdigest()
        assert sha == golden[r["url"]], r["url"]


def test_extractor_deterministic_across_runs(spark, fixtures):
    a = fixtures["pages"].select("url", extract_text_udf(F.col("html")).alias("e"))
    b = fixtures["pages"].select("url", extract_text_udf(F.col("html")).alias("e"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
