"""Geo / dates / labeling / multimodal / textstats unit tests (golden cases
in the spirit of the reference's __main__ smoke tests, asserted for real)."""

import pyspark.sql.functions as F
import pytest

from entity_resolution_pipeline_spark.functions.dates import parse_flexible_date_col
from entity_resolution_pipeline_spark.functions.domains import etld1_col, hostname_col
from entity_resolution_pipeline_spark.functions.geo import (
    parse_location_col, standardize_country_col,
)
from entity_resolution_pipeline_spark.functions.textstats import lang_id_col
from entity_resolution_pipeline_spark.operators.labeling import LabelRule, apply_rules
from entity_resolution_pipeline_spark.operators.multimodal import (
    decode_media, media_table,
)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["v"]).select(col.alias("r")).collect()[0]["r"]


def test_geo_parse_cases(spark):
    # reference smoke cases shape: /root/reference/src/geo.py:326-346
    r = _one(spark, parse_location_col(F.col("v")), "Berlin, Brandenburg, Germany")
    assert (r["city"], r["region"], r["country_iso"]) == ("Berlin", "Brandenburg", "DE")
    r = _one(spark, parse_location_col(F.col("v")), "Paris, France")
    assert (r["city"], r["region"], r["country_iso"]) == ("Paris", None, "FR")
    r = _one(spark, parse_location_col(F.col("v")), "London, England, UK")
    assert r["country_iso"] == "GB"
    r = _one(spark, parse_location_col(F.col("v")), "Nowhere, Atlantis")
    assert r["country_iso"] is None
    assert _one(spark, standardize_country_col(F.col("v")), "de") == "DE"
    assert _one(spark, standardize_country_col(F.col("v")), "United States") == "US"


def test_flexible_dates_cases(spark):
    # /root/reference/src/utils.py:224-276 shapes: year, quarter, serial, iso
    c = F.date_format(parse_flexible_date_col(F.col("v")), "yyyy-MM-dd")
    assert _one(spark, c, "2021") == "2021-01-01"
    assert _one(spark, c, "Q3 2021") == "2021-07-01"
    assert _one(spark, c, "44197") == "2021-01-01"  # Excel serial for 2021-01-01
    assert _one(spark, c, "2021-05-17") == "2021-05-17"
    assert _one(spark, c, "not a date") is None


def test_domain_etld1_cases(spark):
    # /root/reference/src/domains.py:278-299 shapes incl. co.uk multi-part
    assert _one(spark, etld1_col(F.col("v")), "https://www.shop.co.uk/x") == "shop.co.uk"
    assert _one(spark, etld1_col(F.col("v")), "http://a.b.example.com:80/q?z") == "example.com"
    assert _one(spark, hostname_col(F.col("v")), "HTTPS://WWW.Site.IO/p") == "site.io"


def test_lang_id_stopword_heuristic(spark):
    assert _one(spark, lang_id_col(F.col("v")),
                "the cat is in the house and it is warm") == "en"
    assert _one(spark, lang_id_col(F.col("v")),
                "der hund ist nicht mit der katze") == "de"
    assert _one(spark, lang_id_col(F.col("v")), "zzz qqq") == "und"


def test_weak_supervision_votes(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 100.0)], ["id", "x"])
    rules = [
        LabelRule("big", F.col("x") > 50, 1, 2.0),
        LabelRule("small", F.col("x") < 50, -1, 1.0),
    ]
    rows = {r["id"]: r for r in apply_rules(df, rules).collect()}
    assert rows[2]["vote_big"] == 1 and rows[2]["majority_label"] == 1
    assert rows[2]["weighted_score"] == 1.0
    assert rows[1]["vote_small"] == -1 and rows[1]["majority_label"] == 0
    assert rows[1]["weighted_score"] == -1.0


def test_media_decode_stub_contract(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "abc")], ["doc_id", "text"])
    media = media_table(docs)
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)
    feats = decode_media(media, fake=True, dim=8).collect()
    assert len(feats) == 2
    by_id = {r["media_id"]: r for r in feats}
    assert by_id["m1"]["n_bytes"] == len(b"hello world")
    assert len(by_id["m1"]["feature"]) == 8
    assert abs(sum(by_id["m1"]["feature"]) - 1.0) < 1e-4  # normalized histogram


def test_media_resize_stub_contract(spark):
    from entity_resolution_pipeline_spark.operators.multimodal import resize_media

    docs = spark.createDataFrame(
        [(1, "x" * 500), (2, "ab")], ["doc_id", "text"])
    media = media_table(docs)
    with pytest.raises(NotImplementedError):
        resize_media(media, fake=False)
    rows = {r["media_id"]: r for r in
            resize_media(media, width=16, height=16, fake=True).collect()}
    assert all(len(r["payload"]) == 256 for r in rows.values())  # crop + pad
    assert rows["m1"]["payload"] == b"x" * 256
    assert rows["m2"]["payload"] == b"ab" + b"\0" * 254


def test_media_frame_sampling_stub(spark):
    from entity_resolution_pipeline_spark.operators.multimodal import sample_frames

    # doc_id 2 → kind 'video' (pmod(2,3)=2); 1200 bytes → 5 chunks of 256,
    # every 2nd → frame_idx 0,2,4; doc_id 1 is audio → filtered out
    docs = spark.createDataFrame(
        [(1, "a" * 999), (2, "b" * 1200)], ["doc_id", "text"])
    frames = sample_frames(media_table(docs), frame_bytes=256, every_n=2,
                           max_frames=4, fake=True).collect()
    assert {r["media_id"] for r in frames} == {"m2"}
    assert sorted(r["frame_idx"] for r in frames) == [0, 2, 4]
    last = next(r for r in frames if r["frame_idx"] == 4)
    assert len(last["frame"]) == 1200 - 4 * 256  # tail chunk truncates
