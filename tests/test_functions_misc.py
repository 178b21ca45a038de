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


def _one_str(spark, col, value):
    """Like _one but with an explicit string schema so a bare None works."""
    return (
        spark.createDataFrame([(value,)], "v string")
        .select(col.alias("r")).collect()[0]["r"]
    )


def test_repetition_counts_cases(spark):
    from entity_resolution_pipeline_spark.functions.textstats import (
        repetition_counts_col,
    )

    def rc(v):
        return _one_str(spark, repetition_counts_col(F.col("v")), v)

    r = rc("a b a c b a")
    assert (r["total_words"], r["distinct_words"]) == (6, 3)
    # bigrams: "a b","b a","a c","c b","b a" -> 5 total, 4 distinct
    assert (r["total_bigrams"], r["distinct_bigrams"]) == (5, 4)
    assert r["top_word_count"] == 3  # "a" ×3
    r = rc("word")
    assert (r["total_words"], r["total_bigrams"], r["top_word_count"]) == (1, 0, 1)
    r = rc("")
    assert (r["total_words"], r["distinct_words"], r["total_bigrams"],
            r["top_word_count"]) == (0, 0, 0, 0)
    r = rc(None)
    assert r["total_words"] == 0
    # case-fold + separator split follow _words
    r = rc("The THE the!")
    assert (r["total_words"], r["distinct_words"], r["top_word_count"]) == (3, 1, 3)


def test_pii_redact_cases(spark):
    from entity_resolution_pipeline_spark.functions.redact import (
        pii_counts_col, redact_pii_col,
    )

    s = "mail a.b+c@ex-ample.co.uk or +1-555-0042, host 10.0.255.7 done"
    assert _one_str(spark, redact_pii_col(F.col("v")), s) == \
        "mail <EMAIL> or <PHONE>, host <IP> done"
    r = _one_str(spark, pii_counts_col(F.col("v")), s)
    assert (r["email_count"], r["phone_count"], r["ip_count"]) == (1, 1, 1)
    # email digits must never be half-eaten by the phone/IP patterns
    s2 = "x 1.2.3.4a no-boundary 1234@d.io"
    r2 = _one_str(spark, pii_counts_col(F.col("v")), s2)
    assert (r2["email_count"], r2["ip_count"]) == (1, 0)
    assert _one_str(spark, redact_pii_col(F.col("v")), None) == ""
    r3 = _one_str(spark, pii_counts_col(F.col("v")), "nothing here")
    assert (r3["email_count"], r3["phone_count"], r3["ip_count"]) == (0, 0, 0)


def test_url_canonicalize_cases(spark):
    from entity_resolution_pipeline_spark.functions.domains import (
        canonicalize_url_col,
    )

    def cu(v):
        return _one_str(spark, canonicalize_url_col(F.col("v")), v)

    assert cu("HTTPS://WWW.Ex.COM:443/Path/?utm_source=x&q=1#f") == \
        "https://ex.com/path/?q=1"
    assert cu("http://ex.com:80/a/b/") == "http://ex.com/a/b"
    assert cu("https://ex.com/a?utm_campaign=c&utm_medium=m") == "https://ex.com/a"
    assert cu("https://ex.com/a?q=1&fbclid=AbC&gclid=9") == "https://ex.com/a?q=1"
    assert cu("http://ex.com:80") == "http://ex.com"
    assert cu("https://ex.com/#top") == "https://ex.com"
    assert cu("https://ex.com:8080/x") == "https://ex.com:8080/x"  # non-default port kept
    assert cu("https://") == "https://"  # never eat the scheme's slashes
    assert cu(None) == ""


def test_docs_chunk_boundaries(spark):
    """Chunk fan-out: exactly one chunk at n<=32, a second from n=33; the
    tail partial window is kept and stride/overlap arithmetic is exact."""
    from entity_resolution_pipeline_spark.plans.benchqueries import (
        CHUNK_SIZE, CHUNK_STRIDE, q_docs_chunk,
    )
    import entity_resolution_pipeline_spark.plans.benchqueries as bq

    assert (CHUNK_SIZE, CHUNK_STRIDE) == (32, 24)
    words = lambda n: " ".join(f"w{i}" for i in range(n))
    rows = [(1, words(32)), (2, words(33)), (3, words(85)), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # route q_docs_chunk at the synthetic table via the _t seam
    orig = bq._t
    bq._t = lambda spark_, sf_dir, name: df
    try:
        out = q_docs_chunk(spark, "unused").collect()
    finally:
        bq._t = orig
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_words"] == 32
    assert len(by_doc[2]) == 2
    tail = sorted(by_doc[2], key=lambda r: r["chunk_id"])[-1]
    assert tail["n_words"] == 33 - CHUNK_STRIDE  # 9-word tail window
    # n=85: chunks start at words 1, 25, 49, 73 -> 3 full + 13-word tail
    assert [r["n_words"] for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])] \
        == [32, 32, 32, 13]
    # overlap: chunk k starts CHUNK_STRIDE words in, so the first 8 words
    # of chunk 1 are the last 8 of chunk 0
    c0, c1 = [r["chunk_text"].split(" ")
              for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])[:2]]
    assert c0[-(CHUNK_SIZE - CHUNK_STRIDE):] == c1[:CHUNK_SIZE - CHUNK_STRIDE]
    assert len(by_doc[4]) == 1 and by_doc[4][0]["chunk_text"] == "solo"


def test_corpus_sample_deterministic(spark):
    """Same doc_id -> same bucket on every run; rates apply per language."""
    import entity_resolution_pipeline_spark.plans.benchqueries as bq

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(200)],
        "doc_id long, lang string")
    orig = bq._t
    bq._t = lambda spark_, sf_dir, name: df
    try:
        a = {r["doc_id"]: (r["bucket"], r["kept"])
             for r in bq.q_corpus_sample(spark, "unused").collect()}
        b = {r["doc_id"]: (r["bucket"], r["kept"])
             for r in bq.q_corpus_sample(spark, "unused").collect()}
    finally:
        bq._t = orig
    assert a == b
    for doc_id, (bucket, kept) in a.items():
        rate = 50 if doc_id % 2 == 0 else 20
        assert kept == (bucket < rate)


def test_ppm_decode_real_roundtrip(spark):
    """REAL P6 decode: Spark-assembled PPM bytes parse back to the exact
    generation formula; junk payloads are dropped, comment headers parse."""
    from entity_resolution_pipeline_spark.operators.multimodal import (
        _parse_ppm, decode_ppm, ppm_payload_col,
    )

    docs = spark.createDataFrame([(7,), (123,)], "doc_id long")
    imgs = docs.select(
        "doc_id", ppm_payload_col(F.col("doc_id"), 4, 3).alias("payload"))
    rows = {r["doc_id"]: r for r in decode_ppm(imgs).collect()}
    for did in (7, 123):
        r = rows[did]
        assert (r["width"], r["height"], r["n_pixels"]) == (4, 3, 12)
        assert r["sum_r"] == sum((did + p) % 256 for p in range(12))
        assert r["sum_g"] == sum((did * 3 + p * 5) % 256 for p in range(12))
        assert r["sum_b"] == sum((p * 7) % 256 for p in range(12))
    # junk rows are dropped, not poisoned
    junk = spark.createDataFrame(
        [(1, bytearray(b"not a ppm")), (2, None)],
        "doc_id long, payload binary")
    assert decode_ppm(junk).count() == 0
    # comment-tolerant header (pure-python parser contract)
    img = b"P6\n# comment\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    w, h, raster = _parse_ppm(img)
    assert (w, h) == (2, 1)
    assert raster.sum(axis=(0, 1)).tolist() == [50, 70, 90]


def test_wav_decode_real_roundtrip(spark):
    """REAL PCM WAV decode: Spark-assembled RIFF bytes parse back to the
    two's-complement image of the generation formula; junk dropped."""
    from entity_resolution_pipeline_spark.operators.multimodal import (
        decode_wav, wav_payload_col,
    )

    docs = spark.createDataFrame([(7,), (4242,)], "doc_id long")
    audio = docs.select(
        "doc_id", wav_payload_col(F.col("doc_id"), 16, 8000).alias("payload"))
    rows = {r["doc_id"]: r for r in decode_wav(audio).collect()}
    for did in (7, 4242):
        amps = [((did * 31 + i * 17) % 65536 + 32768) % 65536 - 32768
                for i in range(16)]
        r = rows[did]
        assert (r["n_channels"], r["sample_rate"], r["n_samples"]) == (1, 8000, 16)
        assert (r["sum_amp"], r["min_amp"], r["max_amp"]) == \
            (sum(amps), min(amps), max(amps))
    junk = spark.createDataFrame(
        [(1, bytearray(b"RIFFnope")), (2, None)],
        "doc_id long, payload binary")
    assert decode_wav(junk).count() == 0


def test_ppm_resize_nearest_neighbor(spark):
    """NN resample reads source pixel ((x*W)//w2, (y*H)//h2); identity
    resize reproduces the full-raster sums."""
    from entity_resolution_pipeline_spark.operators.multimodal import (
        decode_ppm, ppm_payload_col, resize_ppm,
    )

    docs = spark.createDataFrame([(9,)], "doc_id long")
    imgs = docs.select(
        "doc_id", ppm_payload_col(F.col("doc_id"), 4, 3).alias("payload"))
    # identity resize == decode sums
    full = decode_ppm(imgs).collect()[0]
    same = resize_ppm(imgs, 4, 3).collect()[0]
    assert (same["sum_r"], same["sum_g"], same["sum_b"]) == \
        (full["sum_r"], full["sum_g"], full["sum_b"])
    # 2x1 output: pixels (0,0) and (2,0) of the 4x3 source
    small = resize_ppm(imgs, 2, 1).collect()[0]
    src = [0, 2]
    assert small["sum_r"] == sum((9 + s) % 256 for s in src)
    assert small["sum_g"] == sum((9 * 3 + s * 5) % 256 for s in src)
    assert small["sum_b"] == sum((s * 7) % 256 for s in src)


def test_token_entropy_matches_python(spark):
    """token_entropy_col == scalar ln n - sum(c ln c)/n over whitespace
    tokens (approx to the 6dp rounding); empty docs score NULL."""
    import math

    from entity_resolution_pipeline_spark.functions.textstats import (
        token_entropy_col,
    )

    texts = ["a a a b", "x", "", "one two two three three three",
             "z z z z", "m n o p q r"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, text string")
    got = {r["i"]: r["h"] for r in df.select(
        "i", token_entropy_col(F.col("text")).alias("h")).collect()}
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        if not toks:
            assert got[i] is None
            continue
        n = len(toks)
        counts = {w: toks.count(w) for w in set(toks)}
        want = math.log(n) - sum(c * math.log(c)
                                 for c in counts.values()) / n
        assert got[i] == pytest.approx(want, abs=1e-6), (i, got[i], want)


def test_winnow_fingerprints_properties(spark):
    """Winnowing guarantees: matches the scalar reference, any shared
    run of k+w-1 = 7 words produces a shared fingerprint, and density is
    well below the full shingle count."""
    import hashlib

    from entity_resolution_pipeline_spark.functions.hashing import (
        winnow_fingerprints_col,
    )

    K = W = 4

    def py_winnow(text):
        toks = [t for t in text.lower().split() if t]
        if not toks:
            return []
        if len(toks) < K:
            hs = [int(hashlib.md5(" ".join(toks).encode())
                      .hexdigest()[:8], 16)]
        else:
            hs = [int(hashlib.md5(" ".join(toks[i:i + K]).encode())
                      .hexdigest()[:8], 16)
                  for i in range(len(toks) - K + 1)]
        nw = max(len(hs) - W + 1, 1)
        return sorted({min(hs[j:j + W]) for j in range(nw)})

    shared = "the quick brown fox jumps over lazy"          # 7 words
    texts = {
        1: "aa bb cc " + shared + " dd ee ff gg hh ii jj kk",
        2: "zz yy xx ww vv " + shared + " uu tt ss rr qq",
        3: "completely different words with no common runs here at all",
        4: "tiny doc",
        5: "",
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: (list(r["fingerprints"]), r["n_fingerprints"])
           for r in df.select(
               "doc_id",
               winnow_fingerprints_col(F.col("text")).alias("fingerprints"),
               F.size(winnow_fingerprints_col(F.col("text"))).cast("long")
               .alias("n_fingerprints")).collect()}
    for i, t in texts.items():
        want = py_winnow(t)
        assert got[i] == (want, len(want)), i
    # guaranteed match window: docs 1 and 2 share the 7-word run
    assert set(got[1][0]) & set(got[2][0])
    assert not (set(got[3][0]) & set(got[1][0]))
    # density: fingerprints ≤ shingles (winnowing thins the set)
    n_shingles_1 = len(texts[1].split()) - K + 1
    assert got[1][1] < n_shingles_1
