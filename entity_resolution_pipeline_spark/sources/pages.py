"""Deterministic synthetic web-pages fixtures (FIXTURES.md).

Two generators:

* :func:`synth_pages` — driver-side, seed-42 numpy generation of the full
  fixture family (pages + labeled_pairs + golden_clusters + golden_text)
  at tiny scale for pytest correctness gates. Content is a pure function of
  (seed, row index): no wall-clock, no external data.

* :func:`pages_from_documents` — distributed, all-native derivation of an
  arbitrarily large pages corpus from the testdata ``documents`` table:
  each document spawns ``variants`` perturbed near-duplicate pages (token
  rotation, token dropping, diacritic injection, boilerplate suffix) whose
  ground-truth cluster is the source ``doc_id``. Used by the benchmark at
  scale — perturbations are Column expressions, so corpus construction
  itself is distributed and never collects to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType, TimestampType,
)

from ..functions.normalize import extract_text_py

# vocabulary with diacritic adversaries (NFKD traps) per FIXTURES.md
_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu market stream vector signal matrix copper silver cobalt "
    "umber quartz granite meadow harbor summit canyon prairie tundra lagoon "
    "citadel beacon mosaic lantern compass anchor voyage horizon ember willow"
).split()
_DIACRITIC = {"a": "á", "e": "é", "i": "í", "o": "ö", "u": "ü", "c": "ç", "n": "ñ"}
_BOILER = ["home", "about", "contact", "privacy", "terms", "careers"]

_HTML_TMPL = (
    "<html><head><title>{title}</title>"
    "<script>var x = 'IGNORED {eid}';</script>"
    "<style>.nav {{ color: red; }}</style></head>"
    "<body><nav>menu &amp; links</nav><h1>{title}</h1><p>{body}</p>"
    "<footer>&copy; example</footer></body></html>"
)

HOT_DOMAIN = "hot-portal.example.com"
EPOCH_S = 1577836800  # 2020-01-01, fixed epoch per FIXTURES.md

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def _diacritize(tok: str) -> str:
    return "".join(_DIACRITIC.get(c, c) for c in tok)


def synth_pages(n_clusters: int = 400, seed: int = 42) -> dict[str, pd.DataFrame]:
    """Generate the fixture family as pandas frames (tiny scale).

    Returns dict with keys ``pages``, ``labeled_pairs``, ``golden_clusters``,
    ``golden_text``. Cluster sizes 1–6; one hot domain >10% of rows; ≤20%
    token noise within a cluster; hard negatives share a domain or a vocab
    theme but belong to different clusters.
    """
    rng = np.random.RandomState(seed)
    # ~3000 distinct tokens: a small vocab alone makes unrelated documents
    # share most of their token set (Jaccard ≈ 0.5 between random draws),
    # which no scorer could separate — suffix-expand so negatives are far.
    vocab = [f"{w}{i:02d}" for w in _VOCAB for i in range(50)]
    pages, members = [], []
    row_i = 0
    for eid in range(n_clusters):
        # cluster 0 is a mega-cluster (boilerplate duplicated ~40×): its
        # content blocking keys (fp8/mh/dom-composite) exceed any hot
        # threshold, exercising skew salting through the real blocking path
        # (web-scale skew comes from massively-duplicated content)
        csize = 40 if eid == 0 else int(rng.choice([1, 1, 2, 2, 3, 3, 4, 5, 6]))
        base_len = int(rng.randint(25, 60))
        base = [str(rng.choice(vocab)) for _ in range(base_len)]
        hot = eid == 0 or rng.rand() < 0.13
        base_dom = HOT_DOMAIN if hot else f"site-{int(rng.zipf(1.6)) % 97}.example.com"
        urls = []
        for m in range(csize):
            toks = list(base)
            if m > 0:
                # ≤20% replacement noise
                n_rep = int(len(toks) * rng.uniform(0.0, 0.2))
                for pos in rng.choice(len(toks), size=n_rep, replace=False):
                    toks[pos] = str(rng.choice(vocab))
                if rng.rand() < 0.5:  # token reorder
                    rng.shuffle(toks)
                if rng.rand() < 0.3:  # diacritic variant
                    for pos in rng.choice(len(toks), size=max(1, len(toks) // 8), replace=False):
                        toks[pos] = _diacritize(toks[pos])
                if rng.rand() < 0.4:  # boilerplate suffix
                    toks = toks + list(_BOILER[: int(rng.randint(2, 6))])
            dom = base_dom if (m == 0 or rng.rand() < 0.6) else \
                f"mirror-{int(rng.randint(0, 29))}.example.org"
            url = f"https://{dom}/e{eid}/v{m}"
            body = " ".join(toks)
            html = _HTML_TMPL.format(title=f"entity {eid}", eid=eid, body=body).encode("utf-8")
            text = extract_text_py(html)
            lang = str(rng.choice(["en"] * 8 + ["de", "fr", "it", "es"]))
            if rng.rand() < 0.02:
                lang = None
            pages.append(
                (url, pd.Timestamp(EPOCH_S + row_i * 60, unit="s"), html, text, lang)
            )
            members.append((eid, url, dom))
            urls.append(url)
            row_i += 1

    pages_df = pd.DataFrame(pages, columns=["url", "warc_ts", "html", "text", "lang"])

    by_cluster: dict[int, list[tuple[str, str]]] = {}
    for eid, url, dom in members:
        by_cluster.setdefault(eid, []).append((url, dom))

    # positives: all within-cluster pairs
    lp = []
    for eid, mem in by_cluster.items():
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                (ua, da), (ub, db) = sorted(mem[i:i + 1] + mem[j:j + 1])
                bk = f"dom:{'.'.join(da.split('.')[-3:])}" if da == db else f"ent:{eid}"
                lp.append((min(ua, ub), max(ua, ub), 1, bk))
    # hard negatives: cross-cluster pairs on the hot domain (high co-block rate)
    eids = sorted(by_cluster)
    for k in range(len(eids) - 1):
        a = by_cluster[eids[k]][0]
        b = by_cluster[eids[k + 1]][0]
        if a[1] == b[1] or rng.rand() < 0.3:
            ua, ub = sorted([a[0], b[0]])
            bk = f"dom:{a[1]}" if a[1] == b[1] else "xdom"
            lp.append((ua, ub, 0, bk))
    labeled = pd.DataFrame(lp, columns=["url_a", "url_b", "label", "block_key"])

    golden = pd.DataFrame(
        [(url, min(u for u, _ in by_cluster[eid])) for eid, mem in by_cluster.items()
         for url, _ in mem],
        columns=["url", "cluster_id"],
    )
    import hashlib

    gt = pages_df[["url", "text"]].copy()
    gt["text_sha256"] = gt["text"].map(
        lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest()
    )
    return {
        "pages": pages_df,
        "labeled_pairs": labeled,
        "golden_clusters": golden,
        "golden_text": gt[["url", "text_sha256", "text"]],
    }


def synth_pages_spark(spark: SparkSession, n_clusters: int = 400, seed: int = 42,
                      ) -> dict[str, DataFrame]:
    fx = synth_pages(n_clusters, seed)
    out = {"pages": spark.createDataFrame(fx["pages"], schema=PAGES_SCHEMA)}
    for k in ("labeled_pairs", "golden_clusters", "golden_text"):
        out[k] = spark.createDataFrame(fx[k])
    return out


def pages_from_documents(spark: SparkSession, sf_dir: str, variants: int = 4,
                         n_partitions: int | None = None) -> DataFrame:
    """Distributed pages corpus derived from testdata documents.

    Output columns: url, warc_ts, html, text, lang, true_cluster (= doc_id).
    Perturbations are pure Column expressions over (doc_id, variant):

      v=0: identity; v≡1 (mod 4): rotate tokens by v; v≡2: drop every 5th
      token; v≡3: diacritic-inject 'e'→'é' + boilerplate suffix.

    Cluster identity survives the canonical extractor because perturbations
    keep ≥80% token overlap. Everything stays JVM-side except nothing — html
    assembly is concat(), so the corpus builder has zero Python.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if n_partitions:
        # the testdata file is one tiny split; without this the whole
        # corpus derivation (explode + per-token transforms) and every
        # narrow consumer downstream runs on a single core. Real crawl
        # input arrives pre-split — this restores that layout.
        docs = docs.repartition(n_partitions)
    # salt every token with a per-doc suffix: the raw documents table has a
    # ~40-word vocabulary, which would make ALL documents near-duplicates of
    # each other (pathological mega-blocks, nothing to resolve); suffixing
    # gives realistic web-corpus diversity while keeping variants of the
    # same doc true near-duplicates
    salt = F.col("doc_id").cast("string")  # unique per doc: no accidental
    # cross-doc vocabulary sharing (same-salt docs would be true near-dups)
    df = docs.select(
        "doc_id", "lang",
        F.explode(F.sequence(F.lit(0), F.lit(variants - 1))).alias("v"),
        F.transform(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""),
            lambda t: F.concat(t, salt),
        ).alias("toks"),
    )
    n = F.size("toks")
    v = F.col("v")
    rot = F.pmod(v, F.least(n, F.lit(7)) + 1)
    rotated = F.concat(
        F.slice(F.col("toks"), rot + 1, n - rot),
        F.slice(F.col("toks"), 1, rot),
    )
    dropped = F.filter(F.col("toks"), lambda t, i: F.pmod(i, F.lit(5)) != 0)
    diacritized = F.transform(
        F.col("toks"), lambda t: F.translate(t, "e", "é")
    )
    body_toks = (
        F.when(v == 0, F.col("toks"))
        .when(F.pmod(v, F.lit(4)) == 1, rotated)
        .when(F.pmod(v, F.lit(4)) == 2, dropped)
        .otherwise(F.concat(diacritized, F.array(*[F.lit(b) for b in _BOILER[:3]])))
    )
    body = F.concat_ws(" ", body_toks)
    # 250 domains → at variants=8 / sf0.1 each dom block ≈ 160 pages: inside
    # the hot-salting band (hot_threshold < size < stop), so the bench
    # exercises triangular salting; the hot portal below lands above the
    # stop ceiling and exercises stop-key dropping
    dom = F.concat(F.lit("doc-"), F.pmod(F.col("doc_id"), F.lit(250)).cast("string"),
                   F.lit(".example.com"))
    # planted hot domain: ~12% of rows per FIXTURES.md skew requirement
    dom = F.when(F.pmod(F.col("doc_id"), F.lit(8)) == 3, F.lit(HOT_DOMAIN)).otherwise(dom)
    url = F.concat(F.lit("https://"), dom, F.lit("/d"),
                   F.col("doc_id").cast("string"), F.lit("/v"), v.cast("string"))
    title = F.concat(F.lit("doc "), F.col("doc_id").cast("string"))
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title><script>var x='IGNORED';</script><style>.n{color:red}</style></head>"
              "<body><nav>menu &amp; links</nav><h1>"), title,
        F.lit("</h1><p>"), body,
        F.lit("</p><footer>&copy; example</footer></body></html>"),
    ).cast("binary")
    ts = F.timestamp_seconds(F.lit(EPOCH_S) + F.col("doc_id") * 600 + v * 60)
    return df.select(
        url.alias("url"), ts.alias("warc_ts"), html.alias("html"),
        F.lit(None).cast("string").alias("text"), F.col("lang"),
        F.col("doc_id").alias("true_cluster"),
    )
