"""Profile the candidate-pairs stage component by component at bench scale.

Separates the pairs-stage cost into
  (a) reading/staging the salted blocks table,
  (b) the self-join + canonical-bucket filter (pair *enumeration*),
  (c) the 128-bit-digest group-aggregation + top-N window (no url map-back),
  (d) the url join-backs alone — blocks-derived dim vs pages-derived dim,
  (e) the full candidate_pairs incl. write,
so the next optimization targets the real hot step instead of a guess.

Usage: python tools/profile_pairs.py [sf_dir] [variants] [cpus] [shuffle]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from entity_resolution_pipeline_spark.operators.blocking import SOURCE_SCORES  # noqa: E402
from entity_resolution_pipeline_spark.operators.pairs import candidate_pairs  # noqa: E402
from entity_resolution_pipeline_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig, stage_blocks, stage_extract,
)
from entity_resolution_pipeline_spark.operators.scoring import release_persisted  # noqa: E402
from entity_resolution_pipeline_spark.session import get_spark  # noqa: E402
from entity_resolution_pipeline_spark.sources.pages import pages_from_documents  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    variants = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    shuffle = int(sys.argv[4]) if len(sys.argv) > 4 else max(cpus, 16)

    spark = get_spark(cores=cpus, shuffle_partitions=shuffle,
                      app_name="pairs-profile")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="profile_pairs_", dir=base)
    cfg = PipelineConfig(n_bands=8, top_n=20, two_phase_scoring=True)

    pages = pages_from_documents(spark, sf_dir, variants=variants,
                                 n_partitions=cpus).drop("true_cluster")
    extracted = stage_extract(pages)
    extracted.write.mode("overwrite").parquet(f"{tmp}/extract")
    extracted = spark.read.parquet(f"{tmp}/extract")
    n_pages = extracted.count()

    t0 = time.perf_counter()
    salted = stage_blocks(extracted, cfg, n_docs=n_pages)
    salted.write.mode("overwrite").parquet(f"{tmp}/blocks")
    release_persisted(salted)
    print(f"blocks stage: {time.perf_counter()-t0:.1f}s", flush=True)
    salted = spark.read.parquet(f"{tmp}/blocks")
    n_block_rows = salted.count()
    hot_rows = salted.where(F.col("g").isNotNull()).count()
    print(f"n_pages={n_pages} block_rows={n_block_rows} "
          f"hot_replica_rows={hot_rows}", flush=True)

    # (b) enumeration only: join + filters, count (int canonical filter —
    # mirrors operators/pairs.py)
    a = salted.select("join_key", "source", F.col("url").alias("url_a"),
                      F.col("g").alias("g_a"), "sp", "sq")
    b = salted.select("join_key", F.col("url").alias("url_b"),
                      F.col("g").alias("g_b"))
    hits = (a.join(b.hint("shuffle_hash"), "join_key")
            .where(F.col("url_a") < F.col("url_b"))
            .where(F.col("sp").isNull()
                   | ((F.col("sp") == F.least("g_a", "g_b"))
                      & (F.col("sq") == F.greatest("g_a", "g_b")))))
    t0 = time.perf_counter()
    n_hits = hits.count()
    print(f"enumeration (join+filter count): {time.perf_counter()-t0:.1f}s "
          f"hit_rows={n_hits}", flush=True)

    # (c) digest agg + top-N window, NO url map-back (mirrors pairs.py
    # compact path through the cap)
    score_map = F.create_map(*[
        x for s, v in SOURCE_SCORES.items() for x in (F.lit(s), F.lit(v))])
    srcs = sorted(SOURCE_SCORES)

    def _digest(col):
        return [F.xxhash64(F.col(col)).alias(f"_h1_{col}"),
                F.xxhash64(F.lit("uid2"), F.col(col)).alias(f"_h2_{col}")]

    key_cols = ["_h1_url_a", "_h2_url_a", "_h1_url_b", "_h2_url_b"]
    agg = (hits.select(*_digest("url_a"), *_digest("url_b"),
                       score_map[F.col("source")].alias("_w"), "source")
           .groupBy(*key_cols)
           .agg(F.sum("_w").alias("blocking_score"),
                *[F.max((F.col("source") == s).cast("int")).alias(f"_has_{s}")
                  for s in srcs])
           .select(*key_cols, "blocking_score",
                   F.concat_ws("|", *[F.when(F.col(f"_has_{s}") == 1, F.lit(s))
                                      for s in srcs]).alias("sources")))
    # (c0) digest agg ONLY — no top-N window; (c) minus (c0) isolates the
    # window's extra exchange + per-partition sort
    t0 = time.perf_counter()
    agg.write.mode("overwrite").parquet(f"{tmp}/agg_nowin")
    n_agg = spark.read.parquet(f"{tmp}/agg_nowin").count()
    print(f"digest agg (no window) + write: {time.perf_counter()-t0:.1f}s "
          f"agg_rows={n_agg}", flush=True)

    w = Window.partitionBy("_h1_url_a", "_h2_url_a").orderBy(
        F.desc("blocking_score"), F.asc("_h1_url_b"), F.asc("_h2_url_b"))
    capped = agg.withColumn("rn", F.row_number().over(w)) \
                .where(F.col("rn") <= cfg.top_n).drop("rn")
    t0 = time.perf_counter()
    capped.write.mode("overwrite").parquet(f"{tmp}/capped")
    n_capped = spark.read.parquet(f"{tmp}/capped").count()
    print(f"digest agg + window + write: {time.perf_counter()-t0:.1f}s "
          f"pairs={n_capped}", flush=True)
    capped = spark.read.parquet(f"{tmp}/capped")

    # (d1) url join-back from the BLOCKS-derived dim (current pairs.py shape)
    urls_blocks = (salted.select("url").distinct()
                   .select(F.xxhash64("url").alias("_h1"),
                           F.xxhash64(F.lit("uid2"), "url").alias("_h2"),
                           "url"))

    def joinback(dim, label):
        out = (capped
               .join(dim.select(F.col("_h1").alias("_h1_url_a"),
                                F.col("_h2").alias("_h2_url_a"),
                                F.col("url").alias("url_a")),
                     ["_h1_url_a", "_h2_url_a"])
               .join(dim.select(F.col("_h1").alias("_h1_url_b"),
                                F.col("_h2").alias("_h2_url_b"),
                                F.col("url").alias("url_b")),
                     ["_h1_url_b", "_h2_url_b"])
               .select("url_a", "url_b", "blocking_score", "sources"))
        t0 = time.perf_counter()
        out.write.mode("overwrite").parquet(f"{tmp}/jb")
        print(f"join-back [{label}]: {time.perf_counter()-t0:.1f}s", flush=True)

    joinback(urls_blocks, "blocks-distinct dim")

    # (d2) url join-back from the PAGES-derived dim (no blocks scan/distinct)
    urls_pages = extracted.select(
        F.xxhash64("url").alias("_h1"),
        F.xxhash64(F.lit("uid2"), "url").alias("_h2"), "url")
    joinback(urls_pages, "pages dim")

    # (e) full candidate_pairs incl. top-N window (current library code)
    t0 = time.perf_counter()
    full = candidate_pairs(salted, top_n=cfg.top_n, n_salts=cfg.n_salts)
    full.write.mode("overwrite").parquet(f"{tmp}/pairs")
    print(f"full pairs stage (+window+write): {time.perf_counter()-t0:.1f}s "
          f"pairs={spark.read.parquet(f'{tmp}/pairs').count()}", flush=True)

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
