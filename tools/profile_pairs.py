"""Profile the candidate-pairs stage step by step at bench scale.

Separates the pairs-stage cost into (a) reading the salted blocks table,
(b) the self-join + canonical-bucket filter (pair *enumeration*),
(c) the per-pair group-aggregation, (d) the top-N window, so the next
optimization targets the real hot step instead of a guess.

Usage: python tools/profile_pairs.py [sf_dir] [variants] [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from entity_resolution_pipeline_spark.operators.blocking import SOURCE_SCORES  # noqa: E402
from entity_resolution_pipeline_spark.operators.pairs import candidate_pairs  # noqa: E402
from entity_resolution_pipeline_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig, stage_blocks, stage_extract,
)
from entity_resolution_pipeline_spark.operators.scoring import release_persisted  # noqa: E402
from entity_resolution_pipeline_spark.functions.hashing import salt_fast_col  # noqa: E402
from entity_resolution_pipeline_spark.session import get_spark  # noqa: E402
from entity_resolution_pipeline_spark.sources.pages import pages_from_documents  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    variants = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus, 8),
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
    print(f"blocks stage: {time.perf_counter()-t0:.1f}s")
    salted = spark.read.parquet(f"{tmp}/blocks")
    n_block_rows = salted.count()
    print(f"n_pages={n_pages} block_rows={n_block_rows}")

    # (b) enumeration only: join + filters, count (int canonical filter —
    # mirrors operators/pairs.py; legacy string variant removed with it)
    a = salted.select("join_key", "source", F.col("url").alias("url_a"),
                      F.col("g").alias("g_a"), "sp", "sq")
    b = salted.select("join_key", F.col("url").alias("url_b"),
                      F.col("g").alias("g_b"))
    hits = (a.join(b, "join_key")
            .where(F.col("url_a") < F.col("url_b"))
            .where(F.col("sp").isNull()
                   | ((F.col("sp") == F.least("g_a", "g_b"))
                      & (F.col("sq") == F.greatest("g_a", "g_b")))))
    t0 = time.perf_counter()
    n_hits = hits.count()
    print(f"enumeration (join+filter count): {time.perf_counter()-t0:.1f}s "
          f"hit_rows={n_hits}")

    # (c) + aggregation, no window (max-flag sources — mirrors pairs.py)
    score_map = F.create_map(*[
        x for s, v in SOURCE_SCORES.items() for x in (F.lit(s), F.lit(v))])
    srcs = sorted(SOURCE_SCORES)
    agg = hits.groupBy("url_a", "url_b").agg(
        F.sum(score_map[F.col("source")]).alias("blocking_score"),
        *[F.max((F.col("source") == s).cast("int")).alias(f"_has_{s}")
          for s in srcs],
    ).select(
        "url_a", "url_b", "blocking_score",
        F.concat_ws("|", *[F.when(F.col(f"_has_{s}") == 1, F.lit(s))
                           for s in srcs]).alias("sources"))
    t0 = time.perf_counter()
    agg.write.mode("overwrite").parquet(f"{tmp}/agg")
    print(f"agg (join+filter+groupBy+write): {time.perf_counter()-t0:.1f}s "
          f"pairs={spark.read.parquet(f'{tmp}/agg').count()}")

    # (d) full candidate_pairs incl. top-N window
    t0 = time.perf_counter()
    full = candidate_pairs(salted, top_n=cfg.top_n, n_salts=cfg.n_salts)
    full.write.mode("overwrite").parquet(f"{tmp}/pairs")
    print(f"full pairs stage (+window+write): {time.perf_counter()-t0:.1f}s "
          f"pairs={spark.read.parquet(f'{tmp}/pairs').count()}")

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
