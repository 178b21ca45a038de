"""Stage the scoring job's input tables ONCE for the scaling legs.

Runs corpus derivation → extract → blocks → pairs → attrs at full cluster
width and writes pairs+attrs to SCORE_INPUT_DIR. Every scaling leg then
scores the SAME input (the driver instruction's "same job ... on the same
input" at two parallelism levels).

Env: SPARK_GRAFT_* (session), SCORE_INPUT_DIR, SCORE_SF_DIR,
SCORE_VARIANTS, SCORE_CPUS.
Prints one JSON line with stage seconds + row counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from entity_resolution_pipeline_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig, stage_attrs, stage_blocks, stage_extract, stage_pairs,
)
from entity_resolution_pipeline_spark.operators.scoring import (  # noqa: E402
    release_persisted,
)
from entity_resolution_pipeline_spark.session import get_spark  # noqa: E402
from entity_resolution_pipeline_spark.sources.pages import (  # noqa: E402
    pages_from_documents,
)


def main() -> None:
    out = os.environ["SCORE_INPUT_DIR"]
    sf_dir = os.environ.get("SCORE_SF_DIR", "/root/testdata/sf0.1")
    variants = int(os.environ.get("SCORE_VARIANTS", "64"))
    cpus = int(os.environ.get("SCORE_CPUS", "32"))

    spark = get_spark(cores=cpus, shuffle_partitions=max(cpus, 8),
                      app_name="score-prep")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    # production default cap (top_n=300) — same rationale as bench.py
    cfg = PipelineConfig(n_bands=8, two_phase_scoring=True)

    pages = pages_from_documents(spark, sf_dir, variants=variants,
                                 n_partitions=cpus).drop("true_cluster")
    t0 = time.perf_counter()
    extracted = stage_extract(pages)
    extracted.write.mode("overwrite").parquet(f"{out}/extract")
    extracted = spark.read.parquet(f"{out}/extract")
    n_pages = extracted.count()
    times["extract"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    salted = stage_blocks(extracted, cfg, n_docs=n_pages)
    salted.write.mode("overwrite").parquet(f"{out}/blocks")
    release_persisted(salted)
    salted = spark.read.parquet(f"{out}/blocks")
    times["blocks"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pairs = stage_pairs(salted, cfg)
    pairs.write.mode("overwrite").parquet(f"{out}/pairs")
    n_pairs = spark.read.parquet(f"{out}/pairs").count()
    times["pairs"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    stage_attrs(extracted).write.mode("overwrite").parquet(f"{out}/attrs")
    times["attrs"] = time.perf_counter() - t0

    print(json.dumps({
        "stage_sec": {k: round(v, 3) for k, v in times.items()},
        "n_pages": n_pages, "n_pairs": n_pairs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
