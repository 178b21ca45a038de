"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Headline = the flagship ER pipeline (extract → block → pair → score →
cluster) over a pages corpus derived from the documents table, plus the
operator battery's heavy representatives. The ER stage also reports the
north-star throughput metric: candidate-pairs-scored per second.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for local[k] (default 32)
  BENCH_VARIANTS       near-dup variants per document for the ER corpus
                       (default 8 → sf0.1 ⇒ 40k pages)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from entity_resolution_pipeline_spark.plans import benchqueries as bq  # noqa: E402
from entity_resolution_pipeline_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig, stage_attrs, stage_blocks, stage_clusters, stage_extract,
    stage_pairs, stage_scored,
)
from entity_resolution_pipeline_spark.operators.scoring import (  # noqa: E402
    release_persisted, scoring_join_prefs,
)
from entity_resolution_pipeline_spark.session import get_spark  # noqa: E402
from entity_resolution_pipeline_spark.sources.pages import pages_from_documents  # noqa: E402

BATTERY = [
    "tpch_q1", "revenue_by_region", "top3_orders_per_customer",
    "running_revenue", "events_sessionize", "docs_fingerprint",
    "dedup_lsh_pairs", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_canonical", "corpus_curation", "ann_topk",
    "embedding_near_dup_srp", "connected_components",
    "incremental_near_dup", "curation_gate", "decontaminate",
    "training_corpus", "vocab_topk",
    # round-4 rows
    "remove_dup_spans", "curation_gate_extended", "ann_ivf_pq",
    "stream_strip_spans", "bm25_topk", "hybrid_rrf",
    "semantic_dedup", "fuzzy_decontaminate", "bpe_train",
    "line_dedup", "stream_semantic_dedup", "corpus_diff",
    "sketch_distinct",
    # round-5 rows
    "remove_long_repeats", "curation_gate_multilang", "quality_filter",
    "unigram_train", "semantic_dedup_cc", "stream_quality_filter",
    "dsir_select", "dedup_quality_keeper", "cluster_balanced_sample",
    "ccnet_buckets",
    # final round-5 rows
    "sketch_hll", "url_blocklist", "domain_pagerank", "domain_harmonic",
    "domain_triangles", "domain_trustrank",
]


def force_full(df) -> None:
    """Evaluate EVERY output column, not just row counts: ``df.count()``
    lets Catalyst prune unused projections, so pure-projection queries
    (signatures, fingerprints) would collapse to a parquet row-count scan
    and time nothing. A bit_xor over xxhash64(all columns) keeps each
    column's expression tree live with O(1) result size."""
    df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()


def run_er_pipeline_once(spark, sf_dir: str, variants: int,
                         cpus: int | None = None) -> dict:
    """One timed staged run; returns per-stage seconds + pair throughput."""
    # stage tables on tmpfs when available — same rationale as
    # spark.local.dir in session.py: the sandbox's one virtual disk is a
    # serial bottleneck no per-executor-NVMe cluster has
    base = "/dev/shm" if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK) else None
    tmp = tempfile.mkdtemp(prefix="bench_er_", dir=base)
    times: dict[str, float] = {}
    try:
        # defaultParallelism is wrong on a standalone cluster until executors
        # register; the caller knows the core quota it asked for
        cpus = cpus or spark.sparkContext.defaultParallelism
        # n_partitions: the synthetic corpus derives from ONE tiny parquet
        # split, which would run derivation + extraction on one core at any
        # cluster size (observed: extract flat 8→32 in round 1). Real crawl
        # input arrives in thousands of splits; this restores that layout.
        pages = pages_from_documents(spark, sf_dir, variants=variants,
                                     n_partitions=cpus).drop("true_cluster")
        # top_n: the PRODUCTION default (300, PipelineConfig) — the bench
        # must grade the cap story at the shipped cap, not a fixture-tuned
        # one. Overridable for experiments via BENCH_TOP_N.
        top_n = int(os.environ.get("BENCH_TOP_N", "0")) or None
        cfg = PipelineConfig(n_bands=8, repartition_blocks=None,
                             two_phase_scoring=True,
                             **({"top_n": top_n} if top_n else {}))

        t0 = time.perf_counter()
        extracted = stage_extract(pages)
        extracted.write.mode("overwrite").parquet(f"{tmp}/extract")
        extracted = spark.read.parquet(f"{tmp}/extract")
        n_pages = extracted.count()
        times["extract"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        salted = stage_blocks(extracted, cfg, n_docs=n_pages)
        salted.write.mode("overwrite").parquet(f"{tmp}/blocks")
        release_persisted(salted)
        salted = spark.read.parquet(f"{tmp}/blocks")
        times["blocks"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pairs = stage_pairs(salted, cfg, url_dim=extracted.select("url"))
        pairs.write.mode("overwrite").parquet(f"{tmp}/pairs")
        pairs = spark.read.parquet(f"{tmp}/pairs")
        n_pairs = pairs.count()
        times["pairs"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        stage_attrs(extracted).write.mode("overwrite").parquet(f"{tmp}/attrs")
        attrs = spark.read.parquet(f"{tmp}/attrs")
        times["attrs"] = time.perf_counter() - t0

        # Score stage, twice: the first (cold) materialization pays per-job
        # constants — Python-worker spawn for the JW pandas UDF, whole-stage
        # codegen compilation — that a 100-TB scoring stage (hours of tasks)
        # amortizes to zero. The second run rebuilds the full lineage from
        # parquet (its persisted features are released in between, so nothing
        # is reused but warm workers/JIT) and is the steady-state throughput
        # the north-rule metric wants. Both are reported.
        with scoring_join_prefs(spark):
            t0 = time.perf_counter()
            scored = stage_scored(pairs, attrs, cfg)
            scored.write.mode("overwrite").parquet(f"{tmp}/scored")
            release_persisted(scored)
            times["score_cold"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            scored2 = stage_scored(pairs, attrs, cfg)
            scored2.write.mode("overwrite").parquet(f"{tmp}/scored2")
            release_persisted(scored2)
            times["score"] = time.perf_counter() - t0
        scored = spark.read.parquet(f"{tmp}/scored")

        t0 = time.perf_counter()
        clusters = stage_clusters(scored, extracted, cfg)
        n_clusters = clusters.select("cluster_id").distinct().count()
        times["cluster"] = time.perf_counter() - t0

        return {
            "stage_sec": {k: round(v, 3) for k, v in times.items()},
            "n_pages": n_pages,
            "n_pairs": n_pairs,
            "n_clusters": n_clusters,
            "pairs_scored_per_sec": round(n_pairs / max(times["score"], 1e-9), 1),
            "er_total_sec": round(sum(times.values()), 3),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_er_pipeline(spark, sf_dir: str, variants: int,
                    cpus: int | None = None, reps: int = 1) -> dict:
    """Median-of-``reps`` staged ER run. Single e2e runs on this host swing
    >2× PER STAGE (round 3's number-of-record showed extract 5.7 → 13.5 s
    with zero code change on that path), so the stage seconds of record are
    per-stage MEDIANS across ``reps`` identical runs, with every raw leg
    kept in ``legs_raw`` — the same discipline the scaling bench applies to
    its e2e legs. Counts (pages/pairs/clusters) are identical across reps
    and asserted so."""
    import statistics

    legs = [run_er_pipeline_once(spark, sf_dir, variants, cpus=cpus)
            for _ in range(max(reps, 1))]
    for leg in legs[1:]:
        assert (leg["n_pages"], leg["n_pairs"], leg["n_clusters"]) == \
            (legs[0]["n_pages"], legs[0]["n_pairs"], legs[0]["n_clusters"]), \
            "ER reps disagree on row counts — nondeterminism"
    stages = {k: round(statistics.median(
        leg["stage_sec"][k] for leg in legs), 3)
        for k in legs[0]["stage_sec"]}
    return {
        "stage_sec": stages,
        "n_pages": legs[0]["n_pages"],
        "n_pairs": legs[0]["n_pairs"],
        "n_clusters": legs[0]["n_clusters"],
        "pairs_scored_per_sec": round(
            legs[0]["n_pairs"] / max(stages["score"], 1e-9), 1),
        "er_total_sec": round(sum(stages.values()), 3),
        "reps": len(legs),
        "legs_raw": [leg["stage_sec"] for leg in legs],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    variants = int(os.environ.get("BENCH_VARIANTS", "8"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # shuffle-partition floor: the pair-aggregation stage's per-task hash
    # tables need >=16 partitions at 64-variant corpus scale regardless of
    # core count (8 partitions OOMed a local[4] full-pipeline leg);
    # overridable so scaling legs can pin identical partitioning per width
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "0")) or max(cpus, 16)
    spark = get_spark(cores=cpus, shuffle_partitions=shuffle,
                      app_name="er-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    # ER stage times of record are medians of BENCH_ER_REPS runs (default 3;
    # the scaling legs pin 1 because tools/scaling_bench.py does its own
    # repetition). queries["er_pipeline"] is the median-derived total so the
    # headline number stays a single-pipeline cost, not reps× wall time.
    reps = int(os.environ.get(
        "BENCH_ER_REPS", "1" if os.environ.get("BENCH_ER_ONLY") else "3"))
    t0 = time.perf_counter()
    er = run_er_pipeline(spark, sf_dir, variants, cpus=cpus, reps=reps)
    er["wall_sec"] = round(time.perf_counter() - t0, 3)
    queries["er_pipeline"] = er["er_total_sec"]

    # scaling legs time only the ER stages; skip the battery to keep
    # interleaved rounds short (BENCH_ER_ONLY=1 set by tools/scaling_bench.py)
    battery = [] if os.environ.get("BENCH_ER_ONLY") else BATTERY
    # Battery rows are MEDIANS of BENCH_BATTERY_REPS full re-executions
    # (raw legs in battery_legs_raw) — single-run rows drifted ~1.3×
    # between rounds 3 and 4 with no code change on their paths (the ER
    # stages got the same medians-of-3 treatment in round 4 and stopped
    # lying immediately). Each rep rebuilds the DataFrame from the query
    # fn and releases its persisted internals afterwards, so reps share
    # nothing but warm executors/JIT — the steady-state a long job runs at.
    import statistics

    battery_reps = max(int(os.environ.get("BENCH_BATTERY_REPS", "3")), 1)
    battery_legs: dict[str, list[float]] = {}
    for name in battery:
        fn = bq.QUERIES[name]
        legs = []
        for _ in range(battery_reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            force_full(df)
            legs.append(round(time.perf_counter() - t0, 3))
            # rows that persist internals forward them on _erps_persisted;
            # release per rep so caches never bleed into later timings
            release_persisted(df)
        battery_legs[name] = legs
        queries[name] = round(statistics.median(legs), 3)

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "er": er,
        "battery_reps": battery_reps,
        "battery_legs_raw": battery_legs,
    }))


if __name__ == "__main__":
    main()
