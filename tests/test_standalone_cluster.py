"""Multi-executor deployment check (north rule: "run via spark-submit
--py-files on a multi-executor cluster").

Spins up a real local standalone cluster (1 master + 2 workers, 2 cores
each, pinned via taskset — tools/standalone.py), submits the ER pipeline
against ``spark://`` with ``spark.cores.max=4`` so it runs as TWO separate
2-core executor JVMs, and asserts the clustering output matches the
planted partition — i.e. the package code (including its pandas UDFs)
ships to and executes on remote executors, not just in-process local mode.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SCRIPT = """
import os, sys
sys.path.insert(0, __REPO__)
from entity_resolution_pipeline_spark.session import get_spark
from entity_resolution_pipeline_spark.plans.pipeline import (
    PipelineConfig, stage_attrs, stage_blocks, stage_clusters, stage_extract,
    stage_pairs, stage_scored,
)
from entity_resolution_pipeline_spark.operators.scoring import release_persisted
from entity_resolution_pipeline_spark.sources.pages import pages_from_documents

spark = get_spark(cores=4, shuffle_partitions=4, app_name="cluster-e2e")
spark.sparkContext.setLogLevel("ERROR")
assert spark.sparkContext.master.startswith("spark://"), spark.sparkContext.master

sf_dir = "/root/testdata/sf0.001"
pages = pages_from_documents(spark, sf_dir, variants=4, n_partitions=4)
truth = pages.select("url", "true_cluster")
cfg = PipelineConfig(n_bands=8, top_n=20, two_phase_scoring=True)

extracted = stage_extract(pages.drop("true_cluster"))
salted = stage_blocks(extracted, cfg, n_docs=extracted.count())
pairs = stage_pairs(salted, cfg)
attrs = stage_attrs(extracted)
scored = stage_scored(pairs, attrs, cfg)
clusters = stage_clusters(scored, extracted, cfg)

# clusters must reproduce the planted partition up to relabeling:
# canonicalize both sides by min member url
from pyspark.sql import functions as F, Window
w_mine = Window.partitionBy("cluster_id")
w_true = Window.partitionBy("true_cluster")
joined = clusters.join(truth, "url")
canon = joined.select(
    "url",
    F.min("url").over(w_mine).alias("canon_mine"),
    F.min("url").over(w_true).alias("canon_true"),
)
mismatch = canon.where(F.col("canon_mine") != F.col("canon_true")).count()
release_persisted(salted)
release_persisted(scored)
assert mismatch == 0, f"{mismatch} urls clustered differently from planted truth"
print("CLUSTER_E2E_OK", clusters.select("cluster_id").distinct().count())
spark.stop()
"""


def test_pipeline_on_standalone_cluster(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from standalone import StandaloneCluster

    cluster = StandaloneCluster(n_workers=2, cores_per_worker=2,
                                worker_mem="3g")
    try:
        url = cluster.start()
        env = dict(os.environ,
                   SPARK_GRAFT_MASTER=url,
                   SPARK_GRAFT_EXEC_CORES="2",
                   SPARK_GRAFT_EXEC_MEM="2g",
                   SPARK_GRAFT_DRIVER_MEM="2g")
        out = subprocess.run(
            [sys.executable, "-c", DRIVER_SCRIPT.replace("__REPO__", repr(REPO))],
            env=env, capture_output=True, text=True, timeout=420, cwd=REPO,
        )
        assert "CLUSTER_E2E_OK" in out.stdout, \
            f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-3000:]}"
        # two executors, one per worker
        st = cluster._status()
        assert len([w for w in st["workers"] if w["state"] == "ALIVE"]) == 2
    finally:
        cluster.stop()
