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


PYFILES_DRIVER = """
# NOTE: no sys.path.insert of the repo anywhere — the package must import
# from the --py-files zip on the driver AND on the executors.
from pyspark.sql import SparkSession

import entity_resolution_pipeline_spark  # from the zip
from entity_resolution_pipeline_spark.functions.similarity import (
    jaro_winkler_py, jaro_winkler_udf,
)

spark = SparkSession.builder.appName("pyfiles-e2e").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
assert spark.sparkContext.master.startswith("spark://"), spark.sparkContext.master
assert "erps_pkg.zip" in entity_resolution_pipeline_spark.__file__, (
    "driver imported the package from outside the shipped zip: "
    + entity_resolution_pipeline_spark.__file__)

rows = [("martha", "marhta"), ("dwayne", "duane"), ("acme corp", "acme corp")]
df = spark.createDataFrame(rows, "a string, b string").repartition(4)
got = {(r["a"], r["b"]): r["jw"] for r in
       df.select("a", "b", jaro_winkler_udf("a", "b").alias("jw")).collect()}
for a, b in rows:
    assert abs(got[(a, b)] - jaro_winkler_py(a, b)) < 1e-12, (a, b, got[(a, b)])
print("PYFILES_OK", len(got))
spark.stop()
"""


def test_spark_submit_py_files_ships_package(tmp_path):
    """LITERAL north-rule deployment: `spark-submit --py-files pkg.zip`
    against the standalone cluster, with the repo absent from PYTHONPATH —
    the package (incl. its pandas UDF) must reach driver and executors
    solely through the shipped zip."""
    import zipfile

    import pyspark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from standalone import StandaloneCluster

    pkg_zip = str(tmp_path / "erps_pkg.zip")
    pkg_root = os.path.join(REPO, "entity_resolution_pipeline_spark")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))

    driver_py = tmp_path / "pyfiles_driver.py"
    driver_py.write_text(PYFILES_DRIVER)
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit")

    cluster = StandaloneCluster(n_workers=2, cores_per_worker=2,
                                worker_mem="3g")
    try:
        url = cluster.start()
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        out = subprocess.run(
            [spark_submit, "--master", url,
             "--conf", "spark.cores.max=4",
             "--conf", "spark.executor.cores=2",
             "--conf", "spark.executor.memory=2g",
             "--py-files", pkg_zip,
             str(driver_py)],
            env=env, capture_output=True, text=True, timeout=300,
            cwd=str(tmp_path),
        )
        assert "PYFILES_OK" in out.stdout, \
            f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-3000:]}"
    finally:
        cluster.stop()
