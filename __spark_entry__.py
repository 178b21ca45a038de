"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end entity-resolution pipeline
(extract → block → pair → score → cluster) over a deterministic pages corpus
derived from the sf0.001 documents table and returns the cluster assignment.

``queries()`` / ``oracle_sql()`` expose the full operator battery
(entity_resolution_pipeline_spark/plans/benchqueries.py) — relational ops,
window functions, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
ANN cosine top-k, text analysis, connected components, multimodal plumbing —
each checked against a DuckDB oracle at sf=0.01 by the driver.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline at sf0.001; returns clusters(url, cluster_id).

    The planted partition doubles as the labeled fixture: passing it as
    ``golden_clusters`` exercises the decisioning stage (isotonic
    calibration → tiers → conflicts → review queue, D1-D5/M4) on every
    entry run — the clusters output schema is unchanged."""
    import pyspark.sql.functions as F

    from entity_resolution_pipeline_spark.plans.pipeline import (
        PipelineConfig, run_pipeline,
    )
    from entity_resolution_pipeline_spark.sources.pages import pages_from_documents
    from entity_resolution_pipeline_spark.sources.tableio import TableIO

    pages = pages_from_documents(spark, "/root/testdata/sf0.001", variants=4)
    golden = pages.select(
        "url", F.col("true_cluster").cast("string").alias("cluster_id"))
    io = TableIO(spark, tempfile.mkdtemp(prefix="er_entry_"))
    cfg = PipelineConfig(n_bands=8, top_n=100)
    return run_pipeline(spark, pages.drop("true_cluster"), io, cfg,
                        resume=False, golden_clusters=golden)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from entity_resolution_pipeline_spark.plans.benchqueries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from entity_resolution_pipeline_spark.plans.benchqueries import ORACLE_SQL

    return dict(ORACLE_SQL)
