"""entity_resolution_pipeline_spark — a PySpark-native entity-resolution
and web-text analytics engine.

Brand-new Spark-first design with the query/data-processing capabilities of
the reference single-node pipeline (``francescods04/entity-resolution-pipeline``,
studied read-only at /root/reference): deterministic text extraction,
multi-pass blocking (normalized-domain + MinHash/LSH shingle keys, salted),
Arrow-vectorized pairwise scoring, and iterative large-star/small-star
connected components — all expressed as lazy DataFrame plans so Catalyst
picks the physical strategy.

Python on the hot path is restricted to Arrow-vectorized pandas UDFs
(extractor, similarity, model scoring); everything else is native Column
expressions (see SURVEY.md §2.14).
"""

__version__ = "0.1.0"
