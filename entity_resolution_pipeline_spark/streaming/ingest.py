"""Structured-Streaming ingestion of the pages table.

The reference's "streaming" is hand-rolled chunked iteration
(/root/reference/src/data_io.py:708-778, src/blocking.py:524-597) —
Spark replaces both the chunk loop and the incremental ParquetWriter with
``readStream``/``writeStream``. This module gives the engine a real
incremental-ingest path: new page files landing in a directory are
extracted (same canonical pUDF, byte-identical semantics) and appended to
the extracted table exactly-once via the streaming checkpoint.

Batch pipeline stages then run over the continuously-growing extracted
table; ``Trigger.AvailableNow`` drains the backlog and stops, which is the
cron-batch pattern a 100 TB crawl ingest actually runs (process everything
new, then exit — resumable from the checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import extract_text_udf
from ..sources.pages import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental extract: parquet file source → extractor pUDF → append
    parquet sink with checkpointed exactly-once file tracking.

    Returns the StreamingQuery (caller awaits termination). The
    transformation is identical to the batch ``stage_extract`` — one code
    path for the invariant-bearing extraction, two execution modes.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)  # bounded micro-batches
        .parquet(input_dir)
    )
    extracted = stream.withColumn("text_norm", extract_text_udf(F.col("html")))
    writer = (
        extracted.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_available_now(spark: SparkSession, input_dir: str,
                                output_dir: str, checkpoint_dir: str,
                                timeout_s: int = 300) -> DataFrame:
    """Drain-everything-then-stop ingest; returns the extracted table.

    awaitTermination returning False means the drain did NOT finish inside
    ``timeout_s`` — reading the output then would silently hand back a
    partially-written table, so the query is stopped and a TimeoutError
    raised instead (resume is safe: the checkpoint already recorded the
    committed batches).
    """
    q = stream_extract(spark, input_dir, output_dir, checkpoint_dir,
                       available_now=True)
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"streaming ingest did not drain within {timeout_s}s; "
            f"output at {output_dir} is partial — rerun to resume from "
            f"checkpoint {checkpoint_dir}")
    return spark.read.parquet(output_dir)
