"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct — the same
"bytes live in the row" stance as embeddings (no sidecar files, contrast the
reference's .npy mmaps, /root/reference/src/embeddings.py:147-190). The
Spark-side machinery (schema, batch shape, iterator pUDF signature,
partition sizing) is real and tested; the codec itself is STUBBED because
image/audio libraries are not in this container:

* ``decode_media`` raises ``NotImplementedError`` unless ``fake=True``,
  in which case a deterministic fake decoder (byte-histogram features)
  stands in so the distributed plumbing is exercised end-to-end.

``mapInPandas`` is used (iterator of pandas DataFrames) so a real decoder
would initialize its model/codec once per python worker, not per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("n_bytes", LongType(), False),
    StructField("sha", StringType(), False),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("feature", ArrayType(DoubleType()), False),
])


def media_table(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from a text corpus for testing:
    (media_id, kind, payload binary, meta struct). Native only."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col).cast("long"), F.lit(3)) + 1).cast("int"),
    )
    media_id = F.concat(F.lit("m"), F.col(id_col).cast("string"))
    return docs.select(
        media_id.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            media_id.alias("media_id"),
            kind.alias("kind"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("sha"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: normalized byte histogram over
    ``dim`` buckets. NOT a real decoder — exists to exercise batch shape."""
    if not payload:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    n = float(len(payload))
    return [round(c / n, 6) for c in counts]


def decode_media(media: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """payload → feature vector via mapInPandas (Arrow-batched).

    A real deployment replaces ``_fake_decode`` with the codec / model
    forward pass; the Spark contract (schema in/out, iterator batching,
    one-time per-worker init) is unchanged.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/torchaudio) are not available in this "
            "environment; call with fake=True for the deterministic stand-in"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker init happens here (codec/model load) — once per task,
        # not per batch, which is why mapInPandas and not a scalar pUDF
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "feature": pdf["payload"].map(lambda p: _fake_decode(p, dim)),
            })

    cols = media.select("media_id", "kind", "payload")
    return cols.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregates — native, no decode needed: per kind,
    count / total bytes / max bytes / distinct payloads."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.max(F.col("meta.n_bytes")).alias("max_bytes"),
            F.countDistinct(F.col("meta.sha")).alias("distinct_payloads"),
        )
    )
