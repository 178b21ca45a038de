"""Embedding stage (F15) with a deterministic stand-in encoder.

The reference encodes names with a SentenceTransformer into fp16 matrices on
disk (/root/reference/src/embeddings.py:34-191). Here embeddings are an
``array<float>`` column computed by an iterator-style ``mapInPandas`` so a
real model initializes once per python worker; this container has no torch,
so the default encoder is a deterministic feature-hashing projection
(md5-bucketed bag-of-tokens, L2-normalized) — the Spark plumbing (schema,
batching, per-worker init, downstream cosine) is identical for a real model.

A fully-native Column variant (`hash_embedding_col`) exists for corpora
where even the stand-in must stay JVM-side.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType, StructField, StructType


def _hash_embed_py(text: str, dim: int) -> list[float]:
    vec = [0.0] * dim
    for tok in (text or "").split():
        h = hashlib.md5(tok.encode("utf-8")).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] % 2 == 0 else -1.0
        vec[idx] += sign
    norm = math.sqrt(sum(x * x for x in vec))
    if norm > 0:
        vec = [x / norm for x in vec]
    return [round(x, 6) for x in vec]


def embed_text(df: DataFrame, text_col: str = "text_norm", id_col: str = "url",
               dim: int = 32) -> DataFrame:
    """(id, embedding) via mapInPandas — iterator batching, one-time worker
    init point for a real encoder (the reference's GPU batch loop becomes
    ordinary partition parallelism)."""
    schema = StructType([
        StructField(id_col, StringType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real deployment: load SentenceTransformer HERE, once per worker
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "embedding": pdf[text_col].map(lambda t: _hash_embed_py(t, dim)),
            })

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def hash_embedding_col(text: Column, dim: int = 16) -> Column:
    """Fully-native hash embedding: per-bucket signed token counts,
    L2-normalized. Engine-portable (md5-based) and codegen-friendly —
    the zero-Python variant of the stand-in encoder.

    Every intermediate array is BOUND via single-element transform
    (hashing._bind idiom): the original per-dimension lambda closed over
    the unbound token-hash subtree, re-splitting + re-md5-ing the text
    once per output dimension (dim×), and the norm/branch structure
    re-evaluated the whole dim-loop 2-3× more. Identical output."""
    from .hashing import _bind

    toks = F.filter(F.split(F.coalesce(text, F.lit("")), r"\s+"),
                    lambda t: t != "")

    def _with_hashed(hashed: Column) -> Column:
        raw0 = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.aggregate(
                hashed, F.lit(0.0),
                lambda acc, h: acc + F.when(h.getField("idx") == i,
                                            h.getField("sgn"))
                                      .otherwise(F.lit(0.0)),
            ),
        )

        def _with_raw(raw: Column) -> Column:
            norm0 = F.sqrt(F.aggregate(F.transform(raw, lambda x: x * x),
                                       F.lit(0.0), lambda a, x: a + x))
            return _bind(norm0, lambda norm: F.when(
                norm > 0, F.transform(raw, lambda x: F.round(x / norm, 6))
            ).otherwise(raw))

        return _bind(raw0, _with_raw)

    hashed0 = F.transform(
        toks,
        lambda t: F.struct(
            F.pmod(F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
                   F.lit(dim)).cast("int").alias("idx"),
            F.when(
                F.pmod(F.conv(F.substring(F.md5(t), 9, 2), 16, 10).cast("long"),
                       F.lit(2)) == 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("sgn"),
        ),
    )
    return _bind(hashed0, _with_hashed)
