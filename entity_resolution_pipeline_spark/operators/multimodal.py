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
* ``decode_ppm`` / ``decode_wav`` (bottom of this module) are REAL
  decoders for binary PPM (P6) images and PCM WAV audio — genuine
  formats that need no codec library — so the decode stage is stub-free
  for those (battery ``media_ppm_decode`` / ``media_wav_decode`` verify
  assembled-bytes → parsed values against closed-form oracles).

``mapInPandas`` is used (iterator of pandas DataFrames) so a real decoder
would initialize its model/codec once per python worker, not per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
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
    ``dim`` buckets. NOT a real decoder — exists to exercise batch shape.

    Raw IEEE division (no rounding): count/len is correctly rounded in
    every engine, so an external SQL oracle reproduces the doubles
    bit-for-bit (DuckDB check in battery ``media_decode``)."""
    if not payload:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    n = float(len(payload))
    return [c / n for c in counts]


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


RESIZED_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
    StructField("payload", BinaryType(), False),
])


def resize_media(media: DataFrame, width: int = 16, height: int = 16,
                 fake: bool = False) -> DataFrame:
    """Image resize plumbing: payload → fixed-(width×height) payload.

    Real deployment: PIL/opencv decode-resize-encode inside the iterator
    (init once per worker). STUB here — ``fake=True`` center-crops/zero-pads
    the raw bytes to width×height so batch shape, schema, and output sizing
    are exercised deterministically.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "call with fake=True for the deterministic stand-in")
    target = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pay = pdf["payload"].map(
                lambda p: (p or b"")[:target].ljust(target, b"\0"))
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "width": width, "height": height, "payload": pay,
            })

    return media.select("media_id", "kind", "payload") \
        .mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("frame", BinaryType(), False),
])


def sample_frames(media: DataFrame, frame_bytes: int = 256, every_n: int = 2,
                  max_frames: int = 4, fake: bool = False) -> DataFrame:
    """Video frame sampling plumbing: payload → one row per sampled frame
    (the 1→N mapInPandas shape a real ffmpeg/pyav sampler uses).

    STUB: ``fake=True`` treats consecutive ``frame_bytes`` chunks as
    "frames" and emits every ``every_n``-th, at most ``max_frames`` — fully
    deterministic, so the distributed row-expansion is oracle-checkable
    (battery `media_frames` reproduces it with SQL substring arithmetic).
    """
    if not fake:
        raise NotImplementedError(
            "video codecs are not available in this environment; "
            "call with fake=True for the deterministic stand-in")

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p or b""
                n_chunks = (len(p) + frame_bytes - 1) // frame_bytes
                emitted = 0
                for c in range(0, n_chunks, every_n):
                    if emitted >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(c)
                    frames.append(p[c * frame_bytes:(c + 1) * frame_bytes])
                    emitted += 1
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.where(F.col("kind") == "video") \
        .select("media_id", "payload") \
        .mapInPandas(frame_batches, schema=FRAMES_SCHEMA)


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


# =========================================================================
# REAL decode path: binary PPM (P6) — an actual image format that needs no
# codec library, so the "decode" stage stops being a stub for this format.
# JPEG/PNG/audio/video remain env-bound stubs above.
# =========================================================================

PPM_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
    StructField("n_pixels", LongType(), False),
    StructField("sum_r", LongType(), False),
    StructField("sum_g", LongType(), False),
    StructField("sum_b", LongType(), False),
])


def ppm_payload_col(seed, width: int, height: int):
    """Native construction of a valid binary P6 PPM image: header +
    deterministic RGB raster derived from ``seed`` (r=(seed+p)%256,
    g=(seed*3+p*5)%256, b=(p*7)%256 for pixel index p). Bytes are built
    as a transform-generated hex string folded through ``unhex`` — all
    JVM-side, so synthesizing test images at any scale is a zero-shuffle
    projection."""
    n = width * height
    header = F.encode(F.lit(f"P6\n{width} {height}\n255\n"), "utf-8")

    def _h2(x):  # one channel byte as 2 hex chars
        return F.lpad(F.hex(x), 2, "0")

    px = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda p: F.concat(
            _h2((seed + p) % 256),
            _h2((seed * 3 + p * 5) % 256),
            _h2((p * 7) % 256),
        ),
    )
    return F.concat(header, F.unhex(F.concat_ws("", px)))


def _parse_ppm(p: bytes):
    """Real P6 parser: magic, whitespace/`#`-comment-tolerant header
    (width, height, maxval), single whitespace, then the raw RGB raster.
    Returns (width, height, raster ndarray) or None for junk input."""
    import numpy as np

    if not p or not bytes(p).startswith(b"P6"):
        return None
    p = bytes(p)
    i, vals = 2, []
    while len(vals) < 3 and i < len(p):
        while i < len(p) and p[i:i + 1].isspace():
            i += 1
        if p[i:i + 1] == b"#":               # comment to end-of-line
            while i < len(p) and p[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(p) and not p[j:j + 1].isspace():
            j += 1
        if j == i:
            return None
        vals.append(int(p[i:j]))
        i = j
    if len(vals) < 3:
        return None
    i += 1                                    # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255 or len(p) - i < w * h * 3:
        return None
    raster = np.frombuffer(p, dtype=np.uint8, offset=i,
                           count=w * h * 3).reshape(h, w, 3)
    return w, h, raster


def decode_ppm(images: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """REAL image decode over mapInPandas: parse each P6 payload and emit
    exact integer channel sums (hash-stable across engines; means are
    sums/n_pixels downstream). numpy is imported once per worker via the
    iterator pattern; unparseable payloads are dropped (curation
    semantics: junk media doesn't poison the batch)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: F401 — one import per python worker

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "n_pixels",
                                   "sum_r", "sum_g", "sum_b")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_ppm(p)
                if parsed is None:
                    continue
                w, h, raster = parsed
                s = raster.sum(axis=(0, 1), dtype="int64")
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return images.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=PPM_DECODE_SCHEMA)


# =========================================================================
# REAL audio decode: canonical PCM WAV (RIFF) — like PPM, a real container
# format that needs no codec library. 16-bit mono PCM is parsed with a
# proper chunk walk (word-aligned), so the audio decode stage is stub-free
# for this format too.
# =========================================================================

WAV_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("n_channels", LongType(), False),
    StructField("sample_rate", LongType(), False),
    StructField("n_samples", LongType(), False),
    StructField("sum_amp", LongType(), False),
    StructField("min_amp", LongType(), False),
    StructField("max_amp", LongType(), False),
])


def wav_payload_col(seed, n_samples: int, sample_rate: int = 8000):
    """Native construction of a valid 16-bit mono PCM WAV: constant
    RIFF/fmt/data header (literal hex — sizes are fixed per query shape)
    + per-row raw little-endian u16 words u_i = (seed*31 + i*17) % 65536
    (decoded int16 value = two's-complement image of u_i), assembled via
    a hex transform folded through ``unhex``. Zero-shuffle projection,
    same stance as ``ppm_payload_col``."""
    data_size = n_samples * 2
    riff_size = 36 + data_size

    def le(v: int, nbytes: int) -> str:
        return v.to_bytes(nbytes, "little").hex()

    header_hex = (
        b"RIFF".hex() + le(riff_size, 4) + b"WAVE".hex()
        + b"fmt ".hex() + le(16, 4)       # fmt chunk size
        + le(1, 2)                         # PCM
        + le(1, 2)                         # mono
        + le(sample_rate, 4)
        + le(sample_rate * 2, 4)           # byte rate
        + le(2, 2)                         # block align
        + le(16, 2)                        # bits per sample
        + b"data".hex() + le(data_size, 4)
    )

    def _h2(x):
        return F.lpad(F.hex(x), 2, "0")

    samples = F.transform(
        F.sequence(F.lit(0), F.lit(n_samples - 1)),
        # unsigned 16-bit two's-complement image of the signed sample,
        # little-endian: low byte then high byte
        lambda i: F.concat(
            _h2((seed * 31 + i * 17) % 65536 % 256),
            _h2(F.floor(((seed * 31 + i * 17) % 65536) / 256).cast("long")),
        ),
    )
    return F.unhex(F.concat(F.lit(header_hex.upper()),
                            F.concat_ws("", samples)))


def _parse_wav(p):
    """Real RIFF/WAVE parser: validates the RIFF header, walks chunks with
    word alignment, requires PCM 16-bit, returns (n_channels, sample_rate,
    samples ndarray) or None for junk."""
    import numpy as np

    if p is None:
        return None
    p = bytes(p)
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = int.from_bytes(p[i + 4:i + 8], "little")
        body = p[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)          # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16 or n_ch < 1:
        return None
    samples = np.frombuffer(data[:len(data) - (len(data) % 2)], dtype="<i2")
    return n_ch, rate, samples


def decode_wav(audio: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """REAL audio decode over mapInPandas: parse PCM WAV payloads and emit
    exact integer amplitude stats (sum/min/max — hash-stable; RMS etc.
    derive downstream). Junk payloads are dropped, not poisoned."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_channels", "sample_rate",
                                   "n_samples", "sum_amp", "min_amp",
                                   "max_amp")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_wav(p)
                if parsed is None or len(parsed[2]) == 0:
                    continue
                n_ch, rate, samples = parsed
                out["doc_id"].append(int(did))
                out["n_channels"].append(n_ch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["sum_amp"].append(int(samples.sum(dtype="int64")))
                out["min_amp"].append(int(samples.min()))
                out["max_amp"].append(int(samples.max()))
            yield pd.DataFrame(out)

    return audio.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=WAV_DECODE_SCHEMA)


def resize_ppm(images: DataFrame, out_w: int, out_h: int,
               id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """REAL image resize: parse each P6 payload with the real decoder,
    nearest-neighbor resample the raster to (out_w × out_h) in numpy
    (output pixel (x,y) reads source pixel (floor(x·W/out_w),
    floor(y·H/out_h))), and emit the resized dimensions + exact integer
    channel sums — so an external oracle can verify the resample
    arithmetic itself from the source-pixel closed form. Replaces the
    byte-crop stand-in of ``resize_media`` for the PPM format."""
    import numpy as np

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height",
                                   "sum_r", "sum_g", "sum_b")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_ppm(p)
                if parsed is None:
                    continue
                w, h, raster = parsed
                xs = (np.arange(out_w) * w) // out_w
                ys = (np.arange(out_h) * h) // out_h
                resized = raster[np.ix_(ys, xs)]
                s = resized.sum(axis=(0, 1), dtype="int64")
                out["doc_id"].append(int(did))
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
    ])
    return images.select(id_col, payload_col).mapInPandas(
        resize_batches, schema=schema)
