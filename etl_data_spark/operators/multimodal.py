"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` operators, partitioning advice — while the actual media
decoding is stubbed (image/audio libraries are not in this container):
``decode_fn=None`` uses a deterministic fake decoder so the pipeline shape
(batch sizes, schema evolution, null handling) is exercised end-to-end.
Swap in a real decoder (PIL/librosa/av) by passing ``decode_fn``.

Design for 100 TB of media:
- blobs travel as parquet ``binary`` columns next to their metadata struct
  (width/height/sample_rate/...) so filters on metadata prune row groups
  WITHOUT touching blob bytes (parquet column pruning);
- all per-blob compute is ``mapInPandas`` (Arrow batches, vectorizable,
  no per-row serde) and stateless, so it scales linearly with executors;
- frame sampling / chunking EXPLODES one blob row into many small rows —
  repartition after, not before, so the shuffle moves features, not media.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)


def _fake_decode(blob: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a media decoder.

    Derives pseudo-features from the blob bytes so tests get stable,
    content-dependent values. A real deployment replaces this with PIL /
    librosa / av decoding — the operator contract is unchanged.
    """
    if blob is None:
        return {"ok": False, "n_bytes": 0, "checksum": None}
    return {
        "ok": True,
        "n_bytes": len(blob),
        "checksum": sum(blob) % 2**31,
    }


DECODE_RESULT_SCHEMA = "media_id long, ok boolean, n_bytes long, checksum long"


def decode_media(
    df: DataFrame,
    decode_fn: Callable[[bytes], dict[str, Any]] | None = None,
) -> DataFrame:
    """Decode blobs to per-media features via Arrow-batched mapInPandas."""
    fn = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["blob"].map(fn)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ok": feats.map(lambda d: d["ok"]),
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "checksum": feats.map(lambda d: d["checksum"]),
                }
            )

    return df.mapInPandas(run, schema=DECODE_RESULT_SCHEMA)


EMBED_RESULT_SCHEMA = "media_id long, embedding array<float>"


def extract_embedding(
    df: DataFrame,
    dim: int = 16,
    embed_fn: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Blob -> feature vector. Stub derives a deterministic vector from byte
    histogram moments; a real model replaces ``embed_fn``."""

    def fake_embed(blob: bytes) -> list[float]:
        if not blob:
            return [0.0] * dim
        return [float(blob[i % len(blob)]) / 255.0 for i in range(dim)]

    fn = embed_fn or fake_embed

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "embedding": pdf["blob"].map(fn),
                }
            )

    return df.mapInPandas(run, schema=EMBED_RESULT_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame/chunk sampling: one blob row -> up to max_frames chunk rows.

    Stub treats the blob as a byte stream and cuts fixed-size "frames" —
    the real version would seek keyframes via av. Emits small rows; callers
    should repartition AFTER this explode.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    start = i * every_n_bytes
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(bytes(blob[start : start + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Marked stub: real image resize needs PIL, absent in this container.

    Raises NotImplementedError when invoked with real decoding intent; the
    metadata-only shape transform (update meta.width/height) is provided so
    downstream schema contracts can be tested.
    """
    raise NotImplementedError(
        "image resize requires an image library (PIL/opencv) not present in "
        "this environment; use decode_media/extract_embedding with a custom "
        "decode_fn, or patch meta via with_meta_resized()"
    )


def with_meta_resized(df: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only resize projection (the schema half of resize_stub)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type").alias("media_type"),
            F.col("meta.format").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )
