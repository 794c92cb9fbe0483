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


def sniff_media(blob: bytes | None) -> dict[str, Any]:
    """REAL, dependency-free media-container decoder (PNG/GIF/JPEG/WAV).

    Parses actual file headers — no PIL/librosa needed:

    - PNG: 8-byte magic then the IHDR chunk (width/height, big-endian,
      PNG spec §11.2.2);
    - GIF: GIF87a/GIF89a magic then the logical-screen descriptor
      (width/height, little-endian);
    - JPEG: SOI (FFD8) then the marker stream walked segment-by-segment
      (2-byte big-endian lengths, ITU-T T.81 §B.1) to the first frame
      header SOFn (C0-CF minus DHT/JPG/DAC), whose body carries
      height/width — covers baseline (SOF0) and progressive (SOF2)
      alike, the dominant formats in any web image corpus;
    - WAV: RIFF/WAVE container walked chunk-by-chunk for ``fmt `` (audio
      format, channels, sample rate, bits/sample) and ``data`` (payload
      size); duration_ms = data_bytes * 1000 // byte_rate.

    Unknown or truncated containers return ok=False rather than raising, so
    a 100 TB scan over a dirty media lake degrades to a filterable flag
    instead of a dead executor. This is the default ``decode_fn`` of
    :func:`decode_media_meta`; pass a richer decoder (PIL/av) with the same
    return contract to extend it.
    """
    import struct

    meta: dict[str, Any] = {
        "ok": False,
        "media_type": None,
        "format": None,
        "width": None,
        "height": None,
        "sample_rate": None,
        "duration_ms": None,
        "n_bytes": 0 if blob is None else len(blob),
    }
    if blob is None:
        return meta
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 24 and blob[12:16] == b"IHDR":
            w, h = struct.unpack(">II", blob[16:24])
            meta.update(ok=True, media_type="image", format="png", width=w, height=h)
        elif blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
            w, h = struct.unpack("<HH", blob[6:10])
            meta.update(ok=True, media_type="image", format="gif", width=w, height=h)
        elif blob[:2] == b"\xff\xd8":
            off, w, h = 2, None, None
            while off + 4 <= len(blob):
                if blob[off] != 0xFF:
                    break  # junk where a marker must sit -> truncated/dirty
                marker = blob[off + 1]
                if marker == 0xFF:  # fill byte before a marker (T.81 §B.1.1.2)
                    off += 1
                    continue
                if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                    off += 2  # standalone markers: TEM/SOI/RSTn carry no segment
                    continue
                if marker in (0xD9, 0xDA):
                    break  # EOI, or scan data before any SOF -> no dimensions
                (size,) = struct.unpack(">H", blob[off + 2 : off + 4])
                if size < 2:
                    break
                # SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) = frame headers:
                # [precision u8][height u16][width u16][components u8]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    body = blob[off + 4 : off + 2 + size]
                    if len(body) >= 5:
                        h, w = struct.unpack(">HH", body[1:5])
                    break
                off += 2 + size
            if w and h:
                meta.update(
                    ok=True, media_type="image", format="jpeg", width=w, height=h
                )
        elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            off, sr, byte_rate, data_size = 12, None, None, None
            while off + 8 <= len(blob):
                cid = blob[off : off + 4]
                (size,) = struct.unpack("<I", blob[off + 4 : off + 8])
                body = blob[off + 8 : off + 8 + size]
                if cid == b"fmt " and size >= 16:
                    _, _, sr, byte_rate, _, _ = struct.unpack("<HHIIHH", body[:16])
                elif cid == b"data":
                    data_size = size
                off += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
            if sr and byte_rate and data_size is not None:
                meta.update(
                    ok=True,
                    media_type="audio",
                    format="wav",
                    sample_rate=sr,
                    duration_ms=data_size * 1000 // byte_rate,
                )
    except (struct.error, IndexError):
        pass  # truncated container -> ok stays False
    return meta


def wav_pcm_samples(blob: bytes | None):
    """RIFF/WAVE chunk walk -> (sample_rate, 8-bit PCM payload bytes), or
    None for anything that is not a mono 8-bit PCM WAV. Same degradation
    contract as :func:`sniff_media` (dirty blob -> None, never raises)."""
    import struct

    try:
        if blob is None or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            return None
        off, sr, bits, channels, data = 12, None, None, None, None
        while off + 8 <= len(blob):
            cid = blob[off : off + 4]
            (size,) = struct.unpack("<I", blob[off + 4 : off + 8])
            body = blob[off + 8 : off + 8 + size]
            if cid == b"fmt " and size >= 16:
                _, channels, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            off += 8 + size + (size & 1)
        if sr is None or data is None or bits != 8 or channels != 1:
            return None
        return sr, data
    except (struct.error, IndexError):
        return None


PCM_STATS_SCHEMA = (
    "media_id long, ok boolean, sample_rate int, n_samples long, "
    "peak int, sum_sq long"
)


def wav_pcm_stats(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction: decode each WAV's PCM data chunk and
    compute integer-exact waveform features (sample count, peak amplitude,
    sum of squared amplitudes — the building blocks of RMS/loudness
    filters a training-data pipeline gates audio on).

    8-bit WAV PCM is UNSIGNED with silence at 0x80 (WAV spec), so
    amplitude is ``x - 128``: a silent clip scores peak=0 / sum_sq=0
    instead of a spurious maximal "energy", which is what a loudness gate
    or VAD-style silence trim needs.

    Arrow-batched ``mapInPandas``; vectorized numpy per blob; integer
    outputs so results are exact at any scale (no float fold order). Blobs
    stay executor-local; non-WAV/undecodable rows degrade to ok=false.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, srs, ns, peaks, sumsqs = [], [], [], [], []
            for blob in pdf["blob"]:
                dec = wav_pcm_samples(blob)
                if dec is None:
                    oks.append(False)
                    srs.append(None)
                    ns.append(None)
                    peaks.append(None)
                    sumsqs.append(None)
                else:
                    sr, data = dec
                    amp = (
                        np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                        - 128
                    )
                    oks.append(True)
                    srs.append(sr)
                    ns.append(len(amp))
                    peaks.append(int(np.abs(amp).max()) if len(amp) else 0)
                    sumsqs.append(int((amp * amp).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "ok": oks,
                    "sample_rate": pd.array(srs, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "peak": pd.array(peaks, dtype="Int32"),
                    "sum_sq": pd.array(sumsqs, dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema=PCM_STATS_SCHEMA)


PCM_FRAME_SCHEMA = (
    "media_id long, frame_idx int, n_samples int, frame_sum_sq long"
)


def wav_pcm_frames(
    df: DataFrame, frame_samples: int = 256, max_frames: int = 8
) -> DataFrame:
    """Frame-level audio energy: split each WAV's PCM payload into fixed
    windows of ``frame_samples`` and emit per-frame sum of squared
    amplitudes (unsigned 8-bit PCM, silence at 0x80, so amplitude is
    ``x - 128`` — see :func:`wav_pcm_stats`) — the
    primitive behind VAD-ish silence trimming and loudness gating in an
    audio curation pipeline. One output row per frame (capped at
    ``max_frames`` per blob to bound fan-out); undecodable blobs emit no
    rows (filterable upstream via :func:`wav_pcm_stats`'s ok flag).

    Integer-exact (no float fold order), Arrow-batched, zero shuffle:
    the explode happens inside ``mapInPandas``, so media bytes never
    leave the executor.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, sums = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                dec = wav_pcm_samples(blob)
                if dec is None:
                    continue
                _, data = dec
                # unsigned 8-bit PCM, silence at 0x80 -> amplitude = x - 128
                x = (
                    np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
                )
                n_frames = min(max_frames, max(1, -(-len(x) // frame_samples)))
                for f in range(n_frames):
                    seg = x[f * frame_samples : (f + 1) * frame_samples]
                    ids.append(mid)
                    idxs.append(f)
                    ns.append(len(seg))
                    sums.append(int((seg * seg).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int32"),
                    "frame_sum_sq": pd.array(sums, dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema=PCM_FRAME_SCHEMA)


DECODE_META_SCHEMA = (
    "media_id long, ok boolean, media_type string, format string, "
    "width int, height int, sample_rate int, duration_ms long, n_bytes long"
)


def decode_media_meta(
    df: DataFrame,
    decode_fn: Callable[[bytes], dict[str, Any]] | None = None,
) -> DataFrame:
    """Blob -> real container metadata via Arrow-batched mapInPandas.

    Default codec is :func:`sniff_media` (real PNG/GIF/WAV header parsing,
    zero native deps). Same scale shape as :func:`decode_media`: stateless
    per-batch compute, metadata out, blobs never shuffled.
    """
    fn = decode_fn or sniff_media
    cols = [
        "ok",
        "media_type",
        "format",
        "width",
        "height",
        "sample_rate",
        "duration_ms",
        "n_bytes",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(b) for b in pdf["blob"]]
            out = {"media_id": pdf["media_id"].to_numpy()}
            out.update({c: [f.get(c) for f in feats] for c in cols})
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=DECODE_META_SCHEMA)


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


def png_decode_pixels(blob: bytes):
    """Full PNG pixel decode, dependency-free (zlib + numpy).

    Supports the filter suite of the PNG spec (None/Sub/Up/Average/Paeth,
    §9) for 8-bit grayscale (color type 0) and 8-bit RGB (color type 2),
    non-interlaced — the formats a data pipeline's thumbnail path actually
    produces. Returns (height, width, channels) uint8 ndarray, or None for
    anything it cannot decode (caller degrades to ok=False, never raises
    on dirty data).
    """
    import struct
    import zlib

    import numpy as np

    try:
        if blob[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        off, ihdr, idat = 8, None, b""
        while off + 8 <= len(blob):
            (length,) = struct.unpack(">I", blob[off : off + 4])
            typ = blob[off + 4 : off + 8]
            body = blob[off + 8 : off + 8 + length]
            if typ == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            off += 12 + length  # len + type + crc
        if ihdr is None or not idat:
            return None
        w, h, bit_depth, color_type, _, _, interlace = ihdr
        if bit_depth != 8 or interlace != 0 or color_type not in (0, 2):
            return None
        ch = 1 if color_type == 0 else 3
        raw = zlib.decompress(idat)
        stride = w * ch
        if len(raw) != h * (stride + 1):
            return None
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for r in range(h):
            row = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
            ).copy()
            ftype = raw[r * (stride + 1)]
            if ftype == 1:  # Sub — vectorized: recon(x) = sum of raw deltas
                # at x, x-ch, x-2ch, ... i.e. a per-channel cumsum mod 256
                row = (
                    np.cumsum(row.reshape(w, ch).astype(np.int64), axis=0) % 256
                ).astype(np.uint8).reshape(stride)
            elif ftype == 2:  # Up
                row = (row.astype(np.int16) + prev).astype(np.uint8)
            elif ftype == 3:  # Average — left-dependency is sequential;
                # plain-int list arithmetic beats numpy scalar indexing ~7x
                r_, p_ = row.tolist(), prev.tolist()
                for i in range(ch):
                    r_[i] = (r_[i] + p_[i] // 2) & 0xFF
                for i in range(ch, stride):
                    r_[i] = (r_[i] + (r_[i - ch] + p_[i]) // 2) & 0xFF
                row = np.array(r_, dtype=np.uint8)
            elif ftype == 4:  # Paeth — same sequential scan, list ints
                r_, p_ = row.tolist(), prev.tolist()
                for i in range(ch):
                    # a = c = 0 => predictor is always b (spec tie rules)
                    r_[i] = (r_[i] + p_[i]) & 0xFF
                for i in range(ch, stride):
                    a, b, c = r_[i - ch], p_[i], p_[i - ch]
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    r_[i] = (r_[i] + pred) & 0xFF
                row = np.array(r_, dtype=np.uint8)
            elif ftype != 0:
                return None
            out[r] = row
            prev = out[r]
        return out.reshape(h, w, ch)
    except Exception:
        return None


def png_encode_pixels(arr) -> bytes:
    """(h, w, ch) uint8 ndarray -> spec-complete PNG bytes (filter 0 rows,
    single zlib IDAT, CRC32s). Grayscale (ch=1) or RGB (ch=3)."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    color_type = 0 if ch == 1 else 2
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


RESIZE_RESULT_SCHEMA = "media_id long, ok boolean, blob binary"


def resize_png(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: PNG decode -> nearest-neighbor resample ->
    PNG re-encode, all dependency-free, via Arrow-batched mapInPandas.

    Same failure contract as the decode family: undecodable/unsupported
    blobs yield (ok=false, blob=null) instead of killing the task. The
    per-blob work is embarrassingly parallel and stateless; blobs stay
    executor-local (no shuffle of media bytes). A production deployment
    can swap a faster codec by replacing the inner function — the
    operator shape (schema, batching, degradation) is the contract.

    Cost model (measured, 256x256 RGB, one core — see SCALE.md §24):
    decode throughput depends on the PNG's row filters. None ~1200
    blobs/sec, Up ~520 (vectorized), Sub ~170 (per-channel cumsum),
    Average ~27 and Paeth ~15 (sequential left-dependency; plain-int
    scan). Filter-0/Sub/Up covers everything this repo *encodes*;
    foreign PNGs from real encoders are mostly Paeth rows, so size a
    real media scan at ~15 blobs/sec/core or swap in PIL/opencv via the
    decode path — the Spark plumbing is unchanged either way.
    """
    import numpy as np

    def one(blob):
        px = png_decode_pixels(blob) if blob is not None else None
        if px is None:
            return None
        h0, w0, _ = px.shape
        rows = np.minimum((np.arange(height) * h0) // height, h0 - 1)
        cols = np.minimum((np.arange(width) * w0) // width, w0 - 1)
        return png_encode_pixels(px[rows][:, cols])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [one(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "ok": [b is not None for b in out],
                    "blob": out,
                }
            )

    return df.mapInPandas(run, schema=RESIZE_RESULT_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Kept for back-compat with the r1-r5 stub contract; the real
    implementation is :func:`resize_png` (dependency-free PNG decode /
    nearest-neighbor / re-encode). This alias now delegates to it."""
    return resize_png(df, width, height)


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
