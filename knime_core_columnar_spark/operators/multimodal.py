"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs — the Spark rendering of the reference's
VarBinary-with-pluggable-serializer pattern
(VarBinaryData.java:69-123: setBytes/setObject(ObjectSerializer)/
getObject(ObjectDeserializer)).

Real decode libs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: ``strict=True`` raises NotImplementedError at
the exact point a real decoder would plug in; ``strict=False`` produces a
deterministic fake decode derived from the bytes, so the Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partitioning — is real
and fully tested. Swapping in a real decoder changes only the marked
inner function.

Everything runs through mapInPandas (Arrow-batched, partition-parallel,
never a driver collect)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried next to every payload column (the typed
#: companion of the opaque binary — FIXTURES.md F8 payload_meta pattern).
PAYLOAD_META_TYPE = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

IMAGE_FEATURES_TYPE = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_byte", T.DoubleType()),
    T.StructField("n_bytes", T.LongType()),
])


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Derive a binary payload column from a string column (test fixture
    for binary-column plumbing: UTF-8 bytes + metadata struct)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(payload).alias("width"),
        F.lit(1).alias("height"),
    )
    return df.withColumn("payload", payload).withColumn("payload_meta", meta)


def payload_stats(payload: Column) -> dict[str, Column]:
    """JVM-side stats over binary payloads (no decode needed):
    size, content hash, magic-byte prefix."""
    return {
        "n_bytes": F.octet_length(payload).cast("long"),
        "content_sha256": F.sha2(payload, 256),
        "magic_hex": F.hex(F.substring(payload, 1, 4)),
    }


def _fake_decode_image(data: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: dimensions and mean derived from the
    raw bytes. REPLACE with PIL.Image.open(io.BytesIO(data)) when an
    imaging lib is available."""
    n = len(data)
    width = (n % 64) + 1
    height = (n // 64) % 64 + 1
    mean = (sum(data[:256]) / min(n, 256)) if n else 0.0
    return width, height, float(mean)


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Image decode + feature extraction over Arrow batches.

    mapInPandas keeps batches columnar end-to-end (Arrow transfer, no
    per-row Python). Partition-parallel: N executors × batches, no
    driver involvement. ``strict=True`` raises where a real decoder
    belongs."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires an imaging library (PIL/cv2) "
                    "not present in this environment; plug it into "
                    "_fake_decode_image"
                )
            out = {"doc_id": [], "width": [], "height": [], "mean_byte": [], "n_bytes": []}
            for i, data in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(data) if data is not None else b""
                w, h, m = _fake_decode_image(raw)
                out["doc_id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_byte"].append(m)
                out["n_bytes"].append(len(raw))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_FEATURES_TYPE)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 1024,
    strict: bool = False,
) -> DataFrame:
    """Video-frame-sampling stand-in: emits one row per sampled 'frame'
    (byte offset). A real implementation decodes with ffmpeg per batch;
    the plumbing (1→N row expansion through mapInPandas) is identical.

    The per-frame checksum is md5 over the chunk's UPPERCASE-HEX
    encoding — byte-deterministic, and expressible in engines whose SQL
    cannot slice blobs (DuckDB: substring(hex(payload), off*2+1, n*2)),
    which keeps this operator inside the value-exact oracle gate."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import binascii
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError("frame sampling requires ffmpeg")
            rows = {"doc_id": [], "frame_idx": [], "byte_offset": [], "frame_md5": []}
            for i, data in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(data) if data is not None else b""
                for fi, off in enumerate(range(0, max(len(raw), 1), every_n_bytes)):
                    chunk = raw[off : off + every_n_bytes]
                    chunk_hex = binascii.hexlify(chunk).decode().upper()
                    rows["doc_id"].append(i)
                    rows["frame_idx"].append(fi)
                    rows["byte_offset"].append(off)
                    rows["frame_md5"].append(hashlib.md5(chunk_hex.encode()).hexdigest())
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(sample, schema)


AUDIO_FEATURES_TYPE = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("mean_amp", T.DoubleType()),
    T.StructField("peak_amp", T.IntegerType()),
])


def _fake_decode_audio(data: bytes, sample_rate: int = 16_000):
    """Deterministic fake audio decode: the payload is treated as int16
    PCM (n_bytes // 2 samples @ ``sample_rate``); amplitude stats come
    from the first 256 raw bytes. REPLACE with soundfile/librosa when an
    audio library is available."""
    n = len(data)
    n_samples = n // 2
    # NO Python round() here: Python rounds half-to-even while the SQL
    # engines round half-away — final rounding happens in Catalyst
    duration = n_samples / float(sample_rate)
    head = data[:256]
    # empty payload → NULL amplitude stats, matching SQL semantics
    # (SUM/MAX over zero rows is NULL, and NULL/0 is NULL — not 0)
    mean_amp = (sum(head) / len(head)) if head else None
    peak_amp = max(head) if head else None
    return n_samples, duration, mean_amp, peak_amp


def decode_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_rate: int = 16_000,
    strict: bool = False,
) -> DataFrame:
    """Audio decode + waveform stats over Arrow batches — the audio tier
    of the multimodal family, same mapInPandas shape as
    ``decode_image_features`` (columnar transfer, partition-parallel,
    no driver involvement). ``strict=True`` raises where a real decoder
    (soundfile/librosa/ffmpeg) belongs; the deterministic fake keeps
    the plumbing value-checkable end-to-end."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "audio decode requires an audio library (soundfile/"
                    "librosa) not present in this environment; plug it "
                    "into _fake_decode_audio"
                )
            out = {"doc_id": [], "n_samples": [], "duration_s": [],
                   "mean_amp": [], "peak_amp": []}
            for i, data in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(data) if data is not None else b""
                ns, dur, mean_amp, peak = _fake_decode_audio(raw, sample_rate)
                out["doc_id"].append(i)
                out["n_samples"].append(ns)
                out["duration_s"].append(dur)
                out["mean_amp"].append(mean_amp)
                out["peak_amp"].append(peak)
            yield pd.DataFrame(out)

    raw = df.select(id_col, payload_col).mapInPandas(decode, AUDIO_FEATURES_TYPE)
    return raw.select(
        id_col,
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("mean_amp", 6).alias("mean_amp"),
        "peak_amp",
    )
