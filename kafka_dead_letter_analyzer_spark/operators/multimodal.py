"""Multimodal column support (north-star extension).

Design (SURVEY.md §7.6): image/audio/video payloads are opaque ``binary``
columns with a typed metadata struct alongside. All Spark-side plumbing —
schema, partition sizing, Arrow batch shape, UDF signatures — is real and
tested; the actual codec step is STUBBED (decode libraries are not in this
container) behind ``decoder=`` injection: the default deterministic fake
derives features from the bytes themselves, and ``strict_decoder`` raises
NotImplementedError to mark the integration point.

Scale notes:
- binary payloads ride in parquet; ``spark.sql.files.maxPartitionBytes``
  governs split sizing so a partition of blobs fits executor memory;
- feature extraction is ``mapInPandas`` (Arrow-batched, streaming batch
  iterator — never materializes a whole partition of blobs at once);
- decoded features are small fixed-width columns, so everything after the
  decode step is ordinary columnar work.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_COLUMNS = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decoder(payload: bytes | None) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: derives a tiny 'feature'
    from byte statistics. Replace with a real decode (PIL/torchaudio/...)
    via the ``decoder`` parameter in production."""
    if payload is None:
        return {"n_bytes": None, "feature": None}
    arr = memoryview(payload)
    n = len(arr)
    head = sum(arr[: min(64, n)]) / max(min(64, n), 1)
    tail = sum(arr[max(0, n - 64):]) / max(min(64, n), 1)
    return {"n_bytes": n, "feature": [float(n % 997), float(head), float(tail)]}


def strict_decoder(payload: bytes | None) -> dict[str, Any]:
    """The full-codec integration point — intentionally unimplemented here
    (no image/audio libraries in this container). For a REAL decoder that
    runs with zero dependencies, see :func:`header_decoder` — it proves
    the injection path end-to-end on genuine container bytes."""
    raise NotImplementedError(
        "real media decoding requires codec libraries (PIL/ffmpeg/torchaudio); "
        "inject a decoder via extract_media_features(decoder=...)"
    )


def header_decoder(payload: bytes | None) -> dict[str, Any]:
    """REAL pure-Python container-header decode — no codec libraries
    needed, so the ``decoder=`` injection point is exercised with genuine
    parsing (not the byte-statistics fake).

    - PNG: signature + IHDR chunk -> ``feature = [width, height,
      bit_depth]`` (PNG spec: 8-byte signature, IHDR is the first chunk;
      width/height big-endian u32 at offsets 16/20, depth at 24).
    - WAV: RIFF/WAVE + fmt chunk -> ``feature = [sample_rate, channels,
      duration_ms]`` (RIFF little-endian; chunks walked from offset 12).

    Anything else raises — this decoder is strict by design; feed it only
    payloads whose meta says png/wav, or wrap it for fallbacks."""
    if payload is None:
        return {"n_bytes": None, "feature": None}
    b = bytes(payload)
    n = len(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 26 or b[12:16] != b"IHDR":
            raise ValueError("malformed PNG: IHDR not first chunk")
        width = int.from_bytes(b[16:20], "big")
        height = int.from_bytes(b[20:24], "big")
        depth = b[24]
        return {"n_bytes": n, "feature": [float(width), float(height), float(depth)]}
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        pos = 12
        fmt = None
        data_size = None
        while pos + 8 <= n:
            cid = b[pos:pos + 4]
            size = int.from_bytes(b[pos + 4:pos + 8], "little")
            if cid == b"fmt ":
                fmt = b[pos + 8:pos + 8 + size]
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or len(fmt) < 16:
            raise ValueError("malformed WAV: no fmt chunk")
        channels = int.from_bytes(fmt[2:4], "little")
        sample_rate = int.from_bytes(fmt[4:8], "little")
        byte_rate = int.from_bytes(fmt[8:12], "little")
        duration_ms = (
            (data_size * 1000) // byte_rate
            if data_size is not None and byte_rate
            else None
        )
        return {
            "n_bytes": n,
            "feature": [
                float(sample_rate),
                float(channels),
                float(duration_ms) if duration_ms is not None else -1.0,
            ],
        }
    raise ValueError("unsupported container (expected PNG or WAV)")


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as an opaque
    payload so the multimodal plumbing is exercised on the driver tables."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[bytes | None], dict[str, Any]] = fake_decoder,
    batch_hash: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` consumes an *iterator* of pandas batches — constant
    memory per task regardless of partition size; the decoder runs once per
    payload inside the batch loop. Output is FEATURES_SCHEMA.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "payload_hash": [
                        hashlib.md5(p).hexdigest() if (batch_hash and p is not None) else None
                        for p in pdf["payload"]
                    ],
                    "feature": [f["feature"] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into per-frame
    stub rows (timestamp offsets) — the decode of each frame is the stubbed
    step. Demonstrates the explode-shaped plumbing a real sampler uses."""
    n_frames = (
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / F.lit(every_ms)
    ).cast("int")
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def fake_resizer(payload: bytes | None, width: int, height: int) -> bytes | None:
    """Deterministic resize stand-in: real implementation would decode,
    resample, and re-encode (PIL/ffmpeg). The fake keeps plumbing honest —
    output depends on payload AND target size, and is idempotent."""
    if payload is None:
        return None
    marker = f"resized:{width}x{height}:".encode()
    # strip any prior marker (whatever its dimensions) before re-marking
    body = payload.split(b":", 2)[2] if payload.startswith(b"resized:") else payload
    return marker + body[: max(width * height // 64, 1)]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes | None, int, int], bytes | None] = fake_resizer,
) -> DataFrame:
    """Arrow-batched resize over binary payloads (mapInPandas; constant
    memory per task). Output schema == MEDIA_COLUMNS with payload replaced
    and meta.width/height updated — downstream operators are unchanged.
    Inject a real codec via ``resizer`` in production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for m in pdf["meta"]:
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [resizer(p, width, height) for p in pdf["payload"]],
                    "meta": metas,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_COLUMNS)
