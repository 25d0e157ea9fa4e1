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


# ---------------------------------------------------------------------------
# Perceptual image hashing (r12 verdict #4): real PNG pixel decode ->
# grayscale block-mean grid -> dHash/aHash -> banded Hamming near-dup
# ---------------------------------------------------------------------------

GRID_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("grid", T.ArrayType(T.IntegerType()), True),
    ]
)


def png_encode_gray(pixels: list[int], width: int, height: int) -> bytes:
    """Minimal REAL PNG writer (8-bit grayscale, filter 0, one IDAT)
    — pure stdlib (struct + zlib), the encode leg of the
    zero-dependency codec pair whose decode leg is
    :func:`png_decode_pixels`.  Round-trip is pixel-exact, which is
    what lets the declared phash query run genuine container bytes
    through the hash gate."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError(
            f"png_encode_gray: {len(pixels)} pixels != "
            f"{width}x{height}"
        )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(pixels[y * width : (y + 1) * width])
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode_pixels(payload: bytes | None) -> tuple | None:
    """REAL pure-Python PNG pixel decode — no codec libraries: chunk
    walk, concatenated-IDAT zlib inflate, full scanline unfilter
    (all five filter types 0-4 incl. Paeth, PNG spec §9), integer
    luma for color.  Supports non-interlaced 8-bit grayscale (color
    type 0), RGB (2) and RGBA (6) — alpha ignored, luma =
    ``(299 R + 587 G + 114 B) // 1000`` (BT.601 integer weights, so
    the grayscale surface stays exactly reproducible).  Returns
    ``(width, height, [gray ints row-major])``; None payload -> None;
    anything unsupported raises (strict by design, the
    header_decoder contract)."""
    import struct
    import zlib

    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = b""
    while pos + 8 <= len(b):
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color}"
            f" interlace={interlace}); need 8-bit gray/RGB/RGBA,"
            " non-interlaced"
        )
    bpp = {0: 1, 2: 3, 6: 4}[color]
    stride = width * bpp
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("malformed PNG: bad decompressed length")
    out = bytearray(stride * height)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        )
        prev = out[(y - 1) * stride : y * stride] if y else bytes(stride)
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (
                    prev[i] if pb <= pc else c
                )
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
    if color == 0:
        gray = list(out)
    else:
        gray = [
            (299 * out[i] + 587 * out[i + 1] + 114 * out[i + 2]) // 1000
            for i in range(0, len(out), bpp)
        ]
    return width, height, gray


def gray_block_grid(
    gray: list[int], width: int, height: int, cols: int, rows: int
) -> list[int]:
    """Block-mean downsample of a row-major grayscale image to a
    ``rows x cols`` grid (row-major list) — integer floor means over
    the equal-split block ranges ``[r*h//rows, (r+1)*h//rows) x
    [c*w//cols, (c+1)*w//cols)``, so the grid (and every hash built
    on it) is exactly reproducible in any engine.  Empty blocks
    (image smaller than the grid) yield 0."""
    cells = []
    for r in range(rows):
        y0, y1 = r * height // rows, (r + 1) * height // rows
        for c in range(cols):
            x0, x1 = c * width // cols, (c + 1) * width // cols
            tot = n = 0
            for y in range(y0, y1):
                base = y * width
                for x in range(x0, x1):
                    tot += gray[base + x]
                    n += 1
            cells.append(tot // n if n else 0)
    return cells


def png_grid_decoder(cols: int = 9, rows: int = 8):
    """Decoder factory for :func:`image_gray_grid`: real PNG pixel
    decode (:func:`png_decode_pixels`) then the block-mean grid —
    the standard perceptual-hash preprocessing (grayscale + downsample
    to a tiny grid; dHash wants ``(cols, rows) = (9, 8)``, aHash
    ``(8, 8)``)."""

    def decode(payload: bytes | None) -> dict[str, Any]:
        if payload is None:
            return {"n_bytes": None, "grid": None}
        w, h, gray = png_decode_pixels(payload)
        return {
            "n_bytes": len(payload),
            "grid": gray_block_grid(gray, w, h, cols, rows),
        }

    return decode


def encode_gray_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    pixels_col: str = "pixels",
) -> DataFrame:
    """Encode per-row integer pixel arrays into REAL PNG payloads
    (MEDIA_COLUMNS frame) — Arrow-batched ``mapInPandas``, constant
    memory per task.  The bridge between relationally-synthesized
    pixels (a JVM ``transform(sequence(...))`` projection) and the
    binary-payload multimodal surface, so declared queries can push
    genuine container bytes through the codec path while an oracle
    reproduces the pixels directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": [
                        png_encode_gray(list(px), width, height)
                        if px is not None
                        else None
                        for px in pdf[pixels_col]
                    ],
                    "meta": [
                        {
                            "media_type": "image",
                            "format": "png",
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                        }
                    ]
                    * len(pdf),
                }
            )

    return df.mapInPandas(run, schema=MEDIA_COLUMNS)


def image_gray_grid(
    media: DataFrame,
    cols: int = 9,
    rows: int = 8,
    decoder: Callable[[bytes | None], dict[str, Any]] | None = None,
) -> DataFrame:
    """Arrow-batched grayscale-grid extraction over binary payloads:
    ``(media_id, n_bytes, grid array<int>)`` — the decode step of the
    perceptual-hash pipeline.  Default decoder is the REAL pure-zlib
    PNG pixel decode (:func:`png_grid_decoder`); inject a PIL/ffmpeg
    decoder in production for other formats.  Everything downstream
    of this map (hash assembly, banding, Hamming) is JVM-side
    columnar."""
    dec = decoder or png_grid_decoder(cols, rows)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "grid": [f["grid"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=GRID_SCHEMA)


def dhash64(grid_col: str, cols: int = 9, rows: int = 8) -> Column:
    """64-bit dHash from a ``rows x cols`` grid column (by NAME — the
    expression is a SQL string) — bit ``k`` (k = r*(cols-1)+c) set iff
    ``grid[r][c] < grid[r][c+1]`` (the horizontal-gradient sign;
    Krawetz's difference hash).  Pure JVM fold over a constant
    sequence — no UDF; the signed int64 carries bit 63 in two's
    complement (the simhash convention, so
    :func:`dedup.hash64_hamming_pairs` is shared as-is).  Requires
    ``(cols-1)*rows == 64``."""
    nbits = (cols - 1) * rows
    if nbits != 64:
        raise ValueError(
            f"dhash64: (cols-1)*rows must be 64, got {nbits}"
        )
    c1 = cols - 1
    idx = f"cast((k div {c1}) * {cols} + (k % {c1}) as int)"
    return F.expr(
        f"aggregate(sequence(0, 63), cast(0 as bigint),"
        f" (acc, k) -> acc + IF("
        f"element_at({grid_col}, {idx} + 1)"
        f" < element_at({grid_col}, {idx} + 2),"
        f" shiftleft(cast(1 as bigint), k), cast(0 as bigint)))"
    )


def ahash64(grid_col: str, n: int = 64) -> Column:
    """64-bit aHash from an ``n == 64``-cell grid column (by NAME) —
    bit ``k`` set iff ``grid[k] > floor(mean(grid))`` (strict
    comparison, floor mean: both integer-exact, so the hash is
    cross-engine-reproducible).  Pure JVM fold, signed int64 (the
    simhash convention)."""
    if n != 64:
        raise ValueError(f"ahash64: grid must have 64 cells, got {n}")
    mean = (
        f"(aggregate({grid_col}, cast(0 as bigint),"
        f" (a, x) -> a + cast(x as bigint)) div {n})"
    )
    return F.expr(
        f"aggregate(sequence(0, 63), cast(0 as bigint),"
        f" (acc, k) -> acc + IF("
        f"cast(element_at({grid_col}, k + 1) as bigint) > {mean},"
        f" shiftleft(cast(1 as bigint), k), cast(0 as bigint)))"
    )
