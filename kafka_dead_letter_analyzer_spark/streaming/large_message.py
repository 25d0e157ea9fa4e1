"""Large-message claim-check pattern (reference: bakdata large-message-serde,
build.gradle.kts:40,53, README.md:50 — oversized Kafka values are written to
blob storage and the record carries a reference).

SURVEY.md §7.5 scoped the serde itself out (it is a Kafka-client encoding
concern); this module provides the equivalent ENGINE capability so the
pattern round-trips through Spark pipelines:

- ``claim_check_writes``: values larger than ``threshold`` bytes are
  written to the blob store (one object per value, content-addressed by
  sha256 — idempotent across retries, exactly what at-least-once sinks
  need) and replaced by a ``claim-check:<uri>`` marker; small values pass
  through inline. ``mapInPandas`` keeps it Arrow-batched and
  constant-memory per task; each executor writes its own partition's blobs
  (no driver funnel).
- ``claim_check_reads``: resolve markers back to payloads.

``blob_dir`` is any pathlib-mountable store (POSIX path here; at scale a
FUSE-mounted or object-store path — the content-addressed layout needs no
listing or coordination).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARKER = "claim-check:"

# bakdata kafka-large-message-serde byte-flag wire protocol (public repo
# github.com/bakdata/kafka-large-message-serde, ByteFlagLargeMessagePayloadProtocol):
# serialized value = 1 flag byte + payload. 0x00 -> the remaining bytes ARE
# the record value; 0x01 -> the remaining bytes are the UTF-8 URI of the
# blob-store object holding the value.
FLAG_NOT_BACKED = 0x00
FLAG_BACKED = 0x01


def claim_check_writes(
    df: DataFrame,
    value_col: str = "value",
    threshold: int = 1024 * 1024,
    blob_dir: str = "/tmp/claim-checks",
) -> DataFrame:
    """Replace oversized string values with ``claim-check:<uri>`` markers,
    writing payloads to ``blob_dir`` (content-addressed, idempotent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(blob_dir, exist_ok=True)
        for pdf in batches:
            out = []
            for v in pdf[value_col]:
                if v is None or len(v.encode("utf-8")) <= threshold:
                    out.append(v)
                    continue
                payload = v.encode("utf-8")
                digest = hashlib.sha256(payload).hexdigest()
                path = os.path.join(blob_dir, f"{digest}.blob")
                if not os.path.exists(path):  # content-addressed: idempotent
                    tmp = f"{path}.tmp.{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(payload)
                    os.replace(tmp, path)
                out.append(f"{MARKER}{path}")
            yield pdf.assign(**{value_col: out})

    return df.mapInPandas(run, schema=df.schema)


def claim_check_reads(
    df: DataFrame, value_col: str = "value"
) -> DataFrame:
    """Resolve ``claim-check:<uri>`` markers back to the stored payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for v in pdf[value_col]:
                if v is not None and v.startswith(MARKER):
                    with open(v[len(MARKER):], "rb") as f:
                        out.append(f.read().decode("utf-8"))
                else:
                    out.append(v)
            yield pdf.assign(**{value_col: out})

    return df.mapInPandas(run, schema=df.schema)


# ---------------------------------------------------------------------------
# Wire-compatible serde: the bakdata byte-flag protocol over BINARY columns.
# Closes the round-1 "what's missing #4" gap: a Spark job using these two
# operators interoperates on the wire with Kafka clients running
# kafka-large-message-serde in byte-flag mode (the serde's default); the
# header-flag mode remains out of scope (flag travels in a Kafka header,
# an encoding this engine's header map already transports opaquely).
#
# Divergence (documented, deliberate): bakdata names blob objects
# {basePath}/{topic}/{partition}/{offset}-{uuid}; we content-address by
# sha256 so retried tasks under at-least-once sinks rewrite the SAME
# object instead of leaking one blob per attempt. Readers never care —
# the URI is opaque to the protocol.
# ---------------------------------------------------------------------------


def encode_wire_value(
    v: bytes | None,
    threshold: int,
    blob_dir: str,
    uri_prefix: str = "file://",
) -> bytes | None:
    """Pure per-value encoder (one wire record): ``0x00 + payload`` at or
    under ``threshold`` bytes, else write the blob (content-addressed,
    idempotent) and return ``0x01 + utf8(uri)``. Exposed module-level so
    the protocol is testable without Spark (property tests)."""
    if v is None:
        return None
    payload = bytes(v)
    if len(payload) <= threshold:
        return bytes([FLAG_NOT_BACKED]) + payload
    os.makedirs(blob_dir, exist_ok=True)
    digest = hashlib.sha256(payload).hexdigest()
    path = os.path.join(blob_dir, f"{digest}.blob")
    if not os.path.exists(path):  # content-addressed: idempotent
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
    return bytes([FLAG_BACKED]) + f"{uri_prefix}{path}".encode("utf-8")


def _file_resolver(uri: str) -> bytes:
    """Default blob resolver: ``file://`` (and bare) paths only. Other
    schemes raise a clear error instead of a confusing open() failure —
    if you encoded with a custom ``uri_prefix`` (s3://, gs://), pass a
    matching ``resolver`` to :func:`wire_decode`."""
    if "://" in uri and not uri.startswith("file://"):
        scheme = uri.split("://", 1)[0]
        raise ValueError(
            f"no blob resolver for URI scheme {scheme!r} — pass "
            "resolver= to wire_decode/decode_wire_value"
        )
    if uri.startswith("file://"):
        uri = uri[len("file://"):]
    with open(uri, "rb") as f:
        return f.read()


def decode_wire_value(v: bytes | None, resolver=_file_resolver) -> bytes | None:
    """Pure per-value decoder, inverse of :func:`encode_wire_value`.
    Unknown flag bytes raise (matches the serde: reject, don't guess);
    ``resolver(uri) -> bytes`` fetches backed payloads (default:
    local/file:// paths)."""
    if v is None:
        return None
    raw = bytes(v)
    if not raw:
        raise ValueError("large-message value is empty (no flag byte)")
    flag, rest = raw[0], raw[1:]
    if flag == FLAG_NOT_BACKED:
        return rest
    if flag == FLAG_BACKED:
        return resolver(rest.decode("utf-8"))
    raise ValueError(f"unknown large-message flag byte {flag:#x}")


def wire_encode(
    df: DataFrame,
    value_col: str = "value",
    threshold: int = 1024 * 1024,
    blob_dir: str = "/tmp/large-messages",
    uri_prefix: str = "file://",
) -> DataFrame:
    """Encode a BINARY column into bakdata byte-flag wire format: small
    values become ``0x00 + value``; values larger than ``threshold``
    bytes are written to the blob store and become ``0x01 + utf8(uri)``.

    Single pass, Arrow-batched; filesystem IO happens only for the
    oversized minority inside each batch. NULL values stay NULL (the
    serde's null passthrough)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(
                **{
                    value_col: [
                        encode_wire_value(v, threshold, blob_dir, uri_prefix)
                        for v in pdf[value_col]
                    ]
                }
            )

    return df.mapInPandas(run, schema=df.schema)


def wire_decode(
    df: DataFrame, value_col: str = "value", resolver=_file_resolver
) -> DataFrame:
    """Decode bakdata byte-flag wire format back to the raw BINARY value,
    fetching backed payloads via ``resolver(uri) -> bytes`` (default:
    local/file:// paths — match it to wire_encode's ``uri_prefix``).
    Unknown flag bytes raise (matches the serde, which rejects rather
    than guesses)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(
                **{
                    value_col: [
                        decode_wire_value(v, resolver) for v in pdf[value_col]
                    ]
                }
            )

    return df.mapInPandas(run, schema=df.schema)


def wire_backed_flag(value):
    """True iff an encoded value is blob-backed — first byte == 0x01,
    checked JVM-side (no UDF): for routing/metrics on encoded streams."""
    col = F.col(value) if isinstance(value, str) else value
    return F.substring(col, 1, 1) == F.lit(bytes([FLAG_BACKED]))


# ---------------------------------------------------------------------------
# Header-flag dialect: the serde's second wire mode (kafka-large-message-
# serde `HeaderLargeMessagePayloadProtocol`). The backed/not-backed flag
# travels as a Kafka HEADER instead of the value's first byte, and the
# record value is the bare payload (not backed) or the bare UTF-8 URI
# (backed) — no prefix byte. Both dialects share the blob store, the
# content-addressed writer, and the resolver, so a stream encoded in
# either mode decodes to identical payloads (property-tested).
#
# Offline caveat (documented divergence risk): the flag header NAME is
# configurable here and defaults to the serde's documented key; if an
# interop deployment uses a custom header, pass `flag_header`. A record
# with NO flag header decodes as a bare non-backed payload — headers-mode
# topics always carry the header for serde-written records, and this
# default makes plain-producer records pass through unharmed.
# ---------------------------------------------------------------------------

HEADER_FLAG_KEY = "__large_message_flags"


def encode_header_value(
    v: bytes | None,
    threshold: int,
    blob_dir: str,
    uri_prefix: str = "file://",
) -> tuple[bytes | None, list[tuple[str, bytes]]]:
    """Pure per-value encoder for the header-flag dialect: returns
    ``(value, extra_headers)``. Small values pass through bare with a
    not-backed flag header; oversized values are blob-written (same
    content-addressed store as the byte-flag dialect) and replaced by the
    bare URI bytes with a backed flag header. Null -> (None, []) — the
    serde's null passthrough writes no header."""
    if v is None:
        return None, []
    payload = bytes(v)
    if len(payload) <= threshold:
        return payload, [(HEADER_FLAG_KEY, bytes([FLAG_NOT_BACKED]))]
    # reuse the byte-flag writer for the blob + URI, then strip its prefix
    prefixed = encode_wire_value(payload, threshold, blob_dir, uri_prefix)
    return prefixed[1:], [(HEADER_FLAG_KEY, bytes([FLAG_BACKED]))]


def decode_header_value(
    v: bytes | None,
    headers,
    resolver=_file_resolver,
    flag_header: str = HEADER_FLAG_KEY,
) -> bytes | None:
    """Pure per-value decoder for the header-flag dialect. ``headers`` is
    the Kafka header multimap as an iterable of (key, value) pairs (or
    structs/dicts with ``key``/``value``); LAST occurrence of the flag
    header wins — the same last-wins rule the engine's P4 header
    extraction implements (reference HeaderHelper.java:54-56). Unknown
    flag bytes raise; no flag header -> bare payload."""
    if v is None:
        return None
    if headers is None:
        headers = ()  # no `or ()`: numpy arrays have no truth value
    flag = None
    for h in headers:
        if isinstance(h, dict):
            k, hv = h.get("key"), h.get("value")
        elif hasattr(h, "key"):
            k, hv = h.key, h.value
        else:
            k, hv = h
        if k == flag_header:
            flag = None if hv is None else bytes(hv)
    if flag is None:
        return bytes(v)
    if flag == bytes([FLAG_NOT_BACKED]):
        return bytes(v)
    if flag == bytes([FLAG_BACKED]):
        return resolver(bytes(v).decode("utf-8"))
    raise ValueError(f"unknown large-message flag header value {flag!r}")


def header_encode(
    df: DataFrame,
    value_col: str = "value",
    headers_col: str = "headers",
    threshold: int = 1024 * 1024,
    blob_dir: str = "/tmp/large-messages",
    uri_prefix: str = "file://",
) -> DataFrame:
    """Encode a BINARY column into the header-flag dialect: the value
    becomes the bare payload or bare URI, and the flag header is APPENDED
    to ``headers_col`` (Kafka's header multimap keeps duplicates; append
    preserves any pre-existing occurrence while making ours the
    last-wins winner). Single Arrow-batched pass, same shape as
    :func:`wire_encode`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values, headers = [], []
            for v, hs in zip(pdf[value_col], pdf[headers_col]):
                nv, extra = encode_header_value(
                    v, threshold, blob_dir, uri_prefix
                )
                values.append(nv)
                if not extra:  # null passthrough: headers untouched
                    headers.append(hs)
                else:
                    base = list(hs) if hs is not None else []
                    headers.append(
                        base + [{"key": k, "value": hv} for k, hv in extra]
                    )
            yield pdf.assign(**{value_col: values, headers_col: headers})

    return df.mapInPandas(run, schema=df.schema)


def header_decode(
    df: DataFrame,
    value_col: str = "value",
    headers_col: str = "headers",
    resolver=_file_resolver,
    flag_header: str = HEADER_FLAG_KEY,
) -> DataFrame:
    """Decode the header-flag dialect back to the raw BINARY value (the
    inverse of :func:`header_encode`; shares the resolver with
    :func:`wire_decode`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(
                **{
                    value_col: [
                        decode_header_value(v, hs, resolver, flag_header)
                        for v, hs in zip(pdf[value_col], pdf[headers_col])
                    ]
                }
            )

    return df.mapInPandas(run, schema=df.schema)

