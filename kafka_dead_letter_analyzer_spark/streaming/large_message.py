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

MARKER = "claim-check:"


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
