"""Skew-resilient join strategies.

AQE's skew-join splitting handles sort-merge joins at runtime; this
module covers the cases it does not: aggregations keyed on the join key
right after the join, deterministic replays, and engines/configs where
AQE is off. The pattern is the classic SALT: spread each hot key's fact
rows over ``salt_factor`` sub-keys and replicate the other side per
sub-key, so no single task owns a whole hot key.

Related named skew answers elsewhere in the engine:
``operators/aggregate.py::error_statistics_salted`` (two-phase salted
aggregation) and ``operators/temporal.py::asof_join_sliced`` (time-
sliced as-of). All three are differential-tested equal to their plain
formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` to ``dim`` on ``key`` with hot-key salting: fact
    rows get a deterministic salt (hash of ``salt_on``, a fact column
    that varies WITHIN a key — the event id, offset, or timestamp), and
    each dim row is replicated once per salt value, so a key carrying
    10% of the fact table spreads across ``salt_factor`` tasks instead
    of melting one.

    Cost model: the dim side grows ``salt_factor``x — use when dim is
    the small-but-not-broadcastable side (broadcast beats salting when
    it fits, and plain SMJ+AQE when nothing is hot). The salt is a pure
    function of the data, so retries and replays partition identically.
    Result set is EXACTLY the plain join's (differential-tested); only
    the physical key space changes.
    """
    if salt_factor < 1:
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_factor)).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = f.join(d, on=[key, "_salt"], how=how)
    return out.drop("_salt")
