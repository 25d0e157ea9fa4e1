"""Shared exact-arithmetic and join idioms used across operator
modules — hoisted (round-8 review) so the overflow-sensitive division
pattern is maintained in ONE place instead of per-module copies.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ppm2(num: str, nt: str) -> str:
    """Two-step long-division ppm: exact ``floor(num * 1e6 / nt)`` for
    ``0 <= num <= nt`` with no intermediate beyond ``nt * 1000`` —
    identical SQL text on Spark and DuckDB (modulo ``DIV`` vs ``//``,
    which callers' oracles mirror).  The identity holds for ANY
    non-negative num (write num*1000 = nt*d1 + r: num*1e6 = nt*d1*1000
    + r*1000, so floor(num*1e6/nt) = d1*1000 + floor(r*1000/nt)); the
    num <= nt phrasing is the bound callers use to size ``nt * 1000``
    against int64."""
    return (
        f"(({num} * 1000) DIV {nt}) * 1000"
        f" + ((({num} * 1000) % {nt}) * 1000) DIV {nt}"
    )


def null_safe_group_join(
    left: DataFrame,
    right: DataFrame,
    groups: list[str],
    plain_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` onto ``left`` by the group columns with
    NULL-SAFE equality, keeping left's columns plus right's non-key
    columns.  A plain ``join(right, groups)`` silently drops rows
    whose group key is NULL — but ``groupBy`` keeps NULL as a real
    group, so an aggregate-join-back pattern (per-group anchors,
    per-group spans) would otherwise lose exactly the NULL group that
    the aggregation produced a row for.  ``plain_keys`` are
    additional join columns compared with ORDINARY equality (keys
    that are non-null by construction — partition ids, contraction
    cell coordinates); ``how`` extends the pattern to outer shapes
    (the grid left-join).  EMPTY ``groups`` with ``plain_keys``
    delegates to a plain join on those keys, so a caller with an
    optional group list makes ONE unconditional call instead of
    repeating an if-groups branch that, when forgotten, reintroduces
    exactly the NULL-group drop this helper exists to prevent
    (round-9 review)."""
    if not groups:
        if plain_keys:
            return left.join(right, list(plain_keys), how)
        raise ValueError(
            "null_safe_group_join: needs group columns or plain_keys"
        )
    plains = list(plain_keys or [])
    l, r = left.alias("_nsl"), right.alias("_nsr")
    cond = functools.reduce(
        lambda a, b: a & b,
        [
            F.col(f"_nsl.{g}").eqNullSafe(F.col(f"_nsr.{g}"))
            for g in groups
        ]
        + [F.col(f"_nsl.{p}") == F.col(f"_nsr.{p}") for p in plains],
    )
    keys = set(groups) | set(plains)
    extra = [c for c in right.columns if c not in keys]
    return l.join(r, cond, how).select(
        "_nsl.*", *[F.col(f"_nsr.{c}") for c in extra]
    )
