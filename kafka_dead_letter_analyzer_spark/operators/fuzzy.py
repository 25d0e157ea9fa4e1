"""Fuzzy key matching via deletion-neighborhood blocking (SymSpell).

The entity-resolution / typo-detection primitive: find key pairs within
small Levenshtein distance WITHOUT the O(n²) all-pairs comparison. Two
strings within edit distance k share at least one common element of
their ≤k-deletion neighborhoods (delete-only variants cover inserts,
deletes, substitutions, and transpositions up to distance k), so an
equi-join on the variant is a complete blocking step; an exact
levenshtein() verify on the candidates removes the false positives the
shared variant admits (sharing a deletion variant bounds distance by
2k, not k).

Scale shape: each key of length L generates O(L^k / k!) variant rows —
for k=2 and typical tokens, tens of rows — which equi-join on the
variant string. That shuffle is the cost; candidates are distinct
id-pairs. Ultra-short variants are the skew risk (a 1-char variant
blocks every 3-char key containing it): at corpus scale, cap the
per-variant posting count like the inverted-index Jaccard path does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(tok: Column, k: int = 2) -> Column:
    """All strings obtainable from ``tok`` by deleting up to ``k``
    characters (k in {1, 2}), including ``tok`` itself. Built with
    higher-order functions — the variant fan-out happens JVM-side."""
    if k not in (1, 2):
        raise ValueError("deletion_variants supports k=1 or k=2")
    L = F.length(tok)
    d1 = F.transform(
        F.sequence(F.lit(1), L),
        lambda i: F.concat(tok.substr(F.lit(1), i - 1), tok.substr(i + 1, L)),
    )
    out = F.concat(F.array(tok), d1)
    if k == 2:
        d2 = F.flatten(
            F.transform(
                F.sequence(F.lit(1), L - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, L),
                    lambda j: F.concat(
                        tok.substr(F.lit(1), i - 1),
                        tok.substr(i + 1, j - i - 1),
                        tok.substr(j + 1, L),
                    ),
                ),
            )
        )
        # sequence(1, L-1) would count DOWN for L < 2 (Spark's sequence
        # infers a negative step) — guard to the empty list instead
        out = F.concat(
            out, F.when(L >= 2, d2).otherwise(F.array().cast("array<string>"))
        )
    return F.array_distinct(out)


def fuzzy_key_pairs(
    keys: DataFrame, key_col: str = "tok", max_distance: int = 2
) -> DataFrame:
    """All distinct key pairs within ``max_distance`` Levenshtein edits,
    as (tok_a, tok_b, dist) with tok_a < tok_b.

    ``keys`` should already be distinct on ``key_col``. Complete recall
    by the deletion-neighborhood property; exactness by the levenshtein
    verify — so an independent all-pairs oracle must agree exactly.
    """
    v = keys.select(
        F.col(key_col).alias("_tok"),
        F.explode(deletion_variants(F.col(key_col), k=max_distance)).alias(
            "_var"
        ),
    )
    a = v.select(F.col("_tok").alias("tok_a"), "_var")
    b = v.select(F.col("_tok").alias("tok_b"), "_var")
    cand = (
        a.join(b, "_var")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .dropDuplicates(["tok_a", "tok_b"])
    )
    return cand.select(
        "tok_a",
        "tok_b",
        F.levenshtein("tok_a", "tok_b").alias("dist"),
    ).filter(F.col("dist") <= max_distance)
