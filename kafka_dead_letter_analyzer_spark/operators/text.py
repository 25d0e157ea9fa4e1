"""Text-analysis operators for large-scale training-data pipelines
(north-star extensions, SURVEY.md §7.6; not reference behavior —
BASELINE.json north_star).

All pure built-in column expressions (regexp/length/split) — JVM-side,
codegen'd, embarrassingly parallel: no shuffle, no UDF, scales linearly
with input splits at 100 TB.

Each operator exports a matching DuckDB SQL renderer so the driver oracle
is generated from the same constants (regex sets, stopword lists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Token counting: whitespace tokens + a BPE-ish subword proxy
# ---------------------------------------------------------------------------

WS_RE = r"\s+"
# word pieces: runs of letters, runs of digits, or single non-space symbols —
# a deterministic proxy for BPE pre-tokenization (GPT-2-style splitting)
WORDPIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings.

    Counts ``\\S+`` runs rather than splitting: ``trim``-then-``split``
    miscounts strings that are blank-but-not-space (``"\\n"`` -> 2) because
    SQL ``trim`` strips only spaces.
    """
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(r"\S+"), F.lit(0)))


def wordpiece_count(text: Column | str) -> Column:
    """Sub-word piece count (BPE-ish regex)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(WORDPIECE_RE), F.lit(0)))


def token_count_sql(col: str) -> str:
    return f"len(regexp_extract_all({col}, '\\S+'))"


def wordpiece_count_sql(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{WORDPIECE_RE}'))"


# ---------------------------------------------------------------------------
# Language identification: stopword-hit heuristic (n-gram-free, regex-only)
# ---------------------------------------------------------------------------

# Deterministic stopword regexes per language (word-boundary anchored).
LANG_STOPWORDS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|you|that|it|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "fr": r"\b(le|la|les|et|est|une|que|pour|dans|des)\b",
    "es": r"\b(el|la|los|las|es|una|que|por|para|con)\b",
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    t = F.col(text) if isinstance(text, str) else text
    low = F.lower(t)
    return {
        lang: F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0)))
        for lang, pat in LANG_STOPWORDS.items()
    }


def lang_id(text: Column | str) -> Column:
    """argmax of stopword hits; 'und' (undetermined) when all zero.
    Tie-break: alphabetical language order (deterministic)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed alphabetical so earlier langs win ties via later when-overwrite
    for lang in sorted(scores, reverse=True):
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best == 0, F.lit("und")).otherwise(result)


def lang_id_sql(col: str) -> str:
    score = {
        lang: f"len(regexp_extract_all(lower({col}), '{pat}'))"
        for lang, pat in LANG_STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(score.values()) + ")"
    expr = "'und'"
    for lang in sorted(score, reverse=True):
        expr = f"CASE WHEN {score[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return f"CASE WHEN {best} = 0 THEN 'und' ELSE {expr} END"


# ---------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

PUNCT_RE = r"[^\w\s]"
ANY_STOPWORD_RE = r"\b(the|and|of|to|in|is|der|die|und|le|la|les|el|los)\b"


def quality_features(text: Column | str) -> dict[str, Column]:
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), F.lit(0)))
    n_stop = F.size(F.regexp_extract_all(F.lower(t), F.lit(ANY_STOPWORD_RE), F.lit(0)))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(n_chars.cast("double") / safe_tokens, 4),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop.cast("double") / safe_tokens, 4),
    }


def quality_features_sql(col: str) -> dict[str, str]:
    n_chars = f"length({col})"
    n_tokens = token_count_sql(col)
    n_punct = f"len(regexp_extract_all({col}, '{PUNCT_RE}'))"
    n_stop = f"len(regexp_extract_all(lower({col}), '{ANY_STOPWORD_RE}'))"
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": f"round({n_chars} / greatest({n_tokens}, 1), 4)",
        "punct_ratio": f"round({n_punct} / greatest({n_chars}, 1), 4)",
        "stopword_ratio": f"round({n_stop} / greatest({n_tokens}, 1), 4)",
    }


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 of the normalized text
# ---------------------------------------------------------------------------

NORMALIZE_STRIP_RE = r"[^a-z0-9]"


def fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5(lowercase, alnum-only).
    Identical normalization on both engines -> oracle-checkable; used as the
    exact-dedup key (casing/punctuation-insensitive)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(t), NORMALIZE_STRIP_RE, ""))


def fingerprint_sql(col: str) -> str:
    return f"md5(regexp_replace(lower({col}), '{NORMALIZE_STRIP_RE}', '', 'g'))"


# ---------------------------------------------------------------------------
# Frame-level operator: full text-stats projection
# ---------------------------------------------------------------------------


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    feats = quality_features(text_col)
    return docs.select(
        "doc_id",
        token_count(text_col).alias("n_tokens"),
        wordpiece_count(text_col).alias("n_wordpieces"),
        lang_id(text_col).alias("pred_lang"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        fingerprint(text_col).alias("fingerprint"),
    )
