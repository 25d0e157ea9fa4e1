"""Stack-trace classifier (operator N2).

Reference: StackTraceClassifier.java:36-67. The error "type" is, in order of
preference:

1. the first ``\\tat pkg.Class.method(File.java:123)`` frame of the trace
   (regex LINE, StackTraceClassifier.java:37-38);
2. else the exception class name extracted from the first line
   (regex EXCEPTION, StackTraceClassifier.java:39);
3. else the whole first line.

Golden cases: StackTraceClassifierTest.java:58-74.

Implemented as pure built-in expressions (regexp_extract + coalesce) — no
UDF, fully codegen'd, pushes through Catalyst untouched. Both Java and Spark
use java.util.regex, so the reference's patterns translate literally
(including the unescaped ``.`` before ``java:`` in LINE — kept verbatim to
match reference behavior).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Verbatim from StackTraceClassifier.java:37-39 (Java regex == Spark regex).
STACK_FRAME_RE = r"(?:\n|^)\tat ([.\w]+\(\w+.java:\d+\))(?:\n|$)"
EXCEPTION_RE = r"^([.\w$]+).*"

# DuckDB (RE2) equivalents for oracle SQL — identical syntax for these
# patterns; exported so oracle strings stay in lockstep with the engine.
STACK_FRAME_RE_SQL = STACK_FRAME_RE
EXCEPTION_RE_SQL = EXCEPTION_RE


def first_line(col: Column | str) -> Column:
    """First line of a multiline string (StackTraceClassifier.java:40,58)."""
    return F.split(F.col(col) if isinstance(col, str) else col, "\n").getItem(0)


def classify_stack_trace(stack_trace: Column | str) -> Column:
    """3-way fallback classification (StackTraceClassifier.java:42-45).

    ``regexp_extract`` returns '' on miss; ``nullif(.., '')`` converts that
    to NULL so ``coalesce`` falls through, mirroring the reference's
    Optional-chain. NULL input yields NULL (caller routes that to the error
    channel — ContextEnricher.java:39).
    """
    st = F.col(stack_trace) if isinstance(stack_trace, str) else stack_trace
    fl = first_line(st)
    return F.coalesce(
        F.nullif(F.regexp_extract(st, STACK_FRAME_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(fl, EXCEPTION_RE, 1), F.lit("")),
        fl,
    )


def classify_stack_trace_sql(col_sql: str) -> str:
    """ANSI/DuckDB SQL rendering of :func:`classify_stack_trace`.

    Used by the driver-oracle contract so the oracle is generated from the
    same regex constants as the Spark plan. DuckDB's regexp_extract also
    returns '' on miss and string_split is 1-indexed.
    """
    fl = f"string_split({col_sql}, chr(10))[1]"
    return (
        "coalesce("
        f"nullif(regexp_extract({col_sql}, '{STACK_FRAME_RE_SQL}', 1), ''), "
        f"nullif(regexp_extract({fl}, '{EXCEPTION_RE_SQL}', 1), ''), "
        f"{fl})"
    )
